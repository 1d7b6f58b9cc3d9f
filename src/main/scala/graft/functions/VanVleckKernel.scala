package graft.functions

import org.apache.commons.math3.special.Erf

/** C5 Van Vleck dequantisation kernels
  * (/root/reference/src/van_vleck.rs:308-748).
  *
  * Pure, deterministic f64 math — safe under Spark task retries. The
  * legacy MWA correlator quantises to 7 levels (±0.5..±6.5); these kernels
  * invert the quantisation bias:
  *
  *  - autos: solve σ̂(σ) = s by Newton's method, where
  *    σ̂(σ) = sqrt(49 − Σ_{k=0}^{6} 2(k+0.5)·erf((k+0.5)/(σ√2)))
  *    (van_vleck.rs:368-375; derivative 384-392; Newton loop 333-349 with
  *    tol 1e-12 and a guess>0.5 divergence guard);
  *  - crosses: invert κ̂(ρ) via Newton + Simpson (n=10) integration of the
  *    bivariate-normal pdf over the 7-level quantiser grid
  *    (pdf 634-656, simpsons_rule 661-682, van_vleck_cross_int 703-732).
  */
object VanVleckKernel {

  private val SqrtTau = 2.5066282746310002 // sqrt(2*pi), as in the reference

  /** σ̂(σ): expected quantised std dev given true std dev. */
  def sighat(sigma: Double): Double = {
    var sum = 0.0
    var k = 0
    while (k <= 6) {
      val k_ = k + 0.5
      sum += 2.0 * k_ * Erf.erf(k_ / (sigma * math.sqrt(2.0)))
      k += 1
    }
    math.sqrt(49.0 - sum)
  }

  /** dσ̂/dσ. */
  def sighatPrime(sigma: Double): Double = {
    val s = sigma * sigma
    var sum = 0.0
    var k = 0
    while (k <= 6) {
      val k2 = (k + 0.5) * (k + 0.5)
      sum += 2.0 * k2 * math.exp(-k2 / (2.0 * s)) / (SqrtTau * s)
      k += 1
    }
    sum / sighat(sigma)
  }

  /** Invert σ̂ by Newton; returns the input when not converged (mirrors
    * van_vleck_autos' map_or fallback, van_vleck.rs:352-361).
    */
  def vanVleckAuto(s: Double): Double = {
    val tol = 1e-12
    var guess = s
    var delta = sighat(guess) - s
    var count = 0
    while (math.abs(delta) > tol && guess > 0.5) {
      guess -= delta / sighatPrime(guess)
      delta = sighat(guess) - s
      count += 1
      if (count > 100) return s
    }
    guess
  }

  /** Bivariate-normal pdf sum over the quantiser grid at correlation rho;
    * x/y are the (k+0.5)/σ grids (van_vleck.rs:634-656).
    *
    * Uses the separable form of the reference's summand
    * 2·cosh(ρ·x_i·y_k/d) · e^{-(x_i²+y_k²)/2d}:
    * the Gaussian factor splits into per-row/per-column tables, and since
    * x_i = (i+0.5)/σx is affine in i, e^{ρ·x_i·y_k/d} is a geometric
    * sequence in i — so the 7x7 grid costs ~28 exp instead of 49 exp +
    * 49 cosh. Algebraically identical to the direct sum (the reference's
    * own derivation at van_vleck.rs:600-632 rewrites it the same way).
    */
  def pdf(x: Array[Double], y: Array[Double], rho: Double): Double = {
    val n = x.length
    val m = y.length
    val d = math.max(1.0 - rho * rho, 1e-20)
    val inv2d = 1.0 / (2.0 * d)
    val ex = new Array[Double](n)
    var i = 0
    while (i < n) { ex(i) = math.exp(-x(i) * x(i) * inv2d); i += 1 }
    val ey = new Array[Double](m)
    var k = 0
    while (k < m) { ey(k) = math.exp(-y(k) * y(k) * inv2d); k += 1 }
    // x_i = x0 + i*dx (x0 = first grid point, dx = grid step)
    val x0 = x(0)
    val dx = if (n > 1) x(1) - x(0) else 0.0
    var r = 0.0
    k = 0
    while (k < m) {
      val c = rho * y(k) / d
      var p = math.exp(c * x0) // e^{c·x_i}, advanced by ratio each i
      val ratio = math.exp(c * dx)
      i = 0
      while (i < n) {
        val cosh2 = p + 1.0 / p // 2*cosh(c*x_i)
        r += cosh2 * ex(i) * ey(k)
        p *= ratio
        i += 1
      }
      k += 1
    }
    r / (math.Pi * math.sqrt(d))
  }

  /** Simpson's rule for ∫_0^rho pdf dρ with n=10 intervals
    * (corrcorrect_simp, van_vleck.rs:692-696).
    */
  def corrcorrectSimp(rho: Double, x: Array[Double],
                      y: Array[Double]): Double = {
    val n = 10
    val h = rho / n
    var sum = pdf(x, y, 0.0) + pdf(x, y, rho)
    var i = 1
    while (i < n) {
      val w = if (i % 2 == 0) 2.0 else 4.0
      sum += w * pdf(x, y, i * h)
      i += 1
    }
    sum * h / 3.0
  }

  /** Invert κ̂ for one cross-correlation component; returns khat on any
    * guard failure (mirrors van_vleck_crosses_int's unwrap_or,
    * van_vleck.rs:736-748).
    */
  def vanVleckCrossInt(khat: Double, sigmaX: Double,
                       sigmaY: Double): Double = {
    if (sigmaX <= 0.0 || sigmaY <= 0.0) return khat
    val sign = math.signum(khat)
    val k = math.abs(khat)
    val x = Array.tabulate(7)(i => (i + 0.5) / sigmaX)
    val y = Array.tabulate(7)(i => (i + 0.5) / sigmaY)
    val tol = 1e-12
    var guess = k / (sigmaX * sigmaY)
    if (guess < 0.0 || guess >= 1.0) return khat
    var delta = corrcorrectSimp(guess, x, y) - k
    var count = 0
    while (math.abs(delta) > tol) {
      guess -= delta / pdf(x, y, guess)
      delta = corrcorrectSimp(guess, x, y) - k
      count += 1
      if (count > 100) return khat
    }
    sign * guess * sigmaX * sigmaY
  }
}
