package graft.functions

/** R1 SumThreshold RFI detection kernel — a pure-Scala implementation of
  * the algorithmic core of AOFlagger's default strategy (Offringa et al.
  * 2010, "Post-correlation radio frequency interference classification
  * methods", MNRAS 405; Offringa et al. 2012). The reference executes the
  * same algorithm through the aoflagger_sys CXX bridge
  * (/root/reference/src/flags.rs:368-437); like the reference we treat the
  * detector as an algorithmic black box validated statistically (flag
  * occupancy), not bit-exactly (SURVEY §7.5).
  *
  * Algorithm: for window sizes M = 1, 2, 4, … the threshold decreases as
  *   χ_M = χ_1 / ρ^log2(M)   (ρ = 1.5)
  * and a length-M window is flagged whole when its sum exceeds M·χ_M;
  * already-flagged samples contribute χ_M to the running sum so one hot
  * sample cannot shadow its neighbours. Both axes (time, frequency) are
  * scanned per scale.
  */
object SumThresholdKernel {

  val Rho = 1.5

  /** One directional pass over a single row/column vector.
    * Returns updated flags (input untouched).
    */
  def pass1d(amp: Array[Double], flagged: Array[Boolean], m: Int,
             chi: Double): Array[Boolean] = {
    val n = amp.length
    val out = flagged.clone()
    if (n < m) return out
    // running sum over window [i, i+m): flagged values contribute chi
    var sum = 0.0
    var i = 0
    while (i < m) {
      sum += (if (flagged(i)) chi else amp(i))
      i += 1
    }
    var start = 0
    while (start + m <= n) {
      if (sum > chi * m) {
        var j = start
        while (j < start + m) { out(j) = true; j += 1 }
      }
      if (start + m < n) {
        sum -= (if (flagged(start)) chi else amp(start))
        sum += (if (flagged(start + m)) chi else amp(start + m))
      }
      start += 1
    }
    out
  }

  /** Full SumThreshold over a time x chan amplitude matrix.
    *
    * The matrix is first reduced to residuals by subtracting the median of
    * the unflagged samples (the degenerate constant "background fit" —
    * AOFlagger's strategies likewise threshold residuals after a high-pass
    * background estimate, not raw amplitudes). `chi1` is the base
    * single-sample threshold ABOVE background; scales run up to 2^maxLog2
    * samples.
    */
  /** `timeWeight` / `chanWeight` are direction sensitivities (the knobs
    * AOFlagger's default MWA strategy exposes per scan direction):
    * the threshold in a direction is χ_M / weight, so weight > 1 flags
    * more aggressively along that axis (narrowband RFI → raise
    * timeWeight; transient broadband → raise chanWeight). 1.0 keeps the
    * symmetric default, bit-identical to the unweighted kernel.
    */
  def flagMatrix(amp: Array[Array[Double]], existing: Array[Array[Boolean]],
                 chi1: Double, maxLog2: Int = 5,
                 rho: Double = Rho,
                 timeWeight: Double = 1.0,
                 chanWeight: Double = 1.0): Array[Array[Boolean]] = {
    val nt = amp.length
    if (nt == 0) return existing
    val nc = amp(0).length
    val unflagged = (for {
      i <- 0 until nt; j <- 0 until nc if !existing(i)(j)
    } yield amp(i)(j)).toArray
    val bg =
      if (unflagged.isEmpty) 0.0
      else { val s = unflagged.sorted; s(s.length / 2) }
    flagMatrixRes(amp.map(_.map(_ - bg)), existing, chi1, maxLog2, rho,
      timeWeight, chanWeight)
  }

  /** SumThreshold over an ALREADY background-subtracted residual
    * matrix — the entry point the iterated high-pass strategy loop
    * uses ([[BackgroundKernel]] supplies the per-cell background).
    * [[flagMatrix]] is the constant-median special case.
    */
  def flagMatrixRes(res: Array[Array[Double]],
                    existing: Array[Array[Boolean]],
                    chi1: Double, maxLog2: Int = 5,
                    rho: Double = Rho,
                    timeWeight: Double = 1.0,
                    chanWeight: Double = 1.0): Array[Array[Boolean]] = {
    val nt = res.length
    if (nt == 0) return existing
    val nc = res(0).length
    var flags = existing.map(_.clone())
    var l = 0
    while (l <= maxLog2) {
      val m = 1 << l
      // one division per direction (χ1 / (ρ^l · weight)) so the DuckDB
      // twin's single-division literal reproduces the value bit-for-bit
      val scaleBase = math.pow(rho, l.toDouble)
      val chiT = chi1 / (scaleBase * timeWeight)
      val chiC = chi1 / (scaleBase * chanWeight)
      // time direction: per channel column
      val afterTime = flags.map(_.clone())
      var c = 0
      while (c < nc) {
        val colAmp = Array.tabulate(nt)(t => res(t)(c))
        val colFlg = Array.tabulate(nt)(t => flags(t)(c))
        val upd = pass1d(colAmp, colFlg, m, chiT)
        var t = 0
        while (t < nt) { if (upd(t)) afterTime(t)(c) = true; t += 1 }
        c += 1
      }
      // frequency direction: per time row
      var t = 0
      while (t < nt) {
        val upd = pass1d(res(t), afterTime(t), m, chiC)
        var c2 = 0
        while (c2 < nc) { if (upd(c2)) afterTime(t)(c2) = true; c2 += 1 }
        t += 1
      }
      flags = afterTime
      l += 1
    }
    flags
  }

  /** Robust base threshold ABOVE background from the unflagged samples:
    * k·MAD scaled to sigma with the 1.4826 normal consistency factor
    * (the estimator family AOFlagger's strategies use for their initial
    * sensitivity). [[flagMatrix]] subtracts the median itself, so the
    * returned threshold is purely the deviation scale.
    */
  def baseThreshold(amps: Array[Double], k: Double = 6.0): Double = {
    if (amps.isEmpty) return Double.MaxValue
    val sorted = amps.sorted
    val med = sorted(sorted.length / 2)
    val absDev = amps.map(a => math.abs(a - med)).sorted
    val mad = absDev(absDev.length / 2)
    k * 1.4826 * mad
  }
}
