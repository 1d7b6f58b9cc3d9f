package graft.functions

/** Sliding-window background estimate for RFI detection — the
  * high-pass stage AOFlagger strategies run before SumThreshold
  * (Offringa et al. 2010 §3.1; the reference executes it inside the
  * loaded Lua strategy, /root/reference/src/flags.rs:406-412,
  * `high_pass_filter`). The residual `amp − background` is what the
  * threshold passes scan, so spectral structure (bandpass slope, a
  * source's fringes) stops masquerading as broadband RFI.
  *
  * The estimator is a SEPARABLE sliding-window median: first a median
  * over the time window `[i−wt, i+wt]` per channel (unflagged samples
  * only), then a median of those over the channel window `[j−wc, j+wc]`
  * per timestep. Separable medians are the classic robust background
  * fit for dynamic spectra; windows empty of unflagged data fall back
  * to the grid's global unflagged median (0 when fully flagged).
  *
  * Median convention: the INTERPOLATED median (mean of the two middle
  * order statistics at even count) — chosen over the upper-middle
  * convention used elsewhere in this codebase because the q_r1c oracle
  * twin runs DuckDB's `median()` window aggregate, which interpolates;
  * the kernel and the twin must agree bit-for-bit.
  */
object BackgroundKernel {

  /** DuckDB-compatible median of the values; NaN when empty. Sorts a
    * copy (inputs are window-sized).
    */
  def med(xs: Array[Double]): Double = {
    val n = xs.length
    if (n == 0) return Double.NaN
    val s = xs.clone()
    java.util.Arrays.sort(s)
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Estimate the background of a (nt × nc) amplitude grid.
    *
    * @param amp  amplitudes, `amp(i)(j)` at time index i, channel j
    * @param use  mask — true where the sample exists and is unflagged
    * @param wt   half-width of the time window (0 = that row only)
    * @param wc   half-width of the channel window
    */
  def estimate(amp: Array[Array[Double]], use: Array[Array[Boolean]],
               wt: Int, wc: Int): Array[Array[Double]] = {
    val nt = amp.length
    if (nt == 0) return Array.empty
    val nc = amp(0).length
    // global fallback: median of every usable sample
    val global = med((for {
      i <- 0 until nt; j <- 0 until nc if use(i)(j)
    } yield amp(i)(j)).toArray)
    val fallback = if (global.isNaN) 0.0 else global
    // pass 1: time-direction median per channel (masked)
    val b1 = Array.ofDim[Double](nt, nc)
    var j = 0
    while (j < nc) {
      var i = 0
      while (i < nt) {
        val lo = math.max(0, i - wt)
        val hi = math.min(nt - 1, i + wt)
        val w = (for (k <- lo to hi if use(k)(j)) yield amp(k)(j)).toArray
        b1(i)(j) = med(w) // NaN when the window has no usable sample
        i += 1
      }
      j += 1
    }
    // pass 2: channel-direction median of the pass-1 values (NaNs out)
    val out = Array.ofDim[Double](nt, nc)
    var i = 0
    while (i < nt) {
      var j2 = 0
      while (j2 < nc) {
        val lo = math.max(0, j2 - wc)
        val hi = math.min(nc - 1, j2 + wc)
        val w = (for (k <- lo to hi if !b1(i)(k).isNaN)
          yield b1(i)(k)).toArray
        val m = med(w)
        out(i)(j2) = if (m.isNaN) fallback else m
        j2 += 1
      }
      i += 1
    }
    out
  }
}
