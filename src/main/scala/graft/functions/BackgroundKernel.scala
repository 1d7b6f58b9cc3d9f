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

  // ---- Gaussian masked normalized convolution (AOFlagger's actual
  // high_pass_filter kernel; the sliding median above is the robust
  // alternative) ------------------------------------------------------

  /** Integer Gaussian tap weights for half-width `w` and width
    * parameter `sigma`: round(exp(−k²/2σ²)·1024) for k ∈ [−w, w].
    * Integer weights make the masked convolution EXACT (order-free
    * int64 sums), so the q_r1d oracle twin can carry the same literal
    * taps and hash-match bit-for-bit.
    */
  def gaussWeights(w: Int, sigma: Double): Array[Long] = {
    require(w >= 0 && sigma > 0, s"gaussWeights($w, $sigma)")
    Array.tabulate(2 * w + 1) { idx =>
      val k = idx - w
      math.round(math.exp(-(k.toDouble * k) / (2.0 * sigma * sigma))
        * 1024.0)
    }
  }

  /** Masked normalized Gaussian convolution of a micro-unit amplitude
    * grid — AOFlagger's `high_pass_filter` background: convolve
    * `amp·mask` and `mask` separately with the separable kernel
    * (borders truncated), divide at the end; windows with zero mask
    * weight fall back to the grid's global unflagged mean (0 when
    * fully flagged). Everything up to the final division is exact
    * int64 arithmetic, so the estimate is bit-deterministic
    * regardless of traversal order — the property the oracle twin
    * relies on.
    *
    * @param ampMicro amplitudes in integer micro-units
    * @param use      mask — true where the sample exists and is unflagged
    * @param wT       time-direction taps from [[gaussWeights]]
    * @param wC       channel-direction taps
    * @return background per cell, in micro-units (real-valued)
    */
  def estimateGaussianMicro(ampMicro: Array[Array[Long]],
                            use: Array[Array[Boolean]],
                            wT: Array[Long], wC: Array[Long])
      : Array[Array[Double]] = {
    val nt = ampMicro.length
    if (nt == 0) return Array.empty
    val nc = ampMicro(0).length
    val ht = wT.length / 2
    val hc = wC.length / 2
    // overflow guard: the worst-case pass-2 numerator must fit int64
    var maxAmp = 1L
    var gNum = 0L
    var gDen = 0L
    var i = 0
    while (i < nt) {
      var j = 0
      while (j < nc) {
        if (use(i)(j)) {
          if (ampMicro(i)(j) > maxAmp) maxAmp = ampMicro(i)(j)
          gNum += ampMicro(i)(j)
          gDen += 1L
        }
        j += 1
      }
      i += 1
    }
    val wtSum = wT.sum
    val wcSum = wC.sum
    require(maxAmp <= Long.MaxValue / math.max(wtSum * wcSum, 1L) / 2,
      s"gaussian background: amplitude $maxAmp µ overflows the exact " +
        s"int64 convolution for these taps")
    val fallback =
      if (gDen > 0) gNum.toDouble / gDen.toDouble else 0.0
    // pass 1: time direction, numerator and denominator separately
    val num1 = Array.ofDim[Long](nt, nc)
    val den1 = Array.ofDim[Long](nt, nc)
    var j = 0
    while (j < nc) {
      var i1 = 0
      while (i1 < nt) {
        var n = 0L
        var d = 0L
        var k = -ht
        while (k <= ht) {
          val ii = i1 + k
          if (ii >= 0 && ii < nt && use(ii)(j)) {
            n += wT(k + ht) * ampMicro(ii)(j)
            d += wT(k + ht)
          }
          k += 1
        }
        num1(i1)(j) = n
        den1(i1)(j) = d
        i1 += 1
      }
      j += 1
    }
    // pass 2: channel direction over the pass-1 sums
    val out = Array.ofDim[Double](nt, nc)
    var i2 = 0
    while (i2 < nt) {
      var j2 = 0
      while (j2 < nc) {
        var n = 0L
        var d = 0L
        var l = -hc
        while (l <= hc) {
          val jj = j2 + l
          if (jj >= 0 && jj < nc) {
            n += wC(l + hc) * num1(i2)(jj)
            d += wC(l + hc) * den1(i2)(jj)
          }
          l += 1
        }
        out(i2)(j2) = if (d > 0) n.toDouble / d.toDouble else fallback
        j2 += 1
      }
      i2 += 1
    }
    out
  }
}
