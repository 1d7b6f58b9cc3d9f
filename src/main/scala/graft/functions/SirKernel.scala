package graft.functions

/** Scale-invariant rank (SIR) operator — the morphological flag
  * extension AOFlagger strategies apply after SumThreshold (Offringa,
  * van de Gronde & Roerdink 2012, "A morphological algorithm for
  * improving radio-frequency interference detection", A&A 539A95; the
  * reference executes it inside its loaded Lua strategy through the
  * aoflagger_sys bridge, /root/reference/src/flags.rs:407-412).
  *
  * A sample i is flagged when it lies in ANY interval [a, b) whose
  * flagged fraction is at least (1 − η), i.e. when
  *     Σ_{j∈[a,b)} (flag_j ? η : η − 1) ≥ 0   for some a ≤ i < b.
  * With inclusive prefix sums P(i) = Σ_{j≤i} w_j (P(−1) = 0) this is
  *     max_{j ≥ i} P(j) ≥ min(0, min_{j < i} P(j)),
  * which one backward (running max) and one forward (running min) scan
  * evaluate in O(N) — the published linear-time formulation.
  *
  * [[graft.ops.RfiFlag]] applies this after SumThreshold (time
  * direction, then channel reading the time pass's output — the
  * sequential order AOFlagger's operator uses), driven by the
  * `sir_eta_time` / `sir_eta_chan` strategy keys; the q_r1 /
  * q_r1b driver gates pin it against the DuckDB twin
  * (`Oracles.sirPass`).
  *
  * Weights are carried as INTEGERS (η scaled by [[SirKernel.EtaDen]])
  * so the kernel's arithmetic is exact and the DuckDB oracle's
  * window-function twin (`Oracles.sirPass` — prefix sum, suffix max,
  * strict-prefix min, all BIGINT) is bit-identical by construction —
  * no floating-point prefix-sum ordering to reconcile between engines.
  * η = 0 is the identity (only already-flagged samples survive the
  * predicate); η ≥ 1 would flag every sample, so callers bound it.
  */
object SirKernel {

  /** Fixed-point denominator for η (1000 ⇒ η resolves to 0.001). */
  val EtaDen = 1000L

  /** η as the scaled-integer numerator the kernel and the SQL oracle
    * twin both use.
    */
  def etaNum(eta: Double): Long = math.round(eta * EtaDen)

  /** Extend a 1-D flag mask by the SIR rule with η = etaNum / EtaDen.
    * Returns a NEW mask; for etaNum in [0, EtaDen) the result is a
    * superset of the input.
    */
  def extend(flags: Array[Boolean], etaNum: Long): Array[Boolean] = {
    val n = flags.length
    val out = new Array[Boolean](n)
    if (n == 0) return out
    val p = new Array[Long](n)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += (if (flags(i)) etaNum else etaNum - EtaDen)
      p(i) = acc
      i += 1
    }
    val maxSuf = new Array[Long](n)
    acc = Long.MinValue
    i = n - 1
    while (i >= 0) {
      if (p(i) > acc) acc = p(i)
      maxSuf(i) = acc
      i -= 1
    }
    var minPre = 0L // min(0, min of prefix values strictly before i)
    i = 0
    while (i < n) {
      out(i) = maxSuf(i) >= minPre
      if (p(i) < minPre) minPre = p(i)
      i += 1
    }
    out
  }
}
