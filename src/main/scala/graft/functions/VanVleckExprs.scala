package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftSqlShim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd Van Vleck kernels — the CellTopK treatment for the
  * preprocess chain's one genuinely iterative per-row math
  * (graft.ops.VanVleck's previous `udf(...)` call sites).
  *
  * Why expressions instead of Scala UDFs (optimization-guide §4 "prefer
  * built-ins/codegen", §1.2 per-task work): a 3-double-arg ScalaUDF
  * boxes every argument and result per row, and the old shared
  * `ConcurrentHashMap[(Double, Double, Double, Boolean), Double]` memo
  * in front of it allocated a Tuple4 + 3 boxed doubles PER PROBE and
  * took a map-bin lock while running the Newton+Simpson integration
  * inside `computeIfAbsent` — under a cold 32-thread populate the bins
  * serialise exactly when every thread misses (the r21 32-core
  * pp3/doc pathology: threads convoy on hot bins while each holds a
  * multi-microsecond integration, and the allocation storm feeds GC).
  * Here the kernel call is a primitive-signature method on a reference
  * object (zero boxing, codegen-stable source — janino compiles the
  * plan shape once), and the memo is a PER-THREAD open-addressing
  * table keyed by the raw IEEE bits (zero allocation per probe, zero
  * sharing, zero locks). Duplicate integrations across threads are
  * bounded by each thread's working set and are strictly cheaper than
  * bin-lock convoys; the kernel is pure, so any cache policy is
  * result-identical (retry-safe, engine-exact).
  */
final class VanVleckCrossMemo(val refCap: Boolean) extends Serializable {

  /** Measured key space (graft.tools.VvProbe at sf0.1): 4.35M probes
    * per preprocess-chain execution over 920,898 DISTINCT (khat, sx,
    * sy) triples (1997 khats × 1778 σ pairs realised); one task
    * thread's share is ~8–40k distinct. Two tiers follow from that:
    *
    *  - '''L1, per thread''': open addressing on raw bits, zero
    *    allocation, zero sharing — absorbs the in-task hot keys.
    *    2^17 slots ≈ 4.2 MB/thread, insert cap 75%.
    *  - '''L2, shared''': pre-sized ConcurrentHashMap so every thread
    *    benefits from every other thread's integrations (per-thread-
    *    only caching re-integrates ~30× more than necessary at this
    *    cardinality — measured 16× slower on q_c5_van_vleck). The
    *    r21 pathology is NOT the sharing itself but
    *    `computeIfAbsent` holding the bin lock for the whole
    *    multi-microsecond Newton+Simpson integration under cold
    *    32-thread population; here the compute happens OUTSIDE any
    *    lock (lock-free get → compute → putIfAbsent), so a concurrent
    *    duplicate integration is bounded waste, never a convoy.
    *
    * Raw-bits keying is exact: distinct bit patterns are distinct
    * keys (−0.0 ≠ 0.0, one NaN payload per pattern) and the kernel is
    * a pure function of the bits, so a hit returns the identical
    * double a miss would compute — retry-safe, engine-exact.
    */
  // ALL memo state is JVM-STATIC (held by the companion, keyed by the
  // cap policy), NEVER instance state: this instance rides the plan's
  // references array into every serialized task binary, so instance
  // fields would deserialise as a FRESH copy per task — fresh 4 MB L1
  // arrays allocated+zeroed per task, no sharing even within a thread
  // (measured: 14× slower than the static shared map on
  // q_c5_van_vleck). The static state is identical for every
  // deserialised copy with the same refCap — results depend only on
  // the pure kernel, so JVM-wide sharing is correctness-neutral.
  private def state: VanVleckCrossMemo.State =
    VanVleckCrossMemo.stateFor(refCap)

  /** Memoised [[VanVleckKernel.vanVleckCrossInt]] — bit-exact. */
  def cross(k: Double, x: Double, y: Double): Double =
    state.cross(k, x, y, refCap)
}

object VanVleckCrossMemo {
  /** splitmix64-style avalanche over the three key words — shared by
    * the L1 probe and the L2 key hash.
    */
  private[functions] def mix(kb: Long, xb: Long, yb: Long): Long = {
    var h = kb + 0x9e3779b97f4a7c15L * xb + 0xc2b2ae3d27d4eb4fL * yb
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** JVM-static two-tier memo state (one per cap policy). */
  private[functions] final class State {
    /** Per-thread L1: open addressing on raw bits, zero allocation,
      * zero sharing. 2^17 slots ≈ 4.2 MB/thread, insert cap 75%.
      */
    private final class Table {
      val cap = 1 << 17
      val mask = cap - 1
      val maxFill = cap - (cap >> 2) // 75%
      val kk = new Array[Long](cap)
      val xx = new Array[Long](cap)
      val yy = new Array[Long](cap)
      val vv = new Array[Double](cap)
      val occ = new Array[Boolean](cap)
      var filled = 0
    }

    /** Packed L2 key — 3 raw double words + cached hash; one small
      * allocation per L1 miss (the replaced Tuple4 allocated five).
      */
    private final class Key(val kb: Long, val xb: Long, val yb: Long) {
      override val hashCode: Int = mix(kb, xb, yb).toInt
      override def equals(o: Any): Boolean = o match {
        case k: Key => k.kb == kb && k.xb == xb && k.yb == yb
        case _ => false
      }
    }

    private val tls = ThreadLocal.withInitial[Table](() => new Table)
    // shared L2, pre-sized beyond the measured 921k distinct triples
    // so cold population never resizes; the insert cap bounds executor
    // memory at any scale (~48 B/entry => <= ~200 MB, reached only if
    // a corpus realises >4M distinct quantised triples per JVM)
    private val shared =
      new java.util.concurrent.ConcurrentHashMap[Key, java.lang.Double](
        1 << 21)
    private val sharedSize =
      new java.util.concurrent.atomic.LongAdder
    private val SharedCap = 4L << 20

    def cross(k: Double, x: Double, y: Double,
              refCap: Boolean): Double = {
      val t = tls.get()
      val kb = java.lang.Double.doubleToRawLongBits(k)
      val xb = java.lang.Double.doubleToRawLongBits(x)
      val yb = java.lang.Double.doubleToRawLongBits(y)
      var i = mix(kb, xb, yb).toInt & t.mask
      while (t.occ(i)) {
        if (t.kk(i) == kb && t.xx(i) == xb && t.yy(i) == yb)
          return t.vv(i)
        i = (i + 1) & t.mask
      }
      val key = new Key(kb, xb, yb)
      val cached = shared.get(key)
      val v =
        if (cached != null) cached.doubleValue()
        else {
          // compute OUTSIDE any lock; racing threads may duplicate
          // the integration (identical result - pure function), the
          // winner's entry stays
          val c = VanVleckKernel.vanVleckCrossInt(k, x, y, refCap)
          if (sharedSize.sum() < SharedCap &&
              shared.putIfAbsent(key,
                java.lang.Double.valueOf(c)) == null)
            sharedSize.increment()
          c
        }
      if (t.filled < t.maxFill) {
        t.kk(i) = kb; t.xx(i) = xb; t.yy(i) = yb; t.vv(i) = v
        t.occ(i) = true
        t.filled += 1
      }
      v
    }
  }

  private val stateTrue = new State
  private val stateFalse = new State
  private[functions] def stateFor(refCap: Boolean): State =
    if (refCap) stateTrue else stateFalse

  /** One shared memo per cap policy: every plan's expression carries
    * the same reference object, so generated sources are identical
    * across gates/iterations (janino caches the plan shape) and the
    * per-thread tables warm once per JVM, not once per query.
    */
  val refCapTrue = new VanVleckCrossMemo(true)
  val refCapFalse = new VanVleckCrossMemo(false)
  def forPolicy(refCap: Boolean): VanVleckCrossMemo =
    if (refCap) refCapTrue else refCapFalse
}

/** κ̂ → κ cross dequantisation as a ternary codegen expression.
  * NULL semantics match the replaced primitive-arg Scala UDF exactly:
  * any NULL input yields NULL (nullIntolerant — Spark wrapped the
  * primitive UDF in the same null checks).
  */
case class VanVleckCross(first: Expression, second: Expression,
                         third: Expression, memo: VanVleckCrossMemo)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "van_vleck_cross expects (DOUBLE, DOUBLE, DOUBLE), got (" +
        Seq(first, second, third).map(_.dataType.catalogString)
          .mkString(", ") + ")")

  override def nullSafeEval(k: Any, x: Any, y: Any): Any =
    memo.cross(k.asInstanceOf[Double], x.asInstanceOf[Double],
      y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vvCrossMemo", memo,
      classOf[VanVleckCrossMemo].getName)
    nullSafeCodeGen(ctx, ev, (k, x, y) =>
      s"${ev.value} = $ref.cross($k, $x, $y);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): VanVleckCross =
    copy(first = f, second = s, third = t)
}

/** σ̂ → σ auto inversion ([[VanVleckKernel.vanVleckAuto]]) as a unary
  * codegen expression — runs once per (t, ant, chan) σ cell, so it
  * needs no memo; the expression form keeps the σ derivation inside
  * whole-stage codegen (no ScalaUDF node, no boxing) and the plan
  * source stable.
  */
case class VanVleckAuto(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"van_vleck_auto expects DOUBLE, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    VanVleckKernel.vanVleckAuto(s.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.VanVleckKernel.vanVleckAuto($s);")

  override protected def withNewChildInternal(
      newChild: Expression): VanVleckAuto = copy(child = newChild)
}

object VanVleckExprs {
  /** Column builders for the ops layer. */
  def cross(refCap: Boolean)(k: Column, sx: Column, sy: Column): Column =
    GraftSqlShim.column(VanVleckCross(
      GraftSqlShim.expression(k), GraftSqlShim.expression(sx),
      GraftSqlShim.expression(sy), VanVleckCrossMemo.forPolicy(refCap)))

  def auto(s: Column): Column =
    GraftSqlShim.column(VanVleckAuto(GraftSqlShim.expression(s)))
}
