package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen'd sign-projection LSH bucket over the WIDE (quadratic-
  * residue) plane family — the full `nPlanes`-bit bucket of an
  * ARRAY<FLOAT> embedding in one tight fused loop.
  *
  * Why a custom Expression: the SQL form
  * ([[graft.llm.Similarity.bucketSqlPlanes]]) is `nPlanes`
  * `aggregate()` higher-order folds, each evaluating an interpreted
  * lambda per element per row — 24 planes × 64 dims = 1536
  * interpreted lambda calls per row, the entire row-local cost of the
  * derived-plane near-dup path (q_d5) at scale. This compiles to a
  * nested Java loop inside whole-stage codegen (SURVEY §2 preference
  * order: native Expression with doGenCode over UDF).
  *
  * Numeric parity (oracle-checked): per plane j, the dot accumulates
  * `acc += (double) v[d] * (double) comp(j, d)` from 0.0 in element
  * order, where `comp` is [[graft.llm.Similarity.planeComponentWide]]
  * evaluated in exact 64-bit integer arithmetic —
  * h = ((j·64 + d)·2654435761) mod 1000003, comp = (h² mod 1000003)
  * mod 19 − 9. Both are bit-identical to the sequential SQL fold the
  * DuckDB twin runs, so swapping this in changes no gate hash (the
  * spec pins expression ≡ SQL on every row of a synthetic corpus).
  * Bit j weights 2^j, so the p-plane bucket is `result % 2^p` exactly
  * as the SQL shape guarantees.
  */
case class SignBucketWide(child: Expression, nPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  /** Wrong-typed input (e.g. ARRAY<DOUBLE>) must fail ANALYSIS, not
    * silently misread bytes through getFloat (AbstractDataType is
    * private[sql], so this is the checkInputDataTypes spelling of
    * ExpectsInputTypes).
    */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "sign_bucket_wide expects ARRAY<FLOAT>, got " +
          other.catalogString)
    }
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    SignBucketWide.requireDim(n)
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        val h = ((j * 64L + d) * 2654435761L) % 1000003L
        val c = (h * h % 1000003L) % 19L - 9L
        acc += v.getFloat(d).toDouble * c.toDouble
        d += 1
      }
      if (acc > 0) bucket += (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $v.numElements();
         |graft.functions.SignBucketWide.requireDim($n);
         |long $bucket = 0L;
         |for (int $j = 0; $j < $nPlanes; $j++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $h = (($j * 64L + $d) * 2654435761L) % 1000003L;
         |    long $c = ($h * $h % 1000003L) % 19L - 9L;
         |    $acc += (double) $v.getFloat($d) * (double) $c;
         |  }
         |  if ($acc > 0) $bucket += (1L << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SignBucketWide = copy(child = newChild)
}

object SignBucketWide {
  /** The plane-component hash strides by a HARD-CODED 64 dims
    * (`(j*64 + d) * 2654435761`, mirrored in
    * [[graft.llm.Similarity.planeComponentWide]]): for an embedding
    * with more than 64 dims, plane j at dim d would collide with
    * plane j+1 at dim d−64, silently correlating "independent"
    * planes. Every current corpus is dim-64 by contract; this guard
    * makes a wider one fail LOUDLY instead of degrading bucket
    * quality (called from both eval and generated code).
    */
  def requireDim(n: Int): Unit =
    if (n > 64)
      throw new IllegalArgumentException(
        s"sign_bucket_wide: embedding has $n dims but the plane " +
          "family strides by 64 — planes would alias for dim > 64; " +
          "widen the stride in planeComponentWide/SignBucketWide " +
          "together before raising the dim")

  /** Register `sign_bucket_wide(v, nPlanes)` (nPlanes a foldable INT
    * literal) in the session's function registry.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sign_bucket_wide", exprs => {
        require(exprs.length == 2,
          "sign_bucket_wide(v, nPlanes) takes exactly 2 arguments")
        val p = exprs(1) match {
          case e if e.foldable =>
            e.eval().asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"sign_bucket_wide: nPlanes must be a literal, got $other")
        }
        SignBucketWide(exprs(0), p)
      }, "built-in")
}
