package graft

import graft.functions.{AdcScore, DoubleVecDot}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the fused [[graft.functions.AdcScore]] candidate
  * score against the slice/element_at/double_dot SQL stack it
  * replaced (the r22 rerank-family fusion): both forms must agree on
  * every (query, candidate) pair of the real embeddings corpus, for
  * the raw-vector ADC and the residual (cell-term) variant, and under
  * NULL inputs — any divergence would flip the sim11–15/17–19 and
  * sim8 gate hashes.
  */
class AdcScoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dim = 64
  private val m = 8
  private val subDim = dim / m

  /** Deterministic micro-unit "trained" books/centroids — values on
    * the micro grid like the real trainers' exact rationals.
    */
  private def books(nCodes: Int): Array[Array[(Int, Array[Double])]] =
    Array.tabulate(m)(s => Array.tabulate(nCodes)(c =>
      (c, Array.tabulate(subDim)(i =>
        (((s * 31 + c * 17 + i * 7) % 1997) - 998) * 1.0e6 / 3.0))))

  private def cents(n: Int): Array[(Int, Array[Double])] =
    Array.tabulate(n)(c => (c, Array.tabulate(dim)(i =>
      math.rint((((c * 13 + i * 5) % 997) - 498) * 1.0e6 / 7.0))))

  /** The REPLACED form, verbatim (ex adcTopKD score column). */
  private def legacyScore(bs: Array[Array[(Int, Array[Double])]],
                          cellDot: Option[Column]): Column = {
    val cwLit = Array.tabulate(m)(s =>
      typedLit(bs(s).map(_._2.toSeq).toSeq))
    val scoreCol = (cellDot.toSeq ++ (0 until m).map { s =>
      call_function("double_dot",
        slice(col("qe"), s * subDim + 1, subDim),
        element_at(cwLit(s), col(s"c$s") + 1))
    }).reduce(_ + _)
    round(scoreCol / lit(1.0e12), 6)
  }

  /** (qe, cell, c0..c7) pairs from the real corpus: qe is the
    * micro-quantised embedding, codes/cell derive deterministically
    * from vec_id.
    */
  private def pairs(nCodes: Int, nCells: Int) = {
    DoubleVecDot.register(spark)
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> double(round(x * 1e6)))")
          .as("qe"))
      .withColumn("cell",
        (col("vec_id") % nCells).cast("int"))
      .withColumns((0 until m).map(s =>
        s"c$s" -> ((col("vec_id") * (s + 3) + s) % nCodes).cast("int"))
        .toMap)
  }

  test("fused ADC score is bit-identical to the SQL stack (raw)") {
    val bs = books(16)
    val df = pairs(16, 16).withColumn("fused",
        AdcScore.score(col("qe"), (0 until m).map(s => col(s"c$s")),
          bs, subDim, 1.0e12))
      .withColumn("legacy", legacyScore(bs, None))
    val bad = df.where(
      col("fused") =!= col("legacy") ||
        col("fused").isNull =!= col("legacy").isNull).count()
    assert(bad == 0, s"$bad rows diverge (raw ADC)")
    assert(df.count() > 0)
  }

  test("fused ADC score is bit-identical to the SQL stack (residual)") {
    val bs = books(16)
    val cq = cents(16)
    val cqLit = typedLit(cq.map(_._2.toSeq).toSeq)
    val cellDot = call_function("double_dot", col("qe"),
      element_at(cqLit, col("cell") + 1))
    val df = pairs(16, 16).withColumn("fused",
        AdcScore.scoreWithCell(col("qe"), col("cell"),
          (0 until m).map(s => col(s"c$s")), bs, cq, subDim, 1.0e12))
      .withColumn("legacy", legacyScore(bs, Some(cellDot)))
    val bad = df.where(
      col("fused") =!= col("legacy") ||
        col("fused").isNull =!= col("legacy").isNull).count()
    assert(bad == 0, s"$bad rows diverge (residual ADC)")
  }

  test("NULL inputs propagate like the replaced chain") {
    val bs = books(4)
    val df = pairs(4, 4)
      .withColumn("qe", when(col("vec_id") % 5 === 0, col("qe")))
      .withColumn("c0", when(col("vec_id") % 3 === 0, col("c0")))
      .withColumn("fused",
        AdcScore.score(col("qe"), (0 until m).map(s => col(s"c$s")),
          bs, subDim, 1.0e12))
      .withColumn("legacy", legacyScore(bs, None))
    val bad = df.where(
      col("fused").isNull =!= col("legacy").isNull ||
        (col("fused").isNotNull && col("fused") =!= col("legacy")))
      .count()
    assert(bad == 0, s"$bad rows diverge under NULLs")
    // some rows must actually BE null for the case to bite
    assert(df.where(col("fused").isNull).count() > 0)
  }
}
