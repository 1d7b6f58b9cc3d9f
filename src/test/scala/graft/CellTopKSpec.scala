package graft

import graft.functions.CellTopK
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the fused [[graft.functions.CellTopK]] ranking
  * against the array_sort-of-structs SQL form it replaced: the two
  * must agree on EVERY row of the real embeddings corpus (both
  * float-family and micro-unit-double-family scores, winner and
  * top-n probe prefixes, subspace offsets) and on constructed
  * rounded-score ties — any divergence would flip the sim/clustering
  * gate hashes.
  */
class CellTopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")

  private def halfNormF(v: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    s / 2.0
  }

  private def halfNormD(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    s / 2.0
  }

  /** The REPLACED float-family form, verbatim (ex cellRankExpr). */
  private def legacyRankF(cents: Array[(Int, Array[Float])],
                          vecCol: Column, offset: Int,
                          subDim: Int): Column =
    array_sort(array(cents.toIndexedSeq.map { case (cid, ce) =>
      struct(
        (-round(call_function("float_dot",
          slice(vecCol, offset + 1, subDim), lit(ce))
          - lit(halfNormF(ce)), 6)).as("ns"),
        lit(cid).as("cid"))
    }: _*))

  /** The REPLACED micro-double form, verbatim (ex cellSortD). */
  private def legacyRankD(cw: Array[(Int, Array[Double])],
                          vecCol: Column, offset: Int,
                          subDim: Int): Column =
    array_sort(array(cw.toIndexedSeq.map { case (cid, v) =>
      struct(
        (-round((call_function("double_dot",
          slice(vecCol, offset + 1, subDim), lit(v))
          - lit(halfNormD(v))) / lit(1.0e12), 6)).as("ns"),
        lit(cid).as("cid"))
    }: _*))

  private def seedsF(n: Int): Array[(Int, Array[Float])] =
    emb.where(col("vec_id") < n)
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  private def quantD = {
    graft.functions.DoubleVecDot.register(spark)
    emb.select(col("vec_id"), expr(
      "transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000.0))")
      .as("qv"))
  }

  private def assertAgree(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.where(
      col("legacy").cast("string") =!= col("fused").cast("string"))
    assert(bad.isEmpty, s"rows disagree: ${bad.head(3).mkString(" | ")}")
  }

  test("float family: winner and top-4 match the array_sort form " +
    "on every corpus row, full vector and subspace offsets") {
    graft.functions.FloatVecDot.register(spark)
    val cents = seedsF(16)
    // full-vector winner + probe prefix
    assertAgree(emb.select(
      slice(legacyRankF(cents, col("embedding"), 0, 64), 1, 4)
        .as("legacy"),
      CellTopK.rankF(col("embedding"), cents, nTop = 4).as("fused")))
    // subspace offset (the PQ code shape): subDim 8, subspace 5
    val books = cents.map { case (cid, v) => (cid, v.slice(40, 48)) }
    assertAgree(emb.select(
      slice(legacyRankF(books, col("embedding"), 40, 8), 1, 1)
        .as("legacy"),
      CellTopK.rankF(col("embedding"), books, nTop = 1, offset = 40)
        .as("fused")))
  }

  test("micro-double family: winner and top-4 match the array_sort " +
    "form on every corpus row, full vector and subspace offsets") {
    val q = quantD
    val cents = q.where(col("vec_id") < 16)
      .select(col("vec_id").cast("int"), col("qv")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    assertAgree(q.select(
      slice(legacyRankD(cents, col("qv"), 0, 64), 1, 4).as("legacy"),
      CellTopK.rankD(col("qv"), cents, 1.0e12, nTop = 4).as("fused")))
    val books = cents.map { case (cid, v) => (cid, v.slice(16, 24)) }
    assertAgree(q.select(
      slice(legacyRankD(books, col("qv"), 16, 8), 1, 1).as("legacy"),
      CellTopK.rankD(col("qv"), books, 1.0e12, nTop = 1, offset = 16)
        .as("fused")))
  }

  test("rounded-score ties break identically (smaller cid wins), " +
    "including the zero-score -0.0-negation edge") {
    graft.functions.DoubleVecDot.register(spark)
    import spark.implicits._
    // centroids engineered so several cells tie after round(.,6):
    // c0/c1 identical (exact tie), c2 zero (score ties at 0 against
    // an orthogonal vector), c3 differs below the rounding grain
    val cents: Array[(Int, Array[Double])] = Array(
      0 -> Array(1e6, 0.0), 1 -> Array(1e6, 0.0),
      2 -> Array(0.0, 0.0), 3 -> Array(1e6, 1e-7))
    val rows = Seq(
      Seq(1e6, 0.0), Seq(0.0, 1e6), Seq(-1e6, 0.0), Seq(0.0, 0.0))
      .toDF("qv")
    assertAgree(rows.select(
      slice(legacyRankD(cents, col("qv"), 0, 2), 1, 4).as("legacy"),
      CellTopK.rankD(col("qv"), cents, 1.0e12, nTop = 4).as("fused")))
  }

  test("analysis fails loudly on a wrong-typed input column") {
    val cents: Array[(Int, Array[Double])] = Array(0 -> Array(1.0, 2.0))
    import spark.implicits._
    val bad = Seq(Seq("a", "b")).toDF("qv")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      bad.select(CellTopK.rankD(col("qv"), cents, 1.0e12, 1)).collect()
    }
  }
}
