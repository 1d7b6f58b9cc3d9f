package graft

import graft.llm.Classifier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Batch-perceptron quality classifier: hand-computed trajectory on a
  * two-document fixture (every update is exact integer arithmetic, so
  * the whole trajectory is checkable by hand), plus apply-side
  * consistency. The cross-engine twin is driven by the
  * q_t20/q_t20b oracle gates.
  */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsOf(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "lang", "text")
  }

  // docA fails Gopher (3 words < 20) -> y = -1;
  // features [1, 3, 7, 2, 2, 3]
  private val docA = (1L, "en", "the the x")
  // docB passes every rule -> y = +1; 18 distinct 4-char tokens + two
  // stop words: features [1, 20, 78, 19, 2, 20]
  private val docB = (2L, "en",
    (1 to 18).map(i => f"tk$i%02d").mkString(" ") + " the the")

  test("perceptronTrain: hand-computed integer trajectory") {
    val out = Classifier.perceptronTrain(docsOf(docA, docB), iters = 3)
      .collect()
      .map(r => (r.getLong(0), (1 to 6).map(r.getLong).toSeq,
        r.getLong(7)))
      .sortBy(_._1)
    // step 1: w = 0 misclassifies both (margin 0), update = yB·xB + yA·xA
    assert(out(0) == ((1L, Seq(0L, 17L, 71L, 17L, 0L, 17L), 2L)))
    // step 2: only docA misclassified (margin -633); w -= xA
    assert(out(1) == ((2L, Seq(-1L, 14L, 64L, 15L, -2L, 14L), 1L)))
    // step 3: docA again (margin -557)
    assert(out(2) == ((3L, Seq(-2L, 11L, 57L, 13L, -4L, 11L), 1L)))
  }

  test("perceptronApply: scores are the final-weight dot products; " +
    "agree bit is exact") {
    val out = Classifier.perceptronApply(docsOf(docA, docB), iters = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // w3 = [-2, 11, 57, 13, -4, 11]
    assert(out(1L) == ((481L, 1L, -1L, 0L)))
    assert(out(2L) == ((5123L, 1L, 1L, 1L)))
  }

  test("training on real testdata: step-1 misclassifies everything " +
    "and the trajectory is deterministic across runs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val t1 = Classifier.perceptronTrain(docs, iters = 4).collect()
      .map(_.toSeq).sortBy(_.head.toString)
    val t2 = Classifier.perceptronTrain(docs, iters = 4).collect()
      .map(_.toSeq).sortBy(_.head.toString)
    assert(t1.toSeq == t2.toSeq)
    val step1 = t1.find(_.head == 1L).get
    assert(step1.last == docs.count())
  }
}
