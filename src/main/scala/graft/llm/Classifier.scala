package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextExprs._

/** Quality-classifier training — the model-based document filter a
  * curation pipeline trains after rule-based cleaning (the
  * fastText/CCNet-style quality model of the GPT-3 / LLaMA data
  * stacks, reduced to its distributable core): a LINEAR classifier
  * over integer document statistics, trained with the full-batch
  * perceptron criterion and applied row-locally.
  *
  * Why a batch perceptron and not logistic regression: the classic
  * perceptron/SGD update is sequential (order-dependent — not
  * deterministically parallelizable), and logistic gradients go
  * through exp(), whose last-ulp behaviour differs across engines, so
  * neither can be hash-gated. The batch perceptron step
  * `w += Σ_misclassified y·x` is associative integer arithmetic:
  * EXACT under any partitioning, any engine, any evaluation order —
  * the same reason the Gopher rules are cross-multiplied integers.
  *
  * Features (all BIGINT, the same base statistics the Gopher filter
  * derives): bias 1, token count, char count net of separators,
  * distinct-token count, stop-word hits, ascii-alpha-initial tokens.
  * Labels come from the exact Gopher verdict (+1 pass / −1 fail) —
  * training a cheap model to imitate an expensive rule stack is
  * precisely how production quality filters are bootstrapped.
  *
  * 100 TB shape: ONE feature-extraction scan materialised
  * (`localCheckpoint` of the doc-sized feature frame, read by every
  * training iteration and by the apply-side scoring); each of
  * the `iters` steps is a single map-side-combined aggregate (7 longs
  * per partition) with the weight vector as 6 longs of driver model
  * state — the same budget class as the k-means/IVF trainers.
  * Application is a row-local dot product against the 6 broadcast-
  * literal weights: zero shuffle.
  */
object Classifier {

  /** Number of features incl. bias. */
  val NumFeats = 6

  /** Feature expressions over the Gopher base counts (n_chars,
    * n_tokens, n_distinct, stop_cnt, alpha_cnt), shared verbatim with
    * the oracle twin.
    */
  private[graft] val FeatSql: Seq[String] = Seq(
    "CAST(1 AS BIGINT)", "n_tokens", "n_chars - n_tokens + 1",
    "n_distinct", "stop_cnt", "alpha_cnt")

  private[graft] def labelSql: String =
    "CAST(CASE WHEN " + TextAnalysis.GopherRules.map(_._2)
      .mkString("(", ") AND (", ")") + " THEN 1 ELSE -1 END AS BIGINT)"

  /** (doc_id, x0..x5, y) feature frame. */
  private def featFrame(docs: DataFrame): DataFrame = {
    implicit val d: Dialect = SparkD
    docs
      .withColumn("toks", expr(tokens("text")))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        expr(listSize("toks")).cast("long").as("n_tokens"),
        expr(listDistinctSize("toks")).cast("long").as("n_distinct"),
        expr(TextAnalysis.stopCntSql).as("stop_cnt"),
        expr(TextAnalysis.alphaCntSql).as("alpha_cnt"))
      .select(col("doc_id") +:
        FeatSql.zipWithIndex.map { case (f, i) => expr(f).as(s"x$i") } :+
        expr(labelSql).as("y"): _*)
  }

  /** Shared trainer core: the feature frame materialised ONCE as
    * executor blocks (`localCheckpoint` — the blocks are reclaimed by
    * the context cleaner when the frame is unreachable, and every
    * training iteration AND the apply-side scoring read them, so the
    * corpus is feature-extracted exactly once), the learned per-step
    * trajectory (weights AFTER each update + misclassified count
    * BEFORE it), and the final weight vector.
    */
  private def core(docs: DataFrame, iters: Int)
      : (Seq[(Long, Array[Long], Long)], Array[Long], DataFrame) = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val f = featFrame(docs).localCheckpoint()
    val w = Array.fill(NumFeats)(0L)
    val out = Seq.newBuilder[(Long, Array[Long], Long)]
    for (step <- 1 to iters) {
      val margin = (0 until NumFeats)
        .map(i => col(s"x$i") * lit(w(i))).reduce(_ + _) * col("y")
      val agg = f.where(margin <= 0).agg(
        count(lit(1)).as("n"),
        (0 until NumFeats).map(i =>
          sum(col(s"x$i") * col("y")).as(s"d$i")): _*)
      val row = agg.collect()(0)
      val n = row.getLong(0)
      if (n > 0)
        (0 until NumFeats).foreach(i => w(i) += row.getLong(i + 1))
      out += ((step.toLong, w.clone(), n))
    }
    (out.result(), w, f)
  }

  /** Batch-perceptron TRAINING trajectory: one row per step with the
    * weights after that step's update and how many documents the
    * PRE-update weights misclassified (margin ≤ 0 — the zero-margin
    * start counts everything, as the perceptron criterion specifies).
    * Each step depends on all previous ones, so the gate hash pins
    * the whole trajectory.
    */
  def perceptronTrain(docs: DataFrame, iters: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val (traj, _, _) = core(docs, iters)
    import spark.implicits._
    traj.map { case (s, w, n) =>
      (s, w(0), w(1), w(2), w(3), w(4), w(5), n)
    }.toDF("step", "w0", "w1", "w2", "w3", "w4", "w5", "n_mis")
  }

  /** The trained weight vector alone — bounded model state (6 longs)
    * for shipping to an ingest-time scorer (see
    * [[graft.streaming.CorpusStream.classifyStream]]).
    */
  def perceptronWeights(docs: DataFrame, iters: Int = 4): Array[Long] = {
    val (_, w, _) = core(docs, iters)
    w
  }

  /** The ONE scoring projection both apply paths share: integer score
    * w·x over a prepared feature frame, the sign prediction (0 counted
    * as fail, matching the training margin convention), the Gopher
    * label it imitates, and the agreement bit. The weights are bounded
    * driver model state folded in as literals — zero shuffle.
    */
  private def scoreFrame(feats: DataFrame, w: Array[Long]): DataFrame = {
    require(w.length == NumFeats,
      s"need $NumFeats weights, got ${w.length}")
    val score = (0 until NumFeats)
      .map(i => col(s"x$i") * lit(w(i))).reduce(_ + _)
    feats
      .select(col("doc_id"), score.as("score"),
        when(score > 0, 1L).otherwise(-1L).as("pred"),
        col("y").as("label"))
      .withColumn("agree",
        (col("pred") === col("label")).cast("long"))
  }

  /** Row-local scoring of ANY frame (batch or streaming) with given
    * weights — feature extraction + [[scoreFrame]], no state.
    */
  def scoreWith(docs: DataFrame, w: Array[Long]): DataFrame =
    scoreFrame(featFrame(docs), w)

  /** Row-local APPLICATION of the trained classifier over the SAME
    * (checkpoint-materialised) feature frame the trainer read — the
    * corpus is feature-extracted exactly once across train + apply.
    */
  def perceptronApply(docs: DataFrame, iters: Int = 4): DataFrame = {
    val (_, w, feats) = core(docs, iters)
    scoreFrame(feats, w)
  }
}
