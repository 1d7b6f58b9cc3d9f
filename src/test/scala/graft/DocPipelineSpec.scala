package graft

import graft.llm.{DocPipeline, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DocPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("doc pipeline survivors carry full metadata and respect filters") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = DocPipeline(docs, minQuality = 0.4).cache()
    val n = out.count()
    assert(n > 0 && n <= docs.count())
    assert(out.where(col("quality_score_u") < 400000L).count() == 0)
    assert(out.select("doc_id").distinct().count() == n) // deduped
    assert(out.columns.toSet.contains("n_subword_est"))
  }

  test("hot-bucket guard: a skewBoilerplate corpus through the " +
    "composed pipeline stays sublinear in candidate pairs") {
    import graft.llm.Dedup
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val skewed = Dedup.skewBoilerplate(docs) // every 5th doc identical
    val hot = n / 5 // size of the one quadratic band bucket
    assert(hot > Dedup.MinDerivedCap &&
      hot > math.ceil(math.sqrt(n.toDouble)).toLong,
      s"fixture too small to exercise the guard (n=$n)")
    // unguarded stress shape: the boilerplate bucket contributes all
    // C(hot, 2) pairs
    val uncapped = Dedup.lshCandidates(skewed, hotBucketCap = 0).count()
    assert(uncapped >= hot * (hot - 1) / 2)
    // production DEFAULT (derived cap): the quadratic bucket is
    // excluded, candidates stay at most linear in the corpus
    val capped = Dedup.lshCandidates(skewed).count()
    assert(capped < uncapped / 4 && capped <= 4L * n,
      s"derived cap did not bound candidates: capped=$capped " +
        s"uncapped=$uncapped n=$n")
    // the composed pipeline inherits the guard through
    // duplicateClusters — AND loses nothing: the boilerplate class is
    // exact-duplicate text, so the exact-dedup screen still collapses
    // it to one canonical representative
    val out = DocPipeline(skewed).cache()
    val survivors = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val stamped = skewed
      .where(col("text") === Dedup.BoilerplateText)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((survivors & stamped).size <= 1,
      "exact dedup must collapse the boilerplate class without the " +
        "cluster stage")
    out.unpersist()
  }

  test("curation: packed tokens equal the tokens of exactly the docs " +
    "that pass ALL four screens") {
    import graft.llm.{Corpus, Dedup}
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = DocPipeline.curation(docs).cache()
    assert(out.count() > 0)
    // independently recompute the survivor set and its token total
    val good = TextAnalysis.gopherFilter(docs)
      .where(col("pass") === 1).select("doc_id")
    val keep = Dedup.exact(docs)
      .select(col("keep_doc_id").as("doc_id"))
    val clean = Corpus.contamination(docs)
      .where(!col("contaminated")).select("doc_id")
    val sel = Corpus.dsirScore(docs)
      .where(col("selected") === 1).select("doc_id")
    val nearDrop = Dedup.duplicateClusters(docs)
      .where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val surv = docs
      .join(good, Seq("doc_id"), "left_semi")
      .join(keep, Seq("doc_id"), "left_semi")
      .join(clean, Seq("doc_id"), "left_semi")
      .join(sel, Seq("doc_id"), "left_semi")
      .join(nearDrop, Seq("doc_id"), "left_anti")
    val survTok = surv
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .agg(sum("n")).head().getLong(0)
    // token conservation: the packer emits exactly the survivors'
    // tokens, and every survivor starts in exactly one sequence
    assert(out.agg(sum("n_tokens")).head().getLong(0) == survTok)
    assert(out.agg(sum("n_starts")).head().getLong(0) == surv.count())
    // the benchmark split is never packed (no survivor has
    // doc_id % 97 == 0 — it is eval data)
    assert(surv.where(col("doc_id") % 97 === 0).count() == 0)
  }

  test("curation build/serve split: packing a materialised survivor " +
    "mirror equals the composed pipeline, and the serve plan needs " +
    "neither exchange nor sort before its window") {
    import graft.llm.{Corpus, DocPipeline}
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val composed = DocPipeline.curation(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val table = "curation_surv_spec"
    graft.sinks.Sinks.writeSourceDocMirror(
      DocPipeline.survivors(docs), table)
    val servedDf = Corpus.seqPack(spark.table(table))
    val served = servedDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(served == composed,
      "serve-from-mirror must equal the composed pipeline")
    // the bucketed+sorted mirror satisfies the packer window's
    // required distribution AND ordering: no shuffle exchange, no
    // explicit sort before the window in the executed plan
    val plan = servedDf.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"serve plan must not shuffle:\n${plan.take(600)}")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("fast fingerprint: deterministic, discriminating, shingle-stable") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextAnalysis.fingerprintFast(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = TextAnalysis.fingerprintFast(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.sameElements(b), "must be deterministic across runs")
    // distinct texts ⇒ (near-)distinct 64-bit hashes
    val nDocs = docs.count()
    val nDistinctText = docs.select("text").distinct().count()
    assert(a.map(_._2).distinct.length >= nDistinctText - 1)
    assert(nDocs == a.length)
  }

  test("connected components: converges past a fixed-4-iteration horizon") {
    import spark.implicits._
    // a 12-vertex path graph: the min label (0) spreads one hop per
    // round, so the old fixed-4-iteration propagation left the far end
    // of any chain longer than ~5 in its own cluster — convergence-based
    // propagation must collapse the whole path to cluster 0
    val edges = (0L until 11L).map(i => (i, i + 1)).toDF("a", "b")
    val sym = edges.unionAll(
      edges.select(col("b").as("a"), col("a").as("b")))
    val labs = graft.llm.Dedup.connectedComponents(sym)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labs.size == 12)
    assert(labs.values.forall(_ == 0L),
      s"chain must collapse to a single cluster: $labs")
  }

  test("rolling hash: sliding windows match direct polynomial evaluation") {
    val text = "the quick brown fox jumps over the lazy dog"
    val window = 8
    val hashes = TextAnalysis.rollingHash(text, window)
    val bytes = text.getBytes("UTF-8").map(b => (b & 0xff).toLong)
    val P = 1000000007L
    val B = 257L
    def direct(from: Int): Long =
      (from until from + window).foldLeft(0L)((acc, i) =>
        (acc * B + bytes(i)) % P)
    assert(hashes.length == bytes.length - window + 1)
    hashes.zipWithIndex.foreach { case (h, i) =>
      assert(h == direct(i), s"window $i")
    }
  }

  test("rolling hash: short and empty inputs") {
    assert(TextAnalysis.rollingHash("", 8).toSeq == Seq(0L))
    val one = TextAnalysis.rollingHash("abc", 8)
    assert(one.length == 1 && one(0) > 0)
  }
}
