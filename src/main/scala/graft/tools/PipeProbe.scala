package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe: decompose the two composed-pipeline gates' cost
  * (q_doc_pipeline, q_emb_pipeline — the slowest non-sink gates in the
  * r13 idle-JVM bench) the way S2bProbe decomposed q_s2b: each
  * constituent stage timed standalone, the composed pipeline, and a
  * `localCheckpoint(eager = false)` input variant — the storage-shape
  * A/B the DocPipeline scaladoc's "re-scans measured faster" claim
  * rests on. Run at sf0.1 (`SPARK_GRAFT_SF_DIR`); results land in
  * BENCH_NOTES.md / SCALE.md.
  */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pipe] $name%-36s median ${ts.sorted.apply(2)}%7.3f s" +
        s"  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    import graft.llm._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    println(s"== doc pipeline stages ($sfDir)")
    time("langId")(TextAnalysis.langId(docs))
    time("quality")(TextAnalysis.quality(docs))
    time("tokenStats")(TextAnalysis.tokenStats(docs))
    time("dedup.exact")(Dedup.exact(docs))
    time("dedup.duplicateClusters")(Dedup.duplicateClusters(docs))
    println("== doc pipeline composed: re-scan vs localCheckpoint")
    time("DocPipeline (re-scan, committed)")(DocPipeline(docs))
    time("DocPipeline (lazy localCheckpoint)")(
      DocPipeline(docs.localCheckpoint(eager = false)))

    println(s"== emb pipeline stages ($sfDir)")
    time("kmeans train+assign (sim5 shape)")(
      Clustering.kmeansAssign(emb))
    time("semDedup (sim6)")(Clustering.semDedup(emb, fixtureScale = true))
    println("== emb pipeline composed: re-scan vs localCheckpoint")
    time("embPipeline (re-scan, committed)")(
      Clustering.embPipeline(emb, fixtureScale = true))
    time("embPipeline (lazy localCheckpoint)")(
      Clustering.embPipeline(emb.localCheckpoint(eager = false), fixtureScale = true))
    spark.stop()
  }
}
