package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: decompose q_t11_contamination cost into its slices
  * (shingle hashing, probe collect, row-local screen, join screen).
  * This probe caught the InferFiltersFromGenerate duplicated-generator
  * pathology (see Corpus.explodeNoInfer). Not part of the library
  * surface.
  */
object CorpusProbe {
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

    def time(name: String)(fn: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s median ${ts.sorted.apply(1)}%.3f s" +
        s"  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.llm.{Corpus, Dedup}
    time("hashedShingles (d2 base)") { noop(Dedup.hashedShingles(docs)) }
    var probe: Array[Long] = Array.emptyLongArray
    time("probeHashes collect") { probe = Corpus.probeHashes(docs) }
    println(s"[probe] probe size = ${probe.length}")
    time("rowLocal screen") {
      noop(Corpus.contaminationWith(docs, probe))
    }
    time("join screen (current)") { noop(Corpus.contamination(docs)) }
    spark.stop()
  }
}
