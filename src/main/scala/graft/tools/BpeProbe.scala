package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: per-step wall time of the BPE merge loop at a merge
  * count far past the gated merges=6, demonstrating that the every-16
  * localCheckpoint keeps step cost FLAT instead of superlinear in the
  * accumulated fold-expression chain. Prints per-step seconds grouped
  * by 8-step octave so the trend is readable at a glance. Not part of
  * the library surface.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val merges = args.headOption.map(_.toInt).getOrElse(64)
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // instrument around the public trainer: time the WHOLE train at
    // several merge counts — a superlinear per-step cost shows up as
    // total(2n) >> 2*total(n)
    def train(m: Int): Double = {
      val t0 = System.nanoTime()
      val n = graft.llm.Corpus.bpeTrain(docs, m).count()
      require(n == m)
      (System.nanoTime() - t0) / 1e9
    }
    train(4) // warm
    var prevPerStep = 0.0
    Seq(8, 16, 32, merges).foreach { m =>
      val s = train(m)
      val per = s / m
      val ratio = if (prevPerStep > 0) per / prevPerStep else 1.0
      println(f"[bpe] merges=$m%-4d total $s%7.2f s   " +
        f"per-step ${per}%5.3f s   vs-prev x$ratio%.2f")
      prevPerStep = per
    }
    spark.stop()
  }
}
