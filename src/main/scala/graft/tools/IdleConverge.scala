package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: per-run wall times of one query in a fresh JVM, enough
  * consecutive runs to see where JIT actually converges — evidence
  * for how many idle-JVM warm-up discards Bench.runOne needs. Not
  * part of the library surface.
  */
object IdleConverge {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_k2d_ms_antenna")
    val runs = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    spark.range(100000).groupBy(org.apache.spark.sql.functions
      .expr("id % 100")).count().collect()
    val fn = graft.SparkEntry.queries(name)
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"[idle] $name runs: " +
      ts.map(t => f"$t%.2f").mkString(", "))
  }
}
