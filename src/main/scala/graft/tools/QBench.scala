package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev micro-bench: time a named subset of SparkEntry queries (all when
  * no args) with the same session shape and noop-sink methodology as
  * [[graft.Bench]] — for iterating on one hotspot without paying the
  * full bench.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
      .max(1)
    val names =
      if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // safety net: a fused stage whose single whole-stage method would
      // exceed HotSpot's 8000-byte JIT ceiling falls back to per-operator
      // codegen (still JIT-compiled) instead of running one giant
      // un-JIT-able method (~7x). The correction chains themselves now
      // stay under the ceiling (CableCorrection's two-stage projection).
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qbench] $name%-28s median=${ts.sorted.apply(runs / 2)}%8.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
