package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query is forced through the `noop` sink — `count()` would let
  * Catalyst prune the computed columns and time only the scan. A small
  * warmup job absorbs JVM/codegen startup so per-query numbers measure
  * the plan, not classloading.
  *
  * Methodology (matches the QBench dev tool so round-over-round and
  * spot-check numbers are comparable): each query runs
  * SPARK_GRAFT_BENCH_RUNS + 1 times BACK-TO-BACK — the first run is a
  * warm-up DISCARD (it pays that query's codegen/classload/page-cache
  * cost) and the median of the remaining runs is reported. The earlier
  * interleaved-suite design (run the whole suite N times, median per
  * query across passes) made every sample cold-ish once the suite grew
  * past ~80 queries: by a query's second pass, dozens of other plans
  * had evicted its JIT/code-cache state, which showed up as a uniform
  * ~1.5x inflation that masked real per-query regressions.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // fused correction pipelines can exceed HotSpot's 8000-byte JIT
      // ceiling in one whole-stage method; falling such stages back to
      // per-operator codegen keeps them JIT-compiled (3x on q_s2b)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: codegen + shuffle machinery
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    spark.range(100000).groupBy(org.apache.spark.sql.functions
      .expr("id % 100")).count().collect()

    def timeOnce(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // per-query consecutive runs: 1 warm-up discard + `runs` timed
    val results = ordered.map { case (name, fn) =>
      timeOnce(name, fn) // warm-up, discarded
      name -> median((1 to runs).map(_ => timeOnce(name, fn)))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs}""")
    spark.stop()
  }
}
