package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: split a query's driver-side cost into Catalyst phases
  * (analysis / optimization / physical planning, from Spark's own
  * QueryPlanningTracker) plus wall time for DataFrame CONSTRUCTION
  * (driver collects, fixture writes) and execution — decides whether a
  * gap-bound gate needs a smaller plan or fewer driver round-trips.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
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

    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warm-up discard
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = System.nanoTime()
        val qe = df.queryExecution
        qe.assertAnalyzed()
        val tAna = System.nanoTime()
        qe.executedPlan // forces optimization + physical planning
        val tPlan = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tExec = System.nanoTime()
        val ph = qe.tracker.phases.map { case (k, v) =>
          f"$k=${(v.endTimeMs - v.startTimeMs) / 1000.0}%.2fs"
        }.mkString(" ")
        println(f"[phase] $name%-28s construct=${(tBuild - t0) / 1e9}%6.2f " +
          f"analyze=${(tAna - tBuild) / 1e9}%5.2f " +
          f"optimize+plan=${(tPlan - tAna) / 1e9}%5.2f " +
          f"exec(write)=${(tExec - tPlan) / 1e9}%6.2f  [$ph]")
      }
    }
    spark.stop()
  }
}
