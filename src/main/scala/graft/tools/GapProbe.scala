package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiler for the optimization rounds: run named SparkEntry
  * queries with a listener recording every job's [start, end] wall
  * interval, then report (a) total wall, (b) wall covered by >=1
  * running job (union of intervals), and (c) the driver-side GAP —
  * wall where NO job ran: plan analysis/optimisation, codegen,
  * driver-side collects' scheduling, model math between jobs.
  *
  * The split decides the optimization: a job-time-bound gate needs
  * fewer/cheaper jobs (guide §2); a gap-bound gate needs smaller
  * plans / fewer sequential driver round-trips (guide §7.3).
  */
object GapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
      .max(1)
    require(args.nonEmpty, "usage: GapProbe <query> [query...]")
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

    val intervals =
      scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val starts = scala.collection.mutable.Map[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.synchronized { starts(j.jobId) = System.nanoTime() }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(j.jobId).foreach(s =>
            intervals += ((s, System.nanoTime())))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def unionSec(iv: Seq[(Long, Long)]): Double = {
      val s = iv.sortBy(_._1)
      var covered = 0L
      var end = Long.MinValue
      s.foreach { case (a, b) =>
        if (a > end) { covered += b - a; end = b }
        else if (b > end) { covered += b - end; end = b }
      }
      covered / 1e9
    }

    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warm-up discard (codegen/classload), then measured runs
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val stats = (1 to runs).map { _ =>
        Thread.sleep(400) // async listener bus drain
        intervals.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400)
        val iv = intervals.toVector
        (wall, unionSec(iv), iv.length)
      }
      val best = stats.minBy(_._1)
      println(f"[gap] $name%-30s wall=${best._1}%7.3f s  " +
        f"job-covered=${best._2}%7.3f s  gap=${best._1 - best._2}%7.3f s  " +
        f"jobs=${best._3}%4d  (all runs: ${stats.map(s => f"${s._1}%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
