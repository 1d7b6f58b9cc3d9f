package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev profiler (r22): per-job wall breakdown of a named SparkEntry
  * query — job id, duration, task count and the callsite/description
  * Spark recorded. Decides WHICH of a gate's many jobs (GapProbe
  * counts 20-66 on the composed gates) carry the time, so the
  * optimization targets the right exchange/collect instead of the
  * aggregate gap number.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    require(args.nonEmpty, "usage: JobProbe <query> [query...]")
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

    case class J(id: Int, start: Long, var end: Long = -1L,
                 var desc: String = "", var nTasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties).flatMap(p =>
              Option(p.getProperty("callSite.short"))))
            .getOrElse("") +
            " | " + e.stageInfos.map(si =>
              s"${si.name.takeWhile(_ != ' ')}:${si.numTasks}")
              .mkString(",")
          jobs(e.jobId) = J(e.jobId, e.time, desc = d,
            nTasks = e.stageInfos.map(_.numTasks).sum)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(_.end = e.time)
        }
    }

    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warm-up discard
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      jobs.synchronized(jobs.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"== $name wall=$wall%.3f s, ${jobs.size} jobs")
      var prevEnd = -1L
      jobs.synchronized(jobs.values.toSeq).sortBy(_.start).foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        val gapBefore =
          if (prevEnd > 0) (j.start - prevEnd).max(0L) / 1e3 else 0.0
        prevEnd = if (j.end > 0) j.end.max(prevEnd) else prevEnd
        println(f"[job] ${j.id}%4d  dur=$dur%7.3f s  gapBefore=" +
          f"$gapBefore%6.3f s  tasks=${j.nTasks}%4d  ${j.desc.take(160)}")
      }
    }
    spark.stop()
  }
}
