package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev tool (r22): execute a named SparkEntry query under AQE at the
  * bench shape (sf0.1, local[$SPARK_GRAFT_CPUS]) and print the FINAL
  * adaptive plan's join strategies and exchanges — PlanDump's static
  * plan shows the pre-AQE guess (e.g. SortMergeJoin that AQE may or
  * may not convert to broadcast at runtime); this shows what actually
  * ran.
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    require(args.nonEmpty, "usage: FinalPlan <query> [query...]")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val finalPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString()
        case p => p.toString()
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/finalplan_$name.txt"),
        finalPlan.getBytes("UTF-8"))
      println(s"== $name final adaptive plan (join/exchange lines)")
      finalPlan.linesIterator.zipWithIndex.foreach { case (l, i) =>
        if (l.contains("Join") || l.contains("Exchange") ||
          l.contains("AQEShuffleRead") || l.contains("Repartition"))
          println(f"[fp] $i%4d ${l.take(170)}")
      }
    }
    spark.stop()
  }
}
