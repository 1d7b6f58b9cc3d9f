package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: write `.explain("formatted")` for
  * the named SparkEntry queries to `plans/<tag>/<query>_<suffix>.txt`
  * (e.g. `plans/r21/q_sim17_ann_rebalance_before.txt`) so the judge
  * can check plan claims without running Spark.
  *
  * Usage: `runMain graft.tools.PlanDump <tag> <suffix> <query>...`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <tag> <suffix> <query> [query...]")
    val (tag, suffix) = (args(0), args(1))
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get("plans", tag)
    Files.createDirectories(dir)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"),
        s"# $name ($suffix) — explain(formatted) at $sfDir\n\n" + txt)
      println(s"[plandump] wrote ${dir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
