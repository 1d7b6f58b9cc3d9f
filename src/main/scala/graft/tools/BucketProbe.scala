package graft.tools

import graft.model.Dims
import graft.ops._
import graft.synth.VisSynth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE.md evidence tool: measure the bucketed-mirror claims instead
  * of asserting them.
  *
  * Writes the weighted visibility frame as three parquet mirrors —
  * unbucketed, bucketed+sorted by `bl` (the reference's per-baseline
  * rayon axis, /root/reference/src/flags.rs:368-437), and bucketed by
  * `(t, chan)` (C5's σ-aggregate/join axis) — then runs the three
  * bucket-sensitive workloads (R1 RFI detection, C5 Van Vleck, the
  * full preprocess chain) over each layout with the QBench noop-sink
  * methodology, reporting median seconds and the SHUFFLE exchange
  * count of the executed adaptive plan.
  *
  * The point at 100 TB: a layout that removes an Exchange removes a
  * full write+read of the fact table from the job. Local timings at
  * sf0.1 underestimate that win (a local "shuffle" is a memory/disk
  * copy, not a network transfer), so the exchange COUNT is the
  * decision number and the seconds are the sanity check.
  */
object BucketProbe {

  private def shuffles(df: DataFrame): Int = {
    val s = df.queryExecution.executedPlan.toString()
    "Exchange (hash|range)partitioning".r.findAllIn(s).length
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
      .max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_bucket_probe_wh")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, sfDir), Dims.timestep(spark),
      Dims.chan(spark), Dims.baseline(spark)))

    // three LAYOUTS of the same rows, all read back from parquet so
    // the comparison is layout-vs-layout, not table-vs-recompute
    println(s"[bucketprobe] writing mirrors from $sfDir ...")
    spark.sql("DROP TABLE IF EXISTS probe_plain")
    weighted.write.format("parquet").mode("overwrite")
      .saveAsTable("probe_plain")
    graft.sinks.Sinks.writeBucketedMirror(weighted, "probe_bl",
      buckets = cpus.toInt)
    spark.sql("DROP TABLE IF EXISTS probe_tc")
    weighted.write.bucketBy(cpus.toInt, "t", "chan").sortBy("t", "chan")
      .format("parquet").mode("overwrite").saveAsTable("probe_tc")

    val layouts = Seq(
      "plain" -> "probe_plain",
      "bl_bucketed" -> "probe_bl",
      "tc_bucketed" -> "probe_tc")
    val all: Seq[(String, DataFrame => DataFrame)] = Seq(
      "r1_rfi" -> (df => RfiFlag(df, RfiStrategy())),
      "c5_vanvleck" -> (df => VanVleck(df, Seq(7L), 2.0)),
      "pp_full" -> (df =>
        Preprocess(vanVleck = true, rfi = true)(spark, df)),
      "pp_full_join" -> (df =>
        Preprocess(vanVleck = true, rfi = true,
          rfiFused = false)(spark, df)))
    // optional workload-name args; SPARK_GRAFT_BUCKET_EXPLAIN=1 also
    // prints each executed plan's Exchange lines (to NAME the
    // residual shuffles, not just count them)
    val workloads =
      if (args.isEmpty) all else all.filter(w => args.contains(w._1))
    val explain = sys.env.get("SPARK_GRAFT_BUCKET_EXPLAIN").contains("1")

    println(f"[bucketprobe] ${"workload"}%-12s ${"layout"}%-12s " +
      f"${"median_s"}%9s ${"shuffles"}%9s")
    workloads.foreach { case (wname, fn) =>
      layouts.foreach { case (lname, table) =>
        val mk = () => fn(spark.table(table))
        val ts = (1 to runs.max(3)).map { _ =>
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val executed = mk()
        executed.write.format("noop").mode("overwrite").save()
        val nsh = shuffles(executed)
        val med = ts.sorted.apply(ts.length / 2)
        println(f"[bucketprobe] $wname%-12s $lname%-12s $med%9.3f " +
          f"$nsh%9d")
        if (explain)
          executed.queryExecution.executedPlan.toString()
            .linesIterator
            .filter(_.matches(".*Exchange (hash|range)partitioning.*"))
            .foreach(l => println(
              s"[bucketprobe]   exchange: ${l.trim.take(140)}"))
      }
    }
    layouts.foreach { case (_, t) =>
      spark.sql(s"DROP TABLE IF EXISTS $t") }
    spark.stop()
  }
}
