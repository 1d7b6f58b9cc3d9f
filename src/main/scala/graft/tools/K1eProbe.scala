package graft.tools

import graft.ops._
import graft.sinks.Sinks
import graft.synth.VisSynth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r22 evidence tool: split q_k1e's cost into (a) the bucketed mirror
  * write, (b) the correction chain + averaging over the mirror, and
  * (c) the ordered-row-index tail — decides which part the k1e
  * optimization should target.
  */
object K1eProbe {
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[k1e] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, sfDir), graft.model.Dims.timestep(spark),
      graft.model.Dims.chan(spark), graft.model.Dims.baseline(spark)))
    def quant(pre: org.apache.spark.sql.DataFrame) =
      pre.withColumns(((0 until 8).map(k =>
        s"v$k" -> (floor(col(s"v$k") * 1.0e6 + 0.5) / 1.0e6)) :+
        ("weight" -> (floor(col("weight") * 112.0 + 0.5) / 112.0)))
        .toMap)

    (1 to 3).foreach { round =>
      println(s"-- round $round")
      t("mirror write")(
        Sinks.writeTimeChanMirror(weighted, "vis_k1e_probe"))
      val pre = Preprocess(vanVleck = true, rfi = true)(
        spark, spark.table("vis_k1e_probe"))
      val avg = t("chain+avg noop") {
        val a = graft.ops.Averaging.avgTimeFreq(quant(pre), 2, 2)
        a.write.format("noop").mode("overwrite").save()
        a
      }
      t("orderedRowIdx + noop")(
        Sinks.orderedRowIdx(avg, Seq("t_out", "bl", "c_out"))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
