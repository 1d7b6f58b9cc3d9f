package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: decompose q_s2b-class bench cost into scan / synth /
  * stage slices at an arbitrary SF dir (single-JVM, bench session
  * settings). Not part of the library surface.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    def time(name: String)(fn: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s median ${ts.sorted.apply(1)}%.3f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    import graft.synth.VisSynth
    time("scan_only") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
    }
    time("vis_synth") { VisSynth.vis(spark, sfDir) }
    time("vis_synth_repart") { VisSynth.vis(spark, sfDir).repartition(32) }
    val mfPath = {
      val dir = java.nio.file.Files.createTempDirectory("probe_mf")
      graft.synth.MetafitsSynth.write(
        dir.resolve("synthetic.metafits").toString)
    }
    val mf = graft.sources.MetafitsReader.read(mfPath)
    time("s2_cable") {
      import org.apache.spark.sql.functions._
      graft.ops.CableCorrection(VisSynth.vis(spark, sfDir),
        graft.sources.MetafitsReader.antenna(spark, mf))
    }
    time("s2_cable_repart") {
      import org.apache.spark.sql.functions._
      graft.ops.CableCorrection(
        VisSynth.vis(spark, sfDir).repartition(32),
        graft.sources.MetafitsReader.antenna(spark, mf))
    }
    locally {
      import org.apache.spark.sql.functions._
      val cable = graft.ops.CableCorrection(VisSynth.vis(spark, sfDir),
        graft.sources.MetafitsReader.antenna(spark, mf))
      time("s2_cable_round6") {
        cable.select((0 until 8).map(k =>
          round(col(s"v$k"), 6).as(s"r$k")): _*)
      }
      time("s2_cable_micro") {
        cable.select((0 until 8).map(k =>
          floor(col(s"v$k") * 1.0e6 + 0.5).as(s"r$k")): _*)
      }
      val meta = graft.sources.MetafitsMeta(mf)
      time("s2b_flags_only") {
        graft.ops.FlagOps.setFlags(VisSynth.vis(spark, sfDir),
          meta.timestep(spark), meta.chan(spark), meta.baseline(spark))
      }
      time("s2b_flags_weight") {
        val f = graft.ops.FlagOps.setFlags(VisSynth.vis(spark, sfDir),
          meta.timestep(spark), meta.chan(spark), meta.baseline(spark))
        graft.ops.WeightOps.flagToWeight(f, meta.weightFactor)
      }
      time("s2b_full_repart") {
        val f = graft.ops.FlagOps.setFlags(
          VisSynth.vis(spark, sfDir).repartition(32),
          meta.timestep(spark), meta.chan(spark), meta.baseline(spark))
        val w = graft.ops.WeightOps.flagToWeight(f, meta.weightFactor)
        val c = graft.ops.Preprocess(passband = false, geometry = false,
          calibrate = false, meta = meta)(spark, w)
        c.select((col("t") +: col("bl") +: col("chan") +:
          ((0 until 8).map(k => floor(col(s"v$k") * 1.0e6 + 0.5)
            .as(s"r$k")) :+ col("weight"))): _*)
      }
      time("s2b_full") {
        val f = graft.ops.FlagOps.setFlags(VisSynth.vis(spark, sfDir),
          meta.timestep(spark), meta.chan(spark), meta.baseline(spark))
        val w = graft.ops.WeightOps.flagToWeight(f, meta.weightFactor)
        val c = graft.ops.Preprocess(passband = false, geometry = false,
          calibrate = false, meta = meta)(spark, w)
        c.select((col("t") +: col("bl") +: col("chan") +:
          ((0 until 8).map(k => floor(col(s"v$k") * 1.0e6 + 0.5)
            .as(s"r$k")) :+ col("weight"))): _*)
      }
    }
    spark.stop()
  }
}
