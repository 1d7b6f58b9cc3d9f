package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: decompose q_s2b_metafits_pipeline into its stage chain
  * at sf0.1 to attribute the round-12 regression (2.33 → 3.52 s in
  * BENCH_r12). Times each prefix of the chain with the suite's noop
  * methodology. Not part of the library surface.
  */
object S2bProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("SPARK_GRAFT_HUGE_METHOD_LIMIT", "8000"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[s2b] $name%-34s median ${ts.sorted.apply(2)}%7.3f s" +
        s"  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    import graft.ops._
    import graft.synth.VisSynth
    val dir0 = java.nio.file.Files.createTempDirectory("graft_s2bprobe")
    val metaParsed = graft.sources.MetafitsReader.read(
      graft.synth.MetafitsSynth.write(
        dir0.resolve("synthetic.metafits").toString))
    val meta = graft.sources.MetafitsMeta(metaParsed)
    def microComps: Seq[org.apache.spark.sql.Column] =
      (0 until 8).map(k => floor(col(s"v$k") * 1.0e6 + 0.5).as(s"r$k"))
    def vis = VisSynth.vis(spark, sfDir)
    def flagged = FlagOps.setFlags(vis, meta.timestep(spark),
      meta.chan(spark), meta.baseline(spark))
    def weighted = WeightOps.flagToWeight(flagged, meta.weightFactor)
    def cabled = CableCorrection(weighted, meta.antenna(spark))
    def gained = DigitalGains(cabled, meta.digitalGain(spark))
    def full = gained.select(col("t") +: col("bl") +: col("chan") +:
      (microComps :+ col("weight")): _*)

    time("vis scan") { vis }
    time("+ setFlags") { flagged }
    time("+ flagToWeight") { weighted }
    time("+ cable") { cabled }
    time("+ digitalGains") { gained }
    time("+ micro projection (full q_s2b)") { full }
    // the same chain against the synthetic dims — isolates whether the
    // metafits-parsed dimension frames (driver-built) cost anything
    def synth = {
      val f = FlagOps.setFlags(vis,
        graft.model.Dims.timestep(spark),
        graft.model.Dims.chan(spark), graft.model.Dims.baseline(spark))
      val w = WeightOps.flagToWeight(f, graft.model.SynthDims.weightFactor)
      DigitalGains(CableCorrection(w, graft.model.Dims.antenna(spark)),
        graft.model.Dims.digitalGain(spark))
        .select(col("t") +: col("bl") +: col("chan") +:
          (microComps :+ col("weight")): _*)
    }
    time("synth-dims twin (full)") { synth }

    if (args.contains("--codegen")) {
      import org.apache.spark.sql.execution.debug._
      def sizes(name: String, df: DataFrame): Unit = {
        val code = df.queryExecution.debug.codegenToSeq()
        println(s"[s2b] codegen $name: ${code.size} stages, " +
          code.map(_._2.length).mkString("sizes=[", ", ", "]"))
      }
      sizes("gained (no projection)", gained)
      sizes("full (micro projection)", full)
      println(full.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
