package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: root-cause the round-16 q_c2b_geometry_app drift
  * (BENCH_r15 idle 0.62 s → BENCH_r16 idle 1.32 s / suite 3.61 s at
  * sf0.1 with zero geometry-code changes in the round). Decomposes
  * the query into its stages, times each at steady state, and dumps
  * every WholeStageCodegen stage's max generated-method size so a
  * codegen-mode flip (the r13 q_s2b failure class: a fused stage past
  * HotSpot's 8000-byte JIT ceiling demotes the whole stage) is either
  * confirmed at the method level or excluded. Not part of the library
  * surface.
  */
object C2bProbe {
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

    def time(name: String, runs: Int = 7)(df: => DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[c2b] $name%-30s median ${ts.sorted.apply(runs / 2)}%7.3f" +
        s" s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    import graft.model.Dims
    import graft.ops.GeometryCorrection
    import graft.synth.VisSynth
    def microComps: Seq[org.apache.spark.sql.Column] =
      (0 until 8).map(k => floor(col(s"v$k") * 1.0e6 + 0.5).as(s"r$k"))
    def vis = VisSynth.vis(spark, sfDir)
    def uvwAstro = GeometryCorrection.partUvwAstro(spark,
      Dims.timestep(spark), Dims.antenna(spark),
      GeometryCorrection.AppLonRad, GeometryCorrection.AppLatRad,
      GeometryCorrection.AppRaJ2000, GeometryCorrection.AppDecJ2000,
      GeometryCorrection.AppDut1Sec, apparent = true)
    def uvwPlain = GeometryCorrection.partUvw(Dims.timestep(spark),
      Dims.antenna(spark))
    def fullWith(uvw: DataFrame) =
      GeometryCorrection(vis, uvw)
        .select(col("t") +: col("bl") +: col("chan") +: microComps: _*)

    // the astro UVW table alone is DIM-sized (timesteps × antennas)
    time("partUvwAstro (dim-sized)") { uvwAstro }
    time("q_c2 shape (plain uvw)") { fullWith(uvwPlain) }
    time("q_c2b (astro uvw)") { fullWith(uvwAstro) }

    // codegen autopsy: per WholeStageCodegen stage, the max generated
    // method size after janino compilation — a stage at/over 8000 is
    // demoted from JIT-able whole-stage codegen
    val full = fullWith(uvwAstro)
    // execute THIS Dataset's own query execution (a DataFrameWriter
    // runs a cloned plan, leaving this AQE tree unresolved — and an
    // unresolved AdaptiveSparkPlanExec holds the pre-codegen initial
    // plan with zero WholeStageCodegen nodes)
    full.queryExecution.toRdd.count()
    // under AQE the top node is AdaptiveSparkPlanExec; the codegen
    // stages live in its resolved final plan
    val plan = full.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val codegen = org.apache.spark.sql.execution.debug
      .codegenStringSeq(plan)
    println(s"[c2b] ${codegen.size} WholeStageCodegen stage(s)")
    codegen.zipWithIndex.foreach { case ((_, _, codeStats), i) =>
      println(s"[c2b] stage $i maxMethodCodeSize=" +
        s"${codeStats.maxMethodCodeSize} maxConstPoolSize=" +
        s"${codeStats.maxConstPoolSize} innerClasses=" +
        s"${codeStats.numInnerClasses}")
    }
    println("[c2b] loadavg " + java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim)
    spark.stop()
  }
}
