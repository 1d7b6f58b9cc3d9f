package graft

import graft.model.Dims
import graft.ops._
import graft.oracle.Oracles
import graft.synth.VisSynth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is a Spark-DataFrame implementation of one
  * operator from SURVEY.md §2, evaluated against the driver-provided
  * testdata dir; the matching `oracleSql` entry is an independently
  * written DuckDB SQL twin (graft.oracle.Oracles).
  */
object SparkEntry {

  private def roundComps(df: DataFrame, prefixIn: String = "v",
                         prefixOut: String = "r"): Seq[org.apache.spark.sql.Column] =
    (0 until 8).map(k => round(col(s"$prefixIn$k"), 6).as(s"$prefixOut$k"))

  /** Flagship: the full preprocessing pipeline on sf0.001 —
    * synth scan → static flags → weights → cable correction → 2x/2x
    * averaging. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val vis = VisSynth.vis(spark, dir)
    val flagged = FlagOps.setFlags(vis, Dims.timestep(spark),
      Dims.chan(spark), Dims.baseline(spark))
    val weighted = WeightOps.flagToWeight(flagged)
    val corrected = CableCorrection(weighted, Dims.antenna(spark))
    Averaging.avgTimeFreq(corrected, 2, 2)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_s1_vis_synth" -> ((s, dir) => VisSynth.vis(s, dir)),

    "q_f6_set_flags" -> ((s, dir) => {
      val flagged = FlagOps.setFlags(VisSynth.vis(s, dir),
        Dims.timestep(s), Dims.chan(s), Dims.baseline(s))
      flagged.select("t", "bl", "chan", "flag")
    }),

    "q_w2_weights" -> ((s, dir) => {
      val flagged = FlagOps.setFlags(VisSynth.vis(s, dir),
        Dims.timestep(s), Dims.chan(s), Dims.baseline(s))
      WeightOps.flagToWeight(flagged).select("t", "bl", "chan", "weight")
    }),

    "q_a1_avg" -> ((s, dir) => {
      val flagged = FlagOps.setFlags(VisSynth.vis(s, dir),
        Dims.timestep(s), Dims.chan(s), Dims.baseline(s))
      Averaging.avgTimeFreq(WeightOps.flagToWeight(flagged), 2, 2)
    }),

    "q_c1_cable" -> ((s, dir) => {
      val corrected = CableCorrection(VisSynth.vis(s, dir), Dims.antenna(s))
      corrected.select(col("t") +: col("bl") +: col("chan") +:
        roundComps(corrected): _*)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_s1_vis_synth" -> Oracles.s1VisSynth,
    "q_f6_set_flags" -> Oracles.f6SetFlags,
    "q_w2_weights" -> Oracles.w2Weights,
    "q_a1_avg" -> Oracles.a1Avg,
    "q_c1_cable" -> Oracles.c1Cable,
  )
}
