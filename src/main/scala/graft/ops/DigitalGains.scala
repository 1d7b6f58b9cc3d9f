package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C3 `correct_digital_gains` (/root/reference/src/corrections.rs:324-424).
  *
  * Per (antenna, coarse-chan) gain pair (gx, gy) from the metafits:
  *   XX /= g1x*g2x,  XY /= g1x*g2y,  YX /= g1y*g2x,  YY /= g1y*g2y
  * (kernel at corrections.rs:399-421). Two broadcast joins of the
  * 32-row gain dimension (once per antenna side), then pure division
  * expressions — single codegen stage, no shuffle.
  */
object DigitalGains {

  def apply(vis: DataFrame, digitalGain: DataFrame): DataFrame = {
    graft.model.SchemaCheck.requireVis(vis, "DigitalGains")
    val g1 = broadcast(digitalGain.select(
      col("ant").as("ant1"), col("cc"),
      col("gain_x").as("g1x"), col("gain_y").as("g1y")))
    val g2 = broadcast(digitalGain.select(
      col("ant").as("ant2"), col("cc"),
      col("gain_x").as("g2x"), col("gain_y").as("g2y")))
    val joined = vis.join(g1, Seq("ant1", "cc")).join(g2, Seq("ant2", "cc"))
    // (component indices, divisor) per pol pair
    val pols = Seq(
      (Seq(0, 1), col("g1x") * col("g2x")),
      (Seq(2, 3), col("g1x") * col("g2y")),
      (Seq(4, 5), col("g1y") * col("g2x")),
      (Seq(6, 7), col("g1y") * col("g2y")))
    // one withColumns (not a per-column fold): chained withColumn
    // re-analyzes the whole plan per step
    val divided = joined.withColumns(
      pols.flatMap { case (ks, g) =>
        ks.map(k => s"v$k" -> col(s"v$k") / g)
      }.toMap)
    divided.drop("g1x", "g1y", "g2x", "g2y")
  }
}
