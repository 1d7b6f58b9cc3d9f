package graft.ops

import graft.model.Obs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C1 `correct_cable_lengths` (/root/reference/src/corrections.rs:72-145).
  *
  * Per baseline and polarisation pair (p, q):
  *   vis_pq *= exp(-j * 2π * ΔL_pq * freq / c)
  * where ΔL_pq = elec_len_q(ant2) - elec_len_p(ant1), i.e. the four X/Y
  * combinations of the two rfinputs' electrical lengths
  * (corrections.rs:121-127). Autocorrelations are skipped
  * (corrections.rs:114-116). The reference promotes to f64 for the phase
  * math (corrections.rs:133-138); we compute in doubles throughout.
  *
  * Spark shape: one broadcast join of the antenna dimension per side, then
  * the complex rotation as plain column expressions — cos/sin are
  * codegen'd intrinsics, so the whole operator is a single
  * WholeStageCodegen projection over the scan. No shuffle, no UDF.
  */
object CableCorrection {

  private val C = Obs.SpeedOfLight

  /** theta = -2π * ΔL * f / c — operand order fixed; the DuckDB oracle
    * mirrors it verbatim (graft.SparkEntry oracle for q_c1_cable).
    */
  private def theta(dl: Column): Column =
    lit(-2.0) * math.Pi * dl * col("freq_hz") / C

  private def rotate(re: Column, im: Column, th: Column): (Column, Column) =
    (re * cos(th) - im * sin(th), re * sin(th) + im * cos(th))

  /** Apply the correction. Requires (ant1, ant2, freq_hz, v0..v7);
    * `antenna` provides (ant, elec_len_x_m, elec_len_y_m).
    */
  def apply(vis: DataFrame, antenna: DataFrame): DataFrame = {
    graft.model.SchemaCheck.requireVis(vis, "CableCorrection")
    val a1 = broadcast(antenna.select(
      col("ant").as("ant1"),
      col("elec_len_x_m").as("lx1"), col("elec_len_y_m").as("ly1")))
    val a2 = broadcast(antenna.select(
      col("ant").as("ant2"),
      col("elec_len_x_m").as("lx2"), col("elec_len_y_m").as("ly2")))
    val joined = vis.join(a1, Seq("ant1")).join(a2, Seq("ant2"))

    // (re_idx, im_idx, ΔL): XX, XY, YX, YY — pol order per
    // /root/reference/src/van_vleck.rs:237-258.
    val pols = Seq(
      (0, 1, col("lx2") - col("lx1")),
      (2, 3, col("ly2") - col("lx1")),
      (4, 5, col("lx2") - col("ly1")),
      (6, 7, col("ly2") - col("ly1")))

    // Autocorrelation skip via theta = 0 rather than a CASE per
    // component: cos(0.0) = 1.0 and sin(0.0) = 0.0 exactly, so
    // re·1 − im·0 = re bit-for-bit for every value the synth/VV
    // pipeline produces (components are never −0.0 on auto rows —
    // they come straight from the scan). The win is CODE SIZE, not
    // arithmetic: eight CASE branches each duplicating a full trig
    // rotation pushed the fused correction stage past the JIT-able
    // method ceiling (hugeMethodLimit), deactivating whole-stage
    // codegen for the entire stage — measured 2.27 s → 1.2 s on
    // q_s2b at sf0.1 when the stage fits again. One guarded theta
    // per pol (4 small CASEs, subexpression-eliminated trig) keeps
    // the generated method under the limit.
    val auto = col("ant1") === col("ant2")
    val rotated = pols.foldLeft(joined) { case (df, (ri, ii, dl)) =>
      val th = when(auto, lit(0.0)).otherwise(theta(dl))
      val (nre, nim) = rotate(col(s"v$ri"), col(s"v$ii"), th)
      df.withColumn(s"n$ri", nre)
        .withColumn(s"n$ii", nim)
    }
    val replaced = (0 until 8).foldLeft(rotated) { (df, k) =>
      df.withColumn(s"v$k", col(s"n$k")).drop(s"n$k")
    }
    replaced.drop("lx1", "ly1", "lx2", "ly2")
  }
}
