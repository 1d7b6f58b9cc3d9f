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

    // Two-stage projection, deliberately: stage 1 computes each
    // polarisation's cos/sin ONCE as named columns; stage 2 does the
    // rotations as small multiply-adds with a per-component CASE that
    // passes autocorrelations through UNTOUCHED (the reference skips
    // autos — corrections.rs:114-116 — and exact pass-through also
    // keeps a NaN/Inf in one component from poisoning its partner
    // via re − im·0). CollapseProject will NOT merge the stages (the
    // trig aliases are non-cheap and referenced twice), which is the
    // point: the single collapsed projection's eight CASE branches
    // each duplicating a full trig rotation pushed the fused
    // correction stage past the JIT-able method ceiling
    // (hugeMethodLimit), deactivating whole-stage codegen for the
    // entire stage — measured 2.27 s collapsed vs 1.0 s split on
    // q_s2b at sf0.1. Split per-operator consume functions keep every
    // generated method small and the stage inside whole-stage codegen.
    // each batch of independent columns lands in ONE withColumns call:
    // a chained per-column withColumn re-analyzes the whole growing
    // plan every step (quadratic driver time over a ~60-step composed
    // chain — measured ~2.2 s of the pp gates' construction); the
    // batched form analyzes once per stage and produces the same
    // Project structure, so the deliberate trig/rotate stage split
    // above is untouched
    val auto = col("ant1") === col("ant2")
    val withTrig = joined.withColumns(
      pols.zipWithIndex.flatMap { case ((_, _, dl), p) =>
        val th = theta(dl)
        Seq(s"tc$p" -> cos(th), s"ts$p" -> sin(th))
      }.toMap)
    val rotated = withTrig.withColumns(
      pols.zipWithIndex.flatMap { case ((ri, ii, _), p) =>
        Seq(
          s"n$ri" -> when(auto, col(s"v$ri")).otherwise(
            col(s"v$ri") * col(s"tc$p") - col(s"v$ii") * col(s"ts$p")),
          s"n$ii" -> when(auto, col(s"v$ii")).otherwise(
            col(s"v$ri") * col(s"ts$p") + col(s"v$ii") * col(s"tc$p")))
      }.toMap)
    val replaced = rotated.withColumns(
      (0 until 8).map(k => s"v$k" -> col(s"n$k")).toMap)
      .drop((0 until 8).map(k => s"n$k"): _*)
    replaced.drop("lx1", "ly1", "lx2", "ly2")
      .drop((0 until 4).flatMap(p => Seq(s"tc$p", s"ts$p")): _*)
  }
}
