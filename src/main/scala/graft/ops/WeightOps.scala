package graft.ops

import graft.model.Obs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weight operators (reference src/flags.rs:570-584, src/cli.rs:1874-1880).
  * Pure per-row expressions — stay inside whole-stage codegen.
  */
object WeightOps {

  /** W1 `get_weight_factor` (/root/reference/src/flags.rs:570-575):
    * (fine_chan_width / 10 kHz) * (int_time / 1 s). A plan-time constant.
    */
  val weightFactor: Double = Obs.WeightFactor

  /** W2 `flag_to_weight_array` (/root/reference/src/flags.rs:579-584)
    * fused with W3's sign-bake (/root/reference/src/cli.rs:1874-1880):
    * weight = flag ? -(w * wf) : (w * wf). Negative weight ⇔ flagged is
    * the invariant every downstream sink relies on.
    */
  def flagToWeight(visFlagged: DataFrame,
                   wf: Double = weightFactor): DataFrame =
    visFlagged.withColumn("weight",
      when(col("flag"), -(col("w") * wf)).otherwise(col("w") * wf))

  /** W3 bake flags into weights for an already-weighted frame:
    * weight = flag ? -abs(weight) : abs(weight)
    * (/root/reference/src/cli.rs:1874-1880).
    */
  def bakeFlags(df: DataFrame): DataFrame =
    df.withColumn("weight",
      when(col("flag"), -abs(col("weight"))).otherwise(abs(col("weight"))))
}
