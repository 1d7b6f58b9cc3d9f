package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time/frequency averaging — the reference's one true group-by
  * (SURVEY §2.7; semantics from marlu's averaging module as exercised by
  * the golden tests at /root/reference/src/cli.rs:4032-4218):
  *
  *  - weighted mean over the (avg_time x avg_freq) cell group using ONLY
  *    unflagged samples;
  *  - if every sample in the group is flagged, fall back to the plain mean
  *    (data preserved, flagged);
  *  - output flag  = all-inputs-flagged;
  *  - output weight = sum of unflagged weights (0 when fully flagged).
  *
  * Implementation: a single hash aggregate. Spark performs map-side
  * partial aggregation automatically, so at 100 TB the shuffle carries one
  * partially-combined row per (bl, t_out, c_out) per map task, not raw
  * cells. Payload sums are exact (dyadic-rational inputs), making the
  * result independent of partial-aggregation order.
  */
object Averaging {

  private val comps = (0 until 8).map(k => s"v$k")

  /** Average a flagged+weighted vis frame by `avgTime` timesteps and
    * `avgFreq` fine channels. Requires columns
    * (t, bl, ant1, ant2, chan, v0..v7, weight, flag).
    */
  def avgTimeFreq(df: DataFrame, avgTime: Int, avgFreq: Int): DataFrame = {
    graft.model.SchemaCheck.requireWeighted(df, "Averaging")
    val unflaggedW = when(!col("flag"), col("weight"))
    val aggs =
      comps.map { c =>
        coalesce(
          sum(when(!col("flag"), col("weight") * col(c))) /
            sum(unflaggedW),
          avg(col(c))).as(s"a${c.drop(1)}")
      } ++ Seq(
        min(col("flag")).as("flag_out"), // bool AND
        coalesce(sum(unflaggedW), lit(0.0)).as("weight_out"),
        count(lit(1)).as("n_samples"))
    df
      .withColumn("t_out", floor(col("t") / avgTime))
      .withColumn("c_out", floor(col("chan") / avgFreq))
      .groupBy("bl", "ant1", "ant2", "t_out", "c_out")
      .agg(aggs.head, aggs.tail: _*)
  }
}
