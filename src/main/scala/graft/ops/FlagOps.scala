package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Static flagging operators (reference src/flags.rs).
  *
  * All of these are pure Catalyst expressions + broadcast joins against
  * the tiny dimension tables — at cluster scale each is a map-side
  * BroadcastHashJoin with no shuffle of the fact table, mirroring the
  * reference's shared-memory metadata lookups.
  */
object FlagOps {

  /** F6 `FlagContext::set_flags` (/root/reference/src/flags.rs:179-224):
    * materialise `flag = ts_flag || ch_flag || bl_flag` by broadcast-joining
    * the three flag dimensions onto the fact table. The kernel at
    * flags.rs:217-221 is the three-way OR.
    *
    * The three joins are all broadcastable (16 + 32 + 36 rows); Catalyst
    * plans them as consecutive BroadcastHashJoins inside one
    * WholeStageCodegen span — zero shuffles.
    */
  def setFlags(vis: DataFrame, timestep: DataFrame, chan: DataFrame,
               baseline: DataFrame): DataFrame = {
    val static = col("ts_flag") || col("ch_flag") || col("bl_flag")
    // a raw-container frame arrives with the ingest's missing-HDU flag
    // already set (GpuboxSource/FitsGpubox flag=!present) — the static
    // flags OR onto it, as the reference's set_flags ORs onto the
    // flag array it is given (flags.rs:217-221)
    val combined =
      if (vis.columns.contains("flag")) col("flag") || static else static
    vis
      .join(broadcast(timestep.select("t", "ts_flag")), Seq("t"))
      .join(broadcast(chan.select("chan", "ch_flag")), Seq("chan"))
      .join(broadcast(baseline.select("bl", "bl_flag")), Seq("bl"))
      .withColumn("flag", combined)
      .drop("ts_flag", "ch_flag", "bl_flag")
  }

  /** P1 `--sel-time` (/root/reference/src/cli.rs:850-868): plain filter on
    * the timestep coordinate — pushed to the parquet scan by Catalyst.
    */
  def selTime(vis: DataFrame, from: Long, to: Long): DataFrame =
    vis.where(col("t").between(from, to))

  /** P2 `retain_antennas` (/root/reference/src/cli.rs:869-897): keep rows
    * whose BOTH antennas are in the selected set.
    */
  def selAnts(vis: DataFrame, ants: Seq[Long]): DataFrame =
    vis.where(col("ant1").isin(ants: _*) && col("ant2").isin(ants: _*))

  /** P3 `filter_antennas` (/root/reference/src/cli.rs:898-908): drop rows
    * touching a flagged antenna — a broadcast anti-join against the
    * flagged-antenna dimension.
    */
  def dropFlaggedAnts(vis: DataFrame, antenna: DataFrame): DataFrame = {
    val flagged = antenna.where(col("ant_flagged")).select("ant")
    vis
      .join(broadcast(flagged.withColumnRenamed("ant", "ant1")),
        Seq("ant1"), "left_anti")
      .join(broadcast(flagged.withColumnRenamed("ant", "ant2")),
        Seq("ant2"), "left_anti")
  }

  /** P4 `filter_autos` (/root/reference/src/cli.rs:909-918). */
  def dropAutos(vis: DataFrame): DataFrame =
    vis.where(col("ant1") =!= col("ant2"))

  /** P5 picket-fence `ChannelRanges::from_idxs`
    * (/root/reference/src/cli.rs:207-228): collapse a set of provided
    * coarse channels into contiguous ranges. Islands-and-gaps with a
    * window function: range_id = cc - dense_rank-over-cc, then
    * min/max per island. The reference then fans out one output file per
    * range (run_ranges, cli.rs:1524-1574) — here each range id becomes a
    * partition key for the sink.
    */
  def picketRanges(providedCoarse: DataFrame): DataFrame = {
    // bounded input (the provided-coarse dim, ≤ 24 rows):
    // Bounded.rank makes the single-partition execution explicit
    Bounded.rank(providedCoarse, "rn", col("cc"))
      .withColumn("grp", col("cc") - col("rn"))
      .groupBy("grp")
      .agg(min("cc").as("cc_min"), max("cc").as("cc_max"),
        count(lit(1)).as("n_coarse"))
      .select("cc_min", "cc_max", "n_coarse")
  }

  /** F7 `get_unflagged_timestep_ranges`
    * (/root/reference/src/flags.rs:586-613): timesteps where at least one
    * cell is unflagged, collapsed into contiguous ranges.
    */
  def unflaggedTimestepRanges(visFlagged: DataFrame): DataFrame = {
    val unflaggedTs = visFlagged.groupBy("t")
      .agg(min(col("flag").cast("int")).as("all_flagged"))
      .where(col("all_flagged") === 0)
      .select("t")
    // bounded input (distinct timesteps — dimension-sized)
    Bounded.rank(unflaggedTs, "rn", col("t"))
      .withColumn("grp", col("t") - col("rn"))
      .groupBy("grp")
      .agg(min("t").as("t_min"), max("t").as("t_max"))
      .select("t_min", "t_max")
  }
}
