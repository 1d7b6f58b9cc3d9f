package graft.synth

import graft.model.Obs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of a long-format visibility fact table from the
  * driver-provided `lineitem` parquet.
  *
  * This mirrors the reference's lineage-encoded synthetic fixtures
  * (/root/reference/tests/data README: cell values encode their own
  * coordinates, asserted in /root/reference/src/io/mod.rs:651-673): every
  * cell of our synthetic tensor is a pure integer-arithmetic function of
  * the lineitem row keys, so an independent engine (the DuckDB oracle,
  * graft.oracle.OracleSql.visCte) reproduces it bit-for-bit.
  *
  * Schema (one row per lineitem row = one tensor cell sample):
  * {{{
  *   t      BIGINT   timestep index           0..15
  *   ant1   BIGINT   first antenna            0..7   (ant1 <= ant2)
  *   ant2   BIGINT   second antenna           0..7
  *   bl     BIGINT   baseline id = ant1*8+ant2
  *   cc     BIGINT   coarse channel           0..3
  *   fc     BIGINT   fine chan within coarse  0..7
  *   chan   BIGINT   global channel = cc*8+fc
  *   freq_hz DOUBLE  channel centre frequency
  *   v0..v7 DOUBLE   Jones components XX_re,XX_im,XY_re,XY_im,
  *                   YX_re,YX_im,YY_re,YY_im
  *                   (pol order: /root/reference/src/van_vleck.rs:237-258)
  *   w      DOUBLE   pre-weight multiplier in {1,2,3,4}
  * }}}
  *
  * Numeric-parity rules (the whole point of this module):
  *  - coordinates: integer modular arithmetic only;
  *  - components: `((seed*(k+3)) % 1997) / 128.0 - 7.5` — a dyadic
  *    rational, exactly representable in binary64, so downstream sums are
  *    EXACT and therefore independent of Spark-vs-DuckDB evaluation order;
  *  - the only rounding-sensitive ops allowed downstream are transcendental
  *    (cos/sin/sqrt), and every query rounds those outputs to 6 dp.
  *
  * Storage is struct-of-scalars (8 double columns), not ARRAY<FLOAT>:
  * fixed-arity numeric payloads stay inside whole-stage codegen as local
  * doubles, where an array column would allocate GenericArrayData per row.
  * At 100 TB this is the difference between register arithmetic and GC
  * pressure; `visArray` below offers an array view at API edges.
  */
object VisSynth {

  /** The vis fact table for a given testdata dir. Time-major cell
    * coordinates and payload derive from lineitem keys; rows with equal
    * coordinates are legitimate repeated samples of the same cell.
    */
  def vis(spark: SparkSession, dir: String): DataFrame = {
    // NOTE (r22, measured-and-reverted): the single-row-group fixture
    // file scans as ONE task, so this scan's projection (the whole
    // correction chain) runs single-threaded at fixture SF. A
    // scale-adaptive round-robin repartition (graft.sources.ScanPar)
    // was measured SLOWER end-to-end at sf0.1 (pp3 job time 3.4 s →
    // 4.5 s: the extra corpus exchange + AQE stage outweighs the
    // parallelism on a warm kernel memo); at real scale row groups
    // outnumber cores and the question is moot. Kept single-scan.
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val a1r = col("l_suppkey") % NumAnts
    val a2r = col("l_partkey") % NumAnts
    val base = li.select(
      (col("l_orderkey") % NumTimesteps).as("t"),
      least(a1r, a2r).as("ant1"),
      greatest(a1r, a2r).as("ant2"),
      ((col("l_linenumber") % NumCoarse).cast("long")).as("cc"),
      (((col("l_partkey") + col("l_linenumber")) % FineChansPerCoarse))
        .as("fc"),
      (col("l_orderkey") * 131 + col("l_partkey") * 31
        + col("l_suppkey") * 17 + col("l_linenumber") * 7).as("seed"),
      (lit(1.0) + (floor(col("l_quantity")).cast("long") % 4)
        .cast("double")).as("w"))
    val withCoords = base
      .withColumn("bl", col("ant1") * NumAnts + col("ant2"))
      .withColumn("chan", col("cc") * FineChansPerCoarse + col("fc"))
      .withColumn("freq_hz",
        lit(BaseFreqHz) + col("chan") * FineChanWidthHz)
    // one withColumns (not a per-column fold): chained withColumn
    // re-analyzes the whole plan per step, and this scan is the root
    // of every vis-family query
    val withVis = withCoords.withColumns((0 until 8).map(k =>
      s"v$k" ->
        (((col("seed") * (k + 3)) % 1997).cast("double") / 128.0 - 7.5))
      .toMap)
    withVis.select("t", "ant1", "ant2", "bl", "cc", "fc", "chan",
      "freq_hz", "v0", "v1", "v2", "v3", "v4", "v5", "v6", "v7", "w")
  }

  /** Array-typed view of the 8 Jones components, for API edges that want
    * the reference's `Jones<f32>`-like shape
    * (/root/reference/src/io/mod.rs:284-293).
    */
  def visArray(df: DataFrame): DataFrame =
    df.withColumn("vis",
      array((0 until 8).map(k => col(s"v$k")): _*))

  /** Names of the 8 component columns, in reference pol order. */
  val compCols: Seq[String] = (0 until 8).map(k => s"v$k")
}
