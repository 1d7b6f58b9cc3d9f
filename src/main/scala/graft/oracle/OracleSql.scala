package graft.oracle

/** ANSI-SQL twins of the synthetic dimension tables and vis fact table,
  * runnable by DuckDB over the same parquet dir the Spark queries read.
  *
  * Parity rules (see graft.synth.VisSynth scaladoc):
  *  - every fractional literal uses `e0` scientific notation so DuckDB
  *    parses it as DOUBLE, never DECIMAL (decimal arithmetic would diverge
  *    from Spark's double arithmetic);
  *  - integer coordinates are CAST to BIGINT to match Spark's LongType;
  *  - payload values are dyadic rationals, so sums are exact and
  *    order-independent across engines;
  *  - transcendental outputs are rounded to 6 dp on both sides.
  */
object OracleSql {

  /** Dimension CTEs — must mirror graft.model.Dims bit-for-bit. */
  val dimCtes: String = """
antenna AS (
  SELECT CAST(i AS BIGINT) AS ant,
         i = 7 AS ant_flagged,
         42.0e0 + i * 13.25e0 AS elec_len_x_m,
         43.5e0 + i * 13.25e0 AS elec_len_y_m,
         (i % 4) * 100.0e0 - 150.0e0 AS east_m,
         (i // 4) * 100.0e0 - 50.0e0 AS north_m,
         377.0e0 + i * 0.5e0 AS height_m
  FROM range(0, 8) r(i)),
timestep AS (
  SELECT CAST(i AS BIGINT) AS t,
         CAST(1254670392 + i * 2 AS BIGINT) AS gps_s,
         1254670392.0e0 + i * 2.0e0 + 1.0e0 AS centroid_s,
         (i < 1 OR i >= 15) AS ts_flag
  FROM range(0, 16) r(i)),
chan AS (
  SELECT CAST(i AS BIGINT) AS chan,
         CAST(i // 8 AS BIGINT) AS cc,
         CAST(i % 8 AS BIGINT) AS fc,
         150000000.0e0 + i * 40000.0e0 AS freq_hz,
         (i % 8 = 0 OR i % 8 = 7 OR i % 8 = 4) AS ch_flag
  FROM range(0, 32) r(i)),
baseline AS (
  SELECT CAST(a.ant * 8 + b.ant AS BIGINT) AS bl,
         a.ant AS ant1, b.ant AS ant2,
         a.ant = b.ant AS auto,
         (a.ant_flagged OR b.ant_flagged) AS bl_flag
  FROM antenna a, antenna b WHERE a.ant <= b.ant),
digital_gain AS (
  SELECT CAST(i // 4 AS BIGINT) AS ant, CAST(i % 4 AS BIGINT) AS cc,
         CAST(i % 16 + 64 AS DOUBLE) / 64.0e0 AS gain_x,
         CAST(i % 16 + 65 AS DOUBLE) / 64.0e0 AS gain_y
  FROM range(0, 32) r(i)),
pfb_gain AS (
  SELECT CAST(i AS BIGINT) AS fc,
         CAST((i * 37) % 23 + 100 AS DOUBLE) / 112.0e0 AS pfb_gain
  FROM range(0, 8) r(i)),
calsol AS (
  SELECT CAST(i // 4 AS BIGINT) AS ant, CAST(i % 4 AS BIGINT) AS cc,
""".stripMargin + (0 until 8).map { k =>
    s"         CAST(((i // 4) * 29 + (i % 4) * 13 + $k * 7) % 39 AS DOUBLE)" +
      s" / 16.0e0 - 1.0e0 AS j$k"
  }.mkString(",\n") + """
  FROM range(0, 32) r(i))"""

  /** vis fact-table CTE — must mirror graft.synth.VisSynth.vis. */
  val visCte: String = {
    val comps = (0 until 8).map { k =>
      s"         CAST((seed * ${k + 3}) % 1997 AS DOUBLE) / 128.0e0" +
        s" - 7.5e0 AS v$k"
    }.mkString(",\n")
    s"""
vis AS (
  SELECT t, ant1, ant2, CAST(ant1 * 8 + ant2 AS BIGINT) AS bl, cc, fc,
         CAST(cc * 8 + fc AS BIGINT) AS chan,
         150000000.0e0 + (cc * 8 + fc) * 40000.0e0 AS freq_hz,
$comps,
         w
  FROM (
    SELECT CAST(l_orderkey % 16 AS BIGINT) AS t,
           CAST(least(l_suppkey % 8, l_partkey % 8) AS BIGINT) AS ant1,
           CAST(greatest(l_suppkey % 8, l_partkey % 8) AS BIGINT) AS ant2,
           CAST(l_linenumber % 4 AS BIGINT) AS cc,
           CAST((l_partkey + l_linenumber) % 8 AS BIGINT) AS fc,
           CAST(l_orderkey * 131 + l_partkey * 31 + l_suppkey * 17
                + l_linenumber * 7 AS BIGINT) AS seed,
           1.0e0 + CAST(CAST(floor(l_quantity) AS BIGINT) % 4 AS DOUBLE) AS w
    FROM lineitem))"""
  }

  /** vis + materialised flag column (reference FlagContext::set_flags,
    * /root/reference/src/flags.rs:217-221:
    * flag = ts_flag || ch_flag || bl_flag).
    */
  val visFlaggedCte: String = """
vis_flagged AS (
  SELECT v.*, (ts.ts_flag OR c.ch_flag OR b.bl_flag) AS flag
  FROM vis v
  JOIN timestep ts ON v.t = ts.t
  JOIN chan c ON v.chan = c.chan
  JOIN baseline b ON v.bl = b.bl)"""

  /** vis + flags + signed weight (reference flag_to_weight_array,
    * /root/reference/src/flags.rs:579-584 with
    * weight_factor = 8.0 per graft.model.Obs.WeightFactor).
    */
  val visWeightedCte: String = """
vis_weighted AS (
  SELECT *, CASE WHEN flag THEN -(w * 8.0e0) ELSE w * 8.0e0 END AS weight
  FROM vis_flagged)"""

  /** Assemble a full oracle query: WITH dims, vis[, extra ctes] body. */
  def query(body: String, extraCtes: String*): String = {
    val ctes = (Seq(dimCtes, visCte) ++ extraCtes).mkString(",")
    s"WITH $ctes\n$body"
  }

  /** Standard prelude for queries over the flagged+weighted vis. */
  def queryWeighted(body: String, extraCtes: String*): String =
    query(body, (Seq(visFlaggedCte, visWeightedCte) ++ extraCtes): _*)

  /** Like [[query]] but with `WITH RECURSIVE`, for oracles that iterate
    * (the Van Vleck Newton twin). Non-recursive CTEs are unaffected by
    * the keyword.
    */
  def queryRecursive(body: String, extraCtes: String*): String = {
    val ctes = (Seq(dimCtes, visCte) ++ extraCtes).mkString(",")
    s"WITH RECURSIVE $ctes\n$body"
  }
}
