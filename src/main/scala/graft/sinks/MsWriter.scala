package graft.sinks

import graft.model.Obs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K2: CASA Measurement Set sink as a parquet mirror
  * (reference `write_ms`, /root/reference/src/io/mod.rs:542-595; the MS
  * golden-output matrix in src/cli.rs and `compare_ms_with_csv`,
  * src/test_common.rs:482).
  *
  * A Measurement Set is a directory of tables: a MAIN table with one row
  * per (time, baseline) holding a chan×pol DATA matrix plus UVW / timing /
  * flag scalars, and small dimension subtables (ANTENNA, SPECTRAL_WINDOW,
  * POLARIZATION, FIELD, OBSERVATION). The Spark-native mirror is exactly
  * that: a partitioned parquet MAIN table plus one tiny parquet per
  * subtable — each subtable is a broadcastable DataFrame, the MAIN table
  * is written per-partition by the executors (no driver-side row
  * iteration at all, unlike the single-file FITS writers).
  *
  * Time model: MS TIME is MJD UTC seconds; the synthetic observation's
  * timestamps are GPS seconds, so TIME = MJD_GPS_EPOCH·86400 − 18 (the
  * 2019 GPS−UTC leap offset) + gps. All terms are integer-valued doubles,
  * so the oracle (graft.oracle.Oracles.k2MsOrder) reproduces them
  * exactly. UVW is evaluated at the window-start timestep from the same
  * per-(t, ant) table as C2 ([[graft.ops.GeometryCorrection.partUvw]]).
  */
object MsWriter {

  /** MJD seconds at the GPS epoch (1980-01-06, MJD 44244) minus the
    * 18 s GPS−UTC leap offset of the observation era.
    */
  val MjdEpochOffsetS: Double = 44244.0 * 86400.0 - 18.0

  /** MAIN-table row skeleton: one row per (t_out, bl) in MS row order
    * (time-major, then baseline), with the global `row_idx` assigned by
    * the scale-correct range-partition + zipWithIndex pass
    * ([[Sinks.orderedRowIdx]]).
    *
    * Input `avg` is an averaged frame (bl, ant1, ant2, t_out, c_out,
    * a0..a7, flag_out, weight_out); `uvw` is the (t, ant) partial-UVW
    * dimension. Aggregates over the channel axis are shuffle-exact:
    * weight sums are dyadic rationals, FLAG_ROW is a bool_and.
    */
  /** The per-(t_out, ant) partial-UVW dim evaluated at each output
    * window's CENTROID — the same instant the MAIN TIME column (and
    * the uvfits DATE) is stamped at; the reference evaluates UVWs at
    * centroid timesteps too. In input-step coordinates the centroid is
    * t_out·avgTime + avgTime/2: an exact table entry when avgTime is
    * even, the midpoint of the two neighbouring steps when odd
    * (clamped to the lower step at the end of the scan).
    */
  def centroidUvw(uvw: DataFrame, avgTime: Int): DataFrame = {
    val half = avgTime / 2
    val lo = uvw
      .where((col("t") - half) % avgTime === 0)
      .select(((col("t") - half) / avgTime).cast("long").as("t_out"),
        col("t"), col("ant"), col("u_m"), col("v_m"), col("w_m"))
    if (avgTime % 2 == 0) lo.drop("t")
    else {
      val hi = uvw.select((col("t") - 1).as("t"), col("ant"),
        col("u_m").as("u_hi"), col("v_m").as("v_hi"),
        col("w_m").as("w_hi"))
      lo.join(hi, Seq("t", "ant"), "left")
        .select(col("t_out"), col("ant"),
          ((col("u_m") + coalesce(col("u_hi"), col("u_m"))) / 2.0)
            .as("u_m"),
          ((col("v_m") + coalesce(col("v_hi"), col("v_m"))) / 2.0)
            .as("v_m"),
          ((col("w_m") + coalesce(col("w_hi"), col("w_m"))) / 2.0)
            .as("w_m"))
    }
  }

  def msMain(avg: DataFrame, uvw: DataFrame, avgTime: Int = 2,
             intTimeS: Double = Obs.IntTimeS,
             gpsStartS: Double = Obs.GpsStart.toDouble): DataFrame = {
    val interval = intTimeS * avgTime
    val timeConst = MjdEpochOffsetS + gpsStartS + interval / 2.0
    val rows = avg.groupBy("t_out", "bl", "ant1", "ant2").agg(
      count(lit(1)).as("n_chan"),
      expr("bool_and(flag_out)").as("flag_row"),
      sum("weight_out").as("weight_sum"))
    val uvwC = centroidUvw(uvw, avgTime)
    val u1 = broadcast(uvwC.select(col("t_out"),
      col("ant").as("ant1"), col("u_m").as("u1"), col("v_m").as("v1"),
      col("w_m").as("w1")))
    val u2 = broadcast(uvwC.select(col("t_out"),
      col("ant").as("ant2"), col("u_m").as("u2"), col("v_m").as("v2"),
      col("w_m").as("w2")))
    val joined = rows
      .join(u1, Seq("t_out", "ant1"))
      .join(u2, Seq("t_out", "ant2"))
      .select(col("t_out"), col("bl"), col("ant1"), col("ant2"),
        (lit(timeConst) + col("t_out").cast("double") * lit(interval))
          .as("time_s"),
        lit(interval).as("interval_s"),
        lit(interval).as("exposure_s"),
        round(col("u1") - col("u2"), 6).as("u_m"),
        round(col("v1") - col("v2"), 6).as("v_m"),
        round(col("w1") - col("w2"), 6).as("w_m"),
        col("n_chan"), col("flag_row"), col("weight_sum"),
        lit(0L).as("data_desc_id"), lit(0L).as("field_id"),
        lit(1L).as("scan_number"))
    Sinks.orderedRowIdx(joined, Seq("t_out", "bl"))
  }

  /** Per-row chan×pol payload matrices: DATA (8 Jones components per
    * channel), WEIGHT_SPECTRUM and FLAG, channel-sorted — the MAIN-table
    * array columns. Kept separate from [[msMain]] so the scalar skeleton
    * stays oracle-comparable (DuckDB hashes scalars, not nested arrays).
    */
  def msData(avg: DataFrame): DataFrame = {
    val chanStruct = struct(col("c_out") +:
      (0 until 8).map(k => col(s"a$k")) :+
      col("weight_out") :+ col("flag_out"): _*)
    avg.groupBy("t_out", "bl").agg(
      array_sort(collect_list(chanStruct)).as("chans"))
      .select(col("t_out"), col("bl"),
        expr("transform(chans, c -> array(c.a0, c.a1, c.a2, c.a3, " +
          "c.a4, c.a5, c.a6, c.a7))").as("data"),
        expr("transform(chans, c -> c.weight_out)")
          .as("weight_spectrum"),
        expr("transform(chans, c -> c.flag_out)").as("flag"))
  }

  /** ANTENNA subtable (name, station, local ENH position, mount). */
  def antennaTable(antenna: DataFrame): DataFrame =
    antenna.select(col("ant").as("antenna_id"),
      concat(lit("Tile"), lpad(col("ant").cast("string"), 3, "0"))
        .as("name"),
      lit("MWA").as("station"),
      col("east_m"), col("north_m"), col("height_m"),
      lit(4.0).as("dish_diameter_m"),
      lit("ALT-AZ").as("mount"))

  /** SPECTRAL_WINDOW subtable: one row, channel-centre array for the
    * averaged grid (avgFreq fine channels per output channel).
    */
  def spectralWindowTable(spark: SparkSession,
                          avgFreq: Int = 2): DataFrame = {
    val nOut = Obs.NumChans / avgFreq
    val widthHz = Obs.FineChanWidthHz * avgFreq
    // centre of the avgFreq-wide window = mean of member centres
    val freqs = (0 until nOut).map(c =>
      Obs.BaseFreqHz + (c * avgFreq + (avgFreq - 1) / 2.0)
        * Obs.FineChanWidthHz)
    import spark.implicits._
    Seq((0L, nOut.toLong, freqs, widthHz, widthHz * nOut, freqs.head))
      .toDF("spectral_window_id", "num_chan", "chan_freq_hz",
        "chan_width_hz", "total_bandwidth_hz", "ref_frequency_hz")
  }

  /** POLARIZATION subtable: casacore Stokes codes XX=9 XY=10 YX=11 YY=12. */
  def polarizationTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((0L, 4L, Seq(9, 10, 11, 12)))
      .toDF("polarization_id", "num_corr", "corr_type")
  }

  /** FIELD subtable: the synthetic phase centre (HA0, Dec of the dyadic
    * geometry model).
    */
  def fieldTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import graft.ops.GeometryCorrection
    Seq((0L, "GRAFT",
      Seq(GeometryCorrection.Ha0, GeometryCorrection.DecRad)))
      .toDF("field_id", "name", "phase_dir_rad")
  }

  /** OBSERVATION subtable: telescope + observation time range. */
  def observationTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val t0 = MjdEpochOffsetS + Obs.GpsStart.toDouble
    val t1 = t0 + Obs.NumTimesteps * Obs.IntTimeS
    Seq((0L, "MWA", "graft", Seq(t0, t1)))
      .toDF("observation_id", "telescope_name", "observer",
        "time_range_mjd_s")
  }

  /** Write the full MS parquet mirror: MAIN (skeleton ⋈ payload arrays,
    * written by the executors, partitioned for parallel re-read) and the
    * dimension subtables. Returns the MAIN row count (row-count
    * invariant, as the uvfits/mwaf writers check).
    */
  def write(avg: DataFrame, uvw: DataFrame, antenna: DataFrame,
            dir: String, avgTime: Int = 2, avgFreq: Int = 2): Long = {
    val spark = avg.sparkSession
    val cached = avg.cache()
    val main = msMain(cached, uvw, avgTime)
      .join(msData(cached), Seq("t_out", "bl"))
    main.write.mode("overwrite").parquet(s"$dir/MAIN")
    antennaTable(antenna).write.mode("overwrite")
      .parquet(s"$dir/ANTENNA")
    spectralWindowTable(spark, avgFreq).write.mode("overwrite")
      .parquet(s"$dir/SPECTRAL_WINDOW")
    polarizationTable(spark).write.mode("overwrite")
      .parquet(s"$dir/POLARIZATION")
    fieldTable(spark).write.mode("overwrite").parquet(s"$dir/FIELD")
    observationTable(spark).write.mode("overwrite")
      .parquet(s"$dir/OBSERVATION")
    cached.unpersist()
    spark.read.parquet(s"$dir/MAIN").count()
  }
}
