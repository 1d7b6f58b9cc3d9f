package graft

import java.nio.file.Files

import graft.model.Dims
import graft.ops._
import graft.sinks.{MsContainer, MsWriter, UvfitsWriter}
import graft.sources.UvfitsReader
import graft.synth.VisSynth
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Cross-sink consistency: the SAME averaged frame exported through
  * the uvfits random-groups writer and the MS casacore container must
  * carry the same physics — bit-identical f32 visibilities and
  * weights, and UVW coordinates that agree across the two formats'
  * different conventions (uvfits: seconds, f32 group params; MS:
  * meters, f64 column). Two export paths, one truth; a divergence
  * anywhere in either encode/decode pipeline fails here even if each
  * sink's own round-trip gate stays green.
  */
class CrossSinkSpec extends AnyFunSuite {

  private val C = 299792458.0 // m/s, the uvfits seconds<->meters bridge

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("uvfits and MS container agree on DATA, WEIGHT and UVW") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, dir), Dims.timestep(spark), Dims.chan(spark),
      Dims.baseline(spark)))
    val avg = Averaging.avgTimeFreq(weighted, 2, 2).cache()
    val uvw = GeometryCorrection.partUvw(
      Dims.timestep(spark), Dims.antenna(spark))
    val tmp = Files.createTempDirectory("xsink")
    val fits = tmp.toString + "/obs.uvfits"
    val ms = tmp.toString + "/obs.ms"
    UvfitsWriter.write(avg, fits, uvw = Some(uvw),
      antenna = Some(Dims.antenna(spark)))
    MsContainer.write(avg, uvw, Dims.antenna(spark), ms)

    // uvfits read-back: (t_out, bl, c_out) -> f32 XX/YY, weight, UU
    val fitsRows = UvfitsReader.read(spark, fits, nAnts = 8)
      .select("t_out", "bl", "c_out", "a0", "a1", "a6", "a7",
        "weight_out", "u_s", "v_s", "w_s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getDouble(7), r.getDouble(8), r.getDouble(9),
          r.getDouble(10))).toMap
    assert(fitsRows.nonEmpty)

    // MS read-back through the independent casacore decoder, with the
    // mirror skeleton supplying the (t_out, bl) identity of each row
    val dec = MsContainer.readTable(ms,
      spark.sparkContext.hadoopConfiguration)
    val skeleton = MsWriter.msMain(avg, uvw)
      .select("row_idx", "t_out", "bl").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(skeleton.size.toLong == dec.nRows)

    val nChan = dec.cols.find(_.name == "DATA").get.shape(1)
    var cellsCompared = 0
    (0L until dec.nRows).foreach { r =>
      val (tOut, bl) = skeleton(r)
      val data = MsContainer.cell(dec, r, "DATA")
      val wspec = MsContainer.cell(dec, r, "WEIGHT_SPECTRUM")
      val msUvw = MsContainer.cell(dec, r, "UVW")
      (0 until nChan).foreach { c =>
        fitsRows.get((tOut, bl, c.toLong)).foreach {
          case (a0, a1, a6, a7, w, uS, vS, wS) =>
            // visibilities: both sinks cast the same doubles to f32 —
            // the read-back values must be BIT-identical
            assert(data((c * 4) * 2) == a0 &&
              data((c * 4) * 2 + 1) == a1,
              s"XX mismatch at (t_out=$tOut, bl=$bl, c=$c)")
            assert(data((c * 4 + 3) * 2) == a6 &&
              data((c * 4 + 3) * 2 + 1) == a7,
              s"YY mismatch at (t_out=$tOut, bl=$bl, c=$c)")
            assert(wspec(c * 4) == w,
              s"weight mismatch at (t_out=$tOut, bl=$bl, c=$c)")
            // UVW: uvfits seconds (f32) x c vs MS meters (f64) —
            // equal within one f32 ulp of the magnitude
            Seq(uS -> msUvw(0), vS -> msUvw(1), wS -> msUvw(2))
              .foreach { case (sec, m) =>
                assert(math.abs(sec * C - m) <=
                  math.abs(m) * 1.2e-7 + 1e-4,
                  s"UVW mismatch at (t_out=$tOut, bl=$bl): " +
                    s"${sec * C} vs $m")
              }
            cellsCompared += 1
        }
      }
    }
    // every uvfits cell found its MS twin (same grid, both dense)
    assert(cellsCompared == fitsRows.size,
      s"$cellsCompared of ${fitsRows.size} cells compared")
    avg.unpersist()
    ()
  }

  test("encodePartitions: scales with the frame, floors at default " +
    "parallelism, conf-overridable") {
    import graft.sinks.Sinks
    val floor = spark.sparkContext.defaultParallelism
    // small frames keep every core busy (the previous fixed count)
    assert(Sinks.encodePartitions(spark, 1L) == floor)
    assert(Sinks.encodePartitions(spark, 65536L * floor / 2) == floor)
    // big frames grow the task count linearly past the floor — on a
    // very wide machine the parallelism floor wins instead, so the
    // session-level assert uses max(size-derived, floor); the pure
    // rule is pinned with an explicit parallelism below
    assert(Sinks.encodePartitions(spark, 65536L * 1000) ==
      math.max(1000, floor))
    assert(Sinks.encodePartitions(spark, 65536L * 2000) ==
      math.max(2000, floor))
    // the pure derivation, environment-independent
    assert(Sinks.deriveEncodePartitions(65536L * 1000, 32) == 1000)
    assert(Sinks.deriveEncodePartitions(65536L * 2000, 32) == 2000)
    // capped: a 100 TB frame never explodes the scheduler
    assert(Sinks.encodePartitions(spark, Long.MaxValue / 4) == 65536)
    // explicit conf override wins
    spark.conf.set("spark.graft.sink.encodePartitions", "7")
    try assert(Sinks.encodePartitions(spark, 65536L * 1000) == 7)
    finally spark.conf.unset("spark.graft.sink.encodePartitions")
  }

  test("monotonically_increasing_id steps by exactly 1 within a " +
    "partition (the contract Bounded.rank and orderedRowIdx lean on)") {
    // Spark's API doc promises only monotone+unique; the repo's
    // row-index arithmetic additionally needs per-partition
    // CONSECUTIVE ids. orderedRowIdx verifies it at runtime per call;
    // this spec pins the stepping itself so a Spark upgrade that
    // changes it fails the suite even before any gate runs.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (0 until 1000).toDF("x").repartition(7)
      .withColumn("pid", spark_partition_id())
      .withColumn("mid", monotonically_increasing_id())
    val bad = df.groupBy("pid")
      .agg(count(lit(1)).as("n"), min("mid").as("lo"), max("mid").as("hi"))
      .where(col("hi") - col("lo") + 1 =!= col("n"))
      .count()
    assert(bad == 0L, "ids not consecutive within some partition")
    // and on a single coalesced partition they are exactly 0..n-1
    val one = (0 until 50).toDF("x").coalesce(1)
      .withColumn("mid", monotonically_increasing_id())
      .select("mid").collect().map(_.getLong(0)).toSeq
    assert(one == (0L until 50L))
  }

  test("orderedRowIdx: contiguous 0..n-1 in key order, partition-count" +
    " invariant, index assignment stays in the SQL plan") {
    import graft.sinks.Sinks
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // deliberately unsorted, with duplicate keys (ties broken by the
    // stable within-partition sort) and enough rows to span partitions
    val df = (0 until 997).map(i => ((i * 37) % 100, (i * 13) % 7, i))
      .toDF("t", "bl", "payload")
    def run(parts: Int) = Sinks.orderedRowIdx(df, Seq("t", "bl"), parts)
    val out = run(8)
    val rows = out.orderBy("row_idx")
      .select("row_idx", "t", "bl").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 997L))
    // row_idx order IS (t, bl) lexicographic order
    val keys = rows.map(r => (r.getInt(1), r.getInt(2))).toSeq
    assert(keys == keys.sorted)
    // the (t, bl) -> sorted-position contract is partition-count
    // invariant: every count yields key-sorted contiguous indices
    for (p <- Seq(1, 3, 32)) {
      val k2 = run(p).orderBy("row_idx")
        .select("t", "bl").collect().map(r => (r.getInt(0), r.getInt(1)))
      assert(k2.toSeq == keys, s"key order diverged at numParts=$p")
    }
    // the index assignment executes as SQL (broadcast offsets join +
    // projection), not an opaque external-Row RDD: the old
    // rdd.zipWithIndex shape planned as a bare `Scan ExistingRDD`
    // leaf with zero joins
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the offsets broadcast join in the plan:\n$plan")
    assert(plan.contains("row_idx"),
      "expected row_idx computed by a Project in the SQL plan")
  }
}
