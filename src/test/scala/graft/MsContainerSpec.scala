package graft

import java.nio.file.Files

import graft.model.Dims
import graft.ops._
import graft.sinks.{CasaTables, MsContainer, MsWriter}
import graft.synth.VisSynth
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** MS container round trip: the casacore-structure directory export
  * (AipsIO table.dat / StManAipsIO table.f0 per table) must parse
  * back bit-for-bit through the independent [[CasaTables]] decoder
  * and match the parquet mirror's MAIN skeleton in MS row order.
  */
class MsContainerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def conf = spark.sparkContext.hadoopConfiguration

  test("table.dat descriptor chain round-trips through AipsIO") {
    val cols = MsContainer.mainCols(16)
    val bytes = CasaTables.tableDat("MAIN", 288L, cols)
    val (n, back) = CasaTables.readTableDat(bytes)
    assert(back == cols && n == 288L)
    // every object header in the stream carries the casacore magic
    // and the expected chain shape: Table, TableDesc, 2 keyword
    // records (+RecordDesc each), 16 scalar + 6 array column descs
    // (arrays add an IPosition), per-column keyword records, ColumnSet
    val objs = CasaTables.walk(bytes)
    assert(objs.length == 79)
    assert(objs.count(_.tpe == "Table") == 1)
    assert(objs.count(_.tpe == "TableDesc") == 1)
    assert(objs.count(_.tpe == "ColumnSet") == 1)
    assert(objs.count(_.tpe == "IPosition") == 6)
    assert(objs.count(_.tpe.startsWith("ScalarColumnDesc<")) == 16)
    assert(objs.count(_.tpe.startsWith("ArrayColumnDesc<")) == 6)
  }

  test("table keyword record round-trips subtable links and scalars") {
    val cols = Seq(CasaTables.CasaCol("X", CasaTables.TpInt, Nil))
    val kw = Seq(
      "MS_VERSION" -> (CasaTables.RecFloat(2.0f): CasaTables.RecVal),
      "ANTENNA" -> (CasaTables.RecTable("ANTENNA"): CasaTables.RecVal),
      "NOTE" -> (CasaTables.RecString("hello"): CasaTables.RecVal))
    val bytes = CasaTables.tableDat("T", 1L, cols, kw)
    val (n, back, kwBack) = CasaTables.readTableDatKw(bytes)
    assert(n == 1L && back == cols)
    assert(kwBack == kw)
  }

  test("decoder fails loudly on corrupt magic, wrong chain, " +
    "truncation") {
    val cols = MsContainer.mainCols(4)
    val bytes = CasaTables.tableDat("MAIN", 8L, cols)
    // flip one byte of the first object's magic
    val corrupt = bytes.clone()
    corrupt(4) = 0x00
    val e1 = intercept[IllegalArgumentException] {
      CasaTables.readTableDat(corrupt)
    }
    assert(e1.getMessage.contains("bebebebe"))
    // a data file is not a descriptor: the chain check rejects it
    val f0 = CasaTables.stManF0(1L, Seq(CasaTables.CasaCol("X",
      CasaTables.TpInt, Nil)), Map("X" -> Seq(Seq(1.0))))
    val e2 = intercept[IllegalArgumentException] {
      CasaTables.readTableDat(f0)
    }
    assert(e2.getMessage.contains("Table"))
    // truncated stream: walk must not read past the end silently
    intercept[Exception] {
      CasaTables.walk(bytes.take(bytes.length / 2))
    }
    ()
  }

  test("strict replay consumes every object exactly and fails on " +
    "out-of-sequence fields the skip-based decoder tolerates") {
    val cols = MsContainer.mainCols(4)
    val bytes = CasaTables.tableDat("MAIN", 8L, cols)
    // clean replay: exact consumption end to end, descriptors decoded
    val (n, back, _, objs) = CasaTables.replayTableDat(bytes)
    assert(n == 8L && back == cols)
    assert(objs.length == CasaTables.walk(bytes).length)
    // and the f0 side, including an empty (zero-row) table's
    // single empty extension
    val f0 = CasaTables.stManF0(8L, Seq(CasaTables.CasaCol("X",
      CasaTables.TpInt, Nil)),
      Map("X" -> (1 to 8).map(i => Seq(i.toDouble))))
    CasaTables.replayF0(f0, 8L,
      Seq(CasaTables.CasaCol("X", CasaTables.TpInt, Nil)))
    val empty = CasaTables.stManF0(0L, MsContainer.stateCols,
      Map.empty, Map.empty)
    CasaTables.replayF0(empty, 0L, MsContainer.stateCols)
    // the ratchet: an IN-SEQUENCE corruption the framing survives.
    // Grow the Table object's framed length by 4 (simulating a field
    // the writer appended that the reader does not know) — magics,
    // types and nesting all still parse, walk() and readTableDat()
    // accept it, but the exact-consumption replay must refuse.
    val padded = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(bytes)
      o.write(Array[Byte](0, 0, 0, 0)) // trailing junk inside Table
      val b = o.toByteArray
      val newLen = java.nio.ByteBuffer.wrap(b, 0, 4).getInt + 4
      java.nio.ByteBuffer.wrap(b).putInt(0, newLen)
      b
    }
    CasaTables.readTableDat(padded) // skip-based decoder: silent pass
    val e = intercept[IllegalArgumentException] {
      CasaTables.replayTableDat(padded)
    }
    assert(e.getMessage.contains("consumed"))
    // and trailing bytes AFTER the last object are refused too
    val trailing = bytes ++ Array[Byte](1)
    CasaTables.readTableDat(trailing)
    val e2 = intercept[IllegalArgumentException] {
      CasaTables.replayTableDat(trailing)
    }
    assert(e2.getMessage.contains("trailing"))
    // a SAME-LENGTH value mutation (framing fully intact, only the
    // replay's in-place value asserts can catch it): swap a column's
    // option flag from scalar (0) to array (5) — the class/option/
    // ndim agreement must refuse
    def ascii(s: String) = s.getBytes("ASCII")
    val tIdx = {
      // locate the first ScalarColumnDesc, then its option int: after
      // name/comment/manType/manGroup strings + valueType int
      val needle = ascii("ScalarColumnDesc<Double>")
      val at = bytes.indexOfSlice(needle)
      assert(at > 0)
      var p = at + needle.length + 4 // + version uInt
      def skipStr(): Unit = {
        p += 4 + java.nio.ByteBuffer.wrap(bytes, p, 4).getInt
      }
      skipStr(); skipStr(); skipStr(); skipStr() // name/comment/mt/mg
      p += 4 // valueType
      p // option offset
    }
    val swapped = bytes.clone()
    java.nio.ByteBuffer.wrap(swapped).putInt(tIdx, 5)
    CasaTables.readTableDat(swapped) // skip-based decoder: silent pass
    val e3 = intercept[IllegalArgumentException] {
      CasaTables.replayTableDat(swapped)
    }
    assert(e3.getMessage.contains("option") ||
      e3.getMessage.contains("consumed"), e3.getMessage)
    ()
  }

  test("container MAIN matches the mirror skeleton in row order") {
    val dir = "/root/testdata/sf0.001"
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, dir), Dims.timestep(spark), Dims.chan(spark),
      Dims.baseline(spark)))
    val avg = Averaging.avgTimeFreq(weighted, 2, 2)
    val uvw = graft.ops.GeometryCorrection.partUvw(
      Dims.timestep(spark), Dims.antenna(spark))

    val out = Files.createTempDirectory("msc").toString + "/obs.ms"
    val n = MsContainer.write(avg, uvw, Dims.antenna(spark), out)

    val mirror = MsWriter.msMain(avg, uvw).orderBy("row_idx").collect()
    assert(n == mirror.length.toLong)

    val dec = MsContainer.readTable(out, conf)
    assert(dec.nRows == n)
    mirror.zipWithIndex.foreach { case (m, i) =>
      val r = i.toLong
      // scalars are f64/exact — bit-for-bit vs the mirror
      assert(MsContainer.cell(dec, r, "TIME").head ==
        m.getAs[Double]("time_s"), s"TIME row $i")
      assert(MsContainer.cell(dec, r, "ANTENNA1").head ==
        m.getAs[Long]("ant1").toDouble)
      assert(MsContainer.cell(dec, r, "ANTENNA2").head ==
        m.getAs[Long]("ant2").toDouble)
      val uvwCell = MsContainer.cell(dec, r, "UVW")
      assert(uvwCell == Seq(m.getAs[Double]("u_m"),
        m.getAs[Double]("v_m"), m.getAs[Double]("w_m")), s"UVW row $i")
      assert(MsContainer.cell(dec, r, "FLAG_ROW").head ==
        (if (m.getAs[Boolean]("flag_row")) 1.0 else 0.0))
    }
  }

  test("readTable maxRows bound trips from table.dat BEFORE the f0 " +
    "slurp (same discipline as replay)") {
    val dir = "/root/testdata/sf0.001"
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, dir), Dims.timestep(spark), Dims.chan(spark),
      Dims.baseline(spark)))
    val avg = Averaging.avgTimeFreq(weighted, 2, 2)
    val uvw = graft.ops.GeometryCorrection.partUvw(
      Dims.timestep(spark), Dims.antenna(spark))
    val out = Files.createTempDirectory("mscb").toString + "/obs.ms"
    val n = MsContainer.write(avg, uvw, Dims.antenna(spark), out)
    assert(n > 1)
    // a bound below the row count fails loudly, naming the bound —
    // and the guard must hold even when table.f0 is unreadable, which
    // proves the check runs before the data-file slurp
    val e = intercept[IllegalArgumentException](
      MsContainer.readTable(out, conf, maxRows = n - 1))
    assert(e.getMessage.contains(s"bound ${n - 1}"))
    val f0 = new java.io.File(out, "table.f0")
    val moved = new java.io.File(out, "table.f0.away")
    assert(f0.renameTo(moved))
    try intercept[IllegalArgumentException](
      MsContainer.readTable(out, conf, maxRows = n - 1))
    finally assert(moved.renameTo(f0))
    // at the bound, the decode proceeds
    assert(MsContainer.readTable(out, conf, maxRows = n).nRows == n)
  }

  test("write determinism: two writes of the same frame produce " +
    "byte-identical containers (the shared-write seam's contract)") {
    val dir = "/root/testdata/sf0.001"
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, dir), Dims.timestep(spark), Dims.chan(spark),
      Dims.baseline(spark)))
    val avg = Averaging.avgTimeFreq(weighted, 2, 2)
    val uvw = graft.ops.GeometryCorrection.partUvw(
      Dims.timestep(spark), Dims.antenna(spark))
    val outA = Files.createTempDirectory("msda").toString + "/obs.ms"
    val outB = Files.createTempDirectory("msdb").toString + "/obs.ms"
    MsContainer.write(avg, uvw, Dims.antenna(spark), outA)
    MsContainer.write(avg, uvw, Dims.antenna(spark), outB)
    def files(root: String): Seq[String] = {
      val b = java.nio.file.Paths.get(root)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(b).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => b.relativize(p).toString).toSeq.sorted
    }
    val fa = files(outA)
    assert(fa == files(outB) && fa.nonEmpty)
    fa.foreach { rel =>
      val a = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(outA, rel))
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(outB, rel))
      assert(java.util.Arrays.equals(a, b), s"$rel bytes differ")
    }
  }

  test("encode-parallelism invariance: an encodePartitions override " +
    "changes the task count, not the decoded container") {
    val dir = "/root/testdata/sf0.001"
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, dir), Dims.timestep(spark), Dims.chan(spark),
      Dims.baseline(spark)))
    val avg = Averaging.avgTimeFreq(weighted, 2, 2)
    val uvw = graft.ops.GeometryCorrection.partUvw(
      Dims.timestep(spark), Dims.antenna(spark))
    val outA = Files.createTempDirectory("mspa").toString + "/obs.ms"
    val outB = Files.createTempDirectory("mspb").toString + "/obs.ms"
    MsContainer.write(avg, uvw, Dims.antenna(spark), outA)
    spark.conf.set("spark.graft.sink.encodePartitions", "3")
    try MsContainer.write(avg, uvw, Dims.antenna(spark), outB)
    finally spark.conf.unset("spark.graft.sink.encodePartitions")
    // the StManAipsIO extension chain's CHUNK boundaries follow the
    // partitioning (each task emits one self-contained extension), so
    // table.f0 bytes legitimately differ — the DECODED table must not
    val a = MsContainer.readTable(outA, conf)
    val b = MsContainer.readTable(outB, conf)
    assert(a.nRows == b.nRows && a.nRows > 0)
    (0L until a.nRows).foreach { r =>
      Seq("DATA", "WEIGHT_SPECTRUM", "FLAG", "UVW").foreach { c =>
        assert(MsContainer.cell(a, r, c) == MsContainer.cell(b, r, c),
          s"row $r col $c diverged across encode partitionings")
      }
    }
  }

  test("container DATA carries the averaged payload at f32") {
    val dir = "/root/testdata/sf0.001"
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, dir), Dims.timestep(spark), Dims.chan(spark),
      Dims.baseline(spark)))
    val avg = Averaging.avgTimeFreq(weighted, 2, 2).cache()
    val uvw = graft.ops.GeometryCorrection.partUvw(
      Dims.timestep(spark), Dims.antenna(spark))
    val out = Files.createTempDirectory("msc2").toString + "/obs.ms"
    MsContainer.write(avg, uvw, Dims.antenna(spark), out)

    val dec = MsContainer.readTable(out, conf)
    val skeleton = MsWriter.msMain(avg, uvw)
      .select("row_idx", "t_out", "bl").collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0)).toMap
    val cells = avg.select("t_out", "bl", "c_out", "a0", "a7",
      "weight_out", "flag_out").collect()
    assert(cells.nonEmpty)
    cells.foreach { c =>
      val row = skeleton((c.getLong(0), c.getLong(1)))
      val ch = c.getLong(2).toInt
      val d = MsContainer.cell(dec, row, "DATA")
      // pol 0 (XX) re/im of this channel
      assert(d(ch * 8) == c.getDouble(3).toFloat.toDouble,
        s"DATA re (t_out=${c.getLong(0)}, bl=${c.getLong(1)}, ch=$ch)")
      // pol 3 (YY) re = a6... spot-check weight + flag planes instead
      val w = MsContainer.cell(dec, row, "WEIGHT_SPECTRUM")
      assert(w(ch * 4) == c.getDouble(5).toFloat.toDouble)
      val f = MsContainer.cell(dec, row, "FLAG")
      assert(f(ch * 4) == (if (c.getBoolean(6)) 1.0 else 0.0))
    }
    avg.unpersist()
  }

  test("subtables parse back") {
    val dir = "/root/testdata/sf0.001"
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, dir), Dims.timestep(spark), Dims.chan(spark),
      Dims.baseline(spark)))
    val avg = Averaging.avgTimeFreq(weighted, 2, 2)
    val uvw = graft.ops.GeometryCorrection.partUvw(
      Dims.timestep(spark), Dims.antenna(spark))
    val out = Files.createTempDirectory("msc3").toString + "/obs.ms"
    MsContainer.write(avg, uvw, Dims.antenna(spark), out)

    val ant = MsContainer.readTable(s"$out/ANTENNA", conf)
    assert(ant.nRows == 8)
    assert(MsContainer.strCell(ant, 0, "NAME") == "Tile000")
    assert(MsContainer.strCell(ant, 7, "MOUNT") == "ALT-AZ")
    val pos0 = MsContainer.cell(ant, 0, "POSITION")
    assert(pos0 == Seq(-150.0, -50.0, 377.0)) // ant 0 ENH

    val spw = MsContainer.readTable(s"$out/SPECTRAL_WINDOW", conf)
    assert(spw.nRows == 1)
    assert(MsContainer.cell(spw, 0, "NUM_CHAN").head == 16.0)
    val freqs = MsContainer.cell(spw, 0, "CHAN_FREQ")
    assert(freqs.length == 16 && freqs.head == 1.5e8 + 20000.0)

    val pol = MsContainer.readTable(s"$out/POLARIZATION", conf)
    assert(pol.nRows == 1)
    assert(MsContainer.cell(pol, 0, "CORR_TYPE") ==
      Seq(9.0, 10.0, 11.0, 12.0))

    val fld = MsContainer.readTable(s"$out/FIELD", conf)
    assert(fld.nRows == 1)
    assert(MsContainer.strCell(fld, 0, "NAME") == "GRAFT")
    // default PHASE_DIR is a real RA/Dec (the fixed gate ephemeris),
    // not the geometry stage's hour-angle constant
    assert(MsContainer.cell(fld, 0, "PHASE_DIR") ==
      Seq(graft.ops.GeometryCorrection.AppRaJ2000,
        graft.ops.GeometryCorrection.AppDecJ2000))

    val obs = MsContainer.readTable(s"$out/OBSERVATION", conf)
    assert(obs.nRows == 1)
    assert(MsContainer.strCell(obs, 0, "TELESCOPE_NAME") == "MWA")
    val tr = MsContainer.cell(obs, 0, "TIME_RANGE")
    assert(tr.length == 2 && tr(1) - tr(0) == 32.0) // 16 steps x 2 s

    // the MS2 required set beyond the populated dims: the one
    // DATA_DESCRIPTION configuration, the per-antenna dual-linear
    // FEED rows, and the zero-row command/history/pointing/processor/
    // state tables — all structurally parseable
    val dd = MsContainer.readTable(s"$out/DATA_DESCRIPTION", conf)
    assert(dd.nRows == 1)
    assert(MsContainer.cell(dd, 0, "SPECTRAL_WINDOW_ID").head == 0.0)
    assert(MsContainer.cell(dd, 0, "POLARIZATION_ID").head == 0.0)

    val feed = MsContainer.readTable(s"$out/FEED", conf)
    assert(feed.nRows == 8)
    assert(MsContainer.cell(feed, 3, "ANTENNA_ID").head == 3.0)
    assert(MsContainer.cell(feed, 0, "NUM_RECEPTORS").head == 2.0)
    assert(MsContainer.strCell(feed, 0, "POLARIZATION_TYPE") == "X,Y")
    assert(MsContainer.cell(feed, 0, "RECEPTOR_ANGLE") == Seq(0.0, 0.0))

    Seq("FLAG_CMD", "HISTORY", "POINTING", "PROCESSOR", "STATE")
      .foreach { t =>
        val dec = MsContainer.readTable(s"$out/$t", conf)
        assert(dec.nRows == 0, s"$t row count")
      }

    // MAIN's keywordSet links every required subtable by name — the
    // path casacore's MeasurementSet resolves subtables through
    val links = MsContainer.readKeywords(out, conf).collect {
      case (n, CasaTables.RecTable(v)) => (n, v)
    }.toMap
    assert(MsContainer.subtableNames.forall(n =>
      links.get(n).contains(n)), s"incomplete links: $links")

    // MAIN's new required columns decode with the documented
    // conventions (zeros / -1 STATE_ID / TIME_CENTROID = TIME /
    // WEIGHT = per-pol spectrum sum, SIGMA its inverse root)
    val main = MsContainer.readTable(out, conf)
    assert(MsContainer.cell(main, 0, "STATE_ID").head == -1.0)
    assert(MsContainer.cell(main, 0, "FEED1").head == 0.0)
    assert(MsContainer.cell(main, 0, "TIME_CENTROID").head ==
      MsContainer.cell(main, 0, "TIME").head)
    val w0 = MsContainer.cell(main, 0, "WEIGHT")
    val ws0 = MsContainer.cell(main, 0, "WEIGHT_SPECTRUM")
    (0 until 4).foreach { p =>
      val sum = (0 until ws0.length / 4).map(c => ws0(c * 4 + p)).sum
      assert(math.abs(w0(p) - sum) < 1e-3, s"WEIGHT pol $p")
      val sig = MsContainer.cell(main, 0, "SIGMA")(p)
      if (w0(p) > 0) assert(math.abs(sig - 1.0 / math.sqrt(w0(p))) < 1e-6)
      else assert(sig == -1.0)
    }

    // full-container structural audit (the q_k2c gate's core):
    // every AipsIO header magic-verified in both files of every table
    (out +: MsContainer.subtableNames.map(n => s"$out/$n"))
      .foreach { d =>
        val (_, nCols, _, f0Objs) = MsContainer.audit(d, conf)
        assert(f0Objs == nCols + 1, s"$d f0 object count")
      }
  }
}
