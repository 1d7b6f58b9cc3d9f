package graft

import graft.functions.SumThresholdKernel
import graft.llm.TextAnalysis
import graft.ops.PassbandGains.scrunchGains
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property tests for the pure kernels (FIXTURES.md §3 class
  * of invariants, randomised).
  */
object PropertySpecs extends Properties("kernels") {

  val gainGen: Gen[(Array[Double], Int)] = for {
    out <- Gen.chooseNum(1, 12)
    f <- Gen.oneOf(1, 2, 3, 4, 5, 8)
    vals <- Gen.listOfN(out * f, Gen.chooseNum(0.25, 4.0))
  } yield (vals.toArray, f)

  property("scrunch preserves total power (weights sum to 1 per chan)") =
    Prop.forAll(gainGen) { case (g, f) =>
      val simple = scrunchGains(g, f, centerSymmetric = false)
      val sym = scrunchGains(g, f, centerSymmetric = true)
      // each output is a convex combination -> bounded by input range
      val (lo, hi) = (g.min - 1e-9, g.max + 1e-9)
      simple.forall(v => v >= lo && v <= hi) &&
        sym.forall(v => v >= lo && v <= hi) &&
        simple.length == g.length / f && sym.length == g.length / f
    }

  property("scrunch of a constant table is constant") =
    Prop.forAll(Gen.chooseNum(1, 10), Gen.oneOf(1, 2, 3, 4),
      Gen.chooseNum(0.5, 3.0)) { (out, f, v) =>
      scrunchGains(Array.fill(out * f)(v), f, centerSymmetric = true)
        .forall(x => math.abs(x - v) < 1e-12)
    }

  property("rolling hash is shift-consistent") =
    Prop.forAll(Gen.alphaNumStr.suchThat(_.length >= 12)) { s =>
      val w = 8
      val h1 = TextAnalysis.rollingHash(s, w)
      val h2 = TextAnalysis.rollingHash(s.drop(1), w)
      // hashes of the shifted text are the tail of the original's
      h1.drop(1).sameElements(h2)
    }

  property("channel ranges: fromIdxs covers exactly the input, maximal") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0, 40))) { raw =>
      val idxs = raw.distinct.sorted
      val ranges = graft.ops.ChannelRanges.fromIdxs(idxs)
      val covered = ranges.flatMap { case (a, b) => a to b }
      // exact cover, no overlaps, and maximal contiguity (adjacent
      // ranges are separated by a real gap)
      covered == idxs &&
        ranges.sliding(2).forall {
          case Seq((_, e1), (s2, _)) => s2 > e1 + 1
          case _ => true
        }
    }

  property("channel ranges: parse of rendered ranges round-trips") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0, 40))) { raw =>
      val idxs = raw.distinct.sorted
      val ranges = graft.ops.ChannelRanges.fromIdxs(idxs)
      val spec = ranges.map { case (a, b) =>
        if (a == b) s"$a" else s"$a-$b"
      }.mkString(", ")
      graft.ops.ChannelRanges.parse(spec) == Right(ranges)
    }

  property("nutation stays inside the IAU 1980 series envelope") =
    Prop.forAll(Gen.chooseNum(-1.0, 1.0)) { t => // ±1 century of J2000
      val (dpsi, deps) = graft.functions.Astro.nutation(t)
      val arc = math.Pi / 180 / 3600
      // dominant terms bound the series: |dpsi| < 20", |deps| < 11"
      math.abs(dpsi) < 20 * arc && math.abs(deps) < 11 * arc
    }

  property("apparent place shifts a bounded arc from the mean place") =
    Prop.forAll(Gen.chooseNum(0.1, 6.1), Gen.chooseNum(-1.2, 1.2),
      Gen.chooseNum(2451545.0, 2469807.5)) { (ra, dec, jd) =>
      val (raM, decM) = graft.functions.Astro.precessRaDec(ra, dec, jd)
      val (raA, decA) = graft.functions.Astro.apparentRaDec(ra, dec, jd)
      val arc = math.Pi / 180 / 3600
      // nutation + aberration together are < 60 arcsec anywhere
      val dRa = math.atan2(math.sin(raA - raM), math.cos(raA - raM))
      math.abs(decA - decM) < 60 * arc &&
        math.abs(dRa) * math.cos(decM) < 60 * arc
    }

  private val colGen: Gen[graft.sinks.CasaTables.CasaCol] = for {
    n <- Gen.chooseNum(1, 24)
    name <- Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)
    typ <- Gen.oneOf(graft.sinks.CasaTables.TpBool,
      graft.sinks.CasaTables.TpInt, graft.sinks.CasaTables.TpFloat,
      graft.sinks.CasaTables.TpDouble, graft.sinks.CasaTables.TpComplex,
      graft.sinks.CasaTables.TpString)
    ndim <- Gen.chooseNum(0, 2)
    shape <- Gen.listOfN(ndim, Gen.chooseNum(1, 8))
  } yield graft.sinks.CasaTables.CasaCol(name, typ, shape)

  property("MS table.dat descriptor round-trips any column set") =
    Prop.forAll(Gen.nonEmptyListOf(colGen),
      Gen.chooseNum(0L, 0xffffffffL)) { (cols, n) =>
      val bytes = graft.sinks.CasaTables.tableDat("T", n, cols)
      val (m, back) = graft.sinks.CasaTables.readTableDat(bytes)
      back == cols && m == n &&
        graft.sinks.CasaTables.walk(bytes).forall(_.length > 0)
    }

  property("StManAipsIO data file round-trips any column set") =
    Prop.forAll(Gen.chooseNum(1, 12),
      Gen.nonEmptyListOf(colGen).map(_.take(6))) { (nRows, cols0) =>
      import graft.sinks.CasaTables
      // unique names; values representable exactly at every width
      val cols = cols0.zipWithIndex.map { case (c, i) =>
        // string columns are scalar in the storage manager (one
        // variable-length String per row)
        c.copy(name = s"C$i",
          shape = if (c.tp == graft.sinks.CasaTables.TpString) Nil
            else c.shape)
      }
      val rnd = new scala.util.Random(nRows * 31 + cols.length)
      val num = cols.filter(_.tp != CasaTables.TpString).map { c =>
        val perRow = c.cellElems *
          (if (c.tp == CasaTables.TpComplex) 2 else 1)
        c.name -> Seq.fill(nRows)(Seq.fill(perRow)(
          if (c.tp == CasaTables.TpBool) rnd.nextInt(2).toDouble
          else rnd.nextInt(256).toDouble))
      }.toMap
      val strs = cols.filter(_.tp == CasaTables.TpString).map { c =>
        c.name -> Seq.fill(nRows)(rnd.alphanumeric.take(
          rnd.nextInt(12)).mkString)
      }.toMap
      val bytes = CasaTables.stManF0(nRows.toLong, cols, num, strs)
      val (numBack, strsBack) = CasaTables.readF0(bytes, nRows.toLong,
        cols)
      num.forall { case (k, v) => numBack(k).map(_.toSeq) == v } &&
        strs.forall { case (k, v) => strsBack(k).toSeq == v }
    }

  property("mwaf FITS X-column bit packing round-trips any bitvector " +
    "at any width (multi-word incl. legacy 128)") =
    Prop.forAll(Gen.chooseNum(1, 256),
      Gen.listOfN(8, Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      (fpc, raws) =>
      val wc = graft.sinks.Sinks.MwafWordChans
      val nWords = graft.sinks.Sinks.mwafWordCount(fpc)
      // mask each word to its in-range 32-bit payload (last word may
      // be partial)
      val words = (0 until nWords).map { w =>
        val chans = math.min(wc, fpc - w * wc)
        raws(w % raws.length) & ((1L << chans) - 1L)
      }
      val buf = new Array[Byte]((fpc + 7) / 8)
      graft.sinks.MwafWriter.packBits(words, fpc, buf)
      graft.sources.MwafReader.unpackBits(
        java.nio.ByteBuffer.wrap(buf), fpc).toSeq == words
    }

  property("casacore Bool bit packing round-trips (LSB-first)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf(true, false))) { bs =>
      val arr = bs.toArray
      graft.sinks.CasaTables.unpackBools(
        graft.sinks.CasaTables.packBools(arr), arr.length)
        .sameElements(arr)
    }

  property("mwaf baseline ids are the ascending dense grid") =
    Prop.forAll(Gen.chooseNum(1, 256)) { n =>
      val ids = graft.sources.MwafReader.baselineIds(n)
      ids.length == n * (n + 1) / 2 &&
        ids.sameElements(ids.sorted) &&
        ids.distinct.length == ids.length &&
        ids.head == 0L && ids.last == (n.toLong - 1) * n + (n - 1)
    }

  property("RFI strategy renders and re-parses to itself") =
    Prop.forAll(Gen.chooseNum(0.5, 20.0), Gen.chooseNum(0, 8),
      Gen.chooseNum(1.01, 3.0), Gen.someOf("xx", "xy", "yx", "yy"),
      Gen.chooseNum(0.1, 8.0), Gen.chooseNum(0.1, 8.0)) {
      (k, ml, rho, pols0, tw, cw) =>
        val pols = if (pols0.isEmpty) Seq("xx") else pols0.toSeq
        val s = graft.ops.RfiStrategy(k, ml, rho, pols, tw, cw)
        val text =
          s"""mad_k = $k
             |max_log2 = $ml
             |rho = $rho
             |pols = ${pols.mkString(",")}
             |time_weight = $tw
             |chan_weight = $cw""".stripMargin
        graft.ops.RfiStrategy.parse(text) == s
    }

  property("electrical length: EL_ literal vs physical x velocity factor") =
    Prop.forAll(Gen.chooseNum(-500.0, 500.0)) { x =>
      import graft.sources.MetafitsReader.{elecLen, CoaxVFactor}
      elecLen(s"EL_$x") == x && elecLen(x.toString) == x * CoaxVFactor
    }

  property("npb06 is a proper rotation at any epoch (±2 centuries)") =
    Prop.forAll(Gen.chooseNum(-2.0, 2.0)) { t =>
      val m = graft.functions.Iau2006.npb06(t)
      val orth = (for (i <- 0 until 3; j <- 0 until 3) yield {
        val dot = (0 until 3).map(k => m(i)(k) * m(j)(k)).sum
        math.abs(dot - (if (i == j) 1.0 else 0.0))
      }).max
      val det =
        m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
          m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
          m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
      orth < 1e-13 && math.abs(det - 1.0) < 1e-13
    }

  property("IAU-2006 vs classical apparent UVW stay within the " +
    "frame-bias envelope") =
    Prop.forAll(Gen.chooseNum(0.9e9, 1.4e9), Gen.chooseNum(-3.0, 3.0),
      Gen.chooseNum(-1.2, 1.2)) { (gps, ra, dec) =>
      import graft.functions.{Astro, Iau2006}
      val (u0, v0, w0) = Astro.partUvwApparentAt(gps, 2.0, -0.46, ra,
        dec, 0.0, 120.0, -80.0, 377.0)
      val (u6, v6, w6) = Iau2006.partUvwApparent06At(gps, 2.0, -0.46,
        ra, dec, 0.0, 120.0, -80.0, 377.0)
      val d = math.sqrt((u6 - u0) * (u6 - u0) +
        (v6 - v0) * (v6 - v0) + (w6 - w0) * (w6 - w0))
      // both proper rotations of the same ENH vector, differing by
      // bias (~23 mas) + model revisions on a ~400 m lever arm
      d < 2e-3
    }

  property("taiMinusUtc is monotone non-decreasing") =
    Prop.forAll(Gen.chooseNum(-5e8, 2e9), Gen.chooseNum(0.0, 1e8)) {
      (a, dt) =>
        import graft.functions.Astro.taiMinusUtc
        taiMinusUtc(a) <= taiMinusUtc(a + dt)
    }

  property("chunk window arithmetic covers the token stream exactly") =
    Prop.forAll(Gen.chooseNum(1, 400), Gen.chooseNum(1, 64),
      Gen.chooseNum(1, 64)) { (n, winRaw, strideRaw) =>
      val win = math.max(winRaw, strideRaw)
      val stride = math.min(winRaw, strideRaw)
      // mirror of Corpus.chunkWindows' arithmetic
      val nWins = if (n <= win) 1L
        else 1L + math.floor((n - win + stride - 1).toDouble /
          stride).toLong
      val starts = (0L until nWins).map(_ * stride + 1)
      val ends = starts.map(s => s + math.min(win, n - s + 1) - 1)
      // windows are in-range, non-empty, and the last one reaches n
      starts.forall(_ >= 1) && ends.forall(_ <= n) &&
        ends.zip(starts).forall { case (e, s) => e >= s } &&
        ends.last == n &&
        // consecutive windows leave no gap
        starts.zip(ends.dropRight(1)).drop(1)
          .forall { case (s, prevEnd) => s <= prevEnd + 1 }
    }

  property("SIR extension matches the O(n^2) interval brute force") =
    Prop.forAll(Gen.listOfN(40, Gen.oneOf(true, false)),
      Gen.chooseNum(0L, 999L)) { (fl, etaNum) =>
      import graft.functions.SirKernel
      val flags = fl.toArray
      val n = flags.length
      val w = flags.map(f => if (f) etaNum else etaNum - SirKernel.EtaDen)
      // flag i iff some interval [a, b) covering i has weight sum >= 0
      val brute = Array.tabulate(n) { i =>
        (0 to i).exists(a => (i + 1 to n).exists(b =>
          (a until b).map(w).sum >= 0))
      }
      SirKernel.extend(flags, etaNum).sameElements(brute)
    }

  property("SIR extension is a superset of the input and monotone " +
    "in eta") =
    Prop.forAll(Gen.listOfN(48, Gen.oneOf(true, false)),
      Gen.chooseNum(0L, 900L)) { (fl, etaNum) =>
      import graft.functions.SirKernel
      val flags = fl.toArray
      val out = SirKernel.extend(flags, etaNum)
      val outMore = SirKernel.extend(flags, etaNum + 99L)
      flags.indices.forall(i => !flags(i) || out(i)) &&
        flags.indices.forall(i => !out(i) || outMore(i))
    }

  property("sequence packing is micro-batch-split invariant") =
    Prop.forAll(
      Gen.listOf(Gen.chooseNum(1L, 40L)).suchThat(_.nonEmpty),
      Gen.chooseNum(1L, 17L), Gen.chooseNum(0, 1000)) {
      (toks, budget, cutSeed) =>
        import graft.streaming.PackStream
        import graft.streaming.PackStream.Doc
        val docs = toks.zipWithIndex.map { case (n, i) =>
          Doc("s", i.toLong, n)
        }
        val cut = cutSeed % (docs.length + 1)
        val one = org.apache.spark.sql.streaming.TestGroupState.create[
          graft.streaming.PackStream.PackState](
          org.apache.spark.api.java.Optional.empty(),
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
          0L, org.apache.spark.api.java.Optional.empty[Long],
          hasTimedOut = false)
        val whole = PackStream.updateSource(budget)("s",
          docs.iterator, one).toList
        val two = org.apache.spark.sql.streaming.TestGroupState.create[
          graft.streaming.PackStream.PackState](
          org.apache.spark.api.java.Optional.empty(),
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
          0L, org.apache.spark.api.java.Optional.empty[Long],
          hasTimedOut = false)
        val a = PackStream.updateSource(budget)("s",
          docs.take(cut).iterator, two).toList
        val b = PackStream.updateSource(budget)("s",
          docs.drop(cut).iterator, two).toList
        // split invariance, full sequences only, contiguous seq ids
        (a ++ b) == whole && two.getOption == one.getOption &&
          whole.forall(_.n_tokens == budget) &&
          whole.map(_.seq_id) == whole.indices.map(_.toLong).toList &&
          one.getOption.get.cum == toks.sum
    }

  property("sumthreshold flags are monotone in existing flags") =
    Prop.forAll(Gen.listOfN(64, Gen.chooseNum(0.5, 2.0))) { vals =>
      val amp = vals.toArray.grouped(8).toArray
      val none = Array.fill(8, 8)(false)
      val some = Array.tabulate(8, 8)((i, j) => i == j)
      val outNone = SumThresholdKernel.flagMatrix(amp, none, 1.0)
      val outSome = SumThresholdKernel.flagMatrix(amp, some, 1.0)
      // pre-flagged cells stay flagged
      (0 until 8).forall(i => outSome(i)(i))
      // note: detection flags are NOT generally monotone (masking
      // changes the background estimate), so only closure is asserted
    }

  property("encode partition derivation: monotone in rows, floored " +
    "at the parallelism, capped") =
    Prop.forAll(Gen.chooseNum(0L, 1L << 50), Gen.chooseNum(0L, 1L << 50),
      Gen.chooseNum(1, 512)) { (a, b, par) =>
      import graft.sinks.Sinks.deriveEncodePartitions
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val (pLo, pHi) = (deriveEncodePartitions(lo, par),
        deriveEncodePartitions(hi, par))
      pLo <= pHi &&                              // monotone in rows
        pLo >= math.min(par, 65536) &&           // floor
        pHi <= 65536 &&                          // cap
        deriveEncodePartitions(0L, par) == math.min(par, 65536)
    }

  property("line-RMS outlier pass: a constant grid flags nothing; " +
    "one strongly scaled line flags exactly itself") =
    // nL >= 6: a single outlier among m lines has z = sqrt(m-1), so
    // k = 2.0 is only exceedable from m = 6 lines up
    Prop.forAll(Gen.chooseNum(6, 16), Gen.chooseNum(4, 16),
      Gen.chooseNum(0.5, 2.0), Gen.chooseNum(0, 15)) {
      (nL, nC, base, hotIdx) =>
      val hot = hotIdx % nL
      val flat = graft.ops.RfiFlag.rmsThresholdLines(nL, nC,
        (_, _) => base, (_, _) => true, 2.0, flagLow = false, 3)
      val oneHot = graft.ops.RfiFlag.rmsThresholdLines(nL, nC,
        (i, _) => if (i == hot) base * 50 else base,
        (_, _) => true, 2.0, flagLow = false, 3)
      flat.forall(!_) &&
        oneHot(hot) && oneHot.count(identity) == 1
    }
}
