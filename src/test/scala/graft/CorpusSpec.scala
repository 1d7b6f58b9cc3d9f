package graft

import graft.llm.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-preparation operators: window arithmetic, contamination
  * semantics, sampler determinism. The DuckDB parity of each operator
  * is driven by the q_t10/q_t11/q_t12 oracle gates.
  */
class CorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsOf(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "lang", "text")
  }

  test("chunkWindows: overlapping cover with a short final window") {
    // 100 tokens, win 64, stride 48 -> windows at 1 (len 64) and 49
    // (len 52): together they cover tokens 1..100 with 16 overlapping
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = Corpus.chunkWindows(docsOf((7L, "en", text)), 64, 48)
      .orderBy("win_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("tok_start") == 1L &&
      out(0).getAs[Long]("win_len") == 64L)
    assert(out(1).getAs[Long]("tok_start") == 49L &&
      out(1).getAs[Long]("win_len") == 52L)
    assert(out(1).getAs[Long]("tok_start") +
      out(1).getAs[Long]("win_len") - 1 == 100L)
  }

  test("chunkWindows: short document is one full-coverage window") {
    val out = Corpus.chunkWindows(docsOf((1L, "en", "a b c")), 64, 48)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("win_len") == 3L)
  }

  test("chunkWindows: identical windows hash identically, " +
    "different windows differently") {
    val text = (1 to 80).map(i => s"w$i").mkString(" ")
    val a = Corpus.chunkWindows(docsOf((1L, "en", text)), 32, 32)
      .select("win_idx", "win_hash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Corpus.chunkWindows(docsOf((2L, "en", text)), 32, 32)
      .select("win_idx", "win_hash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "same text, same windows, same hashes")
    assert(a.values.toSet.size > 1, "distinct windows hash apart")
  }

  test("contamination: a copy of a probe doc is flagged, fresh text " +
    "is not, probe docs are excluded") {
    val probeText = (1 to 30).map(i => s"p$i").mkString(" ")
    val fresh = (1 to 30).map(i => s"f$i").mkString(" ")
    val out = Corpus.contamination(docsOf(
      (0L, "en", probeText),   // probe (0 % 97 == 0)
      (5L, "en", probeText),   // verbatim copy -> contaminated
      (6L, "en", fresh)))      // disjoint -> clean
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("contaminated")).toMap
    assert(out == Map(5L -> true, 6L -> false))
  }

  test("probeHashes: the bounded-benchmark cap fails LOUDLY when the " +
    "probe set exceeds it, and under the cap is exact") {
    val probeText = (1 to 40).map(i => s"p$i").mkString(" ")
    val docs = docsOf((0L, "en", probeText), (5L, "en", "other words"))
    // the fixture's probe doc yields > 2 distinct shingle hashes: a
    // cap of 2 must throw, not truncate
    val e = intercept[IllegalArgumentException](
      Corpus.probeHashes(docs, maxProbe = 2))
    assert(e.getMessage.contains("bounded-benchmark"))
    // a sufficient cap returns the same set as the default
    val capped = Corpus.probeHashes(docs, maxProbe = 10000)
    assert(capped.sameElements(Corpus.probeHashes(docs)))
    assert(capped.length > 2)
  }

  test("stratifiedSample: deterministic, honours cutoffs, " +
    "oversized targets keep everything") {
    val rows = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "en" else "de", s"doc $i text"))
    val targets = Seq("en" -> 30L, "de" -> 1000L)
    val docs = docsOf(rows: _*)
    val s1 = Corpus.stratifiedSample(docs, targets).collect()
    val s2 = Corpus.stratifiedSample(docs, targets).collect()
    assert(s1.map(_.getLong(0)).sorted.sameElements(
      s2.map(_.getLong(0)).sorted), "deterministic")
    val byLang = s1.groupBy(_.getString(1))
    // de cutoff saturates at 1e6 -> all 100 kept
    assert(byLang("de").length == 100)
    // en is an expected-fraction sample around 30 of 100
    val en = byLang("en").length
    assert(en > 5 && en < 60, s"en kept $en of 100 for target 30")
    assert(s1.forall(r => r.getAs[Long]("u") < r.getAs[Long]("cutoff")))
  }

  private def srcDocsOf(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "source", "text")
  }

  test("bpePairStats: counts adjacent character pairs with " +
    "deterministic rank and top-k cut") {
    // "abab" yields pairs ab, ba, ab; twice over -> ab=4, ba=2
    val out = Corpus.bpePairStats(
      docsOf((1L, "en", "abab abab"))).collect()
    val m = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(m == Map("ab" -> (4L, 1L), "ba" -> (2L, 2L)))
    val top1 = Corpus.bpePairStats(
      docsOf((1L, "en", "abab abab")), topK = 1).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "ab")
  }

  test("bpePairStats: single-char tokens contribute nothing; " +
    "ties rank by pair text") {
    assert(Corpus.bpePairStats(docsOf((1L, "en", "a b c"))).isEmpty)
    // zz and aa both count 1 -> aa ranks first
    val out = Corpus.bpePairStats(docsOf((1L, "en", "zz aa")))
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("aa", "zz"))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L))
  }

  test("repeatedSpans: detects within-doc and cross-doc repeated " +
    "8-grams; short docs report zeros") {
    val eight = (1 to 8).map(i => s"t$i").mkString(" ")
    val docA = s"$eight filler $eight" // 17 tokens, grams 1 and 10 equal
    val docB = eight                   // its single gram matches docA's
    val docC = (1 to 12).map(i => s"u$i").mkString(" ") // all unique
    val docD = "too short"             // < 8 tokens
    val out = Corpus.repeatedSpans(srcDocsOf(
      (1L, "s", docA), (2L, "s", docB), (3L, "s", docC),
      (4L, "s", docD))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out(1L) == ((10L, 2L, true)), s"docA got ${out(1L)}")
    assert(out(2L) == ((1L, 1L, true)))
    assert(out(3L) == ((5L, 0L, false)))
    assert(out(4L) == ((0L, 0L, false)))
  }

  test("spanDedupClean: keep-first removal of repeated 8-grams, " +
    "overlap union, short docs untouched") {
    val eight = (1 to 8).map(i => s"t$i").mkString(" ")
    // docA holds the canonical (first) occurrence; its later in-doc
    // repeat AND docB's copy are excised
    val docA = s"$eight mid $eight"           // 17 tokens
    val docB = s"pre $eight post"             // 10 tokens, copy at p=2
    val docC = "too short"
    val out = Corpus.spanDedupClean(srcDocsOf(
      (1L, "s", docA), (2L, "s", docB), (3L, "s", docC))).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    // docA: gram at p=1 is canonical; p=10 removed (tokens 10..17);
    // grams p=2..9 involve 'mid' and are unique
    assert(out(1L) == (((1 to 8).map(i => s"t$i").mkString(" ") +
      " mid", 8L)), s"docA got ${out(1L)}")
    // docB: its copy (p=2, tokens 2..9) removed, pre/post kept
    assert(out(2L) == (("pre post", 8L)))
    assert(out(3L) == (("too short", 0L)))
  }

  test("spanDedupClean: a 50k-token doc that is ~50% removable spans " +
    "completes in bounded time (linear token filter, no per-token " +
    "scan of the removal list)") {
    // 3125 blocks of 16 tokens: a fixed 8-gram (repeats corpus-wide)
    // followed by 8 block-unique tokens. Every a-gram occurrence after
    // the first is excised -> n_removed = 8 * 3124 = 24992 of 50000.
    val blocks = 3125
    val eight = (1 to 8).map(i => s"a$i").mkString(" ")
    val text = (1 to blocks).map(b =>
      eight + " " + (1 to 8).map(j => s"u${b}_$j").mkString(" "))
      .mkString(" ")
    val t0 = System.nanoTime()
    val out = Corpus.spanDedupClean(srcDocsOf((1L, "s", text)))
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.length == 1)
    assert(out(0).getLong(2) == 8L * (blocks - 1),
      s"n_removed ${out(0).getLong(2)}")
    val cleanedToks = out(0).getString(1).split(" ")
    assert(cleanedToks.length == 16 * blocks - 8 * (blocks - 1))
    assert(cleanedToks.take(8).mkString(" ") == eight,
      "canonical first occurrence kept")
    assert(secs < 60.0, s"bounded-time regression: took $secs s")
  }

  test("spanDedupClean invariant on testdata: token counts add up") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    import spark.implicits._
    val bad = Corpus.spanDedupClean(docs).join(docs, "doc_id")
      .selectExpr("doc_id",
        "size(split(text, ' ')) AS n0",
        "CASE WHEN cleaned = '' THEN CAST(0 AS INT) " +
          "ELSE size(split(cleaned, ' ')) END AS n1",
        "n_removed")
      .where(col("n0") =!= col("n1") + col("n_removed"))
    assert(bad.isEmpty, bad.head(3).mkString("; "))
  }

  test("sourceOverlap: counts shared prefix fingerprints per " +
    "source pair; same-source dups are invisible") {
    val p1 = (1 to 25).map(i => s"p$i").mkString(" ")
    val p2 = (1 to 25).map(i => s"q$i").mkString(" ")
    val out = Corpus.sourceOverlap(srcDocsOf(
      (1L, "sA", p1), (2L, "sB", p1), (3L, "sC", p1), // p1 in A,B,C
      (4L, "sA", p2), (5L, "sB", p2 + " tail"),       // p2 in A,B
      (6L, "sD", "unique one"), (7L, "sD", "unique one"))) // same src
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("sA", "sB") -> 2L, ("sA", "sC") -> 1L, ("sB", "sC") -> 1L))
  }

  test("corpus invariants on real testdata: pair totals and gram " +
    "counts tie to token arithmetic") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    import spark.implicits._
    // total pair count over ALL pairs == sum over tokens of (len-1)
    val allPairs = Corpus.bpePairStats(docs, topK = Int.MaxValue)
      .agg(sum("cnt")).as[Long].head()
    val expectPairs = docs
      .selectExpr("aggregate(transform(split(text, ' '), " +
        "t -> CAST(greatest(0, length(t) - 1) AS BIGINT)), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x) AS n")
      .agg(sum("n")).as[Long].head()
    assert(allPairs == expectPairs,
      s"pair total $allPairs != token arithmetic $expectPairs")
    // per-doc n_grams == max(0, n_tokens - 7); dup counts bounded
    val spans = Corpus.repeatedSpans(docs)
    val mismatch = spans.join(docs, "doc_id")
      .selectExpr("doc_id", "n_grams", "n_dup_grams",
        "CAST(greatest(0, size(split(text, ' ')) - 7) AS BIGINT)" +
          " AS expect_grams")
      .where(col("n_grams") =!= col("expect_grams") ||
        col("n_dup_grams") > col("n_grams"))
    assert(mismatch.isEmpty, mismatch.head(3).mkString("; "))
  }

  test("sourceOverlap: documents shorter than the prefix " +
    "fingerprint on their full text") {
    val out = Corpus.sourceOverlap(srcDocsOf(
      (1L, "x", "short text"), (2L, "y", "short text"))).collect()
    assert(out.length == 1 &&
      out(0).getLong(2) == 1L)
  }

  test("bpeTrain: greedy merges cascade with exact weighted counts") {
    val docs = docsOf((1L, "en", "aaa aaa bb"), (2L, "en", "aaa bb bb"))
    // vocab: aaa ×3, bb ×3. Step 1: (a,a) weighs 2·3=6 vs (b,b) 3 →
    // merge "a a"; greedy left-to-right gives "aa a" (NOT "a aa").
    // Step 2: (aa,a) and (b,b) tie at 3 → lexicographic "aa a" wins.
    // Step 3: only (b,b) remains.
    val out = Corpus.bpeTrain(docs, merges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, "a a", "aa", 6L),
      (2L, "aa a", "aaa", 3L),
      (3L, "b b", "bb", 3L)))
  }

  test("bpeApply: learned vocab compresses docs to known subword counts") {
    val docs = docsOf((1L, "en", "aaa aaa bb"), (2L, "en", "aaa bb bb"))
    def counts(merges: Int) = Corpus.bpeApply(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 3 merges collapse both words to single tokens (see bpeTrain spec)
    assert(counts(3) == Map(1L -> ((3L, 3L)), 2L -> ((3L, 3L))))
    // after only the first merge: "aa a" and untouched "b b" char split
    assert(counts(1) == Map(1L -> ((3L, 6L)), 2L -> ((3L, 6L))))
  }

  test("bpeApplyTo: out-of-vocabulary words tokenize via the " +
    "row-local merge fold") {
    val train = docsOf((1L, "en", "aaa aaa bb"), (2L, "en", "aaa bb bb"))
    // "aab" and "bbb" never appear at train time; the learned merges
    // (a a), (aa a), (b b) must still apply to them row-locally:
    // aab -> [aa, b] (2 subwords), bbb -> [bb, b] (greedy
    // non-overlapping, 2), aaa is in-vocab -> 1.
    val corpus = docsOf((10L, "en", "aab bbb aaa"))
    val out = Corpus.bpeApplyTo(train, corpus, merges = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(10L -> ((3L, 5L))))
  }

  test("bpe: phantom empty tokens from consecutive spaces neither " +
    "poison pair counts nor crash apply") {
    // "aa  aa b" double-space -> tokens [aa, '', aa, b]; the empty
    // word's char repr must be '' (not the pre-fix ' '), so the only
    // pair in the vocabulary is (a a) and the argmax is untainted
    val docs = docsOf((1L, "en", "aa  aa b"))
    val tr = Corpus.bpeTrain(docs, merges = 1).collect()
    assert(tr.length == 1 && tr(0).getString(1) == "a a" &&
      tr(0).getLong(3) == 2L)
    // apply: 4 words (empty token counts), each 1 subword after the
    // merge ('' splits to the single empty symbol)
    val ap = Corpus.bpeApply(docs, merges = 1).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(ap.toSeq == Seq((4L, 4L)))
  }

  test("bpeTrain: merges across localCheckpoint boundaries extend " +
    "the shorter trajectory exactly") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    // 40 merges cross the every-16 lineage checkpoint twice; the
    // greedy trajectory is deterministic, so the first 6 rows must be
    // byte-identical to a merges=6 run (checkpointing is a pure
    // physical-plan change)
    val long = Corpus.bpeTrain(docs, merges = 40).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    val short = Corpus.bpeTrain(docs, merges = 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    assert(long.length == 40)
    assert(long.take(6).toSeq == short.toSeq)
  }

  test("subwordCountSql matches an independent in-memory greedy BPE " +
    "on random words and random cumulative merge tables") {
    import graft.llm.TextExprs.{Dialect, SparkD}
    implicit val d: Dialect = SparkD
    // reference greedy leftmost-first non-overlapping merge
    def refMerge(syms: List[String], a: String,
                 b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      val v = syms.toVector
      var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == a && v(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += v(i); i += 1 }
      }
      out.toList
    }
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abc"
    (1 to 5).foreach { _ =>
      var merges = Vector.empty[(String, String)]
      var symbols = alphabet.map(_.toString).toVector
      (1 to (1 + rnd.nextInt(5))).foreach { _ =>
        val a = symbols(rnd.nextInt(symbols.length))
        val b = symbols(rnd.nextInt(symbols.length))
        merges :+= ((a, b)); symbols :+= (a + b)
      }
      val ms = merges.map { case (a, b) => s"$a $b" }
      def refCount(w: String): Long = {
        var syms = w.map(_.toString).toList
        merges.foreach { case (a, b) => syms = refMerge(syms, a, b) }
        syms.length.toLong
      }
      val words = Seq.fill(40)(
        (1 to (1 + rnd.nextInt(12)))
          .map(_ => alphabet(rnd.nextInt(3))).mkString).distinct
      import spark.implicits._
      val got = words.toDF("w")
        .withColumn("n", expr(Corpus.subwordCountSql(ms, "w")))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      got.foreach { case (w, n) =>
        assert(n == refCount(w),
          s"word '$w' fold=$n ref=${refCount(w)} merges=$ms")
      }
    }
  }

  test("dsirScore: target-like raw documents outscore target-unlike " +
    "ones; selected tracks the sign; gram totals conserved") {
    // doc 0 (doc_id % 97 == 0) IS the target split; doc 1 repeats its
    // text verbatim, doc 2 shares nothing with it
    val docs = docsOf(
      (0L, "en", "alpha beta gamma delta alpha beta"),
      (1L, "en", "alpha beta gamma delta alpha beta"),
      (2L, "en", "zz yy xx ww vv uu"))
    val out = Corpus.dsirScore(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // the target itself is not scored (it is the model, not the pool)
    assert(!out.contains(0L) && out.size == 2)
    // both raw docs have 5 bigrams
    assert(out(1L)._1 == 5L && out(2L)._1 == 5L)
    // the verbatim copy of the target must outscore the disjoint doc,
    // and land on the target side of the ratio
    assert(out(1L)._2 > out(2L)._2)
    assert(out(1L)._3 == 1L)
    // selected is exactly the sign of the micro-unit log ratio
    out.values.foreach { case (_, lr, sel) =>
      assert(sel == (if (lr > 0) 1L else 0L))
    }
  }

  test("bigramNll and dsirScore: single-token documents are excluded, " +
    "not crashed on (Spark's sequence(1,0) is descending)") {
    val docs = docsOf(
      (0L, "en", "alpha beta alpha beta gamma"), // target split
      (1L, "en", "solo"),
      (2L, "en", "alpha beta gamma"))
    val nll = Corpus.bigramNll(docs).collect()
      .map(_.getLong(0)).toSet
    assert(nll == Set(0L, 2L)) // doc 1 carries no bigram
    val dsir = Corpus.dsirScore(docs).collect()
      .map(_.getLong(0)).toSet
    assert(dsir == Set(2L)) // doc 0 is the target, doc 1 gram-free
  }

  test("seqPack: conservation, full interior sequences, contiguity") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val budget = 128
    val out = Corpus.seqPack(docs, budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // token conservation: packed tokens == corpus tokens
    val totTok = docs
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .agg(sum("n")).head().getLong(0)
    assert(out.map(_._5).sum == totTok)
    // every document starts in exactly one sequence
    assert(out.map(_._4).sum == docs.count())
    val bySrc = out.groupBy(_._1)
    bySrc.foreach { case (src, seqs) =>
      val sorted = seqs.sortBy(_._2)
      // seq ids contiguous from 0
      assert(sorted.map(_._2).sameElements(sorted.indices.map(_.toLong)),
        s"$src seq ids not contiguous")
      // all but the final sequence hold exactly `budget` tokens; the
      // tail is never empty and never overfull
      sorted.init.foreach { s =>
        assert(s._5 == budget, s"$src seq ${s._2} has ${s._5} tokens")
      }
      assert(sorted.last._5 >= 1 && sorted.last._5 <= budget)
    }
  }
}
