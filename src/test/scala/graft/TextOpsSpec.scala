package graft

import graft.llm.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable fixtures for the corpus-hygiene operators
  * (repetition stats, scrubbing, mixture report, boilerplate census).
  */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsOf(rows: (Long, String, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang", "source")
  }

  test("repetition: top 2-gram, coverage fraction, dup-token fraction") {
    val docs = docsOf(
      (0L, "a b a b a b", "en", "s1"), // top gram "a b" x3, 6 tokens
      (1L, "x y z w", "en", "s1"),     // all grams unique, count 1
      (2L, "solo", "en", "s1"))        // < 2 tokens -> empty top gram
    val r = TextAnalysis.repetition(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[String]("top_gram") == "a b")
    assert(r(0L).getAs[Long]("top_cnt") == 3L)
    assert(r(0L).getAs[Double]("top_gram_frac") == 1.0)
    // "a b a b a b": 2 distinct of 6 tokens
    assert(math.abs(r(0L).getAs[Double]("dup_tok_frac") - 4.0 / 6) < 1e-6)
    // ties break to the lexicographically first gram
    assert(r(1L).getAs[String]("top_gram") == "x y")
    assert(r(1L).getAs[Long]("top_cnt") == 1L)
    assert(r(2L).getAs[String]("top_gram") == "")
    assert(r(2L).getAs[Long]("top_cnt") == 0L)
  }

  test("scrub: dictionary redaction changes the fingerprint, counts hit") {
    val docs = docsOf(
      (0L, "the customer holds value", "en", "s1"),
      (1L, "no terms here", "en", "s1"))
    val r = TextAnalysis.scrub(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_dict") == 3L)
    assert(r(1L).getAs[Long]("n_dict") == 0L)
    // doc 1 untouched: fingerprint equals the raw-text fingerprint
    import org.apache.spark.sql.functions.{md5, substring}
    import spark.implicits._
    val raw = docs.where($"doc_id" === 1L)
      .select(substring(md5($"text"), 1, 16)).head.getString(0)
    assert(r(1L).getAs[String]("scrub_hex") == raw)
    assert(r(0L).getAs[Long]("n_email") == 0L)
  }

  test("scrub: email and phone regex counts") {
    val docs = docsOf(
      (0L, "mail me at bob@example.com or call 555-123-4567 twice " +
        "555-123-4567", "en", "s1"))
    val r = TextAnalysis.scrub(docs).head()
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_phone") == 2L)
  }

  test("corpusMix: per-cell counts and duplicate fraction") {
    val docs = docsOf(
      (0L, "a b", "en", "s1"), (1L, "a b", "en", "s1"),
      (2L, "c d", "en", "s1"), (3L, "e f", "de", "s2"))
    val r = TextAnalysis.corpusMix(docs).collect()
      .map(x => (x.getAs[String]("lang"), x.getAs[String]("source")) -> x)
      .toMap
    val en = r(("en", "s1"))
    assert(en.getAs[Long]("n_docs") == 3L)
    assert(en.getAs[Long]("n_tokens") == 6L)
    assert(en.getAs[Long]("n_unique") == 2L)
    // 1 dup in 3 docs → 333333 ppm (integer-floor of 1e6/3)
    assert(en.getAs[Long]("dup_ppm") == 333333L)
    assert(r(("de", "s2")).getAs[Long]("dup_ppm") == 0L)
  }

  test("boilerplate: shingles crossing the distinct-doc threshold") {
    val banner = "accept all cookies now"
    val docs = docsOf((0L until 6L).map(i =>
      (i, s"$banner unique$i trailer", "en", "s1")) :+
      (6L, "entirely different text here", "en", "s1"): _*)
    val r = Dedup.boilerplate(docs, minDocs = 5).collect()
    // shingles fully inside the shared banner prefix appear in 6 docs
    val byShingle = r.map(x =>
      x.getAs[String]("shingle") -> x.getAs[Long]("n_docs")).toMap
    assert(byShingle("accept all cookies") == 6L)
    assert(byShingle("all cookies now") == 6L)
    // shingles touching the unique token never cross the threshold
    assert(!byShingle.keySet.exists(_.contains("unique")))
  }

  test("lengthProfile: exact type-1 quantiles at known ranks") {
    // src a: token counts 1..8 -> ranks ceil(n/4)=2, 4, 6
    // src b: token counts {10,20,30,40,50} -> ranks 2, 3, 4
    val docs = docsOf(
      (1L to 8L).map(i =>
        (i, Seq.fill(i.toInt)("w").mkString(" "), "en", "a")) ++
      Seq(10, 20, 30, 40, 50).zipWithIndex.map { case (n, i) =>
        (100L + i, Seq.fill(n)("w").mkString(" "), "en", "b")
      }: _*)
    val out = graft.llm.TextAnalysis.lengthProfile(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out("a") == ((8L, 36L, 1L, 2L, 4L, 6L, 8L)))
    assert(out("b") == ((5L, 150L, 10L, 20L, 30L, 40L, 50L)))
  }

  test("gopherFilter: each rule trips on its designed violation") {
    val good = ("the cat sat on the mat and the dog ran to the " +
      "park in the rain that day was long and the walk was slow " +
      "and the end came late").trim // 31 words, stops, varied
    val docs = docsOf(
      (1L, good, "en", "s"),
      // too short (< 20 words) but otherwise clean
      (2L, "the cat and the dog sat in that house", "en", "s"),
      // no stop words
      (3L, Seq.tabulate(25)(i => s"word$i").mkString(" "), "en", "s"),
      // heavy duplication: 25 tokens, 2 distinct
      (4L, ("the " * 24 + "and").trim, "en", "s"),
      // >20 % non-alphabetic tokens
      (5L, (Seq.fill(15)("123") ++ Seq.fill(5)("the") ++
        Seq.fill(5)("and")).mkString(" "), "en", "s"))
    val out = graft.llm.TextAnalysis.gopherFilter(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(out(1L) == ((1L, 1L, 1L, 1L, 1L, 1L)), s"good doc: ${out(1L)}")
    assert(out(2L)._1 == 0L && out(2L)._6 == 0L) // r_nwords fails
    assert(out(3L)._3 == 0L && out(3L)._6 == 0L) // r_stop fails
    assert(out(4L)._4 == 0L && out(4L)._6 == 0L) // r_dup fails
    assert(out(5L)._5 == 0L && out(5L)._6 == 0L) // r_alpha fails
  }

  test("bm25: hand-computed micro-unit scores; tf monotone; " +
    "only hit docs emitted") {
    // the no-hit doc still counts in the globals: N=3, S=3+2+2=7;
    // "spark": df=2 -> idf_u = floor(ln(1 + 3/5)*1e6 + 0.5) = 470004
    // d1 (dl=3, tf=2): 470004*(22*2*7) DIV (10*2*7+3*7+9*3*3) = 598186
    // d2 (dl=2, tf=1): 470004*(22*1*7) DIV (10*1*7+3*7+9*2*3) = 499176
    val docs = docsOf(
      (1L, "spark spark x", "en", "s"),
      (2L, "spark y", "en", "s"),
      (3L, "nothing here", "en", "s"))
    val r = TextAnalysis.bm25(docs, Seq("spark")).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.keySet == Set(1L, 2L), "only docs with a hit are emitted")
    assert(r(1L) == ((1L, 598186L)), s"d1: ${r(1L)}")
    assert(r(2L) == ((1L, 499176L)), s"d2: ${r(2L)}")
    assert(r(1L)._2 > r(2L)._2, "higher tf at comparable dl wins")
    // multi-term: contributions add per matched term
    val r2 = TextAnalysis.bm25(docsOf(
      (1L, "spark query", "en", "s"),
      (2L, "spark spark", "en", "s")), Seq("spark", "query"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2(1L) == 2L && r2(2L) == 1L)
  }

  test("mixTemperature: exact integer shares; alpha=1 is " +
    "proportional; alpha=1/2 up-weights the small source") {
    // A: 16 tokens -> isqrt 4; B: 4 tokens -> isqrt 2
    val docs = docsOf(
      (1L, Seq.fill(16)("w").mkString(" "), "en", "A"),
      (2L, Seq.fill(4)("w").mkString(" "), "en", "B"))
    val half = TextAnalysis.mixTemperature(docs, budgetTokens = 600L,
        halvings = 1).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("s_alpha"), r.getAs[Long]("weight_ppm"),
          r.getAs[Long]("alloc_tokens"), r.getAs[Long]("epochs_ppm")))
      .toMap
    assert(half("A") == ((4L, 666666L, 400L, 25000000L)))
    assert(half("B") == ((2L, 333333L, 200L, 50000000L)))
    val prop = TextAnalysis.mixTemperature(docs, budgetTokens = 600L,
        halvings = 0).collect()
      .map(r => r.getAs[String]("source") ->
        r.getAs[Long]("weight_ppm")).toMap
    assert(prop("A") == 800000L && prop("B") == 200000L)
    // temperature flattens: B's share rises from 20% to 33%
    assert(half("B")._2 > prop("B"))
  }

  test("mixTemperature: a degenerate all-empty corpus yields zero " +
    "shares, never NULL or a cross-engine divide seam") {
    // NULL text is the only zero-token shape the whitespace tokenizer
    // admits (split("") keeps one empty token); an all-NULL corpus
    // makes every group 0 tokens and s_total 0
    val docs = docsOf((1L, null, "en", "A"), (2L, null, "fr", "B"))
    val out = TextAnalysis.mixTemperature(docs, budgetTokens = 600L,
        halvings = 1).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("weight_ppm")) &&
        r.getAs[Long]("weight_ppm") == 0L &&
        r.getAs[Long]("alloc_tokens") == 0L &&
        r.getAs[Long]("epochs_ppm") == 0L, s"row: $r")
    }
  }

  test("bm25: a term containing a quote is escaped in the DuckDB " +
    "twin and matched identically by the Spark side") {
    val sql = TextAnalysis.bm25Sql(Seq("it's", "plain"))
    assert(sql.contains("'it''s'"), "single quote must be doubled")
    assert(!sql.contains("'it's'"), "raw quote would break the SQL")
    // Spark side: isin handles the quote natively; the quoted term
    // scores when it appears as a token
    val r = TextAnalysis.bm25(
      docsOf((1L, "it's here", "en", "s"), (2L, "plain text", "en", "s")),
      Seq("it's", "plain")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 1L && r(2L) == 1L, s"hits: $r")
  }
}
