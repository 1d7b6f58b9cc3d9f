package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import TextExprs._

/** Corpus-preparation operators a training-data pipeline runs after
  * cleaning/dedup: fixed-size context chunking, benchmark-contamination
  * screening, and stratified sampling to a target language mix. All
  * three are row-local or broadcast-shaped (no fact-table shuffle
  * except the one aggregation each declares), so they hold at 100 TB.
  *
  * Cross-engine arithmetic (token windows, md5-derived hashes) renders
  * through [[TextExprs]] so the DuckDB oracle twins evaluate the same
  * operations in the same order.
  */
object Corpus {

  private implicit val d: Dialect = SparkD

  /** Fixed-size token-window chunking (context packing precursor):
    * split each document's whitespace token stream into windows of
    * `win` tokens advancing by `stride` (stride ≤ win ⇒ overlapping
    * context windows, the standard LM pre-training shape). Emits one
    * row per window with its 1-based token offset, actual length
    * (the final window may be short), and a content hash of the joined
    * window text for downstream dedup/addressing.
    *
    * Row-local: the explode fan-out is bounded by ceil(n_tokens /
    * stride) per document — no shuffle at all.
    */
  def chunkWindows(docs: DataFrame, win: Int = 64,
                   stride: Int = 48): DataFrame = {
    require(win >= 1 && stride >= 1 && stride <= win,
      s"need 1 <= stride <= win, got win=$win stride=$stride")
    val base = docs.selectExpr("doc_id", s"${tokens("text")} AS toks")
      .selectExpr("doc_id", "toks",
        s"CAST(${listSize("toks")} AS BIGINT) AS n_toks")
      .selectExpr("doc_id", "toks", "n_toks",
        s"""CASE WHEN n_toks <= $win THEN CAST(1 AS BIGINT)
           |ELSE 1 + CAST(floor(CAST(n_toks - $win + $stride - 1
           |  AS DOUBLE) / $stride) AS BIGINT) END AS n_wins"""
          .stripMargin)
    base
      .select(col("doc_id"), col("toks"), col("n_toks"),
        explode(expr("sequence(CAST(0 AS BIGINT), n_wins - 1)"))
          .as("win_idx"))
      .selectExpr("doc_id", "win_idx", "toks", "n_toks",
        s"win_idx * $stride + 1 AS tok_start")
      .selectExpr("doc_id", "win_idx", "tok_start",
        s"least(CAST($win AS BIGINT), n_toks - tok_start + 1)" +
          " AS win_len", "toks")
      .selectExpr("doc_id", "win_idx", "tok_start", "win_len",
        hex8FromMd5(s"md5(${joinList(
          listSlice("toks", "tok_start", "win_len"))})") + " AS win_hash")
  }

  /** The DuckDB twin of [[chunkWindows]] (same window arithmetic and
    * hash, rendered in the other dialect).
    */
  def chunkWindowsSql(win: Int = 64, stride: Int = 48): String = {
    implicit val d: Dialect = DuckD
    s"""WITH base AS (
       |  SELECT doc_id, toks,
       |         CAST(${listSize("toks")} AS BIGINT) AS n_toks
       |  FROM (SELECT doc_id, ${tokens("text")} AS toks
       |        FROM documents)),
       |wins AS (
       |  SELECT doc_id, toks, n_toks,
       |    CASE WHEN n_toks <= $win THEN CAST(1 AS BIGINT)
       |    ELSE 1 + CAST(floor(CAST(n_toks - $win + $stride - 1
       |      AS DOUBLE) / $stride) AS BIGINT) END AS n_wins
       |  FROM base),
       |ex AS (
       |  SELECT doc_id, toks, n_toks,
       |         unnest(range(0, n_wins)) AS win_idx
       |  FROM wins),
       |pos AS (
       |  SELECT doc_id, win_idx, toks,
       |         win_idx * $stride + 1 AS tok_start,
       |         least(CAST($win AS BIGINT),
       |               n_toks - (win_idx * $stride + 1) + 1) AS win_len
       |  FROM ex)
       |SELECT doc_id, win_idx, tok_start, win_len,
       |  ${hex8FromMd5(s"md5(${joinList(
            listSlice("toks", "tok_start", "win_len"))})")} AS win_hash
       |FROM pos""".stripMargin
  }

  /** Concat-and-chunk sequence packing — the standard LM pre-training
    * batching shape: within each source shard, documents concatenate
    * in doc_id order into one token stream that is cut into fixed
    * `budget`-token training sequences; documents straddle sequence
    * boundaries. Emits one row per (source, seq_id) with how many
    * documents overlap it, how many START in it, and how many tokens
    * land in it (the stream's final sequence runs short).
    *
    * 100 TB shape: the running-total window partitions by `source` —
    * real pipelines pack per shard precisely so this prefix scan never
    * needs a global ordering — and every quantity is exact integer
    * arithmetic (token counts, cumulative offsets, floor-div sequence
    * ids), so the gate is order-free exact. The explode fan-out is
    * bounded by ceil(n_tok/budget)+1 rows per document, and the final
    * aggregate is a map-side-combined hash agg on (source, seq_id).
    */
  def seqPack(docs: DataFrame, budget: Int = 512): DataFrame = {
    require(budget >= 1, s"need budget >= 1, got $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .selectExpr("doc_id", "source",
        s"CAST(${listSize(tokens("text"))} AS BIGINT) AS n_tok")
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("start", col("cum") - col("n_tok"))
      // double division is exact here: all values < 2^53 and the true
      // quotient is never within an ulp of a wrong integer (offset
      // from one by at least 1/budget)
      .withColumn("seq_lo",
        expr(s"CAST(floor(start / ${budget}.0) AS BIGINT)"))
      .withColumn("seq_hi",
        expr(s"CAST(floor((cum - 1) / ${budget}.0) AS BIGINT)"))
      .select(col("source"), col("start"), col("cum"),
        col("seq_lo"), explode(expr("sequence(seq_lo, seq_hi)"))
          .as("seq_id"))
      .select(col("source"), col("seq_id"),
        when(col("seq_id") === col("seq_lo"), 1L).otherwise(0L)
          .as("starts"),
        (least(col("cum"), (col("seq_id") + 1) * budget)
          - greatest(col("start"), col("seq_id") * budget))
          .as("tok_in_seq"))
      .groupBy("source", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("starts").as("n_starts"),
        sum("tok_in_seq").as("n_tokens"))
  }

  /** The DuckDB twin of [[seqPack]] (same window frame, offsets and
    * floor-div arithmetic in the other dialect).
    */
  def seqPackSql(budget: Int = 512): String =
    "WITH " + seqPackCtes(budget) + "\n" + seqPackSelect(budget)

  /** The packing CTE chain with a parameterisable source relation —
    * so composed oracles ([[graft.oracle.LlmOracles.curationPipeline]])
    * can pack a filtered survivor set with the SAME arithmetic the
    * standalone q_t15 gate pins.
    */
  def seqPackCtes(budget: Int = 512,
                  from: String = "documents"): String = {
    implicit val d: Dialect = DuckD
    s"""base AS (
       |  SELECT doc_id, source,
       |         CAST(${listSize(tokens("text"))} AS BIGINT) AS n_tok
       |  FROM $from),
       |cums AS (
       |  SELECT source, n_tok,
       |         CAST(SUM(n_tok) OVER (PARTITION BY source
       |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
       |           AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM base),
       |spans AS (
       |  SELECT source, cum, cum - n_tok AS start,
       |         CAST(floor((cum - n_tok) / ${budget}.0e0) AS BIGINT)
       |           AS seq_lo,
       |         CAST(floor((cum - 1) / ${budget}.0e0) AS BIGINT)
       |           AS seq_hi
       |  FROM cums),
       |ex AS (
       |  SELECT source, start, cum, seq_lo,
       |         unnest(range(seq_lo, seq_hi + 1)) AS seq_id
       |  FROM spans)""".stripMargin
  }

  /** The final packing SELECT over the [[seqPackCtes]] chain. */
  def seqPackSelect(budget: Int = 512): String =
    s"""SELECT source, seq_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(CASE WHEN seq_id = seq_lo THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_starts,
       |       CAST(SUM(least(cum, (seq_id + 1) * $budget)
       |            - greatest(start, seq_id * $budget)) AS BIGINT)
       |         AS n_tokens
       |FROM ex GROUP BY source, seq_id""".stripMargin

  /** Benchmark-contamination screen: the probe set (here every doc_id
    * divisible by 97 — standing in for a held-out eval suite) is
    * reduced to its distinct word-3-shingle hashes; every non-probe
    * document reports how many of its own distinct shingles appear in
    * the probe set, and is flagged contaminated at ≥ 20 % overlap.
    *
    * 100 TB shape: the probe side is benchmark-sized — broadcast —
    * so the screen is a map-side semi-join plus one per-doc count
    * aggregation; the corpus is never shuffled by content.
    */
  /** Per-document DISTINCT shingle-hash arrays, computed row-locally
    * (array_distinct — the corpus is never shuffled by content).
    */
  private def distinctShingleHashes(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", s"${tokens("text")} AS toks", "text")
      .selectExpr("doc_id",
        s"array_distinct(${hashList(shingles("text", "toks"))}) AS hs")

  /** The probe (benchmark) side of the screen: distinct shingle hashes
    * of every doc_id divisible by 97, collected once — benchmark-sized
    * driver state, the same budget as ANN centroids/codebooks.
    */
  /** `explode` of an expensive generator without
    * `InferFiltersFromGenerate`'s duplicated-generator penalty: that
    * rule infers `size(e) > 0 AND isnotnull(e)` from `explode(e)` and
    * later rules inline the generator's WHOLE defining expression
    * (lambda hash pipelines included, with `split(text)` re-expanded
    * per element) into the pushed-down filter — measured 3.5 s vs
    * 0.1 s on the contamination probe at sf0.1. The rule skips OUTER
    * generates, and a post-generate null filter restores exact
    * `explode` semantics (drops the null row an outer explode emits
    * for an empty/null array).
    */
  private[graft] def explodeNoInfer(df: DataFrame, gen: Column,
                                    name: String, keep: Column*)
      : DataFrame =
    df.select(keep :+ explode_outer(gen).as(name): _*)
      .where(col(name).isNotNull)

  /** BOUNDED-BENCHMARK CONTRACT: the probe set is driver/broadcast
    * model state (like ANN centroids or a BPE merge table), so it must
    * be BENCHMARK-sized — a fixed eval suite's shingles, never a split
    * of the corpus itself (a corpus-proportional probe grows without
    * bound and re-introduces the driver-collect scale failure this
    * family is designed around). `maxProbe` enforces the contract
    * LOUDLY: the collect is pre-limited to `maxProbe + 1` rows and the
    * call fails rather than silently truncating or ballooning. The
    * default (4M hashes ≈ 32 MB broadcast) is far above any real
    * benchmark suite; pass a tighter bound if your suite is smaller.
    */
  def probeHashes(docs: DataFrame, maxProbe: Int = 4000000)
      : Array[Long] = {
    require(maxProbe > 0, s"maxProbe must be > 0, got $maxProbe")
    val arr = explodeNoInfer(
      distinctShingleHashes(docs).where(col("doc_id") % 97 === 0),
      col("hs"), "h").distinct()
      .limit(maxProbe + 1)
      .collect().map(_.getLong(0)).sorted
    require(arr.length <= maxProbe,
      s"probeHashes: probe set exceeds the bounded-benchmark cap " +
        s"($maxProbe) — the contamination probe must be a fixed " +
        "benchmark suite's shingles, not a corpus split (see the " +
        "bounded-benchmark contract in the scaladoc)")
    arr
  }

  /** The row-local screen against a precomputed probe set — one scan,
    * zero shuffles; works identically on a batch or streaming frame
    * (see [[graft.streaming.CorpusStream]]).
    *
    * The probe set ships as a BROADCAST VARIABLE, not a plan literal:
    * a `typedLit(probe)` would bloat the analyzed plan and
    * re-serialise the whole array inside every task binary (and every
    * streaming micro-batch's plan), where a broadcast ships once per
    * executor. Membership is a binary search over the sorted primitive
    * array — no boxing, O(log n) per shingle. A UDF is the right tool
    * here (not an anti-pattern): no built-in expression can consume
    * broadcast state, and the alternative — the literal — is the
    * scale problem. The streaming twin keeps this row-local shape
    * because a groupBy(doc_id) join formulation would force an
    * output-mode change; the batch gate uses the broadcast-join
    * [[contamination]] below.
    */
  def contaminationWith(docs: DataFrame,
                        probe: Array[Long]): DataFrame = {
    val sorted = {
      val a = probe.clone(); java.util.Arrays.sort(a); a
    }
    val bc = docs.sparkSession.sparkContext.broadcast(sorted)
    val hits = udf { (hs: Seq[Long]) =>
      val p = bc.value
      var n = 0L
      hs.foreach { h =>
        if (java.util.Arrays.binarySearch(p, h) >= 0) n += 1
      }
      n
    }
    distinctShingleHashes(docs).where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        size(col("hs")).cast("long").as("n_shingles"),
        hits(col("hs")).as("n_probe_hits"))
      .withColumn("contaminated",
        col("n_probe_hits") * 5 >= col("n_shingles"))
  }

  /** Batch contamination screen — same rows as [[contaminationWith]],
    * different physical shape: exploded per-doc shingle hashes LEFT
    * broadcast-joined to the probe set, then ONE per-doc count
    * aggregate (map-side combined, carrying two longs per document).
    * The row-local `array_intersect` form pays an O(|probe|) hash-set
    * build PER ROW against the literal probe array (measured 5.4 s at
    * sf0.1 vs 0.8 s for this join); the broadcast join builds the
    * probe-side hash relation once per executor. The streaming twin
    * keeps the row-local form, since a streaming groupBy(doc_id)
    * would demand an output-mode change.
    */
  def contamination(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val probeDf = probeHashes(docs).toSeq.toDF("ph")
    distinctShingleHashes(docs).where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        size(col("hs")).cast("long").as("n_sh"),
        explode_outer(col("hs")).as("h"))
      .join(broadcast(probeDf), col("h") === col("ph"), "left")
      .groupBy("doc_id")
      .agg(max("n_sh").as("n_shingles"),
        sum(when(col("ph").isNotNull, 1L).otherwise(0L))
          .as("n_probe_hits"))
      .withColumn("contaminated",
        col("n_probe_hits") * 5 >= col("n_shingles"))
      .select("doc_id", "n_shingles", "n_probe_hits", "contaminated")
  }

  /** DuckDB twin of [[contamination]]. */
  def contaminationSql: String = {
    implicit val d: Dialect = DuckD
    s"""WITH dh AS (
       |  SELECT doc_id, list_distinct(hs) AS hs
       |  FROM (SELECT doc_id,
       |          ${hashList(shingles("text", "toks"))} AS hs
       |        FROM (SELECT doc_id, text, ${tokens("text")} AS toks
       |              FROM documents))),
       |sh AS (SELECT doc_id, unnest(hs) AS h FROM dh),
       |probe AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0),
       |counts AS (SELECT doc_id, CAST(${listSize("hs")} AS BIGINT)
       |             AS n_shingles
       |           FROM dh WHERE doc_id % 97 <> 0),
       |hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_probe_hits
       |         FROM sh WHERE doc_id % 97 <> 0
       |           AND h IN (SELECT h FROM probe)
       |         GROUP BY doc_id)
       |SELECT c.doc_id, c.n_shingles,
       |       coalesce(h.n_probe_hits, CAST(0 AS BIGINT))
       |         AS n_probe_hits,
       |       coalesce(h.n_probe_hits, CAST(0 AS BIGINT)) * 5
       |         >= c.n_shingles AS contaminated
       |FROM counts c LEFT JOIN hits h ON c.doc_id = h.doc_id"""
      .stripMargin
  }

  /** Per-language target document counts for the stratified sampler
    * gate (a typical "rebalance the mix" request).
    */
  val SampleTargets: Seq[(String, Long)] = Seq(
    "en" -> 100L, "de" -> 50L, "es" -> 50L, "fr" -> 50L, "zh" -> 50L)

  /** Stratified corpus sampling to a target per-language mix, as a
    * DETERMINISTIC expected-fraction sampler: each document draws
    * u = H(salt ‖ doc_id) mod 1e6 and is kept iff u < cutoff(lang),
    * cutoff = min(1e6, floor(target·1e6 / group_size)). Deterministic ⇒
    * re-runs and the oracle agree exactly; expected-fraction ⇒ achieved
    * counts are binomial around the target (documented, not hidden).
    *
    * 100 TB shape: one language-sized count aggregate, a broadcast
    * cutoff dim, then a row-local hash filter — the corpus itself is
    * never shuffled.
    */
  def stratifiedSample(docs: DataFrame,
                       targets: Seq[(String, Long)] = SampleTargets)
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tgt = targets.toDF("lang", "target_n")
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("group_n"))
    val cutoffs = sizes.join(tgt, Seq("lang"))
      .select(col("lang"),
        least(lit(1000000L), floor(col("target_n") * 1000000L /
          col("group_n")).cast("long")).as("cutoff"))
    docs.join(broadcast(cutoffs), Seq("lang"))
      .selectExpr("doc_id", "lang", "cutoff",
        s"${hex8ToLong(s"concat('strat', ${toStr("doc_id")})")}" +
          " % 1000000 AS u")
      .where(col("u") < col("cutoff"))
      .select("doc_id", "lang", "u", "cutoff")
  }

  /** BPE-style adjacent character-pair statistics — the distributed
    * primitive of tokenizer training (one merge iteration of byte-pair
    * encoding counts every adjacent symbol pair across the corpus and
    * merges the most frequent). Emits the `topK` most frequent
    * character pairs with counts and a dense 1-based rank, totally
    * ordered by (count desc, pair asc) so the cut is deterministic.
    *
    * 100 TB shape: the pair explode is row-local; the count is ONE
    * hash aggregate with map-side combine whose output is
    * alphabet²-sized (≤ a few million pairs for any real corpus), and
    * the top-k collapses to a TakeOrderedAndProject — no full sort of
    * the aggregate. The final rank window runs over `topK` rows.
    */
  def bpePairStats(docs: DataFrame, topK: Int = 50): DataFrame = {
    val pairs = explodeNoInfer(
      explodeNoInfer(docs, expr(tokens("text")), "tok")
        .where(length(col("tok")) >= 2),
      expr(s"transform(${idxSeq1("length(tok) - 1")}," +
        " i -> substring(tok, i, 2))"), "pair")
    // rank over the already-limited topK rows (graft.ops.Bounded:
    // explicit single-partition total order, no degenerate window)
    graft.ops.Bounded.rank(
      pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc).limit(topK),
      "rk", col("cnt").desc, col("pair").asc)
  }

  /** DuckDB twin of [[bpePairStats]]. */
  def bpePairStatsSql(topK: Int = 50): String = {
    implicit val d: Dialect = DuckD
    s"""WITH tok AS (
       |  SELECT unnest(${tokens("text")}) AS tok FROM documents),
       |pairs AS (
       |  SELECT unnest(list_transform(${idxSeq1("length(tok) - 1")},
       |           i -> substring(tok, i, 2))) AS pair
       |  FROM tok WHERE length(tok) >= 2),
       |counts AS (
       |  SELECT pair, CAST(count(*) AS BIGINT) AS cnt
       |  FROM pairs GROUP BY pair)
       |SELECT pair, cnt,
       |  CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC)
       |       AS BIGINT) AS rk
       |FROM counts ORDER BY cnt DESC, pair ASC LIMIT $topK"""
      .stripMargin
  }

  /** Character-split word representation: symbols joined by single
    * spaces (words never contain spaces, so ' ' is a safe symbol
    * separator throughout the BPE machinery). The empty word (a
    * phantom token from consecutive/leading/trailing spaces) is
    * guarded explicitly: Spark's `sequence(1, 0)` is the DESCENDING
    * [1, 0] while DuckDB's `range(1, 1)` is empty, so without the CASE
    * the two engines would disagree on the empty word's repr (' ' vs
    * '') and every downstream pair count would silently diverge.
    */
  private def charsJoinedSql(w: String)(implicit d: Dialect): String =
    s"CASE WHEN length($w) < 1 THEN '' ELSE " +
      joinList(listTransformIdx(idxSeq1(s"length($w)"),
        (x, _) => s"substring($w, $x, 1)")) + " END"

  /** One greedy left-to-right BPE merge of the pair (A, B) applied to
    * a space-joined symbol string, as a sequential string fold: append
    * `x` WITHOUT a separator when it is B and the accumulator ends
    * with the complete symbol A — which is exactly the non-overlapping
    * leftmost-first merge the BPE algorithm specifies. `a`/`b` are SQL
    * string expressions (driver literals on the Spark side, columns of
    * the top-pair CTE in the oracle).
    */
  private def mergeFoldSql(syms: String, a: String, b: String)
                          (implicit d: Dialect): String = {
    val body = (acc: String, x: String) =>
      s"CASE WHEN $acc = '' THEN $x " +
        s"WHEN $x = $b AND ($acc = $a OR " +
        s"right($acc, length($a) + 1) = (' ' || $a)) THEN $acc || $x " +
        s"ELSE $acc || ' ' || $x END"
    d match {
      case SparkD =>
        s"aggregate($syms, CAST('' AS STRING)," +
          s" (acc, x) -> ${body("acc", "x")})"
      case DuckD =>
        s"list_reduce(list_prepend(CAST('' AS VARCHAR), $syms)," +
          s" (acc, x) -> ${body("acc", "x")})"
    }
  }

  /** Distributed BPE TRAINING (the full tokenizer-learning loop, not
    * just one round of pair stats): the corpus collapses once into a
    * word→count vocabulary (the classic map-side-combined aggregate —
    * zipf-bounded, orders of magnitude smaller than the corpus, which
    * is precisely why real BPE trainers count words first); every
    * merge step then runs on the vocabulary alone: weighted
    * adjacent-pair counts, the (max count, lexicographic) argmax pair
    * as driver-side model state, and a greedy left-to-right merge fold
    * rewriting each word's symbol string. Returns the learned merge
    * table — each row's choice depends on every previous merge, so the
    * oracle hash pins the entire training trajectory.
    *
    * 100 TB shape: ONE corpus-sized aggregate total; each of the
    * `merges` iterations costs a scan of the cached vocabulary plus a
    * pair-count hash agg (alphabet²-bounded) — the same budget class
    * as the IVF/k-means trainers.
    */
  /** Shared trainer core: the cached word-count vocabulary, the merge
    * loop, and the final (w, repr) frame with every merge applied.
    * The caller unpersists the returned cache handle when done.
    */
  /** A learned merge symbol as a Spark SQL string literal. Escapes
    * BOTH quotes and backslashes: Spark's parser interprets backslash
    * escape sequences inside string literals by default, so a symbol
    * containing '\' would otherwise mis-parse (or parse to a different
    * string) and diverge from the DuckDB oracle, which receives the
    * symbol through split_part without re-parsing.
    */
  private def lit1(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  /** Truncate the merge loop's lineage every this many steps: each
    * merge adds one mergeFoldSql layer to the vocabulary frame's plan,
    * and without truncation plan depth — and Catalyst analysis time —
    * grows superlinearly with the merge count (invisible at the gated
    * merges=6, fatal at a real tokenizer's 30k–50k). localCheckpoint
    * materialises the current (w, cnt, repr) state as executor blocks,
    * so plan depth is O(16) regardless of merges.
    */
  private val BpeCheckpointEvery = 16

  private def bpeCore(docs: DataFrame, merges: Int)
      : (Seq[(Long, String, String, Long)], DataFrame, DataFrame) = {
    implicit val d: Dialect = SparkD
    val vocab = explodeNoInfer(
      docs.select(expr(tokens("text")).as("toks")), col("toks"), "w")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("repr", expr(charsJoinedSql("w")))
      .cache()
    var df = vocab
    val out = Seq.newBuilder[(Long, String, String, Long)]
    for (step <- 1 to merges) {
      val top = df
        .select(col("cnt"), expr(tokens("repr")).as("syms"))
        .select(col("cnt"), explode(expr(grams2("syms"))).as("g"))
        .groupBy("g").agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("g").asc)
        .limit(1).collect()
      require(top.nonEmpty, s"bpeTrain: no pairs left at step $step")
      val (g, n) = (top(0).getString(0), top(0).getLong(1))
      out += ((step.toLong, g, g.replace(" ", ""), n))
      val Array(a, b) = g.split(" ", 2)
      df = df.withColumn("repr",
        expr(mergeFoldSql(tokens("repr"), lit1(a), lit1(b))))
      if (step % BpeCheckpointEvery == 0 && step < merges)
        df = df.localCheckpoint()
    }
    (out.result(), df.select("w", "repr"), vocab)
  }

  def bpeTrain(docs: DataFrame, merges: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    val (ms, _, cached) = bpeCore(docs, merges)
    cached.unpersist(false)
    import spark.implicits._
    ms.toDF("step", "pair", "merged", "cnt")
  }

  /** BPE tokenizer APPLICATION with the merges learned by [[bpeTrain]]
    * on `train`: the trained vocabulary becomes a DISTRIBUTED
    * w → subword-count lookup the corpus joins against, and every
    * document reduces to its word and subword totals with one join +
    * one map-side-combined doc aggregate.
    *
    * 100 TB shape: the word vocabulary grows with the CORPUS (a web
    * corpus has 10⁸–10⁹ distinct whitespace tokens — URLs, typos,
    * numerals), so unlike the k-bounded IVF centroids/PQ codebooks it
    * must never land on the driver. `localCheckpoint` materialises the
    * (w, n_sub) lookup as executor blocks — severing the lineage back
    * through the (about-to-be-unpersisted) training cache without a
    * driver round-trip — and the join is left unhinted so AQE picks
    * broadcast vs shuffle from the lookup's actual size.
    *
    * Out-of-vocabulary words (present in `corpus` but not in `train`)
    * fall back to the row-local merge fold: the learned merge table —
    * genuinely bounded model state, `merges` rows — is unrolled over
    * the word's char split, computing exactly the repr the trainer
    * would have produced. The fallback sits behind `coalesce`, so
    * codegen short-circuits it for every in-vocabulary token.
    */
  /** Row-local subword-count expression for one token (SQL expression
    * `tok`): the learned merge table — bounded model state, `merges`
    * rows — unrolled as a greedy fold over the token's char split,
    * computing exactly the repr the trainer would have produced had
    * the token been in the training vocabulary. Shared by
    * [[bpeApplyTo]]'s out-of-vocabulary fallback and the streaming
    * tokenizer ([[graft.streaming.CorpusStream.tokenizeStream]]),
    * where it IS the tokenizer: a pure function of the token, no
    * state, no join.
    */
  private[graft] def subwordCountSql(mergePairs: Seq[String],
                                     tok: String)
                                    (implicit d: Dialect): String = {
    // the fold's own lambdas bind x/acc/i0/i — a caller passing one of
    // those as the token reference would have it silently SHADOWED by
    // the inner lambdas (this bug shipped once: listTransform's
    // default `x` as the token var made substring(x, x, 1) read the
    // index); fail loudly instead
    require(!Set("x", "acc", "i0", "i").contains(tok.trim),
      s"subwordCountSql: token var '$tok' collides with an inner " +
        "lambda binding — use listTransformNamed with a distinct name")
    var repr = charsJoinedSql(tok)
    mergePairs.foreach { pair =>
      val Array(a, b) = pair.split(" ", 2)
      repr = mergeFoldSql(tokens(s"($repr)"), lit1(a), lit1(b))
    }
    s"CAST(${listSize(tokens(s"($repr)"))} AS BIGINT)"
  }

  def bpeApplyTo(train: DataFrame, corpus: DataFrame,
                 merges: Int = 6): DataFrame = {
    implicit val d: Dialect = SparkD
    val (ms, fin, cached) = bpeCore(train, merges)
    val sub = fin
      .select(col("w"),
        expr(s"CAST(${listSize(tokens("repr"))} AS BIGINT)").as("n_sub"))
      .localCheckpoint()
    cached.unpersist(false)
    val oov = subwordCountSql(ms.map(_._2), "w")
    val toks = explodeNoInfer(
      corpus.select(col("doc_id"), expr(tokens("text")).as("toks")),
      col("toks"), "w", col("doc_id"))
    toks.join(sub, Seq("w"), "left")
      .withColumn("n_sub", coalesce(col("n_sub"), expr(oov)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
  }

  /** The gated train-and-apply-on-the-same-corpus form (no OOV words
    * by construction, so the fallback never fires and the result is
    * byte-identical to an inner-join formulation).
    */
  def bpeApply(docs: DataFrame, merges: Int = 6): DataFrame =
    bpeApplyTo(docs, docs, merges)

  /** The learned merge pairs alone — the bounded model state a
    * streaming tokenizer ships (see
    * [[graft.streaming.CorpusStream.tokenizeStream]]).
    */
  def bpeMerges(docs: DataFrame, merges: Int = 6): Seq[String] = {
    val (ms, _, cached) = bpeCore(docs, merges)
    cached.unpersist(false)
    ms.map(_._2)
  }

  /** DuckDB twin of [[bpeTrain]]: the identical vocabulary collapse,
    * per-step weighted pair counts, (count desc, pair asc) argmax and
    * merge fold, unrolled as a CTE chain with the learned merge table
    * assembled by UNION ALL.
    */
  /** The shared CTE chain (w0..wN vocab states, g/m pair-count and
    * argmax stages) for both oracle twins.
    */
  private def bpeCtes(merges: Int)(implicit d: Dialect): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH w0 AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
       |         ${charsJoinedSql("w")} AS repr
       |  FROM (SELECT unnest(${tokens("text")}) AS w FROM documents)
       |  GROUP BY w)""".stripMargin
    for (i <- 1 to merges) {
      sb ++= s""",
       |g$i AS (
       |  SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM (
       |    SELECT cnt, unnest(${grams2("syms")}) AS g FROM (
       |      SELECT cnt, ${tokens("repr")} AS syms FROM w${i - 1}))
       |  GROUP BY g),
       |m$i AS (
       |  SELECT g, n FROM g$i ORDER BY n DESC, g ASC LIMIT 1),
       |w$i AS (
       |  SELECT w.w, w.cnt,
       |         ${mergeFoldSql(tokens("w.repr"),
                   "split_part(m.g, ' ', 1)",
                   "split_part(m.g, ' ', 2)")} AS repr
       |  FROM w${i - 1} w CROSS JOIN m$i m)""".stripMargin
    }
    sb.toString
  }

  def bpeTrainSql(merges: Int = 6): String = {
    implicit val d: Dialect = DuckD
    bpeCtes(merges) + (1 to merges).map(i =>
      s"""
       |SELECT CAST($i AS BIGINT) AS step, g AS pair,
       |       replace(g, ' ', '') AS merged, n AS cnt FROM m$i"""
        .stripMargin).mkString("", "\nUNION ALL", "")
  }

  /** DuckDB twin of [[bpeApply]]: the same trained vocabulary as a
    * w → subword-count lookup joined back onto the corpus tokens.
    */
  def bpeApplySql(merges: Int = 6): String = {
    implicit val d: Dialect = DuckD
    bpeCtes(merges) + s""",
       |sub AS (
       |  SELECT w, CAST(${listSize(tokens("repr"))} AS BIGINT) AS n_sub
       |  FROM w$merges),
       |tok AS (
       |  SELECT doc_id, unnest(${tokens("text")}) AS w FROM documents)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(SUM(n_sub) AS BIGINT) AS n_subwords
       |FROM tok JOIN sub USING (w) GROUP BY doc_id""".stripMargin
  }

  /** Repeated token-`k`-gram span detection — the shape of
    * substring-level training-data dedup (find spans that occur more
    * than once anywhere in the corpus, within OR across documents;
    * the exact-substring analogue of the suffix-array approach of
    * Lee et al. 2022). Every document reports its total `k`-gram
    * count and how many of those grams occur ≥ 2 times corpus-wide;
    * documents shorter than `k` tokens report zeros.
    *
    * 100 TB shape: the gram explode is row-local (one md5 per gram);
    * `n_grams` is pure row-local arithmetic (size − k + 1) and never
    * touches the shuffle. The dup count is computed by SUBTRACTION —
    * n_dup_grams = n_grams − n_singleton_grams — so the whole operator
    * is a chain of three hash aggregates, every one of them map-side
    * combined, with no window and no join against the raw gram stream
    * at all: (1) occurrences pre-aggregate to (h, doc_id) — a viral
    * boilerplate gram repeating 10⁸ times inside documents collapses
    * per map task; (2) the (h, doc_id) frame aggregates to per-gram
    * corpus totals — a gram spread across 10⁸ documents ALSO combines
    * map-side (sum/min are associative), so no hot key ever
    * concentrates in one task; (3) grams with total = 1 carry their
    * unique owning doc_id out of (2), and a doc-sized aggregate counts
    * singletons per document. The gram explode+md5 runs exactly once,
    * the only broadcast is the doc-sized singleton dim. Nothing is
    * quadratic in corpus size; no window over an unbounded hot-key
    * partition.
    */
  def repeatedSpans(docs: DataFrame, k: Int = 8): DataFrame = {
    val base = docs
      .select(col("doc_id"), expr(tokens("text")).as("toks"))
    val grams = explodeNoInfer(
      base.where(expr(s"${listSize("toks")} >= $k")),
      expr(
        s"transform(${idxSeq1(s"${listSize("toks")} - ${k - 1}")}," +
          s" p -> md5(${joinList(listSlice("toks", "p", k.toString))}))"),
      "h", col("doc_id"))
    val perDocGram = grams.groupBy("h", "doc_id")
      .agg(count(lit(1)).as("c"))
    // total = 1 ⇒ the gram has exactly one (h, doc_id) row, so
    // min(doc_id) IS its unique owning document.
    val singletons = perDocGram.groupBy("h")
      .agg(sum("c").as("tot"), min("doc_id").as("doc_id"))
      .where(col("tot") === 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_singleton"))
    base
      .select(col("doc_id"),
        expr(s"CAST(greatest(0, ${listSize("toks")} - ${k - 1})" +
          " AS BIGINT)").as("n_grams"))
      .join(singletons, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        (col("n_grams") - coalesce(col("n_singleton"), lit(0L)))
          .as("n_dup_grams"))
      .withColumn("has_dup", col("n_dup_grams") > 0)
  }

  /** DuckDB twin of [[repeatedSpans]] (join formulation — same
    * occurrence counts as the window).
    */
  def repeatedSpansSql(k: Int = 8): String = {
    implicit val d: Dialect = DuckD
    s"""WITH base AS (
       |  SELECT doc_id, ${tokens("text")} AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    unnest(list_transform(
       |      ${idxSeq1(s"${listSize("toks")} - ${k - 1}")},
       |      p -> md5(${joinList(listSlice("toks", "p", k.toString))})))
       |      AS h
       |  FROM base WHERE ${listSize("toks")} >= $k),
       |counts AS (
       |  SELECT h, CAST(count(*) AS BIGINT) AS cnt
       |  FROM grams GROUP BY h),
       |perdoc AS (
       |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |         CAST(sum(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_dup_grams
       |  FROM grams g JOIN counts c ON g.h = c.h GROUP BY g.doc_id)
       |SELECT d.doc_id,
       |       coalesce(p.n_grams, CAST(0 AS BIGINT)) AS n_grams,
       |       coalesce(p.n_dup_grams, CAST(0 AS BIGINT)) AS n_dup_grams,
       |       coalesce(p.n_dup_grams, CAST(0 AS BIGINT)) > 0 AS has_dup
       |FROM (SELECT doc_id FROM documents) d
       |LEFT JOIN perdoc p ON d.doc_id = p.doc_id""".stripMargin
  }

  /** Repeated-span REMOVAL (the acting half of [[repeatedSpans]]'s
    * detection): every token-`k`-gram occurrence is ranked corpus-wide
    * within its gram (ordered by (doc_id, position)); the FIRST
    * occurrence is canonical and kept, every later one has its
    * `k`-token span excised — the keep-first exact-substring dedup of
    * Lee et al. 2022, token-granular. Overlapping removable spans
    * union; documents shorter than `k` tokens pass through unchanged.
    * Emits every document with its cleaned text and removed-token
    * count.
    *
    * 100 TB shape: gram explode row-local; "first occurrence" is NOT a
    * rank window (a window over an unbounded hot-gram partition puts a
    * 10⁸-occurrence boilerplate span in one task) but a map-side-
    * combined `min(struct(doc_id, p))` aggregate per gram hash — the
    * hot key collapses to one combiner row per map task — filtered to
    * `cnt ≥ 2` so singleton grams (the vast majority) never enter the
    * occurrence join; the join of the gram stream against that dup-
    * gram dim is AQE-skew-splittable on the probe side. The removable-
    * coverage set is (dup-occurrence × k)-sized, aggregated per doc
    * and joined back on doc_id; the final token filter is row-local
    * and linear (`array_except` builds one hash set of the removed
    * positions per row — not a per-token scan of the removal list).
    * Nothing quadratic, no all-pairs, no hot-key window.
    */
  def spanDedupClean(docs: DataFrame, k: Int = 8): DataFrame = {
    val base = docs.select(col("doc_id"), expr(tokens("text")).as("toks"))
    val grams = explodeNoInfer(
      base.where(expr(s"${listSize("toks")} >= $k")),
      expr(idxSeq1(s"${listSize("toks")} - ${k - 1}")), "p",
      col("doc_id"), col("toks"))
      .select(col("doc_id"), col("p"),
        expr(s"md5(${joinList(listSlice("toks", "p", k.toString))})")
          .as("h"))
    // one hash-agg pass: occurrence count + lexicographic-min (doc, p)
    // per gram; both map-side combine, so a hot gram is one row here.
    val dupFirst = grams.groupBy("h")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("p"))).as("first"))
      .where(col("cnt") >= 2)
      .select(col("h"), col("first.doc_id").as("first_doc"),
        col("first.p").as("first_p"))
    // every occurrence of a duplicated gram EXCEPT its canonical first
    // — identical to the old rank-window's rk >= 2 rows (row_number
    // ordered by (doc_id, p) makes rk = 1 exactly the lexicographic
    // min; (doc_id, p) is unique per occurrence so there are no ties).
    val cov = grams.join(dupFirst, Seq("h"))
      .where(col("doc_id") =!= col("first_doc") ||
        col("p") =!= col("first_p"))
      .select(col("doc_id"),
        explode(expr(s"sequence(p, p + ${k - 1})")).as("idx"))
      .distinct()
      .groupBy("doc_id").agg(collect_list("idx").as("cidx"))
    base.join(cov, Seq("doc_id"), "left")
      .withColumn("cidx2",
        coalesce(col("cidx"), typedLit(Array.empty[Long])))
      .select(col("doc_id"),
        // sequence(1, 0) would yield a DESCENDING [1, 0] on an empty
        // token array, so the zero-token row is special-cased.
        expr("CASE WHEN size(toks) = 0 THEN '' ELSE " +
          "array_join(transform(array_except(sequence(CAST(1 AS " +
          "BIGINT), CAST(size(toks) AS BIGINT)), cidx2), " +
          "i -> element_at(toks, CAST(i AS INT))), ' ') END")
          .as("cleaned"),
        expr("CAST(size(cidx2) AS BIGINT)").as("n_removed"))
  }

  /** DuckDB twin of [[spanDedupClean]]. */
  def spanDedupCleanSql(k: Int = 8): String = {
    implicit val d: Dialect = DuckD
    s"""WITH base AS (
       |  SELECT doc_id, ${tokens("text")} AS toks FROM documents),
       |ex AS (
       |  SELECT doc_id, toks,
       |         unnest(range(1, ${listSize("toks")} - ${k - 2})) AS p
       |  FROM base WHERE ${listSize("toks")} >= $k),
       |grams AS (
       |  SELECT doc_id, p,
       |         md5(${joinList(listSlice("toks", "p", k.toString))})
       |           AS h
       |  FROM ex),
       |ranked AS (
       |  SELECT doc_id, p,
       |         row_number() OVER (PARTITION BY h ORDER BY doc_id, p)
       |           AS rk
       |  FROM grams),
       |cover AS (
       |  SELECT DISTINCT doc_id, unnest(range(p, p + $k)) AS idx
       |  FROM ranked WHERE rk >= 2),
       |cov AS (SELECT doc_id, list(idx) AS cidx
       |        FROM cover GROUP BY doc_id)
       |SELECT b.doc_id,
       |  coalesce(array_to_string(list_filter(b.toks,
       |    (x, i) -> NOT list_contains(coalesce(c.cidx, []), i)), ' '),
       |    '') AS cleaned,
       |  CAST(len(coalesce(c.cidx, [])) AS BIGINT) AS n_removed
       |FROM base b LEFT JOIN cov c ON b.doc_id = c.doc_id"""
      .stripMargin
  }

  /** Cross-source duplicate-overlap census: fingerprint every document
    * by its first `prefixTokens` tokens (the cheap URL-less proxy for
    * "same page crawled into two dumps") and report, for every source
    * pair, how many distinct fingerprints they share. The corpus-level
    * diagnostic a mix designer reads before weighting sources.
    *
    * 100 TB shape: the fingerprint is row-local; ONE hash aggregate
    * groups by fingerprint carrying a set of sources (bounded by the
    * source vocabulary, not the corpus); the pair expansion is
    * row-local over those sets and the final count output is
    * source-pair-sized. The corpus is never self-joined.
    */
  def sourceOverlap(docs: DataFrame, prefixTokens: Int = 20)
      : DataFrame =
    docs
      .select(expr(s"md5(${joinList(listSlice(tokens("text"), "1",
        prefixTokens.toString))})").as("h"), col("source"))
      .groupBy("h").agg(array_sort(collect_set("source")).as("ss"))
      .where(size(col("ss")) >= 2)
      .transform(df => explodeNoInfer(df, expr(
        """flatten(transform(sequence(1, size(ss) - 1),
          |  i -> transform(sequence(i + 1, size(ss)),
          |    j -> named_struct('source_a', element_at(ss, i),
          |                      'source_b', element_at(ss, j)))))"""
          .stripMargin), "p"))
      .select(col("p.source_a").as("source_a"),
        col("p.source_b").as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))

  /** DuckDB twin of [[sourceOverlap]] (self-join formulation over the
    * distinct (fingerprint, source) set — same pair counts as the
    * set expansion; `<` on sources matches `array_sort`'s
    * lexicographic order).
    */
  def sourceOverlapSql(prefixTokens: Int = 20): String = {
    implicit val d: Dialect = DuckD
    s"""WITH fp AS (
       |  SELECT DISTINCT
       |    md5(${joinList(listSlice(tokens("text"), "1",
              prefixTokens.toString))}) AS h,
       |    source
       |  FROM documents)
       |SELECT a.source AS source_a, b.source AS source_b,
       |       CAST(count(*) AS BIGINT) AS n_shared
       |FROM fp a JOIN fp b ON a.h = b.h AND a.source < b.source
       |GROUP BY 1, 2""".stripMargin
  }

  /** DuckDB twin of [[stratifiedSample]]. */
  /** Bigram-LM quality scoring — the perplexity-proxy filter of the
    * CCNet/RefinedWeb family: train an add-one-smoothed word-bigram
    * model ON the corpus itself and score every document by its total
    * negative log-likelihood. High-NLL documents are the gibberish /
    * boilerplate / wrong-language tail a quality-filtering stage
    * drops; the per-term value is −ln((c(w1,w2)+1) / (c(w1)+V)).
    *
    * Gate representation: each term converts to integer micro-units
    * (floor(x·1e6 + 0.5), x ≥ 0 because the smoothed probability is
    * ≤ 1) BEFORE summation, so the per-document sum is an order-free
    * integer — no floating accumulation order to pin.
    *
    * 100 TB shape: ONE corpus-scale pass — the gram explode feeds a
    * single (doc_id, w1, w2) map-side-combined aggregate, and c(w1),
    * c(w1,w2) and V all derive from it through bigram-vocabulary-
    * bounded (zipf) re-aggregations, so the tokenizing scan runs once
    * where four independent aggregates would re-run it four times
    * (costs ~0.2 s of extra stage latency at fixture scale — the
    * chained aggregates serialize — which scan dominance repays many
    * times over at corpus scale). Repeated bigrams inside a document
    * collapse map-side, so "of the"-class hot bigrams enter the
    * scoring join once per document, never once per occurrence, and
    * AQE skew-split handles the residual spread. V is a 1-row
    * broadcast. Nothing is quadratic; no windows.
    */
  def bigramNll(docs: DataFrame): DataFrame = {
    implicit val d: Dialect = SparkD
    // guard single-token docs BEFORE the index explode: Spark's
    // sequence(1, 0) is the DESCENDING [1, 0] (element_at(toks, 0)
    // throws) where DuckDB's range(1, 1) is empty — the same engine
    // split charsJoinedSql guards
    val tok = docs.select(col("doc_id"),
      expr(tokens("text")).as("toks"))
      .where(expr(s"${listSize("toks")} >= 2"))
    val bg = explodeNoInfer(tok,
      expr(idxSeq1(s"${listSize("toks")} - 1")), "i",
      col("doc_id"), col("toks"))
      .select(col("doc_id"),
        expr(elem("toks", "i")).as("w1"),
        expr(elem("toks", "i + 1")).as("w2"))
    // ONE corpus-scale aggregate: c12, c1 and V all derive from the
    // (doc, w1, w2) pre-aggregate (c12 = Σ_doc n_occ, c1 = Σ_w2 c12,
    // V = distinct w2 of the pair table — identical values), so the
    // gram explode feeds a single shuffle whose exchange Spark's
    // ReuseExchange dedups between the scoring probe and the model
    // chain, instead of four independent corpus-scale aggregates
    val docBg = bg.groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("n_occ"))
    val pair = docBg.groupBy("w1", "w2").agg(sum("n_occ").as("c12"))
    val hist = pair.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = pair.agg(countDistinct(col("w2")).as("v"))
    docBg.join(pair, Seq("w1", "w2")).join(hist, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("n_occ"),
        expr("CAST(floor(-ln((CAST(c12 AS DOUBLE) + 1.0e0) / " +
          "(CAST(c1 AS DOUBLE) + CAST(v AS DOUBLE))) * 1.0e6 + 0.5e0)" +
          " AS BIGINT)").as("nll_u"))
      .groupBy("doc_id")
      .agg(sum("n_occ").as("n_bigrams"),
        sum(col("n_occ") * col("nll_u")).as("nll_u_sum"))
  }

  /** DSIR importance scoring (Data Selection with Importance
    * Resampling, Xie et al. 2023) — score every raw-pool document by
    * how much more likely its hashed n-gram features are under the
    * TARGET distribution than under the raw-pool (background)
    * distribution: log w(doc) = Σ_grams [ln p̂_t(bucket) −
    * ln p̂_b(bucket)] with add-one-smoothed bucket unigram models, the
    * paper's hashed-feature reduction. The target split reuses the
    * benchmark convention of the contamination screen (doc_id % 97 ==
    * 0); `selected` marks documents whose importance ratio favours the
    * target (log ratio > 0) — the deterministic core of the paper's
    * resampling step (its Gumbel noise is sampling machinery, not
    * scoring semantics).
    *
    * Gate representation: the per-bucket log-ratio term converts to
    * integer micro-units BEFORE the per-document summation (the same
    * order-free-integer pattern as [[bigramNll]]), so distribution
    * cannot reorder a floating sum.
    *
    * 100 TB shape: the gram explode is row-local; the bucket
    * histograms are ONE map-side-combined aggregate over it; the
    * model the documents join against is `buckets`-bounded — a
    * broadcast by construction (DSIR's entire point: the importance
    * model is a fixed-size hash sketch, not corpus-scale state), so
    * per-gram rows ride the broadcast join row-locally and the ONLY
    * corpus-scale shuffle is the final map-side-combined per-document
    * sum (a (doc, bucket) pre-aggregate would ADD a shuffle while
    * saving nothing — there is no skew to protect a broadcast join
    * from). Totals ride a 1-row broadcast. The row-local gram
    * explode+hash runs twice — once building the model, once scoring
    * — which is inherent to the model-then-score phase structure; a
    * pipeline scoring MANY corpora against one model pays the model
    * pass once (see the streaming twin, which ships the model as a
    * per-bucket array and scores with zero additional passes).
    */
  def dsirScore(docs: DataFrame, buckets: Int = 256): DataFrame = {
    implicit val d: Dialect = SparkD
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    // single-token docs carry no bigram: filter BEFORE the index
    // explode (Spark sequence(1, 0) = [1, 0] would crash element_at,
    // DuckDB range(1, 1) is empty — same guard as bigramNll)
    val tok = docs.select(col("doc_id"), expr(tokens("text")).as("toks"))
      .where(expr(s"${listSize("toks")} >= 2"))
    val grams = explodeNoInfer(tok,
      expr(idxSeq1(s"${listSize("toks")} - 1")), "i",
      col("doc_id"), col("toks"))
      .select(col("doc_id"),
        expr(s"(${hex8ToLong(s"${elem("toks", "i")} || ' ' || " +
          s"${elem("toks", "i + 1")}")}) % $buckets").as("b"))
    // the histogram feeds BOTH the broadcast model and the totals:
    // localCheckpoint materialises its `buckets`-bounded rows once so
    // the corpus-scale gram aggregate beneath it runs once, not twice
    val hist = grams
      .withColumn("tgt",
        expr("CAST(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END" +
          " AS BIGINT)"))
      .groupBy("b")
      .agg(sum("tgt").as("ct"), sum(expr("1 - tgt")).as("cb"))
      .localCheckpoint(eager = false)
    val tot = hist.agg(sum("ct").as("nt"), sum("cb").as("nb"))
    val lrU =
      s"""CAST(floor((ln((CAST(ct AS DOUBLE) + 1.0e0) /
         |  (CAST(nt AS DOUBLE) + $buckets.0e0)) -
         |  ln((CAST(cb AS DOUBLE) + 1.0e0) /
         |  (CAST(nb AS DOUBLE) + $buckets.0e0))) * 1.0e6 + 0.5e0)
         |  AS BIGINT)""".stripMargin
    grams.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(hist), Seq("b"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), expr(lrU).as("lr_u"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(col("lr_u")).as("logratio_u"))
      .withColumn("selected",
        (col("logratio_u") > 0).cast("long"))
  }

  /** DuckDB twin of [[dsirScore]] — identical hash, bucket models,
    * micro-unit terms.
    */
  def dsirScoreSql(buckets: Int = 256): String = {
    implicit val d: Dialect = DuckD
    val lrU =
      s"""CAST(floor((ln((CAST(ct AS DOUBLE) + 1.0e0) /
         |  (CAST(nt AS DOUBLE) + $buckets.0e0)) -
         |  ln((CAST(cb AS DOUBLE) + 1.0e0) /
         |  (CAST(nb AS DOUBLE) + $buckets.0e0))) * 1.0e6 + 0.5e0)
         |  AS BIGINT)""".stripMargin
    s"""WITH tok AS (
       |  SELECT doc_id, ${tokens("text")} AS toks FROM documents),
       |bgx AS (
       |  SELECT doc_id,
       |         (${hex8ToLong(s"${elem("toks", "i")} || ' ' || " +
            s"${elem("toks", "i + 1")}")}) % $buckets AS b
       |  FROM (SELECT doc_id, toks,
       |          unnest(${idxSeq1(s"${listSize("toks")} - 1")}) AS i
       |        FROM tok)),
       |db AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS n_occ
       |       FROM bgx GROUP BY 1, 2),
       |hist AS (SELECT b,
       |    CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ct,
       |    CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 0 ELSE 1 END)
       |      AS BIGINT) AS cb
       |  FROM bgx GROUP BY 1),
       |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
       |               CAST(sum(cb) AS BIGINT) AS nb FROM hist),
       |scored AS (
       |  SELECT doc_id, n_occ, $lrU AS lr_u
       |  FROM db JOIN hist USING (b) CROSS JOIN tot
       |  WHERE doc_id % 97 <> 0)
       |SELECT doc_id, CAST(sum(n_occ) AS BIGINT) AS n_grams,
       |       CAST(sum(n_occ * lr_u) AS BIGINT) AS logratio_u,
       |       CAST(CASE WHEN CAST(sum(n_occ * lr_u) AS BIGINT) > 0
       |            THEN 1 ELSE 0 END AS BIGINT) AS selected
       |FROM scored GROUP BY doc_id""".stripMargin
  }

  /** DuckDB twin of [[bigramNll]] — same dialect-shared token /
    * index / element builders, same integer micro-unit terms.
    */
  def bigramNllSql: String = {
    implicit val d: Dialect = DuckD
    s"""WITH tok AS (
       |  SELECT doc_id, ${tokens("text")} AS toks FROM documents),
       |bg AS (
       |  SELECT doc_id, ${elem("toks", "i")} AS w1,
       |         ${elem("toks", "i + 1")} AS w2
       |  FROM (SELECT doc_id, toks,
       |          unnest(${idxSeq1(s"${listSize("toks")} - 1")}) AS i
       |        FROM tok)),
       |db AS (SELECT doc_id, w1, w2, count(*) AS n_occ
       |       FROM bg GROUP BY 1, 2, 3),
       |c1t AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
       |c12t AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       |vt AS (SELECT count(DISTINCT w2) AS v FROM bg)
       |SELECT doc_id, CAST(sum(n_occ) AS BIGINT) AS n_bigrams,
       |       CAST(sum(n_occ *
       |         CAST(floor(-ln((CAST(c12 AS DOUBLE) + 1.0e0) /
       |           (CAST(c1 AS DOUBLE) + CAST(v AS DOUBLE)))
       |           * 1.0e6 + 0.5e0) AS BIGINT)) AS BIGINT) AS nll_u_sum
       |FROM db JOIN c12t USING (w1, w2) JOIN c1t USING (w1)
       |CROSS JOIN vt
       |GROUP BY doc_id""".stripMargin
  }

  def stratifiedSampleSql(targets: Seq[(String, Long)] = SampleTargets)
      : String = {
    implicit val d: Dialect = DuckD
    val values = targets
      .map { case (l, n) => s"('$l', CAST($n AS BIGINT))" }
      .mkString(", ")
    s"""WITH tgt(lang, target_n) AS (VALUES $values),
       |sizes AS (SELECT lang, CAST(count(*) AS BIGINT) AS group_n
       |          FROM documents GROUP BY lang),
       |cutoffs AS (
       |  SELECT s.lang,
       |         least(CAST(1000000 AS BIGINT),
       |               CAST(floor(t.target_n * 1000000 / s.group_n)
       |                    AS BIGINT)) AS cutoff
       |  FROM sizes s JOIN tgt t ON s.lang = t.lang)
       |SELECT doc_id, lang, u, cutoff
       |FROM (
       |  SELECT d.doc_id, d.lang, c.cutoff,
       |         ${hex8ToLong(s"concat('strat', ${toStr("d.doc_id")})")}
       |           % 1000000 AS u
       |  FROM documents d JOIN cutoffs c ON d.lang = c.lang)
       |WHERE u < cutoff""".stripMargin
  }
}
