package graft.llm

import graft.llm.TextExprs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: language ID, quality
  * scoring, token counting, fingerprinting. All expression-level —
  * one scan, no UDFs in the hot path (the rolling-hash kernel is the one
  * pure-Scala function, used by the library API, with the md5 variant
  * serving the oracle-checked query).
  */
object TextAnalysis {

  private implicit val d: Dialect = SparkD

  /** Tiny per-language stopword marker sets (n-gram heuristic stand-in).
    * The oracle regenerates the same table from VALUES.
    */
  val Stopwords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "and", "en" -> "of", "en" -> "is",
    "de" -> "der", "de" -> "die", "de" -> "das", "de" -> "und",
    "de" -> "ist",
    "es" -> "el", "es" -> "los", "es" -> "y", "es" -> "una", "es" -> "es",
    "fr" -> "le", "fr" -> "les", "fr" -> "et", "fr" -> "est",
    "fr" -> "un",
    "zh" -> "shi", "zh" -> "bu", "zh" -> "wo", "zh" -> "zhe",
    "zh" -> "de")

  def stopwordDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Stopwords.toDF("lang_cand", "word")
  }

  /** Language ID: per-language stopword hit counts, argmax with
    * deterministic (count desc, lang asc) tie-break; docs with zero hits
    * predict 'und' (undetermined).
    */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val tok = Corpus.explodeNoInfer(docs, expr(tokens("text")),
      "word", col("doc_id"))
    val hits = tok.join(broadcast(stopwordDim(spark)), Seq("word"))
      .groupBy("doc_id", "lang_cand")
      .agg(count(lit(1)).as("n_hits"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("n_hits").desc, col("lang_cand").asc)
    val best = hits.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("lang_cand").as("pred_lang"),
        col("n_hits"))
    docs.select("doc_id").join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** Stop words for the composite filter's "natural language" signal
    * (Gopher rule family: Rae et al. 2021 §A1.1; also MassiveText /
    * RefinedWeb / Dolma cleaning stacks).
    */
  val StopWords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "that")

  private[graft] def stopCntSql(implicit d: Dialect): String =
    listFoldSumLong(listTransform("toks", t =>
      s"CAST(CASE WHEN $t IN (${StopWords.map("'" + _ + "'")
        .mkString(", ")}) THEN 1 ELSE 0 END AS BIGINT)"))

  private[graft] def alphaCntSql(implicit d: Dialect): String =
    listFoldSumLong(listTransform("toks", t =>
      s"CAST(CASE WHEN (substring($t, 1, 1) >= 'a' AND " +
        s"substring($t, 1, 1) <= 'z') OR (substring($t, 1, 1) >= 'A' " +
        s"AND substring($t, 1, 1) <= 'Z') THEN 1 ELSE 0 END AS BIGINT)"))

  /** The rule set over the base counts — every rule is EXACT integer
    * arithmetic (ratio bounds cross-multiplied), so the composite
    * filter has no floating-point comparison anywhere: identical
    * verdicts under any engine, partitioning or evaluation order.
    */
  private[graft] val GopherRules: Seq[(String, String)] = Seq(
    // 20..10000 words
    "r_nwords" -> "n_tokens >= 20 AND n_tokens <= 10000",
    // mean word length in [3, 10] (chars excluding the n-1 separators)
    "r_wordlen" -> ("(n_chars - n_tokens + 1) >= 3 * n_tokens AND " +
      "(n_chars - n_tokens + 1) <= 10 * n_tokens"),
    // at least two stop-word occurrences
    "r_stop" -> "stop_cnt >= 2",
    // duplicate-token fraction <= 0.6
    "r_dup" -> "(n_tokens - n_distinct) * 10 <= n_tokens * 6",
    // >= 80 % of words start with an ascii letter
    "r_alpha" -> "alpha_cnt * 10 >= n_tokens * 8")

  /** Gopher-class composite quality filter: per-document rule flags
    * plus the conjunctive pass verdict. Fully row-local (the dup-token
    * signal reuses the distinct-count, not a per-token aggregate) —
    * zero shuffle at any scale; the rule thresholds live in ONE table
    * ([[GopherRules]]) rendered into both engines.
    */
  def gopherFilter(docs: DataFrame): DataFrame = {
    implicit val d: Dialect = SparkD
    val base = docs
      .withColumn("toks", expr(tokens("text")))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        expr(listSize("toks")).cast("long").as("n_tokens"),
        expr(listDistinctSize("toks")).cast("long").as("n_distinct"),
        expr(stopCntSql).as("stop_cnt"),
        expr(alphaCntSql).as("alpha_cnt"))
    val flags = GopherRules.map { case (n, c) =>
      expr(s"CAST(CASE WHEN $c THEN 1 ELSE 0 END AS BIGINT)").as(n)
    }
    val pass = expr("CAST(CASE WHEN " +
      GopherRules.map(_._2).mkString("(", ") AND (", ")") +
      " THEN 1 ELSE 0 END AS BIGINT)").as("pass")
    base.select(col("doc_id") +: col("n_tokens") +: flags :+ pass: _*)
  }

  /** Per-source token-length profile with EXACT order statistics
    * (type-1 quantiles: the value at rank ceil(q·n), all-integer rank
    * arithmetic) — the distribution report a curation run ships per
    * source shard. Approximate-percentile sketches are
    * implementation-defined and cannot be twinned across engines;
    * the exact rank pick can, and costs one source-partitioned sort
    * window plus one map-side-combined aggregate (the same shuffle
    * budget as sequence packing). Rank ties among equal values cannot
    * change the value picked at a rank, so row_number's tie order is
    * immaterial.
    */
  def lengthProfile(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("n_tok", "doc_id")
    val wAll = Window.partitionBy("source")
    val ranked = docs
      .selectExpr("doc_id", "source",
        s"CAST(${listSize(tokens("text"))} AS BIGINT) AS n_tok")
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
    def atQ(num: Int, den: Int, name: String) =
      max(when(col("rk") ===
        expr(s"CAST(floor((n * $num + ${den - 1}) / $den.0) AS BIGINT)"),
        col("n_tok"))).as(name)
    ranked.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tok").as("tot_tokens"),
      min("n_tok").as("min_tok"),
      atQ(1, 4, "p25_tok"), atQ(2, 4, "p50_tok"), atQ(3, 4, "p75_tok"),
      max("n_tok").as("max_tok"))
  }

  /** DuckDB twin of [[lengthProfile]]. */
  def lengthProfileSql: String = {
    implicit val d: Dialect = DuckD
    def atQ(num: Int, den: Int, name: String) =
      s"MAX(CASE WHEN rk = CAST(floor((n * $num + ${den - 1}) / $den.0)" +
        s" AS BIGINT) THEN n_tok END) AS $name"
    s"""WITH base AS (
       |  SELECT doc_id, source,
       |         CAST(${listSize(tokens("text"))} AS BIGINT) AS n_tok
       |  FROM documents),
       |ranked AS (
       |  SELECT source, n_tok,
       |         CAST(row_number() OVER (PARTITION BY source
       |           ORDER BY n_tok, doc_id) AS BIGINT) AS rk,
       |         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM base)
       |SELECT source,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_tok) AS BIGINT) AS tot_tokens,
       |       MIN(n_tok) AS min_tok,
       |       ${atQ(1, 4, "p25_tok")},
       |       ${atQ(2, 4, "p50_tok")},
       |       ${atQ(3, 4, "p75_tok")},
       |       MAX(n_tok) AS max_tok
       |FROM ranked GROUP BY source""".stripMargin
  }

  /** Quality scoring: length, token count, mean token length, lexical
    * diversity, and a blended score. Pure arithmetic on counts —
    * deterministic across engines.
    */
  def quality(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(tokens("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", expr(listSize("toks")).cast("long"))
      .withColumn("n_distinct", expr(listDistinctSize("toks"))
        .cast("long"))
      .withColumn("avg_token_len",
        (col("n_chars") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens").cast("double"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / col("n_tokens").cast("double"))
      // micro-units, NOT round(x, 6): the composite score can land
      // exactly on a half-way tie (it did at sf0.1 — 173/40 tokens
      // avg gives x == 0.5203125 bit-exactly), and round's tie-break
      // differs between engines (Spark HALF_UP vs DuckDB half-even).
      // floor(x·1e6 + 0.5) is pure IEEE arithmetic — identical bits
      // in, identical BIGINT out.
      .withColumn("quality_score_u",
        expr("CAST(floor((avg_token_len / 8.0 * 0.5" +
          " + distinct_ratio * 0.5) * 1.0e6 + 0.5) AS BIGINT)"))
      .select("doc_id", "n_chars", "n_tokens", "n_distinct",
        "avg_token_len", "distinct_ratio", "quality_score_u")

  /** Token counting: whitespace tokens plus a BPE-ish subword estimate
    * (ceil(len/4) per token — the "~4 chars per token" heuristic).
    */
  def tokenStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(tokens("text")))
      .withColumn("n_ws_tokens", expr(listSize("toks")).cast("long"))
      .withColumn("n_subword_est", expr(listFoldSumLong(
        listTransform("toks",
          t => s"CAST(floor((length($t) + 3) / 4) AS BIGINT)"))))
      .select("doc_id", "n_ws_tokens", "n_subword_est")

  /** Deterministic train/val/test corpus splitting by CONTENT hash —
    * the standard held-out-split operator of a training-data pipeline.
    * Keying on content (not doc_id) means byte-identical documents
    * always land in the same split, so exact duplicates can never leak
    * train data into eval; the assignment is reproducible across runs
    * and engines (the DuckDB twin shares the hash builder).
    */
  def hashSplit(docs: DataFrame, nBuckets: Int = 100,
                trainLt: Int = 80, valLt: Int = 90): DataFrame =
    docs
      .withColumn("bucket", expr(s"${hex8ToLong("text")} % $nBuckets"))
      .withColumn("split",
        when(col("bucket") < trainLt, "train")
          .when(col("bucket") < valLt, "val")
          .otherwise("test"))
      .select("doc_id", "bucket", "split")

  /** Document fingerprinting: md5-prefix fingerprint plus the minimum
    * shingle hash (a 1-perm MinHash — the content-defined anchor).
    *
    * Shape: explode the shingle list and hash per ROW, not per lambda
    * element — higher-order-function lambdas are CodegenFallback
    * (interpreted, one allocation per element), while the exploded md5 +
    * hex extraction is whole-stage codegen. The min folds map-side in
    * the hash aggregate, so the shuffle carries one row per document.
    * The md5/hex staging stays in separate projections on purpose:
    * CollapseProject would otherwise inline the md5 into all 8 hex-digit
    * extractions (it keeps non-cheap expressions un-duplicated).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs
      // tokens materialised first — the shingle builder inlines its
      // argument textually, and an inlined split() re-tokenises the
      // document per lambda element (O(n²) in interpreted eval)
      .withColumn("toks", expr(tokens("text")))
      // explode_OUTER: a NULL text must still yield its one output row
      // (NULL fingerprint), matching the oracle's plain SELECT
      .select(col("doc_id"),
        substring(md5(col("text")), 1, 16).as("fp_hex"),
        explode_outer(expr(shingles("text", "toks"))).as("sh"))
      .select(col("doc_id"), col("fp_hex"), md5(col("sh")).as("m"))
      .select(col("doc_id"), col("fp_hex"),
        expr(hex8FromMd5("m")).as("h"))
      .groupBy("doc_id", "fp_hex")
      .agg(min("h").as("min_shingle"))
      .select("doc_id", "fp_hex", "min_shingle")

  /** TF-IDF: top-k terms per document by tf·idf with
    * idf = ln((N+1)/(df+1)) + 1 (the smoothed formulation). Deterministic
    * rank: (round(score,6) desc, term asc). Two hash aggregates (term
    * frequencies, document frequencies) and a broadcast-sized idf join —
    * at corpus scale the df table is vocabulary-sized.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    // corpus size as a 1-row broadcast aggregate inside the SAME lazy
    // plan — the old `docs.count()` was a separate eager job (a full
    // second scan before the pipeline even started); here the count
    // branch is column-pruned to parquet footers
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val tok = Corpus.explodeNoInfer(docs, expr(tokens("text")),
      "term", col("doc_id"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        log((col("n_docs") + 1.0) / (col("df").cast("double") + 1.0))
          + 1.0)
    val scored = tf.join(dfreq, Seq("term"))
      .withColumn("score", round(col("tf").cast("double") * col("idf"), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("doc_id", "rk", "term", "tf", "df", "score")
  }

  /** Repetition quality stats (the Gopher-rules family of repetition
    * filters, Rae et al. 2021 §A1.1): per document, the most frequent
    * adjacent 2-gram with its count, the fraction of tokens covered by
    * that 2-gram (count·2 / n_tokens), and the duplicate-token fraction
    * (1 − distinct/total). High values of either fraction mark the
    * boilerplate-heavy or degenerate documents a training pipeline
    * drops.
    *
    * Shape: tokens materialised once, 2-grams exploded through codegen,
    * one hash aggregate (map-side combined) and a per-doc top-1 window
    * over gram counts — the window partitions by doc_id, so no global
    * funnel. Docs with < 2 tokens surface with an empty top gram via
    * the left join, not silently dropped.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val base = docs
      .withColumn("toks", expr(tokens("text")))
      .select(col("doc_id"),
        expr(listSize("toks")).cast("long").as("n_tokens"),
        expr(listDistinctSize("toks")).cast("long").as("n_distinct"),
        col("toks"))
    val counts = Corpus.explodeNoInfer(base, expr(grams2("toks")),
        "gram", col("doc_id"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("cnt").desc, col("gram").asc)
    val top = counts.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("gram").as("top_gram"),
        col("cnt").as("top_cnt"))
    base.drop("toks").join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("top_gram"), lit("")).as("top_gram"),
        coalesce(col("top_cnt"), lit(0L)).as("top_cnt"),
        round(coalesce(col("top_cnt"), lit(0L)).cast("double") * 2.0
          / col("n_tokens").cast("double"), 6).as("top_gram_frac"),
        round(lit(1.0) - col("n_distinct").cast("double")
          / col("n_tokens").cast("double"), 6).as("dup_tok_frac"))
  }

  /** Redaction dictionary for [[scrub]] — a stand-in for the deny-lists
    * (names, credentials, internal hostnames) a production pipeline
    * ships; the oracle inlines the same terms.
    */
  val ScrubTerms: Seq[String] = Seq("customer", "value", "the")

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+"
  private val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** PII scrubbing: count email/phone regex matches and replace
    * dictionary terms with a redaction marker, returning match counts
    * and a fingerprint of the scrubbed text (the full text goes back to
    * the pipeline; the fingerprint keeps this query's output narrow).
    * Everything is row-local — no shuffle; the regexes are chosen to
    * mean the same thing under Java regex (Spark) and RE2 (DuckDB).
    */
  def scrub(docs: DataFrame,
            dict: Seq[String] = ScrubTerms): DataFrame = {
    val inList = dict.map(t => s"'$t'").mkString(", ")
    docs
      .withColumn("toks", expr(tokens("text")))
      .withColumn("n_dict", expr(listFoldSumLong(listTransform("toks",
        t => s"CASE WHEN $t IN ($inList) THEN CAST(1 AS BIGINT)" +
          s" ELSE CAST(0 AS BIGINT) END"))))
      .withColumn("scrubbed", expr(joinList(listTransform("toks",
        t => s"CASE WHEN $t IN ($inList) THEN '[REDACTED]'" +
          s" ELSE $t END"))))
      .select(col("doc_id"),
        expr(regexpCount("text", EmailRe)).cast("long").as("n_email"),
        expr(regexpCount("text", PhoneRe)).cast("long").as("n_phone"),
        col("n_dict"),
        substring(md5(col("scrubbed")), 1, 16).as("scrub_hex"))
  }

  /** Corpus mixture report: per (lang, source) cell — the unit a data
    * recipe weights — document and token counts, distinct-content
    * count, and the exact-duplicate fraction. One tiny hash aggregate;
    * at 100 TB this is the dashboard query run after every crawl
    * snapshot.
    */
  def corpusMix(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(tokens("text")))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr(listSize("toks")).cast("long")).as("n_tokens"),
        countDistinct(md5(col("text"))).as("n_unique"))
      .select(col("lang"), col("source"), col("n_docs"),
        col("n_tokens"), col("n_unique"),
        // Pure BIGINT arithmetic: a derived double here (round(1-u/n))
        // sits on rounding-tie cells that flip across oracle-engine
        // builds; integer ppm is engine-version-proof.
        expr("(n_docs - n_unique) * 1000000 div n_docs").as("dup_ppm"))

  /** Production-fast fingerprint: xxhash64 document hash + minimum
    * xxhash64 shingle (1-perm MinHash). The md5 variant above exists
    * for engine-independent oracle parity; THIS is the path a 100 TB
    * run takes — xxhash64 is codegen'd integer mixing (no hex-string
    * materialisation), roughly an order of magnitude cheaper per byte.
    * Spec-gated (DuckDB has no seed-compatible xxhash64).
    */
  def fingerprintFast(docs: DataFrame): DataFrame =
    docs.withColumn("toks", expr(tokens("text")))
      .select(col("doc_id"),
        xxhash64(col("text")).as("fp64"),
        array_min(transform(expr(shingles("text", "toks")),
          s => xxhash64(s))).as("min_shingle64"))

  /** Pure-Scala polynomial rolling hash over UTF-8 bytes (the streaming
    * fingerprint a chunker would use; spec-tested, not oracle-checked).
    */
  /** Gate query for [[bm25]]: a fixed benchmark-style term set (the
    * retrieval query is always BOUNDED model state — an eval suite or
    * decontamination probe, never corpus-derived).
    */
  val Bm25GateTerms: Seq[String] =
    Seq("spark", "query", "window", "stream", "hash")

  /** BM25 relevance of every document against a bounded query-term
    * set — the retrieval primitive a curation pipeline uses for
    * benchmark decontamination and quality-by-relevance screens.
    * Lucene's non-negative idf variant, `ln(1 + (N-df+0.5)/(df+0.5))`,
    * with k1 = 6/5 and b = 3/4 held as EXACT RATIONALS so the
    * tf factor is pure BIGINT arithmetic:
    *
    *   tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *     = 22·tf·S / (10·tf·S + 3·S + 9·dl·N)   with S = Σ dl
    *
    * and the only transcendental is the idf, pinned to order-free
    * integers the t14 way (`floor(ln(...)·1e6 + 0.5)`). Per-term
    * contributions are integer-divided then summed, so the score is
    * associative — identical under any partial-aggregation order.
    *
    * 100 TB shape: the term list rides as an `isin` literal into the
    * token explode (row-local filter, match stream is |hits|-sized,
    * not corpus×|Q|); df and the (N, S) globals aggregate to ≤ |Q|+1
    * rows — model-sized, broadcast back; the one corpus-scale
    * exchange is the per-doc score aggregate, map-side combined.
    * Overflow bound: idf_u·22·tf·S needs S·tf ≲ 2^40 — beyond that
    * (single-corpus Σ dl over ~10^12), pre-scale S and dl·N by a
    * common power of two before calling (the ratio, not the
    * magnitudes, is what the formula consumes).
    */
  def bm25(docs: DataFrame,
           terms: Seq[String] = Bm25GateTerms): DataFrame = {
    require(terms.nonEmpty && terms.size <= 1024,
      s"terms must be a bounded query set, got ${terms.size}")
    val tok = docs
      .select(col("doc_id"), col("text"),
        expr(listSize(tokens("text"))).cast("long").as("dl"))
    // (N, S): one row, broadcast via cross join
    val glob = tok.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("sum_dl"))
    val hits = Corpus.explodeNoInfer(
      tok.select(col("doc_id"), col("dl"),
        expr(tokens("text")).as("toks")),
      col("toks"), "term", col("doc_id"), col("dl"))
      .where(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false) // consumed by df dim + scoring
    val dfDim = hits.groupBy("term")
      .agg(countDistinct("doc_id").as("df"))
    hits
      .join(broadcast(dfDim), Seq("term"))
      .crossJoin(broadcast(glob))
      .withColumn("idf_u", expr(
        "CAST(floor(ln(1.0e0 + CAST(2*(n_docs - df) + 1 AS DOUBLE)" +
          " / CAST(2*df + 1 AS DOUBLE)) * 1.0e6 + 0.5e0) AS BIGINT)"))
      .withColumn("contrib_u", expr(
        "idf_u * (22 * tf * sum_dl)" +
          " DIV (10 * tf * sum_dl + 3 * sum_dl + 9 * dl * n_docs)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"),
        sum("contrib_u").as("score_u"))
  }

  /** DuckDB twin of [[bm25]] — same exact-rational tf factor, same
    * t14-style micro-unit idf.
    */
  def bm25Sql(terms: Seq[String] = Bm25GateTerms): String = {
    implicit val d: Dialect = DuckD
    // SQL-literal escape so a term containing a quote produces the
    // same IN-list semantics as the Spark twin's isin
    val inList = terms.map(t => s"'${t.replace("'", "''")}'")
      .mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, text,
       |         CAST(${listSize(tokens("text"))} AS BIGINT) AS dl
       |  FROM documents),
       |totals AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                  CAST(sum(dl) AS BIGINT) AS sum_dl FROM tok),
       |hits AS (
       |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, dl, unnest(${tokens("text")}) AS term
       |        FROM tok)
       |  WHERE term IN ($inList)
       |  GROUP BY 1, 2, 3),
       |dft AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT)
       |               AS df
       |        FROM hits GROUP BY 1),
       |scored AS (
       |  SELECT h.doc_id,
       |         CAST(floor(ln(1.0e0
       |             + CAST(2*(g.n_docs - d.df) + 1 AS DOUBLE)
       |             / CAST(2*d.df + 1 AS DOUBLE)) * 1.0e6 + 0.5e0)
       |           AS BIGINT)
       |         * (22 * h.tf * g.sum_dl)
       |         // (10 * h.tf * g.sum_dl + 3 * g.sum_dl
       |            + 9 * h.dl * g.n_docs) AS contrib_u
       |  FROM hits h JOIN dft d USING (term) CROSS JOIN totals g)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
       |       CAST(sum(contrib_u) AS BIGINT) AS score_u
       |FROM scored GROUP BY 1""".stripMargin
  }

  /** Temperature-based corpus mixing — the sampling-weight math of
    * multilingual/multi-source training runs (`w_i ∝ n_i^α`,
    * α = 1/2^halvings): per (lang, source), the α-scaled token mass,
    * its share of the budget, and the implied epochs over the
    * source's own tokens (epochs > 1 ⇒ the source repeats; the
    * up-weighting temperature mixing exists to quantify).
    *
    * α is restricted to 1/2^h so the power is an ITERATED INTEGER
    * SQUARE ROOT (`floor(sqrt(·))` composed h times equals
    * `floor(n^(1/2^h))`), keeping every emitted column exact BIGINT
    * arithmetic — no cross-engine pow/rounding seam. Exactness bound:
    * `floor(sqrt(double(n)))` is the true isqrt for n < 2^52 (a 100 TB
    * corpus is ~2^45 tokens).
    *
    * Scale: one map-side-combined corpus aggregate to the
    * (lang, source) grain; everything after (the share window) runs on
    * the MODEL-sized group table — the single-partition window is over
    * tens of rows, never the corpus.
    */
  def mixTemperature(docs: DataFrame, budgetTokens: Long = 4000000L,
                     halvings: Int = 1): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0")
    require(halvings >= 0 && halvings <= 4,
      s"halvings must be in [0, 4], got $halvings")
    def isqrt(e: String, h: Int): String =
      if (h == 0) e
      else isqrt(s"CAST(floor(sqrt(CAST($e AS DOUBLE))) AS BIGINT)",
        h - 1)
    // coalesce: a group whose every text is NULL sums to NULL — carry
    // it as 0 tokens so s_total and the shares stay exact BIGINTs
    val grouped = docs
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(expr(listSize(tokens("text"))).cast("long")),
          lit(0L)).as("n_tokens"))
      .withColumn("s_alpha", expr(isqrt("n_tokens", halvings)))
    // the grand total over the (lang, source) aggregate — model-sized
    // by construction — as one broadcast 1-row cross join instead of a
    // degenerate global window (which Catalyst folds to a
    // WARN-per-execution single-partition WindowExec)
    val total = grouped.agg(sum("s_alpha").as("s_total"))
    grouped
      .crossJoin(broadcast(total))
      // a fully empty corpus (every group 0 tokens) makes s_total 0;
      // guard the shares to 0 rather than diverge (Spark's non-ANSI
      // DIV would yield NULL where DuckDB's // raises)
      .withColumn("weight_ppm", expr(
        "CASE WHEN s_total = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE s_alpha * 1000000 DIV s_total END"))
      .withColumn("alloc_tokens", expr(
        "CASE WHEN s_total = 0 THEN CAST(0 AS BIGINT) " +
          s"ELSE $budgetTokens * s_alpha DIV s_total END"))
      .withColumn("epochs_ppm", expr(
        "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE alloc_tokens * 1000000 DIV n_tokens END"))
      .select("lang", "source", "n_docs", "n_tokens", "s_alpha",
        "weight_ppm", "alloc_tokens", "epochs_ppm")
  }

  /** DuckDB twin of [[mixTemperature]]. */
  def mixTemperatureSql(budgetTokens: Long = 4000000L,
                        halvings: Int = 1): String = {
    implicit val d: Dialect = DuckD
    def isqrt(e: String, h: Int): String =
      if (h == 0) e
      else isqrt(s"CAST(floor(sqrt(CAST($e AS DOUBLE))) AS BIGINT)",
        h - 1)
    s"""WITH grouped AS (
       |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(coalesce(sum(${listSize(tokens("text"))}), 0)
       |              AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1, 2),
       |s AS (SELECT *, ${isqrt("n_tokens", halvings)} AS s_alpha
       |      FROM grouped),
       |t AS (SELECT *, CAST(sum(s_alpha) OVER () AS BIGINT)
       |                  AS s_total FROM s)
       |SELECT lang, source, n_docs, n_tokens, s_alpha,
       |       CASE WHEN s_total = 0 THEN CAST(0 AS BIGINT)
       |            ELSE s_alpha * 1000000 // s_total END AS weight_ppm,
       |       CASE WHEN s_total = 0 THEN CAST(0 AS BIGINT)
       |            ELSE $budgetTokens * s_alpha // s_total
       |       END AS alloc_tokens,
       |       CASE WHEN n_tokens = 0 OR s_total = 0
       |            THEN CAST(0 AS BIGINT)
       |            ELSE ($budgetTokens * s_alpha // s_total) * 1000000
       |                 // n_tokens END AS epochs_ppm
       |FROM t""".stripMargin
  }

  def rollingHash(text: String, window: Int = 16): Array[Long] = {
    val P = 1000000007L
    val B = 257L
    val bytes = text.getBytes("UTF-8").map(b => (b & 0xff).toLong)
    if (bytes.length < window) {
      if (bytes.isEmpty) return Array(0L)
      return Array(bytes.foldLeft(0L)((acc, x) => (acc * B + x) % P))
    }
    var bw = 1L
    (1 until window).foreach(_ => bw = bw * B % P)
    val out = new Array[Long](bytes.length - window + 1)
    var h = 0L
    bytes.take(window).foreach(x => h = (h * B + x) % P)
    out(0) = h
    var i = window
    while (i < bytes.length) {
      h = (h + P * B - bytes(i - window) * bw % P) % P
      h = (h * B + bytes(i)) % P
      out(i - window + 1) = h
      i += 1
    }
    out
  }
}
