package graft.llm

import graft.llm.TextExprs._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the operations a
  * large-scale training-data pipeline runs before anything else.
  *
  * Scale shapes:
  *  - exact dedup: one hash aggregate on md5(text) — map-side combine
  *    means the shuffle carries one row per distinct hash per task;
  *  - MinHash+LSH: signatures are row-local array expressions (no
  *    shuffle); the only wide ops are the band-bucket self-join (shuffle
  *    keyed on (band_idx, band_hash), tiny because bucket collisions are
  *    rare) and the final distinct;
  *  - SimHash: explode→aggregate, one shuffle on doc_id, carrying 32
  *    small integer partial sums per doc;
  *  - n-gram Jaccard: shingle-set join restricted to (lang, source)
  *    buckets to bound the candidate space;
  *  - embedding near-dup: label-bucketed pair join (in production the
  *    bucket key would be an LSH/IVF cell, same shape).
  */
object Dedup {

  private implicit val d: Dialect = SparkD

  val NumPerms = 16
  val NumBands = 4
  val RowsPerBand: Int = NumPerms / NumBands

  /** Sentinel for `hotBucketCap`: derive the cap from the corpus size
    * in-plan as `greatest(MinDerivedCap, ceil(sqrt(n_docs)))` — the
    * PRODUCTION default. A constant-fraction duplicate class (cookie
    * banners at α·n docs) exceeds √n for any α at scale, so the
    * quadratic bucket is always excluded at 100 TB, while small-corpus
    * behaviour stays effectively uncapped through the floor. Pass 0 to
    * disable the guard EXPLICITLY (the d11/m5 stress gates do, to keep
    * measuring the unguarded shape), or a positive constant for a
    * fixed cap (q_d14 pins 64).
    */
  val DerivedCap: Int = -1

  /** Floor of the derived cap — below this corpus size the guard is
    * inert, so tiny test corpora see the uncapped candidate set.
    */
  val MinDerivedCap: Int = 64

  /** Exact dedup: group on md5(text); keep the smallest doc_id
    * (deterministic canonical representative).
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .groupBy("text_hash")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_dups"))

  /** (doc_id, hs): the hashed word-3-shingle list per document — the
    * shared input of the MinHash, candidate, and verify stages. Hashing
    * (md5 per shingle) dominates, so multi-consumer pipelines
    * materialise this frame ONCE via a plan-private LAZY
    * `localCheckpoint` — deliberately never `.cache()`: a cache
    * registers in the session CacheManager, silently substitutes into
    * every later query whose plan contains the subtree, and pins a
    * corpus-scale frame in MEMORY_AND_DISK that no plan declares. The
    * lazy checkpoint materialises on first execution, is private to
    * the consuming plan, and its blocks are reclaimed when the frame
    * becomes unreachable.
    */
  def hashedShingles(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(tokens("text")))
      .withColumn("shingles", expr(shingles("text", "toks")))
      .withColumn("hs", expr(hashList("shingles")))
      .select("doc_id", "hs")

  /** MinHash signatures: 16 permutation minima over word 3-shingles, plus
    * 4 banded bucket hashes. All row-local array expressions.
    */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashSignaturesFromHs(hashedShingles(docs))

  /** Signatures from a pre-hashed (doc_id, hs) frame. One batched
    * withColumns per dependency level (not 20 chained withColumn
    * calls, each re-analyzing the whole plan).
    */
  def minhashSignaturesFromHs(base: DataFrame): DataFrame = {
    val withMh = base.withColumns((0 until NumPerms).map(j =>
      s"mh$j" -> expr(listMin(listTransform("hs",
        h => permute(h, j))))).toMap)
    val withBands = withMh.withColumns((0 until NumBands).map { b =>
      val h = (0 until RowsPerBand)
        .map(r => s"mh${b * RowsPerBand + r}")
        .reduce((acc, m) => s"(($acc) * 31 + $m)")
      s"band$b" -> expr(h)
    }.toMap)
    val cols = Seq("doc_id") ++ (0 until NumPerms).map(j => s"mh$j") ++
      (0 until NumBands).map(b => s"band$b")
    withBands.select(cols.head, cols.tail: _*)
  }

  /** LSH candidate pairs: docs sharing any band bucket, scored by the
    * fraction of equal minhash components (the unbiased Jaccard
    * estimate).
    *
    * `hotBucketCap` ([[DerivedCap]] = derive from corpus size, the
    * PRODUCTION default; 0 = explicitly off; >0 = fixed) is the
    * skew guard: a band bucket holding more than the cap docs is
    * EXCLUDED from pair generation. A bucket of size m contributes
    * C(m, 2) pairs — a boilerplate class that is a constant FRACTION
    * of the corpus makes the pair count QUADRATIC in corpus size
    * (measured: q_d11's stamped corpus runs 52× at 10× data,
    * SCALE.md round-18), and at 100 TB that one bucket IS the job.
    * Over-cap buckets are by definition near-identical text en
    * masse — the boilerplate CENSUS ([[boilerplate]], q_d7) is
    * the right operator for them, at linear cost; the cap routes
    * them there instead of paying C(m, 2). The cap check is a
    * map-side-combined count on the SAME key as the pair join — the
    * hot bucket's pairs are never materialised anywhere; the derived
    * threshold adds only a broadcast of the 1-row corpus count.
    */
  def lshCandidates(docs: DataFrame,
                    hotBucketCap: Int = DerivedCap): DataFrame =
    lshCandidatesFromSig(
      minhashSignatures(docs).localCheckpoint(eager = false),
      hotBucketCap)

  /** Candidates + estimated jaccard from a signature frame the caller
    * has already bounded for multi-consumption (this plan reads it six
    * ways: four band projections, both pair sides) — pass a lazily
    * localCheckpoint'ed frame, not a cached one (see
    * [[hashedShingles]]).
    */
  def lshCandidatesFromSig(sig: DataFrame,
                           hotBucketCap: Int = DerivedCap): DataFrame = {
    // any OTHER negative would silently enable the derived cap under
    // the pre-r19 "<= 0 means off" contract — fail loudly instead
    require(hotBucketCap >= 0 || hotBucketCap == DerivedCap,
      s"hotBucketCap must be >= 0 (0 = explicitly off) or " +
        s"Dedup.DerivedCap ($DerivedCap); got $hotBucketCap")
    val allBands = (0 until NumBands).map { b =>
      sig.select(col("doc_id"), lit(b).as("band_idx"),
        col(s"band$b").as("band_hash"))
    }.reduce(_ unionAll _)
    val bands =
      if (hotBucketCap == 0) allBands
      else {
        val sizes = allBands.groupBy("band_idx", "band_hash")
          .agg(count(lit(1)).as("__bucket_n"))
        val capped =
          if (hotBucketCap > 0)
            sizes.where(col("__bucket_n") <= hotBucketCap)
          else
            // derived cap: one 1-row broadcast of the corpus count;
            // ceil(sqrt(n)) is IEEE-exact on both engines, so the
            // DuckDB twin ties bit-for-bit
            sizes.crossJoin(broadcast(
                sig.select(count(lit(1)).as("__n_docs"))))
              .where(col("__bucket_n") <= greatest(
                lit(MinDerivedCap.toLong),
                ceil(sqrt(col("__n_docs")))))
        allBands.join(capped.select("band_idx", "band_hash"),
          Seq("band_idx", "band_hash"))
      }
    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
    val s1 = sig.select(col("doc_id").as("doc1") +:
      (0 until NumPerms).map(j => col(s"mh$j").as(s"a$j")): _*)
    val s2 = sig.select(col("doc_id").as("doc2") +:
      (0 until NumPerms).map(j => col(s"mh$j").as(s"b$j")): _*)
    val matches = (0 until NumPerms)
      .map(j => when(col(s"a$j") === col(s"b$j"), 1).otherwise(0))
      .reduce(_ + _)
    pairs.join(s1, "doc1").join(s2, "doc2")
      .withColumn("est_jaccard",
        matches.cast("double") / NumPerms.toDouble)
      .select("doc1", "doc2", "est_jaccard")
  }

  /** MinHash estimator accuracy: for every LSH candidate pair, the
    * 16-permutation match-count estimate next to the EXACT shingle
    * Jaccard it estimates — the quality number the MinHash sketch is
    * FOR (q_d2 proves the signatures reproduce; this gate grades them
    * as an estimator, exactly as q_sim8 grades the ANN indexes as
    * approximations). Emitted in order-free integers so the gate hashes
    * bit-for-bit: `est_uq`/`jac_uq` are micro-unit fractions
    * (n_matches·62500 and the half-up integer division
    * (2e6·n_common + n_union) DIV (2·n_union)), `err_uq` their
    * absolute gap.
    *
    * Scale: candidate pairs only (never all-pairs); the exact-verify
    * joins are the q_d4 shapes over the same lazily-checkpointed
    * shingle frame; output is candidate-sized.
    */
  def minhashAccuracy(docs: DataFrame,
                      hotBucketCap: Int = DerivedCap): DataFrame = {
    val hs = hashedShingles(docs).localCheckpoint(eager = false)
    val sig = minhashSignaturesFromHs(hs).localCheckpoint(eager = false)
    // est_jaccard = n_matches/16 is dyadic, so the ×16 round-trip is
    // exact — no float error re-deriving the integer match count
    val est = lshCandidatesFromSig(sig, hotBucketCap)
      .withColumn("n_matches",
        round(col("est_jaccard") * NumPerms).cast("long"))
      .select("doc1", "doc2", "n_matches")
    val sh = Corpus.explodeNoInfer(hs, col("hs"), "sh", col("doc_id"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = est.select("doc1", "doc2")
      .join(sh.select(col("doc_id").as("doc1"), col("sh")), Seq("doc1"))
      .join(sh.select(col("doc_id").as("doc2"), col("sh")),
        Seq("doc2", "sh"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("n_common"))
    est
      .join(inter, Seq("doc1", "doc2"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .join(sizes.select(col("doc_id").as("doc1"), col("n_sh").as("n1")),
        "doc1")
      .join(sizes.select(col("doc_id").as("doc2"), col("n_sh").as("n2")),
        "doc2")
      .withColumn("n_union", col("n1") + col("n2") - col("n_common"))
      .withColumn("est_uq", col("n_matches") * lit(1000000L / NumPerms))
      .withColumn("jac_uq", expr(
        "(2000000L * n_common + n_union) DIV (2L * n_union)"))
      .withColumn("err_uq", abs(col("est_uq") - col("jac_uq")))
      .select("doc1", "doc2", "n_matches", "n_common", "n_union",
        "est_uq", "jac_uq", "err_uq")
  }

  /** The boilerplate sentence [[skewBoilerplate]] stamps — tokenises
    * into 13 words (11 distinct 3-shingles), so the stamped docs get
    * identical MinHash signatures and land in ONE band bucket.
    */
  val BoilerplateText: String =
    "subscribe to our newsletter for the latest updates and offers " +
      "from our site"

  /** Deterministic skew-stress derivation: every `every`-th document's
    * text becomes the same boilerplate sentence, so one LSH band
    * bucket holds n/every docs (C(n/every, 2) candidate pairs) while
    * every other bucket stays sparse — the exact hot-bucket shape a
    * real corpus's boilerplate (cookie banners, license headers)
    * produces at 100 TB. Used by the q_d11 gate to pin the dedup
    * family's behaviour under skew, and by the AQE skew-join spec
    * (the hot bucket becomes one oversized shuffle partition that
    * OptimizeSkewedJoin must split WITHOUT changing the answer).
    */
  def skewBoilerplate(docs: DataFrame, every: Int = 5): DataFrame = {
    require(every >= 2, s"every must be >= 2, got $every")
    docs.withColumn("text",
      when(col("doc_id") % every === 0, lit(BoilerplateText))
        .otherwise(col("text")))
  }

  /** 32-bit SimHash over whitespace tokens (per-occurrence weighting):
    * bit b set iff the sum of ±1 votes from token-hash bit b is positive.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = Corpus.explodeNoInfer(docs, expr(tokens("text")),
        "tok", col("doc_id"))
      .withColumn("m5", expr("md5(tok)"))
      .withColumn("h", expr(hex8FromMd5("m5")))
    val bitSums = (0 until 32).map { b =>
      sum(expr(s"CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END"))
        .as(s"s$b")
    }
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 32)
      .map(b => s"(CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT)" +
        " ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    agg.withColumn("simhash", expr(sh)).select("doc_id", "simhash")
  }

  /** Exact n-gram Jaccard verification of the LSH candidate pairs — the
    * textbook two-stage near-dup pipeline (cheap recall stage, exact
    * verify stage touches only candidate pairs, never n²).
    */
  def ngramJaccardCandidates(docs: DataFrame,
                             hotBucketCap: Int = DerivedCap): DataFrame = {
    val hs = hashedShingles(docs).localCheckpoint(eager = false)
    val sh = Corpus.explodeNoInfer(hs, col("hs"), "sh", col("doc_id"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = lshCandidatesFromSig(
      minhashSignaturesFromHs(hs).localCheckpoint(eager = false),
      hotBucketCap)
      .select("doc1", "doc2")
    val inter = pairs
      .join(sh.select(col("doc_id").as("doc1"), col("sh")), Seq("doc1"))
      .join(sh.select(col("doc_id").as("doc2"), col("sh")),
        Seq("doc2", "sh"))
      .groupBy("doc1", "doc2")
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(inter, Seq("doc1", "doc2"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .join(sizes.select(col("doc_id").as("doc1"), col("n_sh").as("n1")),
        "doc1")
      .join(sizes.select(col("doc_id").as("doc2"), col("n_sh").as("n2")),
        "doc2")
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n1") + col("n2") - col("n_common")).cast("double"))
      .select("doc1", "doc2", "n_common", "jaccard")
  }

  /** Exact n-gram (word 3-shingle) Jaccard for pairs inside the same
    * (lang, source) bucket — the exhaustive variant for bounded buckets.
    */
  def ngramJaccard(docs: DataFrame, minJaccard: Double = 0.1): DataFrame = {
    // join on the 32-bit shingle hash, not the string: integer join keys
    // shuffle a fraction of the bytes and compare in one instruction.
    // Collisions are identical on the oracle side (same hash), so results
    // still match bit-for-bit.
    // materialise the token array BEFORE the shingle lambda: the
    // builders inline their argument textually, and interpreted
    // higher-order lambdas have no subexpression elimination — an
    // inlined split() re-tokenises the document per element (O(n²))
    val sh = Corpus.explodeNoInfer(
      docs.withColumn("toks", expr(tokens("text"))),
      expr(hashList(shingles("text", "toks"))), "sh",
      col("doc_id"), col("lang"), col("source"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.source") === col("b.source") &&
          col("a.sh") === col("b.sh") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("doc_id").as("doc1"), col("n_sh").as("n1")),
        "doc1")
      .join(sizes.select(col("doc_id").as("doc2"), col("n_sh").as("n2")),
        "doc2")
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n1") + col("n2") - col("n_common")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("doc1", "doc2", "n_common", "jaccard")
  }

  /** Cross-document boilerplate detection: word 3-shingles appearing in
    * at least `minDocs` DISTINCT documents, with document and occurrence
    * counts — the shared-substring census behind "strip the cookie
    * banner / nav bar from every page of this site" cleanup rules.
    *
    * Shape: one explode + one hash aggregate (count + count-distinct
    * partial-aggregate map-side); the output is vocabulary-sized, never
    * corpus-sized. At 100 TB the same plan holds — the aggregate keys
    * on the shingle string, so hot shingles partial-aggregate before
    * the shuffle.
    */
  def boilerplate(docs: DataFrame, minDocs: Int = 5): DataFrame =
    Corpus.explodeNoInfer(
      docs.withColumn("toks", expr(tokens("text"))),
      expr(shingles("text", "toks")), "shingle", col("doc_id"))
      .groupBy("shingle")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .where(col("n_docs") >= minDocs)

  /** Connected components over a symmetric `(a, b)` edge frame by
    * min-label propagation iterated TO CONVERGENCE (no label changed),
    * with a safety bound. Labels only decrease and spread one hop per
    * round, so the fixpoint is the exact per-component minimum id —
    * a fixed iteration count (the old `iters = 4`) silently under-merges
    * any duplicate chain longer than its horizon.
    *
    * Scale: each iteration is one join + hash aggregate keyed on doc_id
    * — the standard large-graph CC shape; `localCheckpoint` truncates
    * lineage so the plan doesn't double per round, and the convergence
    * probe is an `isEmpty` (limit-1) on the already-materialised step.
    */
  def connectedComponents(edgesIn: DataFrame,
                          maxIters: Int = 100): DataFrame = {
    // r22 exchange elision (guide §2.4 "two operations keyed the same
    // way can share one exchange"): the edge set is STATIC across
    // rounds yet the old loop re-shuffled it by `b` every round, and
    // the label join re-shuffled labels by `doc_id` right after the
    // aggregate had already produced that partitioning. Pinning both
    // checkpoints to an explicit hash partitioning (localCheckpoint
    // preserves outputPartitioning through LogicalRDD; explicit
    // numPartitions keeps AQE from coalescing one side out of
    // alignment) makes every round's joins co-partitioned: the only
    // per-round corpus-scale exchange left is the neighbor-min
    // aggregate itself. Labels are vertex-sized, so broadcasting them
    // instead would NOT scale — co-partitioning is the 100 TB shape.
    val nPart = edgesIn.sparkSession.sessionState.conf.numShufflePartitions
    val edges = edgesIn.select("a", "b")
      .repartition(nPart, col("b")).localCheckpoint(true)
    val vertices = edges.select(col("a").as("doc_id")).distinct()
    var labels = vertices.withColumn("lab", col("doc_id"))
      .repartition(nPart, col("doc_id")).localCheckpoint(true)
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val neighborMin = edges
        .join(labels.select(col("doc_id").as("b"),
          col("lab").as("nlab")), Seq("b"))
        .groupBy(col("a").as("doc_id"))
        .agg(min("nlab").as("minn"))
      val stepped = labels.join(neighborMin, Seq("doc_id"), "left")
        .withColumn("lab2", least(col("lab"),
          coalesce(col("minn"), col("lab"))))
        .select("doc_id", "lab", "lab2")
        .localCheckpoint(true)
      converged = stepped.where(col("lab2") < col("lab")).isEmpty
      labels = stepped.select(col("doc_id"), col("lab2").as("lab"))
      it += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents hit maxIters=$maxIters before " +
          "convergence — labels are UNDER-MERGED (graph diameter " +
          "exceeds the bound); raise maxIters")
    labels
  }

  /** Duplicate clusters: exact connected components over the LSH
    * candidate graph (the DuckDB twin is a recursive-CTE transitive
    * closure — both sides compute the true per-component minimum id).
    *
    * Inherits the [[lshCandidates]] hot-bucket guard with the same
    * derived production default: without it, a constant-fraction
    * boilerplate class makes THIS composed step quadratic at scale
    * (the exact shape SCALE.md round-18 measured) — and the
    * over-cap class it excludes is exact-duplicate-grade text that
    * [[exact]] dedup already collapses linearly, so the composed
    * pipelines lose nothing by routing it there.
    */
  def duplicateClusters(docs: DataFrame,
                        maxIters: Int = 100,
                        hotBucketCap: Int = DerivedCap): DataFrame = {
    val pairs = lshCandidates(docs, hotBucketCap).select("doc1", "doc2")
      .localCheckpoint(true)
    val edges = pairs.select(col("doc1").as("a"), col("doc2").as("b"))
      .unionAll(pairs.select(col("doc2").as("a"), col("doc1").as("b")))
    connectedComponents(edges, maxIters)
      .withColumnRenamed("lab", "cluster_id")
  }

  /** Default expected LSH cell size for [[embeddingNearDup]]'s derived
    * plane count: with n ≤ targetCell·2^NumPlanes the derivation picks
    * the minimum 8 planes; beyond that the plane count grows with the
    * corpus so cell size — and therefore per-row join fan-out — stays
    * constant.
    */
  val DefaultTargetCell = 128

  /** Embedding near-duplicates: cosine similarity above `thr` for pairs
    * sharing a sign-projection LSH bucket, with the plane count DERIVED
    * from the corpus size in-plan.
    *
    * Scale shape (the round-19 `weak` fix): a FIXED plane count makes
    * the expected cell size n/2^planes — linear in n — so the
    * same-bucket self-join materialises Θ(n²/2^planes) pairs: the
    * pair-generating-join class SCALE.md round-18 measured as fatal.
    * Two guards close it, both derived in-plan from one 1-row
    * broadcast corpus count (the [[DerivedCap]] lockstep pattern, twin
    * identical):
    *
    *  1. the effective bucket is `fullBucket % 2^p` where the
    *     [[Similarity.MaxPlanes]]-bit `fullBucket` is row-local and
    *     p = [[Similarity.derivedModulusSql]](n, targetCell) — so the
    *     expected cell stays ≤ targetCell and the join is
    *     Θ(n·targetCell), linear;
    *  2. the derived hot-bucket cap (greatest(64, ceil(√n))) excludes
    *     skew cells that geometry alone can't bound — a mass-duplicate
    *     embedding class (one vector repeated α·n times) lands in ONE
    *     cell regardless of plane count; those are exact-dup-grade and
    *     route to [[exact]]/census linearly, same rationale as
    *     [[lshCandidates]].
    *
    * Recall is the LSH recall (only same-bucket pairs compared); more
    * planes lower per-pair recall exactly as a production multi-table
    * LSH expects — [[Similarity.lshMultiTopK]] is the
    * recall-recovery path.
    */
  def embeddingNearDup(emb: DataFrame, thr: Double,
                       targetCell: Int = DefaultTargetCell,
                       hotBucketCap: Int = DerivedCap): DataFrame = {
    require(hotBucketCap >= 0 || hotBucketCap == DerivedCap,
      s"hotBucketCap must be >= 0 (0 = explicitly off) or " +
        s"Dedup.DerivedCap ($DerivedCap); got $hotBucketCap")
    import graft.llm.TextExprs.SparkD
    graft.functions.FloatVecDot.register(emb.sparkSession)
    graft.functions.SignBucketWide.register(emb.sparkSession)
    val nVec = emb.select(count(lit(1)).as("__n_vec"))
    // the MaxPlanes-bit bucket is the expensive row-local stage: the
    // codegen'd SignBucketWide fuses the 24 × dim fold into one Java
    // loop (the SQL HOF form runs 1536 interpreted lambda calls per
    // row — spec-pinned bit-identical); the frame feeds sizes + both
    // join sides → one lazy plan-private localCheckpoint (never
    // .cache(); see hashedShingles)
    val withB = emb
      .withColumn("__fb", expr(
        s"sign_bucket_wide(embedding, ${Similarity.MaxPlanes})"))
      .withColumn("nrm", expr(Similarity.normSql("embedding")(SparkD)))
      .crossJoin(broadcast(nVec))
      .withColumn("bucket", col("__fb") % expr(
        Similarity.derivedModulusSql("__n_vec", targetCell)))
      .select("vec_id", "embedding", "nrm", "bucket", "__n_vec")
      .localCheckpoint(eager = false)
    val kept =
      if (hotBucketCap == 0) withB
      else {
        val sizes = withB.groupBy("bucket")
          .agg(count(lit(1)).as("__bucket_n"),
            max("__n_vec").as("__n"))
        val thrCol =
          if (hotBucketCap > 0) lit(hotBucketCap.toLong)
          else greatest(lit(MinDerivedCap.toLong),
            ceil(sqrt(col("__n"))))
        withB.join(
          sizes.where(col("__bucket_n") <= thrCol).select("bucket"),
          Seq("bucket"))
      }
    val e1 = kept.select(col("vec_id").as("id1"), col("bucket"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val e2 = kept.select(col("vec_id").as("id2"), col("bucket"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    e1.join(e2, Seq("bucket"))
      .where(col("id1") < col("id2"))
      .withColumn("cos", expr(Similarity.dotSql("e1", "e2")(SparkD))
        / (col("n1") * col("n2")))
      .where(col("cos") > thr)
      .select(col("bucket"), col("id1"), col("id2"),
        round(col("cos"), 6).as("cos_sim"))
  }

  // ---- Bloom-filter dedup (incremental-ingest screening) -------------

  /** Gate sizing for q_d13: DELIBERATELY undersized (2048 bits for a
    * ~500-doc corpus, ~60% fill) so the sequential replay PRODUCES
    * false positives at sf0.01 and the gate proves they are detected
    * and labelled — an oversized filter would make `false_positive`
    * a constant-false column and grade nothing. Production sizing is
    * the [[bloomSeqDedup]] default (2^20 bits and up; m grows with
    * the ingested-corpus cardinality, k ≈ m/n · ln 2).
    */
  val GateBloomBits = 2048
  val GateBloomHashes = 4

  /** The `kHashes` distinct bit positions in `[0, mBits)` for a `text`
    * column — `hex8(md5(text + '#i')) % m`, shared between the Spark
    * plan and the DuckDB twin via the dialect builders so both engines
    * hash bit-for-bit identically. Row-local; duplicates collapse so
    * the position list IS the document's bit set.
    */
  private[graft] def bloomPositions(mBits: Int, kHashes: Int)
                                   (implicit d: Dialect): String = {
    val ps = (0 until kHashes).map { i =>
      s"(${hex8FromMd5(s"md5(concat(text, '#$i'))")} % $mBits)"
    }
    d match {
      case SparkD => s"array_distinct(array(${ps.mkString(", ")}))"
      case DuckD  => s"list_distinct([${ps.mkString(", ")}])"
    }
  }

  /** Bloom-filter dedup as a deterministic SEQUENTIAL-INGEST REPLAY:
    * documents enter the filter in `doc_id` order, every document sets
    * its `kHashes` bits, and a document is `bloom_dup` iff EVERY one of
    * its bits was already set by a strictly earlier document — exactly
    * what a single-pass Bloom dedup (the Dolma/CCNet paragraph-screen
    * shape) would decide, re-expressed order-free so the whole thing is
    * one declarative plan: "bit b set before doc d" ⟺
    * `min(setter doc_id over b) < d`. The gate also carries the exact
    * ground truth (`exact_dup` = an identical text occurred earlier),
    * so `false_positive` rows ARE the filter's collision cost, graded
    * row-by-row — Bloom never false-negatives (identical text ⇒
    * identical bits ⇒ every bit set by the earlier copy), which the
    * spec pins as `exact_dup ⇒ bloom_dup`.
    *
    * 100 TB shape: position derivation is row-local; the first-setter
    * dim aggregates to ≤ `mBits` rows (MODEL-sized — map-side combined,
    * a viral duplicate collapses per task) and broadcasts back over the
    * corpus-scale probe side; the per-doc verdict is a k-row-per-doc
    * map-side-combined aggregate. The only corpus-scale exchange beyond
    * those partial aggs is the `exact_dup` ground-truth dim (the d1
    * shape) — the GRADER's column, not the operator's: the serving path
    * ([[bloomModel]] + [[bloomProbeWith]]) is zero-shuffle.
    */
  def bloomSeqDedup(docs: DataFrame, mBits: Int = 1 << 20,
                    kHashes: Int = 4): DataFrame = {
    require(mBits >= 64, s"mBits must be >= 64, got $mBits")
    require(kHashes >= 1 && kHashes <= 16,
      s"kHashes must be in [1, 16], got $kHashes")
    // multi-consumed (occ twice, the final join, the text dim) — lazy
    // plan-private localCheckpoint, never .cache() (see hashedShingles)
    val base = docs.select(col("doc_id"),
      md5(col("text")).as("text_hash"),
      expr(bloomPositions(mBits, kHashes)).as("pos"))
      .localCheckpoint(eager = false)
    val occ = Corpus.explodeNoInfer(base, col("pos"), "p", col("doc_id"))
    val firstSet = occ.groupBy("p").agg(min("doc_id").as("first_doc"))
    val hits = occ.join(broadcast(firstSet), Seq("p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bits"),
        sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L))
          .as("n_prior_bits"))
    val firstText = base.groupBy("text_hash")
      .agg(min("doc_id").as("first_text_doc"))
    base.select("doc_id", "text_hash")
      .join(hits, Seq("doc_id"))
      .join(firstText, Seq("text_hash"))
      .withColumn("bloom_dup", col("n_prior_bits") === col("n_bits"))
      .withColumn("exact_dup", col("first_text_doc") < col("doc_id"))
      .withColumn("false_positive",
        col("bloom_dup") && !col("exact_dup"))
      .select("doc_id", "n_bits", "n_prior_bits", "bloom_dup",
        "exact_dup", "false_positive")
  }

  /** The serving artifact: `mBits` of filter state as packed 64-bit
    * words — fixed-size MODEL state (m/8 bytes regardless of corpus
    * size), the thing a 100 TB pipeline persists between ingest epochs
    * and ships to every executor.
    */
  final case class BloomModel(mBits: Int, kHashes: Int,
                              words: Array[Long]) {
    def bitsSet: Int = words.map(java.lang.Long.bitCount).sum
    /** Measured fill fraction — FPR ≈ fill^k. */
    def fill: Double = bitsSet.toDouble / mBits
  }

  /** Build the filter from the already-ingested corpus: the distinct
    * set-bit positions aggregate to ≤ `mBits` rows (model-sized — the
    * ONE bounded collect, same class as ANN centroids), folded into
    * the packed bitmap driver-side.
    */
  def bloomModel(build: DataFrame, mBits: Int = 1 << 20,
                 kHashes: Int = 4): BloomModel = {
    require(mBits >= 64 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    require(kHashes >= 1 && kHashes <= 16,
      s"kHashes must be in [1, 16], got $kHashes")
    val pos = build
      .select(explode(expr(bloomPositions(mBits, kHashes))).as("p"))
      .distinct()
      .collect().map(_.getLong(0).toInt)
    val words = new Array[Long](mBits / 64)
    pos.foreach(p => words(p >>> 6) |= 1L << (p & 63))
    BloomModel(mBits, kHashes, words)
  }

  /** Probe a document frame against a prebuilt filter: k bit tests per
    * row against the bitmap literal — a PURE PROJECTION, zero
    * exchanges, zero joins; the shape that screens a new crawl against
    * the existing corpus at ingest rate. `maybe_seen` has no false
    * negatives (spec-pinned against exact membership); positives carry
    * the filter's FPR ≈ fill^k.
    */
  def bloomProbeWith(probe: DataFrame, model: BloomModel): DataFrame =
    probe
      .withColumn("bw", typedLit(model.words))
      .withColumn("pos",
        expr(bloomPositions(model.mBits, model.kHashes)))
      .withColumn("n_hits", expr(
        "aggregate(pos, 0, (acc, p) -> acc + CAST(" +
          "(shiftright(element_at(bw, CAST(p DIV 64 AS INT) + 1), " +
          "CAST(p % 64 AS INT)) & 1) AS INT))"))
      .withColumn("maybe_seen", col("n_hits") === size(col("pos")))
      .select("doc_id", "n_hits", "maybe_seen")
}
