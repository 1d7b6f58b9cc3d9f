package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming twins of the corpus-preparation front door
  * (graft.llm.Corpus): as documents arrive they are context-chunked
  * and screened against a STATIC benchmark probe set. Both operators
  * are stateless row-local maps, so the streaming plan is the batch
  * plan applied micro-batch by micro-batch — no state store, no
  * watermark, nothing to bound. The probe set is computed once from
  * the static benchmark corpus (benchmarks do not stream) and enters
  * the query as a broadcast-sized literal, exactly as in batch.
  */
object CorpusStream {

  private[streaming] def docStream(spark: SparkSession,
                                   dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema).parquet(s"$dir/documents.*")
  }

  /** Streaming [[graft.llm.Corpus.chunkWindows]]. */
  def chunkStream(spark: SparkSession, dir: String,
                  win: Int = 64, stride: Int = 48): DataFrame =
    graft.llm.Corpus.chunkWindows(docStream(spark, dir), win, stride)

  /** Streaming Gopher-class quality filter: the rule set is pure
    * integer row-local arithmetic ([[graft.llm.TextAnalysis
    * .gopherFilter]]), so the streaming plan is again the batch plan
    * per micro-batch — documents can be filtered at ingest with no
    * state at all.
    */
  def gopherStream(spark: SparkSession, dir: String): DataFrame =
    graft.llm.TextAnalysis.gopherFilter(docStream(spark, dir))

  def gopherOnce(spark: SparkSession, dir: String): DataFrame =
    StreamDrain.runOnce(gopherStream(spark, dir), "corpus_gopher_stream")

  /** Streaming contamination screen: probe hashes from the static
    * corpus, row-local screen over the stream.
    */
  def screenStream(spark: SparkSession, dir: String): DataFrame = {
    val probe = graft.llm.Corpus.probeHashes(
      spark.read.parquet(s"$dir/documents.parquet"))
    graft.llm.Corpus.contaminationWith(docStream(spark, dir), probe)
  }

  /** Streaming BPE pair counting — the tokenizer-training statistic
    * maintained INCREMENTALLY as corpus shards arrive: the same
    * row-local pair explode as [[graft.llm.Corpus.bpePairStats]]
    * feeding a streaming grouped count (complete-mode output, since a
    * later shard can promote any pair). The state store holds one
    * counter per distinct pair — alphabet²-sized, the same budget the
    * batch aggregate carries — so state is bounded regardless of how
    * much text has streamed. Top-k/rank stay a finishing step on the
    * complete output (they need the total order, which streaming
    * cannot cut early).
    */
  def pairCountStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.llm.TextExprs._
    import org.apache.spark.sql.functions._
    implicit val d: Dialect = SparkD
    graft.llm.Corpus.explodeNoInfer(
      graft.llm.Corpus.explodeNoInfer(
        docStream(spark, dir), expr(tokens("text")), "tok")
        .where(length(col("tok")) >= 2),
      expr(s"transform(${idxSeq1("length(tok) - 1")}," +
        " i -> substring(tok, i, 2))"), "pair")
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
  }

  /** Streaming TOKENIZER: the merge table learned OFFLINE from the
    * static corpus (bounded model state — `merges` rows, which is how
    * production tokenizers ship) applied to arriving documents as a
    * PURE row-local fold. Per token the fold computes exactly the
    * subword count the trainer's vocabulary carries — identical by
    * construction, because the fold IS the trainer's merge procedure
    * — so no vocabulary join, no state store and no watermark are
    * needed: the streaming plan is the batch plan per micro-batch,
    * and the output rows equal batch [[graft.llm.Corpus.bpeApply]]
    * exactly (spec-verified).
    */
  def tokenizeStream(spark: SparkSession, dir: String,
                     merges: Int = 6): DataFrame = {
    import graft.llm.TextExprs._
    import org.apache.spark.sql.functions._
    implicit val d: Dialect = SparkD
    val ms = graft.llm.Corpus.bpeMerges(
      spark.read.parquet(s"$dir/documents.parquet"), merges)
    docStream(spark, dir)
      .select(col("doc_id"), expr(tokens("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        expr(listFoldSumLong(listTransformNamed("toks", "tok0",
          t => graft.llm.Corpus.subwordCountSql(ms, t))))
          .as("n_subwords"))
  }

  def tokenizeOnce(spark: SparkSession, dir: String): DataFrame =
    StreamDrain.runOnce(tokenizeStream(spark, dir),
      "corpus_tokenize_stream")

  /** Streaming DSIR scorer — the production shape of importance
    * resampling: the hashed-n-gram importance model is trained
    * OFFLINE on the static corpus and collapsed to one micro-unit
    * log-ratio per bucket (a `buckets`-bounded array — genuine model
    * state, DSIR's entire point), then arriving documents score with
    * a pure row-local fold over their bigram buckets. The per-bucket
    * ratios are Spark-evaluated during training (never recomputed
    * driver-side), so streaming scores equal batch
    * [[graft.llm.Corpus.dsirScore]] bit-for-bit (spec-verified).
    */
  def dsirStream(spark: SparkSession, dir: String,
                 buckets: Int = 256): DataFrame = {
    import graft.llm.TextExprs._
    import org.apache.spark.sql.functions._
    implicit val d: Dialect = SparkD
    val static = spark.read.parquet(s"$dir/documents.parquet")
    // model: per-bucket micro-unit log ratio over ALL bucket ids
    // (unseen buckets get the 0/0 smoothed ratio), ln evaluated by
    // Spark exactly as the batch operator evaluates it
    val tok = static.select(col("doc_id"),
      expr(tokens("text")).as("toks"))
      .where(expr(s"${listSize("toks")} >= 2")) // sequence(1,0) guard
    val grams = graft.llm.Corpus.explodeNoInfer(tok,
      expr(idxSeq1(s"${listSize("toks")} - 1")), "i",
      col("doc_id"), col("toks"))
      .select(col("doc_id"),
        expr(s"(${hex8ToLong(s"${elem("toks", "i")} || ' ' || " +
          s"${elem("toks", "i + 1")}")}) % $buckets").as("b"))
    val hist = grams
      .withColumn("tgt",
        expr("CAST(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END" +
          " AS BIGINT)"))
      .groupBy("b")
      .agg(sum("tgt").as("ct"), sum(expr("1 - tgt")).as("cb"))
      .localCheckpoint(eager = false) // one corpus aggregate; lazy = no job at construction
    val tot = hist.agg(sum("ct").as("nt"), sum("cb").as("nb"))
    val lrU =
      s"""CAST(floor((ln((CAST(ct AS DOUBLE) + 1.0e0) /
         |  (CAST(nt AS DOUBLE) + $buckets.0e0)) -
         |  ln((CAST(cb AS DOUBLE) + 1.0e0) /
         |  (CAST(nb AS DOUBLE) + $buckets.0e0))) * 1.0e6 + 0.5e0)
         |  AS BIGINT)""".stripMargin
    val lrByBucket: Array[Long] = spark.range(buckets)
      .withColumnRenamed("id", "b")
      .join(hist, Seq("b"), "left")
      .na.fill(0L, Seq("ct", "cb"))
      .crossJoin(broadcast(tot))
      .select(col("b"), expr(lrU).as("lr_u"))
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    docStream(spark, dir)
      .where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), expr(tokens("text")).as("toks"))
      // the single-token guard sits BELOW the scoring projection (a
      // filter is never reordered above a project it feeds), so the
      // index fold can never see Spark's descending sequence(1, 0)
      .where(expr(s"${listSize("toks")} >= 2"))
      .select(col("doc_id"),
        expr(s"CAST(${listSize("toks")} - 1 AS BIGINT)")
          .as("n_grams"),
        expr(listFoldSumLong(listTransformNamed(
          idxSeq1(s"${listSize("toks")} - 1"), "i0",
          i => s"element_at(${typedLitSql(lrByBucket)}, CAST((" +
            s"${hex8ToLong(s"${elem("toks", i)} || ' ' || " +
              s"${elem("toks", s"$i + 1")}")}) % $buckets AS INT) + 1)")))
          .as("logratio_u"))
      .withColumn("selected", (col("logratio_u") > 0).cast("long"))
  }

  /** The bounded model array as a SQL array literal (model-sized, like
    * the IVF centroid literals).
    */
  private def typedLitSql(a: Array[Long]): String =
    a.mkString("array(", "L, ", "L)")

  def dsirOnce(spark: SparkSession, dir: String): DataFrame =
    StreamDrain.runOnce(dsirStream(spark, dir), "corpus_dsir_stream")

  /** Streaming quality classifier: the perceptron weights trained
    * OFFLINE on the static corpus (6 longs of model state) applied to
    * arriving documents as a row-local integer dot product — the
    * ingest-time model-based filter that follows the rule-based
    * Gopher front door. No state store, no watermark; scores equal
    * batch [[graft.llm.Classifier.perceptronApply]] exactly.
    */
  def classifyStream(spark: SparkSession, dir: String,
                     iters: Int = 4): DataFrame = {
    val w = graft.llm.Classifier.perceptronWeights(
      spark.read.parquet(s"$dir/documents.parquet"), iters)
    graft.llm.Classifier.scoreWith(docStream(spark, dir), w)
  }

  def classifyOnce(spark: SparkSession, dir: String): DataFrame =
    StreamDrain.runOnce(classifyStream(spark, dir),
      "corpus_classify_stream")

  def chunkOnce(spark: SparkSession, dir: String): DataFrame =
    StreamDrain.runOnce(chunkStream(spark, dir), "corpus_chunk_stream")

  def screenOnce(spark: SparkSession, dir: String): DataFrame =
    StreamDrain.runOnce(screenStream(spark, dir), "corpus_screen_stream")

  def pairCountOnce(spark: SparkSession, dir: String): DataFrame =
    StreamDrain.runOnce(pairCountStream(spark, dir),
      "corpus_pairs_stream", mode = "complete")
}
