package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data preparation pipeline — the `documents`
  * analogue of the visibility Preprocess chain: every stage is one of
  * the oracle-gated operators, composed lazily.
  *
  *   language-ID → quality filter → exact dedup → near-dup (LSH
  *   candidate clusters, keep cluster minimum) → token accounting
  *
  * Output: the surviving corpus with per-doc metadata a trainer needs
  * (pred_lang, quality_score, token counts, cluster id). One scan +
  * the operators' own shuffles; nothing quadratic.
  */
object DocPipeline {

  def apply(docs: DataFrame,
            minQuality: Double = 0.4,
            langs: Seq[String] = Seq("en", "de", "es", "fr", "zh", "und"))
      : DataFrame = {
    // six stages each scan the corpus — cache it once (MEMORY_AND_DISK
    // spills per-partition at scale, so this holds on a real cluster).
    // The CALLER owns the cache lifetime: the returned plan references
    // it, so it cannot be unpersisted here; call docs.unpersist() when
    // the pipeline's outputs are materialised
    val d = docs.cache()
    val lang = TextAnalysis.langId(d)
    val quality = TextAnalysis.quality(d)
      .select("doc_id", "quality_score")
    val toks = TextAnalysis.tokenStats(d)

    // exact dedup: keep only canonical representatives
    val keep = Dedup.exact(d)
      .select(col("keep_doc_id").as("doc_id"))

    // near-dup clusters: survivors are each cluster's minimum doc_id;
    // docs in no cluster survive by default
    val clusters = Dedup.duplicateClusters(d)
    val clusterDrop = clusters
      .where(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")

    d.select("doc_id", "lang", "source", "n_chars")
      .join(keep, Seq("doc_id"), "left_semi")
      .join(clusterDrop, Seq("doc_id"), "left_anti")
      .join(lang, Seq("doc_id"))
      .join(quality, Seq("doc_id"))
      .join(toks, Seq("doc_id"))
      .where(col("quality_score") >= minQuality &&
        col("pred_lang").isin(langs: _*))
  }
}
