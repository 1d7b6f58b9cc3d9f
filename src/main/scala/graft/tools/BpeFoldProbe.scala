package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-word comparison of the trained-vocab subword counts
  * vs the row-local merge fold, to localise any divergence between
  * bpeApply and the streaming tokenizer. Not part of the library
  * surface.
  */
object BpeFoldProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.Corpus
    import graft.llm.TextExprs._
    implicit val d: Dialect = SparkD
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ms = Corpus.bpeMerges(docs)
    println(s"[fold] merges = $ms")
    // trained vocab reprs via the apply path's join frame
    val apply = Corpus.bpeApply(docs)
    val fold = docs
      .select(col("doc_id"), expr(tokens("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        expr(listFoldSumLong(listTransformNamed("toks", "tok0",
          t => Corpus.subwordCountSql(ms, t)))).as("n_subwords"))
    val diff = apply.as("a").join(fold.as("f"), Seq("doc_id"))
      .where(col("a.n_subwords") =!= col("f.n_subwords") ||
        col("a.n_words") =!= col("f.n_words"))
    println(s"[fold] differing docs = ${diff.count()}")
    diff.limit(3).collect().foreach(r => println(s"[fold] $r"))
    // per-word: fold count vs trained vocab count
    val words = graft.llm.Corpus.explodeNoInfer(
      docs.select(expr(tokens("text")).as("toks")), col("toks"), "w")
      .distinct()
      .withColumn("n_fold", expr(Corpus.subwordCountSql(ms, "w")))
    words.cache()
    val bad = words.where(col("n_fold") <= 0).count()
    println(s"[fold] words with nonpositive fold count = $bad")
    words.orderBy(col("n_fold").desc).limit(5).collect()
      .foreach(r => println(s"[fold] word '${r.getString(0)}' " +
        s"n_fold=${r.getLong(1)}"))
    spark.stop()
  }
}
