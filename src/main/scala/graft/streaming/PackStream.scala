package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sequence packing: the `flatMapGroupsWithState`
  * twin of [[graft.llm.Corpus.seqPack]].
  *
  * State per source = the running token offset plus the doc/start
  * counters of the one OPEN (partially filled) sequence. A document's
  * tokens extend the stream; every sequence whose upper boundary the
  * stream crosses is emitted immediately with exactly `budget` tokens.
  * The open tail is never emitted (a real pipeline flushes it at
  * end-of-shard) — so the stream's output is precisely the batch
  * operator's FULL sequences, which is what the parity spec pins.
  *
  * Ordering contract (same as the batch window's `ORDER BY doc_id`):
  * within a micro-batch documents are sorted here; across micro-batches
  * a source's documents must arrive in doc_id order for the packing to
  * agree with a batch backfill — the natural property of shard-ordered
  * ingestion that per-shard packing assumes at any scale.
  *
  * State is O(1) per source (three longs) — bounded regardless of how
  * much text has streamed.
  */
object PackStream {

  case class Doc(source: String, doc_id: Long, n_tok: Long)
  case class PackState(cum: Long, openDocs: Long, openStarts: Long)
  case class Packed(source: String, seq_id: Long, n_docs: Long,
                    n_starts: Long, n_tokens: Long)

  /** Pure single-document transition — ONE definition shared by the
    * in-order twin and [[OooStream]]'s watermark-reordered variant.
    * Mirrors seqPack's span arithmetic: a doc starting at offset
    * `cum` with `n` tokens overlaps sequences
    * floor(cum/B)..floor((cum+n-1)/B) and closes every one whose
    * upper boundary it reaches.
    */
  def advance(budget: Long)(source: String, st: PackState, doc: Doc)
      : (PackState, Seq[Packed]) = {
    val out = List.newBuilder[Packed]
    val start = st.cum
    val end = start + doc.n_tok
    val first = start / budget
    val last = (end - 1) / budget
    var docsOpen = st.openDocs
    var startsOpen = st.openStarts
    var s = first
    while (s <= last) {
      docsOpen += 1
      if (s == first) startsOpen += 1
      if (end >= (s + 1) * budget) {
        out += Packed(source, s, docsOpen, startsOpen, budget)
        docsOpen = 0L
        startsOpen = 0L
      }
      s += 1
    }
    (PackState(end, docsOpen, startsOpen), out.result())
  }

  /** The per-source state transition — pure, testable without a
    * stream.
    */
  def updateSource(budget: Long)(source: String, docs: Iterator[Doc],
                                 state: GroupState[PackState])
      : Iterator[Packed] = {
    require(budget >= 1, s"need budget >= 1, got $budget")
    var st = state.getOption.getOrElse(PackState(0L, 0L, 0L))
    val out = List.newBuilder[Packed]
    docs.toSeq.sortBy(_.doc_id).foreach { doc =>
      val (next, emitted) = advance(budget)(source, st, doc)
      st = next
      out ++= emitted
    }
    state.update(st)
    out.result().iterator
  }

  /** Wire the stateful operator over a streaming Dataset[Doc]. */
  def packed(docs: Dataset[Doc], budget: Long = 512L): Dataset[Packed] = {
    require(budget >= 1, s"need budget >= 1, got $budget")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateSource(budget))
  }

  /** Streaming Dataset[Doc] from the documents fixture: same token
    * counting as the batch operator.
    */
  def docStream(spark: SparkSession, dir: String): Dataset[Doc] = {
    import graft.llm.TextExprs._
    import spark.implicits._
    implicit val dd: Dialect = SparkD
    CorpusStream.docStream(spark, dir)
      .selectExpr("source", "doc_id",
        s"CAST(${listSize(tokens("text"))} AS BIGINT) AS n_tok")
      .as[Doc]
  }

  /** Drain the fixture once through the stream (memory sink). */
  def packOnce(spark: SparkSession, dir: String,
               budget: Long = 512L): DataFrame =
    StreamDrain.runOnce(packed(docStream(spark, dir), budget),
      "pack_stream")
}
