package graft.model

import org.apache.spark.sql.DataFrame

/** Stage-entry schema validation — the Spark equivalent of the
  * reference's `BadArrayShape` checks on every operator entry
  * (/root/reference/src/corrections.rs:86-107, src/van_vleck.rs:168-176,
  * src/calibration.rs:55-82, src/io/mod.rs:163-189). Shapes there are
  * array dims; here the contract is the canonical column set, and
  * violations fail at PLAN TIME with the operator's name — not three
  * stages later with an unresolved-column error.
  */
object SchemaCheck {

  /** The canonical pre-flag vis columns. */
  val visCols: Seq[String] = Seq("t", "ant1", "ant2", "bl", "cc", "fc",
    "chan", "freq_hz") ++ (0 until 8).map(k => s"v$k") :+ "w"

  def require(df: DataFrame, op: String, cols: Seq[String]): DataFrame = {
    val have = df.columns.toSet
    val missing = cols.filterNot(have)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"$op: input frame is missing columns ${missing.mkString(", ")}" +
          s" (has: ${df.columns.sorted.mkString(", ")})")
    df
  }

  def requireVis(df: DataFrame, op: String): DataFrame =
    require(df, op, visCols)

  def requireFlagged(df: DataFrame, op: String): DataFrame =
    require(df, op, visCols :+ "flag")

  def requireWeighted(df: DataFrame, op: String): DataFrame =
    require(df, op, visCols ++ Seq("flag", "weight"))
}
