package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Total-order helpers for BOUNDED (model/dimension-sized) frames.
  *
  * A global rank needs every row in one place; on a bounded frame the
  * honest plan is an EXPLICIT single partition. The repo used to spell
  * that `Window.partitionBy(lit(0))`, but Catalyst constant-folds the
  * literal key away and WindowExec then logs its
  * move-everything-to-one-partition WARNING on every execution (166
  * lines in a full bench log) — noise that reads like a scale bug.
  * This helper states the same plan without the window: collapse to
  * one partition (`coalesce(1)` — no exchange, exactly the
  * single-consumer shape the degenerate window executed), sort within
  * it, and take `monotonically_increasing_id`, which on a single
  * partition is the consecutive 0-based row number in iteration
  * (= sorted) order.
  *
  * ONLY for bounded frames: on a corpus-scale frame a global rank is
  * wrong whatever the spelling. Every caller's input is model-sized
  * by construction (a ≤24-row dim, a top-k limit, a (lang, source)
  * aggregate) and says so at the call site.
  */
object Bounded {

  /** `name` := the 1-based row number of `df` in `sort` order
    * (LongType), bit-identical to the old
    * `row_number().over(Window.partitionBy(lit(0)).orderBy(sort))`
    * when the sort order is total (unique keys) — which every caller
    * guarantees.
    *
    * Relies on `monotonically_increasing_id` being CONSECUTIVE
    * within a partition — Spark's current behavior, though the API
    * contract promises only monotone+unique. CrossSinkSpec pins the
    * consecutive stepping ("monotonically_increasing_id steps by
    * exactly 1..."; a Spark upgrade that changes it fails the suite),
    * and every value this helper feeds is hash-gated at two SFs per
    * round, so a drift cannot ship silently.
    */
  def rank(df: DataFrame, name: String, sort: Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(sort: _*)
      .withColumn(name, monotonically_increasing_id() + 1)
}
