package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SCALE.md "Skew and sizing").
  *
  * AQE's skew-join splitting handles sort-merge skew at runtime; salting
  * is the plan-level tool for aggregations and joins where one key
  * dominates (the classic hot-bucket problem in LSH band joins or
  * per-language corpora).
  */
object SkewTools {

  /** Two-phase salted aggregation: count rows per key without any single
    * reducer owning a hot key. Phase 1 groups on (key, salt) — spreading
    * a hot key over `salts` reducers — phase 2 combines the partials.
    * Deterministic: the salt is a hash of stable columns, not a random.
    */
  def saltedCount(df: DataFrame, key: String, saltCol: String,
                  salts: Int = 16): DataFrame =
    df
      .withColumn("_salt", pmod(hash(col(saltCol)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as("n"))

  /** Salted broadcast-skew join: replicate the (small) right side
    * `salts` times so a hot left key spreads across reducers. Use when
    * the right side is small enough to replicate but too big to
    * broadcast whole.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSource: String, salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(col(saltSource)), lit(salts)))
    val replicatedRight = right.crossJoin(
      broadcast(right.sparkSession.range(salts).toDF("_salt")))
    saltedLeft.join(replicatedRight, Seq(key, "_salt"))
      .drop("_salt")
  }
}
