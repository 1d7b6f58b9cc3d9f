package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Simplified per-baseline amplitude thresholding — the SQL-checkable
  * statistical sibling of [[RfiFlag]] (which runs the full SumThreshold
  * kernel). Flags cells whose XX amplitude exceeds
  * mean + k·stddev over the baseline. Windowed aggregates shuffle once on
  * bl, identical movement to the RFI group-by.
  */
object ThresholdFlag {

  def apply(vis: DataFrame, k: Double = 3.0): DataFrame = {
    val w = Window.partitionBy("bl")
    vis
      .withColumn("amp",
        sqrt(col("v0") * col("v0") + col("v1") * col("v1")))
      .withColumn("lim",
        avg(col("amp")).over(w) + lit(k) * stddev_samp(col("amp")).over(w))
      .select(col("t"), col("bl"), col("chan"),
        (col("amp") > col("lim")).as("rfi"))
  }
}
