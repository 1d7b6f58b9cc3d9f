package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: Spark's reading of the driver testdata's timestamp
  * encodings (the events fixture has shipped as both nanosecond int64
  * and microsecond TIMESTAMP — Events.readEvents adapts to either).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.llm.Events.readEvents(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.select(col("ts"), col("ts_us")).show(3, false)
    spark.stop()
  }
}
