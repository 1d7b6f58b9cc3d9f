package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Dev twin of [[graft.Verify]] for ONE query: writes the Spark result
  * parquet and the query's oracle SQL text so a local DuckDB run can
  * compare a new gate before the driver's round does.
  *
  *   runMain graft.tools.VerifyOne q_sim5_kmeans /root/testdata/sf0.01 /tmp/v1
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    SparkEntry.oracleSql.get(name).foreach { sql =>
      Files.write(Paths.get(s"$outDir/$name.sql"),
        sql.getBytes(StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
