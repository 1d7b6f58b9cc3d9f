package graft.tools

import graft.llm.Similarity
import org.apache.spark.sql.SparkSession

/** Scratch probe: recall ladder (stale / single / multi / fresh) for
  * candidate q_sim18 gate shapes, on the sf0.01 fixture.
  */
object Sim18Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val single = Similarity.indexRebalanceReport(emb,
      fixtureScale = true).head()
    println(s"[sim18probe] single: stale=${single.getLong(3)} " +
      s"single=${single.getLong(4)} fresh=${single.getLong(5)}")
    for (splits <- Seq(1, 2); nProbe <- Seq(2, 3, 4)) {
      val r = Similarity.indexMultiRepairReport(emb, nProbe = nProbe,
        splits = splits, fixtureScale = true).head()
      println(s"[sim18probe] splits=$splits nProbe=$nProbe: " +
        s"stale=${r.getLong(3)} multi=${r.getLong(4)} " +
        s"fresh=${r.getLong(5)}")
    }
    spark.stop()
  }
}
