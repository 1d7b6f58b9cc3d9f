package graft.tools

import graft.ops.VanVleck
import graft.synth.VisSynth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: cardinality of the Van Vleck cross-kernel's memo key
  * space at a given SF — total probes vs distinct (khat, sx, sy)
  * triples — to size the memo (r22 item 1 measurement).
  */
object VvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vis = graft.ops.WeightOps.flagToWeight(
      graft.ops.FlagOps.setFlags(VisSynth.vis(spark, sfDir),
        graft.model.Dims.timestep(spark), graft.model.Dims.chan(spark),
        graft.model.Dims.baseline(spark)))
    val sigma = VanVleck.sigmaTable(vis, Seq.empty, 2.0)
    val s1 = sigma.select(col("t"), col("ant").as("ant1"), col("chan"),
      col("sigma_x").as("sx1"), col("sigma_y").as("sy1"))
    val s2 = sigma.select(col("t"), col("ant").as("ant2"), col("chan"),
      col("sigma_x").as("sx2"), col("sigma_y").as("sy2"))
    val joined = vis
      .join(s1, Seq("t", "ant1", "chan"), "left")
      .join(s2, Seq("t", "ant2", "chan"), "left")
      .localCheckpoint()
    val crosses = joined.where(col("ant1") =!= col("ant2"))
    val autos = joined.where(col("ant1") === col("ant2"))
    println("[vvprobe] rows total=" + joined.count() +
      " crosses=" + crosses.count() + " autos=" + autos.count())
    // the 8 cross-component triples + the 2 auto-XY triples
    val pairs = Seq(
      ("v0", "sx1", "sx2"), ("v1", "sx1", "sx2"),
      ("v2", "sx1", "sy2"), ("v3", "sx1", "sy2"),
      ("v4", "sy1", "sx2"), ("v5", "sy1", "sx2"),
      ("v6", "sy1", "sy2"), ("v7", "sy1", "sy2"))
    val tripleUnion = pairs.map { case (v, a, b) =>
      crosses.select((col(v) / 2.0).as("k"),
        col(a).as("sx"), col(b).as("sy"))
    }.reduce(_ unionAll _)
      .unionAll(autos.select((col("v2") / 2.0).as("k"),
        col("sx1").as("sx"), col("sy1").as("sy")))
      .unionAll(autos.select((col("v3") / 2.0).as("k"),
        col("sx1").as("sx"), col("sy1").as("sy")))
    println("[vvprobe] probe rows=" + tripleUnion.count())
    println("[vvprobe] distinct triples=" +
      tripleUnion.distinct().count())
    println("[vvprobe] distinct khat=" +
      tripleUnion.select("k").distinct().count())
    println("[vvprobe] distinct sigma pairs=" +
      tripleUnion.select("sx", "sy").distinct().count())
    // per-32nd of the data (~one task's share): how many distinct
    // triples does ONE partition see (sizes the per-thread L1)?
    val perPart = tripleUnion
      .withColumn("p", spark_partition_id() % 32)
      .groupBy("p").agg(countDistinct("k", "sx", "sy").as("d"))
      .agg(min("d"), max("d"), avg("d"))
    perPart.show(false)
    spark.stop()
  }
}
