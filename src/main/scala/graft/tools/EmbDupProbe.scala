package graft.tools

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE.md evidence tool for the round-20 q_d5 fix: measure
  * [[graft.llm.Dedup.embeddingNearDup]]'s candidate volume and wall
  * time at 10× and 100× the sf0.1 embedding count, derived plane
  * count (the production default) against the historic fixed-8-plane
  * shape (`targetCell` pinned huge, cap explicitly off — the
  * round-19 `weak` geometry).
  *
  * Embeddings are generated with ScaleGen's deterministic multi-seed
  * mixing (64-dim, same distribution class as the driver testdata),
  * entirely as Spark expressions over `spark.range` — no files, no
  * driver loops.
  *
  * The decision number at 100 TB is the PAIR COUNT growth: the
  * derived shape must grow ~linearly in n (cell size pinned at
  * targetCell), the fixed shape quadratically (cell size n/256).
  * Seconds are the sanity check (a local shuffle is a memory copy,
  * not a network transfer).
  */
object EmbDupProbe {

  private def synth(spark: SparkSession, n: Long): DataFrame = {
    val raw = transform(sequence(lit(0), lit(63)),
      i => (pmod(col("e1") * (i + 29) + col("e2") * (i * i + 3)
        + col("e3") * (i * i * i + 11), lit(2001)) - 1000)
        .cast("double") / 1000.0)
    spark.range(n)
      .select(col("id").as("vec_id"))
      .withColumn("e1", pmod(col("vec_id") * 2654435761L, lit(1000003L)))
      .withColumn("e2", pmod(col("vec_id") * 40503L + 17, lit(999983L)))
      .withColumn("e3", pmod(col("vec_id") * 69069L + 5, lit(999979L)))
      .withColumn("embedding",
        transform(raw, x => x.cast("float")))
      .select("vec_id", "embedding")
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    // sf0.1 has 2000 embeddings; measure 10x and 100x that
    val sizes = Seq(20000L, 200000L)
    for (n <- sizes) {
      val e = synth(spark, n).localCheckpoint(true)
      val (pd, td) = timed(Dedup.embeddingNearDup(e, -2.0).count())
      println(f"[embdup] n=$n%7d derived  pairs=$pd%10d  $td%7.2f s")
      // fixed-8-plane control (the r19 weak shape): derivation frozen
      // by a huge targetCell, cap explicitly off so geometry alone is
      // measured. SKIPPED at 100x when the projected volume exceeds
      // 100M pairs — the point is that it is unrunnable.
      val projected = n.toDouble * n / 256 / 2
      if (projected < 1e8) {
        val (pf, tf) = timed(Dedup.embeddingNearDup(e, -2.0,
          targetCell = 1 << 28, hotBucketCap = 0).count())
        println(f"[embdup] n=$n%7d fixed-8  pairs=$pf%10d  $tf%7.2f s")
      } else {
        println(f"[embdup] n=$n%7d fixed-8  SKIPPED (projected " +
          f"~${projected / 1e9}%.1fB pairs — the quadratic point)")
      }
      e.unpersist()
    }
    spark.stop()
  }
}
