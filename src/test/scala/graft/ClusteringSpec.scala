package graft

import graft.llm.Clustering
import graft.llm.TextExprs._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-means clustering gate mechanics: the assignment is a total
  * partition, the loop is deterministic (order-free exact arithmetic),
  * Lloyd training improves the (score-form) objective, and empty cells
  * keep their previous centroid.
  */
class ClusteringSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("kmeansAssign partitions every vector into one of k cells") {
    val out = Clustering.kmeansAssign(emb, k = 4, iters = 2).collect()
    val n = emb.count()
    assert(out.length == n)
    assert(out.map(_.getLong(0)).distinct.length == n)
    val cells = out.map(_.getLong(1)).distinct.sorted
    assert(cells.forall(c => c >= 0 && c < 4))
  }

  test("kmeansAssign is deterministic across runs and repartitionings") {
    val a = Clustering.kmeansAssign(emb, k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val b = Clustering.kmeansAssign(emb.repartition(13), k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // exact equality INCLUDING the double scores: the micro-unit sums
    // are order-free exact, so a different partitioning cannot move a
    // single bit of the output
    assert(a.sameElements(b))
  }

  test("training raises the mean winning score vs seed centroids") {
    val seed = Clustering.kmeansAssign(emb, k = 4, iters = 0)
      .agg(avg("score_r")).head().getDouble(0)
    val trained = Clustering.kmeansAssign(emb, k = 4, iters = 3)
      .agg(avg("score_r")).head().getDouble(0)
    // Lloyd monotonicity in argmax-score form (objective decreases <=>
    // mean best score increases); 1e-6 slack for the rounded output
    assert(trained >= seed - 1e-6, s"trained=$trained seed=$seed")
  }

  test("a cell that captures no vectors keeps its previous centroid") {
    implicit val d: Dialect = SparkD
    graft.functions.DoubleVecDot.register(spark)
    val embq = emb
      .select(col("vec_id"), expr(Clustering.quantSql("embedding")).as("qv"))
    // cell 0 at the corpus mean region wins everything; cell 1 is
    // planted far outside the unit ball so it can never be nearest
    val far = Array.fill(64)(9.9e6)
    val cents = Array(0 -> Array.fill(64)(0.0), 1 -> far)
    val next = Clustering.lloydStep(embq, cents, dim = 64)
    assert(next(1)._1 == 1)
    assert(next(1)._2.sameElements(far), "empty cell must keep its centroid")
    assert(!next(0)._2.sameElements(cents(0)._2), "captured cell must move")
  }

  test("semDedup keeps each cluster's lowest id and is monotone in tau") {
    val loose = Clustering.semDedup(emb, k = 4, iters = 2, tau = 0.3, fixtureScale = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(loose.length == emb.count())
    // the lowest id in a cluster has no lower-id partner: always kept
    loose.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.minBy(_._1)._3 == 1L)
    }
    val keptStrict = Clustering.semDedup(emb, k = 4, iters = 2, tau = 0.99, fixtureScale = true)
      .where(col("kept") === 1).count()
    assert(keptStrict >= loose.count(_._3 == 1L),
      "raising tau must never remove more")
  }

  test("clusterSample: exactly min(nPer, cell size) per cell, " +
    "consistent with the assignment") {
    val asg = Clustering.kmeansAssign(emb, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = asg.values.groupBy(identity).map { case (c, v) =>
      c -> v.size.toLong
    }
    val picked = Clustering.clusterSample(emb, fixtureScale = true, k = 4, iters = 2,
      nPer = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCell = picked.groupBy(_._2)
    sizes.foreach { case (c, n) =>
      assert(byCell.get(c).map(_.length.toLong)
        .getOrElse(0L) == math.min(10L, n))
    }
    // every sampled row carries its true cell and ranks 1..n
    picked.foreach { case (vid, c, _) => assert(asg(vid) == c) }
    byCell.values.foreach { rows =>
      assert(rows.map(_._3).sorted.sameElements(
        (1L to rows.length.toLong)))
    }
  }

  test("embPipeline composes consistently with its stages") {
    val kept = Clustering.semDedup(emb, k = 4, iters = 2, fixtureScale = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val keptSet = kept.filter(_._3 == 1L).map(_._1).toSet
    val keptPerCell = kept.filter(_._3 == 1L).groupBy(_._2)
      .map { case (c, v) => c -> v.length.toLong }
    val out = Clustering.embPipeline(emb, k = 4, iters = 2, nPer = 5, fixtureScale = true)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // every sampled vector survived dedup; n_kept matches semDedup
    out.foreach { case (vid, c, _, nk) =>
      assert(keptSet.contains(vid))
      assert(keptPerCell(c) == nk)
    }
    out.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.length.toLong == math.min(5L, keptPerCell(c)))
      assert(rows.map(_._3).sorted.sameElements(
        (1L to rows.length.toLong)))
    }
  }

  test("oracle SQL carries the unrolled iteration chain") {
    val sql = Clustering.kmeansSql(k = 8, iters = 3)
    // 3 update stages + 4 assignment stages (final one labels only)
    for (i <- 1 to 4) assert(sql.contains(s"a$i AS"))
    for (i <- 1 to 3) assert(sql.contains(s"m$i AS"))
    assert(!sql.contains("m4 AS"))
    assert(sql.contains("FROM a4"))
  }
}
