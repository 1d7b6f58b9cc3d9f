package graft

import graft.sinks.Sinks
import graft.synth.VisSynth
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md evidence: a mirror bucketed by `bl` lets Spark elide the
  * shuffle for baseline-keyed aggregation (the RFI/occupancy axis).
  */
class BucketedMirrorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.autoBroadcastJoinThreshold", "10MB")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("groupBy(bl) over the bucketed mirror plans no shuffle") {
    val vis = VisSynth.vis(spark, "/root/testdata/sf0.001")
    Sinks.writeBucketedMirror(vis, "vis_bucketed_spec", buckets = 8)
    val agg = spark.table("vis_bucketed_spec")
      .groupBy("bl").agg(count(lit(1)).as("n"), sum("v0").as("s"))
    val plan = agg.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in:\n$plan")
    assert(agg.count() > 0)
    // unbucketed baseline: the same aggregate DOES shuffle
    val plain = vis.groupBy("bl").agg(count(lit(1)).as("n"))
    assert(plain.queryExecution.executedPlan.toString()
      .contains("Exchange hashpartitioning"))
    spark.sql("DROP TABLE IF EXISTS vis_bucketed_spec")
  }

  test("RfiFlag over the bl-bucketed mirror plans ZERO shuffles and " +
    "detects identically to the plain run") {
    import graft.model.Dims
    import graft.ops.{FlagOps, RfiFlag, WeightOps}
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark)))
    Sinks.writeBucketedMirror(weighted, "vis_rfi_bucketed", buckets = 8)
    val overBucketed = RfiFlag(spark.table("vis_rfi_bucketed"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSet
    val got = rows(overBucketed)
    // the operator-level claim (not just a column aggregate): the
    // column-keyed flatMapGroups grouping is satisfied by the bucket
    // clustering, so the WHOLE detection plan runs shuffle-free
    val plan = overBucketed.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in RfiFlag over bucketed mirror:\n" +
        plan.take(2000))
    assert(got == rows(RfiFlag(weighted)),
      "bucketed-layout detection diverged from the plain run")
    spark.sql("DROP TABLE IF EXISTS vis_rfi_bucketed")
  }

  test("Van Vleck over the (t, chan) mirror plans fewer exchanges " +
    "and corrects identically to the plain run") {
    import graft.model.Dims
    import graft.ops.{FlagOps, VanVleck, WeightOps}
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark)))
    Sinks.writeTimeChanMirror(weighted, "vis_tchan_spec", buckets = 8)
    def nEx(df: org.apache.spark.sql.DataFrame) =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString()).length
    val overMirror = VanVleck(spark.table("vis_tchan_spec"),
      Seq(7L), 2.0)
    val plain = VanVleck(weighted, Seq(7L), 2.0)
    // equal (t, ant, chan) implies equal (t, chan): the bucket
    // clustering satisfies the sigma aggregate's distribution, so
    // both of C5's fact-side exchanges disappear
    assert(nEx(overMirror) < nEx(plain),
      s"(t,chan) mirror did not elide exchanges: " +
        s"${nEx(overMirror)} vs plain ${nEx(plain)}")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("t"), col("bl"), col("chan"),
        round(col("v0"), 6), round(col("v1"), 6))
      .collect().map(_.toSeq).toSet
    assert(key(overMirror) == key(plain),
      "(t,chan)-layout correction diverged from the plain run")
    spark.sql("DROP TABLE IF EXISTS vis_tchan_spec")
  }

  test("COMPOSED preprocess chain over the (t, chan) mirror: at most " +
    "3 exchanges in the executed plan, identical gate columns to the " +
    "plain layout (the q_pp4 canonical-layout claim)") {
    import graft.model.Dims
    import graft.ops.{FlagOps, Preprocess, WeightOps}
    val weighted = WeightOps.flagToWeight(FlagOps.setFlags(
      VisSynth.vis(spark, "/root/testdata/sf0.001"),
      Dims.timestep(spark), Dims.chan(spark), Dims.baseline(spark)))
    Sinks.writeTimeChanMirror(weighted, "vis_pp4_spec", buckets = 8)
    def gate(df: org.apache.spark.sql.DataFrame) =
      Preprocess(vanVleck = true, rfi = true)(spark, df)
        .select(col("t"), col("bl"), col("chan"),
          floor(col("v0") * 1e6 + 0.5), floor(col("v1") * 1e6 + 0.5),
          col("flag"),
          floor(col("weight") * 112.0 + 0.5).cast("long"))
    val overMirror = gate(spark.table("vis_pp4_spec"))
    val rows = overMirror.collect().map(_.toSeq).toSet // executes
    val nEx = "Exchange hashpartitioning".r
      .findAllIn(overMirror.queryExecution.executedPlan.toString())
      .length
    assert(nEx <= 3, s"composed chain over the (t,chan) mirror " +
      s"planned $nEx exchanges (SCALE.md 15b budget is <= 3)")
    assert(rows == gate(weighted).collect().map(_.toSeq).toSet,
      "mirror-layout chain diverged from the plain layout")
    spark.sql("DROP TABLE IF EXISTS vis_pp4_spec")
  }
}
