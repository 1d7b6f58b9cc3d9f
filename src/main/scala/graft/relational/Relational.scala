package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational surface (SURVEY §2.9): the reference has no joins,
  * grouping sets, or top-k — but the engine exposes Spark's native
  * relational operators, demonstrated here TPC-H-style over the
  * driver's star schema.
  *
  * Money arithmetic parity: price/discount columns are doubles with 2
  * decimals; we convert to integer CENTS (round(x*100) as bigint) so
  * every sum is exact 64-bit integer arithmetic — identical across
  * engines and partial-aggregation orders — and divide back to doubles
  * only at the output edge.
  */
object Relational {

  private def cents(c: String): org.apache.spark.sql.Column =
    expr(s"CAST(round($c * 100, 0) AS BIGINT)")

  /** Q1-flavoured pricing summary: scan-heavy aggregate over lineitem. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .withColumn("qty_c", cents("l_quantity"))
      .withColumn("price_c", cents("l_extendedprice"))
      .withColumn("disc_c", cents("l_discount"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(col("qty_c")).cast("double") / 100.0).as("sum_qty"),
        (sum(col("price_c")).cast("double") / 100.0).as("sum_base_price"),
        (sum(col("price_c") * (lit(100L) - col("disc_c"))).cast("double")
          / 10000.0).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** Q6-flavoured forecast-revenue: the textbook pushdown showcase — a
    * date-range + band predicates + one global sum. Every filter
    * reaches the parquet scan; at 100 TB this is an embarrassingly
    * parallel single-pass with a one-row shuffle.
    */
  def forecastRevenue(lineitem: DataFrame,
                      yearStart: String = "1995-01-01",
                      yearEnd: String = "1996-01-01",
                      discLo: Double = 0.02, discHi: Double = 0.04,
                      qtyLt: Double = 24.0): DataFrame =
    lineitem
      .where(col("l_shipdate") >= lit(yearStart).cast("timestamp") &&
        col("l_shipdate") < lit(yearEnd).cast("timestamp"))
      .withColumn("disc_c", cents("l_discount"))
      .where(col("disc_c").between(
        math.round(discLo * 100), math.round(discHi * 100)) &&
        col("l_quantity") < qtyLt)
      .agg(
        (sum(cents("l_extendedprice") * col("disc_c")).cast("double")
          / 10000.0).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Q3-flavoured top-k revenue: 3-way join + aggregate + deterministic
    * top 10 (revenue desc, orderkey asc). At scale the window-based
    * top-k would be orderBy+limit with a partial top-k per partition —
    * same result, bounded shuffle.
    */
  def topRevenue(customer: DataFrame, orders: DataFrame,
                 lineitem: DataFrame, segment: String = "BUILDING",
                 k: Int = 10): DataFrame = {
    val li = lineitem
      .withColumn("price_c", cents("l_extendedprice"))
      .withColumn("disc_c", cents("l_discount"))
    val joined = customer.where(col("c_mktsegment") === segment)
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
    val agg = joined.groupBy("o_orderkey")
      .agg(sum(col("price_c") * (lit(100L) - col("disc_c")))
        .as("revenue_c"))
    // orderBy+limit compiles to TakeOrderedAndProject — each partition
    // keeps its own top k and only k rows reach the driver-side merge,
    // unlike a global-window rank which funnels EVERY aggregated order
    // through one partition; the rank window then runs over k rows only
    val top = agg.orderBy(col("revenue_c").desc, col("o_orderkey").asc)
      .limit(k)
    // rank over the k limited rows only (explicit bounded frame)
    graft.ops.Bounded.rank(top, "rk",
      col("revenue_c").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("rk"),
        (col("revenue_c").cast("double") / 10000.0).as("revenue"))
  }

  /** ROLLUP subtotals (grouping-sets surface the reference lacks,
    * SURVEY §2.9): revenue by (returnflag, linestatus) with per-flag and
    * grand totals. Cents arithmetic keeps every subtotal exact.
    */
  def revenueRollup(lineitem: DataFrame): DataFrame =
    lineitem
      .withColumn("price_c", cents("l_extendedprice"))
      .withColumn("disc_c", cents("l_discount"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        (sum(col("price_c") * (lit(100L) - col("disc_c"))).cast("double")
          / 10000.0).as("revenue"),
        count(lit(1)).as("n_rows"))
      // subtotal rows carry NULL keys; surface them as a sentinel so
      // output rows are total-orderable (and hash-comparable) everywhere
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("revenue"), col("n_rows"))

  /** Anti-join: customers with no orders (EXISTS/NOT EXISTS surface). */
  def customersWithoutOrders(customer: DataFrame,
                             orders: DataFrame): DataFrame =
    customer
      .join(orders.select(col("o_custkey").as("c_custkey")).distinct(),
        Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_nationkey")

  /** Semi-join + broadcast dims: suppliers in a region with any sale
    * (region→nation broadcast chain + semi join against lineitem).
    */
  def activeSuppliersInRegion(region: DataFrame, nation: DataFrame,
                              supplier: DataFrame, lineitem: DataFrame,
                              regionName: String = "ASIA"): DataFrame = {
    val nations = nation.join(
      broadcast(region.where(col("r_name") === regionName)),
      col("n_regionkey") === col("r_regionkey"))
    val sup = supplier.join(broadcast(nations),
      col("s_nationkey") === col("n_nationkey"))
    sup.join(lineitem.select(col("l_suppkey").as("s_suppkey")).distinct(),
        Seq("s_suppkey"), "left_semi")
      .select("s_suppkey", "s_nationkey")
  }
}
