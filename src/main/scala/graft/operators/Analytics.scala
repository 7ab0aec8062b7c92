package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.util.Det

/** The query surface the reference's sink serves (filters, aggregations,
  * facets, top-k — the reason the river imports data at all, see
  * HBaseParser.setMinTimestamp:258 using search + statistical facet), as a
  * library of declarative Spark operators over the TPC-H-ish tables.
  *
  * Scale notes: dimension sides of every join are `broadcast()` (region/
  * nation/supplier/customer are tiny at TPC-H ratios); fact-side filters
  * are plain column predicates so they push to the parquet scan; money
  * aggregates run on DECIMAL (exact, partial-aggregable map-side) and
  * surface as DOUBLE.
  */
object Analytics {

  private def dec2(c: Column) = c.cast(DecimalType(12, 2))
  private def dec42(c: Column) = c.cast(DecimalType(4, 2))

  /** TPC-H Q1 shape: grouped pricing summary with exact-decimal money sums. */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit(cutoff)))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Det.intSum(col("l_quantity")).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec42(col("l_discount")))).cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec42(col("l_discount"))) * (lit(1) + dec42(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast("long")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(dec42(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3 shape: segment customers' unshipped orders, top-k revenue. */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       segment: String, cutoff: String, k: Int): DataFrame = {
    val cut = to_timestamp(lit(cutoff))
    lineitem.filter(col("l_shipdate") > cut)
      .join(orders.filter(col("o_orderdate") < cut), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec42(col("l_discount")))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(k)
  }

  /** TPC-H Q5 shape: revenue by nation within a region/year, dims broadcast. */
  def regionRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                    regionName: String, yearStart: String, yearEnd: String): DataFrame =
    lineitem
      .join(orders.filter(col("o_orderdate") >= to_timestamp(lit(yearStart)) &&
          col("o_orderdate") < to_timestamp(lit(yearEnd))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec42(col("l_discount")))).cast("double").as("revenue"))

  /** TPC-H Q4 shape: order-priority counts for orders with a late-shipped
    * line item — an EXISTS expressed as a left-semi join. */
  def orderPriority(orders: DataFrame, lineitem: DataFrame, lateDays: Int): DataFrame =
    orders
      .join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))

  /** Terms facet + stats shape: top-k customers by total order value. */
  def topCustomers(customer: DataFrame, orders: DataFrame, k: Int): DataFrame =
    orders
      .groupBy("o_custkey")
      .agg(sum(dec2(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey").as("custkey"), col("c_name"), col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("custkey"))
      .limit(k)

  /** Running windows per supplier: first k lines by ship order with a
    * cumulative quantity — one hash shuffle on the partition key. */
  def supplierRunning(lineitem: DataFrame, k: Int): DataFrame = {
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
    lineitem
      .withColumn("rn", row_number().over(w))
      .withColumn("running_qty",
        sum(col("l_quantity").cast("long")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("rn") <= k)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"), col("running_qty"))
  }

  /** Gap-based sessionization: a new session starts after `gapUs` of
    * inactivity; per-user session/event counts. */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), Det.tsMicros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** ES terms facet: per-term doc counts + value stats, top-k by count.
    * One map-side-combinable hash aggregation; the top-k is a driver-
    * bounded sort of (few) distinct terms, not of the data. */
  def termsFacet(events: DataFrame, termCol: String, k: Int): DataFrame =
    events
      .groupBy(termCol)
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("user_id")).as("n_users"),
        Det.moneySum(col("value")).as("sum_value"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("n_docs").desc, col(termCol))
      .limit(k)

  /** ES date-histogram facet: per-UTC-day buckets with counts and value
    * sums. The day key derives from the µs timestamp by exact integer
    * division so both engines bucket identically. */
  def dateHistogram(events: DataFrame): DataFrame =
    events
      .select(expr("unix_micros(ts) div 86400000000").as("day_idx"),
        col("event_type"), col("value"))
      .groupBy("day_idx", "event_type")
      .agg(count(lit(1)).as("n"), Det.moneySum(col("value")).as("sum_value"))

  /** Tumbling-window aggregation — the batch twin of the streaming river's
    * windowed agg (same `window()` expression Structured Streaming uses). */
  def timeWindow(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.moneySum(col("value")).as("sum_value"))
      .select((unix_micros(col("w.start")) / lit(1000000L)).cast("long").as("window_start_s"),
        col("event_type"), col("n"), col("sum_value"))
}
