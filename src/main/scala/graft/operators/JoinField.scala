package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Det

/** ES parent-child join-field queries (`has_child` / `has_parent`),
  * mapped onto the orders ↔ lineitem parent-child pair (join key
  * o_orderkey = l_orderkey) — the relational shape ES's join field
  * models inside one index.
  *
  * ES semantics: `has_child` returns PARENT docs having ≥ 1 child that
  * matches the child query; `has_parent` returns CHILD docs whose
  * parent matches the parent query. Both are existence tests, not
  * joins that multiply rows — in Spark that is exactly a LEFT SEMI
  * join, which Catalyst keeps as a semi (no row explosion, no
  * post-join dedup) and AQE freely converts to broadcast when the
  * filtered probe side is small.
  *
  * Scale shape: the inner predicate is plain columns, so it pushes to
  * THAT side's scan (`PushedFilters` — spec-asserted); the semi join
  * shuffles both sides on the join key once (or broadcasts the
  * filtered side); the facet on the survivors is one
  * map-side-combinable hash agg. ES pays the same key-colocation cost
  * by routing children to their parent's shard. */
object JoinField {

  /** `has_child`: orders with ≥ 1 lineitem at `minQty`+ quantity AND
    * `minDiscount`+ discount, faceted per o_orderpriority (order count
    * + exact DECIMAL total-price sum). */
  def hasChildFacet(orders: DataFrame, lineitem: DataFrame,
      minQty: Double, minDiscount: Double): DataFrame =
    orders.join(
        lineitem
          .filter(col("l_quantity") >= minQty && col("l_discount") >= minDiscount)
          .select(col("l_orderkey").as("o_orderkey")),
        Seq("o_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        Det.moneySum(col("o_totalprice")).as("sum_total"))

  /** `has_parent`: lineitems whose order is worth `minTotal`+ and was
    * placed in [dateFrom, dateTo), faceted per l_returnflag (item
    * count + exact DECIMAL quantity sum). Date bounds are string
    * literals so the comparison stays on the scan-native timestamp
    * column (pushable). */
  def hasParentFacet(orders: DataFrame, lineitem: DataFrame,
      minTotal: Double, dateFrom: String, dateTo: String): DataFrame =
    lineitem.join(
        orders
          .filter(col("o_totalprice") >= minTotal &&
            col("o_orderdate") >= dateFrom && col("o_orderdate") < dateTo)
          .select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        Det.moneySum(col("l_quantity")).as("sum_qty"))

  /** ES `parent_id` query (r15 continuation — the third join-field
    * query: fetch the children of ONE named parent): the child scan
    * with an equality predicate on the join key, every non-projected
    * column pruned. The predicate reaches the parquet scan
    * (PushedFilters) — on a corpus bucketed/partitioned by the parent
    * key this is a partition-prunable point lookup, which is exactly
    * how ES serves it (routing to the parent's shard). */
  def parentIdQuery(lineitem: DataFrame, orderKey: Long): DataFrame =
    lineitem.filter(col("l_orderkey") === orderKey)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      .orderBy(col("l_linenumber"))
}
