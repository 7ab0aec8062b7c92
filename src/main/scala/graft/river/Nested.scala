package graft.river

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Det

/** ES `nested` query/aggregation surface over the river's own nested
  * documents.
  *
  * The reference's column-separator parsing builds nested document
  * trees (HBaseParser.readQualifierStructure:226 — replayed
  * test-vector-for-test-vector in `QualifierSpec`), and
  * `river_nested_columns` constructs them per event. This module is
  * the missing half: *querying* those trees with ES nested semantics.
  * A parent document here is a (user_id, day) row-key group; each
  * event contributes one nested item — `struct(parent, leaf, value)`
  * from its parsed qualifier. Qualifiers where k % 3 == 0 are
  * single-segment ("click" — no sub-column), so their items carry no
  * parent path; multi-segment qualifiers ("click-42") nest. That
  * mix is what makes `exists` and per-element `match` discriminating.
  *
  * ES semantics implemented:
  *  - `nested` + `bool.must` (nestedMatch): ALL clauses bind to the
  *    SAME nested item. A doc with a 'click' item and a separate
  *    high-value item does NOT match — only a high-value-click item
  *    does. Spark: higher-order `filter`/`exists` over the
  *    array-of-struct, per-row, no join, no shuffle, no explode.
  *  - `exists` inside nested context (nestedExists): docs having at
  *    least one item with the queried path present.
  *  - nested `terms` agg + `reverse_nested` (nestedTermsAgg): term
  *    counts are NESTED-doc counts (one per item), while
  *    `n_parent_docs` is the reverse_nested parent count.
  *
  * Scale notes: building the nested docs is ONE hash shuffle on the
  * parent key — the same shuffle an indexer pays to assemble parent
  * documents, and item arrays are bounded by per-parent event counts
  * (ES bounds nested docs per parent the same way). The match/exists
  * queries are then pure per-row array predicates: whole-stage
  * codegen, zero exchange, trivially linear at 100 TB. The terms agg
  * explodes back to item granularity and hash-aggregates on the term
  * — one shuffle of (term, parent-key) slim rows with map-side
  * partial aggregation.
  */
object Nested {

  /** Assemble ES-style parent docs: (user_id, day_idx) → items
    * array<struct<parent,leaf,value>> from parsed qualifiers. */
  def nestedDocs(ev: DataFrame, sep: String = "-"): DataFrame = {
    val k = get_json_object(col("props"), "$.k")
    // k % 3 == 0 → single-segment qualifier → item has no parent path
    val qualifier = when(k.cast("long") % 3 === 0, col("event_type"))
      .otherwise(concat(col("event_type"), lit(sep), k))
    ev.withColumn("__p", River.parseQualifier(qualifier, sep))
      .select(col("user_id"), Det.dayIdx("ts").as("day_idx"),
        struct(
          when(size(col("__p.path")) > 0, element_at(col("__p.path"), 1))
            .as("parent"),
          col("__p.leaf").as("leaf"),
          col("value")).as("item"))
      .groupBy("user_id", "day_idx")
      .agg(collect_list(col("item")).as("items"))
  }

  /** ES nested query with a bool.must of [term(parent), range(value)]:
    * both clauses must hit the SAME item. Returns matching parent docs
    * with total and matching item counts. */
  def nestedMatch(docs: DataFrame, parent: String, minValue: Double): DataFrame = {
    val hit = (it: Column) =>
      it.getField("parent") === parent && it.getField("value") >= minValue
    docs.select(col("user_id"), col("day_idx"),
        size(col("items")).cast("long").as("n_items"),
        size(filter(col("items"), hit)).cast("long").as("n_match"))
      .filter(col("n_match") > 0)
  }

  /** ES `exists` on the nested path field: parent docs having ≥1 item
    * with a parent path (i.e. a genuinely nested sub-column). */
  def nestedExists(docs: DataFrame): DataFrame =
    docs.select(col("user_id"), col("day_idx"),
        size(col("items")).cast("long").as("n_items"),
        size(filter(col("items"), it => it.getField("parent").isNotNull))
          .cast("long").as("n_nested"))
      .filter(col("n_nested") > 0)

  /** ES nested query + `inner_hits` (round 12): the matching parent
    * docs AND the specific items that matched, exploded one row per
    * inner hit (parent key, total/matching counts, the hit's
    * parent/leaf/value). Same per-row array `filter` as [[nestedMatch]]
    * — matching items are selected BEFORE the explode, so the explode's
    * output is hit-sized, not item-sized; still zero joins and only the
    * doc-assembly shuffle. */
  def nestedInnerHits(docs: DataFrame, parent: String, minValue: Double): DataFrame = {
    val hit = (it: Column) =>
      it.getField("parent") === parent && it.getField("value") >= minValue
    docs.select(col("user_id"), col("day_idx"),
        size(col("items")).cast("long").as("n_items"),
        filter(col("items"), hit).as("hits"))
      .filter(size(col("hits")) > 0)
      .select(col("user_id"), col("day_idx"), col("n_items"),
        size(col("hits")).cast("long").as("n_match"),
        explode(col("hits")).as("hit"))
      .select(col("user_id"), col("day_idx"), col("n_items"), col("n_match"),
        col("hit.parent").as("hit_parent"), col("hit.leaf").as("hit_leaf"),
        col("hit.value").as("hit_value"))
  }

  /** ES NESTED SORT (r15 continuation — `sort: [{items.value: {nested:
    * {path: items, filter: {term: {items.parent: ...}}}, mode: min,
    * missing: _last}}]`): parents order by the MINIMUM item value
    * among the items matching the nested filter; parents with no
    * matching item sort last (ES `missing: _last`), ties break on the
    * parent key. The sort key is a per-row array fold (`array_min`
    * over the filtered items — a min of doubles, no summation, so
    * engine-exact), then one bounded TakeOrdered — zero exchange
    * beyond the doc-assembly shuffle. */
  def nestedSort(docs: DataFrame, parent: String, k: Int): DataFrame =
    docs.select(col("user_id"), col("day_idx"),
        size(col("items")).cast("long").as("n_items"),
        array_min(transform(
          filter(col("items"), it => it.getField("parent") === parent),
          it => it.getField("value"))).as("sort_value"))
      .orderBy(col("sort_value").asc_nulls_last, col("user_id"), col("day_idx"))
      .limit(k)

  /** ES nested terms agg on the path field + reverse_nested: per term,
    * the nested-doc count, the reverse_nested parent-doc count, and an
    * exact-decimal value sum. */
  def nestedTermsAgg(docs: DataFrame): DataFrame =
    docs.select(col("user_id"), col("day_idx"), explode(col("items")).as("item"))
      .filter(col("item.parent").isNotNull)
      .groupBy(col("item.parent").as("parent"))
      .agg(count(lit(1)).as("n_nested"),
        countDistinct(col("user_id"), col("day_idx")).as("n_parent_docs"),
        Det.moneySum(col("item.value")).as("sum_value"))

  /** ES `reverse_nested` with PARENT-LEVEL sub-aggregations (r15 —
    * the full shape, where [[nestedTermsAgg]]'s n_parent_docs is only
    * the count): bucket by the nested path term, step back to the
    * parent document, and aggregate PARENT-grain metrics — each
    * parent's total item count and total value (over ALL its items,
    * not just the bucket's) counted ONCE per parent per bucket. That
    * once-per-parent grain is the whole point of reverse_nested: a
    * parent with five 'click' items contributes its metrics once to
    * the 'click' bucket.
    *
    * Scale: the parent metrics and the parent's distinct term set are
    * per-row ARRAY ops on the assembled docs (exact-decimal array
    * fold — no second shuffle); the explode is bounded by distinct
    * terms per parent; one hash agg. */
  def reverseNestedAgg(docs: DataFrame): DataFrame = {
    val dec = "decimal(18,2)"
    // the merge re-casts to keep the accumulator type fixed (decimal
    // addition widens 18,2 → 19,2); per-parent money sums fit 18,2 by
    // the same bound Det.moneySum relies on
    val parentTotal = aggregate(col("items"), lit(0).cast(dec),
      (acc, it) => (acc + it.getField("value").cast(dec)).cast(dec))
    docs.select(col("user_id"), col("day_idx"),
        size(col("items")).cast("long").as("p_items"),
        parentTotal.as("p_value"),
        array_distinct(transform(
          filter(col("items"), it => it.getField("parent").isNotNull),
          it => it.getField("parent"))).as("terms"))
      .select(col("p_items"), col("p_value"),
        explode(col("terms")).as("parent"))
      .groupBy("parent")
      .agg(count(lit(1)).as("n_parent_docs"),
        sum(col("p_items")).as("sum_parent_items"),
        sum(col("p_value")).cast("double").as("sum_parent_value"))
  }
}
