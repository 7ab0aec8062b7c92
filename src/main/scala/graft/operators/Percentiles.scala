package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed percentiles without a global per-group sort — the
  * 100 TB path for the rank-selected percentile family
  * ([[Analytics.percentileFacet]] / [[Analytics.boxplot]] /
  * [[Analytics.medianAbsDeviation]]).
  *
  * The window forms are correct and stay the oracle contract, but their
  * `Window.partitionBy(group).orderBy(value)` shuffles the WHOLE fact
  * table onto as many reducers as there are groups — with a 5-value
  * group key at 100 TB that is 5 tasks sort-spilling ~20 TB each. The
  * two-pass rank-select here computes the SAME discrete percentile
  * (value at row ceil(p·n) in (value, id) order — identical arithmetic,
  * identical tie-breaks, bit-identical results, proven by the shared
  * driver oracle and the equality specs in `PercentilesSpec`):
  *
  *  1. per-group count + span (one map-side-combinable agg);
  *  2. fixed-width bucket histogram over the span (one agg on
  *     (group, bucket) — `buckets` counts per group, NOT a sort), then
  *     a cumulative count over the ≤`buckets` histogram rows per group
  *     (a bounded post-agg window, the pipelineAggs pattern) locates
  *     the bucket holding each target rank;
  *  3. only rows landing in a located bucket (≈ n/buckets of the
  *     corpus per target) are re-scanned, ranked WITHIN their bucket
  *     (a narrow per-bucket sort), and offset by the ranks below —
  *     in-bucket rank + cum_below = global rank, because the bucket
  *     function is monotone in the value and value-ties never straddle
  *     a bucket boundary.
  *
  * Three narrow scans instead of one corpus-wide sort; every shuffle is
  * a hash agg on (group, bucket). The residual per-task sort is
  * n_group/buckets rows — size `buckets` to the data (the param), and
  * for pathologically massive single groups recurse the same trick
  * inside the located bucket. Intended for LOW-cardinality group keys:
  * with many small groups the plain window form is already
  * well-distributed and cheaper (two fewer scans).
  *
  * Preconditions: non-null value/id columns (the events-table
  * contract); fractions in (0, 1].
  */
object Percentiles {

  /** Value at rank ceil(p·n) per group for each fraction p, in
    * (value, id) order — output (groupCol, p, valueCol, n), one row per
    * (group, fraction). Columns keep their input names so callers
    * re-alias to their facet's contract. */
  def rankSelect(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, fractions: Seq[Double], buckets: Int = 4096): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(p => p > 0 && p <= 1),
      "fractions must lie in (0, 1]")
    require(buckets > 0)
    val v = col(valueCol)

    // pass 1: per-group count + span. The group table is facet-sized
    // (the whole point of this operator is few, huge groups), so it
    // broadcasts onto the scan.
    val stats = df.groupBy(groupCol)
      .agg(count(lit(1)).as("__n"), min(v).as("__lo"), max(v).as("__hi"))

    // monotone bucket id: floor((v − lo)/width) clamped to [0, B−1].
    // IEEE subtraction and division by a positive constant are monotone
    // in v, so bucket order respects value order and value-ties share a
    // bucket — the property global-rank reconstruction needs. A
    // degenerate span (lo = hi) collapses to bucket 0.
    val width = (col("__hi") - col("__lo")) / lit(buckets.toDouble)
    val bucketOf = when(col("__hi") === col("__lo"), lit(0L))
      .otherwise(least(lit(buckets - 1L),
        greatest(lit(0L), floor((v - col("__lo")) / width).cast("long"))))
    def withBucket = df.join(broadcast(stats), groupCol)
      .withColumn("__bucket", bucketOf)

    // pass 2: bucket histogram + cumulative counts (≤ `buckets` rows
    // per group — a bounded post-agg window, never a data-scale sort)
    val wb = Window.partitionBy(groupCol).orderBy("__bucket")
    val cum = withBucket
      .groupBy(groupCol, "__bucket")
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__below", coalesce(
        sum(col("__bn")).over(wb.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumnRenamed(groupCol, "__g")

    // target ranks: k = ceil(p·n) — the exact expression the window
    // forms and the oracle share — located in the bucket whose
    // cumulative range [below+1, below+bn] contains k
    val targets = stats
      .select(col(groupCol), col("__n"), explode(typedlit(fractions)).as("__p"))
      .withColumn("__k", ceil(col("__p") * col("__n")))
    val need = targets.join(cum,
        col(groupCol) === col("__g") &&
          col("__k") > col("__below") &&
          col("__k") <= col("__below") + col("__bn"))
      .select(col("__g"), col("__p"), col("__k"), col("__bucket").as("__b"),
        col("__below"), col("__n"))

    // pass 3: rank only the located buckets (n_group/buckets rows per
    // target), in-bucket rank + cum_below = global rank
    val neededBuckets = need.select(col("__g"), col("__b")).distinct()
    val wsel = Window.partitionBy(groupCol, "__bucket").orderBy(v, col(idCol))
    withBucket
      .join(broadcast(neededBuckets),
        col(groupCol) === col("__g") && col("__bucket") === col("__b"))
      .withColumn("__rn", row_number().over(wsel))
      .drop("__g", "__b", "__n", "__lo", "__hi")
      .join(broadcast(need),
        col(groupCol) === col("__g") && col("__bucket") === col("__b") &&
          col("__rn") === col("__k") - col("__below"))
      .select(col(groupCol), col("__p").as("p"), v, col("__n").as("n"))
  }

  /** [[Analytics.percentileFacet]] scale twin: identical output (same
    * oracle SQL drives both), no global per-group sort. */
  def percentileFacetDist(events: DataFrame, fractions: Seq[Double],
      buckets: Int = 4096): DataFrame =
    rankSelect(events.select(col("event_type"), col("value"), col("event_id")),
      "event_type", "value", "event_id", fractions, buckets)
      .select(col("event_type"), col("p"), col("value").as("pct_value"), col("n"))

  /** [[Analytics.boxplot]] scale twin: min/q1/median/q3/max per group
    * from ONE rank-select over the three quartile fractions plus the
    * pass-1 stats — identical output to the windowed exact form. */
  def boxplotDist(events: DataFrame, buckets: Int = 4096): DataFrame = {
    val sel = rankSelect(
      events.select(col("event_type"), col("value"), col("event_id")),
      "event_type", "value", "event_id", Seq(0.25, 0.5, 0.75), buckets)
    val qs = sel.groupBy("event_type").agg(
      max(when(col("p") === 0.25, col("value"))).as("q1"),
      max(when(col("p") === 0.5, col("value"))).as("median"),
      max(when(col("p") === 0.75, col("value"))).as("q3"))
    events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .join(qs, "event_type")
      .withColumn("iqr", col("q3") - col("q1"))
      .select("event_type", "n", "min_value", "max_value", "q1", "median",
        "q3", "iqr")
  }

  /** [[Analytics.medianAbsDeviation]] scale twin: two chained
    * rank-selects (median of value, then median of |value − m| with the
    * same id tie-break) — identical output to the double-windowed exact
    * form; the per-group medians broadcast between the passes. */
  def madDist(events: DataFrame, buckets: Int = 4096): DataFrame = {
    val med = rankSelect(
      events.select(col("event_type"), col("value"), col("event_id")),
      "event_type", "value", "event_id", Seq(0.5), buckets)
      .select(col("event_type"), col("value").as("median_value"))
    val dev = events.join(broadcast(med), "event_type")
      .select(col("event_type"),
        abs(col("value") - col("median_value")).as("dev"), col("event_id"))
    rankSelect(dev, "event_type", "dev", "event_id", Seq(0.5), buckets)
      .select(col("event_type"), col("n"), col("dev").as("mad"))
      .join(broadcast(med), "event_type")
      .select("event_type", "n", "median_value", "mad")
  }
}
