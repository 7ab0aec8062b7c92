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
    * re-alias to their facet's contract.
    *
    * `depth` is the pathological-single-group escape hatch: at depth 1
    * (default — the verified bench shape) located buckets are ranked
    * directly; depth 2 re-buckets each located non-degenerate bucket
    * with the same histogram-CDF machinery before ranking, so a group
    * whose value distribution crams n_group/buckets ≫ memory rows into
    * ONE bucket sorts only n_group/buckets² rows per task. An all-TIES
    * located bucket (bmin = bmax) short-circuits at every depth — all
    * rows equal the target value, so the answer needs no rank at all —
    * which is what terminates the one distribution re-bucketing cannot
    * split. Output is bit-identical across depths (equality spec in
    * `PercentilesSpec`; the driver oracle is depth-blind). */
  def rankSelect(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, fractions: Seq[Double], buckets: Int = 4096,
      depth: Int = 1): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(p => p > 0 && p <= 1),
      "fractions must lie in (0, 1]")
    require(buckets > 0 && depth >= 1)
    // pass 1, FUSED (r22, guide §2.4/§5): ONE per-group aggregate
    // carries both the count (feeding the target ranks k = ceil(p·n) —
    // the exact expression the window forms and the oracle share) and
    // the min/max span selectRanks buckets against, materialized ONCE
    // (localCheckpoint — the frame is facet-sized, the whole point of
    // this operator is few huge groups). The previous separate count
    // and min/max aggregates each paid their own full corpus scan; a
    // lazy fused aggregate does not fix that — the column pruner
    // splits the consumers' copies back into count-only and
    // min/max-only subtrees (3 references → 3 scans, observed in the
    // r22 plan dumps) — so the eager tiny materialization is the shape
    // that guarantees one pass-1 scan.
    val pinned = df.select(col(groupCol).as("__tg"), col(valueCol).as("__v"),
      col(idCol).as("__id"))
    val base = pinned.groupBy("__tg").agg(count(lit(1)).as("__n"),
      min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
      .localCheckpoint()
    val targets = base
      .select(col("__tg"), col("__n"), explode(typedlit(fractions)).as("__p"))
      .withColumn("__k", ceil(col("__p") * col("__n")))
    selectRanks(pinned, targets, buckets, depth,
        statsIn = base.select(col("__tg"), col("__lo"), col("__hi")))
      .select(col("__tg").as(groupCol), col("__p").as("p"),
        col("__v").as(valueCol), col("__n").as("n"))
  }

  /** Recursive core: select the value at in-group rank `__k` for every
    * (group `__tg`, tag `__p`) target. Frame columns are pinned
    * (`__tg`, `__v`, `__id`); recursion descends with the located
    * bucket folded into a struct group key and `__k` rebased by the
    * ranks below it. */
  private def selectRanks(df: DataFrame, targets: DataFrame,
      buckets: Int, depth: Int, statsIn: DataFrame = null): DataFrame = {
    val v = col("__v")

    // per-group span. The group table is facet-sized (the whole point
    // of this operator is few, huge groups), so it broadcasts.
    // `statsIn` is the fused pass-1 frame when the caller already
    // aggregated it (rankSelect entry); the recursive descent computes
    // its own over the sub-bucket frame.
    val stats =
      if (statsIn != null) statsIn
      else df.groupBy("__tg").agg(min(v).as("__lo"), max(v).as("__hi"))

    // monotone bucket id: floor((v − lo)/width) clamped to [0, B−1].
    // IEEE subtraction and division by a positive constant are monotone
    // in v, so bucket order respects value order and value-ties share a
    // bucket — the property global-rank reconstruction needs. A
    // degenerate span (lo = hi) collapses to bucket 0.
    val width = (col("__hi") - col("__lo")) / lit(buckets.toDouble)
    val bucketOf = when(col("__hi") === col("__lo"), lit(0L))
      .otherwise(least(lit(buckets - 1L),
        greatest(lit(0L), floor((v - col("__lo")) / width).cast("long"))))
    def withBucket = df.join(broadcast(stats), "__tg")
      .withColumn("__bucket", bucketOf)

    // bucket histogram + cumulative counts (≤ `buckets` rows per group
    // — a bounded post-agg window, never a data-scale sort); per-bucket
    // min/max feed the all-ties shortcut
    val wb = Window.partitionBy("__g").orderBy("__bucket")
    val cum = withBucket
      .groupBy(col("__tg").as("__g"), col("__bucket"))
      .agg(count(lit(1)).as("__bn"), min(v).as("__bmin"), max(v).as("__bmax"))
      .withColumn("__below", coalesce(
        sum(col("__bn")).over(wb.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))

    // locate: the bucket whose cumulative range [below+1, below+bn]
    // contains k
    val need = targets.join(cum,
        col("__tg") === col("__g") &&
          col("__k") > col("__below") &&
          col("__k") <= col("__below") + col("__bn"))
      .select(col("__g"), col("__p"), col("__k"), col("__bucket").as("__b"),
        col("__below"), col("__n"), col("__bmin"), col("__bmax"))

    // all-ties bucket: every row equals the target value — answer
    // directly, no rank (terminates the tie pathology at any depth)
    val direct = need.filter(col("__bmin") === col("__bmax"))
      .select(col("__g").as("__tg"), col("__p"), col("__bmin").as("__v"),
        col("__n"))
    val rest = need.filter(col("__bmin") =!= col("__bmax"))

    val resolved =
      if (depth <= 1) {
        // rank only the located buckets (n_group/buckets rows per
        // target), in-bucket rank + cum_below = global rank
        val neededBuckets = rest.select(col("__g"), col("__b")).distinct()
        val wsel = Window.partitionBy("__tg", "__bucket").orderBy(v, col("__id"))
        withBucket
          .join(broadcast(neededBuckets),
            col("__tg") === col("__g") && col("__bucket") === col("__b"))
          .withColumn("__rn", row_number().over(wsel))
          .drop("__g", "__b", "__lo", "__hi")
          .join(broadcast(rest),
            col("__tg") === col("__g") && col("__bucket") === col("__b") &&
              col("__rn") === col("__k") - col("__below"))
          .select(col("__tg"), col("__p"), col("__v"), col("__n"))
      } else {
        // descend: located bucket folds into the group key, k rebases
        // to the in-bucket rank, and the same machinery re-buckets the
        // (n_group/buckets)-row subset
        val neededBuckets = rest.select(col("__g"), col("__b")).distinct()
        val sub = withBucket
          .join(broadcast(neededBuckets),
            col("__tg") === col("__g") && col("__bucket") === col("__b"))
          .select(struct(col("__tg"), col("__bucket")).as("__tg"),
            col("__v"), col("__id"))
        val subTargets = rest.select(
          struct(col("__g").as("__tg"), col("__b").as("__bucket")).as("__tg"),
          col("__p"), (col("__k") - col("__below")).as("__k"), col("__n"))
        selectRanks(sub, subTargets, buckets, depth - 1)
          .select(col("__tg.__tg").as("__tg"), col("__p"), col("__v"),
            col("__n"))
      }
    direct.unionByName(resolved)
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
    // The medians frame is group-count-sized but its LINEAGE is the
    // whole multi-pass rank-select; the second rank-select references
    // its input ≥3 times (pass-1 stats, histogram, located-bucket
    // re-scan), so without truncation the first select's plan subtree
    // replicates multiplicatively (measured: 308 exchanges in the
    // physical plan vs ~40 after). localCheckpoint materializes the
    // few rows once and makes every reference a leaf — bit-identical
    // output, same oracle.
    val med = rankSelect(
      events.select(col("event_type"), col("value"), col("event_id")),
      "event_type", "value", "event_id", Seq(0.5), buckets)
      .select(col("event_type"), col("value").as("median_value"))
      .localCheckpoint()
    val dev = events.join(broadcast(med), "event_type")
      .select(col("event_type"),
        abs(col("value") - col("median_value")).as("dev"), col("event_id"))
    rankSelect(dev, "event_type", "dev", "event_id", Seq(0.5), buckets)
      .select(col("event_type"), col("n"), col("dev").as("mad"))
      .join(broadcast(med), "event_type")
      .select("event_type", "n", "median_value", "mad")
  }
}
