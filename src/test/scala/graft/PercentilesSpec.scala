package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Percentiles}

/** The _dist rank-select twins must be BIT-IDENTICAL to the windowed
  * exact forms (same discrete ceil(p·n) contract, same id tie-breaks) —
  * that is what lets one oracle text verify both plans. Plus direct
  * naive-recompute coverage of the rank-select core under ties, skew,
  * and degenerate bucket counts, where the histogram-CDF bookkeeping
  * (clamping, cum_below offsets, single-bucket collapse) has to be
  * exercised for real. */
class PercentilesSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toVector.sortBy(_.mkString("|"))

  test("percentileFacetDist is bit-identical to the windowed exact form") {
    val ev = Tables.events(spark, sfDir)
    val fr = Seq(0.5, 0.9, 0.99)
    assert(rows(Percentiles.percentileFacetDist(ev, fr)) ===
      rows(Analytics.percentileFacet(ev, fr)))
  }

  test("boxplotDist is bit-identical to the windowed exact form") {
    val ev = Tables.events(spark, sfDir)
    assert(rows(Percentiles.boxplotDist(ev)) === rows(Analytics.boxplot(ev)))
  }

  test("madDist is bit-identical to the windowed exact form") {
    val ev = Tables.events(spark, sfDir)
    assert(rows(Percentiles.madDist(ev)) ===
      rows(Analytics.medianAbsDeviation(ev)))
  }

  test("rank-select matches a naive recompute under ties, skew, and buckets=2") {
    import spark.implicits._
    // 5 distinct values (heavy ties — every bucket boundary is a tie
    // run), skewed group sizes, and buckets=2 so clamping and the
    // cum_below offset both bind; fractions include the k=1 and k=n
    // extremes
    val data = (1 to 400).map { i =>
      (if (i % 4 == 0) "a" else "b", (i % 5).toDouble, i.toLong)
    }
    val df = data.toDF("g", "v", "id")
    val fr = Seq(0.01, 0.25, 0.5, 0.75, 1.0)
    val naive = data.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      fr.map { p =>
        val k = math.ceil(p * sorted.size).toInt
        (g, p, sorted(k - 1)._2, sorted.size.toLong)
      }
    }.toSet
    val got = Percentiles.rankSelect(df, "g", "v", "id", fr, buckets = 2)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got === naive)
  }

  test("builtin approx_percentile stays within tolerance of the exact forms") {
    // the OTHER 100 TB path the verdict named: approx_percentile is
    // partial-aggregable (t-digest-style quantile summaries, no
    // per-group sort) but only approximately correct and not
    // cross-engine deterministic — so it carries no oracle slot; the
    // _dist rank-select twins are the exact production path and this
    // error spec documents the approx alternative, the
    // approxCardinality pattern
    val ev = Tables.events(spark, sfDir)
    val fr = Seq(0.5, 0.9, 0.99)
    val exact = Analytics.percentileFacet(ev, fr).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val approx = ev.groupBy("event_type")
      .agg(percentile_approx(col("value"), typedlit(fr), lit(10000)).as("qs"))
      .collect()
      .flatMap(r => fr.zip(r.getSeq[Double](1)).map { case (p, v) =>
        (r.getString(0), p) -> v
      }).toMap
    assert(approx.keySet === exact.keySet)
    // value range is ~[0, 560]; 10k-accuracy digests should land well
    // within 1% of the range of the exact rank-selected value
    approx.foreach { case (k, v) =>
      assert(math.abs(v - exact(k)) <= 5.6, s"$k: approx $v vs exact ${exact(k)}")
    }
  }

  test("rank-select handles single-row and constant-value groups") {
    import spark.implicits._
    val df = Seq(("solo", 7.0, 1L), ("flat", 3.0, 1L), ("flat", 3.0, 2L),
      ("flat", 3.0, 3L)).toDF("g", "v", "id")
    val got = Percentiles.rankSelect(df, "g", "v", "id", Seq(0.5, 1.0))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got === Set(("solo", 0.5, 7.0, 1L), ("solo", 1.0, 7.0, 1L),
      ("flat", 0.5, 3.0, 3L), ("flat", 1.0, 3.0, 3L)))
  }
}
