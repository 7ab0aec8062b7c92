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

  test("depth-2 recursion is bit-identical on a pathological single group") {
    import spark.implicits._
    // one group whose values cram into ONE level-1 bucket: 99% of rows
    // lie in [0, 1e-6) of a [0, 1e6] span (plus an all-ties run), so
    // with buckets=4 the located bucket holds ~99% of the group — the
    // exact case depth-1 would sort wholesale and depth-2 re-buckets.
    // A handful of outliers define the wide span.
    val data = (1 to 2000).map { i =>
      val v =
        if (i <= 1900) i * 5e-10          // dense cluster near 0
        else if (i <= 1980) 0.5e-6        // tie run inside the cluster
        else (i - 1980) * 50000.0         // outliers stretching the span
      ("g", v, i.toLong)
    }
    val df = data.toDF("g", "v", "id")
    val fr = Seq(0.1, 0.5, 0.9, 0.95, 1.0)
    val naive = {
      val sorted = data.sortBy(r => (r._2, r._3))
      fr.map { p =>
        val k = math.ceil(p * sorted.size).toInt
        ("g", p, sorted(k - 1)._2, sorted.size.toLong)
      }.toSet
    }
    val d1 = Percentiles.rankSelect(df, "g", "v", "id", fr, buckets = 4)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val d2 = Percentiles.rankSelect(df, "g", "v", "id", fr, buckets = 4, depth = 2)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(d1 === naive, "depth-1 must match the naive sort")
    assert(d2 === naive, "depth-2 must be bit-identical to depth-1 and naive")
  }

  test("depth-2 equals depth-1 on the real events table (all fractions)") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), col("event_id"))
    val fr = Seq(0.5, 0.9, 0.99)
    val d1 = rows(Percentiles.rankSelect(ev, "event_type", "value", "event_id",
      fr, buckets = 64))
    val d2 = rows(Percentiles.rankSelect(ev, "event_type", "value", "event_id",
      fr, buckets = 64, depth = 2))
    assert(d1.nonEmpty && d1 == d2)
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
