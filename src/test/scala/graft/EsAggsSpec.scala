package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.dedup.{Dedup, MinHash}
import graft.text.TextOps

/** Specs for the ES-aggregation wave (composite / pipeline / filters /
  * range / matrix_stats / top_hits / more_like_this), the incremental
  * dedup operators, and the term-query family. Each operator is checked
  * against an independent naive recompute (Scala collections or the
  * equivalent window form), in addition to the driver's DuckDB oracle.
  */
class EsAggsSpec extends SparkSpec {

  private def money(d: Double): BigDecimal =
    BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  test("frequentItemSets: supports replay naively, the threshold and " +
      "per-size page bind, and the a-priori property holds (r18)") {
    val spark2 = spark; import spark2.implicits._
    // 6 baskets over brands A..D; duplicate lineitem rows for the same
    // (order, brand) must NOT double-count (the DISTINCT basket step)
    val li = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 10L), // basket 1: A B C (dup A)
      (2L, 10L), (2L, 11L), (2L, 12L),            // basket 2: A B C
      (3L, 10L), (3L, 11L),                       // basket 3: A B
      (4L, 10L), (4L, 11L),                       // basket 4: A B
      (5L, 12L), (5L, 13L),                       // basket 5: C D
      (6L, 13L)                                   // basket 6: D
    ).toDF("l_orderkey", "l_partkey")
    val part = Seq((10L, "A"), (11L, "B"), (12L, "C"), (13L, "D"))
      .toDF("p_partkey", "p_brand")
    // minimum_support 1/2 (500‰): pairs AB(4/6) CD... C,D together 1/6
    // → only AB and the size-3 ABC(2/6) fall either side of it
    val got = Analytics.frequentItemSets(li, part, minSupPermille = 500,
        perSize = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        Option(r.getString(4)), r.getLong(5), r.getDouble(6)))
    // naive replay: baskets → supports → threshold → per-size rank
    val baskets = Map(1L -> Set("A", "B", "C"), 2L -> Set("A", "B", "C"),
      3L -> Set("A", "B"), 4L -> Set("A", "B"), 5L -> Set("C", "D"),
      6L -> Set("D"))
    val n = baskets.size
    def support(items: Set[String]): Int =
      baskets.values.count(b => items.subsetOf(b))
    val brands = Seq("A", "B", "C", "D")
    val pairs = for {
      i <- brands; j <- brands if i < j
      s = support(Set(i, j)) if s * 1000 >= n * 500
    } yield (2L, i, j, None: Option[String], s.toLong)
    val triples = for {
      i <- brands; j <- brands; k <- brands if i < j && j < k
      s = support(Set(i, j, k)) if s * 1000 >= n * 500
    } yield (3L, i, j, Some(k), s.toLong)
    val expect = (pairs ++ triples).groupBy(_._1).toSeq.flatMap {
      case (sz, rows) =>
        rows.sortBy(r => (-r._5, r._2, r._3, r._4.getOrElse("")))
          .zipWithIndex.map { case ((_, i1, i2, i3, s), rk) =>
            (sz, rk + 1L, i1, i2, i3, s, s.toDouble / n.toDouble) }
    }.toSet
    assert(got.toSet == expect)
    assert(got.exists(_._1 == 2L) && !got.exists(_._1 == 3L),
      "the 500‰ threshold must keep AB (4/6) and drop every triple (≤ 2/6)")
    // real-table run: per-size page bound respected, and the a-priori
    // property — a triple's support never exceeds any of its sub-pairs'
    val real = Analytics.frequentItemSets(
      Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir)).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3),
        Option(r.getString(4)), r.getLong(5)))
    assert(real.nonEmpty)
    val bySize = real.groupBy(_._1)
    bySize.foreach { case (_, rows) => assert(rows.length <= 20) }
    val pairSup = bySize.getOrElse(2L, Array.empty)
      .map(r => (r._2, r._3) -> r._5).toMap
    bySize.getOrElse(3L, Array.empty).foreach { case (_, i1, i2, i3o, s) =>
      val i3 = i3o.get
      Seq((i1, i2), (i1, i3), (i2, i3)).foreach { p =>
        pairSup.get(p).foreach(ps => assert(s <= ps,
          s"triple ($i1,$i2,$i3)=$s exceeds pair $p=$ps"))
      }
    }
  }

  test("incrementalNgramJaccard == full self-join pairs touching a new doc") {
    val docs = Tables.documents(spark, sfDir)
    val oldD = docs.filter(col("doc_id") % 10 =!= 0)
    val newD = docs.filter(col("doc_id") % 10 === 0)
    val inc = Dedup.incrementalNgramJaccard(oldD, newD, 3, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Dedup.ngramJaccard(docs, 3, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => p._1 % 10 == 0 || p._2 % 10 == 0).toSet
    assert(full.nonEmpty, "restriction must be non-trivial at this SF")
    assert(inc == full, s"missing=${(full -- inc).take(3)} extra=${(inc -- full).take(3)}")
  }

  test("incrementalNearDupPairs == full nearDupPairs touching a new doc") {
    val docs = Tables.documents(spark, sfDir)
    val oldD = docs.filter(col("doc_id") % 10 =!= 0)
    val newD = docs.filter(col("doc_id") % 10 === 0)
    val inc = MinHash.incrementalNearDupPairs(oldD, newD).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = MinHash.nearDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => p._1 % 10 == 0 || p._2 % 10 == 0).toSet
    assert(full.nonEmpty, "restriction must be non-trivial at this SF")
    assert(inc == full, s"missing=${(full -- inc).take(3)} extra=${(inc -- full).take(3)}")
  }

  test("topHits matches the window row_number form") {
    val ev = Tables.events(spark, sfDir)
    val agg = Analytics.topHits(ev, 3).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
    val win = ev.select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("user_id"), col("value"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .collect()
      .map(r => (r.getString(0), r.getInt(5), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(agg.nonEmpty && agg == win)
  }

  test("compositeAgg pages the bucket space in key order after the cursor") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.compositeAgg(ev, "click", 0L, 20).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val rows = ev.select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = rows.groupBy(r => (r._1, r._2 / 100)).toSeq
      .map { case ((t, b), g) =>
        (t, b, g.length.toLong, g.map(_._2).distinct.length.toLong,
          g.map(x => money(x._3)).sum.toDouble)
      }
      .filter { case (t, b, _, _, _) => t > "click" || (t == "click" && b > 0L) }
      .sortBy(x => (x._1, x._2)).take(20)
    assert(got.toSeq == want && got.nonEmpty)
  }

  test("filtersFacet computes every named bucket in one pass") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.filtersFacet(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val rows = ev.select("value", "event_type", "user_id").collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getLong(2)))
    def bucket(p: ((Double, String, Long)) => Boolean) = {
      val g = rows.filter(p)
      (g.length.toLong, g.map(x => money(x._1)).sum.toDouble)
    }
    assert(got("high_value") == bucket(_._1 >= 90))
    assert(got("clicks") == bucket(_._2 == "click"))
    assert(got("early_users") == bucket(_._3 < 500))
  }

  test("rangeFacet emits every requested range, zero-count buckets included") {
    val ev = Tables.events(spark, sfDir)
    val edges = Seq(0.0, 50.0, 100.0, 200.0, 400.0, 1000.0)
    val got = Analytics.rangeFacet(ev, edges).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got.size == edges.size, "one row per requested range")
    val values = ev.select("value").collect().map(_.getDouble(0))
    edges.zipWithIndex.foreach { case (lo, i) =>
      val hi = if (i < edges.size - 1) Some(edges(i + 1)) else None
      val in = values.filter(v => v >= lo && hi.forall(v < _))
      val (gLo, gHi, gN, gSum) = got(i.toLong)
      assert(gLo == lo && gHi == hi.getOrElse(-1.0))
      assert(gN == in.length.toLong, s"bucket $i count")
      assert(gSum == in.map(money).sum.toDouble, s"bucket $i sum")
    }
    // the [1000, ∞) bucket is empty at every SF — the ES zero-count contract
    assert(got(5L)._3 == 0L && got(5L)._4 == 0.0)
  }

  test("pipelineAggs windows over buckets with exact-decimal arithmetic") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.pipelineAggs(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getDouble(5)))
      .sortBy(_._1)
    val rows = ev.select(unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getLong(0) / 86400000000L, money(r.getDouble(1))))
    val days = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, g) => (d, g.length.toLong, g.map(_._2).sum) }
    assert(got.map(_._1).toSeq == days.map(_._1))
    var cum = BigDecimal(0)
    days.zipWithIndex.foreach { case ((d, n, dsum), i) =>
      cum += dsum
      val (gd, gn, gsum, gcum, gder, gmov) = got(i)
      assert(gd == d && gn == n && gsum == dsum.toDouble)
      assert(gcum == cum.toDouble, s"day $d cum")
      val der = if (i == 0) None else Some((dsum - days(i - 1)._3).toDouble)
      assert(gder == der, s"day $d derivative")
      val win = days.slice(math.max(0, i - 6), i + 1).map(_._3)
      assert(gmov == win.sum.toDouble / win.length, s"day $d mov7")
    }
  }

  test("matrixStats derives cov/corr from exact power sums") {
    val li = Tables.lineitem(spark, sfDir)
    val got = Analytics.matrixStats(li).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val rows = li.select("l_quantity", "l_extendedprice", "l_discount").collect()
      .map { r =>
        def d4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        (d4(r.getDouble(0)), d4(r.getDouble(1)), d4(r.getDouble(2)))
      }
    val n = rows.length.toDouble
    def stats(fa: ((BigDecimal, BigDecimal, BigDecimal)) => BigDecimal,
              fb: ((BigDecimal, BigDecimal, BigDecimal)) => BigDecimal) = {
      val a = rows.map(fa).sum.toDouble; val b = rows.map(fb).sum.toDouble
      val aa = rows.map(r => fa(r) * fa(r)).sum.toDouble
      val bb = rows.map(r => fb(r) * fb(r)).sum.toDouble
      val ab = rows.map(r => fa(r) * fb(r)).sum.toDouble
      val cov = (ab - a * b / n) / n
      val va = (aa - a * a / n) / n; val vb = (bb - b * b / n) / n
      (rows.length.toLong, a / n, b / n, cov, cov / math.sqrt(va * vb))
    }
    assert(got("quantity_extendedprice") == stats(_._1, _._2))
    assert(got("quantity_discount") == stats(_._1, _._3))
    assert(got("extendedprice_discount") == stats(_._2, _._3))
  }

  test("extendedStats derives variance/std from exact power sums") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.extendedStats(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8)))).toMap
    val rows = ev.select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    rows.groupBy(_._1).foreach { case (t, g) =>
      val vs = g.map(x => money(x._2))
      val n = g.length.toDouble
      val s = vs.sum.toDouble
      val ss = vs.map(v => (v * v).setScale(4)).sum.toDouble
      val variance = (ss - s * s / n) / n
      val want = (g.length.toLong, g.map(_._2).min, g.map(_._2).max, s, ss,
        s / n, variance, math.sqrt(variance))
      assert(got(t) == want, s"$t: got ${got(t)} want $want")
    }
  }

  test("weightedAvg is the exact-decimal weighted mean") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.weightedAvg(ev, col("user_id") % 10 + 1).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val rows = ev.select("event_type", "value", "user_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (t, g) =>
      val vw = g.map(x => (money(x._2) * money((x._3 % 10 + 1).toDouble)).setScale(4)).sum
      val w = g.map(x => money((x._3 % 10 + 1).toDouble)).sum
      val want = (g.length.toLong, vw.toDouble / w.toDouble, w.toDouble)
      assert(got(t) == want, s"$t: got ${got(t)} want $want")
    }
  }

  test("adjacencyMatrix counts every filter and pairwise intersection in one scan") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.adjacencyMatrix(ev, Seq(
      "high" -> (col("value") >= 90),
      "click" -> (col("event_type") === "click"),
      "early" -> (col("user_id") < 500))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = ev.select("value", "event_type", "user_id").collect()
      .map(r => (r.getDouble(0) >= 90, r.getString(1) == "click", r.getLong(2) < 500))
    assert(got.keySet == Set("high", "click", "early",
      "high&click", "high&early", "click&early"))
    assert(got("high") == rows.count(_._1).toLong)
    assert(got("click") == rows.count(_._2).toLong)
    assert(got("early") == rows.count(_._3).toLong)
    assert(got("high&click") == rows.count(r => r._1 && r._2).toLong)
    assert(got("high&early") == rows.count(r => r._1 && r._3).toLong)
    assert(got("click&early") == rows.count(r => r._2 && r._3).toLong)
  }

  test("percentileRanks reports the exact <=-fraction per probe value") {
    val ev = Tables.events(spark, sfDir)
    val probes = Seq(10.0, 50.0, 200.0)
    val got = Analytics.percentileRanks(ev, probes).collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val rows = ev.select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val types = rows.map(_._1).distinct
    assert(got.size == types.length * probes.length)
    for (t <- types; v <- probes) {
      val g = rows.filter(_._1 == t)
      val le = g.count(_._2 <= v).toLong
      val want = (le, g.length.toLong, le.toDouble / g.length * 100)
      assert(got((t, v)) == want, s"($t,$v): got ${got((t, v))} want $want")
    }
  }

  test("dateRangeFacet emits every bucket incl. zero-count, ES edge semantics") {
    val ev = Tables.events(spark, sfDir)
    val edges = Seq(1704672000000000L, 1705276800000000L, 1706140800000000L,
      1709251200000000L)
    val got = Analytics.dateRangeFacet(ev, edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val ts = ev.select(unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val bounds = (None +: edges.map(Some(_))).zip(edges.map(Some(_)) :+ None)
    assert(got.size == edges.length + 1, "k edges -> k+1 buckets, all emitted")
    bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
      val inB = ts.filter { case (t, _) =>
        lo.forall(t >= _) && hi.forall(t < _) }
      val want = (lo.getOrElse(-1L), hi.getOrElse(-1L), inB.length.toLong,
        inB.map(x => money(x._2)).sum.toDouble)
      assert(got(i.toLong) == want, s"bucket $i: got ${got(i.toLong)} want $want")
    }
    // the past-the-data last bucket really is the zero-count case
    assert(got(edges.length.toLong)._3 == 0L)
  }

  test("bucketSelector keeps exactly the above-average buckets") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.bucketSelector(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val rows = ev.select(unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0) / 86400000000L, r.getDouble(1)))
    val byDay = rows.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(x => money(x._2)).sum)).toMap
    val avg = byDay.values.map(_._2).sum.toDouble / byDay.size
    val want = byDay.filter(_._2._2.toDouble > avg)
      .map { case (d, (n, s)) => d -> ((n, s.toDouble, avg)) }
    assert(got == want)
    // the selection is real: some buckets kept, some dropped
    assert(got.nonEmpty && got.size < byDay.size)
  }

  test("bucketSort pages the bucket set in agg-value order") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.bucketSort(ev, 5, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val rows = ev.select(unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0) / 86400000000L, r.getDouble(1)))
    val want = rows.groupBy(_._1).toSeq
      .map { case (d, g) => (d, g.length.toLong, g.map(x => money(x._2)).sum.toDouble) }
      .sortBy(x => (-x._3, x._1)).slice(5, 15)
    assert(got.toSeq == want && got.length == 10)
  }

  test("histogramBounds emits every bucket in the bounds incl. zero-count") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.histogramBounds(ev, 25.0, -50.0, 650.0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val rows = ev.select("value").collect().map(_.getDouble(0))
    val byBucket = rows.groupBy(v => math.floor(v / 25.0).toLong)
    (-2L to 26L).foreach { b =>
      val g = byBucket.getOrElse(b, Array.empty[Double])
      val want = (g.length.toLong, g.map(money).sum.toDouble)
      assert(got(b) == want, s"bucket $b: got ${got(b)} want $want")
    }
    assert(got.keySet == (byBucket.keySet ++ (-2L to 26L)))
    assert(got(-2L)._1 == 0L && got(26L)._1 == 0L, "bound-only buckets are zero")
  }

  test("boxplot + MAD match the naive rank-selected recompute") {
    val ev = Tables.events(spark, sfDir)
    val rows = ev.select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def rankSel(sorted: Seq[Double], p: Double): Double =
      sorted(math.ceil(p * sorted.size).toInt - 1)

    val box = Analytics.boxplot(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    val mad = Analytics.medianAbsDeviation(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (t, g) =>
      val sorted = g.toSeq.sortBy(x => (x._2, x._3)).map(_._2)
      val (q1, q2, q3) = (rankSel(sorted, 0.25), rankSel(sorted, 0.5), rankSel(sorted, 0.75))
      assert(box(t) == ((g.length.toLong, sorted.min, sorted.max, q1, q2, q3, q3 - q1)))
      // MAD: deviations re-ranked with the ORIGINAL id tie-break
      val devSorted = g.toSeq.map(x => (math.abs(x._2 - q2), x._3))
        .sortBy(identity).map(_._1)
      assert(mad(t) == ((g.length.toLong, q2, rankSel(devSorted, 0.5))))
    }
  }

  test("statsBucket + serialDiff reduce the same day histogram the naive way") {
    val ev = Tables.events(spark, sfDir)
    val rows = ev.select(unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0) / 86400000000L, r.getDouble(1)))
    val byDay = rows.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(x => money(x._2)).sum)).toMap
    val sums = byDay.values.map(_._2).toSeq
    val sb = Analytics.statsBucket(ev).head()
    assert(sb.getLong(0) == byDay.size.toLong)
    assert(sb.getDouble(1) == sums.min.toDouble && sb.getDouble(2) == sums.max.toDouble)
    assert(sb.getDouble(3) == sums.sum.toDouble)
    assert(sb.getDouble(4) == sums.sum.toDouble / byDay.size)

    val sd = Analytics.serialDiff(ev, 7).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val ordered = byDay.toSeq.sortBy(_._1)
    ordered.zipWithIndex.foreach { case ((d, (_, s)), i) =>
      val want = if (i < 7) 0.0 else (s - ordered(i - 7)._2._2).toDouble
      assert(sd(d) == want, s"day $d: got ${sd(d)} want $want")
    }
  }

  test("cumulativeSum / derivative replay the day histogram exactly") {
    val ev = Tables.events(spark, sfDir)
    val byDay = ev.select(unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0) / 86400000000L, money(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(g => (g.length.toLong, g.map(_._2).sum))
      .toSeq.sortBy(_._1)
    val cs = Analytics.cumulativeSum(ev).orderBy("day_idx").collect()
    assert(cs.length == byDay.length)
    var accS = BigDecimal(0); var accN = 0L
    cs.zip(byDay).foreach { case (r, (d, (n, s))) =>
      accS += s; accN += n
      assert(r.getLong(0) == d && r.getLong(1) == n)
      assert(r.getDouble(3) == accS.toDouble, s"cum_sum at day $d")
      assert(r.getLong(4) == accN, s"cum_n at day $d")
    }
    val dv = Analytics.derivative(ev).orderBy("day_idx").collect()
    assert(dv.head.isNullAt(3) && dv.head.isNullAt(4),
      "ES emits no derivative for the first bucket")
    dv.zipWithIndex.drop(1).foreach { case (r, i) =>
      val want = (byDay(i)._2._2 - byDay(i - 1)._2._2).toDouble
      val gap = (byDay(i)._1 - byDay(i - 1)._1).toDouble
      assert(r.getDouble(3) == want)
      assert(r.getDouble(4) == want / gap)
    }
  }

  test("termsShardError: merged counts are lower bounds with a sound " +
      "error bound; exhaustive shards are exact with zero error") {
    val docs = Tables.documents(spark, sfDir)
    val exact = docs.select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = TextOps.termsShardError(docs, 3, 10, 25).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (t, dc, eb) =>
      assert(dc <= exact(t), s"$t: merged $dc must not exceed true ${exact(t)}")
      assert(exact(t) <= dc + eb,
        s"$t: true ${exact(t)} must be within $dc + $eb (the ES upper-bound contract)")
    }
    // the bound must be non-vacuous on this corpus: some term under-counts
    assert(got.exists { case (t, dc, _) => dc < exact(t) },
      "fixture must actually truncate somewhere")
    // shardSize >= vocabulary → every shard exhaustive → exact, zero error
    val full = TextOps.termsShardError(docs, 3, 100000, 25).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    full.foreach { case (t, dc, eb) =>
      assert(dc == exact(t) && eb == 0L, s"$t exhaustive must be exact")
    }
  }

  test("bucketCountKsTest equals a naive KS recompute") {
    val ev = Tables.events(spark, sfDir)
    val counts = ev.select(unix_micros(col("ts"))).collect()
      .map(_.getLong(0) / 86400000000L)
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1).map(_._2)
    val total = counts.sum
    val nb = counts.length
    var cum = 0L
    val dStat = counts.zipWithIndex.map { case (n, i) =>
      cum += n
      math.abs(cum.toDouble / total.toDouble - (i + 1).toDouble / nb.toDouble)
    }.max
    val row = Analytics.bucketCountKsTest(ev).head()
    assert(row.getLong(0) == nb.toLong && row.getLong(1) == total)
    assert(row.getDouble(2) == dStat)
    assert(row.getDouble(2) > 0.0 && row.getDouble(2) < 1.0)
  }

  test("significantTermsChi2 equals a naive contingency recompute") {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
    val aM = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bM = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cM = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val d = toks.length.toLong
    val naive = aM.collect { case ((src, t), a) if a >= 5 =>
      val b = bM(t); val c = cM(src)
      val bigB = c - a; val bigC = b - a; val bigD = d - b - c + a
      val x = a.toDouble * bigD.toDouble - bigB.toDouble * bigC.toDouble
      val denom = ((a + bigB).toDouble * (a + bigC).toDouble) *
        ((bigB + bigD).toDouble * (bigC + bigD).toDouble)
      ((src, t), if (denom == 0) Double.NaN else d.toDouble * (x * x) / denom)
    }
    val got = TextOps.significantTermsChi2(docs, 5L, 20).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (k, chi2) => assert(chi2 == naive(k), s"$k") }
    // and the returned page is the true top-20 by the naive scores
    val wantTop = naive.toSeq.sortBy { case ((s, t), v) => (-v, s, t) }
      .take(20).map(_._1).toSet
    assert(got.map(_._1).toSet == wantTop)
  }

  test("significantTermsMi equals a naive mutual-information recompute") {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
    val aM = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bM = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cM = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val dd = toks.length.toLong
    def cell(nxy: Long, nx: Long, ny: Long): Double =
      if (nxy == 0) 0.0
      // r14: DetLn split form (ln(num) − ln(den)) / Ln2 — the replica
      // stays bit-exact with the dual-compiled program
      else (nxy.toDouble / dd.toDouble) *
        ((graft.util.DetLn.lnScala(nxy.toDouble * dd.toDouble) -
          graft.util.DetLn.lnScala(nx.toDouble * ny.toDouble)) / graft.util.DetLn.Ln2)
    val naive = aM.collect { case ((src, t), a) if a >= 5 =>
      val b = bM(t); val c = cM(src)
      ((src, t),
        cell(a, c, b) + cell(c - a, c, dd - b) +
          cell(b - a, dd - c, b) + cell(dd - b - c + a, dd - c, dd - b))
    }
    val got = TextOps.significantTermsMi(docs, 5L, 20).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (k, mi) => assert(mi == naive(k), s"$k") }
    val wantTop = naive.toSeq.sortBy { case ((s, t), v) => (-v, s, t) }
      .take(20).map(_._1).toSet
    assert(got.map(_._1).toSet == wantTop)
  }

  test("significantTermsJlh equals a naive recompute (ES default heuristic)") {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
    val aM = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bM = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cM = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val dd = toks.length.toLong
    val naive = aM.collect { case ((src, t), a) if a >= 5 =>
      val pFg = a.toDouble / cM(src).toDouble
      val pBg = bM(t).toDouble / dd.toDouble
      ((src, t), if (pFg > pBg) (pFg - pBg) * (pFg / pBg) else 0.0)
    }
    val got = TextOps.significantTermsJlh(docs, 5L, 20).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (k, v) => assert(v == naive(k), s"$k") }
    val wantTop = naive.toSeq.sortBy { case ((s, t), v) => (-v, s, t) }
      .take(20).map(_._1).toSet
    assert(got.map(_._1).toSet == wantTop)
    assert(got.exists(_._2 > 0.0), "the page must carry real JLH signal")
  }

  test("significantTermsBackground: all four heuristics match a scoped " +
      "naive recompute, and the scoped background reorders the top-20") {
    val docs = Tables.documents(spark, sfDir)
    val (fgSource, bgLang) = ("src3", "en")
    val toks = docs.filter(col("lang") === bgLang)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
    val fgToks = toks.filter(_._1 == fgSource)
    val aM = fgToks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bM = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cc = fgToks.length.toLong
    val dd = toks.length.toLong
    def cell(nxy: Long, nx: Long, ny: Long): Double =
      if (nxy == 0) 0.0
      else (nxy.toDouble / dd.toDouble) *
        ((graft.util.DetLn.lnScala(nxy.toDouble * dd.toDouble) -
          graft.util.DetLn.lnScala(nx.toDouble * ny.toDouble)) / graft.util.DetLn.Ln2)
    val naive = aM.collect { case (t, a) if a >= 2 =>
      val b = bM(t)
      val lift = (a * dd).toDouble / (b * cc)
      val pFg = a.toDouble / cc.toDouble; val pBg = b.toDouble / dd.toDouble
      val jlh = if (pFg > pBg) (pFg - pBg) * (pFg / pBg) else 0.0
      val bigB = cc - a; val bigC = b - a; val bigD = dd - b - cc + a
      val x = a.toDouble * bigD.toDouble - bigB.toDouble * bigC.toDouble
      val denom = ((a + bigB).toDouble * (a + bigC).toDouble) *
        ((bigB + bigD).toDouble * (bigC + bigD).toDouble)
      val chi2 = if (denom == 0) Double.NaN else dd.toDouble * (x * x) / denom
      val mi = cell(a, cc, b) + cell(cc - a, cc, dd - b) +
        cell(b - a, dd - cc, b) + cell(dd - b - cc + a, dd - cc, dd - b)
      (t, (lift, jlh, chi2, mi))
    }
    val got = TextOps.significantTermsBackground(docs, fgSource, bgLang,
      2L, 20).collect()
      .map(r => (r.getString(0),
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
    assert(got.nonEmpty)
    got.foreach { case (t, (lift, jlh, chi2, mi)) =>
      val (nl, nj, nc, nm) = naive(t)
      assert(lift == nl && jlh == nj && mi == nm, s"$t")
      assert(chi2 == nc || (chi2.isNaN && nc.isNaN), s"$t chi2")
    }
    val wantTop = naive.toSeq.sortBy { case (t, (_, j, _, _)) => (-j, t) }
      .take(20).map(_._1)
    assert(got.map(_._1).toSeq == wantTop)
    // the scoped background must REORDER the page vs the unscoped
    // corpus background (else background_filter is decorative):
    // recompute jlh with b/d from ALL langs, same fg
    val allToks = docs.select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(t => (r.getString(0), t)))
    val bAll = allToks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val dAll = allToks.length.toLong
    val unscopedTop = aM.collect { case (t, a) if a >= 2 =>
      val pFg = a.toDouble / cc.toDouble
      val pBg = bAll(t).toDouble / dAll.toDouble
      (t, if (pFg > pBg) (pFg - pBg) * (pFg / pBg) else 0.0)
    }.toSeq.sortBy { case (t, j) => (-j, t) }.take(20).map(_._1)
    assert(got.map(_._1).toSeq != unscopedTop,
      "scoped background must reorder the top-20")
  }

  test("cumulativeCardinality equals per-bucket distinct recomputation") {
    val ev = Tables.events(spark, sfDir)
    val rows = ev.select(col("user_id"), unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1) / 3600000000L))
    val got = Analytics.cumulativeCardinality(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hours = got.map(_._1)
    assert(hours.toSeq == hours.sorted.toSeq)
    assert(got.length > 5, "hourly buckets must give a non-trivial series")
    got.foreach { case (h, newU, cumU) =>
      // the naive definition: distinct users at-or-before hour h
      assert(cumU == rows.filter(_._2 <= h).map(_._1).distinct.length.toLong)
      assert(newU == rows.groupBy(_._1).values.count(_.map(_._2).min == h).toLong)
    }
  }

  test("autoDateHistogram picks the ladder interval fitting the target") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.autoDateHistogram(ev, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val interval = got.head._3
    assert(got.forall(_._3 == interval))
    assert(got.length <= 10, s"bucket count ${got.length} exceeds target")
    // the ~31-day span fits 10 buckets only at the 7-day rung
    assert(interval == 7L)
    assert(got.map(_._2).sum == ev.count())
  }

  test("samplerAgg sub-aggregates exactly the top-n sample") {
    val ev = Tables.events(spark, sfDir)
    val n = 500
    val got = Analytics.samplerAgg(ev, n).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val sample = ev.select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(x => (-x._2, x._3)).take(n)
    val want = sample.groupBy(_._1).view.mapValues(g =>
      (g.length.toLong, g.map(x => money(x._2)).sum.toDouble, g.map(_._3).min)).toMap
    assert(got == want)
    assert(sample.length == n, "sample must be a strict subset at this SF")
  }

  test("diversifiedSampler caps per-key entry then truncates like the window form") {
    val ev = Tables.events(spark, sfDir)
    // n sized so BOTH constraints bind at the spec SF (users × cap
    // candidates > n); the wiring's 500 binds the same way at verify SF
    val (cap, n) = (5, 50)
    val got = Analytics.diversifiedSampler(ev, cap, n).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val rows = ev.select("event_type", "user_id", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val capped = rows.groupBy(_._2).values
      .flatMap(_.toSeq.sortBy(x => (-x._3, x._4)).take(cap)).toSeq
    val sample = capped.sortBy(x => (-x._3, x._4)).take(n)
    val want = sample.groupBy(_._1).view.mapValues(g =>
      (g.length.toLong, g.map(x => money(x._3)).sum.toDouble, g.map(_._4).min)).toMap
    assert(got == want)
    // both constraints bind at this SF: the cap rejects rows, the
    // truncation rejects capped candidates
    assert(capped.size < rows.length && capped.size > n)
  }

  test("significantText lift matches the naive hit-set recompute") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.significantText(docs, "hash", 5L, 20).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val toks = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val hitIds = toks.filter(_._2.contains("hash")).keySet
    val fg = hitIds.toSeq.flatMap(toks)
    val all = toks.values.flatten.toSeq
    val aM = fg.groupBy(identity).view.mapValues(_.size.toLong)
    val bM = all.groupBy(identity).view.mapValues(_.size.toLong)
    val (c, d) = (fg.size.toLong, all.size.toLong)
    val want = aM.toSeq.filter(_._2 >= 5L)
      .map { case (t, a) => (t, a, bM(t), (a * d).toDouble / (bM(t) * c)) }
      .sortBy(x => (-x._4, x._1)).take(20)
    assert(got.toSeq == want && got.nonEmpty)
  }

  test("rareTerms surfaces exactly the long-tail terms") {
    val docs = Tables.documents(spark, sfDir)
    // the wired regime (SparkEntry): 7/9 of the corpus — measured to
    // split the synthetic vocabulary's 75-80% df bulk, so the tail is a
    // real set, not a single row
    val maxDc = docs.count() * 7 / 9
    val got = TextOps.rareTerms(docs, maxDc).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val want = docs.select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty).distinct)
      .groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 <= maxDc).toMap
    assert(got == want)
    assert(got.size > 5, s"expected a non-trivial tail at 7/9, got ${got.size}")
    assert(want.size < 31, "threshold must still exclude the head terms")
    // the ES-shaped call — max_doc_count as a small ABSOLUTE bound — is
    // the same operator at a different parameter; keep it exercised so
    // the reference-shaped semantics stay correct even though the wired
    // benchmark threshold is the (documented) verify-strength choice
    val absDc = docs.count() / 10
    val gotAbs = TextOps.rareTerms(docs, absDc).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val wantAbs = want.filter(_._2 <= absDc)
    assert(gotAbs == wantAbs)
  }

  test("moreLikeThis ranks by TF histogram intersection under max_doc_freq") {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val maxDf = nDocs * 4 / 5
    val seeds = Seq(0L, 1L, 2L)
    val got = TextOps.moreLikeThis(docs, seeds, maxDf, 15).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val toks = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)).toMap
    val tf = toks.view.mapValues(_.groupBy(identity).view.mapValues(_.length.toLong).toMap).toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val seedTf = seeds.flatMap(s => tf(s).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter { case (w, _) => df(w) <= maxDf }.toMap
    val want = tf.toSeq.filterNot(d => seeds.contains(d._1))
      .map { case (id, m) =>
        val shared = m.keySet.intersect(seedTf.keySet)
        (id, shared.toSeq.map(w => math.min(m(w), seedTf(w))).sum, shared.size.toLong)
      }
      .filter(_._3 > 0)
      .sortBy(x => (-x._2, x._1)).take(15)
    assert(got.toSeq == want && got.nonEmpty)
  }

  test("term-query family matches a naive token scan (wildcard/regexp/fuzzy)") {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)).toMap

    def topK(scored: Seq[(Long, Long)], k: Int) =
      scored.filter(_._2 > 0).sortBy(x => (-x._2, x._1)).take(k)

    val wild = TextOps.wildcardSearch(docs, "s_a%", 25).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val wildWant = topK(toks.toSeq.map { case (id, ts) =>
      (id, ts.count(t => t.matches("s.a.*")).toLong) }, 25)
    assert(wild == wildWant && wild.nonEmpty)

    val re = TextOps.regexpSearch(docs, "(b|h)a(tch|sh)", 25).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val reWant = topK(toks.toSeq.map { case (id, ts) =>
      (id, ts.count(t => t.matches("(b|h)a(tch|sh)")).toLong) }, 25)
    assert(re == reWant && re.nonEmpty)

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val fuzzy = TextOps.fuzzySearch(docs, "row", 2, 25).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val fuzzyWant = toks.toSeq.map { case (id, ts) =>
      val ds = ts.map(t => lev(t, "row")).filter(_ <= 2)
      (id, ds.length.toLong, if (ds.isEmpty) -1L else ds.min.toLong)
    }.filter(_._2 > 0).sortBy(x => (x._3, -x._2, x._1)).take(25)
    assert(fuzzy == fuzzyWant && fuzzy.nonEmpty)
    // the chosen term must exercise a genuinely fuzzy (non-exact) match
    assert(toks.values.flatten.exists(t => t != "row" && lev(t, "row") <= 2))
  }

  test("movingFn / rate / normalize match a naive bucket recompute") {
    val ev = Tables.events(spark, sfDir)
    // naive day buckets: exact 2-dp sums per UTC day
    val buckets = ev.select(graft.util.Det.tsMicros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (Math.floorDiv(r.getLong(0), 86400000000L), money(r.getDouble(1))))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, rs) => (d, rs.length.toLong, rs.map(_._2).sum) }
    assert(buckets.length > 7, "window must slide over a real bucket run")

    val movWant = buckets.indices.map { i =>
      val w = buckets.slice(math.max(0, i - 6), i + 1)
      (buckets(i)._1, buckets(i)._2, buckets(i)._3.toDouble,
        w.map(_._3).max.toDouble, w.map(_._3).min.toDouble, w.length.toLong)
    }.toSet
    val movGot = Analytics.movingFn(ev, 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))).toSet
    assert(movGot === movWant)

    val rateWant = buckets.map { case (d, n, s) =>
      (d, n, n.toDouble / 24.0, s.toDouble / 24.0) }.toSet
    val rateGot = Analytics.rateAgg(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(rateGot === rateWant)

    val lo = buckets.map(_._3).min; val hi = buckets.map(_._3).max
    val normWant = buckets.map { case (d, n, s) =>
      (d, n, s.toDouble,
        if (hi == lo) 0.0 else (s - lo).toDouble / (hi - lo).toDouble) }.toSet
    val normGot = Analytics.normalizeBuckets(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(normGot === normWant)
    assert(hi != lo, "degenerate-span branch must not be the exercised one")
  }

  test("movingPercentiles picks the exact window order statistics") {
    val ev = Tables.events(spark, sfDir)
    val buckets = ev.select(graft.util.Det.tsMicros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (Math.floorDiv(r.getLong(0), 86400000000L), money(r.getDouble(1))))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, rs) => (d, rs.length.toLong, rs.map(_._2).sum) }
    assert(buckets.length > 7)
    val want = buckets.indices.map { i =>
      val w = buckets.slice(math.max(0, i - 6), i + 1).map(_._3).sorted
      def pick(p: Double) = w(math.ceil(p * w.length).toInt - 1).toDouble
      (buckets(i)._1, buckets(i)._2, buckets(i)._3.toDouble, pick(0.5), pick(0.9))
    }.toSet
    val got = Analytics.movingPercentiles(ev, 7, Seq(0.5, 0.9)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(got === want)
  }

  test("percentilesBucket picks the exact global bucket order statistics") {
    val ev = Tables.events(spark, sfDir)
    val sums = ev.select(graft.util.Det.tsMicros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (Math.floorDiv(r.getLong(0), 86400000000L), money(r.getDouble(1))))
      .groupBy(_._1).values.map(_.map(_._2).sum).toSeq.sorted
    def pick(p: Double) = sums(math.ceil(p * sums.length).toInt - 1).toDouble
    val r = Analytics.percentilesBucket(ev, Seq(0.25, 0.5, 0.9, 0.99)).collect().head
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)) ==
      ((sums.length.toLong, pick(0.25), pick(0.5), pick(0.9), pick(0.99))))
  }

  test("ipRangeFacet buckets the derived IPv4 space with zero-count ranges emitted") {
    val ev = Tables.events(spark, sfDir)
    val edges = Seq(64L, 128L, 192L).map(h => 10L * 16777216L + h * 65536L)
    val got = Analytics.ipRangeFacet(ev, edges)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val uids = ev.select("user_id").collect().map(_.getLong(0))
    def u32(uid: Long) = 10L * 16777216L + (uid * 7 % 256) * 65536L +
      (uid * 13 % 256) * 256L + uid % 256
    val full = Seq(10L * 16777216L) ++ edges ++ Seq(11L * 16777216L)
    def idx(v: Long) = full.init.lastIndexWhere(_ <= v)
    val byRange = uids.groupBy(u => idx(u32(u)))
    def dotted(v: Long) = s"${v >> 24 & 255}.${v >> 16 & 255}.${v >> 8 & 255}.${v & 255}"
    val want = full.init.zipWithIndex.map { case (lo, i) =>
      val us = byRange.getOrElse(i, Array.empty[Long])
      (i.toLong, dotted(lo), dotted(full(i + 1)), us.length.toLong,
        us.distinct.length.toLong)
    }
    assert(got.toSeq == want)
    assert(got.map(_._4).sum == uids.length)
    assert(got.head._2 == "10.0.0.0" && got.last._3 == "11.0.0.0")
  }

  test("tTest matches a naive Welch recompute from exact sums") {
    val ev = Tables.events(spark, sfDir)
    val vals = ev.select("event_type", "value").collect()
      .map(r => (r.getString(0), money(r.getDouble(1))))
    def side(t: String) = {
      val vs = vals.filter(_._1 == t).map(_._2)
      (vs.length.toLong, vs.sum, vs.map(v => v * v).sum)
    }
    val (naL, sa, ssa) = side("click"); val (nbL, sb, ssb) = side("view")
    val na = naL.toDouble; val nb = nbL.toDouble
    val (dsa, dsb, dssa, dssb) =
      (sa.toDouble, sb.toDouble, ssa.toDouble, ssb.toDouble)
    val va = (dssa - dsa * dsa / na) / (na - 1)
    val vb = (dssb - dsb * dsb / nb) / (nb - 1)
    // same fixed-order IEEE ops as the engine's formula → bit-equal
    val want = (naL, nbL, dsa / na, dsb / nb,
      (dsa / na - dsb / nb) / math.sqrt(va / na + vb / nb))
    val r = Analytics.tTest(ev, "click", "view").collect().head
    val got = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4))
    assert(got === want)
    assert(naL > 1 && nbL > 1, "both strata must be populated")
  }

  test("highlight snippets a radius window around the first match") {
    val docs = Tables.documents(spark, sfDir)
    val want = docs.select("doc_id", "text").collect().map { r =>
      val text = r.getString(1); val lo = text.toLowerCase
      val n = (lo.length - lo.replace("vector", "").length) / 6
      val p = lo.indexOf("vector") + 1 // 0-based → 1-based; 0 = no match
      val start = math.max(p - 30, 1)
      val snip = text.substring(start - 1,
        math.min(start - 1 + 66, text.length))
      (r.getLong(0), n.toLong, p.toLong, snip)
    }.filter(_._2 > 0).sortBy(x => (-x._2, x._1)).take(25).toSeq
    val got = TextOps.highlight(docs, "vector", 30, 25).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got === want && got.nonEmpty)
    // a snippet must actually truncate somewhere on the spec corpus
    assert(want.exists(_._4.length == 66))
  }

  test("topMetrics picks the metric at the latest (ts, id) per bucket") {
    val ev = Tables.events(spark, sfDir)
    val want = ev.select(col("event_type"), graft.util.Det.tsMicros(col("ts")),
        col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).map { case (_, rs) => rs.maxBy(r => (r._2, r._3)) }.toSet
    val got = Analytics.topMetrics(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === want && got.nonEmpty)
  }

  test("termSuggest ranks corrections by distance, then frequency, then term") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val docs = Tables.documents(spark, sfDir)
    val tf = docs.select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = tf.toSeq.map { case (t, f) => (t, f, lev(t, "bath").toLong) }
      .filter(_._3 <= 2).sortBy { case (t, f, d) => (d, -f, t) }.take(5)
    val gotRows = TextOps.termSuggest(docs, "bath", 2, 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotRows === want)
    // the wired probe must exercise the frequency tie-break: ≥2 terms
    // at the same distance
    assert(want.groupBy(_._3).exists(_._2.size >= 2))
  }

  test("fieldCollapse equals the windowed collapse + inner_hits form") {
    val ev = Tables.events(spark, sfDir)
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val r = ev.select(col("user_id"), col("event_id"),
        graft.util.Det.tsMicros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .withColumn("best_value", max(col("value")).over(Window.partitionBy("user_id")))
    val g = r.filter(col("rank") === 1)
      .orderBy(col("best_value").desc, col("user_id")).limit(20).select("user_id")
    val want = r.join(g, "user_id").filter(col("rank") <= 3)
      .select("user_id", "best_value", "rank", "event_id", "ts_us", "event_type", "value")
      .collect().map(_.toSeq.toVector).toSet
    val got = Analytics.fieldCollapse(ev, 20, 3).collect()
      .map(_.toSeq.toVector).toSet
    assert(got === want)
    assert(got.size >= 20, "every collapsed group must surface at least its best hit")
  }

  test("phraseMatchSlop matches a naive position scan; slop widens beyond adjacency") {
    val docs = Tables.documents(spark, sfDir)
    // positions must NOT drop empty tokens (that would shift indices);
    // trailing empties never match a term, so Java split's default
    // trailing-trim is position-equivalent to Spark's limit=-1 split
    val want = docs.select("doc_id", "text").collect().map { r =>
      val ts = r.getString(1).toLowerCase.split("\\s+")
      val p1 = ts.zipWithIndex.collect { case (t, i) if t == "hash" => i + 1 }
      val p2 = ts.zipWithIndex.collect { case (t, i) if t == "join" => i + 1 }
      val n = p1.map(i => p2.count(j => j > i && j - i - 1 <= 2)).sum.toLong
      (r.getLong(0), n)
    }.filter(_._2 > 0).sortBy(x => (-x._2, x._1)).take(25).toSeq
    val got = TextOps.phraseMatchSlop(docs, "hash", "join", 2, 25).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
    // the slop parameter must genuinely bind on the spec corpus
    val adjacent = TextOps.phraseMatchSlop(docs, "hash", "join", 0, 10000).count()
    val sloppy = TextOps.phraseMatchSlop(docs, "hash", "join", 2, 10000).count()
    assert(sloppy > adjacent, s"slop=2 ($sloppy docs) must widen slop=0 ($adjacent)")
    // span_near(in_order=false): naive recompute + must widen in-order
    val unordWant = docs.select("doc_id", "text").collect().map { r =>
      val ts = r.getString(1).toLowerCase.split("\\s+")
      val p1 = ts.zipWithIndex.collect { case (t, i) if t == "hash" => i + 1 }
      val p2 = ts.zipWithIndex.collect { case (t, i) if t == "join" => i + 1 }
      val n = p1.map(i => p2.count(j => math.abs(j - i) - 1 <= 2)).sum.toLong
      (r.getLong(0), n)
    }.filter(_._2 > 0).sortBy(x => (-x._2, x._1)).take(25).toSeq
    val unordGot = TextOps.phraseMatchSlop(docs, "hash", "join", 2, 25,
      inOrder = false).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(unordGot === unordWant && unordGot.nonEmpty)
    val unordAll = TextOps.phraseMatchSlop(docs, "hash", "join", 2, 10000,
      inOrder = false).count()
    assert(unordAll >= sloppy, "unordered must be a superset of in-order")
  }

  test("termsSetQuery keeps exactly the >= minShouldMatch docs") {
    val terms = Seq("dup", "merge", "vector", "window")
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.termsSetQuery(docs, terms, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val local = docs.collect().map { r =>
      r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+", -1).distinct.count(terms.contains).toLong
    }.toMap
    val expected = local.filter(_._2 >= 3)
    assert(got == expected)
    assert(expected.nonEmpty, "bound must keep some docs")
    assert(local.exists(v => v._2 > 0 && v._2 < 3),
      "minimum_should_match must exclude partial-match docs — the bound binds")
  }

  test("decayFunctionScore is the exact linear-decay pivot form") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.decayFunctionScore(ev, 50.0, 40.0, 0.1, 0.5, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val local = ev.select("event_id", "value").collect()
      .map { r =>
        val v = r.getDouble(1)
        val dist = math.max(math.abs(v - 50.0) - 0.1, 0.0)
        (r.getLong(0), v, math.max((80.0 - dist) / 80.0, 0.0))
      }
    val expected = local.sortBy(x => (-x._3, x._1)).take(20).toSeq
    assert(got.toSeq == expected)
    assert(got.head._3 == 1.0 && got.exists(_._3 < 1.0),
      "plateau and slope must both appear in the page")
  }

  test("gaussDecayScore: exhaustive floor-margin proof + naive recompute") {
    // The synthetic value domain is FINITE: v = k/100 for k in
    // [0, 100000] (2-decimal money doubles; every SF draws from this
    // grid — sf0.1 max is 560.21). Enumerate ALL of it and measure
    // each scaled score's distance to the nearest floor boundary,
    // normalized by the cross-libm drift bound (~1e-15 relative:
    // <= 2 ulp exp() gap between Java Math.exp and DuckDB's libm,
    // plus one multiply rounding). The grid multiplier M = 773856391
    // was chosen by exhaustive search to maximize exactly this
    // worst-case ratio (measured 411x at selection time); the spec
    // re-proves >= 100x so a changed constant cannot silently ship
    // with an unsafe margin. The ONE exact-integral point is
    // v = origin (k = 5000): exp(0) = 1 is an IEEE-mandated special
    // value every libm returns exactly, so both engines floor the
    // integral M identically — the geotile lat = 0 precedent.
    val (origin, scale, decay) = (50.0, 80.0, 0.5)
    val twoSigmaSq = scale * scale / math.log(1 / decay)
    val m = Analytics.GaussGridM
    var minRatio = Double.MaxValue
    val exactKs = scala.collection.mutable.ArrayBuffer[Int]()
    for (k <- 0 to 100000) {
      val d = math.abs(k / 100.0 - origin)
      val sm = math.exp(-(d * d) / twoSigmaSq) * m
      val f = sm - math.floor(sm)
      val margin = math.min(f, 1 - f)
      if (margin == 0.0) exactKs += k
      else minRatio = math.min(minRatio, margin / (1e-15 * sm))
    }
    assert(exactKs.toSeq == Seq(5000), s"unexpected exact-edge inputs: $exactKs")
    assert(minRatio > 100, s"floor margin only ${minRatio}x the drift bound")

    // naive recompute of the wired query (same Java libm — this pins
    // the plan/ordering; the cross-engine value pin is the margin
    // proof above + the driver's DuckDB hash compare)
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.gaussDecayScore(ev, origin, scale, decay, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val local = ev.select("event_id", "value").collect()
      .map { r =>
        val v = r.getDouble(1)
        val d = math.abs(v - origin)
        (r.getLong(0), v, math.floor(math.exp(-(d * d) / twoSigmaSq) * m).toLong)
      }
    val expected = local.sortBy(x => (-x._3, x._1)).take(20).toSeq
    assert(got.toSeq == expected)
    assert(got.map(_._3).distinct.size > 1, "page must show the decay slope")
  }

  test("expDecayScore: exhaustive floor-margin proof + naive recompute") {
    // The gauss discipline verbatim (see above): enumerate the ENTIRE
    // finite value domain v = k/100, k in [0, 100000], and prove every
    // scaled exp-decay score sits far from a floor boundary relative
    // to the cross-libm exp drift bound. M = 791765213 was searched
    // r15 for this score set (worst ratio ~1106x at selection); the
    // spec re-proves >= 100x. The one exact-integral point is
    // v = origin (exp(0) = 1, IEEE-exact in every libm).
    val (origin, scale, decay) = (50.0, 80.0, 0.5)
    val lambda = math.log(1 / decay) / scale
    val m = Analytics.ExpGridM
    var minRatio = Double.MaxValue
    val exactKs = scala.collection.mutable.ArrayBuffer[Int]()
    for (k <- 0 to 100000) {
      val d = math.abs(k / 100.0 - origin)
      val sm = math.exp(-(d * lambda)) * m
      val f = sm - math.floor(sm)
      val margin = math.min(f, 1 - f)
      if (margin == 0.0) exactKs += k
      else minRatio = math.min(minRatio, margin / (1e-15 * sm))
    }
    assert(exactKs.toSeq == Seq(5000), s"unexpected exact-edge inputs: $exactKs")
    assert(minRatio > 100, s"floor margin only ${minRatio}x the drift bound")

    val ev = Tables.events(spark, sfDir)
    val got = Analytics.expDecayScore(ev, origin, scale, decay, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val local = ev.select("event_id", "value").collect()
      .map { r =>
        val v = r.getDouble(1)
        val d = math.abs(v - origin)
        (r.getLong(0), v, math.floor(math.exp(-(d * lambda)) * m).toLong)
      }
    val expected = local.sortBy(x => (-x._3, x._1)).take(20).toSeq
    assert(got.toSeq == expected)
    assert(got.map(_._3).distinct.size > 1, "page must show the decay slope")
  }

  test("calendar date_histogram: tz edges are real instants (DST-short " +
      "weeks, offset-shifted months); January data splits at the NY new year") {
    // month edges, America/New_York: pinned against an independent
    // reference (Python zoneinfo — the constants below), spanning the
    // EST→EDT offset change: Mar 1 is UTC-5, Apr 1 is UTC-4
    val mo = Analytics.calendarEdgesUs("month", "America/New_York", 2023, 2027)
    assert(mo.length == 48)
    assert(mo.contains(1701406800000000L), "Dec 2023 00:00 EST = 05:00Z")
    assert(mo.contains(1704085200000000L), "Jan 2024 00:00 EST")
    assert(mo.contains(1709269200000000L), "Mar 2024 00:00 EST (UTC-5)")
    assert(mo.contains(1711944000000000L), "Apr 2024 00:00 EDT (UTC-4)")
    // the Mar→Apr bucket is 31 days MINUS the spring-forward hour
    assert(1711944000000000L - 1709269200000000L ==
      31L * 86400000000L - 3600000000L)
    // week ladder: ISO Mondays; the week containing 2024-03-10 (spring
    // forward) is 167 hours, the one containing 2024-11-03 is 169
    val wk = Analytics.calendarEdgesUs("week", "America/New_York", 2023, 2027)
    assert(wk.sliding(2).forall(p => p(0) < p(1)), "ladder must increase")
    val mar4 = 1709528400000000L; val mar11 = 1710129600000000L
    assert(wk.contains(mar4) && wk.contains(mar11))
    assert(mar11 - mar4 == 167L * 3600000000L, "DST-short week")
    val oct28 = 1730088000000000L; val nov4 = 1730696400000000L
    assert(wk.contains(oct28) && wk.contains(nov4))
    assert(nov4 - oct28 == 169L * 3600000000L, "DST-long week")
    // quarter edges are every third month edge
    val q = Analytics.calendarEdgesUs("quarter", "America/New_York", 2023, 2027)
    assert(q == mo.grouped(3).map(_.head).toIndexedSeq)

    // the wired query: January-2024 data MUST split at the NY new year
    // (first UTC hours of Jan 1 are Dec 31 in NY), and bucket counts
    // must match a naive recompute over the same ladder
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.calendarDateHistogram(ev, "month",
      "America/New_York", 2023, 2027).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == Set(1701406800000000L, 1704085200000000L),
      s"expected the Dec-2023/Jan-2024 NY split, got ${got.keySet}")
    val tsList = ev.select(graft.util.Det.tsMicrosOf(ev, "ts").as("us"))
      .collect().map(_.getLong(0))
    val naive = tsList.groupBy(us => mo.filter(_ <= us).max)
      .view.mapValues(_.length.toLong).toMap
    assert(got == naive)
  }

  test("calendarDateHistogram: out-of-window events key to NULL on " +
      "BOTH sides (ADVICE r15 — no silent fold into the final bucket)") {
    import spark.implicits._
    val mo = Analytics.calendarEdgesUs("month", "America/New_York", 2023, 2027)
    val endUs = Analytics.calendarWindowEndUs("month", "America/New_York", 2023, 2027)
    assert(endUs > mo.last, "window end must follow the last edge")
    // one event before the window, one inside, one at the end edge,
    // one far past it
    val ev = Seq(mo.head - 1L, mo.head + 5L, endUs, endUs + 86400000000L)
      .map(us => (us, 1.0)).toDF("us", "value")
      .select(timestamp_micros(col("us")).as("ts"), col("value"))
    val got = Analytics.calendarDateHistogram(ev, "month",
      "America/New_York", 2023, 2027).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1)))
      .toMap
    assert(got == Map(None -> 3L, Some(mo.head) -> 1L),
      s"pre-window + at-end + past-end must all key NULL, got $got")
  }

  test("dateHistogramFilled: events below epoch+offset bucket at " +
      "negative indices (true floor division), never silently drop") {
    import spark.implicits._
    val (itv, off) = (1000000L, 500000L)
    // us=100000 → shifted −400000 → floor idx −1; us=1600000 → idx 1
    val ev = Seq(100000L, 1600000L).map(us => (us, 2.0)).toDF("us", "value")
      .select(timestamp_micros(col("us")).as("ts"), col("value"))
    val got = Analytics.dateHistogramFilled(ev, itv, off, off, off)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // fill spans idx −1..1 (data extends both sides of the 1-bucket bounds)
    assert(got.map(_._1).toSeq == Seq(-500000L, 500000L, 1500000L), got.toSeq)
    assert(got.map(_._2).toSeq == Seq(1L, 0L, 1L), got.toSeq)
  }

  test("dateHistogramFilled: empty buckets materialize to the extended " +
      "bounds, offset shifts edges, data outside bounds still buckets") {
    val ev = Tables.events(spark, sfDir)
    val (itv, off) = (43200000000L, 10800000000L)
    val (lo, hi) = (1703894400000000L, 1706832000000000L)
    val got = Analytics.dateHistogramFilled(ev, itv, off, lo, hi).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // contiguous buckets, every edge ≡ offset (mod interval)
    assert(got.sliding(2).forall(p => p(1)._1 - p(0)._1 == itv))
    assert(got.forall(_._1 % itv == off % itv))
    // the January data leaves the bound-extended lead/tail empty
    assert(got.head._2 == 0L && got.last._2 == 0L,
      "extended_bounds must materialize empty edge buckets")
    assert(got.exists(_._2 > 0L))
    // empty buckets report sum 0.0 (the ES empty-bucket sum), and the
    // naive recompute agrees bucket-for-bucket
    assert(got.filter(_._2 == 0L).forall(_._3 == 0.0))
    val naive = ev.select(graft.util.Det.tsMicrosOf(ev, "ts").as("us"),
        col("value")).collect()
      .map(r => ((r.getLong(0) - off) / itv, r.getDouble(1)))
      .groupBy(_._1).view.mapValues { xs =>
        (xs.length.toLong, xs.map(x => BigDecimal(x._2)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      }.toMap
    got.foreach { case (start, n, sv) =>
      val (wn, wsv) = naive.getOrElse((start - off) / itv, (0L, 0.0))
      assert(n == wn && sv == wsv, s"bucket $start")
    }
    assert(naive.keySet == got.filter(_._2 > 0).map(g => (g._1 - off) / itv).toSet,
      "every data bucket must appear (bounds extend, never filter)")
  }

  test("rrfHybrid fuses lexical and semantic ranks, promoting dual-view docs") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val terms = Seq("dup", "query", "scan")
    val got = TextOps.rrfHybrid(docs, emb, terms, 7L, 30, 15).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getDouble(3)))

    // naive: rebuild both rankings locally, fuse with 1/(60+rank)
    val lex = TextOps.bm25Search(docs, terms, 30).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val vecs = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    val q = vecs(7L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val sem = vecs.toSeq.filter(_._1 != 7L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(30)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val expected = (lex.keySet ++ sem.keySet).toSeq.map { id =>
      val s = lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        sem.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, lex.get(id), sem.get(id), s)
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(15)
    assert(got.toSeq == expected)
    // the fusion property: the top hit sits in BOTH lists, and the
    // fused order disagrees with pure lexical order somewhere in the
    // page — an earlier fused hit with a worse (or absent) lex rank
    // than a later one. Neither ranking alone produces this order.
    val top = got.head
    assert(top._2.isDefined && top._3.isDefined, "top hit must be a dual-view doc")
    val reordered = got.indices.exists { i =>
      ((i + 1) until got.length).exists { j =>
        val (li, lj) = (got(i)._2, got(j)._2)
        li.isEmpty && lj.isDefined || (li.isDefined && lj.isDefined && li.get > lj.get)
      }
    }
    assert(reordered, "fusion must reorder vs the lexical ranking")
  }

  test("completionSuggest ranks prefix completions by weight, matching naive") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.completionSuggest(docs, "s", 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val local = docs.select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+", -1)
        .filter(_.startsWith("s")).map(t => (t, r.getLong(0))))
    val expected = local.groupBy(_._1).toSeq
      .map { case (t, os) => (t, os.length.toLong, os.map(_._2).distinct.length.toLong) }
      .sortBy { case (t, occ, df) => (-occ, -df, t) }.take(5)
    assert(expected.size == 5, "prefix must cover at least k vocab terms")
    assert(got.toSeq == expected)
    assert(expected.map(_._2).distinct.size > 1,
      "frequencies must differ so the weight ranking binds")
  }

  test("phraseSuggest corrects the chain by bigram plausibility, matching naive") {
    val probe = Seq("hsah", "jion", "tble")
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.phraseSuggest(docs, probe, 2, 3, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val texts = docs.select("text").collect()
      .map(_.getString(0).toLowerCase.split("\\s+", -1).toSeq)
    val vocab = texts.flatten.filter(_.nonEmpty).groupBy(identity)
      .map { case (t, o) => (t, o.size.toLong) }
    val bigrams = texts.flatMap(t => t.zip(t.drop(1)))
      .filter(p => p._1.nonEmpty && p._2.nonEmpty)
      .groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
    val cands = probe.map { t =>
      vocab.toSeq.map { case (w, f) => (w, f, lev(w, t).toLong) }
        .filter(_._3 <= 2)
        .sortBy { case (w, f, d) => (d, -f, w) }.take(3)
        .map { case (w, _, d) => (w, d) }
    }
    val expected = (for {
      (w0, d0) <- cands(0); (w1, d1) <- cands(1); (w2, d2) <- cands(2)
    } yield (s"$w0 $w1 $w2",
        bigrams.getOrElse((w0, w1), 0L) + bigrams.getOrElse((w1, w2), 0L),
        d0 + d1 + d2))
      .sortBy { case (s, b, d) => (-b, d, s) }.take(10)
    assert(got.toSeq == expected)
    assert(got.head._1 == "hash join table",
      "bigram chain must pick the co-occurring correction")
    assert(got.head._2 > 0, "winning chain must have real bigram support")
  }

  test("multiMatch best_fields equals a naive per-field recompute; boost binds") {
    val terms = Seq("hash", "join", "vector")
    val docs = Tables.documents(spark, sfDir)
      .filter(col("lang").isin("en", "de") && col("n_chars") >= 150)
    val body = split(lower(col("text")), "\\s+")
    val got = TextOps.multiMatch(docs,
        Seq(("title", slice(body, 1, 8), 4.0), ("body", body, 1.0)), terms, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))

    val local = docs.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).toLowerCase.split("\\s+", -1).toSeq
      val st = toks.take(8).count(terms.contains) * 4.0
      val sb = toks.count(terms.contains) * 1.0
      (r.getLong(0), st, sb, math.max(st, sb))
    }
    val expected = local.filter(_._4 > 0).sortBy(x => (-x._4, x._1)).take(15).toSeq
    assert(expected.size == 15, "filter context must leave at least k matching docs")
    assert(got.toSeq == expected)
    // best_fields must actually fire: some top doc's score comes from
    // the boosted title, not the body count
    assert(got.exists(r => r._2 > r._3), "boosted title field must win for some hit")
  }

  test("bm25Search matches a naive Lucene-formula recompute; rare term dominates") {
    val terms = Seq("dup", "query", "scan")
    val k1 = 1.2; val b = 0.75
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.bm25Search(docs, terms, 15).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    val local = docs.collect().map(r =>
      (r.getLong(0), r.getString(1).toLowerCase.split("\\s+", -1).toSeq))
    val nDocs = local.length.toLong
    val totalToks = local.map(_._2.size.toLong).sum
    val avgdl = totalToks.toDouble / nDocs
    val dfs = terms.map(t => local.count(_._2.contains(t)).toLong)
    val scored = local.map { case (id, toks) =>
      val dl = toks.size.toLong
      val tfs = terms.map(t => toks.count(_ == t).toLong)
      val score = terms.indices.map { i =>
        // DetLn.lnScala, not math.log — bm25 idf runs on the
        // dual-compiled libm-free ln since r14; the replica stays
        // bit-exact
        val idf = graft.util.DetLn.lnScala(1 + (nDocs - dfs(i) + 0.5) / (dfs(i) + 0.5))
        idf * (tfs(i) * (k1 + 1)) / (tfs(i) + k1 * ((1 - b) + b * (dl / avgdl)))
      }.reduce(_ + _)
      (id, dl, score, tfs)
    }
    val expected = scored.filter(_._4.exists(_ > 0))
      .sortBy(x => (-x._3, x._1)).take(15).map(x => (x._1, x._2, x._3)).toSeq
    assert(expected.size == 15, "query must match at least k docs at this SF")
    assert(got.toSeq == expected,
      s"got=${got.take(3).toSeq} expected=${expected.take(3)}")
    // the rare term (df ~5% of corpus) must dominate the ranking: every
    // top-5 hit contains it even though the common terms have higher tf
    val dupDocs = local.filter(_._2.contains("dup")).map(_._1).toSet
    assert(got.take(5).forall(h => dupDocs.contains(h._1)),
      "IDF must rank the rare term's docs first — raw TF cannot do this")
  }

  test("fieldValueFactor scores bit-match the DetLn Scala replica") {
    val orders = Tables.orders(spark, sfDir)
    val got = Analytics.fieldValueFactor(orders, 0.125, 1.5, 15).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 15)
    got.foreach { case (_, price, score) =>
      val expect = 1.5 * graft.util.DetLn.lnScala(1.0 + 0.125 * price)
      assert(java.lang.Double.doubleToLongBits(score) ==
        java.lang.Double.doubleToLongBits(expect),
        s"score $score != replica $expect at price $price")
    }
    // log1p is monotone in the field, so the page is the top-k by price
    val topPrices = orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15).collect().map(_.getAs[Double]("o_totalprice")).toSeq
    assert(got.map(_._2).toSeq == topPrices)
    // non-power-of-two factors are rejected (inexact scaling would put
    // an extra engine-dependent rounding inside the ln argument)
    intercept[IllegalArgumentException] {
      Analytics.fieldValueFactor(orders, 0.1, 1.5, 15)
    }
  }

  test("rankFeatureLog bit-matches the DetLn replica and ranks by value") {
    val events = Tables.events(spark, sfDir)
    val got = Analytics.rankFeatureLog(events, 0.25, 2.0, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 20)
    got.foreach { case (_, v, score) =>
      val expect = 2.0 * graft.util.DetLn.lnScala(1.0 + 0.25 * v)
      assert(java.lang.Double.doubleToLongBits(score) ==
        java.lang.Double.doubleToLongBits(expect))
    }
    intercept[IllegalArgumentException] {
      Analytics.rankFeatureLog(events, 0.3, 2.0, 20)
    }
  }

  test("ln-scoring domain guard: a negative feature value fails loudly") {
    // r14 ADVICE: a value < 0 puts 1 + scaling·value below DetLn's
    // x >= 1 domain and would drift IDENTICALLY on both engines — the
    // one failure class the oracle cannot catch, so it must raise.
    val spark2 = spark; import spark2.implicits._
    val bad = Seq((1L, 5.0), (2L, -0.5)).toDF("event_id", "value")
    val e = intercept[Exception] {
      Analytics.rankFeatureLog(bad, 0.25, 2.0, 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("below the ln(1+x) domain")), msgs(e))
    // in-domain data is untouched by the guard
    val ok = Seq((1L, 5.0), (2L, 0.0)).toDF("event_id", "value")
    val got = Analytics.rankFeatureLog(ok, 0.25, 2.0, 5).collect()
    assert(got.length == 2 && got.head.getLong(0) == 1L)
  }

  test("scriptedMetric folds the profit script exactly (signed cent-grain sums)") {
    val spark2 = spark; import spark2.implicits._
    // quarter-grain values: exact in double AND DECIMAL(12,2), so every
    // expected value below is exact arithmetic, not a tolerance check
    val ev = Seq(
      ("buy", 600.25), ("buy", 700.50), ("buy", 100.25), // 2 sales, 1 cost
      ("sell", 499.75), ("sell", 500.25)                 // boundary: > binds strictly
    ).toDF("event_type", "value")
    val got = Analytics.scriptedMetric(ev, 500.0).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got("buy") == ((1200.50, 700.50, 3L)))
    assert(got("sell") == ((0.50, 500.25, 2L)))
    // real-table conservation: Σ profit over buckets ≈ Σ sales − Σ costs
    // (bucket-wise decimal→double casts differ from one global cast by
    // ulps at most — tolerance, not equality)
    val real = Tables.events(spark, sfDir)
    val profit = Analytics.scriptedMetric(real, 500.0)
      .agg(sum(col("profit"))).head().getDouble(0)
    val parts = real.select(
        sum(when(col("value") > 500.0, col("value").cast("decimal(12,2)"))
          .otherwise(lit(0).cast("decimal(12,2)"))).cast("double"),
        sum(when(col("value") <= 500.0, col("value").cast("decimal(12,2)"))
          .otherwise(lit(0).cast("decimal(12,2)"))).cast("double"))
      .head()
    assert(math.abs(profit - (parts.getDouble(0) - parts.getDouble(1))) < 1e-6)
  }
}
