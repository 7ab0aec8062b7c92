package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.text.TextOps

/** Specs for the round-12 second widening wave: missing/global/children
  * aggs, terms partitioning, change_point, distance_feature, and the
  * dis_max / boosting / pinned / match_phrase_prefix /
  * frequent_item_sets search surface. Each operator gets a naive
  * recompute and, where a knob shapes the result, a knob-binds case. */
class EsExtrasSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("missingAgg: missing bucket equals the derived-null count and buckets cover the corpus") {
    val ev = Tables.events(spark, sfDir)
    val out = Analytics.missingAgg(ev, 5, 7).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ks = ev.select(expr("from_json(props, 'k BIGINT').k").as("k")).collect()
      .map(_.getLong(0))
    assert(out("__missing__") == ks.count(_ % 5 == 0).toLong)
    assert(out.values.sum == ks.length.toLong)
    // present buckets replay the c(k%7) rule
    val present = ks.filter(_ % 5 != 0).groupBy(k => s"c${k % 7}").view.mapValues(_.size.toLong)
    present.foreach { case (b, n) => assert(out(b) == n, s"bucket $b") }
  }

  test("globalAgg: one-pass conditional agg equals two separate aggregations") {
    val ev = Tables.events(spark, sfDir)
    val hit = col("event_type") === "purchase" && col("value") >= 50.0
    val got = Analytics.globalAgg(ev, hit).head()
    val hits = ev.filter(hit).agg(count(lit(1)),
      sum(col("value").cast("decimal(12,2)")).cast("double")).head()
    val all = ev.agg(count(lit(1)),
      sum(col("value").cast("decimal(12,2)")).cast("double")).head()
    assert(got.getLong(0) == hits.getLong(0) && got.getDouble(1) == hits.getDouble(1))
    assert(got.getLong(2) == all.getLong(0) && got.getDouble(3) == all.getDouble(1))
    assert(got.getLong(0) < got.getLong(2), "hit set must be a strict subset")
  }

  test("childrenAgg: per-parent-bucket child metrics match a naive recompute") {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val got = Analytics.childrenAgg(orders, lineitem).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val prio = orders.select("o_orderkey", "o_orderpriority").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val children = lineitem.select("l_orderkey").collect().map(_.getLong(0))
      .filter(prio.contains)
    val byPrio = children.groupBy(prio)
    byPrio.foreach { case (p, ks) =>
      val (nChildren, nParents) = got(p)
      assert(nChildren == ks.length.toLong, s"children of $p")
      assert(nParents == ks.distinct.length.toLong, s"parents of $p")
    }
    assert(got.keySet == byPrio.keySet)
  }

  test("termsPartition: the partitions are a disjoint exact cover of the terms facet") {
    val ev = Tables.events(spark, sfDir)
    val full = ev.groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parts = (0 until 4).map(p =>
      Analytics.termsPartition(ev, 4, p, 1000000).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    // disjoint
    parts.combinations(2).foreach { case Seq(a, b) =>
      assert(a.keySet.intersect(b.keySet).isEmpty)
    }
    // exact cover with identical counts
    val union = parts.reduce(_ ++ _)
    assert(union == full)
    // the partitioning is load-bearing: no single partition is the whole space
    assert(parts.forall(_.size < full.size))
  }

  test("changePoint: finds a planted step and replays the exact mean arithmetic") {
    // 10 days at mean 10, then 10 days at mean 50 → best split after day 9
    val rows = (0 until 20).flatMap { d =>
      val v = if (d < 10) 10.0 else 50.0
      Seq((d.toLong * 86400000000L + 1000L, v), (d.toLong * 86400000000L + 2000L, v + 2.0))
    }
    val ev = rows.toDF("us", "value")
      .select(timestamp_micros(col("us")).as("ts"), col("value"))
    val got = Analytics.changePoint(ev).head()
    assert(got.getLong(0) == 9L, s"split_after_day = ${got.getLong(0)}")
    assert(got.getLong(1) == 20L && got.getLong(2) == 20L)
    assert(got.getDouble(3) == 11.0 && got.getDouble(4) == 51.0)
    assert(got.getDouble(5) == 40.0)
  }

  test("distanceFeature: score is the exact rational decay and ordering is by µs distance") {
    val ev = Tables.events(spark, sfDir)
    val origin = 1705330000000000L
    val pivot = 86400000000L
    val got = Analytics.distanceFeature(ev, origin, pivot, 2.0, 20).collect()
    val naive = ev.select(col("event_id"), unix_micros(col("ts"))).collect()
      .map { r =>
        val d = math.abs(r.getLong(1) - origin)
        (r.getLong(0), 2.0 * pivot.toDouble / (pivot.toDouble + d.toDouble))
      }
      .sortBy { case (id, s) => (-s, id) }.take(20)
    assert(got.map(r => (r.getLong(0), r.getDouble(2))).toSeq == naive.toSeq)
  }

  test("disMax: tie_breaker=0.3 rewards dual-field hits past the best_fields order") {
    // docA: 8 title hits (also body hits) → fields (16, 8): best 16,
    //   dis_max 16 + 0.3·8 = 18.4. docB: 17 body hits past the title
    //   window → fields (0, 17): best 17, dis_max 17. tb=0 ranks docB
    //   first (17 > 16); tb=0.3 must flip to docA (18.4 > 17) — the
    //   dual-field doc wins only because the tie_breaker binds.
    val docs = docsDf(
      1L -> Seq.fill(8)("hash").mkString(" "),
      2L -> (Seq.fill(8)("x") ++ Seq.fill(17)("hash")).mkString(" "))
    val body = split(lower(col("text")), "\\s+")
    val fields = Seq(("title", slice(body, 1, 8), 2.0), ("body", body, 1.0))
    val terms = Seq("hash", "join")
    val tb = TextOps.disMax(docs, fields, terms, 0.3, 10).collect()
    assert(tb.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(tb.map(r => r.getAs[Double]("score")).toSeq == Seq(18.4, 17.0))
    val tb0 = TextOps.disMax(docs, fields, terms, 0.0, 10).collect()
    assert(tb0.map(_.getLong(0)).toSeq == Seq(2L, 1L), "tb=0 (best_fields) must rank docB first")
  }

  test("boostingQuery: negative matches are demoted, not excluded") {
    val docs = docsDf(
      1L -> "hash join vector stuff", // 2 positive hits but demoted → 0.6
      2L -> "hash only here",         // 1 hit, clean → 1.0
      3L -> "vector vector vector")   // no positive hit → filtered out
    val got = TextOps.boostingQuery(docs, Seq("hash", "join"), "vector", 0.3, 10).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 1L), "clean doc must outrank demoted")
    assert(got.map(r => r.getAs[Double]("score")).toSeq == Seq(1.0, 0.6))
    assert(got.map(r => r.getAs[Boolean]("demoted")).toSeq == Seq(false, true))
  }

  test("pinnedQuery: pins rank first in the given order, zero-score pins still surface") {
    val docs = docsDf(
      1L -> "hash hash hash", // top organic
      2L -> "hash join",
      3L -> "nothing relevant here", // pinned with zero score
      4L -> "hash")
    val got = TextOps.pinnedQuery(docs, Seq(3L, 2L), Seq("hash", "join"), 10).collect()
    // pinned 3 then 2 (in pin order), then organic 1, 4 by score desc
    assert(got.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L, 4L))
    assert(got.head.getAs[Long]("score") == 0L, "zero-score pin surfaces")
  }

  test("matchPhrasePrefix: adjacency with a prefixed second slot") {
    val docs = docsDf(
      1L -> "hash join here",    // match
      2L -> "hash joins galore", // prefix match
      3L -> "hash x join",       // not adjacent
      4L -> "join hash",         // wrong order
      5L -> "hash join hash jelly") // two matches
    val got = TextOps.matchPhrasePrefix(docs, "hash", "j", 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 2L))
  }

  test("matchPhrasePrefix: prefix covering the term matches repeated-term " +
      "phrases (hash h* on 'hash hash' — the r12 ADVICE class)") {
    val docs = docsDf(
      1L -> "hash hash x",       // repeated term, adjacent → match
      2L -> "hash x hash",       // not adjacent
      3L -> "hash hashing here") // prefix token ≠ term, still a match
    val got = TextOps.matchPhrasePrefix(docs, "hash", "h", 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 3L -> 1L))
  }

  test("matchBoolPrefix: term and prefix clauses, any suffices, scores add") {
    val docs = docsDf(
      1L -> "dup dup scan",  // tf(dup)=2 + one sc-prefix token = 3
      2L -> "query here",    // one term hit
      3L -> "scatter scan",  // two prefix hits, no full term
      4L -> "nothing else")  // no clause → absent
    val got = TextOps.matchBoolPrefix(docs, Seq("dup", "query"), "sc", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
  }

  test("rescoreSearch: only the first-pass window is rescored; combine " +
      "reorders within it, never admits from outside") {
    val docs = docsDf(
      1L -> "a a a a",                // top first-pass, no phrase
      2L -> "a b c",                  // in window, phrase hit
      3L -> "b c b c b c",            // no query term → never in the page
      4L -> "a b c b c b c b c x")    // query term but below window=2 (longer dl)
    val got = TextOps.rescoreSearch(docs, Seq("a"), "b", "c",
      window = 2, k = 2, queryWeight = 1.0, rescoreWeight = 100.0).collect()
    // window = top-2 by bm25 = docs 1,2; weight 100 lifts doc 2 above 1;
    // docs 3 (no term) and 4 (outside window) must not appear even though
    // their phrase scores are the highest in the corpus
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    val d2 = got.find(_.getLong(0) == 2L).get
    assert(d2.getAs[Long]("phrase_tf") == 1L)
    assert(d2.getAs[Double]("score") ==
      d2.getAs[Double]("first_score") * 1.0 + 100.0)
  }

  test("completionSuggestFuzzy: typo-tolerant completion, exact before fuzzy") {
    val docs = docsDf(
      1L -> "join join jolt",
      2L -> "jion here",          // the literal typo also indexes
      3L -> "joint venture join")
    // typed 'jion', fuzziness 2: join (dist 2), jion (0, exact), joint
    // (prefix 'join' dist 2), jolt (dist 3 → out)
    val got = TextOps.completionSuggestFuzzy(docs, "jion", 2, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.head == ("jion", 1L, 1L), "exact prefix match ranks first")
    val terms = got.map(_._1).toSet
    assert(terms == Set("jion", "join", "joint"))
    assert(!terms.contains("jolt"))
    // fuzziness 0 degrades to the plain completion suggester's contract
    val strict = TextOps.completionSuggestFuzzy(docs, "join", 0, 10).collect()
      .map(_.getString(0)).toSet
    assert(strict == Set("join", "joint"))
  }

  test("frequentItemSets: pair supports match a naive recompute over the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.frequentItemSets(docs, 20, 5L, 25).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // naive: top-20 vocab by doc frequency, then per-doc pair expansion
    val docTerms = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSet)
    val df = docTerms.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val vocab = df.toSeq.sortBy { case (t, n) => (-n, t) }.take(20).map(_._1).toSet
    val support = docTerms.toSeq
      .flatMap { case (_, ts) =>
        ts.intersect(vocab).toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) }
      }
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 5L).toMap
    val top = support.toSeq.sortBy { case ((a, b), s) => (-s, a, b) }.take(25).toMap
    assert(got == top)
    assert(got.nonEmpty)
  }

  test("frequentTriples: supports match a naive recompute; threshold binds") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.frequentTriples(docs, 20, 5L, 25).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val docTerms = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSet)
    val df = docTerms.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val vocab = df.toSeq.sortBy { case (t, n) => (-n, t) }.take(20).map(_._1).toSet
    val support = docTerms.toSeq
      .flatMap { case (_, ts) =>
        ts.intersect(vocab).toSeq.sorted.combinations(3)
          .map { case Seq(a, b, c) => (a, b, c) }
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = support.filter(_._2 >= 5L).toSeq
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }.take(25).toMap
    assert(got == top)
    assert(got.nonEmpty)

    // the support threshold must BIND on a crafted corpus: the rare
    // triple sits below minSupport while the common one survives
    import spark.implicits._
    val crafted = (
      (1 to 5).map(i => (i.toLong, "aa bb cc")) ++
        Seq((6L, "aa bb dd"))
      ).toDF("doc_id", "text")
    val out = TextOps.frequentTriples(crafted, 4, 5L, 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(("aa", "bb", "cc")),
      s"threshold must keep only the 5-doc triple, got $out")
  }

  test("termsEnum: ascending prefix term walk with doc frequencies, matching naive") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.termsEnum(docs, "s", 25).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val naive = docs.select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+").distinct)
      .filter(_.startsWith("s"))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy(_._1).take(25)
    assert(got == naive && got.nonEmpty)
    assert(got.map(_._1) == got.map(_._1).sorted, "ascending term order")
  }

  test("rangeSearch: exactly the cosine >= tau neighborhood of each query") {
    val emb = Tables.embeddings(spark, sfDir)
    val got = similarity.Ann.rangeSearch(emb, 10, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // naive: brute-force cosine over the collected corpus
    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val naive = (for {
      q <- vecs.keys.filter(_ < 10).toSeq
      c <- vecs.keys.filter(_ != q).toSeq
      s = cos(vecs(q), vecs(c)) if s >= 0.3
    } yield (q, c) -> s).toMap
    assert(got.keySet == naive.keySet)
    got.foreach { case (k, s) => assert(s >= 0.3 && math.abs(s - naive(k)) < 1e-12) }
    assert(got.nonEmpty)
  }

  test("tokenHistogram: buckets replay per-doc BPE counts") {
    val docs = Tables.documents(spark, sfDir)
    val got = pipeline.Pipeline.tokenHistogram(docs, 32L).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val perDoc = docs.select(col("source"),
        graft.text.Bpe.tokenCount(col("text")).as("t")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val naive = perDoc.groupBy { case (src, t) => (src, t / 32) }
      .map { case (k, rs) => k -> ((rs.length.toLong, rs.map(_._2).sum)) }
    assert(got == naive)
  }

  test("shardManifest: round-robin deal is balanced and replays the global rank") {
    val docs = Tables.documents(spark, sfDir)
    val got = pipeline.Pipeline.shardManifest(docs, 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    // naive: rank by (tokens desc, id), deal modulo 4
    val toks = docs.select(col("doc_id"),
        graft.text.Bpe.tokenCount(col("text")).as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dealt = toks.sortBy { case (id, t) => (-t, id) }.zipWithIndex
      .groupBy { case (_, rk) => rk.toLong % 4 }
    dealt.foreach { case (sh, rows) =>
      val (n, sum, _) = got(sh)
      assert(n == rows.length.toLong && sum == rows.map(_._1._2).sum, s"shard $sh")
    }
    // balance: doc counts within 1, token loads within one max-doc
    val counts = got.values.map(_._1)
    assert(counts.max - counts.min <= 1)
    val loads = got.values.map(_._2)
    assert(loads.max - loads.min <= toks.map(_._2).max,
      s"token imbalance ${loads.max - loads.min} exceeds one max doc")
  }

  test("variableWidthHistogram: clusters are ordered, disjoint, near-equal-count, and cover") {
    val ev = Tables.events(spark, sfDir)
    val got = operators.Analytics.variableWidthHistogram(ev, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val total = ev.count()
    assert(got.map(_._2).sum == total, "clusters must cover the corpus")
    assert(got.map(_._1).toSeq == (0L until got.length.toLong).toSeq)
    // value ranges are monotone and non-overlapping across clusters
    got.sliding(2).foreach {
      case Array((_, _, _, hiA), (_, _, loB, _)) => assert(hiA <= loB)
      case _ =>
    }
    // equal-frequency edges: each cluster within 2x of the ideal share
    // (ties at an edge can skew counts; the synthetic values are dense)
    val ideal = total.toDouble / 6
    got.foreach { case (c, n, _, _) =>
      assert(n >= ideal / 2 && n <= ideal * 2, s"cluster $c count $n vs ideal $ideal")
    }
  }

  test("runtimeFields: weekend facet replays the derived-field arithmetic") {
    val ev = Tables.events(spark, sfDir)
    val got = operators.Analytics.runtimeFields(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rows = ev.select(unix_micros(col("ts")), col("value")).collect()
      .map(r => ((r.getLong(0) / 86400000000L + 4) % 7, math.floor(r.getDouble(1) / 50.0).toLong))
    val weekend = rows.filter(r => r._1 == 0 || r._1 == 6)
    val naive = weekend.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == naive)
    assert(weekend.length < rows.length, "the runtime-field filter must bind")
  }

  test("randomSamplerAgg: md5-band sample with exactly rescaled estimates") {
    val ev = Tables.events(spark, sfDir)
    val got = operators.Analytics.randomSamplerAgg(ev, "200").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex3(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).take(2)
        .map(b => f"${b & 0xff}%02x").mkString.take(3)
    val naive = ev.select("event_id", "event_type").collect()
      .filter(r => hex3(r.getLong(0)) < "200")
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    assert(got.view.mapValues(_._1).toMap == naive)
    // the 1/p rescale is exact: p = 0x200/0x1000 = 0.125
    got.foreach { case (t, (n, est)) => assert(est == n / 0.125, s"estimate of $t") }
    val total = ev.count()
    val sampled = got.values.map(_._1).sum
    assert(sampled > 0 && sampled < total / 4, "sample must be a small strict subset")
  }

  test("counterRate: reset-aware increase matches a naive per-series replay") {
    val ev = Tables.events(spark, sfDir)
    val got = operators.Analytics.counterRate(ev, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    val rows = ev.select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    var resets = 0
    val naive = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val incs = sorted.zip(BigDecimal(0) +: sorted.map(_._4)).zipWithIndex.map {
        case (((_, _, _, v), prev), idx) =>
          if (idx == 0) BigDecimal(0)
          else if (v >= prev) v - prev
          else { resets += 1; v }
      }
      val span = sorted.map(_._2).max - sorted.map(_._2).min
      if (span > 0)
        Some(u -> ((sorted.length.toLong, incs.sum.toDouble, span,
          incs.sum.toDouble * 3600000000.0 / span.toDouble)))
      else None
    }
    got.foreach { case (u, n, inc, span, rate) =>
      val (en, einc, espan, erate) = naive(u)
      assert(n == en && inc == einc && span == espan && rate == erate, s"user $u")
    }
    assert(resets > 0, "the reset branch must fire on the synthetic counters")
    // top-20 selection replayed
    val expectTop = naive.toSeq.map { case (u, (_, _, _, r)) => (u, r) }
      .sortBy { case (u, r) => (-r, u) }.take(20).map(_._1)
    assert(got.map(_._1).toSeq == expectTop)
  }

  test("spanFirst: position bound binds and counts replay") {
    val docs = docsDf(
      1L -> "hash right at the start",
      2L -> ("x " * 12 + "hash too late"),    // position 13 — excluded
      3L -> "a hash b hash c",                // positions 2 and 4
      4L -> "no match here")
    val got = TextOps.spanFirst(docs, "hash", 12, 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1L, 1L)), 3L -> ((2L, 2L))))
    val loose = TextOps.spanFirst(docs, "hash", 100, 10).collect().map(_.getLong(0)).toSet
    assert(loose == Set(1L, 2L, 3L), "the end bound must bind")
  }

  test("combinedFieldsSearch: BM25F over weighted counts matches a naive replay, weights bind") {
    val docs = Tables.documents(spark, sfDir)
    val terms = Seq("merge", "query", "scan")
    val got = TextOps.combinedFieldsSearch(docs, terms, 8, 2L, 1L, 15).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // naive: weighted tf/dl per doc, shared-IDF BM25 in term order
    // limit -1 keeps trailing empties, matching Spark's split()
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+", -1))
    val perDoc = raw.map { case (id, toks) =>
      val (tt, bt) = toks.splitAt(8)
      val dl = 2L * tt.length + bt.length
      val tfs = terms.map(t => 2L * tt.count(_ == t) + bt.count(_ == t))
      (id, dl, tfs)
    }
    val nDocs = perDoc.length.toLong
    val totalToks = perDoc.map(_._2).sum
    val avgdl = totalToks.toDouble / nDocs
    val dfs = terms.indices.map(i => perDoc.count(_._3(i) > 0).toLong)
    def score(dl: Long, tfs: Seq[Long]): Double =
      terms.indices.map { i =>
        val tf = tfs(i); val df = dfs(i)
        val idf = graft.util.DetLn.lnScala(1 + (nDocs - df + 0.5) / (df + 0.5)) // r14: bm25-family idf is DetLn
        idf * (tf * (1.2 + 1)) / (tf + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl)))
      }.sum
    val naive = perDoc.filter(_._3.exists(_ > 0))
      .map { case (id, dl, tfs) => (id, dl, score(dl, tfs)) }
      .sortBy { case (id, _, s) => (-s, id) }.take(15)
    assert(got.toSeq == naive.toSeq)
    // the title weight binds: (1,1) weights = plain BM25, different scores
    val flat = TextOps.combinedFieldsSearch(docs, terms, 8, 1L, 1L, 15).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.exists { case (id, _, s) => flat.get(id).forall(_ != s) },
      "weighted scores must differ from the unweighted field merge")
  }

  test("linearRetriever: min-max normalized fusion replays and reorders both views") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val terms = Seq("dup", "query", "scan")
    val got = TextOps.linearRetriever(docs, emb, terms, 7L, 30, 15, 0.75, 0.25)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    // replay from the two pages (the operator's own bounded inputs)
    val lexPage = TextOps.bm25Search(docs, terms, 30).collect()
      .map(r => r.getLong(0) -> r.getDouble(2))
    val qv = emb.filter(col("vec_id") === 7L).select("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray
    val semPage = emb.filter(col("vec_id") =!= 7L).collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        var dot = 0.0; var na = 0.0; var nb = 0.0
        v.indices.foreach { i => dot += qv(i) * v(i); na += qv(i) * qv(i); nb += v(i) * v(i) }
        r.getLong(0) -> dot / (math.sqrt(na) * math.sqrt(nb))
      }.sortBy { case (id, c) => (-c, id) }.take(30)
    def norm(page: Seq[(Long, Double)]): Map[Long, Double] = {
      val lo = page.map(_._2).min; val hi = page.map(_._2).max
      page.map { case (id, s) =>
        id -> (if (hi == lo) 1.0 else (s - lo) / (hi - lo)) }.toMap
    }
    val lexN = norm(lexPage.toSeq); val semN = norm(semPage.toSeq)
    val naive = (lexN.keySet ++ semN.keySet).toSeq
      .map(id => id -> (0.75 * lexN.getOrElse(id, 0.0) + 0.25 * semN.getOrElse(id, 0.0)))
      .sortBy { case (id, s) => (-s, id) }.take(15)
    assert(got.toSeq == naive)
    // the weights bind: a sem-heavy fusion ranks differently than the
    // wired lex-heavy one (at sf0.001 the 0.75 lex weight legitimately
    // dominates the page, so compare two weightings, not views)
    val semHeavy = TextOps.linearRetriever(docs, emb, terms, 7L, 30, 15, 0.25, 0.75)
      .collect().map(_.getLong(0)).toSeq
    assert(semHeavy != got.map(_._1).toSeq, "weights must bind")
    // and both views contribute: some fused doc carries both norms
    val both = TextOps.linearRetriever(docs, emb, terms, 7L, 30, 15, 0.75, 0.25)
      .collect().count(r => !r.isNullAt(1) && !r.isNullAt(2))
    assert(both > 0, "no doc scored in both views — fusion is vacuous")
  }

  test("ipPrefixFacet: /12 subnets partition the derived IP space and nest inside /8") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.ipPrefixFacet(ev, 12).collect()
      .map(r => r.getLong(1) -> ((r.getString(0), r.getLong(2), r.getLong(3)))).toMap
    // replay the derivation
    val rows = ev.select("user_id").collect().map(_.getLong(0))
    def u32(uid: Long) =
      10L * 16777216L + (uid * 7 % 256) * 65536L + (uid * 13 % 256) * 256L + uid % 256
    val naive = rows.map(u32).groupBy(u => u - (u % 1048576L))
    assert(got.keySet == naive.keySet)
    naive.foreach { case (p, us) => assert(got(p)._2 == us.length.toLong, s"prefix $p") }
    // every subnet is inside 10.0.0.0/8 and dotted form ends in /12
    got.values.foreach { case (subnet, _, _) =>
      assert(subnet.startsWith("10.") && subnet.endsWith("/12"), subnet)
    }
    // the prefix is coarser than the raw ip (fewer buckets than distinct ips)
    assert(got.size < rows.map(u32).distinct.length)
  }

  test("bucketScript: per-day ratio replays and the gap policy drops zero denominators") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.bucketScript(ev).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val rows = ev.select(unix_micros(col("ts")), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0) / 86400000000L, r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val naive = rows.groupBy(_._1).flatMap { case (d, rs) =>
      val p = rs.filter(_._2 == "purchase").map(_._3)
      val c = rs.filter(_._2 == "click").map(_._3)
      if (p.nonEmpty && c.nonEmpty && c.sum > 0)
        Some(d -> ((p.sum.toDouble, c.sum.toDouble, p.sum.toDouble / c.sum.toDouble)))
      else None
    }
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("rankFeature: saturation scores replay exactly and saturate below boost") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.rankFeature(ev, 50.0, 2.0, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val naive = ev.select("event_id", "value").collect()
      .map(r => (r.getLong(0), 2.0 * r.getDouble(1) / (r.getDouble(1) + 50.0)))
      .sortBy { case (id, s) => (-s, id) }.take(20)
    assert(got.toSeq == naive.toSeq)
    assert(got.forall(_._2 < 2.0), "saturation never reaches the boost asymptote")
  }

  test("parentAgg: each parent counted once per bucket") {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val got = Analytics.parentAgg(orders, lineitem).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val pairs = lineitem.select("l_returnflag", "l_orderkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    val naive = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(got == naive)
    // the dedup binds: raw child rows exceed the distinct parent count
    val rawCounts = lineitem.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(naive.exists { case (k, n) => rawCounts(k) > n },
      "some parent must have multiple children in a bucket")
  }

  test("extendedStatsBucket: second moments replay from the bucket values") {
    val ev = Tables.events(spark, sfDir)
    val row = Analytics.extendedStatsBucket(ev).head()
    val sums = ev.select(unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0) / 86400000000L,
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (_, rs) => rs.map(_._2).sum }.toSeq
    val n = sums.length
    val s1 = sums.sum.toDouble
    val s2 = sums.map(s => (s * s).setScale(4)).sum.toDouble
    assert(row.getLong(0) == n.toLong)
    assert(row.getDouble(3) == s1 && row.getDouble(5) == s2)
    val variance = s2 / n - (s1 / n) * (s1 / n)
    assert(row.getDouble(6) == variance)
    assert(row.getDouble(7) == math.sqrt(variance))
  }

  test("bucketCorrelation: exact-power-sum Pearson replays and is a valid r") {
    val ev = Tables.events(spark, sfDir)
    val row = Analytics.bucketCorrelation(ev).head()
    val series = ev.select(unix_micros(col("ts")), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0) / 86400000000L, r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (_, rs) =>
        (rs.filter(_._2 == "purchase").map(_._3).sum,
          rs.filter(_._2 == "click").map(_._3).sum)
      }.toSeq
    val n = series.length
    def d(b: BigDecimal) = b.toDouble
    val sx = d(series.map(_._1).sum); val sy = d(series.map(_._2).sum)
    val sxy = d(series.map { case (x, y) => (x * y).setScale(4) }.sum)
    val sxx = d(series.map { case (x, _) => (x * x).setScale(4) }.sum)
    val syy = d(series.map { case (_, y) => (y * y).setScale(4) }.sum)
    val r = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(row.getLong(0) == n.toLong)
    assert(row.getDouble(1) == r)
    assert(math.abs(r) <= 1.0)
  }

  test("intervalsQuery: ordered triples within max_gaps, the gap bound binds") {
    val docs = docsDf(
      1L -> "hash join scan end",          // gaps 0 → matches
      2L -> "hash x x join scan",          // span 5, gaps 2
      3L -> "scan join hash",              // wrong order → no match
      4L -> "hash scan join",              // no t2 between t1 and t3
      5L -> "hash a b c d e f join scan")  // gaps 6 — at the bound
    val got = TextOps.intervalsQuery(docs, "hash", "join", "scan", 6, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
    val tight = TextOps.intervalsQuery(docs, "hash", "join", "scan", 1, 10)
      .collect().map(_.getLong(0)).toSet
    assert(tight == Set(1L), "max_gaps must bind")
  }

  test("termsLookup: set-membership sharing with the lookup doc, lookup excluded") {
    val docs = Tables.documents(spark, sfDir)
    val got = TextOps.termsLookup(docs, 42L, 1000000).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSet)
      .toMap
    val lookup = all(42L)
    val naive = (all - 42L).view
      .mapValues(ts => ts.intersect(lookup).size.toLong)
      .filter(_._2 > 0).toMap
    assert(got == naive)
    assert(!got.contains(42L), "the lookup doc is excluded per ES")
    // set membership, not TF: a doc repeating a shared term scores by
    // DISTINCT overlap (already enforced by the naive equality above)
  }

  test("timeSeriesAgg: struct-max last values equal the windowed argmax per series bucket") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.timeSeriesAgg(ev, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    val rows = ev.select(col("user_id"), unix_micros(col("ts")),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0) % 10, r.getLong(1) / 86400000000L,
        r.getLong(1), r.getLong(2), r.getDouble(3)))
    val naive = rows.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      val last = rs.maxBy(r => (r._3, r._4))
      k -> ((rs.length.toLong, last._3, last._4, last._5))
    }
    assert(got == naive)
    assert(got.size > rows.map(_._1).distinct.length,
      "buckets must split series across days, not collapse to one row per dim")
  }

  test("rankEval: metrics replay from the page and the judgment set") {
    val docs = Tables.documents(spark, sfDir)
    val terms = Seq("dup", "query", "scan")
    val row = TextOps.rankEval(docs, terms, 20).head()
    // replay: page from the same bm25 operator, judgments from collect
    val page = TextOps.bm25Search(docs, terms, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, s) => (-s, id) }.map(_._1)
    val rel = docs.select("doc_id", "text").collect()
      .filter { r =>
        val t = r.getString(1).toLowerCase.split("\\s+")
        terms.forall(q => t.contains(q))
      }.map(_.getLong(0)).toSet
    val ranks = page.zipWithIndex.map { case (id, i) => (id, i + 1) }
    val hits5 = ranks.count { case (id, rk) => rel(id) && rk <= 5 }
    val hits10 = ranks.count { case (id, rk) => rel(id) && rk <= 10 }
    val hitsN = ranks.count { case (id, _) => rel(id) }
    val firstRel = ranks.collectFirst { case (id, rk) if rel(id) => rk }
    assert(row.getLong(0) == rel.size.toLong)
    assert(row.getDouble(1) == hits5.toDouble / 5)
    assert(row.getDouble(2) == hits10.toDouble / 10)
    assert(row.getDouble(3) == hitsN.toDouble / rel.size)
    assert(row.getDouble(4) == firstRel.map(1.0 / _).getOrElse(0.0))
    assert(rel.nonEmpty && row.getDouble(4) > 0,
      "the judgment set and the MRR must be non-vacuous")
    // degenerate judgment set: a term no document carries → n_relevant 0
    // must yield null recall (not an ANSI DIVIDE_BY_ZERO crash) and 0 MRR
    val zero = TextOps.rankEval(docs, Seq("dup", "query", "zzznothere"), 20).head()
    assert(zero.getLong(0) == 0L && zero.isNullAt(3) && zero.getDouble(4) == 0.0)
  }

  test("rankEvalDcg: NDCG@10 replays from the page with the literal " +
      "discount ladder (r15)") {
    val docs = Tables.documents(spark, sfDir)
    val terms = Seq("dup", "query", "scan")
    val row = TextOps.rankEvalDcg(docs, terms, 20).head()
    val page = TextOps.bm25Search(docs, terms, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, s) => (-s, id) }.map(_._1)
    val rel = docs.select("doc_id", "text").collect()
      .filter { r =>
        val t = r.getString(1).toLowerCase.split("\\s+")
        terms.forall(q => t.contains(q))
      }.map(_.getLong(0)).toSet
    val d = TextOps.dcgDiscounts
    // the exact left-assoc chain the engine computes: per-rank pivots
    // (0.0 where irrelevant), summed rank 1 -> 10
    val dcg = (1 to 10).map { r =>
      page.lift(r - 1).filter(rel).map(_ => d(r - 1)).getOrElse(0.0)
    }.reduce(_ + _)
    val idcg = TextOps.dcgIdealPrefix(math.min(rel.size, 10) - 1)
    assert(row.getLong(0) == rel.size.toLong)
    assert(row.getDouble(1) == dcg)
    assert(row.getDouble(2) == dcg / idcg)
    assert(dcg > 0 && row.getDouble(2) <= 1.0 + 1e-12,
      "NDCG must be non-vacuous and normalized")
    // the discount ladder is what it claims: 1/log2(r+1), descending
    (1 to 10).foreach(r =>
      assert(d(r - 1) == 1.0 / (math.log(r + 1.0) / math.log(2.0))))
    assert(d.sliding(2).forall(p => p(0) > p(1)))
    // degenerate judgment set -> null NDCG, zero DCG, no crash
    val zero = TextOps.rankEvalDcg(docs, Seq("dup", "query", "zzznothere"), 20).head()
    assert(zero.getLong(0) == 0L && zero.getDouble(1) == 0.0 && zero.isNullAt(2))
  }

  test("searchAsYouType: shingle adjacency outranks scattered terms; " +
      "naive replay agrees (r15)") {
    val spark2 = spark; import spark2.implicits._
    val crafted = Seq(
      (1L, "part filter small end"),      // adjacent: all three granularities hit
      (2L, "filter part smoke xx"),       // same terms scattered: root only
      (3L, "nothing relevant here at all")
    ).toDF("doc_id", "text")
    val got = TextOps.searchAsYouType(crafted, "part filter sm", 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 6L, s"adjacent doc: ${got.get(1L)}") // 3 root + 2 bigram + 1 trigram
    assert(got(2L) == 3L, s"scattered doc: ${got.get(2L)}") // root only
    assert(!got.contains(3L))
    // naive replay over the real corpus
    val real = Tables.documents(spark, sfDir)
    def score(text: String): Long = {
      val t = text.toLowerCase.split("\\s+").toSeq
      val sh2 = t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val sh3 = t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      t.count(_ == "part") + t.count(_ == "filter") + t.count(_.startsWith("sm")) +
        sh2.count(_ == "part filter") + sh2.count(_.startsWith("filter sm")) +
        sh3.count(_.startsWith("part filter sm"))
    }
    val want = real.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), score(r.getString(1))))
      .filter(_._2 > 0)
      .sortBy { case (id, s) => (-s, id) }.take(20).toSeq
    val gotReal = TextOps.searchAsYouType(real, "part filter sm", 20).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }.toSeq
    assert(gotReal == want)
    assert(gotReal.nonEmpty)
  }

  test("idsQuery: exactly the requested ids, In predicate pushed (r15)") {
    val docs = Tables.documents(spark, sfDir)
    val df = TextOps.idsQuery(docs, Seq(3L, 41L, 172L, 400L))
    val got = df.collect().map(_.getLong(0)).toSeq
    assert(got == got.sorted && got.toSet.subsetOf(Set(3L, 41L, 172L, 400L)))
    assert(got.nonEmpty)
    // the id set must reach the SCAN node. In a shared session the
    // cache manager substitutes a cached InMemoryRelation for ANY
    // logically-equal read (even a fresh spark.read of the same path),
    // so accept either pushed shape: parquet PushedFilters, or the
    // predicate on the InMemoryTableScan (cache-batch pruning)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("In(doc_id") ||
      (plan.contains("InMemoryTableScan") && plan.contains("IN (3,41,172,400)")),
      s"id set must reach the scan node:\n$plan")
  }

  test("payloadDedup: byte-identical payloads group under one keeper") {
    val docs = docsDf(
      1L -> "same bytes here",
      2L -> "unique content",
      9L -> "same bytes here", // duplicate of 1
      4L -> "also unique")
    val got = multimodal.Multimodal.payloadDedup(docs).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L, "2 copies, keeper = min id")
    assert(r.getLong(3) == "same bytes here".getBytes("UTF-8").length.toLong)
    assert(r.getLong(4) == r.getLong(3), "wasted = (copies-1) × size")
  }

  test("percolateDsl: stored bool trees replay per-doc, minimum_should_match binds") {
    val docs = Tables.documents(spark, sfDir)
    import graft.text.BoolDsl._
    val trees = Seq(
      "pq1" -> Bool(must = Seq(MatchQ("hash")),
        filter = Seq(RangeQ("n_chars", gte = Some(200)))),
      "pq2" -> Bool(should = Seq(MatchQ("join"), MatchQ("vector")),
        filter = Seq(TermQ("lang", "en")), minimumShouldMatch = 1),
      "pq3" -> Bool(must = Seq(MatchQ("scan")),
        mustNot = Seq(TermQ("source", "src13"))))
    val got = percolateDsl(docs, trees).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val rows = docs.select("doc_id", "text", "lang", "source", "n_chars").collect()
    def tf(text: String, t: String) =
      text.toLowerCase.split("\\s+").count(_ == t)
    val naive = rows.flatMap { r =>
      val (id, tx, lang, src, nc) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))
      Seq(
        Option.when(tf(tx, "hash") > 0 && nc >= 200)(id -> "pq1"),
        Option.when(lang == "en" && (tf(tx, "join") > 0 || tf(tx, "vector") > 0))(id -> "pq2"),
        Option.when(tf(tx, "scan") > 0 && src != "src13")(id -> "pq3")).flatten
    }.toSet
    assert(got == naive)
    // each stored query matches some but not all docs
    Seq("pq1", "pq2", "pq3").foreach { q =>
      val n = got.count(_._2 == q)
      assert(n > 0 && n < rows.length, s"$q matched $n")
    }
    // dropping the explicit msm widens pq2 to every lang=en doc
    val loose = percolateDsl(docs, Seq(
      "pq2" -> Bool(should = Seq(MatchQ("join"), MatchQ("vector")),
        filter = Seq(TermQ("lang", "en"))))).count()
    assert(loose > got.count(_._2 == "pq2"), "minimum_should_match must bind")
  }

  test("sparseVectorQuery scores the integer dot product and prunes by df ratio") {
    val spark2 = spark; import spark2.implicits._
    val docs = Seq(
      (1L, "hot hot cold rare"),   // hot tf 2, cold 1, rare 1
      (2L, "hot cold cold"),
      (3L, "hot warm"),
      (4L, "hot other words here")
    ).toDF("doc_id", "text")
    val w = Seq(("hot", 5L), ("cold", 3L), ("rare", 7L))
    // no pruning (threshold 100%): plain dot product
    val all = TextOps.sparseVectorQuery(docs, w, prunePpm = 1000000L, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all == Map(1L -> (2 * 5 + 3 + 7L), 2L -> (5 + 6L), 3L -> 5L, 4L -> 5L))
    // prune 'hot' (df 4/4 = 100% > 70%): scores drop to cold/rare only,
    // zero-score docs (3, 4) vanish
    val pruned = TextOps.sparseVectorQuery(docs, w, prunePpm = 700000L, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pruned == Map(1L -> 10L, 2L -> 6L))
    // everything pruned -> typed empty frame, not a crash
    val none = TextOps.sparseVectorQuery(docs, Seq(("hot", 5L)), 100000L, 10)
    assert(none.count() == 0 && none.columns.toSeq == Seq("doc_id", "score"))
    // the WIRED threshold genuinely splits the real corpus's query terms
    val real = Tables.documents(spark, sfDir)
    val nDocs = real.count()
    val dfOf = real.select(explode(array_distinct(
        split(lower(col("text")), "\\s+"))).as("term"))
      .filter(col("term").isin("scan", "hash", "window", "vector", "batch", "merge"))
      .groupBy("term").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val prunedReal = dfOf.count { case (_, df) => df * 1000000L > 790000L * nDocs }
    assert(prunedReal > 0 && prunedReal < dfOf.size,
      s"prune rule must split the wired terms, got $dfOf")
  }

  test("termVectors reports tf/first_pos and corpus df/ttf for one doc") {
    val spark2 = spark; import spark2.implicits._
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "b b d"),
      (3L, "a d d")
    ).toDF("doc_id", "text")
    val got = TextOps.termVectors(docs, 1L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // term -> (tf, first_pos, doc_freq, ttf)
    assert(got == Map(
      "a" -> ((2L, 0L, 2L, 3L)),
      "b" -> ((1L, 1L, 2L, 3L)),
      "c" -> ((1L, 3L, 1L, 1L))))
    // doc 2's vector is independent of doc 1's
    val got2 = TextOps.termVectors(docs, 2L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 == Map("b" -> 2L, "d" -> 1L))
  }
}
