package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.similarity.Ann
import graft.text.TextOps

/** Specs for the round-1 widening wave: as-of join, IVF ANN, HLL
  * cardinality, chunking, and deterministic hash sampling. */
class NewOpsSpec extends SparkSpec {

  test("asofJoin matches a naive per-row lookup") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.asofJoin(ev, "purchase", "click").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap

    // naive oracle: for each purchase, scan all clicks of that user
    val rows = ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type")).collect()
    val clicks = rows.filter(_.getString(3) == "click")
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        // dedupe to max event_id per (user, ts) like the operator
        u -> rs.groupBy(_.getLong(2)).map { case (ts, g) => (ts, g.map(_.getLong(1)).max) }.toSeq
      }
    val purchases = rows.filter(_.getString(3) == "purchase")
    assert(got.size == purchases.length)
    purchases.foreach { p =>
      val best = clicks.getOrElse(p.getLong(0), Seq.empty)
        .filter(_._1 <= p.getLong(2))
        .sortBy(c => (c._1, c._2)).lastOption
      val (mId, mTs) = got(p.getLong(1))
      assert(mTs == best.map(_._1) && mId == best.map(_._2),
        s"purchase ${p.getLong(1)}: got ($mId,$mTs) want $best")
    }
  }

  test("ivfTopK (Lloyd-refined) recall@5 >= 0.7 and rank-1 mostly exact") {
    val emb = Tables.embeddings(spark, sfDir)
    val exactRows = Ann.bruteForceTopK(emb, 10, 5).collect()
    val exact = exactRows
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exactR1 = exactRows.filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
    val approxRows = Ann.ivfTopK(emb, 10, 5).collect()
    val approx = approxRows
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approxR1 = approxRows.filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(approx.nonEmpty)
    val recalls = exact.keys.toSeq.map { q =>
      val hit = approx.getOrElse(q, Set.empty)
      exact(q).intersect(hit).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean IVF recall@5 too low: $mean")
    val r1Exact = exactR1.keys.count(q => approxR1.get(q).contains(exactR1(q)))
    assert(r1Exact.toDouble / exactR1.size >= 0.7,
      s"IVF rank-1 exactness too low: $r1Exact/${exactR1.size}")
  }

  test("ivfTopK fold form: no Window node, output == window replica") {
    // r14 VERDICT minor: the probed-list ranking moved from a
    // row_number window to the bounded TopKPairs fold. Equivalence is
    // pinned against an inline window replica of the OLD form (same
    // probe lists, same tie-break score desc / cand_id asc), and the
    // physical plan must carry no Window node (the fold ships ≤ k
    // pairs per query per partition map-side).
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sfDir)
    val fold = Ann.ivfTopK(emb, 10, 5)
    assert(!fold.queryExecution.executedPlan.toString.contains("Window"),
      "ivfTopK must rank via the TopKPairs fold, not a window")
    val got = fold.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    // window replica over the SAME candidate generation
    val cents = Ann.lloydCentroids(emb, 16, 3)
    val assign = Ann.centroidAssigner(emb.sparkSession, Ann.centMatrix(cents))
    val corpus = emb.select(col("vec_id").as("cand_id"),
      col("embedding").as("c_emb"),
      assign(col("embedding"), 1).getItem(0).as("cent_id"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(assign(col("embedding"), 4)).as("cent_id"))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("cand_id"))
    val want = broadcast(queries).join(corpus, Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", graft.functions.GraftFunctions.cosineSim(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("cand_id"))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq,
      s"fold/window divergence: ${got.toSeq.diff(want.toSeq).take(5)}")
  }

  test("embeddingNearDupLsh at the wired τ=0.45: non-empty subset of exact, good recall") {
    // τ=0.45 is the regime SparkEntry wires (inside the data's
    // similarity range at every SF — τ=0.6 returns the empty set and
    // would make any breakage invisible); this exercises that exact
    // parameterization end-to-end, including the auto-sizer.
    import graft.dedup.Dedup
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Dedup.embeddingNearDup(emb, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH produced non-pairs: ${lsh.diff(exact).take(3)}")
    assert(exact.nonEmpty, "verify data must contain ≥0.45-cosine pairs")
    assert(lsh.nonEmpty, "the wired regime must produce a non-empty, checkable result")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall too low: $recall (${lsh.size}/${exact.size})")
  }

  test("embeddingNearDupIvf finds a subset of the exact pairs with good recall") {
    import graft.dedup.Dedup
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Dedup.embeddingNearDup(emb, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Dedup.embeddingNearDupIvf(emb, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.subsetOf(exact), s"IVF produced non-pairs: ${ivf.diff(exact).take(3)}")
    assert(exact.nonEmpty)
    val recall = ivf.size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall (${ivf.size}/${exact.size})")
  }

  test("containment catches quote-inclusion pairs that Jaccard misses") {
    import graft.dedup.Dedup
    val docs0 = Tables.documents(spark, sfDir)
    // the wiring's injection: every 17th doc quotes its predecessor
    val donor = docs0.select((col("doc_id") + 1).as("doc_id"),
      col("text").as("donor_text"))
    val docs = docs0.join(donor, Seq("doc_id"), "left")
      .withColumn("text",
        when(col("doc_id") % 17 === 0 && col("donor_text").isNotNull,
          concat(col("text"), lit(" "), col("donor_text")))
          .otherwise(col("text")))
      .select("doc_id", "text")
    val got = Dedup.containment(docs, 3, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // naive recompute, same k-min=4 candidate rule
    val sh = docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> r.getString(1).split(" ").sliding(3)
        .filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val kmin = sh.map { case (id, s) => id -> s.toSeq.sorted.take(4).toSet }.toMap
    val want = (for {
      i <- sh.indices; j <- (i + 1) until sh.length
      (ida, a) = sh(i); (idb, b) = sh(j)
      if (kmin(ida) & kmin(idb)).nonEmpty
      c = (a & b).size.toDouble / math.min(a.size, b.size)
      if c >= 0.9
    } yield (math.min(ida, idb), math.max(ida, idb), c)).toSet
    assert(got.toSet === want && got.nonEmpty)
    // non-redundancy: the detector must surface pairs BELOW the Jaccard
    // near-dup bar — the quote-inclusion mode symmetric dedup misses
    val shM = sh.toMap
    val quoteOnly = got.filter { case (a, b, _) =>
      val i = (shM(a) & shM(b)).size
      i.toDouble / (shM(a).size + shM(b).size - i) < 0.8
    }
    assert(quoteOnly.nonEmpty, "injection must produce containment-only pairs")
  }

  test("embeddingNearDupAuto dispatches τ≤0.5 to IVF and high τ to LSH") {
    import graft.dedup.Dedup
    val emb = Tables.embeddings(spark, sfDir)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the wired low-τ regime must ride the IVF candidate generator
    assert(pairs(Dedup.embeddingNearDupAuto(emb, 0.45)) ===
      pairs(Dedup.embeddingNearDupIvf(emb, 0.45)))
    // high τ stays on the sign-LSH generator
    assert(pairs(Dedup.embeddingNearDupAuto(emb, 0.55)) ===
      pairs(Dedup.embeddingNearDupLsh(emb, 0.55)))
  }

  test("supplierTopKAgg matches the window-rank form") {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, sfDir)
    val agg = operators.Analytics.supplierTopKAgg(li, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val w = Window.partitionBy("l_suppkey").orderBy(col("price").desc, col("line_id"))
    val win = li.select(col("l_suppkey"),
        col("l_extendedprice").cast("decimal(12,2)").cast("double").as("price"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("line_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(2), r.getDouble(1))).toMap
    assert(agg == win)
    assert(agg.nonEmpty)
  }

  test("approxCardinality tracks exact within 15% relative error") {
    val ev = Tables.events(spark, sfDir)
    val exact = Analytics.cardinality(ev, "event_type", "user_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Analytics.approxCardinality(ev, "event_type", "user_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.15, s"$k: exact=$n approx=$a")
    }
  }

  test("approx percentile tracks the exact rank-selected median") {
    val ev = Tables.events(spark, sfDir)
    val exact = Analytics.percentileFacet(ev, Seq(0.5)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val approx = ev.groupBy("event_type")
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (t, x) =>
      assert(math.abs(approx(t) - x) / math.max(math.abs(x), 1e-9) < 0.1,
        s"$t: exact=$x approx=${approx(t)}")
    }
  }

  test("chunk covers every token with the right windows") {
    val docs = Tables.documents(spark, sfDir)
    val chunks = TextOps.chunk(docs, 50, 40).collect()
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_.getLong(0))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      val toks = t.split("\\s+", -1)
      val nChunks = math.max(toks.length - 50, 0) / 40 + 1
      val cs = byDoc(id).sortBy(_.getLong(1))
      assert(cs.length == nChunks, s"doc $id: ${cs.length} chunks, want $nChunks")
      cs.zipWithIndex.foreach { case (c, i) =>
        val want = toks.slice(i * 40, i * 40 + 50)
        assert(c.getString(2) == want.mkString(" "), s"doc $id chunk $i text")
        assert(c.getLong(3) == want.length.toLong)
      }
    }
  }

  test("categorize groups digit-variant docs into one category") {
    import spark.implicits._
    import graft.text.TextOps
    val docs = Seq(
      (1L, "error 404 at endpoint alpha"),
      (2L, "error 500 at endpoint beta"),
      (3L, "error 404 at endpoint alpha"),   // exact dup of 1
      (4L, "user login ok session 9"),
      (5L, "user login ok session 12345")
    ).toDF("doc_id", "text")
    val got = TextOps.categorize(docs, 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // digits wildcard to '#': docs 1,2,3 share "error # at"; 4,5 share
    // "user login ok" — the wildcard step is load-bearing
    assert(got == List(("error # at", 3L, 1L), ("user login ok", 2L, 4L)))
    // and on the corpus: categories partition the docs (counts sum)
    val corpus = Tables.documents(spark, sfDir)
    val all = TextOps.categorize(corpus, 3, 1000000)
    assert(all.agg(sum("n_docs")).head.getLong(0) == corpus.count())
  }

  test("hashSample is deterministic and near the expected rate") {
    val ev = Tables.events(spark, sfDir)
    val s1 = Analytics.hashSample(ev, "05").collect().map(_.getLong(0)).toSet
    val s2 = Analytics.hashSample(ev.repartition(7), "05").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    val n = ev.count()
    val rate = s1.size.toDouble / n
    assert(rate > 0.005 && rate < 0.05, s"rate $rate outside sanity band for prefix<05 (~2%)")
  }

  test("substringDedup equals a naive positional-window recompute") {
    import graft.dedup.Dedup
    val k = 8
    val docs = Tables.documents(spark, sfDir)
    val got = Dedup.substringDedup(docs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val local = docs.collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val occ = for {
      (id, toks) <- local.toSeq if toks.length >= k
      p <- 0 to toks.length - k
    } yield (toks.slice(p, p + k).mkString(" "), id, p.toLong)
    val byWin = occ.groupBy(_._1).filter(_._2.size >= 2)
    val flagged = byWin.values.flatMap { os =>
      val sorted = os.sortBy(o => (o._2, o._3))
      sorted.tail.map(o => (o._2, o._3))
    }.toSet
    val expected = flagged.groupBy(_._1).flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).toSeq.sorted
      // maximal runs of consecutive flagged positions
      sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((s, e, n) :: rest, p) if p == e + 1 => (s, p, n + 1) :: rest
        case (acc, p) => (p, p, 1L) :: acc
      }.map { case (s, e, n) => (id, s, e + (k - 1), n) }
    }.toSet
    assert(got.nonEmpty, "corpus must contain repeated spans at this SF")
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // every span is at least k tokens long by construction
    assert(got.forall(s => s._3 - s._2 + 1 >= k))
  }

  test("termsOrderBySubAgg ranks buckets by the sub-agg mean, not " +
      "doc_count (r15)") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.termsOrderBySubAgg(ev, "event_type", 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // ordered by avg desc with term tie-break
    got.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(hi._3 > lo._3 || (hi._3 == lo._3 && hi._1 < lo._1))
      case _ =>
    }
    // the mean replays as exact-decimal-sum / count
    val rows = ev.select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = rows.groupBy(_._1).view.mapValues { g =>
      val cents = g.map(x => BigDecimal(x._2).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum
      (g.size.toLong, cents.toDouble / g.size)
    }.toMap
    got.foreach { case (t, n, avg) =>
      assert(n == want(t)._1)
      assert(avg == want(t)._2, s"$t: got $avg want ${want(t)._2}")
    }
    // and the order genuinely differs from the doc_count order at this
    // SF (otherwise the operator is indistinguishable from terms_facet)
    val byCount = Analytics.termsFacet(ev, "event_type", 5).collect()
      .map(_.getString(0)).toSeq
    assert(got.map(_._1).toSeq != byCount,
      "fixture must separate avg order from doc_count order")
  }

  test("filtersFacetOther: _other_ is the none-of predicate, not the " +
      "count complement (r15)") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.filtersFacetOther(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet ==
      Set("high_value", "clicks", "early_users", "_other_"))
    // naive recompute of the residual
    val rows = ev.select("value", "event_type", "user_id").collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getLong(2)))
    val none = rows.filter { case (v, t, u) =>
      !(v >= 90) && t != "click" && !(u < 500) }
    assert(got("_other_")._1 == none.length.toLong)
    val cents = none.map(x => BigDecimal(x._1)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(got("_other_")._2 == cents.toDouble)
    // crafted frame: buckets overlap AND a residual row exists, so
    // _other_ is provably the none-of predicate, not total − Σ named
    val spark2 = spark; import spark2.implicits._
    val crafted = Seq(
      (1L, 95.0, "click"),  // high_value AND clicks (overlap)
      (2L, 10.0, "view"),   // early only (user 2 < 500)
      (600L, 10.0, "view"), // NONE -> _other_
      (700L, 95.0, "view")  // high only
    ).map { case (u, v, t) => (u, v, t) }
      .toDF("user_id", "value", "event_type")
    val g2 = Analytics.filtersFacetOther(crafted).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2("_other_") == 1L)
    // total − Σ named = 4 − (2 + 1 + 2) = −1 ≠ 1: predicate load-bearing
    assert(4L - (g2("high_value") + g2("clicks") + g2("early_users")) !=
      g2("_other_"))
  }

  test("percentileFacet picks the exact rank-selected values") {
    val ev = Tables.events(spark, sfDir)
    val got = Analytics.percentileFacet(ev, Seq(0.5)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val rows = ev.select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (t, g) =>
      val sorted = g.sortBy(x => (x._2, x._3))
      val want = sorted(math.ceil(0.5 * sorted.length).toInt - 1)._2
      assert(got(t) == want, s"$t: got ${got(t)} want $want")
    }
  }
}
