package graft

import graft.similarity.Ann

class AnnSpec extends SparkSpec {

  test("brute force returns exactly k ranked neighbors per query") {
    val res = Ann.bruteForceTopK(Tables.embeddings(spark, sfDir), 10, 5).collect()
    assert(res.length == 50)
    val byQuery = res.groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5))
      // ranks ordered by non-increasing similarity
      sorted.sliding(2).foreach {
        case Array(hi, lo) => assert(hi.getDouble(3) >= lo.getDouble(3))
        case _ =>
      }
    }
  }

  test("LSH recall@5 vs brute force is usable and sims are exact") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Ann.bruteForceTopK(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Ann.lshTopK(emb, 10, 5).collect()
    assert(approx.nonEmpty)
    val approxSet = approx.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = approxSet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@5 $recall below floor")
    // within-bucket sims must equal the exact cosine (same expression)
    val exactSims = Ann.bruteForceTopK(emb, 10, 500).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    approx.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exactSims.get(key).foreach(v => assert(v == r.getDouble(3)))
    }
  }

  test("PQ recall@5 vs brute force clears the floor; refine sims are exact") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Ann.bruteForceTopK(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Ann.pqTopK(emb, 10, 5).collect()
    assert(approx.nonEmpty)
    val approxSet = approx.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = approxSet.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall@5 $recall below floor")
    // refine-stage sims are the exact cosine (same expression as brute)
    val exactSims = Ann.bruteForceTopK(emb, 10, 500).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    approx.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exactSims.get(key).foreach(v => assert(v == r.getDouble(3)))
    }
    // every query returns exactly k ranked rows, self excluded
    approx.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length == 5)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 5))
      assert(!rows.exists(_.getLong(2) == q))
    }
    // empty corpus degrades to the typed empty frame
    assert(Ann.pqTopK(emb.filter(org.apache.spark.sql.functions.lit(false)),
      10, 5).count() == 0)
  }

  test("int8 quantized top-k: codes bounded, reconstruction error within " +
      "half a step, recall@5 vs exact dot clears the floor (r15)") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    val vecs = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    // naive replay of the quantizer
    def quant(v: Array[Double]): (Array[Long], Double) = {
      val mx = v.map(math.abs).max
      val s = if (mx > 0) 127.0 / mx else 1.0
      (v.map(x => math.floor(x * s + 0.5).toLong), s)
    }
    vecs.values.take(50).foreach { v =>
      val (c, s) = quant(v)
      assert(c.forall(x => x >= -127 && x <= 127), "codes must fit int8")
      v.zip(c).foreach { case (x, code) =>
        assert(math.abs(x - code / s) <= 0.5 / s + 1e-12,
          "reconstruction must stay within half a quantization step")
      }
    }
    val got = Ann.int8TopK(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getDouble(3)))
    // scores equal the naive scale-corrected integer dot
    got.foreach { case (qid, _, cid, score) =>
      val (qc, qs) = quant(vecs(qid)); val (cc, cs) = quant(vecs(cid))
      val dot = qc.zip(cc).map { case (a, b) => a * b }.sum
      assert(score == dot.toDouble / (qs * cs), s"($qid,$cid)")
    }
    // recall@5 vs the exact float dot-product ranking
    val exact = (0L until 10L).map { qid =>
      val q = vecs(qid)
      qid -> vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, q.zip(v).map(p => p._1 * p._2).sum) }
        .sortBy { case (id, d) => (-d, id) }.take(5).map(_._1).toSet
    }.toMap
    val gotSets = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      want.intersect(gotSets.getOrElse(q, Set.empty)).size.toDouble / want.size }
    val mean = recalls.sum / recalls.size
    info(f"int8 recall@5 vs exact dot = $mean%.3f")
    assert(mean >= 0.8, s"int8 recall@5 $mean below floor")
  }

  test("int8 refined top-k: exact-cosine scores, candidates from the " +
      "quantized stage, recall@5 >= plain-int8's vs exact cosine (r15)") {
    val emb = Tables.embeddings(spark, sfDir)
    val exactAll = Ann.bruteForceTopK(emb, 10, 500).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val exactTop = Ann.bruteForceTopK(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Ann.int8RefinedTopK(emb, 10, 5).collect()
    assert(got.nonEmpty)
    // refined scores ARE the exact cosine (rescore stage, same expression)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exactAll.get(key).foreach(v => assert(v == r.getDouble(3), s"$key"))
    }
    // every query: exactly k ranked rows, self excluded, ranks 1..k
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length == 5)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 5))
      assert(!rows.exists(_.getLong(2) == q))
    }
    // refined set recall vs exact cosine clears the floor and the
    // 4x-oversampled candidate pool can only help vs plain int8 top-5
    val gotSet = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = gotSet.intersect(exactTop).size.toDouble / exactTop.size
    val int8Set = Ann.int8TopK(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val int8Recall = int8Set.intersect(exactTop).size.toDouble / exactTop.size
    info(f"refined recall@5 = $recall%.3f (plain int8 $int8Recall%.3f)")
    assert(recall >= 0.8, s"refined recall@5 $recall below floor")
    assert(recall >= int8Recall - 1e-9,
      "oversample+rescore must not lose recall vs the unrefined page")
    // empty corpus degrades to the typed empty frame
    assert(Ann.int8RefinedTopK(
      emb.filter(org.apache.spark.sql.functions.lit(false)), 10, 5).count() == 0)
  }

  test("binary (1-bit) top-k: packed bits replay naively, refined sims " +
      "exact, recall@5 clears the floor (r15)") {
    val emb = Tables.embeddings(spark, sfDir)
    val vecs = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    // naive replay of the sign packer over the engine's own frame
    def pack(v: Array[Double]): Long =
      v.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
        if (x > 0.0) acc ^ (1L << i) else acc }
    import org.apache.spark.sql.functions.{col, lit, typedlit, when, zip_with, aggregate}
    val pows = typedlit(Array.tabulate(64)(i => 1L << i).toList)
    val packedCol = aggregate(
      zip_with(col("embedding").cast("array<double>"), pows,
        (x, p) => when(x > lit(0.0), p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseXOR(x))
    emb.select(col("vec_id"), packedCol.as("bits")).collect().foreach { r =>
      assert(r.getLong(1) == pack(vecs(r.getLong(0))), s"vec ${r.getLong(0)}")
    }
    val exactAll = Ann.bruteForceTopK(emb, 10, 500).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val exactTop = Ann.bruteForceTopK(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Ann.binaryTopK(emb, 10, 5).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      exactAll.get(key).foreach(v => assert(v == r.getDouble(3), s"$key"))
    }
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length == 5)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 5))
      assert(!rows.exists(_.getLong(2) == q))
    }
    val gotSet = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = gotSet.intersect(exactTop).size.toDouble / exactTop.size
    info(f"binary recall@5 vs exact cosine = $recall%.3f")
    assert(recall >= 0.5, s"binary recall@5 $recall below floor")
    assert(Ann.binaryTopK(
      emb.filter(org.apache.spark.sql.functions.lit(false)), 10, 5).count() == 0)
  }

  test("dotTopK: scores are the sequential left-to-right dot, ordering " +
      "differs from cosine where magnitudes differ (r15)") {
    val emb = Tables.embeddings(spark, sfDir)
    val vecs = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).toArray)).toMap
    val got = Ann.dotTopK(emb, 10, 5).collect()
    assert(got.length == 50)
    // naive sequential accumulation in index order — the kernel's
    // documented order (and DuckDB's)
    got.foreach { r =>
      val (q, c) = (vecs(r.getLong(0)), vecs(r.getLong(2)))
      var d = 0.0; var i = 0
      while (i < q.length) { d += q(i).toDouble * c(i).toDouble; i += 1 }
      assert(r.getDouble(3) == d, s"(${r.getLong(0)},${r.getLong(2)})")
    }
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 5))
      assert(!rows.exists(_.getLong(2) == q))
    }
    // magnitude-awareness on a crafted frame (the corpus embeddings are
    // near-equal-norm, so its dot and cosine pages coincide): the query
    // aligns exactly with a small vector, but a slightly-misaligned
    // LARGE vector wins the dot ranking
    val spark2 = spark; import spark2.implicits._
    val base = Array.fill(64)(0.0f)
    val q0 = base.clone(); q0(0) = 1.0f
    val aligned = base.clone(); aligned(0) = 0.5f
    val big = base.clone(); big(0) = 3.0f; big(1) = 3.0f
    val crafted = Seq((0L, q0.toSeq), (1L, aligned.toSeq), (2L, big.toSeq))
      .toDF("vec_id", "embedding")
    val dotTop = Ann.dotTopK(crafted, 1, 1).head()
    val cosTop = Ann.bruteForceTopK(crafted, 1, 1).head()
    assert(dotTop.getLong(2) == 2L, "dot must prefer the large vector")
    assert(cosTop.getLong(2) == 1L, "cosine must prefer the aligned vector")
  }

  test("mmrRerank: greedy recurrence replays naively; the penalty " +
      "genuinely diversifies a near-dup pool (r15)") {
    val emb = Tables.embeddings(spark, sfDir)
    val vecs = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = Ann.mmrRerank(emb, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 50)
    // naive greedy replay (engine sims come from the shared expression,
    // so compare SELECTION, not raw doubles)
    val pool = Ann.bruteForceTopK(emb, 10, 20).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    got.groupBy(_._1).foreach { case (q, rows) =>
      val cands = pool(q)
      var selected = List.empty[Long]
      val wantOrder = (1 to 5).map { r =>
        val remaining = cands.filterNot(c => selected.contains(c._1))
        val pick =
          if (r == 1) remaining.minBy { case (id, rel) => (-rel, id) }
          else remaining.minBy { case (id, rel) =>
            val msim = selected.map(s => cos(vecs(id), vecs(s))).max
            (-(0.7 * rel - 0.3 * msim), id)
          }
        selected = selected :+ pick._1
        pick._1
      }
      val gotOrder = rows.sortBy(_._2).map(_._3).toSeq
      assert(gotOrder == wantOrder, s"query $q")
    }
    // diversification binds on a crafted pool: a near-copy of the best
    // hit loses its slot to an equally-query-relevant but DISSIMILAR
    // direction (doc 3 sits across the e1 axis: rel ≈ 0.70 to the
    // query but ≈ 0 similarity to the selected e0+e1 hit)
    val spark2 = spark; import spark2.implicits._
    def mk(parts: (Int, Double)*): Seq[Float] = {
      val a = Array.fill(64)(0.0f)
      parts.foreach { case (i, x) => a(i) = x.toFloat }
      a.toSeq
    }
    val crafted = Seq(
      (0L, mk(0 -> 1.0)),                 // query: axis 0
      (1L, mk(0 -> 1.0, 1 -> 1.0)),       // best hit
      (2L, mk(0 -> 1.0, 1 -> 1.0, 2 -> 0.01)), // near-dup of best
      (3L, mk(0 -> 0.98, 1 -> -1.0))      // relevant but anti-correlated on e1
    ).toDF("vec_id", "embedding")
    val page = Ann.mmrRerank(crafted, 1, k = 2, pool = 3).collect()
      .sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    val plain = Ann.bruteForceTopK(crafted, 1, 2).collect()
      .sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    assert(plain == Seq(1L, 2L), s"plain top-2 must be the near-dups: $plain")
    assert(page == Seq(1L, 3L),
      s"MMR must swap the near-dup for the distinct direction: $page")
  }

  test("filteredKnn ranks only filter survivors; the filter binds") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val cand = docs.filter(col("lang") === "en").select("doc_id")
    val got = Ann.filteredKnn(emb, cand, 7L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))

    val allowed = cand.collect().map(_.getLong(0)).toSet - 7L
    val vecs = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    val q = vecs(7L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.toSeq.filter(v => allowed.contains(v._1))
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10)
    assert(got.toSeq == expected)
    assert(got.forall(h => allowed.contains(h._1)))
    // the filter must change the page vs unfiltered kNN — otherwise
    // the composition is decorative
    val unfiltered = vecs.toSeq.filter(_._1 != 7L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    assert(got.map(_._1).toSet != unfiltered, "filter must reshape the top-k page")
  }

  test("hardNegatives: naive replay, label predicate binds, and hard " +
      "negatives are never easier than the unrestricted top-1 (r18)") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    val got = Ann.hardNegatives(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4)))
    val rows = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val vecs = rows.map(r => r._1 -> r._2).toMap
    val labels = rows.map(r => r._1 -> r._3).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = (0L until 10L).flatMap { qid =>
      rows.filter(r => r._1 != qid && r._3 != labels(qid))
        .map { case (cid, v, l) => (cid, l, cos(vecs(qid), v)) }
        .sortBy { case (cid, _, c) => (-c, cid) }.take(5)
        .zipWithIndex
        .map { case ((cid, l, c), i) => (qid, i + 1, cid, l, c) }
    }.toSet
    assert(got.toSet == expect)
    // every mined negative crosses the label boundary
    got.foreach { case (qid, _, cid, nl, _) =>
      assert(nl != labels(qid) && cid != qid) }
    // hard ≤ easy: the unrestricted top-1 similarity bounds the mined
    // top-1 from above (equality only when the nearest neighbor already
    // crosses labels)
    val brute = Ann.bruteForceTopKAgg(emb, 10, 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    got.filter(_._2 == 1).foreach { case (qid, _, _, _, c) =>
      assert(c <= brute(qid) + 1e-12) }
    // the predicate must bite somewhere: some anchor's unrestricted
    // nearest neighbor shares its label
    val bruteIds = Ann.bruteForceTopKAgg(emb, 10, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((0L until 10L).exists(q => labels(bruteIds(q)) == labels(q)),
      "crafted premise: at least one nearest neighbor is same-label")
  }

  test("broadcast-backed TopCentroids equals the literal form; dispatcher switches on size") {
    import graft.functions.{GraftFunctions, TopCentroids}
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    val mat = Array.tabulate(8, 64)((c, d) => math.sin(c * 64 + d)) // any fixed matrix
    for (k <- Seq(1, 4)) {
      val lit = emb.select(col("vec_id"),
          GraftFunctions.topCentroids(col("embedding"), mat, k).as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      val bc = spark.sparkContext.broadcast(mat)
      val via = emb.select(col("vec_id"),
          GraftFunctions.topCentroidsBcast(col("embedding"), bc, k).as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
      assert(lit == via && lit.nonEmpty, s"k=$k")
    }
    // the dispatcher: forced-broadcast branch (limit 0) produces the
    // same assignment as the default literal branch
    val small = Ann.centroidAssigner(spark, mat)
    val forced = Ann.centroidAssigner(spark, mat, literalLimit = 0L)
    val a = emb.select(small(col("embedding"), 1).getItem(0)).collect().map(_.getInt(0))
    val b = emb.select(forced(col("embedding"), 1).getItem(0)).collect().map(_.getInt(0))
    assert(a.sameElements(b))
    // default threshold: 8×64 is literal-sized
    assert(8L * 64 <= TopCentroids.maxLiteralValues)
  }
}
