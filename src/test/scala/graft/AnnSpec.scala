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
}
