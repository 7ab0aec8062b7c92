package graft

import graft.dedup.Dedup

class ClusterSpec extends SparkSpec {

  test("label propagation finds transitive components") {
    import spark.implicits._
    // chain 1-2-3, pair 10-11, isolated-by-absence 99
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val got = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chains converge (diameter > 1 round)") {
    import spark.implicits._
    val chain = (1L until 20L).map(i => (i, i + 1))
    val got = Dedup.nearDupClusters(chain.toDF("a_id", "b_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 20 && got.values.forall(_ == 1L))
  }

  test("clusters on real near-dup pairs are closed under the pair relation") {
    val pairs = Dedup.ngramJaccard(Tables.documents(spark, sfDir), 3, 0.8)
      .select("a_id", "b_id").cache()
    val clusters = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.collect().foreach { r =>
      assert(clusters(r.getLong(0)) == clusters(r.getLong(1)),
        s"pair ${r.getLong(0)}-${r.getLong(1)} split across clusters")
    }
    assert(clusters.nonEmpty)
  }
}
