package graft

import org.apache.spark.sql.functions._
import graft.dedup.SimHash

class SimHashSpec extends SparkSpec {

  test("word order does not change the signature; token changes do") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "dog lazy the over jumps fox brown quick the"), // permutation
      (3L, "an entirely different set of words altogether here")
    ).toDF("doc_id", "text")
    val sigs = SimHash.signatures(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L), "simhash is token-set based")
    assert(sigs(1L) != sigs(3L))
  }

  test("identical docs pair at hamming 0; distance tracks dissimilarity") {
    import spark.implicits._
    val base = (1 to 120).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, base), (2L, base),
      (3L, base + " extra"), // one extra token → few bit flips
      (4L, "unrelated content entirely disjoint vocabulary")
    ).toDF("doc_id", "text")
    val sigs = SimHash.signatures(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(2L)) == 0)
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)),
      "near-identical docs must be closer than unrelated docs")
    val pairs = SimHash.nearDup(df, 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(!pairs.keys.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("real documents: pairs are symmetric-free, bounded, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val p1 = SimHash.nearDup(docs, 3).collect()
    assert(p1.nonEmpty, "testdata has template-near-dup docs")
    p1.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) <= 3)
    }
    val p2 = SimHash.nearDup(docs.repartition(13), 3).collect()
    assert(p1.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      p2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }
}
