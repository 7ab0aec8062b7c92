package graft

import org.apache.spark.sql.functions._
import graft.dedup.MinHash
import graft.functions.MinHashSig

/** r22: [[MinHashSig]] replaces the nested-transform signature — pin
  * bit-identical output against the HOF form it replaces, on the real
  * corpus and on the empty-set edge. */
class MinHashSigSpec extends SparkSpec {

  private def hofSig(sh: org.apache.spark.sql.Column, k: Int) =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh, h => xxhash64(h, i))))

  test("minhash_sig is bit-identical to the nested-transform HOF form") {
    val docs = Tables.documents(spark, sfDir)
    val sh = docs
      .withColumn("th", MinHash.tokenHashes(col("text")))
      .select(col("doc_id"), MinHash.shinglesFromTokenHashes(col("th"), 3).as("sh"))
    val both = sh.select(col("doc_id"),
        MinHashSig.sig(col("sh"), 32).as("a"), hofSig(col("sh"), 32).as("b"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"doc ${r.getLong(0)}")
    }
  }

  test("empty shingle set yields all-null slots, like array_min(empty)") {
    import spark.implicits._
    val df = Seq((1L, Seq.empty[Long]), (2L, Seq(7L, -3L))).toDF("doc_id", "sh")
    val both = df.select(col("doc_id"),
        MinHashSig.sig(col("sh"), 8).as("a"), hofSig(col("sh"), 8).as("b"))
      .collect()
    both.foreach(r => assert(r.getSeq[Any](1) == r.getSeq[Any](2)))
    val empty = both.find(_.getLong(0) == 1L).get
    assert(empty.getSeq[Any](1).forall(_ == null))
  }
}
