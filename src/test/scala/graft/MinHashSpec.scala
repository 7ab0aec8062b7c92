package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, MinHash}

class MinHashSpec extends SparkSpec {

  /** Ground truth: exact all-pairs Jaccard ≥ tau (test-only; operators
    * themselves never do all-pairs). */
  private def truePairs(tau: Double): Set[(Long, Long)] = {
    val docs = Tables.documents(spark, sfDir)
    val s = docs.select(col("doc_id"), Dedup.shingleSet(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = s.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = s.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))).cast("double"))
      .withColumn("j", col("inter") / (size(col("a_sh")) + size(col("b_sh")) - col("inter")))
      .filter(col("j") >= tau)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("all reported pairs truly have jaccard >= tau (exact precision)") {
    val got = MinHash.nearDupPairs(Tables.documents(spark, sfDir)).collect()
    assert(got.nonEmpty, "expected some near-dup pairs in testdata")
    got.foreach(r => assert(r.getDouble(2) >= 0.8))
  }

  test("recall vs exact Jaccard ground truth is high") {
    val expect = truePairs(0.8)
    val got = MinHash.nearDupPairs(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.nonEmpty)
    assert(got.subsetOf(expect), "confirm step must make precision exact")
    val recall = got.intersect(expect).size.toDouble / expect.size
    assert(recall >= 0.9, s"recall $recall below 0.9 (got ${got.size} of ${expect.size})")
  }

  test("signature is deterministic across partitionings") {
    val docs = Tables.documents(spark, sfDir)
    def sigs(parts: Int) = docs.repartition(parts)
      .withColumn("th", MinHash.tokenHashes(col("text")))
      .select(col("doc_id"), MinHash.signature(MinHash.shinglesFromTokenHashes(col("th"), 3), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(2) == sigs(7))
  }
}
