package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, DedupIndex, MinHash}

/** The maintained dedup indexes must be indistinguishable from a
  * from-scratch computation at every batch boundary — otherwise the
  * incremental operators quietly drift from their batch twins. */
class StreamingDedupIndexSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private lazy val docs = Tables.documents(spark, sfDir).cache()

  private def stringShingles(d: DataFrame): DataFrame = d
    .withColumn("toks", split(col("text"), " "))
    .select(col("doc_id"), Dedup.shingleSetFromTokens(col("toks"), 3).as("sh"))

  private def hashedShingles(d: DataFrame): DataFrame = d
    .withColumn("th", MinHash.tokenHashes(col("text")))
    .select(col("doc_id"), MinHash.shinglesFromTokenHashes(col("th"), 3).as("sh"))
    .filter(size(col("sh")) > 0)

  private def dfMap(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def bandSet(df: DataFrame): Set[(Int, Long, Long)] =
    df.select(col("band").cast("int"), col("band_hash"), col("doc_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

  private def maintainBatches(root: String): Unit =
    (0L until 3L).foreach { b =>
      DedupIndex.updateWithBatch(docs.filter(col("doc_id") % 3 === b), b, root)
    }

  test("per-batch merged df table equals the from-scratch df") {
    val root = tmp("dedup-idx")
    maintainBatches(root)
    assert(dfMap(DedupIndex.shingleDfTable(spark, root)) ==
      dfMap(Dedup.shingleDf(stringShingles(docs))))
    // superseded snapshots retire, keeping a reader grace window of
    // retainSnapshots besides the newest (v=0 deleted, v=1 kept)
    assert(DedupIndex.dfVersions(spark, root) == Seq(1L, 2L))
    assert(DedupIndex.retainSnapshots == 1)
  }

  test("band index across batches equals the from-scratch band table") {
    val root = tmp("dedup-idx")
    maintainBatches(root)
    assert(bandSet(DedupIndex.bandTable(spark, root)) ==
      bandSet(MinHash.bandTable(hashedShingles(docs), 32, 8)))
  }

  test("a replayed batch id is a no-op (exactly-once under retries)") {
    val root = tmp("dedup-idx")
    maintainBatches(root)
    val dfBefore = dfMap(DedupIndex.shingleDfTable(spark, root))
    val bandsBefore = bandSet(DedupIndex.bandTable(spark, root))
    // foreachBatch may replay the last batch after a crash
    DedupIndex.updateWithBatch(docs.filter(col("doc_id") % 3 === 2), 2L, root)
    assert(dfMap(DedupIndex.shingleDfTable(spark, root)) == dfBefore)
    assert(bandSet(DedupIndex.bandTable(spark, root)) == bandsBefore)
  }

  test("streaming foreachBatch maintenance converges to the batch index") {
    val root = tmp("dedup-idx")
    val src = tmp("dedup-idx-src")
    // three files → three micro-batches with maxFilesPerTrigger=1
    (0L until 3L).foreach { b =>
      docs.filter(col("doc_id") % 3 === b).select("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(src)
    }
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = DedupIndex.maintain(stream, root, tmp("dedup-idx-ckpt"))
    q.awaitTermination()
    assert(DedupIndex.dfVersions(spark, root).size == 1 + DedupIndex.retainSnapshots)
    assert(dfMap(DedupIndex.shingleDfTable(spark, root)) ==
      dfMap(Dedup.shingleDf(stringShingles(docs))))
    assert(bandSet(DedupIndex.bandTable(spark, root)) ==
      bandSet(MinHash.bandTable(hashedShingles(docs), 32, 8)))
  }

  test("indexed incremental dedup equals the recompute forms") {
    val old = docs.filter(col("doc_id") % 10 =!= 0)
    val neu = docs.filter(col("doc_id") % 10 === 0)
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // ngram form: df table maintained over old batches + the delta
    val r1 = tmp("dedup-idx")
    (0L until 3L).foreach(b =>
      DedupIndex.updateWithBatch(old.filter(col("doc_id") % 3 === b), b, r1))
    DedupIndex.updateWithBatch(neu, 3L, r1)
    assert(pairSet(DedupIndex.incrementalNgramJaccardIndexed(
        spark, r1, old, neu, 3, 0.8)) ==
      pairSet(Dedup.incrementalNgramJaccard(old, neu, 3, 0.8)))

    // minhash form: band index maintained over the old snapshot only
    val r2 = tmp("mh-idx")
    (0L until 3L).foreach(b =>
      DedupIndex.updateWithBatch(old.filter(col("doc_id") % 3 === b), b, r2))
    assert(pairSet(DedupIndex.incrementalNearDupPairsIndexed(
        spark, r2, old, neu)) ==
      pairSet(MinHash.incrementalNearDupPairs(old, neu)))
  }
}
