package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.similarity.{Ann, AnnIndex}

/** Streaming ANN-index maintenance as an ONGOING process (r19 —
  * VERDICT r18 #3, completing the index-maintenance triangle with
  * DedupIndex and TermsIndex): `AnnIndex.maintain` is the river's
  * poll loop with the IVF index as sink, so the contract is not just
  * one-shot convergence (AnnIndexSpec pins that) but LIFECYCLE —
  * restarts resume from the checkpoint without re-ingesting, probes
  * taken between restarts serve each era's complete committed answer,
  * and a no-new-data restart is a no-op. */
class StreamingAnnIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def assignSet(df: DataFrame): Set[(Long, Int)] =
    df.select(col("vec_id"), col("cent_id").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("checkpoint restarts resume maintenance: each era ingests once, " +
      "batch-N index == from-scratch at every boundary, probes stay complete") {
    val root = tmp("sann-idx")
    val src = tmp("sann-src")
    val ckpt = tmp("sann-ckpt")
    val schema = emb.select("vec_id", "embedding").schema
    def runMaintain(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      AnnIndex.maintain(stream, root, ckpt).awaitTermination()
    }
    def scratchSet(ids: DataFrame): Set[(Long, Int)] = {
      val mat = Ann.centMatrix(AnnIndex.readCentroids(spark, root))
      assignSet(ids.select(col("vec_id"),
        GraftFunctions.topCentroids(col("embedding"), mat, 1).getItem(0)
          .as("cent_id")))
    }
    // era 1: first file lands, maintain drains it (trains v0 + ingests)
    val era1 = emb.filter(col("vec_id") % 3 === 0)
    era1.select("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(src)
    runMaintain()
    assert(AnnIndex.centroidVersions(spark, root) == Seq(0L))
    assert(assignSet(AnnIndex.assignments(spark, root)) == scratchSet(era1))
    val probe1 = AnnIndex.ivfTopKIndexed(spark, root, emb, 10, 5).collect()
    assert(probe1.nonEmpty, "era-1 probe must serve the committed index")

    // era 2: two more files land, a RESTARTED maintain (same checkpoint)
    // must ingest ONLY them — no era-1 re-ingest, no double-count
    (1L until 3L).foreach(b =>
      emb.filter(col("vec_id") % 3 === b).select("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(src))
    runMaintain()
    val asn = AnnIndex.assignments(spark, root)
    assert(asn.count() == emb.count(), "each vector indexed exactly once")
    assert(asn.select("vec_id").distinct().count() == emb.count())
    assert(assignSet(asn) == scratchSet(emb.select("vec_id", "embedding")))
    // the probe now serves BOTH eras (old answers never lost)
    val probe2 = AnnIndex.ivfTopKIndexed(spark, root, emb, 10, 5)
      .collect().map(_.getLong(2)).toSet
    assert(probe2.exists(id => id % 3 == 1 || id % 3 == 2),
      "post-restart probe must serve the new era")

    // era 3: restart with NO new data — a complete no-op
    val before = assignSet(AnnIndex.assignments(spark, root))
    val centsBefore = AnnIndex.readCentroids(spark, root)
    runMaintain()
    assert(AnnIndex.readCentroids(spark, root) == centsBefore)
    assert(assignSet(AnnIndex.assignments(spark, root)) == before)
    assert(AnnIndex.centroidVersions(spark, root) == Seq(0L))
  }

  test("maintained index feeds the serving operators mid-lifecycle: " +
      "incremental near-dup and the indexed pool consumers run against " +
      "a half-built index without waiting for the full corpus") {
    val root = tmp("sann-idx2")
    val src = tmp("sann-src2")
    val ckpt = tmp("sann-ckpt2")
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    val neu = emb.filter(col("vec_id") % 10 === 0)
    old.select("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema(emb.select("vec_id", "embedding").schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    AnnIndex.maintain(stream, root, ckpt).awaitTermination()
    // dedup-the-delta-before-ingest against the streamed index: pairs
    // are a subset of exact and touch the delta (the contract the
    // batch-built AnnIndexSpec run pins — here the index came from the
    // stream, proving the composition end-to-end)
    val got = AnnIndex.incrementalEmbeddingNearDup(spark, root, neu, 0.4,
        nprobe = 4)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val newIds = neu.select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = graft.dedup.Dedup.embeddingNearDup(emb, 0.4)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet[(Long, Long)]
      .filter { case (a, b) => newIds(a) || newIds(b) }
    assert(got.nonEmpty && got.subsetOf(exact))
    // the hard-negative miner reads the same streamed index
    val hn = Ann.hardNegativesFromPool(emb, 10, 5, pool = 50,
      poolSource = (e, nq, p) =>
        AnnIndex.ivfTopKIndexed(spark, root, e, nq, p, nprobe = 8)).collect()
    assert(hn.length == 50, s"full pages expected, got ${hn.length}")
  }
}
