package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{TermsIndex, TextOps}

/** The maintained suggester vocabulary must be indistinguishable from a
  * from-scratch tokenize at every batch boundary, and the indexed
  * suggest operators must equal their corpus-pass twins — otherwise the
  * index quietly drifts from the queries it serves. */
class TermsIndexSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private lazy val docs = Tables.documents(spark, sfDir).cache()

  private def vocabMap(df: DataFrame): Map[String, (Long, Long)] =
    df.select("term", "n_occ", "n_docs").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  private def fromScratch: DataFrame = docs
    .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
    .groupBy("term")
    .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))

  private def maintainBatches(root: String): Unit =
    (0L until 3L).foreach { b =>
      TermsIndex.updateWithBatch(docs.filter(col("doc_id") % 3 === b), b, root)
    }

  test("per-batch merged vocab equals the from-scratch vocab") {
    val root = tmp("terms-idx")
    maintainBatches(root)
    assert(vocabMap(TermsIndex.vocabTable(spark, root)) == vocabMap(fromScratch))
    // superseded snapshots retire behind the reader grace window
    assert(TermsIndex.versions(spark, root) == Seq(1L, 2L))
  }

  test("a replayed batch id is a no-op (exactly-once under retries)") {
    val root = tmp("terms-idx")
    maintainBatches(root)
    val before = vocabMap(TermsIndex.vocabTable(spark, root))
    TermsIndex.updateWithBatch(docs.filter(col("doc_id") % 3 === 2), 2L, root)
    assert(vocabMap(TermsIndex.vocabTable(spark, root)) == before)
  }

  test("streaming foreachBatch maintenance converges to the batch vocab") {
    val root = tmp("terms-idx")
    val src = tmp("terms-idx-src")
    (0L until 3L).foreach { b =>
      docs.filter(col("doc_id") % 3 === b).select("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(src)
    }
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = TermsIndex.maintain(stream, root, tmp("terms-idx-ckpt"))
    q.awaitTermination()
    assert(TermsIndex.versions(spark, root).size == 1 + TermsIndex.retainSnapshots)
    assert(vocabMap(TermsIndex.vocabTable(spark, root)) == vocabMap(fromScratch))
  }

  test("indexed suggesters equal their corpus-pass twins") {
    val root = tmp("terms-idx")
    maintainBatches(root)
    def rows(df: DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(_.toSeq)
    assert(rows(TermsIndex.completionSuggestIndexed(spark, root, "s", 5)) ==
      rows(TextOps.completionSuggest(docs, "s", 5)))
    assert(rows(TermsIndex.termSuggestIndexed(spark, root, "bath", 2, 5)) ==
      rows(TextOps.termSuggest(docs, "bath", 2, 5)))
  }
}
