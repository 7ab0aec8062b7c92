package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Skew-injected scale audit for the df-bounded min-shingle bucket
  * rule (`Dedup.hotShingles`): the decorrelated bench corpora cannot
  * exhibit the Zipfian hot-bucket hazard (max natural 3-gram df is
  * 7-25), so this audit injects one — a lexicographically-minimal
  * shingle carried by 40% of docs, i.e. the shingle the UNBOUNDED min
  * rule would bucket 40% of the corpus on and do occupancy² confirm
  * work. It times the three df-bounded operators on the skewed corpus
  * and counts candidate pairs under both rules (the unbounded rule's
  * pair count is the counterfactual quadratic — counted, not
  * confirmed: confirming it at ×10 would BE the quadratic).
  *
  * Usage: runMain graft.SkewAudit <sfDir> [maxDf]
  * Prints one JSON line; run at sf0.1 and its ×10 ScaleUp derivation
  * and compare times — the SCALING.md df-bound table comes from this.
  */
object SkewAudit {

  private def timed(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val maxDf = if (args.length > 1) args(1).toLong else 16L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-skew-audit")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 20) // TopKPairs over corpus-cardinality keys must hash, not sort (see Dedup.embeddingNearDupIvf)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val skewed = Tables.documents(spark, dir).withColumn("text",
      when(col("doc_id") % 5 < 2, concat(lit("!a !b !c "), col("text")))
        .otherwise(col("text")))
    val nDocs = skewed.count()

    // candidate-pair counts under both rules (count only — no confirm)
    val s = skewed
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), Dedup.shingleSetFromTokens(col("toks"), 3).as("sh"))
      .persist()
    def pairCount(slim: DataFrame): Long =
      slim.groupBy("bucket").agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1))).head().getLong(0) / 2
    val unboundedCand = pairCount(
      s.select(array_min(col("sh")).as("bucket"), col("doc_id")))
    val boundedCand = pairCount(
      s.crossJoin(broadcast(Dedup.hotShingles(s, maxDf)))
        .select(Dedup.dfBoundedMin(col("sh"), col("hot")).as("bucket"), col("doc_id")))
    s.unpersist()
    spark.catalog.clearCache()

    val (tNg, nNg) = timed(Dedup.ngramJaccard(skewed, 3, 0.8, maxDf).count())
    spark.catalog.clearCache()
    val (tCo, nCo) = timed(Dedup.containment(skewed, 3, 0.9, 4, maxDf).count())
    spark.catalog.clearCache()
    val (tIn, nIn) = timed(Dedup.incrementalNgramJaccard(
      skewed.filter(col("doc_id") % 10 =!= 0),
      skewed.filter(col("doc_id") % 10 === 0), 3, 0.8, maxDf).count())
    spark.catalog.clearCache()

    println(s"""{"audit":"skew_dfbound","dir":"$dir","n_docs":$nDocs,"max_df":$maxDf,""" +
      s""""candidates_bounded":$boundedCand,"candidates_unbounded":$unboundedCand,""" +
      s""""ngram_sec":${f"$tNg%.2f"},"ngram_pairs":$nNg,""" +
      s""""containment_sec":${f"$tCo%.2f"},"containment_pairs":$nCo,""" +
      s""""incremental_sec":${f"$tIn%.2f"},"incremental_pairs":$nIn}""")
    spark.stop()
  }
}
