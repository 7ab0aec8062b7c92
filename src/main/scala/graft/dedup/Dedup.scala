package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.text.TextOps

/** Deduplication operators over the `documents` table.
  *
  * Scale design: no variant ever materializes the full pairwise cross
  * product. Candidate pairs always come from a bucketed equi-join
  * (exact hash, fingerprint, min-shingle bucket, or LSH band), so the
  * shuffle is on bucket keys and the quadratic work is confined to
  * (small) candidate groups.
  */
object Dedup {

  /** Word n-gram shingle set (distinct), the comparison unit for all
    * text near-dup variants — built from codegen'd array functions, no
    * UDF. Docs shorter than n shingle to the empty set. */
  def shingleSet(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
        .otherwise(array()))
  }

  /** Exact dedup: hash-groupBy on the text. One shuffle on the hash. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))

  /** Near-dup clusters keyed by the normalized token-set fingerprint. */
  def byFingerprint(docs: DataFrame): DataFrame =
    docs.groupBy(TextOps.fingerprintCol(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))

  /** Exact n-gram Jaccard over bucketed candidates: docs sharing their
    * lexicographically-smallest shingle are compared; pairs at or above
    * `tau` survive. The bucket join keeps this far from all-pairs. */
  def ngramJaccard(docs: DataFrame, n: Int, tau: Double): DataFrame = {
    val s = docs
      .select(col("doc_id"), shingleSet(col("text"), n).as("sh"))
      .withColumn("bucket", array_min(col("sh")))
    val a = s.select(col("bucket"), col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = s.select(col("bucket"), col("doc_id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("a_sh")) + size(col("b_sh")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Embedding-cosine near-dup pairs at or above `tau` — the exact
    * baseline (oracle-checkable). This compares all id-ordered pairs; at
    * 100 TB the same cosine_sim re-rank runs over LSH-bucketed candidates
    * instead (graft.similarity.Ann.lshTopK machinery), which keeps the
    * join keyed on buckets rather than a cross product. */
  def embeddingNearDup(emb: DataFrame, tau: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos_sim", GraftFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .filter(col("cos_sim") >= tau)
      .select("a_id", "b_id", "cos_sim")
  }
}
