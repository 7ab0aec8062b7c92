package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding near-dup detection (SURVEY §2 group 4).
  *
  * Pipeline: word-shingle sets → `numHashes` minhash values (one
  * `xxhash64(shingle, seed)` family per signature slot — seed varied by
  * passing the slot index as an extra hashed column) → `bands` band
  * hashes → candidate pairs from a band-hash equi-join → exact Jaccard
  * confirm.
  *
  * Scale design: the only shuffles are the band-hash self-join (keyed on
  * (band, band_hash) — near-dup docs collide, everything else spreads
  * uniformly) and a final pair dedup. The full signature computation is
  * a map-only pass of built-in higher-order functions over each doc; no
  * UDFs, no driver-side state, no all-pairs product anywhere.
  */
object MinHash {

  /** MinHash signature: for slot i, min over shingles of
    * xxhash64(shingle, i). Empty shingle sets yield null slots (docs
    * shorter than the shingle width never become candidates). */
  def signature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(s, i))))

  /** Candidate pairs: docs agreeing on at least one of `bands` bands of
    * `numHashes / bands` signature slots. Keeps shingle sets alongside
    * for the exact confirm step. */
  def candidatePairs(docs: DataFrame, n: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    val s = docs
      .select(col("doc_id"), Dedup.shingleSet(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", signature(col("sh"), numHashes))
    val banded = s.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * r + 1, lit(r)), b))).as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
  }

  /** LSH candidates → exact Jaccard ≥ tau confirm. With the defaults
    * (32 hashes, 8 bands of 4) a true 0.8-Jaccard pair is caught with
    * probability 1 - (1 - 0.8^4)^8 ≈ 0.985. */
  def nearDupPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 32,
      bands: Int = 8, tau: Double = 0.8): DataFrame =
    candidatePairs(docs, n, numHashes, bands)
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("a_sh")) + size(col("b_sh")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
}
