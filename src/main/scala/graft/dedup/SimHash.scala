package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-dup detection (SURVEY §2 group 4).
  *
  * Each doc's distinct lowercase tokens are hashed (xxhash64); bit j of
  * the signature is the sign of Σ_tokens (±1 by the token hash's bit j).
  * Near-dups are pairs within hamming distance `maxDist`, with candidates
  * from the 4×16-bit block pigeonhole (hamming ≤ 3 ⇒ at least one of 4
  * blocks identical), so the self-join is an equi-join on block values —
  * never all-pairs.
  *
  * Shuffle profile at scale: one explode + groupBy(doc_id) for the
  * signatures (map-side combinable sums), one equi-join on (block,
  * block_value), one pair dedup. All column expressions, no UDFs.
  */
object SimHash {

  /** doc_id → 64-bit simhash over the distinct-token set. */
  def signatures(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(split(lower(col("text")), "\\s+"))).as("tok"))
    val h = toks.withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$j"))
    val agg = h.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** Near-dup pairs within `maxDist` hamming bits (maxDist ≤ 3 for the
    * 4-block pigeonhole to be exhaustive). */
  def nearDup(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-block pigeonhole covers hamming <= 3")
    val s = signatures(docs)
    val blocks = s.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("block", "block_value")))
    val a = blocks.select(col("block"), col("block_value"),
      col("doc_id").as("a_id"), col("simhash").as("a_sim"))
    val b = blocks.select(col("block"), col("block_value"),
      col("doc_id").as("b_id"), col("simhash").as("b_sim"))
    a.join(b, Seq("block", "block_value"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }
}
