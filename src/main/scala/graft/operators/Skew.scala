package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Det

/** Skew-resilient aggregation (SURVEY §5): when one key dominates (a
  * celebrity user, a default value), a plain groupBy sends that key's
  * entire volume to one reducer. The two-phase form salts the key with
  * a deterministic hash-derived shard, pre-aggregates per (key, salt) —
  * spreading the hot key over `salts` reducers — then combines the
  * (tiny) partials per key. Only decomposable aggregates (count / sum /
  * min / max) qualify; results are exactly equal to the plain groupBy
  * (proven by the DuckDB oracle on the unsalted form).
  *
  * AQE's skew-join/partition-coalescing handles the generic case at
  * runtime; explicit salting is for the planned-ahead hot-key
  * aggregation where the skew is structural and known.
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of a secondary column, so
    * a hot primary key spreads but re-runs reproduce identical shards. */
  def saltCol(c: Column, salts: Int): Column = pmod(xxhash64(c), lit(salts))

  /** Two-phase count + exact-decimal sum + min/max per key. */
  def saltedStats(df: DataFrame, keyCol: String, valCol: String,
      saltBy: String, salts: Int): DataFrame =
    df
      .withColumn("__salt", saltCol(col(saltBy), salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valCol).cast("decimal(18,2)")).as("__sum"),
        min(col(valCol)).as("__min"),
        max(col(valCol)).as("__max"))
      .groupBy(keyCol)
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__sum")).cast("double").as("sum_value"),
        min(col("__min")).as("min_value"),
        max(col("__max")).as("max_value"))

  /** Salted fact-dim join for a structurally hot join key: the fact side
    * gets a deterministic salt (hash of a per-row unique column, so
    * re-runs shard identically), the dim side is replicated `salts`
    * times, and the join runs on (key, salt) — the hot key's rows land
    * on `salts` reducers instead of one. Row-identical to the plain
    * join (dim side must be unique per key). Broadcast already solves
    * this when the dim fits in memory; salting is the fallback when it
    * does not. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltBy: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltCol(col(saltBy), salts))
    val replicatedDim = dim.withColumn("__salt",
      explode(typedlit((0L until salts.toLong).toSeq)))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
          saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
