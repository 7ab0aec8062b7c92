package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for DuckDB-oracle parity.
  *
  * Floating-point aggregation is order-dependent, so a distributed sum of
  * doubles is NOT reproducible across engines (or even across runs with a
  * different partitioning). Every aggregate this engine emits is therefore
  * computed on an exact domain (BIGINT or DECIMAL) and only converted to
  * DOUBLE at the very end — a single, deterministic IEEE-754 conversion.
  * The same discipline keeps results stable on a 1000-executor cluster,
  * where partial-aggregate ordering is arbitrary.
  */
object Det {

  /** Exact sum of a fixed-point "money" column (e.g. prices with 2 or 4
    * decimals) via DECIMAL, surfaced as DOUBLE. */
  def moneySum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact sum of an integral-valued DOUBLE column as BIGINT. */
  def intSum(c: Column): Column = sum(c.cast("long"))

  /** Deterministic mean: exact decimal sum divided by exact count — one
    * double division instead of an order-dependent running mean. */
  def moneyAvg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1)))

  /** Event timestamps are ns-precision parquet; Spark reads them truncated
    * to microseconds. All ts arithmetic goes through epoch-micros BIGINT so
    * the DuckDB oracle (which sees full ns) can mirror the truncation with
    * epoch_us(ts). */
  def tsMicros(c: Column): Column = unix_micros(c)

  /** Epoch seconds (truncating), as BIGINT. */
  def tsSeconds(c: Column): Column = (unix_micros(c) / lit(1000000L)).cast("long")

  /** UTC day bucket index (exact integer division of epoch-µs) —
    * DuckDB mirror: `epoch_us(ts) // 86400000000`. One definition so a
    * bucketing change can't silently diverge across the day-keyed
    * queries. Takes the column NAME: exact integer `div` is only
    * reachable through the SQL parser, which needs a resolvable name. */
  def dayIdx(tsCol: String): Column = expr(s"unix_micros($tsCol) div 86400000000")
}
