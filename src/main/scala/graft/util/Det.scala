package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

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

  /** All ts arithmetic goes through epoch-micros BIGINT so the DuckDB
    * oracle can mirror it exactly with epoch_us(ts). Assumes the column is
    * already TimestampType — [[graft.Tables.load]] normalizes every
    * driver encoding to that at load; see [[tsMicrosOf]] for the raw form. */
  def tsMicros(c: Column): Column = unix_micros(c)

  /** Epoch-µs BIGINT view of an event-time column in ANY encoding the
    * driver's testdata has shipped — THE one place encoding dispatch
    * lives (everything else assumes a normalized TimestampType):
    *  - BIGINT epoch-ns (legacy data, read via nanosAsLong): exact
    *    integer `div 1000` — the same truncation DuckDB's epoch_us applies;
    *  - TIMESTAMP (µs, parquet TIMESTAMP_MICROS — current data; session
    *    tz is pinned UTC in every entrypoint): unix_micros;
    *  - TIMESTAMP_NTZ (only if a caller bypasses Tables' reader conf):
    *    cast to TIMESTAMP first — exact under the UTC session tz. */
  def tsMicrosOf(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case LongType => expr(s"$tsCol div 1000")
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case _ => unix_micros(col(tsCol))
    }

  /** Epoch seconds (truncating), as BIGINT. */
  def tsSeconds(c: Column): Column = (unix_micros(c) / lit(1000000L)).cast("long")

  /** UTC day bucket index (exact integer division of epoch-µs) —
    * DuckDB mirror: `epoch_us(ts) // 86400000000`. One definition so a
    * bucketing change can't silently diverge across the day-keyed
    * queries. Takes the column NAME: exact integer `div` is only
    * reachable through the SQL parser, which needs a resolvable name. */
  def dayIdx(tsCol: String): Column = expr(s"unix_micros($tsCol) div 86400000000")
}
