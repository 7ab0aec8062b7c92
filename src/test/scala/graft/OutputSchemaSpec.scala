package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Build-time guard for the round-11 failure class (VERDICT r11 #1):
  * a query projecting a tz-aware TimestampType to output writes
  * isAdjustedToUTC=true parquet that the DuckDB oracle (naive
  * TIMESTAMP) schema+hash-mismatches even when every instant matches.
  *
  * Two layers:
  *  1. The guard itself detects the bad shape (trip test on the exact
  *     q3-like LTZ frame, and on a nested struct/array carrier).
  *  2. Every SparkEntry query's output, after Verify.normalizeOutput,
  *     passes Verify.assertMirrorable — schema analysis only, no
  *     execution, so this sweeps all 150+ queries cheaply.
  */
class OutputSchemaSpec extends SparkSpec {

  test("guard trips on a tz-aware timestamp output (r11 q3 shape)") {
    import spark.implicits._
    // o_orderdate as LTZ TimestampType — the exact r11 q3/q18 artifact shape
    val q3ish = Seq((1L, 10.0)).toDF("l_orderkey", "revenue")
      .withColumn("o_orderdate", timestamp_micros(lit(796694400000000L)))
    assert(q3ish.schema("o_orderdate").dataType == TimestampType)
    val bad = Verify.unmirrorableColumns(q3ish.schema)
    assert(bad.size == 1 && bad.head.startsWith("o_orderdate"), bad)
    intercept[IllegalArgumentException] {
      Verify.assertMirrorable("q3_shipping_priority", q3ish.schema)
    }
  }

  test("guard sees tz-aware timestamps nested in struct/array") {
    import spark.implicits._
    val nested = Seq(1L).toDF("id")
      .withColumn("s", struct(timestamp_micros(lit(0L)).as("t")))
      .withColumn("a", array(timestamp_micros(lit(0L))))
    val bad = Verify.unmirrorableColumns(nested.schema)
    assert(bad.exists(_.startsWith("s.t")) && bad.exists(_.startsWith("a[]")), bad)
  }

  test("normalizeOutput casts LTZ to NTZ losslessly (incl. nested)") {
    import spark.implicits._
    val us = 796694400123456L
    val df = Seq(1L).toDF("id")
      .withColumn("ts", timestamp_micros(lit(us)))
      .withColumn("s", struct(timestamp_micros(lit(us)).as("t")))
    val norm = Verify.normalizeOutput(df)
    assert(Verify.unmirrorableColumns(norm.schema).isEmpty)
    assert(norm.schema("ts").dataType == TimestampNTZType)
    // lossless under the pinned-UTC session: same physical micros
    val got = norm.select(unix_micros(col("ts").cast(TimestampType))).head.getLong(0)
    assert(got == us)
  }

  test("every SparkEntry query output is oracle-mirrorable after normalization") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val schema = Verify.normalizeOutput(fn(spark, sfDir)).schema
        Verify.unmirrorableColumns(schema) match {
          case Nil => None
          case bad => Some(s"$name -> ${bad.mkString(", ")}")
        }
      } catch {
        // queries that can't even ANALYZE are caught by their own specs;
        // this spec is only about output schemas
        case e: Throwable => Some(s"$name failed to analyze: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
