package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns every operator relies on, checked at load so a schema
    * drift fails fast with a clear message instead of a mid-plan
    * resolution error. */
  private val requiredColumns: Map[String, Seq[String]] = Map(
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Seq("doc_id", "text"),
    "embeddings" -> Seq("vec_id", "embedding"),
    "lineitem" -> Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is ns-precision parquet, which Spark 4 refuses by default;
    // read it as BIGINT nanos and convert to a µs timestamp with exact
    // integer division (same truncation DuckDB's epoch_us applies).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    requiredColumns.get(name).foreach { cols =>
      val missing = cols.filterNot(df.columns.contains)
      require(missing.isEmpty, s"table '$name' at $dir is missing columns: $missing")
    }
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** events with `ts` left as raw epoch-nanos BIGINT — the form whose
    * predicates push down to the parquet scan (filtering the converted
    * timestamp column would not). */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    if (df.schema("ts").dataType == LongType) df
    else df.withColumn("ts", expr("unix_micros(ts) * 1000L"))
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
