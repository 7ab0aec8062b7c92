package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.river.River
import graft.util.Det

/** Driver contract — see /root/repo/SURVEY.md §2 + the builder prompt.
  *
  * Every entry in `queries` is a thin wiring of a library operator
  * (graft.river / graft.operators / graft.text / graft.dedup /
  * graft.similarity / graft.multimodal) with fixed deterministic
  * parameters; `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's correctness gate.
  *
  * Determinism conventions (shared with the SQL side — see graft.util.Det):
  *  - event timestamps surface as epoch-micros BIGINT (`ts_us`); the oracle
  *    uses epoch_us(ts) to mirror Spark's ns→µs truncation;
  *  - double aggregates are computed on exact BIGINT/DECIMAL domains and
  *    cast to double once;
  *  - every window/top-k ordering carries a unique tie-break column.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("river_full_pipeline")(spark, "/root/testdata/sf0.001")

  // ---- shared builders -------------------------------------------------

  /** Simulated already-imported sink: the first half of the key space.
    * (The reference's sink is the ES index itself; here the "index" is a
    * deterministic snapshot so the oracle can reproduce it.) */
  private def sinkHalf(ev: DataFrame): DataFrame = {
    val bounds = ev.agg(floor(max(col("event_id")) / 2).cast("long").as("__half"))
    ev.join(broadcast(bounds), col("event_id") < col("__half")).drop("__half")
  }

  private def evOut(df: DataFrame): DataFrame =
    df.select(col("event_id"), Det.tsMicros(col("ts")).as("ts_us"),
      col("user_id"), col("event_type"), col("value"))

  // ---- the inventory ---------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----- river core (SURVEY §2 group 1) -----

    "river_incremental_scan" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      evOut(River.incrementalScan(ev, sinkHalf(ev), "ts"))
    }),

    "river_stats_facet" -> ((s, dir) =>
      River.statsFacet(Tables.events(s, dir), "ts")),

    "river_latest_per_key" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      River.latestPerKey(ev, "user_id", "ts", "event_id")
        .select(col("user_id"), col("event_id"), Det.tsMicros(col("ts")).as("ts_us"),
          col("event_type"), col("value"))
    }),

    "river_batching" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      River.assignBatches(ev, Seq(Det.tsMicros(col("ts")), col("event_id")), 100)
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n"), min("event_id").as("min_id"),
          max("event_id").as("max_id"), Det.moneySum(col("value")).as("sum_value"))
    }),

    "river_normalize_fields" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val raw = concat(lit("Type#"), upper(col("event_type")), lit(".props:K"))
      ev.select(raw.as("raw"),
          River.normalizeField(raw).as("norm_plain"),
          River.normalizeField(raw, Some(".")).as("norm_sep"))
        .distinct()
    }),

    "river_projection" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click"))
        .select(col("event_id"), col("event_type"),
          Det.tsMicros(col("ts")).as("ts_us"), col("value"))),

    "river_id_extraction" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val k = River.extractId(col("props"), "k")
      ev.select(col("event_id"), k.cast("long").as("k_id"),
        concat(col("event_type"), lit(":"), k).as("doc_id"))
    }),

    "river_nested_columns" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val qualifier = concat(col("event_type"), lit("-"),
        River.extractId(col("props"), "k"))
      val (parent, leaf) = River.splitQualifier(qualifier, "-")
      ev.select(col("event_id"), qualifier.as("qualifier"),
        parent.as("parent"), leaf.as("leaf"), col("value"))
    }),

    "river_delete_old" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val scanned = River.incrementalScan(ev, sinkHalf(ev), "ts")
      val failed = ev.filter(col("event_id") % 97 === 0)
      River.deleteOldKeys(scanned, failed, "event_id")
    }),

    "river_full_pipeline" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val scanned = River.incrementalScan(ev, sinkHalf(ev), "ts")
      val parsed = scanned.select(
        col("event_id"), Det.tsMicros(col("ts")).as("ts_us"), col("value"),
        concat(River.normalizeField(col("event_type")), lit(":"),
          River.extractId(col("props"), "k")).as("doc_id"))
      val latest = River.latestPerKey(parsed, "doc_id", "ts_us", "event_id")
      River.assignBatches(latest, Seq(col("ts_us"), col("event_id")), 100)
        .select("doc_id", "event_id", "ts_us", "value", "batch_id")
    })
  )

  // ---- DuckDB oracle ---------------------------------------------------

  private val normPlain = """regexp_replace(lower('Type#' || upper(event_type) || '.props:K'), '[^a-z0-9\-_]', '', 'g')"""
  private val normSep   = """regexp_replace(lower('Type#' || upper(event_type) || '.props:K'), '[^a-z0-9\-_\.]', '', 'g')"""

  private val sinkWm =
    """half AS (SELECT max(event_id) // 2 AS h FROM events),
      |wm AS (SELECT max(epoch_us(ts)) AS w FROM events, half WHERE event_id < h)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "river_incremental_scan" ->
      s"""WITH $sinkWm
         |SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
         |FROM events, wm WHERE epoch_us(ts) > w""".stripMargin,

    "river_stats_facet" ->
      """WITH t AS (SELECT epoch_us(ts) // 1000000 AS s, epoch_us(ts) // 1000000 // 3600 AS h FROM events),
        |a AS (SELECT count(*) AS n, min(s) AS min_s, max(s) AS max_s, sum(s) AS sum_s,
        |             sum(h * h) AS shh, sum(h) AS sh FROM t)
        |SELECT n, min_s, max_s, sum_s,
        |       CAST(sum_s AS DOUBLE) / n AS avg_s,
        |       CAST(shh AS DOUBLE) / n - (CAST(sh AS DOUBLE) / n) * (CAST(sh AS DOUBLE) / n) AS var_h,
        |       sqrt(CAST(shh AS DOUBLE) / n - (CAST(sh AS DOUBLE) / n) * (CAST(sh AS DOUBLE) / n)) AS std_h
        |FROM a""".stripMargin,

    "river_latest_per_key" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    "river_batching" ->
      """WITH t AS (SELECT *, (row_number() OVER (ORDER BY epoch_us(ts), event_id) - 1) // 100 AS batch_id FROM events)
        |SELECT batch_id, count(*) AS n, min(event_id) AS min_id, max(event_id) AS max_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM t GROUP BY batch_id""".stripMargin,

    "river_normalize_fields" ->
      s"""SELECT DISTINCT 'Type#' || upper(event_type) || '.props:K' AS raw,
         |       $normPlain AS norm_plain,
         |       $normSep AS norm_sep
         |FROM events""".stripMargin,

    "river_projection" ->
      """SELECT event_id, event_type, epoch_us(ts) AS ts_us, value FROM events
        |WHERE event_type IN ('view', 'click')""".stripMargin,

    "river_id_extraction" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_id,
        |       event_type || ':' || json_extract_string(props, '$.k') AS doc_id
        |FROM events""".stripMargin,

    "river_nested_columns" ->
      """WITH t AS (SELECT event_id, event_type || '-' || json_extract_string(props, '$.k') AS qualifier, value FROM events)
        |SELECT event_id, qualifier, split_part(qualifier, '-', 1) AS parent,
        |       split_part(qualifier, '-', 2) AS leaf, value
        |FROM t""".stripMargin,

    "river_delete_old" ->
      s"""WITH $sinkWm
         |SELECT event_id FROM events, wm
         |WHERE epoch_us(ts) > w AND event_id NOT IN (SELECT event_id FROM events WHERE event_id % 97 = 0)""".stripMargin,

    "river_full_pipeline" ->
      raw"""WITH $sinkWm,
         |scan AS (SELECT event_id, epoch_us(ts) AS ts_us, value, event_type, props FROM events, wm WHERE epoch_us(ts) > w),
         |parsed AS (SELECT event_id, ts_us, value,
         |                  regexp_replace(lower(event_type), '[^a-z0-9\-_]', '', 'g') || ':' || json_extract_string(props, '$$.k') AS doc_id
         |           FROM scan),
         |latest AS (SELECT * FROM parsed QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY ts_us DESC, event_id DESC) = 1),
         |batched AS (SELECT *, (row_number() OVER (ORDER BY ts_us, event_id) - 1) // 100 AS batch_id FROM latest)
         |SELECT doc_id, event_id, ts_us, value, batch_id FROM batched""".stripMargin
  )
}
