package graft

import org.apache.spark.sql.functions._
import graft.river.River
import graft.util.Det

class RiverSpec extends SparkSpec {

  test("literal watermark scan pushes the predicate into the parquet scan") {
    val raw = Tables.eventsRaw(spark, sfDir)
    val wmUs = River.watermarkMicros(raw.limit(100), "ts").get
    val scan = River.scanPastWatermark(raw, "ts", wmUs)
    val plan = scan.queryExecution.executedPlan.toString
    // the ts predicate must land in the scan's PushedFilters in the
    // file's NATIVE encoding (ns long literal on legacy files, a folded
    // timestamp literal on TIMESTAMP_MICROS files) — a computed-column
    // filter would read the whole table at 100 TB
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1))
      .getOrElse(fail(s"no PushedFilters in plan:\n$plan"))
    assert(pushed.contains("GreaterThanOrEqual(ts,"), s"pushed=[$pushed]\n$plan")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      assert(pushed.contains(s"GreaterThanOrEqual(ts,${(wmUs + 1) * 1000})"), pushed)
  }

  test("literal scan and broadcast-join scan select the same rows") {
    val raw = Tables.eventsRaw(spark, sfDir)
    val halfId = raw.agg(floor(max(col("event_id")) / 2).cast("long")).head().getLong(0)
    val sinkRaw = raw.filter(col("event_id") < halfId)

    val wmUs = River.watermarkMicros(sinkRaw, "ts").get
    val literal = River.scanPastWatermark(raw, "ts", wmUs)
      .select("event_id").collect().map(_.getLong(0)).toSet

    // joined variant on the µs-converted table (the runtime-subquery form)
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_us", Det.tsMicros(col("ts")))
    val sink = ev.filter(col("event_id") < halfId)
    val joined = River.incrementalScan(ev.drop("ts"), sink.drop("ts"), "ts_us")
      .select("event_id").collect().map(_.getLong(0)).toSet

    assert(literal == joined)
    assert(literal.nonEmpty)
  }

  test("empty sink yields no watermark (first import = full scan)") {
    val raw = Tables.eventsRaw(spark, sfDir)
    assert(River.watermarkMicros(raw.filter(lit(false)), "ts").isEmpty)
  }

  test("two-phase global batching matches a global-window row_number exactly") {
    val ev = Tables.events(spark, sfDir).repartition(7)
    val ord = Seq(Det.tsMicros(col("ts")), col("event_id"))
    val got = River.assignBatches(ev, ord, 100)
      .select(col("event_id"), col("batch_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy(ord: _*)
    val expected = ev.withColumn("batch_id",
        ((row_number().over(w) - 1) / 100).cast("long"))
      .select(col("event_id"), col("batch_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("two-phase global batching plans no single-partition exchange") {
    val ev = Tables.events(spark, sfDir)
    val plan = River.assignBatches(ev, Seq(Det.tsMicros(col("ts")), col("event_id")), 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("per-partition batching covers every row with bounded batches") {
    val ev = Tables.events(spark, sfDir).repartition(7)
    val batched = River.assignBatchesPerPartition(ev, 100)
    assert(batched.count() == ev.count())
    val sizes = batched.groupBy("batch_id").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 100), "no batch may exceed batchSize")
    assert(sizes.sum == ev.count())
  }

  test("mappingDrift: exactly the paths absent from the bootstrap slice, " +
      "with correct first-seen ids (r15)") {
    val ev = Tables.events(spark, sfDir)
    val got = River.mappingDrift(ev, 200L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty, "fixture must drift")
    // naive replay over the parsed paths
    val paths = ev.select(col("event_id"),
        River.parseQualifier(concat(col("event_type"), lit("-"),
          River.extractId(col("props"), "k")), "-").getField("full_path"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val known = paths.filter(_._1 < 200L).map(_._2).toSet
    val want = paths.filter(p => p._1 >= 200L && !known(p._2))
      .groupBy(_._2).view
      .mapValues(g => (g.map(_._1).min, g.length.toLong)).toMap
    assert(got == want)
    // invariants: no drift path is in the bootstrap mapping; every
    // first_seen is past the bootstrap edge
    got.foreach { case (p, (first, n)) =>
      assert(!known(p) && first >= 200L && n >= 1L, p)
    }
  }
}
