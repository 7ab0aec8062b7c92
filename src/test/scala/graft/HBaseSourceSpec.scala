package graft

import org.apache.spark.sql.functions._

class HBaseSourceSpec extends SparkSpec {

  private def source = spark.read.format("hbasesim")
    .option("path", s"$sfDir/events.parquet").load()

  test("full scan matches the parquet table") {
    val viaSource = source.select("event_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaParquet = Tables.events(spark, sfDir)
      .select(col("event_id"), graft.util.Det.tsMicros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSource == viaParquet)
  }

  test("minStamp and family filters push into the scan") {
    val q = source
      .filter(col("ts_us") > 1705320000000000L && col("event_type") === "click")
      .select("event_id")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("hbasesim"), physical)
    assert(physical.contains("minStamp=1705320000000000"), physical)
    assert(physical.contains("family=click"), physical)
    // pruning: the scan decodes only event_id plus the filter columns
    assert(physical.contains("cols=event_id"), physical)

    val expect = Tables.events(spark, sfDir)
      .filter(graft.util.Det.tsMicros(col("ts")) > 1705320000000000L &&
        col("event_type") === "click")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(q.collect().map(_.getLong(0)).toSet == expect)
    assert(expect.nonEmpty)
  }

  test("rejected predicates still evaluate correctly post-scan") {
    val got = source.filter(col("value") > 50.0).count()
    val expect = Tables.events(spark, sfDir).filter(col("value") > 50.0).count()
    assert(got == expect)
  }

  test("max/min/count push down to footer stats with zero row reads") {
    val q = source.agg(max(col("ts_us")).as("max_ts_us"),
      min(col("ts_us")).as("min_ts_us"), count(lit(1)).as("n"))
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedAggregates"), physical)
    assert(physical.contains("0 row reads"), physical)
    // complete pushdown: no HashAggregate survives in the plan
    assert(!physical.contains("HashAggregate"), physical)

    val row = q.collect().head
    val exp = Tables.events(spark, sfDir)
      .agg(max(graft.util.Det.tsMicros(col("ts"))),
        min(graft.util.Det.tsMicros(col("ts"))), count(lit(1)))
      .collect().head
    assert(row.getLong(0) == exp.getLong(0))
    assert(row.getLong(1) == exp.getLong(1))
    assert(row.getLong(2) == exp.getLong(2))
  }

  test("aggregate with a filter does NOT push down (stats cover whole file)") {
    val q = source.filter(col("event_type") === "click").agg(max(col("ts_us")))
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("PushedAggregates"), physical)
    val got = q.collect().head.getLong(0)
    val exp = Tables.events(spark, sfDir).filter(col("event_type") === "click")
      .agg(max(graft.util.Det.tsMicros(col("ts")))).collect().head.getLong(0)
    assert(got == exp)
  }

  test("top-N pushes into the scan and matches an unpushed sort") {
    val q = source.select("event_id", "ts_us")
      .orderBy(col("ts_us"), col("event_id")).limit(7)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedTopN"), physical)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exp = Tables.events(spark, sfDir)
      .select(col("event_id"), graft.util.Det.tsMicros(col("ts")).as("ts_us"))
      .orderBy(col("ts_us"), col("event_id")).limit(7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exp)
  }

  test("descending top-N composes with a pushed filter") {
    // the event_type filter is absorbed by the source (family pushdown),
    // so the scan is the topmost node and top-N can push too; a residual
    // filter above the scan correctly blocks top-N pushdown
    val q = source.select("event_id", "ts_us", "event_type")
      .filter(col("event_type") === "click")
      .orderBy(col("ts_us").desc, col("event_id")).limit(5)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedTopN"), physical)
    assert(physical.contains("ts_us DESC"), physical)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exp = Tables.events(spark, sfDir)
      .select(col("event_id"), graft.util.Det.tsMicros(col("ts")).as("ts_us"),
        col("event_type"))
      .filter(col("event_type") === "click")
      .orderBy(col("ts_us").desc, col("event_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exp)
  }

  test("a directory of part files reads like the single file") {
    val dir = java.nio.file.Files.createTempDirectory("hbasesim-multi").toString
    Tables.eventsRaw(spark, sfDir).repartition(3)
      .write.mode("overwrite").parquet(dir)
    val multi = spark.read.format("hbasesim").option("path", dir).load()
    val viaMulti = multi.select("event_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaSingle = source.select("event_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaMulti == viaSingle)
    // aggregate pushdown merges footer stats across part files
    val agg = multi.agg(max(col("ts_us")), min(col("ts_us")), count(lit(1)))
    assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    val row = agg.collect().head
    val exp = source.agg(max(col("ts_us")), min(col("ts_us")), count(lit(1)))
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      (exp.getLong(0), exp.getLong(1), exp.getLong(2)))
  }

  test("bare limit pushes into the scan") {
    val q = source.select("event_id").limit(13)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedLimit=13") || physical.contains("LIMIT 13"),
      physical)
    assert(q.count() == 13)
  }
}
