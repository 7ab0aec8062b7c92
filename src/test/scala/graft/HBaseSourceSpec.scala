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
}
