package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.river.{River, RiverConfig, StreamingRiver}

class StreamingRiverSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("streaming upsert converges to the batch latest-per-key result") {
    val src = tmp("river-src")
    val sink = tmp("river-sink") + "/index"
    val ckpt = tmp("river-ckpt")
    val events = Tables.events(spark, sfDir).cache()

    // stage the events as files so readStream replays them as a stream
    events.repartition(4).write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(events.schema).parquet(src)

    val cfg = RiverConfig(sourcePath = src, sinkPath = sink, keyCol = "user_id")
    val q = StreamingRiver.run(stream, cfg, ckpt)
    q.awaitTermination()

    val streamed = spark.read.parquet(sink)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = River.latestPerKey(events, "user_id", "ts", "event_id")
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("incremental second run only adds newer rows (watermark semantics)") {
    val src = tmp("river2-src")
    val sink = tmp("river2-sink") + "/index"
    val ckpt = tmp("river2-ckpt")
    val events = Tables.events(spark, sfDir).cache()
    val cut = events.agg(expr("percentile_approx(cast(ts as long), 0.5)"))
      .head().getLong(0)

    val old = events.filter(col("ts").cast("long") <= cut)
    val recent = events.filter(col("ts").cast("long") > cut)
    old.write.mode("overwrite").parquet(src)
    val schema = events.schema
    val cfg = RiverConfig(sourcePath = src, sinkPath = sink, keyCol = "user_id")

    StreamingRiver.run(spark.readStream.schema(schema).parquet(src), cfg, ckpt)
      .awaitTermination()
    val afterFirst = spark.read.parquet(sink).count()

    recent.write.mode("append").parquet(src)
    StreamingRiver.run(spark.readStream.schema(schema).parquet(src), cfg, ckpt)
      .awaitTermination()

    val finalIdx = spark.read.parquet(sink)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = River.latestPerKey(events, "user_id", "ts", "event_id")
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(finalIdx == expect)
    assert(afterFirst > 0)
  }

  test("stateful latest-per-key (mapGroupsWithState) matches the batch operator") {
    val events = Tables.events(spark, sfDir).cache()
    val src = tmp("river4-src")
    val ckpt = tmp("river4-ckpt")
    // two stages of files → two micro-batch groups exercising state carry-over
    events.filter(col("event_id") % 2 === 0).write.mode("overwrite").parquet(src)
    events.filter(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)

    val streamed = StreamingRiver.runLatestToMemory(
        spark, stream, "user_id", "event_id", "lstream", ckpt)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val batch = graft.river.River.latestPerKey(events, "user_id", "ts", "event_id")
      .select(col("user_id"), graft.util.Det.tsMicros(col("ts")), col("event_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming windowed aggregation matches the batch twin") {
    val events = Tables.events(spark, sfDir)
    val ckpt = tmp("river3-ckpt")
    val src = tmp("river3-src")
    events.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(events.schema).parquet(src)

    val streamed = StreamingRiver.runWindowedToMemory(
        spark, stream, "5 minutes", "wstream", ckpt)
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), math.round(r.getDouble(3) * 100))).toMap

    val batch = events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), math.round(r.getDouble(3) * 100))).toMap

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
