package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Analytics
import graft.text.TextOps

/** Degenerate-input behavior of the round-12 operators: empty frames
  * and single-row frames must yield empty/degenerate RESULTS, not plan
  * or runtime crashes — an engine library gets handed empty partitions
  * and filtered-to-nothing inputs constantly at 100 TB. */
class EdgeCasesSpec extends SparkSpec {

  private lazy val emptyEvents: DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private lazy val emptyDocs: DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  test("empty events: aggregation operators return empty or degenerate frames") {
    assert(Analytics.changePoint(emptyEvents).count() == 0)
    assert(Analytics.missingAgg(emptyEvents, 5, 7).count() == 0)
    assert(Analytics.termsPartition(emptyEvents, 4, 2, 10).count() == 0)
    assert(Analytics.counterRate(emptyEvents, 10).count() == 0)
    assert(Analytics.distanceFeature(emptyEvents, 0L, 1L, 1.0, 10).count() == 0)
    assert(Analytics.runtimeFields(emptyEvents).count() == 0)
    assert(Analytics.randomSamplerAgg(emptyEvents, "200").count() == 0)
    assert(Analytics.bucketScript(emptyEvents).count() == 0)
    assert(Analytics.ipPrefixFacet(emptyEvents, 12).count() == 0)
    assert(Analytics.rankFeature(emptyEvents, 50.0, 2.0, 10).count() == 0)
    assert(Analytics.timeSeriesAgg(emptyEvents, 10).count() == 0)
    assert(Analytics.extendedStatsBucket(emptyEvents).count() == 1) // 1-row stats of 0 buckets
    assert(Analytics.variableWidthHistogram(emptyEvents, 6).count() == 0)
  }

  test("empty events: globalAgg emits the single all-zero gauge row") {
    val r = Analytics.globalAgg(emptyEvents,
      col("event_type") === "purchase").head()
    assert(r.getLong(0) == 0L && r.getLong(2) == 0L)
  }

  test("empty docs: text/search operators return empty frames") {
    assert(TextOps.boostingQuery(emptyDocs, Seq("a"), "b", 0.3, 10).count() == 0)
    assert(TextOps.pinnedQuery(emptyDocs, Seq(1L), Seq("a"), 10).count() == 0)
    assert(TextOps.matchPhrasePrefix(emptyDocs, "a", "b", 10).count() == 0)
    assert(TextOps.spanFirst(emptyDocs, "a", 5, 10).count() == 0)
    assert(TextOps.intervalsQuery(emptyDocs, "a", "b", "c", 2, 10).count() == 0)
    assert(TextOps.frequentItemSets(emptyDocs, 5, 1L, 10).count() == 0)
    assert(TextOps.combinedFieldsSearch(emptyDocs, Seq("a"), 8, 2L, 1L, 10).count() == 0)
    assert(graft.multimodal.Multimodal.payloadDedup(emptyDocs).count() == 0)
  }

  test("empty inputs: the round-13 operators degrade, never crash") {
    import graft.text.BoolDsl
    // match_bool_prefix / rescore over an empty corpus
    assert(TextOps.matchBoolPrefix(emptyDocs, Seq("a"), "b", 10).count() == 0)
    assert(TextOps.rescoreSearch(emptyDocs, Seq("a"), "b", "c", 5, 5).count() == 0)
    // indexed percolator: empty corpus, and a query set where NOTHING
    // is extractable (all-always-candidates path over zero docs)
    val qs = Seq(
      "p1" -> BoolDsl.Bool(must = Seq(BoolDsl.MatchQ("a"))),
      "p2" -> BoolDsl.Bool(filter = Seq(BoolDsl.TermQ("lang", "de"))))
    assert(BoolDsl.percolateDslIndexed(emptyDocs, qs).count() == 0)
    assert(BoolDsl.percolatorCandidates(emptyDocs,
      Seq("p2" -> BoolDsl.Bool(filter = Seq(BoolDsl.TermQ("lang", "de"))))).count() == 0)
    // geo_shape facet over empty events
    val hex = Seq((0.0, -50.0), (40.0, -10.0), (5.0, 5.0),
      (10.0, 60.0), (-30.0, 40.0), (-45.0, -25.0))
    assert(graft.operators.Geo.geoShapeFacet(
      graft.operators.Geo.withCoords(emptyEvents), hex).count() == 0)
    // two-phase batching over empty events (offset map degenerate)
    assert(graft.river.River.assignBatches(emptyEvents,
      Seq(col("event_id")), 100).count() == 0)
  }

  test("empty-corpus sweep fixes: footer watermark, percentiles_bucket, empty ANN index") {
    // a fully-empty testdata dir (the reference's first-import world)
    val dir = java.nio.file.Files.createTempDirectory("sf-empty").toString
    Seq("events", "documents", "embeddings").foreach { t =>
      Tables.load(spark, sfDir, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // footer-stats watermark over zero row groups: pushdown declines,
    // Spark computes NULL max / 0 count (was: empty.reduceLeft crash)
    val wm = spark.read.format("hbasesim")
      .option("path", s"$dir/events.parquet").load()
      .agg(max(col("ts_us")).as("max_ts_us"), count(lit(1)).as("n")).head()
    assert(wm.isNullAt(0) && wm.getLong(1) == 0L)
    // percentiles over zero buckets: NULLs, not element_at(0) (ANSI)
    val pb = Analytics.percentilesBucket(
      spark.read.parquet(s"$dir/events.parquet"), Seq(0.5, 0.9)).head()
    assert(pb.getLong(0) == 0L && pb.isNullAt(1) && pb.isNullAt(2))
    // an ANN index over an empty corpus: probes return nothing, no
    // schema-inference crash on the data-less partition directories
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val root = java.nio.file.Files.createTempDirectory("ann-empty").toString
    similarity.AnnIndex.trainCentroids(emb, 0L, root)
    similarity.AnnIndex.appendBatch(emb, 0L, root)
    assert(similarity.AnnIndex.assignments(spark, root).count() == 0)
  }

  test("termsLookup: a missing lookup doc yields no matches, not a crash") {
    val docs = Tables.documents(spark, sfDir)
    assert(TextOps.termsLookup(docs, -999L, 10).count() == 0)
  }

  test("counterRate: single-sample series (span 0) are dropped") {
    import spark.implicits._
    val one = Seq((1L, 1000L, 10L, "click", 5.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    assert(Analytics.counterRate(one, 10).count() == 0)
  }

  test("bucketCorrelation: a zero-variance series yields NaN, not a crash") {
    import spark.implicits._
    // only clicks → purchase series all zero → zero variance → r = NaN
    val ev = (0 until 10).map(i =>
        (i.toLong, i.toLong * 86400000000L, i.toLong, "click", 1.0 + i, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val r = Analytics.bucketCorrelation(ev).head()
    assert(r.getLong(0) == 10L && r.getDouble(1).isNaN)
  }
}
