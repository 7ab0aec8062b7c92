package graft.similarity

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.GraftFunctions

/** Maintained IVF index for ANN search (VERDICT r11 next #5 — the
  * [[graft.dedup.DedupIndex]] pattern applied to [[Ann.ivfTopK]]).
  *
  * `Ann.ivfTopK` re-runs Lloyd on every invocation; a warehouse
  * doesn't. The production shape this object maintains, the way the
  * reference's river maintains its ES index batch-by-batch
  * (HBaseParser.run:50 — poll, import the delta, repeat):
  *
  *  - `centroids/v=<batchId>`: the trained centroid matrix, one row per
  *    list (cent_id = matrix row index). Trained ONCE on the first
  *    ingest batch (deterministic seeds + fixed Lloyd rounds) and then
  *    FROZEN — later batches assign against it. Centroid drift is
  *    handled by periodic re-train writing a new version (the df-table
  *    versioned-snapshot commit semantics), not by per-batch mutation;
  *    assignment partitions record which centroid version they used.
  *  - `assignments/ingest=<batchId>/cent_id=<list>/`: the
  *    cluster-bucketed corpus — (vec_id, embedding) under a PHYSICAL
  *    cent_id partition directory. Append-only per ingest batch, and
  *    partitioned by list id so a query that probes `nprobe` lists
  *    reads ONLY those directories (parquet partition pruning — the
  *    actual IVF win: nprobe/nCentroids of the corpus touched, not a
  *    post-scan filter).
  *
  * Exactly-once under foreachBatch retries: re-training with an
  * existing centroid version is a no-op; a replayed assignment batch
  * overwrites its own ingest partition — both idempotent
  * (`AnnIndexSpec` pins replay, batch-N == from-scratch, and
  * indexed == recompute equality).
  */
object AnnIndex {

  private def centsDir(root: String) = s"$root/centroids"
  private def assignDir(root: String) = s"$root/assignments"

  private def hadoopFs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Complete (committed) centroid versions, ascending. */
  def centroidVersions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = hadoopFs(spark, centsDir(root))
    val base = new Path(centsDir(root))
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong).sorted
  }

  /** Train the centroid matrix on `trainEmb` and commit it as version
    * `batchId` — a no-op if that version already exists (replay).
    * Deterministic: seeded by the first `nCentroids` vectors by id plus
    * fixed Lloyd rounds, like [[Ann.ivfTopK]]. */
  def trainCentroids(trainEmb: DataFrame, batchId: Long, root: String,
      nCentroids: Int = 16, lloydRounds: Int = 3): Unit = {
    val spark = trainEmb.sparkSession
    if (!centroidVersions(spark, root).contains(batchId)) {
      val cents = Ann.lloydCentroids(trainEmb, nCentroids, lloydRounds)
      import spark.implicits._
      cents.toDF("cent_id", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"${centsDir(root)}/v=$batchId")
    }
  }

  /** The maintained centroid matrix (newest complete version), in
    * cent_id = row-index order. nCentroids × dim doubles — metadata
    * scale, the one sanctioned driver-side collect here. */
  def readCentroids(spark: SparkSession, root: String): Seq[(Int, Seq[Double])] = {
    val vs = centroidVersions(spark, root)
    require(vs.nonEmpty, s"no centroid snapshot under $root — train first")
    spark.read.parquet(s"${centsDir(root)}/v=${vs.last}")
      .orderBy("cent_id").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toSeq
  }

  /** Assign one ingest batch of (vec_id, embedding) against the frozen
    * centroids and append it to the cluster-bucketed corpus — its own
    * ingest partition, physically sub-partitioned by cent_id. A
    * replayed batch id overwrites its own partition (idempotent). */
  def appendBatch(batchEmb: DataFrame, batchId: Long, root: String): Unit = {
    val spark = batchEmb.sparkSession
    val assign = Ann.centroidAssigner(spark,
      Ann.centMatrix(readCentroids(spark, root)))
    batchEmb.select(col("vec_id"),
        col("embedding"),
        assign(col("embedding"), 1).getItem(0).as("cent_id"))
      .write.partitionBy("cent_id").mode("overwrite")
      .parquet(s"${assignDir(root)}/ingest=$batchId")
  }

  /** The cluster-bucketed corpus across every ingested batch. Filters
    * on cent_id prune to the probed list directories (spec-checked via
    * the scan's partition count). An index built over an EMPTY corpus
    * holds partition markers but no data files — schema inference then
    * fails, so that case degrades to an explicit empty frame with the
    * index schema (probes of an empty index return no neighbors, they
    * don't crash). */
  def assignments(spark: SparkSession, root: String): DataFrame =
    try
      spark.read.parquet(assignDir(root))
        .select(col("vec_id"), col("embedding"), col("cent_id"))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(
            StructField("vec_id", LongType),
            StructField("embedding", ArrayType(FloatType)),
            StructField("cent_id", IntegerType))))
    }

  /** Structured Streaming maintenance: first batch trains the
    * centroids, every batch (including the first) appends its
    * assignments — the river's poll loop with the IVF index as sink. */
  def maintain(embStream: DataFrame, root: String, checkpoint: String,
      nCentroids: Int = 16, lloydRounds: Int = 3): StreamingQuery =
    embStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (centroidVersions(batch.sparkSession, root).isEmpty)
          trainCentroids(batch.toDF(), id, root, nCentroids, lloydRounds)
        appendBatch(batch.toDF(), id, root)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** IVF top-k READING the maintained index: probe list selection
    * happens against the persisted centroid matrix, candidates come
    * from ONLY the probed cent_id partitions (the probed id set is
    * ≤ nQueries × nprobe ints — metadata — so it collects into a
    * literal IN-filter that parquet partition-prunes), and exact cosine
    * re-ranks inside them. Identical output to the recompute form with
    * the same frozen centroids (`AnnIndexSpec`), without touching
    * (1 − nprobe/nCentroids) of the corpus. */
  /** Incremental SEMANTIC near-dup against the maintained index — the
    * embedding analog of `MinHash.incrementalNearDupPairsWithIndex`,
    * and the shape a continuously-ingesting corpus actually runs
    * (dedup the delta BEFORE ingesting it): each new vector probes its
    * `nprobe` nearest frozen centroids, candidates are (delta ×
    * probed cent_id partitions of the cluster-bucketed corpus) plus
    * the delta-sized within-probe self-join, and exact cosine ≥ τ
    * confirms in-stage. The probed id set is ≤ nCentroids ints
    * (metadata), so the corpus read partition-prunes; the corpus is
    * never re-assigned or self-joined. Emits pairs touching ≥ 1 new
    * vector, `a_id < b_id`; PRECONDITION: the delta is NOT yet
    * ingested (else the self-match guard hides real dups).
    * Subset-of-exact + recall spec in `AnnIndexSpec`. */
  def incrementalEmbeddingNearDup(spark: SparkSession, root: String,
      newEmb: DataFrame, tau: Double, nprobe: Int = 2): DataFrame = {
    val assign = Ann.centroidAssigner(spark,
      Ann.centMatrix(readCentroids(spark, root)))
    val delta = newEmb.select(col("vec_id"), col("embedding"),
        explode(assign(col("embedding"), nprobe)).as("cent_id"))
      .persist()
    val probed = delta.select("cent_id").distinct()
      .collect().map(_.getInt(0)).sorted // bounded by nCentroids
    val corpus = assignments(spark, root)
      .filter(col("cent_id").isin(probed.map(Int.box): _*))
    val vsOld = delta
      .select(col("cent_id"), col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .join(corpus.select(col("cent_id"), col("vec_id").as("o_id"),
        col("embedding").as("o_emb")), Seq("cent_id"))
      .filter(col("n_id") =!= col("o_id")) // disjointness guard
      .withColumn("cos_sim", GraftFunctions.cosineSim(col("n_emb"), col("o_emb")))
      .filter(col("cos_sim") >= tau)
      .select(least(col("n_id"), col("o_id")).as("a_id"),
        greatest(col("n_id"), col("o_id")).as("b_id"), col("cos_sim"))
    val vsNew = delta
      .select(col("cent_id"), col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      .join(delta.select(col("cent_id"), col("vec_id").as("b_id"),
        col("embedding").as("b_emb")), Seq("cent_id"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos_sim", GraftFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .filter(col("cos_sim") >= tau)
      .select("a_id", "b_id", "cos_sim")
    vsOld.unionByName(vsNew).dropDuplicates("a_id", "b_id")
  }

  def ivfTopKIndexed(spark: SparkSession, root: String, emb: DataFrame,
      nQueries: Int, k: Int, nprobe: Int = 4): DataFrame = {
    val assign = Ann.centroidAssigner(spark,
      Ann.centMatrix(readCentroids(spark, root)))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(assign(col("embedding"), nprobe)).as("cent_id"))
    val probed = queries.select("cent_id").distinct()
      .collect().map(_.getInt(0)).sorted // bounded: ≤ nQueries × nprobe
    val cand = assignments(spark, root)
      .filter(col("cent_id").isin(probed.map(Int.box): _*))
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
        col("cent_id"))
    val sim = broadcast(queries).join(cand, Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", GraftFunctions.cosineSim(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("cand_id"))
    sim.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "cand_id", "cos_sim")
  }
}
