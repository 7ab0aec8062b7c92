package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond the dedup/text groups: the
  * corpus-level transforms between "raw documents" and "training
  * batches" — benchmark decontamination, weighted source mixing with
  * epochs, and token-budget sequence packing.
  *
  * Scale notes are per-operator; the common theme is that every join
  * here ships slim (id, gram/bucket) rows and every global order is
  * computed with two-phase offset numbering, never a single-reducer
  * window.
  */
object Pipeline {

  /** Word n-grams of `text` as an array column: whitespace-split, then
    * positional slices joined with spaces. Narrow (no shuffle, no UDF);
    * the per-row cost is O(words · n) string building, all codegen. */
  def wordNgrams(text: Column, n: Int): Column = {
    val words = split(text, " ", -1)
    // sequence(1, 0) would DESCEND ([1, 0] — Spark sequences run either
    // direction), so texts shorter than n need the explicit empty case
    when(size(words) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(words) - lit(n - 1)),
        i => array_join(slice(words, i, lit(n)), " ")))
  }

  /** Benchmark decontamination: documents sharing at least one word
    * `n`-gram with the benchmark set are flagged (with how many distinct
    * grams they share) — the train/eval overlap check every training
    * corpus needs before release.
    *
    * Precondition: `doc_id` is row-unique in `docs` (one row per
    * document — the documents-table contract every dedup operator here
    * shares). The per-row `array_distinct` dedupes grams WITHIN a row
    * only; a doc_id spread over multiple rows would double-count its
    * shared grams. Asserted in `PipelineSpec`.
    *
    * Scale: the benchmark side is small by construction (an eval set,
    * not a corpus), so its distinct grams BROADCAST to the corpus-side
    * exploded grams — no shuffle of the 100 TB side. Per-doc gram
    * dedupe is NARROW: `array_distinct` inside the row before the
    * explode (a doc_id appears once pre-explode, so within-doc is the
    * only dedupe needed) — a `distinct()` after the explode would
    * shuffle every (doc_id, gram) row of the corpus just to re-derive
    * that. The corpus side therefore has NO exchange below the final
    * per-doc count, which combines map-side and only carries
    * benchmark-matching rows. All-pairs never materializes. */
  def decontaminate(docs: DataFrame, benchmarkSources: Seq[String],
      n: Int): DataFrame = {
    val grams = docs
      .select(col("doc_id"), col("source"),
        explode(array_distinct(wordNgrams(col("text"), n))).as("gram"))
    val benchGrams = grams.filter(col("source").isin(benchmarkSources: _*))
      .select("gram").distinct()
    grams.filter(!col("source").isin(benchmarkSources: _*))
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** The PII classes [[redact]] scrubs, as (name, pattern, replacement).
    * Patterns stay inside the regex subset Java regex and RE2 interpret
    * identically (char classes, {m,}, \b, \d — no lookaround, no
    * backrefs), so the DuckDB oracle can replay them verbatim. */
  val piiClasses: Seq[(String, String, String)] = Seq(
    ("email", """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}""", "[EMAIL]"),
    ("phone", """\b\d{3}-\d{3}-\d{4}\b""", "[PHONE]"),
    ("id", """\b\d{3}-\d{2}-\d{4}\b""", "[ID]"))

  /** PII redaction — the release gate every training corpus passes
    * before shipping: scrub emails / phone numbers / SSN-shaped ids and
    * report how many of each class every document carried. Counts are
    * taken BEFORE scrubbing (the report is about the raw text); the
    * scrub is a fixed-order `regexp_replace` chain. All of it is narrow
    * codegen'd column work — no shuffle, no UDF; at 100 TB it streams
    * through the scan like any other row transform. The classes are
    * pattern-disjoint (3-3-4 phones vs 3-2-4 ids), so chain order
    * can't change the result. */
  def redact(docs: DataFrame): DataFrame = {
    val counts = piiClasses.map { case (name, pat, _) =>
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
        .as(s"n_${name}s")
    }
    val redacted = piiClasses.foldLeft(col("text")) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    docs.select(col("doc_id") +: counts :+ redacted.as("redacted"): _*)
  }

  /** Weighted source mixing with epochs: each source carries a mixture
    * weight; weight 2.5 means every doc appears twice plus a 50%
    * deterministic chance of a third copy, weight 0.25 keeps a
    * deterministic quarter of docs — the up/down-sampling step that
    * turns raw source proportions into a training mixture.
    *
    * Copies materialize as (doc_id, epoch) rows; the fractional epoch
    * keeps docs whose md5 band clears the threshold (reproducible on any
    * engine, no RNG state). Narrow: explode + filter, no shuffle. At
    * 100 TB the explode is the point — the output IS factor× the input;
    * nothing is buffered beyond a row. */
  def weightedMix(docs: DataFrame, weightOf: Column, fracBandOf: Column): DataFrame = {
    val fullCopies = floor(weightOf).cast("int")
    docs
      .withColumn("__w_full", fullCopies)
      .withColumn("__band", fracBandOf)
      .withColumn("epoch", explode(sequence(lit(0), col("__w_full"))))
      .filter(col("epoch") < col("__w_full") ||
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2) < col("__band"))
      .drop("__w_full", "__band")
  }

  /** The full corpus-release chain, composed from the library's own
    * stages — what a user of this engine actually runs before shipping
    * a training corpus:
    *
    *  1. near-dup removal — keep the smallest doc_id per
    *     [[graft.text.TextOps.fingerprintCol]] (one hash shuffle on
    *     the fingerprint);
    *  2. quality gate — drop docs scoring under `minQuality`
    *     ([[graft.text.TextOps.quality]] metrics, narrow);
    *  3. benchmark decontamination — drop docs sharing a word `n`-gram
    *     with the benchmark sources ([[decontaminate]]'s broadcast
    *     shape, applied as an anti-join on the flagged ids);
    *  4. PII scrub — [[piiClasses]] counts + redaction, narrow;
    *  5. emit the release MANIFEST: (doc_id, source, n_tok,
    *     quality_score, n_redacted, redacted_md5) — the audit record a
    *     release pipeline persists beside the cleaned shards.
    *
    * Every stage is deterministic, so the manifest is reproducible on
    * any engine — the property a release audit needs. Scale shape: two
    * corpus-sized hash shuffles total (fingerprint dedup; the
    * decontaminate flag set), everything else narrow; a production run
    * materializes each stage's output as a table instead of fusing,
    * but the per-stage plans are exactly these. */
  def releaseManifest(docs: DataFrame, benchmarkSources: Seq[String], n: Int,
      minQuality: Double): DataFrame =
    manifestTail(docs, fingerprintKeepers(docs, benchmarkSources),
      benchmarkSources, n, minQuality)

  /** [[releaseManifest]] with a NEAR-dup removal stage — the production
    * release chain: after the exact-fingerprint dedup, MinHash-LSH
    * candidates confirmed by exact shingle-Jaccard ≥ `tau` feed the
    * min-label clustering ([[graft.dedup.Dedup.nearDupClusters]]) and
    * only each cluster's smallest doc_id survives. A corpus release
    * prioritizes RECALL (every missed near-dup ships a duplicate
    * training document), so the banding is 16 bands of 2 slots: a true
    * 0.8-Jaccard pair escapes with probability (1 − 0.8²)¹⁶ ≈ 1e-7,
    * at the price of more false candidates for the (exact, in-stage)
    * confirm to reject — the right side of the trade at release time,
    * and still a bucketed equi-join, never all-pairs. Every stage is
    * deterministic, so the manifest stays reproducible on any engine;
    * the oracle replays the confirmed-pair set as all-pairs Jaccard
    * over the fingerprint keepers (`PipelineSpec` asserts the LSH
    * candidate set loses nothing vs all-pairs at this banding). */
  def releaseManifestV2(docs: DataFrame, benchmarkSources: Seq[String], n: Int,
      minQuality: Double, tau: Double = 0.8): DataFrame = {
    import graft.dedup.{Dedup, MinHash}
    val fpKeepers = fingerprintKeepers(docs, benchmarkSources)
      .persist() // feeds the pair join, the label join, and the tail
    val pairs = MinHash.nearDupPairs(fpKeepers, n = 3, numHashes = 32,
      bands = 16, tau = tau)
    val labels = Dedup.nearDupClusters(pairs).withColumnRenamed("id", "doc_id")
    val keepers = fpKeepers.join(labels, Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .drop("cluster")
    // eager materialization so the stage cache can be dropped before
    // returning — a long-lived library session must not accumulate it
    val out = manifestTail(docs, keepers, benchmarkSources, n, minQuality)
      .localCheckpoint()
    fpKeepers.unpersist(blocking = false)
    out
  }

  /** [[releaseManifestV2]] with a SEMANTIC near-dup stage — the
    * SemDeDup-shaped production chain: after the string stages
    * (fingerprint, MinHash-Jaccard) the survivors' EMBEDDINGS go
    * through [[graft.dedup.Dedup.embeddingNearDupAuto]] (τ ≤ 0.5
    * routes to IVF candidates, exact cosine confirms in-stage) →
    * min-label clustering → keeper, catching paraphrase-level
    * duplicates no token-overlap stage can see. `emb` is the
    * embeddings table (vec_id aligned with doc_id — the documents ↔
    * embeddings contract of the testdata and of any corpus that
    * embeds its docs); only keepers' embeddings enter the semantic
    * join, so the stage is sized by the deduped corpus.
    *
    * Oracle soundness (the v2 replay pattern): the DuckDB oracle
    * replays the semantic pairs as ALL-PAIRS exact cosine ≥ `cosTau`
    * over the string-stage keepers, which is the operator's output
    * exactly as long as the candidate generator loses no ≥-cosTau
    * pair on this corpus — asserted by the completeness case in
    * `PipelineSpec` (the IVF/LSH dispatch confirms exact cosine
    * in-stage, so candidates can only be MISSING, never wrong).
    *
    * Library hygiene: the manifest is eagerly materialized
    * (localCheckpoint) and every stage intermediate unpersisted
    * before returning — a long-lived session does not accumulate
    * stage caches (the v2 leak, fixed there too). */
  def releaseManifestV3(docs: DataFrame, emb: DataFrame,
      benchmarkSources: Seq[String], n: Int, minQuality: Double,
      tau: Double = 0.8, cosTau: Double = 0.45): DataFrame = {
    import graft.dedup.{Dedup, MinHash}
    val fpKeepers = fingerprintKeepers(docs, benchmarkSources)
      .persist() // feeds the pair join, the label join, and the next stage
    val pairs = MinHash.nearDupPairs(fpKeepers, n = 3, numHashes = 32,
      bands = 16, tau = tau)
    val strLabels = Dedup.nearDupClusters(pairs).withColumnRenamed("id", "doc_id")
    val strKeepers = fpKeepers.join(strLabels, Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .drop("cluster")
      .persist() // feeds the embedding join and the tail
    val keeperEmb = emb.select(col("vec_id"), col("embedding"))
      .join(strKeepers.select(col("doc_id").as("vec_id")), "vec_id")
    // ivfNprobe=4: recall-first, like the 16×2 banding above — the
    // completeness spec pins recall 1.0 vs all-pairs at this τ
    val semPairs = Dedup.embeddingNearDupAuto(keeperEmb, cosTau, ivfNprobe = 4)
    val semLabels = Dedup.nearDupClusters(semPairs).withColumnRenamed("id", "doc_id")
    val keepers = strKeepers.join(semLabels, Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .drop("cluster")
    val out = manifestTail(docs, keepers, benchmarkSources, n, minQuality)
      .localCheckpoint() // eager: safe to drop stage caches below
    fpKeepers.unpersist(blocking = false)
    strKeepers.unpersist(blocking = false)
    out
  }

  /** Stage 1 of the release chain: drop benchmark sources, keep the
    * smallest doc_id per token-set fingerprint (one hash shuffle).
    * Package-visible so `PipelineSpec` can rebuild the exact
    * string-stage keeper frame v3 feeds its semantic stage. */
  private[graft] def fingerprintKeepers(docs: DataFrame,
      benchmarkSources: Seq[String]): DataFrame = {
    import graft.text.TextOps
    val corpus = docs.filter(!col("source").isin(benchmarkSources: _*))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fingerprint")
    corpus
      .withColumn("fingerprint", TextOps.fingerprintCol(col("text")))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keeper"))
      .drop("fingerprint", "keeper")
  }

  /** Stages 2-5 of the release chain (quality gate → decontamination
    * anti-join → PII scrub → manifest), shared by both manifest
    * variants. `docs` is the ORIGINAL frame (benchmark sources
    * included — decontamination needs them); `keepers` is whatever
    * dedup stage preceded. */
  private def manifestTail(docs: DataFrame, keepers: DataFrame,
      benchmarkSources: Seq[String], n: Int, minQuality: Double): DataFrame = {
    import graft.text.TextOps
    val scored = TextOps.quality(keepers, keep = Seq("source", "text"))
      .filter(col("quality_score") >= minQuality)
    val contaminated = decontaminate(docs, benchmarkSources, n).select("doc_id")
    val clean = scored.join(contaminated, Seq("doc_id"), "left_anti")
    val counts = piiClasses.map { case (_, pat, _) =>
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    }
    val redacted = piiClasses.foldLeft(col("text")) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    clean.select(col("doc_id"), col("source"),
      col("n_tokens").as("n_tok"), col("quality_score"),
      counts.reduce(_ + _).as("n_redacted"),
      md5(redacted).as("redacted_md5"))
  }

  /** v3 + the SHARD step — the complete release: the v3 manifest's
    * kept docs dealt into `nShards` size-balanced training shards by
    * the [[shardManifest]] round-robin rule ((n_tok desc, doc_id) rank
    * modulo nShards — deterministic, within one max-doc of the mean
    * load), emitting the per-shard release manifest (doc count, token
    * and redaction sums, id range). This is the last artifact a
    * release writes: "which shard holds what, and how much was
    * scrubbed". Global rank via the same two-phase offset pattern —
    * the manifest is release-sized, but the pattern keeps even a
    * billion-doc release off a single reducer. */
  def releaseManifestV4(docs: DataFrame, emb: DataFrame,
      benchmarkSources: Seq[String], n: Int, minQuality: Double,
      nShards: Int, tau: Double = 0.8, cosTau: Double = 0.45): DataFrame = {
    require(nShards > 0)
    val m = releaseManifestV3(docs, emb, benchmarkSources, n, minQuality, tau, cosTau)
      .select(col("doc_id"), col("n_tok"), col("n_redacted"))
    val spark = m.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = m
      .repartitionByRange(nParts, col("n_tok").desc, col("doc_id"))
      .sortWithinPartitions(col("n_tok").desc, col("doc_id"))
    val rdd = sorted.rdd.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val partCounts = rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
        .collect().sortBy(_._1).map(_._2)
      val offsets = partCounts.scanLeft(0L)(_ + _)
      val dealt = rdd.mapPartitionsWithIndex { (i, it) =>
        var rank = offsets(i)
        it.map { case (id, t, nr) =>
          rank += 1
          org.apache.spark.sql.Row(id, t, nr, (rank - 1) % nShards)
        }
      }
      val lt = org.apache.spark.sql.types.LongType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", lt, nullable = false),
        org.apache.spark.sql.types.StructField("n_tok", lt, nullable = false),
        org.apache.spark.sql.types.StructField("n_redacted", lt, nullable = false),
        org.apache.spark.sql.types.StructField("shard", lt, nullable = false)))
      val out = spark.createDataFrame(dealt, schema)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"),
          sum(col("n_redacted")).as("sum_redacted"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
      out.localCheckpoint()
    } finally rdd.unpersist(blocking = false)
  }

  /** The APPLY step of substring-level dedup: remove every token
    * covered by a [[graft.dedup.Dedup.substringDedup]] span (repeated
    * ≥k-token runs, global-first occurrence kept corpus-wide) and emit
    * the per-doc audit row — token count before, tokens removed, md5 of
    * the cleaned token stream (the hash a release manifest would carry;
    * a doc that was one big repeated span cleans to the empty stream).
    *
    * Scale shape: the span frame is sized by the DUP volume, not the
    * corpus; it aggregates to one small span-list row per affected doc
    * and joins back by id. The strip itself is a per-row positional
    * array filter over that doc's own spans — linear, no shuffle beyond
    * the span join. */
  def stripRepeatedSpans(docs: DataFrame, k: Int): DataFrame = {
    val spans = graft.dedup.Dedup.substringDedup(docs, k)
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("spans"))
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("spans",
        coalesce(col("spans"), array().cast("array<struct<s:bigint,e:bigint>>")))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"),
        filter(col("toks"), (_, i) =>
          !exists(col("spans"), sp =>
            i.cast("long") >= sp("s") && i.cast("long") <= sp("e"))).as("kept"))
      .select(col("doc_id"), col("n_tok"),
        (col("n_tok") - size(col("kept"))).cast("long").as("n_removed"),
        md5(concat_ws(" ", col("kept"))).as("cleaned_md5"))
  }

  /** Token-budget sequence packing (concat-stream form): documents are
    * concatenated in doc_id order and the stream is cut every `budget`
    * tokens; a doc's bin is the bin its first token lands in. This is
    * the "pack documents into fixed context windows" step of a training
    * pipeline, and the global running token count is the same
    * total-order problem as bulk batch numbering — solved the same way:
    *
    *  1. range-partition on doc_id, sort within partitions (parallel);
    *  2. per-partition token sums → driver-side exclusive-scan offsets
    *     (metadata, ≤numPartitions longs — not data);
    *  3. each partition streams its rows once, carrying offset + local
    *     running sum; bin = running_start / budget.
    *
    * The partitioned RDD persists across the two jobs so both see the
    * same sampled range boundaries (same determinism argument as
    * River.assignBatches). No single-reducer window anywhere. */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // REAL token counts (merges-table BPE, round 11) — a packing run's
    // whole purpose is hitting a context-length budget, and chars/4 or
    // whitespace counts mis-size bins by double-digit percents
    val withTok = docs.select(col("doc_id"),
      graft.text.Bpe.tokenCount(col("text")).as("n_tok"))
    val sorted = withTok
      .repartitionByRange(nParts, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
    val rdd = sorted.rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val partSums = rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.map(_._2).sum)))
        .collect().sortBy(_._1).map(_._2)
      val offsets = partSums.scanLeft(0L)(_ + _)
      val packed = rdd.mapPartitionsWithIndex { (i, it) =>
        var cum = offsets(i)
        it.map { case (id, t) =>
          val start = cum; cum += t
          org.apache.spark.sql.Row(id, t, start / budget)
        }
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_tok",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val df = spark.createDataFrame(packed, schema)
      // aggregate per bin BEFORE unpersist: the action must run while
      // the packed lineage's cached parent is alive
      val out = df.groupBy("bin").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tok"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      out.localCheckpoint()
    } finally rdd.unpersist(blocking = false)
  }

  /** Token-length inventory: per (source, width-bucketed BPE token
    * count) doc counts + exact token sums — the corpus profile a
    * context-length / curriculum decision reads ("how much of source X
    * is under 128 tokens?"). Token counts are the real merges-table BPE
    * (`graft.text.Bpe`); bucketing is exact integer division, so the
    * whole thing is one narrow projection + one map-side-combinable
    * hash agg over (source, bucket) — scan-shaped at any corpus size. */
  def tokenHistogram(docs: DataFrame, width: Long): DataFrame = {
    require(width > 0)
    docs
      .select(col("source"),
        graft.text.Bpe.tokenCount(col("text")).as("n_tok"))
      .withColumn("bucket", floor(col("n_tok") / width).cast("long"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
  }

  /** Deterministic size-balanced output sharding: docs ranked by (BPE
    * tokens desc, doc_id) are dealt round-robin into `nShards` training
    * shards — the classic LPT-flavored deal that lands every shard
    * within one max-doc of the mean token load, reproducible on any
    * engine (no RNG, no greedy bin state). The global rank is the
    * packSequences total-order problem, solved the same two-phase way:
    * range-partition on the sort key, per-partition counts →
    * driver-side exclusive scan (metadata), parallel local rank +
    * offset. Output is the per-shard manifest (doc count, exact token
    * sum, heaviest/lightest doc) — what a release writes next to the
    * shard files. */
  def shardManifest(docs: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0)
    val spark = docs.sparkSession
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val withTok = docs.select(col("doc_id"),
      graft.text.Bpe.tokenCount(col("text")).as("n_tok"))
    val sorted = withTok
      .repartitionByRange(nParts, col("n_tok").desc, col("doc_id"))
      .sortWithinPartitions(col("n_tok").desc, col("doc_id"))
    val rdd = sorted.rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val partCounts = rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
        .collect().sortBy(_._1).map(_._2)
      val offsets = partCounts.scanLeft(0L)(_ + _)
      val dealt = rdd.mapPartitionsWithIndex { (i, it) =>
        var rank = offsets(i)
        it.map { case (id, t) =>
          rank += 1
          org.apache.spark.sql.Row(id, t, (rank - 1) % nShards)
        }
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_tok",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("shard",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val df = spark.createDataFrame(dealt, schema)
      val out = df.groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tok"),
        max(col("n_tok")).as("max_tok"),
        min(col("n_tok")).as("min_tok"))
      out.localCheckpoint()
    } finally rdd.unpersist(blocking = false)
  }
}
