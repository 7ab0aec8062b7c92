package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A binary document: opaque payload + id (image/audio/video stand-in). */
case class BinaryDoc(doc_id: Long, payload: Array[Byte])

/** Fixed-shape feature record produced by the (stubbed) decoder. */
case class DocFeatures(doc_id: Long, n_bytes: Long, features: Array[Double])

/** Output record of the stubbed resize: source size, target dims, and
  * the resized binary payload. */
case class ResizedDoc(doc_id: Long, n_bytes: Long, out_w: Int, out_h: Int,
    out_payload: Array[Byte])

/** Multimodal-column operators (SURVEY §2 group 6).
  *
  * The pattern for image/audio/video at 100 TB: an opaque `binary`
  * column plus typed metadata columns, partition-parallel decode via
  * `mapPartitions` over a typed Dataset (the Scala analogue of
  * `mapInPandas`: per-partition batch iteration, fixed output schema,
  * no driver involvement). Media payloads here are the documents'
  * UTF-8 bytes — the container has no image/audio codecs — and the
  * decode step is an explicitly-marked deterministic stub; everything
  * Spark-side (schema, encoders, partitioning, batch shape) is real.
  */
object Multimodal {

  /** Binary payload + typed metadata, all codegen'd column expressions:
    * byte length, leading-bytes magic, content checksum. */
  def binaryMeta(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    docs.select(
      col("doc_id"),
      octet_length(payload).cast("long").as("n_bytes"),
      upper(substring(hex(payload), 1, 8)).as("magic_hex"),
      md5(payload).as("md5_hex"))
  }

  /** Exact payload-level dedup — the "same image uploaded twice"
    * detector a multimodal corpus runs before any decode: group by
    * content checksum, keep the smallest id, report the bytes a
    * release saves by deduplicating. One hash agg on the md5 key
    * (map-side combinable — payloads themselves never shuffle, only
    * their 16-byte digests); the real-deployment variant swaps md5
    * for a perceptual hash and this plan shape is unchanged. */
  def payloadDedup(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    docs
      .select(col("doc_id"), md5(payload).as("md5_hex"),
        octet_length(payload).cast("long").as("n_bytes"))
      .groupBy("md5_hex")
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("keeper_id"),
        min(col("n_bytes")).as("n_bytes"))
      .filter(col("n_copies") > 1)
      .withColumn("wasted_bytes", (col("n_copies") - 1) * col("n_bytes"))
  }

  /** STUB DECODER — a real deployment decodes media bytes here (PIL/
    * ffmpeg-style libs are absent in this container). Deterministic
    * fake with a decoder-like access pattern: mean byte value over
    * `dim` equal slices of the payload, scaled to [0,1]. */
  private[graft] def stubDecode(bytes: Array[Byte], dim: Int): Array[Double] = {
    val n = bytes.length
    Array.tabulate(dim) { d =>
      val lo = n.toLong * d / dim
      val hi = n.toLong * (d + 1) / dim
      if (hi == lo) 0.0
      else {
        var s = 0L
        var i = lo
        while (i < hi) { s += bytes(i.toInt) & 0xff; i += 1 }
        s.toDouble / (hi - lo) / 255.0
      }
    }
  }

  /** Frame sampling over a simulated video payload: the byte column is
    * treated as fixed-size frames (`frameBytes` each) and every
    * `frameEvery`-th frame index is emitted with a per-frame content
    * signature. A real deployment swaps the signature for a decode of
    * the frame bytes; the enumeration/explode plumbing — narrow,
    * partition-local, output ∝ frames sampled — is the production
    * shape. */
  def frameSample(docs: DataFrame, frameBytes: Int, frameEvery: Int): DataFrame = {
    val nFrames = (floor(length(col("text")) / lit(frameBytes)) + lit(1)).cast("long")
    docs
      .select(col("doc_id"), col("text"), nFrames.as("n_frames"))
      .select(col("doc_id"), col("text"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(frameEvery.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(col("text").substr((col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes)).cast("binary")).as("frame_sig"),
        col("n_frames"))
  }

  /** AREA-POOLING RESIZE stub (r15 — the remaining multimodal member:
    * decode → transform → re-encode): the payload is interpreted as a
    * `srcW`-byte-wide grayscale grid (H = ceil(n/srcW)) and resized to
    * `outW`×`outH` by block-mean pooling — each output pixel averages
    * the exact source block it covers (integer index arithmetic,
    * truncating mean: deterministic on any JVM). A real deployment
    * swaps the pooling kernel for a codec-backed resize; the
    * Spark-side shape — typed Dataset, partition-parallel
    * mapPartitions, fixed output schema with a BINARY output payload,
    * zero shuffle — is the production pattern and is what the spec
    * pins. Output ∝ outW·outH per doc regardless of payload size: the
    * thumbnail pipeline's bandwidth story. */
  def resizeStub(docs: DataFrame, srcW: Int, outW: Int,
      outH: Int): DataFrame = {
    require(srcW >= 1 && outW >= 1 && outH >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val ds: Dataset[BinaryDoc] = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[BinaryDoc]
    ds.mapPartitions { it =>
      it.map { d =>
        val n = d.payload.length
        val srcH = math.max(1L, (n.toLong + srcW - 1) / srcW)
        val out = new Array[Byte](outW * outH)
        var y = 0
        while (y < outH) {
          var x = 0
          while (x < outW) {
            val x0 = x.toLong * srcW / outW
            val x1 = math.max(x0 + 1, (x + 1).toLong * srcW / outW)
            val y0 = y.toLong * srcH / outH
            val y1 = math.max(y0 + 1, (y + 1).toLong * srcH / outH)
            var s = 0L; var c = 0L
            var yy = y0
            while (yy < y1) {
              var xx = x0
              while (xx < x1) {
                val idx = yy * srcW + xx
                if (idx < n) { s += d.payload(idx.toInt) & 0xff; c += 1 }
                xx += 1
              }
              yy += 1
            }
            out((y * outW + x).toInt) = (if (c == 0) 0L else s / c).toByte
            x += 1
          }
          y += 1
        }
        ResizedDoc(d.doc_id, n.toLong, outW, outH, out)
      }
    }.toDF()
  }

  /** PERCEPTUAL (average-hash) near-dup grouping (r15 continuation —
    * the image-dedup step real multimodal pipelines run where exact
    * [[payloadDedup]] misses re-encodes): every payload goes through
    * the SAME area-pooling thumbnail as [[resizeStub]] (8×8), the
    * aHash sets bit p when pixel p exceeds the truncating mean of the
    * 64 pixels, and payloads sharing a hash group under one keeper.
    * The hash computation rides the resize's typed mapPartitions (the
    * sanctioned codec-stage pattern — a real deployment swaps in
    * pHash/DCT over real pixels); grouping is one 8-byte-key shuffle,
    * payloads never move. The whole chain is integer-deterministic, so
    * unlike text SimHash this dedup is fully hash-green against the
    * DuckDB pixel-reconstruction replay. */
  def aHashDedup(docs: DataFrame, srcW: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashes = resizeStub(docs, srcW, 8, 8)
      .select(col("doc_id"), col("out_payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, px) =>
        val mean = px.map(b => (b & 0xff).toLong).sum / px.length
        var h = 0L
        var i = 0
        while (i < px.length) {
          if ((px(i) & 0xff) > mean) h ^= (1L << i)
          i += 1
        }
        (id, h)
      }).toDF("doc_id", "ahash")
    hashes.groupBy("ahash")
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
  }

  /** Partition-parallel "decode" of the binary payload into a
    * fixed-shape feature vector. Narrow (no shuffle): each partition
    * streams its payloads through the decoder independently. */
  def featureExtract(docs: DataFrame, dim: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds: Dataset[BinaryDoc] = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[BinaryDoc]
    ds.mapPartitions { it =>
      it.map(d => DocFeatures(d.doc_id, d.payload.length.toLong,
        stubDecode(d.payload, dim)))
    }.toDF()
  }
}
