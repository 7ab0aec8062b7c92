package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("binaryMeta matches payload-derived ground truth") {
    val docs = Tables.documents(spark, sfDir)
    val meta = Multimodal.binaryMeta(docs).collect()
    assert(meta.length == docs.count())
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    meta.take(50).foreach { r =>
      val bytes = texts(r.getLong(0)).getBytes("UTF-8")
      assert(r.getLong(1) == bytes.length.toLong)
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      assert(r.getString(3) == md)
      assert(r.getString(2) == bytes.take(4).map("%02X".format(_)).mkString)
    }
  }

  test("featureExtract: fixed shape, [0,1] range, partition-independent") {
    val docs = Tables.documents(spark, sfDir)
    val f1 = Multimodal.featureExtract(docs, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(f1.nonEmpty)
    f1.values.foreach { v =>
      assert(v.length == 8)
      v.foreach(x => assert(x >= 0.0 && x <= 1.0))
    }
    val f2 = Multimodal.featureExtract(docs.repartition(11), 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(f1 == f2, "decode must not depend on partitioning")
  }

  test("stub decoder is a pure function of bytes") {
    val b = "some payload bytes".getBytes("UTF-8")
    val d1 = Multimodal.stubDecode(b, 8).toSeq
    val d2 = Multimodal.stubDecode(b.clone(), 8).toSeq
    assert(d1 == d2)
    assert(Multimodal.stubDecode(Array.emptyByteArray, 8).toSeq == Seq.fill(8)(0.0))
  }

  test("resizeStub: area-pooling matches a naive recompute, fixed output " +
      "shape, no shuffle (r15)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val (srcW, outW, outH) = (32, 8, 8)
    val got = Multimodal.resizeStub(docs, srcW, outW, outH).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getAs[Array[Byte]](4).toSeq))
      .toMap
    assert(got.values.forall { case (_, w, h, px) =>
      w == outW && h == outH && px.length == outW * outH })
    // naive recompute on a handful of payloads
    val sample = docs.limit(5).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8"))
    sample.foreach { case (id, bytes) =>
      val n = bytes.length
      val srcH = math.max(1L, (n.toLong + srcW - 1) / srcW)
      val want = for (y <- 0 until outH; x <- 0 until outW) yield {
        val x0 = x.toLong * srcW / outW
        val x1 = math.max(x0 + 1, (x + 1).toLong * srcW / outW)
        val y0 = y.toLong * srcH / outH
        val y1 = math.max(y0 + 1, (y + 1).toLong * srcH / outH)
        val idx = for (yy <- y0 until y1; xx <- x0 until x1;
          i = yy * srcW + xx if i < n) yield i
        if (idx.isEmpty) 0.toByte
        else (idx.map(i => (bytes(i.toInt) & 0xff).toLong).sum / idx.size).toByte
      }
      assert(got(id)._4 == want, s"doc $id")
      assert(got(id)._1 == n.toLong)
    }
    // the transform is narrow: no exchange anywhere in the plan
    val plan = Multimodal.resizeStub(docs, srcW, outW, outH)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "resize must not shuffle")
  }

  test("aHashDedup: hash replays from the resize output; identical " +
      "payloads always group; groups are real (r15)") {
    val docs = Tables.documents(spark, sfDir)
    val got = Multimodal.aHashDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "corpus must contain perceptual dupes")
    // naive hash replay from the engine's own resize output
    val px = Multimodal.resizeStub(docs, 32, 8, 8)
      .select("doc_id", "out_payload").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    def ahash(p: Array[Byte]): Long = {
      val mean = p.map(b => (b & 0xff).toLong).sum / p.length
      p.zipWithIndex.foldLeft(0L) { case (h, (b, i)) =>
        if ((b & 0xff) > mean) h ^ (1L << i) else h }
    }
    val byHash = px.map { case (id, p) => (ahash(p), id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val want = byHash.filter(_._2.length >= 2)
      .map { case (h, ids) => (h, ids.min, ids.length.toLong) }.toSet
    assert(got.toSet == want)
    // byte-identical payloads (injected re-uploads, the payloadDedup
    // fixture) necessarily land in one hash group with the low keeper
    val reup = docs.filter(org.apache.spark.sql.functions.col("doc_id") === 0L)
      .withColumn("doc_id", org.apache.spark.sql.functions.lit(10000L))
    val withDup = Multimodal.aHashDedup(docs.unionByName(reup)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hash0 = px.find(_._1 == 0L).map(p => ahash(p._2)).get
    val g0 = withDup.find(_._1 == hash0).get
    assert(g0._2 == 0L && g0._3 >= 2L,
      "the re-upload must group under the original keeper")
  }
}
