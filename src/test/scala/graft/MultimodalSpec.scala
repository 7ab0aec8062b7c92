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
}
