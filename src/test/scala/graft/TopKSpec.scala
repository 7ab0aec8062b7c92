package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKPairs
import graft.similarity.Ann

class TopKSpec extends SparkSpec {

  test("aggregate top-k equals window-rank top-k on real embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val win = Ann.bruteForceTopK(emb, 10, 5).collect().map(key).toSet
    val agg = Ann.bruteForceTopKAgg(emb, 10, 5).collect().map(key).toSet
    assert(win == agg)
    assert(win.size == 50)
  }

  test("partial aggregation is partitioning-independent") {
    import spark.implicits._
    val rows = (1 to 1000).map(i => ((i % 7).toLong, (i * 37 % 997).toDouble, i.toLong))
    def run(parts: Int) = rows.toDF("g", "s", "i").repartition(parts)
      .groupBy("g").agg(TopKPairs.topK(col("s"), col("i"), 3).as("t"))
      .select(col("g"), col("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1))).toList).toMap
    val a = run(1); val b = run(13)
    assert(a == b)
    // reference: per-group scala computation with the same tie-break
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy { case (s, i) => (-s, i) }.take(3).toList
    }
    assert(a == expect)
  }

  test("ties break by smaller id") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 9L), (1L, 5.0, 2L), (1L, 5.0, 7L), (1L, 4.0, 1L))
      .toDF("g", "s", "i")
    val top = df.groupBy("g").agg(TopKPairs.topK(col("s"), col("i"), 2).as("t"))
      .select(explode(col("t"))).collect()
      .map(r => (r.getStruct(0).getDouble(0), r.getStruct(0).getLong(1)))
    assert(top.toList == List((5.0, 2L), (5.0, 7L)))
  }
}
