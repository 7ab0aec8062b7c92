package graft

import org.apache.spark.sql.functions._
import graft.functions.MaxLongStr

/** r22: [[MaxLongStr]] replaces `max(struct(cnt, gram))` in
  * repetitionFilter — pin exact equality incl. ties, null-gating,
  * all-null groups, and partitioning independence. */
class MaxLongStrSpec extends SparkSpec {

  test("max_long_str equals max(struct(cnt, str)) incl. ties and nulls") {
    import spark.implicits._
    val rnd = new java.util.Random(5L)
    val words = Seq("aa", "ab", "b", "ée", "zz", "a a", "")
    val rows = (0 until 2000).map { i =>
      (i % 37L, rnd.nextInt(3),
        rnd.nextInt(5).toLong, words(rnd.nextInt(words.length)))
    }
    val df = rows.toDF("g", "n", "cnt", "w")
    def key(r: org.apache.spark.sql.Row): (Long, Any) = {
      val s = r.get(1)
      (r.getLong(0), if (s == null) null
        else { val t = s.asInstanceOf[org.apache.spark.sql.Row]
          (t.getLong(0), t.getString(1)) })
    }
    def run(parts: Int) = df.repartition(parts).groupBy("g")
      .agg(MaxLongStr.maxPair(when(col("n") === 1, col("cnt")), col("w")).as("m"))
      .collect().map(key).toMap
    val ref = df.groupBy("g")
      .agg(max(when(col("n") === 1, struct(col("cnt").as("cnt"),
        col("w").as("gram")))).as("m"))
      .collect().map(key).toMap
    assert(run(1) == ref)
    assert(run(17) == ref)
  }

  test("all-gated-out group evaluates to null") {
    import spark.implicits._
    val df = Seq((1L, 5, 2L, "x"), (1L, 5, 3L, "y")).toDF("g", "n", "cnt", "w")
    val got = df.groupBy("g")
      .agg(MaxLongStr.maxPair(when(col("n") === 1, col("cnt")), col("w")).as("m"))
      .collect()
    assert(got.length == 1 && got(0).isNullAt(1))
  }
}
