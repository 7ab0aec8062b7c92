package graft

import org.apache.spark.sql.functions._
import graft.functions.WordNgrams

/** r22: [[WordNgrams]] replaces the transform/slice/array_join HOF —
  * pin bit-identical output against that form on the real corpus and
  * on the split edge cases (empty text, short text, repeated/leading/
  * trailing separators). */
class WordNgramsSpec extends SparkSpec {

  private def hofForm(text: org.apache.spark.sql.Column, n: Int) = {
    val words = split(text, " ", -1)
    when(size(words) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(words) - lit(n - 1)),
        i => array_join(slice(words, i, lit(n)), " ")))
  }

  test("word_ngrams equals the HOF form on the real corpus (n = 1, 2, 4, 5)") {
    val docs = Tables.documents(spark, sfDir)
    Seq(1, 2, 4, 5).foreach { n =>
      val both = docs.select(col("doc_id"),
          WordNgrams.ngrams(col("text"), n).as("a"),
          hofForm(col("text"), n).as("b"))
        .collect()
      assert(both.nonEmpty)
      both.foreach(r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n doc ${r.getLong(0)}"))
    }
  }

  test("split edges match: empty, short, multi-space, leading/trailing") {
    import spark.implicits._
    val df = Seq("", " ", "a", "a b", "a  b", " a b ", "a b c d",
      "x\ty z").toDF("text")
    Seq(1, 2, 3).foreach { n =>
      val both = df.select(col("text"), WordNgrams.ngrams(col("text"), n).as("a"),
          hofForm(col("text"), n).as("b")).collect()
      both.foreach(r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n text '${r.getString(0)}'"))
    }
  }
}
