package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

class BpeSpec extends SparkSpec {

  /** Independent reference: list-based BPE, one leftmost-first
    * non-overlapping pass per rule in priority order — the documented
    * convention, implemented the naive way. */
  private def refBpe(word: String): Vector[String] = {
    var toks = word.map(_.toString).toVector
    for ((a, b) <- Bpe.mergeTokens) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out.result()
    }
    toks
  }

  private def refCount(text: String): Long =
    "[a-z0-9']+".r.findAllIn(text.toLowerCase).map(refBpe(_).length.toLong).sum

  test("compiled rule table is sound") {
    // every pattern is 2 chars, every symbol 1 char, symbols distinct
    // and outside the input alphabet
    assert(Bpe.compiled.forall { case (p, s) => p.length == 2 && s.length == 1 })
    val syms = Bpe.compiled.map(_._2)
    assert(syms.distinct.size == syms.size)
    assert(syms.forall(s => !s.exists(c => c.isLower || c.isDigit || c == '\'')))
  }

  test("tokenize matches the reference merge loop and round-trips") {
    import spark.implicits._
    val words = Seq("the", "thermometer", "searching", "institution",
      "aaaa", "forwith", "queen", "x", "don't", "a1b2", "mississippi",
      "establishment", "theatrical", "understanding")
    val got = words.toDF("w")
      .select(col("w"), Bpe.tokenize(col("w")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    for (w <- words) {
      assert(got(w) == refBpe(w), s"word=$w")
      assert(got(w).mkString == w, s"round-trip word=$w") // lossless
    }
  }

  test("per-document counts match the reference on the corpus") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val got = docs.select(col("doc_id"), Bpe.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> refCount(r.getString(1))).toMap
    assert(got == expect && got.values.sum > 0)
    // the merge table does real work on English-ish text: counts are
    // well below per-char and at-or-below per-word-char totals
    val chars = docs.select(sum(length(regexp_replace(lower(col("text")),
      "[^a-z0-9']", "")))).head().getLong(0)
    assert(got.values.sum < chars)
  }

  test("tokenCount equals the size of tokenize") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val mismatches = docs.select(
        Bpe.tokenCount(col("text")).as("n"),
        size(Bpe.tokenize(col("text"))).cast("long").as("m"))
      .filter(col("n") =!= col("m")).count()
    assert(mismatches == 0)
  }
}
