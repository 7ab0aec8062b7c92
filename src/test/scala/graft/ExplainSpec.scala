package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** ES `_explain` score breakdown (VERDICT r16 #5): the decomposition
  * must COMMIT to the page it explains — same docs, same totals, the
  * weights summing bit-for-bit to the score the ranking used. */
class ExplainSpec extends SparkSpec {

  private val terms = Seq("dup", "query", "scan")
  private lazy val docs = Tables.documents(spark, sfDir)

  test("explain page == bm25Search page (docs, dl, score identical)") {
    val page = TextOps.bm25Search(docs, terms, 15).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exp = TextOps.bm25Explain(docs, terms, 15)
      .select("doc_id", "dl", "score").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exp == page && page.nonEmpty)
  }

  test("per-doc weights sum bit-for-bit to the committed score " +
      "(left-assoc term order — the bm25Search program)") {
    val rows = TextOps.bm25Explain(docs, terms, 15).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      val score = rs.head.getDouble(rs.head.fieldIndex("score"))
      // weights in term order (the program's reduce order); absent
      // terms contribute idf·0/denom = 0.0 exactly, so the matched
      // subset sums identically
      val byTerm = rs.map(r => r.getString(1) -> r.getDouble(r.fieldIndex("weight"))).toMap
      val sum = terms.foldLeft(0.0)((acc, t) => acc + byTerm.getOrElse(t, 0.0))
      assert(sum == score, s"sum $sum != score $score")
    }
    assert(rows.nonEmpty)
  }

  test("components carry the ES explain quantities: tf>0 rows only, " +
      "df corpus-wide, idf the DetLn program, tf_part the saturation") {
    val rows = TextOps.bm25Explain(docs, terms, 15).collect()
    val nDocs = docs.count()
    rows.foreach { r =>
      val tf = r.getLong(r.fieldIndex("tf"))
      val df = r.getLong(r.fieldIndex("df"))
      val idf = r.getDouble(r.fieldIndex("idf"))
      assert(tf > 0)
      assert(df > 0 && df <= nDocs)
      val expIdf = graft.util.DetLn.lnScala(
        1 + (nDocs - df + 0.5) / (df + 0.5))
      assert(idf == expIdf, s"idf $idf != $expIdf")
      assert(r.getDouble(r.fieldIndex("tf_part")) > 0)
    }
    // the page matched more than one distinct term (else the
    // decomposition is vacuous on this corpus)
    assert(rows.map(_.getString(1)).distinct.length > 1)
  }

  test("empty corpus degrades to the typed empty frame") {
    val out = TextOps.bm25Explain(docs.limit(0), terms, 15)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq == Seq("doc_id", "term", "dl", "tf", "df",
      "idf", "tf_part", "weight", "score"))
  }
}
