package graft

import graft.text.{IntervalsAst, Spans}
import graft.text.IntervalsAst._
import graft.text.Spans._

/** Span-family specs (r14): the span → intervals compile is pinned
  * structurally, and the span semantics (slop, in_order, pre/post
  * buffers) are pinned behaviorally on crafted corpora. */
class SpansSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) }
      .toDF("doc_id", "text")

  private def hits(docs: org.apache.spark.sql.DataFrame, s: Span): Set[Long] =
    Spans.spanSearch(docs, s, 100).collect().map(_.getLong(0)).toSet

  test("span -> intervals mapping is the documented ES migration") {
    assert(Spans.toIntervals(STerm("x")) == IMatch(Seq("x")))
    assert(Spans.toIntervals(SNear(Seq(STerm("a"), STerm("b")), 3, true)) ==
      IAllOf(Seq(IMatch(Seq("a")), IMatch(Seq("b"))), ordered = true, maxGaps = 3))
    assert(Spans.toIntervals(SOr(Seq(STerm("a"), STerm("b")))) ==
      IAnyOf(Seq(IMatch(Seq("a")), IMatch(Seq("b")))))
    assert(Spans.toIntervals(SNot(STerm("a"), STerm("b"), 1, 2)) ==
      IFilter(IMatch(Seq("a")), "not_overlapping",
        IExpand(IMatch(Seq("b")), 1, 2)))
  }

  test("span_near: slop and in_order bind") {
    val docs = docsOf(
      "merge a b c sort",   // 3 intervening -> slop 3 passes
      "merge a b c d sort", // 4 intervening -> slop 3 fails
      "sort merge")         // reversed -> unordered only
    val unordered = SNear(Seq(STerm("merge"), STerm("sort")), 3, inOrder = false)
    val ordered = SNear(Seq(STerm("merge"), STerm("sort")), 3, inOrder = true)
    assert(hits(docs, unordered) == Set(1L, 3L))
    assert(hits(docs, ordered) == Set(1L))
  }

  test("span_or unions clause matches") {
    val docs = docsOf("merge sort", "vector", "scan")
    val q = SOr(Seq(SNear(Seq(STerm("merge"), STerm("sort")), 0, true),
      STerm("vector")))
    assert(hits(docs, q) == Set(1L, 2L))
  }

  test("span_not: pre/post buffers bind (Lucene SpanNotQuery semantics)") {
    val docs = docsOf(
      "batch merge a sort",  // exclusion ends just BEFORE the span
      "merge a sort batch",  // exclusion starts just AFTER the span
      "merge batch sort",    // exclusion inside -> always dropped
      "merge a sort")        // no exclusion anywhere
    val inc = SNear(Seq(STerm("merge"), STerm("sort")), 4, inOrder = true)
    assert(hits(docs, SNot(inc, STerm("batch"))) == Set(1L, 2L, 4L),
      "zero buffers drop only the overlapping exclusion")
    assert(hits(docs, SNot(inc, STerm("batch"), post = 1)) == Set(2L, 4L),
      "post extends the exclusion forward into doc 1's span")
    assert(hits(docs, SNot(inc, STerm("batch"), pre = 1)) == Set(1L, 4L),
      "pre extends the exclusion backward into doc 2's span")
  }

  test("span_within / span_containing: enclosure binds both ways (r15)") {
    assert(Spans.toIntervals(SWithin(STerm("a"), STerm("b"))) ==
      IFilter(IMatch(Seq("a")), "contained_by", IMatch(Seq("b"))))
    assert(Spans.toIntervals(SContaining(STerm("a"), STerm("b"))) ==
      IFilter(IMatch(Seq("a")), "containing", IMatch(Seq("b"))))
    val docs = docsOf(
      "hash join scan",    // join inside the hash..scan span
      "join hash scan",    // join OUTSIDE (before) the enclosing span
      "hash a b scan",     // no little match at all
      "join")              // little with no big
    val big = SNear(Seq(STerm("hash"), STerm("scan")), 6, inOrder = false)
    assert(hits(docs, SWithin(STerm("join"), big)) == Set(1L),
      "within keeps only the enclosed little match")
    assert(hits(docs, SContaining(big, STerm("join"))) == Set(1L),
      "containing keeps only the enclosing big match")
  }

  test("span_multi: prefix rewrite inside a near binds (r15)") {
    assert(Spans.toIntervals(SMultiPrefix("sc")) == IPrefix("sc"))
    assert(Spans.toIntervals(SMultiWildcard("s*n")) == IWildcard("s*n"))
    val docs = docsOf(
      "scan a table",  // sc* one gap from table
      "scatter table", // different sc* word, adjacent
      "scan x y z w table", // too far at slop 4? 4 intervening -> passes
      "table none here")
    val q = SNear(Seq(SMultiPrefix("sc"), STerm("table")), 4, inOrder = false)
    assert(hits(docs, q) == Set(1L, 2L, 3L))
    assert(hits(docs, SNear(Seq(SMultiPrefix("sc"), STerm("table")), 3,
      inOrder = false)) == Set(1L, 2L), "slop must bind on the rewrite")
  }

  test("wired span queries return non-empty pages on the real corpus") {
    val docs = Tables.documents(spark, sfDir)
    val near = SNear(Seq(STerm("merge"), STerm("sort")), 3, inOrder = false)
    val spanNot = SNot(SNear(Seq(STerm("merge"), STerm("sort")), 4,
      inOrder = false), STerm("batch"), pre = 1, post = 1)
    val nearHits = hits(docs, near)
    val notHits = hits(docs, spanNot)
    assert(nearHits.nonEmpty && notHits.nonEmpty)
    // the exclusion must BIND somewhere: some near-matching doc loses
    // intervals (or whole membership) under span_not with buffers
    val nearCounts = Spans.spanSearch(docs, SNear(Seq(STerm("merge"),
        STerm("sort")), 4, inOrder = false), 10000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val notCounts = Spans.spanSearch(docs, spanNot, 10000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nearCounts.exists { case (id, n) => notCounts.getOrElse(id, 0L) < n },
      "span_not exclusion must remove at least one interval corpus-wide")
  }
}
