package graft

import graft.text.IntervalsAst
import graft.text.IntervalsAst._

/** Combinator-binds + minimal-interval-algebra spec for the r13
  * intervals AST. Fixtures are hand-computed token streams; every case
  * pins (doc_id, n_intervals, first_start) exactly. */
class IntervalsAstSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  private def run(node: Node, ds: (Long, String)*): Seq[(Long, Long, Long)] =
    IntervalsAst.intervalsAstQuery(docs(ds: _*), node, 100)
      .as[(Long, Long, Long)].collect().toSeq

  test("match single term: one width-1 interval per occurrence") {
    val r = run(IMatch(Seq("a")), 1L -> "a b a c a", 2L -> "b c")
    assert(r === Seq((1L, 3L, 1L)))
  }

  test("ordered match rejects out-of-order; accepts in-order") {
    // "b a": a-then-b ordered has no interval; "a b" does
    assert(run(IMatch(Seq("a", "b"), ordered = true, maxGaps = 0),
      1L -> "b a") === Seq.empty)
    assert(run(IMatch(Seq("a", "b"), ordered = true, maxGaps = 0),
      1L -> "a b") === Seq((1L, 1L, 1L)))
  }

  test("max_gaps boundary: exactly g passes, g+1 fails") {
    // a x x b → span 4, covered 2, gaps 2
    val d = 1L -> "a x x b"
    assert(run(IMatch(Seq("a", "b"), ordered = true, maxGaps = 2), d)
      === Seq((1L, 1L, 1L)))
    assert(run(IMatch(Seq("a", "b"), ordered = true, maxGaps = 1), d)
      === Seq.empty)
  }

  test("minimality: a containing interval is dropped (Lucene algebra)") {
    // "a x a b": ordered a..b combos (1,4) and (3,4); (3,4) ⊂ (1,4)
    // so only (3,4) survives — n=1, first_start=3
    val r = run(IMatch(Seq("a", "b"), ordered = true, maxGaps = -1),
      1L -> "a x a b")
    assert(r === Seq((1L, 1L, 3L)))
  }

  test("unordered match accepts either order, union gap coverage") {
    val n = IMatch(Seq("a", "b"), ordered = false, maxGaps = 0)
    assert(run(n, 1L -> "b a") === Seq((1L, 1L, 1L)))
    assert(run(n, 1L -> "a b") === Seq((1L, 1L, 1L)))
    // overlap at the same position is allowed unordered and the union
    // coverage counts the shared position once: "a" vs all_of(a, a)
    val same = IAllOf(Seq(IMatch(Seq("a")), IMatch(Seq("a"))),
      ordered = false, maxGaps = 0)
    assert(run(same, 1L -> "x a x") === Seq((1L, 1L, 2L)))
  }

  test("repeated-term match works (hash hash — the r12 ADVICE class)") {
    val r = run(IMatch(Seq("hash", "hash"), ordered = true, maxGaps = 0),
      1L -> "hash hash x hash")
    // ordered pairs of distinct positions with gap 0: (1,2) only —
    // (2,4) has gap 1, (1,4) contains (1,2)
    assert(r === Seq((1L, 1L, 1L)))
  }

  test("multi-term match desugars to all_of of singles") {
    val ds = Seq(1L -> "a x b y c", 2L -> "c b a")
    val m = run(IMatch(Seq("a", "b", "c"), ordered = true, maxGaps = 2), ds: _*)
    val a = run(IAllOf(Seq(IMatch(Seq("a")), IMatch(Seq("b")), IMatch(Seq("c"))),
      ordered = true, maxGaps = 2), ds: _*)
    assert(m === a)
    assert(m === Seq((1L, 1L, 1L))) // span 5, covered 3, gaps 2
  }

  test("any_of unions children and minimizes across them") {
    // doc "a b": any_of(match a..b, match a) → intervals (1,2) and
    // (1,1); (1,1) ⊂ (1,2) so only (1,1) survives
    val n = IAnyOf(Seq(
      IMatch(Seq("a", "b"), ordered = true, maxGaps = 0),
      IMatch(Seq("a"))))
    assert(run(n, 1L -> "a b") === Seq((1L, 1L, 1L)))
  }

  test("combinator binds: all_of(ordered) inside any_of (ES canonical)") {
    val n = IAnyOf(Seq(
      IAllOf(Seq(IMatch(Seq("a")), IMatch(Seq("b"))), ordered = true, maxGaps = 0),
      IMatch(Seq("z"))))
    // doc 1 matches via the all_of branch, doc 2 via z, doc 3 neither
    val r = run(n, 1L -> "a b c", 2L -> "z y z", 3L -> "b a")
    assert(r === Seq((2L, 2L, 1L), (1L, 1L, 1L)))
  }

  test("combinator binds: any_of inside all_of(ordered) with outer gaps") {
    // all_of(any_of(a, m), match(j)) ordered, outer max_gaps 1
    val n = IAllOf(Seq(
      IAnyOf(Seq(IMatch(Seq("a")), IMatch(Seq("m")))),
      IMatch(Seq("j"))), ordered = true, maxGaps = 1)
    // "m x j": m(1) then j(3), gap 1 → pass; "a x x j": gap 2 → fail;
    // "j a": ordered violated → fail
    val r = run(n, 1L -> "m x j", 2L -> "a x x j", 3L -> "j a")
    assert(r === Seq((1L, 1L, 1L)))
  }

  test("unordered all_of union coverage spans overlapping components") {
    // children: match(a b) ordered and match(b c) ordered; doc "a b c":
    // intervals (1,2) and (2,3) overlap at 2 — combined span 3,
    // covered |{1,2,3}| = 3, gaps 0
    val n = IAllOf(Seq(
      IMatch(Seq("a", "b"), ordered = true, maxGaps = 0),
      IMatch(Seq("b", "c"), ordered = true, maxGaps = 0)),
      ordered = false, maxGaps = 0)
    assert(run(n, 1L -> "a b c") === Seq((1L, 1L, 1L)))
  }

  test("prefix rule: width-1 intervals at prefixed tokens, composes " +
      "under all_of(ordered) — the term-then-completion pattern") {
    assert(run(IPrefix("jo"), 1L -> "join jolt x", 2L -> "nojoin")
      === Seq((1L, 2L, 1L)))
    val n = IAllOf(Seq(IMatch(Seq("hash")), IPrefix("jo")),
      ordered = true, maxGaps = 0)
    // 'hash join' matches; 'hash x join' gap 1 fails; 'join hash' order
    val r = run(n, 1L -> "hash join", 2L -> "hash x join", 3L -> "join hash")
    assert(r === Seq((1L, 1L, 1L)))
    // repeated leaf sharing: prefix of the term itself works
    assert(run(IAllOf(Seq(IMatch(Seq("jolt")), IPrefix("jo")),
      ordered = true, maxGaps = 0), 1L -> "jolt jostle")
      === Seq((1L, 1L, 1L)))
  }

  test("filter combinator: containing / contained_by / overlapping and " +
      "their negations relate source intervals to the reference's") {
    // not_containing: 'a..b' spans holding an x are rejected
    val nc = IFilter(IMatch(Seq("a", "b"), ordered = true, maxGaps = 3),
      "not_containing", IMatch(Seq("x")))
    assert(run(nc, 1L -> "a b", 2L -> "a x b") === Seq((1L, 1L, 1L)))
    // containing keeps only the spans that DO hold the reference
    val c = IFilter(IMatch(Seq("a", "b"), ordered = true, maxGaps = 3),
      "containing", IMatch(Seq("x")))
    assert(run(c, 1L -> "a b", 2L -> "a x b") === Seq((2L, 1L, 1L)))
    // contained_by: a 'c' inside an ordered a..b span
    val cb = IFilter(IMatch(Seq("c")), "contained_by",
      IMatch(Seq("a", "b"), ordered = true, maxGaps = 3))
    assert(run(cb, 1L -> "a c b", 2L -> "c a b") === Seq((1L, 1L, 2L)))
    // overlapping / not_overlapping on shared positions
    val ov = IFilter(IMatch(Seq("a")), "overlapping", IMatch(Seq("a")))
    assert(run(ov, 1L -> "a b") === Seq((1L, 1L, 1L)))
    val nov = IFilter(IMatch(Seq("a", "b"), ordered = true, maxGaps = 0),
      "not_overlapping", IMatch(Seq("b")))
    assert(run(nov, 1L -> "a b") === Seq.empty,
      "the a..b span overlaps its own b position")
    // unknown mode rejected
    intercept[IllegalArgumentException](
      run(IFilter(IMatch(Seq("a")), "bogus", IMatch(Seq("b"))), 1L -> "a"))
  }

  test("empty corpus and no-match docs are silent, not crashes") {
    assert(run(IMatch(Seq("zzz")), 1L -> "a b c") === Seq.empty)
    val empty = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    assert(IntervalsAst.intervalsAstQuery(empty, IMatch(Seq("a")), 10)
      .count() === 0L)
  }

  test("generated oracle SQL mentions every term and the limit") {
    val n = IAnyOf(Seq(IMatch(Seq("hash", "join"), ordered = true, maxGaps = 2),
      IMatch(Seq("scan"))))
    val sql = IntervalsAst.oracleSql(n, 25)
    for (t <- Seq("'hash'", "'join'", "'scan'", "LIMIT 25", "list_filter",
        "list_distinct", "string_split_regex"))
      assert(sql.contains(t), s"oracle SQL missing $t")
  }
}
