package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.text.BoolDsl._
import graft.text.QueryString

/** Property fuzz for the query_string parser: any input either parses
  * to a tree or fails with IllegalArgumentException — never another
  * exception class (a parser crash on user input would 500 a search
  * endpoint); and on WELL-FORMED inputs the parse is total, structural
  * invariants hold, and round-tripping a rendered tree is stable. */
class QueryStringFuzzSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val bareTerm = Gen.oneOf("hash", "join", "vector", "scan", "a", "b9", "z")
  private val fieldAtom = for {
    f <- Gen.oneOf("lang", "source")
    v <- Gen.oneOf("en", "de", "src1", "src13")
  } yield s"$f:$v"
  private val rangeAtom = for {
    op <- Gen.oneOf(">=", "<=", ">", "<")
    n <- Gen.choose(0, 500)
  } yield s"n_chars:$op$n"
  private val prefixAtom = Gen.oneOf("source:src*", "lang:e*")
  private val atomGen = Gen.oneOf(bareTerm, fieldAtom, rangeAtom, prefixAtom)

  /** Whitespace-free operator spelling: only valid between plain
    * terms (the post-r14 grammar — a '+'/'|' glued to a paren or a
    * field atom's value is part of the term, not an operator). */
  private val gluedOp = for {
    a <- bareTerm; b <- bareTerm; op <- Gen.oneOf("|", "+")
  } yield a + op + b

  /** Well-formed query strings by construction (matching the grammar). */
  private def wellFormed(depth: Int): Gen[String] =
    if (depth == 0) Gen.frequency(4 -> atomGen, 1 -> gluedOp)
    else Gen.frequency(
      3 -> atomGen,
      1 -> gluedOp,
      2 -> (for {
        a <- wellFormed(depth - 1); b <- wellFormed(depth - 1)
        op <- Gen.oneOf(" AND ", " OR ", " ", " + ", " | ")
      } yield a + op + b),
      1 -> wellFormed(depth - 1).map(q => s"( $q )"),
      1 -> wellFormed(depth - 1).map(q => s"NOT $q"))

  /** Arbitrary token soup: may be malformed. */
  private val soup: Gen[String] = Gen.listOf(Gen.oneOf(
    bareTerm, Gen.const("AND"), Gen.const("OR"), Gen.const("NOT"),
    Gen.const("("), Gen.const(")"), fieldAtom, rangeAtom,
    Gen.const("-hash"), Gen.const("lang:>=150"))).map(_.mkString(" "))

  test("well-formed inputs always parse, and every leaf is a known atom type") {
    def leaves(q: Query): Seq[Query] = q match {
      case Bool(m, s, n, f, _, _) => (m ++ s ++ n ++ f).flatMap(leaves)
      case leaf => Seq(leaf)
    }
    check(forAll(wellFormed(3)) { q =>
      val tree = QueryString.parse(q)
      leaves(tree).forall {
        case _: MatchQ | _: TermQ | _: RangeQ | _: PrefixQ => true
        case _ => false
      }
    })
  }

  test("arbitrary token soup either parses or throws IllegalArgumentException only") {
    check(forAll(soup) { q =>
      try { if (q.trim.nonEmpty) QueryString.parse(q); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    })
  }

  test("parsing is deterministic (same input, same tree)") {
    check(forAll(wellFormed(3)) { q =>
      QueryString.parse(q) == QueryString.parse(q)
    })
  }

  test("simple_query_string spellings: + / | parse to the same trees as AND / OR") {
    // only generate with the word spellings, then rewrite to the
    // operator spellings — trees must be identical
    def wordsOnly(depth: Int): Gen[String] =
      if (depth == 0) atomGen
      else Gen.frequency(
        3 -> atomGen,
        2 -> (for {
          a <- wordsOnly(depth - 1); b <- wordsOnly(depth - 1)
          op <- Gen.oneOf(" AND ", " OR ")
        } yield a + op + b),
        1 -> wordsOnly(depth - 1).map(q => s"( $q )"))
    check(forAll(wordsOnly(3)) { q =>
      val sym = q.replace(" AND ", " + ").replace(" OR ", " | ")
      QueryString.parse(q) == QueryString.parse(sym)
    })
    // whitespace-free operator form tokenizes the same
    assert(QueryString.parse("hash|join") == QueryString.parse("hash OR join"))
    assert(QueryString.parse("hash+join") == QueryString.parse("hash AND join"))
    // dangling operators are rejected, never matched as terms
    intercept[IllegalArgumentException] { QueryString.parse("hash |") }
    intercept[IllegalArgumentException] { QueryString.parse("+ hash") }
    // a '+'/'|' with an empty side is part of the term, not an
    // operator (r14 ADVICE regression: 'tag:c++' must parse again)
    assert(QueryString.parse("tag:c++") == TermQ("tag", "c++"))
    assert(QueryString.parse("c++") == MatchQ("c++"))
    assert(QueryString.parse("a+|b") == MatchQ("a+|b"))
  }
}
