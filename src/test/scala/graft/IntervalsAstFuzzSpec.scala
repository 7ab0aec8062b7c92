package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll

import graft.text.IntervalsAst
import graft.text.IntervalsAst._

/** Property fuzz for the intervals combinator AST: the Spark compiler
  * vs an independent NAIVE Scala implementation of the same
  * minimal-interval algebra, over random trees and random token
  * streams. The naive form is a direct transcription of the documented
  * semantics (enumerate combos, check order/gaps, minimize) with none
  * of the compiler's machinery — shared bugs would have to be
  * spec-level, not implementation-level. */
class IntervalsAstFuzzSpec extends SparkSpec {
  import spark.implicits._

  // ---- naive reference -------------------------------------------------

  private def naiveLevenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def naiveMinimize(xs: Set[(Int, Int)]): Set[(Int, Int)] =
    xs.filterNot(a => xs.exists(b =>
      b != a && b._1 >= a._1 && b._2 <= a._2))

  private def naiveEval(node: Node, toks: Seq[String]): Set[(Int, Int)] = node match {
    case IMatch(Seq(t), _, _) =>
      toks.zipWithIndex.collect { case (tok, i) if tok == t => (i + 1, i + 1) }.toSet
    case IMatch(ts, o, g) =>
      naiveEval(IAllOf(ts.map(t => IMatch(Seq(t))), o, g), toks)
    case IPrefix(p) =>
      toks.zipWithIndex.collect { case (tok, i) if tok.startsWith(p) => (i + 1, i + 1) }.toSet
    case IFuzzy(t, f) =>
      toks.zipWithIndex.collect {
        case (tok, i) if naiveLevenshtein(tok, t) <= f => (i + 1, i + 1) }.toSet
    case IWildcard(p) =>
      // LIKE -> regex: quote everything, then % -> .*, _ -> .
      val rx = p.map {
        case '%' => ".*"
        case '_' => "."
        case c => java.util.regex.Pattern.quote(c.toString)
      }.mkString
      toks.zipWithIndex.collect {
        case (tok, i) if tok.matches(rx) => (i + 1, i + 1) }.toSet
    case IAllOf(cs, ordered, g) =>
      val childSets = cs.map(c => naiveEval(c, toks).toSeq)
      val combos = childSets.foldLeft(Seq(Seq.empty[(Int, Int)]))((acc, ch) =>
        for { a <- acc; x <- ch } yield a :+ x)
      val valid = combos.filter { cm =>
        val orderedOk = !ordered ||
          cm.sliding(2).forall { case Seq(a, b) => a._2 < b._1; case _ => true }
        val s = cm.map(_._1).min; val e = cm.map(_._2).max
        val covered = cm.flatMap { case (a, b) => a to b }.distinct.size
        val gapsOk = g < 0 || (e - s + 1 - covered) <= g
        orderedOk && gapsOk
      }
      naiveMinimize(valid.map(cm => (cm.map(_._1).min, cm.map(_._2).max)).toSet)
    case IAnyOf(cs) =>
      naiveMinimize(cs.flatMap(c => naiveEval(c, toks)).toSet)
    case IExpand(c, pre, post) =>
      naiveEval(c, toks).map { case (s, e) =>
        (math.max(s - pre, 0), math.min(e + post, 99999)) }
    case IFilter(src, mode, ref) =>
      val s0 = naiveEval(src, toks); val r0 = naiveEval(ref, toks)
      def rel(a: (Int, Int), b: (Int, Int)) = mode.stripPrefix("not_") match {
        case "containing"   => a._1 <= b._1 && b._2 <= a._2
        case "contained_by" => b._1 <= a._1 && a._2 <= b._2
        case "overlapping"  => a._1 <= b._2 && b._1 <= a._2
      }
      s0.filter(a =>
        if (mode.startsWith("not_")) !r0.exists(b => rel(a, b))
        else r0.exists(b => rel(a, b)))
  }

  // ---- generators ------------------------------------------------------

  private val vocab = Seq("aa", "bb", "cc", "ab")
  private val leaf: Gen[Node] = Gen.oneOf(
    Gen.oneOf(vocab).map(t => IMatch(Seq(t))),
    Gen.oneOf("a", "b", "c").map(IPrefix(_)),
    for {
      t <- Gen.oneOf(vocab :+ "ba"); f <- Gen.oneOf(0, 1, 2)
    } yield IFuzzy(t, f),
    Gen.oneOf("a%", "_b", "%c%", "a_", "zz").map(IWildcard(_)),
    for {
      n <- Gen.choose(2, 3); ts <- Gen.listOfN(n, Gen.oneOf(vocab))
      o <- Gen.oneOf(true, false); g <- Gen.oneOf(-1, 0, 1, 3)
    } yield IMatch(ts, o, g))

  private def tree(depth: Int): Gen[Node] =
    if (depth == 0) leaf
    else Gen.frequency(
      2 -> leaf,
      1 -> (for {
        n <- Gen.choose(2, 3); cs <- Gen.listOfN(n, tree(depth - 1))
        o <- Gen.oneOf(true, false); g <- Gen.oneOf(-1, 0, 2, 5)
      } yield IAllOf(cs, o, g)),
      1 -> (for {
        n <- Gen.choose(2, 3); cs <- Gen.listOfN(n, tree(depth - 1))
      } yield IAnyOf(cs)),
      1 -> (for {
        src <- tree(depth - 1); ref <- tree(depth - 1)
        m <- Gen.oneOf("containing", "not_containing", "contained_by",
          "not_contained_by", "overlapping", "not_overlapping")
      } yield IFilter(src, m, ref)),
      1 -> (for {
        c <- tree(depth - 1)
        pre <- Gen.oneOf(0, 1, 2); post <- Gen.oneOf(0, 1, 2)
      } yield IExpand(c, pre, post)))

  private val docGen: Gen[Seq[String]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab ++ Seq("zz"))))

  test("random trees over random docs: Spark compiler == naive algebra") {
    val prop: Prop = forAll(tree(2), Gen.listOfN(12, docGen)) { (t, docTokens) =>
      val docs = docTokens.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = IntervalsAst.intervalsAstQuery(docs, t, 1000)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = docTokens.zipWithIndex.flatMap { case (ts, i) =>
        val iv = naiveEval(t, ts)
        if (iv.isEmpty) None
        else Some(i.toLong -> (iv.size.toLong, iv.map(_._1).min.toLong))
      }.toMap
      if (got != want) {
        println(s"MISMATCH tree=$t\n docs=$docTokens\n got=$got\n want=$want")
      }
      got == want
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
