package graft

import org.apache.spark.sql.functions._
import graft.river.River

/** Mirrors the reference's own unit tests:
  * HBaseParserTest.ReadQualifierStructureTest (testBase,
  * testEmptySubQualifier, testWrongSeperator) and
  * HBaseRiverTest.testNormalizeField — same inputs, same expected
  * outputs, evaluated through the Spark column expressions. */
class QualifierSpec extends SparkSpec {

  private def parse(qualifiers: Seq[String], sep: String, normalize: Boolean = false) = {
    import spark.implicits._
    qualifiers.toDF("q")
      .select(River.parseQualifier(col("q"), sep, normalize).as("p"))
      .select(col("p.path"), col("p.leaf"), col("p.full_path"))
      .collect()
      .map(r => (r.getSeq[String](0).toList, r.getString(1), r.getString(2)))
  }

  test("testBase: depth-3 qualifiers nest at path.parent -> leaf") {
    val out = parse(Seq(
      "data::set1::category1", "data::set1::category2", "data::set1::category3",
      "data::set2::category1", "data::set2::category2"), "::")
    assert(out(0) == (List("data", "set1"), "category1", "data.set1.category1"))
    assert(out(3) == (List("data", "set2"), "category1", "data.set2.category1"))
    assert(out.map(_._1).distinct.toSet == Set(List("data", "set1"), List("data", "set2")))
  }

  test("testEmptySubQualifier: trailing separator collapses to a flat leaf") {
    val out = parse(Seq("data::set2::"), "::")
    assert(out(0) == (List("data"), "set2", "data.set2"))
  }

  test("testWrongSeperator: absent separator leaves the field flat") {
    val out = parse(Seq("data::set1::category1"), "-", normalize = true)
    // '-' never occurs; one segment, normalized (':' stripped: not in
    // [a-z0-9-_] and the separator '-' contributes no extra chars)
    assert(out(0) == (Nil, "dataset1category1", "dataset1category1"))
  }

  test("separators-only qualifier yields a null leaf instead of throwing") {
    val out = {
      import spark.implicits._
      Seq("::", "::::").toDF("q")
        .select(River.parseQualifier(col("q"), "::").as("p"))
        .select(col("p.leaf"), col("p.full_path")).collect()
    }
    out.foreach { r => assert(r.isNullAt(0)); assert(r.getString(1) == "") }
  }

  test("alphanumeric separators don't break the normalize regex") {
    import spark.implicits._
    // 'u' has no regex escape — a naive \u would throw PatternSyntaxException
    val v = Seq("AuB").toDF("f")
      .select(River.normalizeField(col("f"), Some("u"))).as[String].head()
    assert(v == "aub")
    val s = Seq("a b").toDF("f")
      .select(River.normalizeField(col("f"), Some("s"))).as[String].head()
    assert(s == "ab", "separator 's' must mean the literal letter, not \\s")
  }

  test("testNormalizeField: reference's exact input/expected pairs") {
    import spark.implicits._
    val cases = Seq(
      "" -> "", " " -> "", "a" -> "a", "A" -> "a", "Aa" -> "aa",
      "a-b" -> "a-b", "a_b" -> "a_b", "90aS" -> "90as",
      "&*($@#!ui^&$(\"8ui" -> "ui8ui")
    val got = cases.map(_._1).toDF("f")
      .select(River.normalizeField(col("f"))).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, e) => assert(g == e, s"'$g' != '$e'") }

    // with a separator, its characters survive (reference sep "::")
    val sep = cases.map(_._1).toDF("f")
      .select(River.normalizeField(col("f"), Some("::"))).as[String].collect()
    assert(sep.toSeq == got.toSeq) // no ':' in these inputs
    val blah = Seq("bl%^&*ah::blubb").toDF("f")
      .select(River.normalizeField(col("f"), Some("::"))).as[String].head()
    assert(blah == "blah::blubb")

    // null stays null
    val n = Seq[Option[String]](None).toDF("f")
      .select(River.normalizeField(col("f"))).collect()
    assert(n(0).isNullAt(0))
  }
}
