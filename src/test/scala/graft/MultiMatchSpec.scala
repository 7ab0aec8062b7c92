package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.util.DetLn

/** Specs for the r14 multi_match modes (most_fields / cross_fields)
  * and the dual-compiled deterministic logarithm underneath them. */
class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  test("DetLn: Spark column program == plain-Scala replica, bit for bit") {
    val rnd = new scala.util.Random(42)
    // log-uniform over [1, 2^40) plus the edges and the measured
    // fdlibm-vs-glibc disagreement inputs from the r14 idf probe
    val xs = Seq(1.0, 2.0, 4.4, 7.333333333333333,
        java.lang.Double.parseDouble("0x1.85d5fb54d088fp+1"),
        java.lang.Double.parseDouble("0x1.5763ba169e545p+0")) ++
      (1 to 500).map(_ => math.pow(2.0, rnd.nextDouble() * 40))
    val got = DetLn.withLn(xs.toDF("x"), "x", "lnx")
      .select("x", "lnx").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // the hot-path kernel expression form must be the same bits too
    val gotExpr = xs.toDF("x")
      .select(col("x"), DetLn.lnExpr(col("x")).as("lnx"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (x <- xs) {
      val want = DetLn.lnScala(x)
      assert(java.lang.Double.doubleToLongBits(got(x)) ==
        java.lang.Double.doubleToLongBits(want),
        s"x=$x spark=${got(x)} scala=$want")
      assert(java.lang.Double.doubleToLongBits(gotExpr(x)) ==
        java.lang.Double.doubleToLongBits(want),
        s"x=$x kernelExpr=${gotExpr(x)} scala=$want")
    }
    // accuracy: within 1e-11 relative of the libm value (the series
    // truncation bound is ~4e-13; this is a loose sanity ceiling)
    for (x <- xs) {
      val err = math.abs(DetLn.lnScala(x) - math.log(x)) /
        math.max(1.0, math.abs(math.log(x)))
      assert(err < 1e-11, s"x=$x err=$err")
    }
    assert(DetLn.lnScala(1.0) == 0.0)
  }

  private val craftedDocs = Seq(
    (1L, "x x x f f f f"), // x concentrated in the title
    (2L, "x f f x f f f"), // x spread across both fields
    (3L, "y f f f f f f"), // y title-only; y is body-common corpus-wide
    (4L, "f f f x f f f"), // x body-only
    (5L, "f f f y y f f"),
    (6L, "f f f y y f f"),
    (7L, "f f f y y f f"),
    (8L, "f f f y y f f"),
    (9L, "f f f y y f f"),
    (10L, "f f f f f f f"))

  test("multi_match mode divergence: the three modes rank a crafted corpus differently") {
    val docs = craftedDocs.toDF("doc_id", "text")
    val terms = Seq("x", "y")
    def scoresOf(mode: String): Map[Long, Double] =
      TextOps.multiMatchFields(docs, terms, 3, mode, 1.0, 1.0, 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val most = scoresOf("most_fields")
    val cross = scoresOf("cross_fields")
    val body = split(lower(col("text")), "\\s+")
    val best = TextOps.multiMatch(docs,
        Seq(("title", slice(body, 1, 3), 1.0), ("body", body, 1.0)),
        terms, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // best_fields vs most_fields: concentrated doc 1 wins best-of,
    // spread doc 2 wins the sum
    assert(best(1L) > best(2L), s"best: ${best(1L)} vs ${best(2L)}")
    assert(most(2L) > most(1L), s"most: ${most(2L)} vs ${most(1L)}")
    // most_fields vs cross_fields: doc 3's y is RARE among titles
    // (high per-field idf) but COMMON corpus-wide — blending the df
    // across fields demotes it below body-only doc 4
    assert(most(3L) > most(4L), s"most: ${most(3L)} vs ${most(4L)}")
    assert(cross(4L) > cross(3L), s"cross: ${cross(4L)} vs ${cross(3L)}")
  }

  test("most_fields and cross_fields match a naive recompute on real docs") {
    val docs = Tables.documents(spark, sfDir)
    val terms = Seq("merge", "query", "scan")
    val (titleLen, k1, b) = (8, 1.2, 0.75)
    val rows = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").toSeq)
    val perDoc = rows.map { case (id, toks) =>
      val (tt, bt) = toks.splitAt(titleLen)
      (id, tt.size.toLong, bt.size.toLong,
        terms.map(t => tt.count(_ == t).toLong),
        terms.map(t => bt.count(_ == t).toLong))
    }
    val n = perDoc.length.toLong
    val totT = perDoc.map(_._2).sum
    val totB = perDoc.map(_._3).sum
    val dfT = terms.indices.map(i => perDoc.count(_._4(i) > 0).toLong)
    val dfB = terms.indices.map(i => perDoc.count(_._5(i) > 0).toLong)
    val avgT = totT.toDouble / n
    val avgB = totB.toDouble / n
    def idf(df: Long) = DetLn.lnScala(1 + (n - df + 0.5) / (df + 0.5))
    def scoreTerm(idf0: Double, tf: Long, dl: Long, avg: Double) =
      idf0 * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * (dl / avg)))
    def naive(mode: String): Seq[(Long, Double)] = perDoc.toSeq.collect {
      case (id, dlt, dlb, tft, tfb)
          if terms.indices.exists(i => tft(i) > 0 || tfb(i) > 0) =>
        val s = mode match {
          case "most_fields" =>
            val sT = terms.indices.map(i =>
              scoreTerm(idf(dfT(i)), tft(i), dlt, avgT)).reduce(_ + _)
            val sB = terms.indices.map(i =>
              scoreTerm(idf(dfB(i)), tfb(i), dlb, avgB)).reduce(_ + _)
            2.0 * sT + 1.0 * sB
          case "cross_fields" =>
            terms.indices.map { i =>
              val bi = idf(math.max(dfT(i), dfB(i)))
              math.max(scoreTerm(bi, tft(i), dlt, avgT),
                scoreTerm(bi, tfb(i), dlb, avgB))
            }.reduce(_ + _)
        }
        id -> s
    }.sortBy { case (id, s) => (-s, id) }.take(15)
    val gotMost = TextOps.multiMatchFields(docs, terms, titleLen,
        "most_fields", 2.0, 1.0, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val gotCross = TextOps.multiMatchFields(docs, terms, titleLen,
        "cross_fields", 1.0, 1.0, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotMost == naive("most_fields"))
    assert(gotCross == naive("cross_fields"))
    assert(gotMost.nonEmpty && gotCross.nonEmpty)
  }
}
