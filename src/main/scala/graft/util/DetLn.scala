package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dual-compiled natural logarithm (r14).
  *
  * Why: Spark's `log` expression evaluates `StrictMath.log` (fdlibm);
  * DuckDB's `ln` is the host libm. They agree on MOST inputs — the
  * whole BM25 family shipped on that luck — but provably not all:
  * the multi_match idf inputs at sf0.001 hit two arguments where
  * fdlibm and glibc differ by one ulp (e.g. 0x1.85d5fb54d088fp+1,
  * measured r14), which is exactly the silent cross-engine drift
  * class this repo's oracle discipline exists to kill.
  *
  * Fix: compute ln with NO libm at all — a fixed program of
  * exactly-rounded IEEE ops (+, −, ×, ÷, compares), which every
  * conforming engine executes bit-identically:
  *
  *  1. range-reduce x ≥ 1 by exact power-of-two divisions (a 6-stage
  *     binary ladder, 2^32 … 2^1) to y ∈ [1, 2), k = floor(log2 x);
  *  2. t = (y−1)/(y+1) ∈ [0, 1/3); atanh series
  *     ln y = 2t·(1 + t²/3 + t⁴/5 + …) truncated at [[Terms]] terms,
  *     Horner-evaluated in one fixed order (truncation ≤ 4e-13
  *     relative — identical on both engines, so invisible to the
  *     oracle);
  *  3. ln x = k·Ln2 + ln y, with [[Ln2]] the same double literal on
  *     both sides.
  *
  * The Column program and the SQL text are generated from the SAME
  * stage list and coefficient constants below, so the engines cannot
  * drift. Intermediates are CHAINED COLUMNS, not one nested
  * expression — callers apply this to 1-row stats frames (the idf
  * gauge), where each stage is an attribute reference and the
  * codegen'd method stays tiny.
  *
  * Domain: x ≥ 1 and x < 2^64 (every BM25-style idf argument is
  * 1 + positive-rational and bounded by ~corpus size). Callers with
  * x < 1 must transform first (ln(1/x) = −ln x).
  */
object DetLn {
  /** Nearest double to ln 2 — the literal both engines share. */
  val Ln2: Double = 0.6931471805599453
  /** atanh-series terms; t² < 1/9 puts truncation at ~4e-13 relative. */
  val Terms: Int = 12

  private val Ladder: Seq[Int] = Seq(32, 16, 8, 4, 2, 1)
  private def pow2(s: Int): Double = java.lang.Math.scalb(1.0, s)
  /** c(0)=1, c(j)=1/(2j+1) — the series coefficients, rounded once
    * here and emitted verbatim into both programs. */
  private def coeff(j: Int): Double = 1.0 / (2 * j + 1)

  /** Double literal that parses back to the identical IEEE value in
    * DuckDB (shortest-roundtrip repr; e0-suffixed so DuckDB keeps it
    * DOUBLE, not DECIMAL — the text_bm25 decimal-fold lesson). */
  def dlit(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  /** Append chained columns computing ln(`argCol`) into `outCol`.
    * Intermediate names are `__ln_<outCol>_*`; they are dropped. */
  def withLn(df0: DataFrame, argCol: String, outCol: String): DataFrame = {
    def n(s: String) = s"__ln_${outCol}_$s"
    var df = df0.withColumn(n("y0"), col(argCol).cast("double"))
    var prev = n("y0")
    var kTerms = List.empty[Column]
    for (s <- Ladder) {
      val y = n(s"y$s")
      val p = pow2(s)
      kTerms ::= when(col(prev) >= lit(p), lit(s.toDouble)).otherwise(lit(0.0))
      df = df.withColumn(y,
        when(col(prev) >= lit(p), col(prev) / lit(p)).otherwise(col(prev)))
      prev = y
    }
    val k = kTerms.reverse.reduce(_ + _) // ladder order, left fold
    df = df
      .withColumn(n("k"), k)
      .withColumn(n("t"), (col(prev) - lit(1.0)) / (col(prev) + lit(1.0)))
      .withColumn(n("t2"), col(n("t")) * col(n("t")))
    val h = (Terms - 1 to 0 by -1).foldLeft(lit(coeff(Terms)): Column)(
      (acc, j) => acc * col(n("t2")) + lit(coeff(j)))
    df.withColumn(outCol,
        col(n("k")) * lit(Ln2) + lit(2.0) * col(n("t")) * h)
      .drop((n("y0") +: Ladder.map(s => n(s"y$s"))) ++
        Seq(n("k"), n("t"), n("t2")): _*)
  }

  /** The identical program as DuckDB lateral-alias select items:
    * (name, expr) pairs to splice into a SELECT list in order, the
    * last pair being (`outCol`, final expression). `argExpr` may
    * reference earlier aliases of the surrounding SELECT. */
  def sqlItems(argExpr: String, outCol: String): Seq[(String, String)] = {
    def n(s: String) = s"__ln_${outCol}_$s"
    val items = Seq.newBuilder[(String, String)]
    items += n("y0") -> s"CAST(($argExpr) AS DOUBLE)"
    var prev = n("y0")
    var kExprs = List.empty[String]
    for (s <- Ladder) {
      val y = n(s"y$s")
      val p = dlit(pow2(s))
      kExprs ::= s"(CASE WHEN $prev >= $p THEN ${dlit(s.toDouble)} ELSE 0.0e0 END)"
      items += y -> s"(CASE WHEN $prev >= $p THEN $prev / $p ELSE $prev END)"
      prev = y
    }
    items += n("k") -> kExprs.reverse.mkString(" + ")
    items += n("t") -> s"($prev - 1.0e0) / ($prev + 1.0e0)"
    items += n("t2") -> s"${n("t")} * ${n("t")}"
    val h = (Terms - 1 to 0 by -1).foldLeft(dlit(coeff(Terms)))(
      (acc, j) => s"($acc * ${n("t2")} + ${dlit(coeff(j))})")
    items += outCol -> s"${n("k")} * ${dlit(Ln2)} + 2.0e0 * ${n("t")} * $h"
    items.result()
  }

  /** Nest (name, expr) chain items as one-item-per-level subqueries
    * over `base` — REQUIRED shape for DuckDB: lateral aliases in one
    * SELECT are bound by textual substitution, and the ladder's three
    * references per stage compound to a 3^6 × Horner-refs expression
    * (measured r14: 56 s to bind ONE row; the nested form, where
    * every intermediate is a real projection column, binds in 40 ms —
    * 1400× — with identical results). Each level's items may
    * reference any earlier level's aliases. */
  def nestSql(base: String, items: Seq[(String, String)]): String =
    items.zipWithIndex.foldLeft(base) { case (inner, ((name, expr), i)) =>
      s"(SELECT *, $expr AS $name FROM $inner q$i)"
    }

  /** One-expression form: [[DetLnExpr]] evaluating [[lnScala]] as a
    * codegen'd kernel call. This is the HOT-PATH form for per-row use
    * ([[withLn]]'s chained columns are for 1-row gauges only: on a
    * data-scale frame Catalyst's CollapseProject merges the chain back
    * into one textually-substituted expression — the ladder's 3
    * refs/stage compound exactly like DuckDB's lateral aliases did,
    * measured 5× on significant_mi, r14). Bit-identical to the column
    * program by construction: lnScala IS the program. */
  def lnExpr(c: Column): Column =
    org.apache.spark.sql.graftglue.Glue.column(
      DetLnExpr(org.apache.spark.sql.graftglue.Glue.expression(c)))

  /** Plain-Scala replica of the SAME program (spec use: pins the
    * Column program to this documented order bit-for-bit). */
  def lnScala(x: Double): Double = {
    var y = x
    var k = 0.0
    for (s <- Ladder) {
      val p = pow2(s)
      if (y >= p) { k += s.toDouble; y /= p }
    }
    val t = (y - 1.0) / (y + 1.0)
    val t2 = t * t
    var h = coeff(Terms)
    var j = Terms - 1
    while (j >= 0) { h = h * t2 + coeff(j); j -= 1 }
    k * Ln2 + 2.0 * t * h
  }
}

/** [[DetLn.lnScala]] as a Catalyst expression — codegen'd kernel call,
  * O(1) plan size (see [[DetLn.lnExpr]]). */
case class DetLnExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"det_ln requires double input, got ${t.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    DetLn.lnScala(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.util.DetLn.lnScala($c);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)

  override def prettyName: String = "det_ln"
}
