package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.DetLn

/** ES `function_score` with `script_score`-class scoring functions
  * (VERDICT r15 #3 — the most-used function_score member after the
  * decay / field_value_factor members already shipped): a sealed
  * score-expression AST (field refs, literals, + − × ÷, min/max, and
  * the existing DetLn log1p / rank_feature saturation kernels),
  * composed under function_score's `score_mode` (how the per-function
  * results combine) and `boost_mode` (how the combined result meets
  * the base query score).
  *
  * One tree compiles to BOTH engines — the IntervalsAst / BoolDsl
  * discipline — so the engines cannot drift: every node is a single
  * IEEE double operation mirrored in textual association order
  * (`a * b / c` stays left-assoc on both sides, the r14 lesson), ln
  * is the libm-free [[DetLn]] kernel (codegen'd expression on the
  * Spark side, nested one-item-per-level subqueries on the DuckDB
  * side — flat lateral aliases bind exponentially), and min/max are
  * exact. The whole scored page is therefore HASH-GREEN, not
  * tolerance-compared.
  *
  * ES semantics implemented (the documented function_score contract):
  *  - each function carries an optional FILTER; only functions whose
  *    filter matches a document contribute to that document's
  *    combined score;
  *  - a function's contribution is `weight × script(doc)`;
  *  - `score_mode ∈ {sum, multiply, max, min}` folds the matching
  *    contributions; a document matching NO function scores 1.0 (the
  *    ES default — under `multiply` this falls out of the neutral
  *    element, the other modes special-case it identically on both
  *    engines);
  *  - `boost_mode ∈ {multiply, sum, replace, max, min}` combines
  *    (base, combined).
  *
  * Scale shape: one narrow projection computing the per-function
  * contributions as NAMED columns (referenced 2–3× by the fold;
  * CollapseProject does not re-inline non-cheap multi-referenced
  * aliases), a second projection for the fold, then a bounded
  * TakeOrdered page — no shuffle, no join, whole-stage codegen
  * end-to-end. Reference analog: the scripted-scoring surface of the
  * ES cluster the river feeds (HBaseRiver.java delegates all querying
  * to ES; this is that query surface re-expressed).
  */
object ScoreAst {

  // ---------- the score-expression AST ----------

  sealed trait Expr
  /** Numeric field reference, cast to DOUBLE on both engines. */
  final case class Field(name: String) extends Expr
  final case class Num(v: Double) extends Expr
  /** op ∈ + − * / — one IEEE double operation, tree-parenthesized. */
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr {
    require(Set("+", "-", "*", "/")(op), s"op: $op")
  }
  final case class MinOf(l: Expr, r: Expr) extends Expr
  final case class MaxOf(l: Expr, r: Expr) extends Expr
  /** ln(1 + factor·field) — the field_value_factor log1p kernel.
    * `factor` must be a power of two so the argument carries exactly
    * one rounding (the 1+x add); ln is DetLn (bit-identical engines).
    * Negative field values raise on the engine side (fail-loud). */
  final case class Log1p(factor: Double, field: Field) extends Expr {
    require(factor > 0 && factor == java.lang.Math.scalb(1.0,
      java.lang.Math.getExponent(factor)), "factor must be a power of two")
  }
  /** field / (field + pivot) — the rank_feature saturation kernel
    * (two roundings, identical everywhere). */
  final case class Saturation(field: Field, pivot: Double) extends Expr
  /** Gauss decay ON ITS PROVEN FLOOR GRID (r17, VERDICT r16 #7 — the
    * decay kernels as AST nodes, so decay × saturation compositions
    * under score_mode are expressible): evaluates to
    * floor(exp(−d²/2σ²)·M) — the [[Analytics.gaussDecayScore]] program
    * verbatim, whose grid constant M carries the exhaustive margin
    * proof that a 1-ulp cross-libm exp drift cannot cross a floor
    * boundary on the events.value domain. The node's value is the
    * (exactly double-representable) grid INTEGER, so every downstream
    * AST composition — power-of-two weights, sums, min/max, products
    * with exact factors — stays hash-green: the only libm call is
    * sealed inside the floor. Constants must be a (origin, scale,
    * decay, field-domain) tuple with a proof on record
    * (`EsAggsSpec` re-runs the wired ones exhaustively). */
  final case class DecayGauss(field: Field, origin: Double, scale: Double,
      decay: Double) extends Expr {
    require(scale > 0 && decay > 0 && decay < 1)
  }
  /** Exp decay on its proven floor grid — floor(exp(−λ·d)·M), the
    * [[Analytics.expDecayScore]] program; same sealed-libm contract
    * as [[DecayGauss]]. */
  final case class DecayExp(field: Field, origin: Double, scale: Double,
      decay: Double) extends Expr {
    require(scale > 0 && decay > 0 && decay < 1)
  }

  /** Filter predicates a function can carry (the ES `filter` clause
    * of a function_score function). */
  sealed trait Pred
  final case class GtNum(field: String, v: Double) extends Pred
  final case class EqStr(field: String, v: String) extends Pred
  case object AlwaysTrue extends Pred

  /** One scoring function: contributes `weight × expr` where `filter`
    * matches. */
  final case class Func(filter: Pred, expr: Expr, weight: Double)

  val ScoreModes = Set("sum", "multiply", "max", "min")
  val BoostModes = Set("multiply", "sum", "replace", "max", "min")

  // ---------- Spark compilation ----------

  private def lnArg(f: Log1p): Column = {
    val guarded = when(col(f.field.name) >= 0, col(f.field.name).cast("double"))
      .otherwise(raise_error(concat(
        lit(s"function_score log1p: negative field ${f.field.name} value "),
        col(f.field.name).cast("string"), lit(" is below the ln(1+x) domain"))))
    lit(1.0) + lit(f.factor) * guarded
  }

  def toColumn(e: Expr): Column = e match {
    case Field(n) => col(n).cast("double")
    case Num(v) => lit(v)
    case Bin("+", l, r) => toColumn(l) + toColumn(r)
    case Bin("-", l, r) => toColumn(l) - toColumn(r)
    case Bin("*", l, r) => toColumn(l) * toColumn(r)
    case Bin(_, l, r) => toColumn(l) / toColumn(r)
    case MinOf(l, r) => least(toColumn(l), toColumn(r))
    case MaxOf(l, r) => greatest(toColumn(l), toColumn(r))
    case f: Log1p => DetLn.lnExpr(lnArg(f))
    case Saturation(f, p) => toColumn(f) / (toColumn(f) + lit(p))
    case DecayGauss(f, o, sc, dec) =>
      // the gaussDecayScore program verbatim (association order and
      // all); Spark floor returns LONG — cast back to the Expr double
      // domain (grid ≤ M < 2^53, exact)
      val twoSigmaSq = sc * sc / math.log(1 / dec)
      val d = abs(col(f.name) - lit(o))
      floor(exp(-(d * d) / lit(twoSigmaSq)) * lit(Analytics.GaussGridM))
        .cast("double")
    case DecayExp(f, o, sc, dec) =>
      val lambda = math.log(1 / dec) / sc
      val d = abs(col(f.name) - lit(o))
      floor(exp(-(d * lit(lambda))) * lit(Analytics.ExpGridM)).cast("double")
  }

  def predColumn(p: Pred): Column = p match {
    case GtNum(f, v) => col(f).cast("double") > lit(v)
    case EqStr(f, v) => col(f) === lit(v)
    case AlwaysTrue => lit(true)
  }

  /** The function_score page: (id, base_score, func_score, score)
    * top-k by final score (ties → smaller id). */
  def functionScore(df: DataFrame, idCol: String, base: Expr,
      funcs: Seq[Func], scoreMode: String, boostMode: String,
      k: Int): DataFrame = {
    require(funcs.nonEmpty && ScoreModes(scoreMode) && BoostModes(boostMode))
    // contributions as NAMED columns: each is referenced by the
    // null-check AND the fold below — naming stops CollapseProject
    // from re-inlining the DetLn kernels per reference
    val contribs = df.select(
      col(idCol) +:
        toColumn(base).as("__base") +:
        funcs.zipWithIndex.map { case (f, i) =>
          when(predColumn(f.filter), lit(f.weight) * toColumn(f.expr))
            .as(s"__c$i")
        }: _*)
    val cs = funcs.indices.map(i => col(s"__c$i"))
    val noneMatch = cs.map(_.isNull).reduce(_ && _)
    val combined = scoreMode match {
      case "sum" =>
        when(noneMatch, lit(1.0))
          .otherwise(cs.map(coalesce(_, lit(0.0))).reduce(_ + _))
      case "multiply" => cs.map(coalesce(_, lit(1.0))).reduce(_ * _)
      case "max" =>
        coalesce(if (cs.size == 1) cs.head else greatest(cs: _*), lit(1.0))
      case "min" =>
        coalesce(if (cs.size == 1) cs.head else least(cs: _*), lit(1.0))
    }
    val folded = contribs.select(col(idCol), col("__base"),
      combined.as("__comb"))
    val fin = boostMode match {
      case "multiply" => col("__base") * col("__comb")
      case "sum" => col("__base") + col("__comb")
      case "replace" => col("__comb")
      case "max" => greatest(col("__base"), col("__comb"))
      case "min" => least(col("__base"), col("__comb"))
    }
    folded
      .select(col(idCol), col("__base").as("base_score"),
        col("__comb").as("func_score"), fin.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  // ---------- DuckDB compilation (same trees) ----------

  /** Registry-based SQL compile: Log1p nodes become named nestSql
    * levels (the DetLn ladder cannot live inline — DuckDB lateral
    * aliases substitute textually); everything else is inline SQL in
    * the tree's association order with [[DetLn.dlit]] literals. */
  private final class SqlCtx {
    private var nodes = Vector.empty[Log1p]
    def lnName(f: Log1p): String = {
      val i = nodes.indexOf(f)
      if (i >= 0) s"__fs_ln$i"
      else { nodes :+= f; s"__fs_ln${nodes.size - 1}" }
    }
    def lnItems: Seq[(String, String)] = nodes.zipWithIndex.flatMap {
      case (f, i) =>
        // mirror the Spark side's fail-loud negative-domain guard
        // (ADVICE r16): a DuckDB-only replay of out-of-domain data must
        // error like the Column compile does, not silently compute the
        // DetLn ladder on a sub-1 argument
        val fld = s"CAST(${f.field.name} AS DOUBLE)"
        val arg = s"(CASE WHEN $fld >= 0.0e0 THEN 1.0e0 + ${DetLn.dlit(f.factor)} * $fld " +
          s"ELSE error('function_score log1p: negative field ${f.field.name} value ' || " +
          s"CAST(${f.field.name} AS VARCHAR) || ' is below the ln(1+x) domain') END)"
        DetLn.sqlItems(arg, s"__fs_ln$i")
    }
  }

  private def toSql(e: Expr, ctx: SqlCtx): String = e match {
    case Field(n) => s"CAST($n AS DOUBLE)"
    case Num(v) => DetLn.dlit(v)
    case Bin(op, l, r) => s"(${toSql(l, ctx)} $op ${toSql(r, ctx)})"
    case MinOf(l, r) => s"least(${toSql(l, ctx)}, ${toSql(r, ctx)})"
    case MaxOf(l, r) => s"greatest(${toSql(l, ctx)}, ${toSql(r, ctx)})"
    case f: Log1p => ctx.lnName(f)
    case Saturation(f, p) =>
      s"(${toSql(f, ctx)} / (${toSql(f, ctx)} + ${DetLn.dlit(p)}))"
    case DecayGauss(f, o, sc, dec) =>
      // the gaussDecaySql text form (same association); DuckDB floor
      // stays DOUBLE — no cast needed
      val twoSigmaSq = sc * sc / math.log(1 / dec)
      val d = s"(abs(${f.name} - ${DetLn.dlit(o)}))"
      s"floor(exp(-($d * $d) / ${DetLn.dlit(twoSigmaSq)}) * ${DetLn.dlit(Analytics.GaussGridM)})"
    case DecayExp(f, o, sc, dec) =>
      val lambda = math.log(1 / dec) / sc
      val d = s"(abs(${f.name} - ${DetLn.dlit(o)}))"
      s"floor(exp(-($d * ${DetLn.dlit(lambda)})) * ${DetLn.dlit(Analytics.ExpGridM)})"
  }

  private def predSql(p: Pred): String = p match {
    case GtNum(f, v) => s"CAST($f AS DOUBLE) > ${DetLn.dlit(v)}"
    // single quotes in the value double per the SQL string-literal
    // grammar (ADVICE r16: a raw interpolation would break — or
    // inject into — the generated oracle for values like O'Brien;
    // the Spark side's col === lit needs no escaping)
    case EqStr(f, v) => s"$f = '${v.replace("'", "''")}'"
    case AlwaysTrue => "TRUE"
  }

  /** The DuckDB twin of [[functionScore]], generated from the SAME
    * trees: ln levels first (registered during tree walk), then the
    * contribution columns, the fold, and the final page. */
  def functionScoreSql(table: String, idCol: String, base: Expr,
      funcs: Seq[Func], scoreMode: String, boostMode: String,
      k: Int): String = {
    require(funcs.nonEmpty && ScoreModes(scoreMode) && BoostModes(boostMode))
    val ctx = new SqlCtx
    // walk every tree FIRST so the ln registry is complete before
    // levels are emitted (toSql strings are pure given the registry)
    val baseSql = toSql(base, ctx)
    val funcSqls = funcs.map(f => toSql(f.expr, ctx))
    val contribItems = funcs.zipWithIndex.map { case (f, i) =>
      s"__c$i" ->
        s"(CASE WHEN ${predSql(f.filter)} THEN ${DetLn.dlit(f.weight)} * ${funcSqls(i)} END)"
    }
    val cs = funcs.indices.map(i => s"__c$i")
    val noneMatch = cs.map(c => s"$c IS NULL").mkString(" AND ")
    val combined = scoreMode match {
      case "sum" =>
        val s = cs.map(c => s"COALESCE($c, 0.0e0)")
          .reduce((a, b) => s"($a + $b)")
        s"(CASE WHEN $noneMatch THEN 1.0e0 ELSE $s END)"
      case "multiply" =>
        cs.map(c => s"COALESCE($c, 1.0e0)").reduce((a, b) => s"($a * $b)")
      case "max" =>
        val g = if (cs.size == 1) cs.head else s"greatest(${cs.mkString(", ")})"
        s"COALESCE($g, 1.0e0)"
      case "min" =>
        val g = if (cs.size == 1) cs.head else s"least(${cs.mkString(", ")})"
        s"COALESCE($g, 1.0e0)"
    }
    val fin = boostMode match {
      case "multiply" => "__base * __comb"
      case "sum" => "__base + __comb"
      case "replace" => "__comb"
      case "max" => "greatest(__base, __comb)"
      case "min" => "least(__base, __comb)"
    }
    val items = ctx.lnItems ++
      Seq("__base" -> baseSql) ++ contribItems ++ Seq("__comb" -> combined)
    val nested = DetLn.nestSql(s"(SELECT * FROM $table)", items)
    s"""SELECT $idCol, __base AS base_score, __comb AS func_score,
       |       $fin AS score
       |FROM $nested q
       |ORDER BY score DESC, $idCol LIMIT $k""".stripMargin
  }

  // ---------- the wired query's trees (ONE definition, both engines) ----------

  /** The canonical wiring on `orders` (three functions exercising
    * every AST node class):
    *  - base: rank_feature saturation of o_totalprice (pivot 2¹⁰·...);
    *  - f1 (filter o_totalprice > 150000): log1p field_value_factor,
    *    weight 2.0 — the DetLn path;
    *  - f2 (filter o_orderstatus = 'F'): linear 2⁻¹⁰·o_custkey,
    *    weight 1.5 — exact power-of-two scaling, one rounding;
    *  - f3 (unfiltered): clamp(o_totalprice/2¹⁶, 0.5, 3.0) via
    *    min/max — exact.
    * score_mode sum, boost_mode multiply. */
  val wiredBase: Expr = Saturation(Field("o_totalprice"), 1024.0)
  val wiredFuncs: Seq[Func] = Seq(
    Func(GtNum("o_totalprice", 150000.0),
      Log1p(0.125, Field("o_totalprice")), 2.0),
    Func(EqStr("o_orderstatus", "F"),
      Bin("*", Num(0.0009765625), Field("o_custkey")), 1.5),
    Func(AlwaysTrue,
      MaxOf(Num(0.5), MinOf(Num(3.0),
        Bin("/", Field("o_totalprice"), Num(65536.0)))), 1.0))

  def wiredQuery(orders: DataFrame, k: Int = 50): DataFrame =
    functionScore(orders, "o_orderkey", wiredBase, wiredFuncs,
      "sum", "multiply", k)

  def wiredSql(k: Int = 50): String =
    functionScoreSql("orders", "o_orderkey", wiredBase, wiredFuncs,
      "sum", "multiply", k)

  /** The decay-composition wiring (r17, VERDICT r16 #7 — how ES users
    * actually combine function_score members: decay × saturation under
    * score_mode) on `events`, reusing q_decay_gauss/q_decay_exp's
    * EXACT (origin=50, scale=80, decay=0.5) constants so their
    * exhaustive floor-grid margin proofs (EsAggsSpec) carry over
    * verbatim:
    *  - base: rank_feature saturation of value (pivot 2¹⁰);
    *  - f1 (value > 250): gauss decay grid, weight 2¹⁶ — a power of
    *    two, so the product with the grid integer is EXACT (≤ 5·10¹³
    *    < 2⁵³), and big enough that the rare far-from-origin band
    *    provably outranks the exp-decay rows (each function binds the
    *    page — the ScoreAstSpec removal test);
    *  - f2 (event_type = 'click'): exp decay grid, weight 2⁻¹;
    *  - f3 (unfiltered): saturation pivot 2⁸, weight 1.
    * score_mode sum, boost_mode multiply — every combination op is an
    * IEEE operation on deterministic inputs, so the page hash-matches
    * the generated DuckDB twin. */
  val wiredDecayBase: Expr = Saturation(Field("value"), 1024.0)
  val wiredDecayFuncs: Seq[Func] = Seq(
    Func(GtNum("value", 250.0),
      DecayGauss(Field("value"), 50.0, 80.0, 0.5), 65536.0),
    Func(EqStr("event_type", "click"),
      DecayExp(Field("value"), 50.0, 80.0, 0.5), 0.5),
    Func(AlwaysTrue, Saturation(Field("value"), 256.0), 1.0))

  def wiredDecayQuery(events: DataFrame, k: Int = 40): DataFrame =
    functionScore(events, "event_id", wiredDecayBase, wiredDecayFuncs,
      "sum", "multiply", k)

  def wiredDecaySql(k: Int = 40): String =
    functionScoreSql("events", "event_id", wiredDecayBase, wiredDecayFuncs,
      "sum", "multiply", k)
}
