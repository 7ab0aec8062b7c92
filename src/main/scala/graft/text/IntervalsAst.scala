package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES intervals query — the combinator AST (`match` / `all_of` /
  * `any_of` with per-clause `ordered` + `max_gaps`).
  *
  * [[TextOps.intervalsQuery]] covers the flat 3-term ordered `match`
  * rule; real Kibana queries COMPOSE — the ES docs' canonical example
  * nests `all_of(ordered)` inside `any_of`. This is the composition
  * layer, built the way [[BoolDsl]] built bool queries: a small sealed
  * AST compiled recursively to ONE narrow per-row Column program — and,
  * from the SAME tree, to an equivalent DuckDB list-lambda expression
  * ([[oracleSql]]), so the Spark query and its oracle cannot drift.
  *
  * Semantics follow Lucene's minimal-interval algebra (the engine under
  * ES intervals):
  *
  *  - `match(t)` yields a width-1 interval at each position of `t` in
  *    the lowercased whitespace token stream (positions 1-based).
  *  - `match(t1..tn, ordered, max_gaps)` desugars to
  *    `all_of(match(t1)..match(tn), ordered, max_gaps)` — the ES rule.
  *  - `all_of(children, ordered, max_gaps)` takes one interval from
  *    each child; `ordered` requires them strictly in sequence
  *    (prev.end < next.start, which also forbids overlap — Lucene's
  *    ORDERED); unordered allows any arrangement including overlap
  *    (Lucene's UNORDERED). The combined interval spans min-start to
  *    max-end; its gap count is span length minus the number of
  *    DISTINCT positions covered by the components (union semantics,
  *    so unordered overlaps aren't double-counted), and combos with
  *    more than `max_gaps` gaps drop (`max_gaps < 0` = unlimited, the
  *    ES default).
  *  - `any_of(children)` unions the children's interval sets.
  *  - After every combinator the interval set is MINIMIZED — dedup +
  *    drop any interval that strictly contains another — which is
  *    exactly Lucene's minimal-interval guarantee (e.g. tokens
  *    `a x a b` give ordered `a..b` intervals (1,4) and (3,4); only
  *    (3,4) survives).
  *
  * Intervals are encoded as one BIGINT `s * 100000 + e` (token
  * positions < 100000) on BOTH engines: integer lists are the one
  * array shape whose distinct/compare behavior is identical in Spark
  * and DuckDB 1.0 (`list_distinct` on struct lists is unimplemented
  * there), and the encoding keeps the whole program inside codegen'd
  * higher-order array functions.
  *
  * Scale shape: the compiled tree is ONE projection over the corpus —
  * no join, no explode, no shuffle below the bounded TakeOrdered
  * top-k. Per-doc cost is the product of component term frequencies
  * inside each `all_of` (bounded small for real queries); corpus cost
  * is linear. Reference context: the river feeds ES where such queries
  * run per-shard (HBaseRiver.java:104 ships docs to the ES bulk API);
  * here the query itself is the distributed scan.
  */
object IntervalsAst {

  /** Positions are 1-based and < Enc; an interval [s,e] is s*Enc+e. */
  private val Enc = 100000L

  sealed trait Node
  /** ES intervals `match` rule. Repeated terms are allowed (ES matches
    * `hash hash`-style repeated-term phrases — the r12 ADVICE class). */
  final case class IMatch(terms: Seq[String], ordered: Boolean = false,
      maxGaps: Int = -1) extends Node
  /** ES intervals `prefix` rule (r13): a width-1 interval at every
    * token starting with `prefix` — composes under the combinators
    * like any other source (the ES docs pair it with all_of for
    * "term then completion" patterns). */
  final case class IPrefix(prefix: String) extends Node
  /** ES intervals `fuzzy` rule (r14): a width-1 interval at every
    * token within `maxEdits` Levenshtein edits of `term` — the
    * text_completion_fuzzy edit-distance machinery as an intervals
    * source (`levenshtein` is a codegen'd builtin on BOTH engines,
    * SparkEntry's q_completion_fuzzy precedent). */
  final case class IFuzzy(term: String, maxEdits: Int = 1) extends Node
  /** ES intervals `wildcard` rule (r14): a width-1 interval at every
    * token matching `pattern`, in SQL LIKE spelling (`_`/`%` — the
    * text_wildcard_search convention, identical LIKE semantics in
    * Spark and DuckDB). */
  final case class IWildcard(pattern: String) extends Node
  /** ES intervals `all_of` combinator. */
  final case class IAllOf(children: Seq[Node], ordered: Boolean = false,
      maxGaps: Int = -1) extends Node
  /** ES intervals `any_of` combinator. */
  final case class IAnyOf(children: Seq[Node]) extends Node
  /** ES intervals `filter` (r13): keep `source` intervals by their
    * positional relation to the `reference` source's intervals. Modes
    * (the ES set): `containing` / `not_containing` (source interval
    * holds ≥1 / no reference interval), `contained_by` /
    * `not_contained_by` (source sits inside ≥1 / no reference
    * interval), `overlapping` / `not_overlapping` (shares ≥1 / no
    * position). The survivors are a subset of an already-minimal set —
    * an antichain's subset is an antichain, so no re-minimize. */
  final case class IFilter(source: Node, mode: String, reference: Node) extends Node
  /** Interval expansion (r14, the spans layer's `span_not` pre/post
    * buffers): every child interval [s,e] becomes
    * [max(s−pre, 0), min(e+post, Enc−1)] — clamped so the encoding
    * never goes negative (negative `%`/`//` semantics DIVERGE between
    * the engines) or carries past the Enc radix. The expanded set is
    * NOT re-minimized (expansion can nest formerly-disjoint
    * intervals); it is intended as a [[IFilter]] reference — overlap/
    * containment exists-tests don't require minimality — though the
    * combinators accept it anywhere (they re-minimize their own
    * outputs). */
  final case class IExpand(child: Node, pre: Int, post: Int) extends Node

  private val FilterModes = Set("containing", "not_containing",
    "contained_by", "not_contained_by", "overlapping", "not_overlapping")

  // ---- Spark compiler --------------------------------------------------

  private def sOf(v: Column): Column = ((v - (v % Enc)) / Enc).cast("long")
  private def eOf(v: Column): Column = v % Enc

  /** Is every interval this node yields statically width-1 (a single
    * token position)? True for single-term matches — the compiler uses
    * it to skip the per-combo `sequence`/`array_union` coverage
    * allocation in the gap check (the hot path for desugared
    * multi-term matches: ordered width-1 chains cover exactly n
    * positions; unordered ones cover the distinct starts). */
  private def width1(node: Node): Boolean = node match {
    case IMatch(Seq(_), _, _) => true
    case IPrefix(_) => true
    case IFuzzy(_, _) => true
    case IWildcard(_) => true
    case IFilter(src, _, _) => width1(src) // survivors come from source
    case IExpand(c, pre, post) => pre == 0 && post == 0 && width1(c)
    case _ => false
  }

  private def comboValid(cm: Column, n: Int, ordered: Boolean, maxGaps: Int,
      allWidth1: Boolean): Column = {
    val comps = (1 to n).map(i => element_at(cm, i))
    val orderedOk =
      if (!ordered || n == 1) lit(true)
      else comps.sliding(2).map { case Seq(a, b) => eOf(a) < sOf(b) }
        .reduce(_ && _)
    val gapsOk =
      if (maxGaps < 0) lit(true)
      else {
        val s = comps.map(sOf).reduce(least(_, _))
        val e = comps.map(eOf).reduce(greatest(_, _))
        val covered =
          if (allWidth1 && (ordered || n == 1)) lit(n.toLong)
          else if (allWidth1)
            size(array_distinct(array(comps.map(sOf): _*))).cast("long")
          else size(comps.map(c => sequence(sOf(c), eOf(c)))
            .reduce(array_union(_, _))).cast("long")
        e - s + lit(1L) - covered <= lit(maxGaps.toLong)
      }
    orderedOk && gapsOk
  }

  /** Compile `node` post-order into a chain of intermediate columns —
    * one per AST node — instead of one giant nested expression.
    * Duplicated-subtree references (the minimize step reads its
    * distinct'd input twice; every combinator reads its children) stay
    * cheap attribute references, which keeps the analyzer linear in
    * tree size (a single-expression compile of a 3-level tree blows
    * past the analyzer's resolution iteration cap) and lets Catalyst's
    * CollapseProject decide what to inline. Returns (df-with-columns,
    * root interval-column name). */
  private def collectTerms(node: Node): Seq[String] = node match {
    case IMatch(ts, _, _) => ts
    case IPrefix(_) | IFuzzy(_, _) | IWildcard(_) => Nil
    case IAllOf(cs, _, _) => cs.flatMap(collectTerms)
    case IAnyOf(cs) => cs.flatMap(collectTerms)
    case IExpand(c, _, _) => collectTerms(c)
    case IFilter(src, _, ref) => collectTerms(src) ++ collectTerms(ref)
  }

  private def collectPrefixes(node: Node): Seq[String] = node match {
    case IMatch(_, _, _) | IFuzzy(_, _) | IWildcard(_) => Nil
    case IPrefix(pfx) => Seq(pfx)
    case IAllOf(cs, _, _) => cs.flatMap(collectPrefixes)
    case IAnyOf(cs) => cs.flatMap(collectPrefixes)
    case IExpand(c, _, _) => collectPrefixes(c)
    case IFilter(src, _, ref) => collectPrefixes(src) ++ collectPrefixes(ref)
  }

  private def collectFuzzies(node: Node): Seq[(String, Int)] = node match {
    case IMatch(_, _, _) | IPrefix(_) | IWildcard(_) => Nil
    case IFuzzy(t, f) => Seq((t, f))
    case IAllOf(cs, _, _) => cs.flatMap(collectFuzzies)
    case IAnyOf(cs) => cs.flatMap(collectFuzzies)
    case IExpand(c, _, _) => collectFuzzies(c)
    case IFilter(src, _, ref) => collectFuzzies(src) ++ collectFuzzies(ref)
  }

  private def collectWildcards(node: Node): Seq[String] = node match {
    case IMatch(_, _, _) | IPrefix(_) | IFuzzy(_, _) => Nil
    case IWildcard(p) => Seq(p)
    case IAllOf(cs, _, _) => cs.flatMap(collectWildcards)
    case IAnyOf(cs) => cs.flatMap(collectWildcards)
    case IExpand(c, _, _) => collectWildcards(c)
    case IFilter(src, _, ref) => collectWildcards(src) ++ collectWildcards(ref)
  }

  /** The pairwise relation predicate for [[IFilter]]: does source
    * interval `a` stand in `mode`'s base relation to reference `b`? */
  private def relPred(mode: String, a: Column, b: Column): Column =
    mode.stripPrefix("not_") match {
      case "containing"   => sOf(a) <= sOf(b) && eOf(b) <= eOf(a)
      case "contained_by" => sOf(b) <= sOf(a) && eOf(a) <= eOf(b)
      case "overlapping"  => sOf(a) <= eOf(b) && sOf(b) <= eOf(a)
    }

  private final class Planner(start: DataFrame, tree: Node) {
    var df: DataFrame = start
    private var ctr = 0
    /** Emit a new intermediate column and DROP the listed consumed
      * columns in the same projection. Chained projections carry every
      * surviving column's payload row-by-row through the interpreted
      * HOF pipeline, so fat intermediates (token arrays, combo arrays)
      * must die at their single consumer — measured ~2× on the wired
      * trees (SCALING.md r13). */
    private var leafCols: Set[String] = Set.empty
    def emit(c: Column, consumed: Seq[String] = Nil): String = {
      val n = s"__iv_$ctr"; ctr += 1
      df = df.withColumn(n, c).drop(consumed.filterNot(leafCols): _*)
      n
    }
    /** Leaf positions are computed ONCE PER DISTINCT TERM up front
      * (clauses repeating a term share the column), after which the
      * token array — the fattest per-row payload — is dropped before
      * any combinator stage runs. Leaf columns are small (a few
      * positions) and may be shared, so they are never dropped. */
    private def positionsOf(pred: Column => Column): Column =
      transform(
        filter(transform(col("__toks"), (tok, i) => when(pred(tok), i + 1).otherwise(-1)),
          p => p > 0),
        p => p.cast("long") * Enc + p.cast("long"))
    private val termCols: Map[String, String] =
      collectTerms(tree).distinct.map(t => t -> emit(positionsOf(_ === t))).toMap
    private val prefixCols: Map[String, String] =
      collectPrefixes(tree).distinct.map(pfx =>
        pfx -> emit(positionsOf(_.startsWith(pfx)))).toMap
    private val fuzzyCols: Map[(String, Int), String] =
      collectFuzzies(tree).distinct.map { case (t, f) =>
        (t, f) -> emit(positionsOf(tok => levenshtein(tok, lit(t)) <= f)) }.toMap
    private val wildcardCols: Map[String, String] =
      collectWildcards(tree).distinct.map(p =>
        p -> emit(positionsOf(_.like(p)))).toMap
    leafCols = termCols.values.toSet ++ prefixCols.values.toSet ++
      fuzzyCols.values.toSet ++ wildcardCols.values.toSet
    df = df.drop("__toks")

    /** Dedup + drop intervals strictly containing another (Lucene
      * minimality); the distinct'd set is its own emitted column so
      * the a-vs-b scan reads one attribute, not two expression copies. */
    def minimize(xs: Column, consumed: Seq[String]): String = {
      val dN = emit(array_distinct(xs), consumed)
      val d = col(dN)
      emit(filter(d, a => !exists(d, b =>
        sOf(b) >= sOf(a) && eOf(b) <= eOf(a) &&
          (sOf(b) > sOf(a) || eOf(b) < eOf(a)))), Seq(dN))
    }
    def go(node: Node): String = node match {
      case IMatch(Seq(t), _, _) => termCols(t)
      case IPrefix(pfx) => prefixCols(pfx)
      case IFuzzy(t, f) => fuzzyCols((t, f))
      case IWildcard(p) => wildcardCols(p)
      case IMatch(ts, ordered, g) =>
        require(ts.nonEmpty, "match needs at least one term")
        go(IAllOf(ts.map(t => IMatch(Seq(t))), ordered, g))
      case IAllOf(cs, ordered, g) =>
        require(cs.nonEmpty, "all_of needs at least one child")
        val childNames = cs.map(go)
        val children = childNames.map(col)
        // combos: array<array<bigint>>, one element per child, child order
        val init = transform(children.head, x => array(x))
        val combos = children.tail.foldLeft(init)((acc, ch) =>
          flatten(transform(acc, cm => transform(ch, x => concat(cm, array(x))))))
        val n = cs.length
        val w1 = cs.forall(width1)
        val combosN = emit(combos, childNames)
        val validN = emit(filter(col(combosN),
          cm => comboValid(cm, n, ordered, g, w1)), Seq(combosN))
        val combined = transform(col(validN), cm => {
          val comps = (1 to n).map(i => element_at(cm, i))
          comps.map(sOf).reduce(least(_, _)) * Enc +
            comps.map(eOf).reduce(greatest(_, _))
        })
        minimize(combined, Seq(validN))
      case IAnyOf(cs) =>
        require(cs.nonEmpty, "any_of needs at least one child")
        val childNames = cs.map(go)
        minimize(childNames.map(col).reduce(concat(_, _)), childNames)
      case IFilter(src, mode, ref) =>
        require(FilterModes(mode), s"unknown intervals filter mode: $mode")
        val srcN = go(src)
        val refN = go(ref)
        val hit = (a: Column) => exists(col(refN), b => relPred(mode, a, b))
        val keep = (a: Column) =>
          if (mode.startsWith("not_")) !hit(a) else hit(a)
        emit(filter(col(srcN), keep), Seq(srcN, refN))
      case IExpand(c, pre, post) =>
        require(pre >= 0 && post >= 0, "expand buffers must be >= 0")
        val cN = go(c)
        // distinct: two disjoint child intervals can expand to the
        // SAME interval — the algebra is over sets
        if (pre == 0 && post == 0) cN
        else emit(array_distinct(transform(col(cN), v =>
          greatest(sOf(v) - lit(pre.toLong), lit(0L)) * Enc +
            least(eOf(v) + lit(post.toLong), lit(Enc - 1)))), Seq(cN))
    }
  }

  /** Docs scored by their count of minimal intervals for `node`;
    * `first_start` is the earliest surviving interval's start
    * position. One corpus scan — the compiled tree is a chain of
    * narrow array projections — bounded top-k. */
  def intervalsAstQuery(docs: DataFrame, node: Node, k: Int): DataFrame = {
    // the combo+minimize algebra is COMPUTE-heavy per doc (interpreted
    // higher-order functions, O(freq-product + minimal-set²) per
    // matching row); a small single-file input would pin all of it to
    // one scan task. Spread the narrow (doc_id, toks) rows first when
    // the source has fewer partitions than the session default — at
    // warehouse scale inputs are already multi-file and this branch
    // never fires, so no gratuitous shuffle lands in the 100 TB plan.
    val defaultPar = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val spread =
      if (docs.rdd.getNumPartitions >= defaultPar) docs
      else docs.repartition(defaultPar)
    // positions are encoded s*Enc+e, so a doc with >= Enc tokens would
    // silently corrupt intervals IDENTICALLY on both engines — the
    // oracle cannot catch it. Fail loudly instead (r13 ADVICE): the
    // guard is one size() compare per row, and real corpora stay far
    // under 100k whitespace tokens per document.
    val toks0 = split(lower(col("text")), "\\s+")
    val guarded = when(size(toks0) < lit(Enc), toks0)
      .otherwise(raise_error(concat(
        lit("intervals: doc "), col("doc_id").cast("string"),
        lit(s" has >= $Enc tokens; the s*$Enc+e interval encoding would corrupt"))))
    val p = new Planner(spread.select(col("doc_id"),
      guarded.as("__toks")), node)
    val root = p.go(node)
    // the zero-hit filter sits ABOVE the top-k: predicate pushdown
    // cannot cross a limit, whereas below it the optimizer inlines the
    // WHOLE interval algebra into a scan-level Filter predicate —
    // recomputing everything per row, single-threaded under the
    // pre-repartition scan (caught in the r13 plan audit; ~2× the
    // query). Equivalent output: zero rows rank strictly last under
    // n_intervals DESC, so page-then-drop-zeros == filter-then-page.
    p.df
      .select(col("doc_id"),
        size(col(root)).cast("long").as("n_intervals"),
        array_min(transform(col(root), v => sOf(v))).as("first_start"))
      .orderBy(col("n_intervals").desc, col("doc_id"))
      .limit(k)
      .filter(col("n_intervals") > 0)
  }

  // ---- DuckDB oracle compiler (same tree, same algebra) ----------------

  private def sqlQuote(t: String): String = t.replace("'", "''")

  /** Compile `node` to a DuckDB list-lambda expression over `toks`
    * (a VARCHAR[] column name). Lambda variables are numbered fresh
    * per sub-expression so nesting can't shadow. */
  def compileSql(node: Node, toks: String): String = {
    var k = 0
    def fresh(): Int = { k += 1; k }
    def minimizeSql(xs: String): String = {
      val (a, b) = (s"a${fresh()}", s"b${fresh()}")
      val d = s"list_distinct($xs)"
      s"list_filter($d, $a -> NOT len(list_filter($d, $b -> " +
        s"$b // $Enc >= $a // $Enc AND $b % $Enc <= $a % $Enc AND " +
        s"($b // $Enc > $a // $Enc OR $b % $Enc < $a % $Enc))) > 0)"
    }
    def go(n: Node): String = n match {
      case IMatch(Seq(t), _, _) =>
        val (tv, iv, pv) = (s"t${fresh()}", s"i${fresh()}", s"p${fresh()}")
        s"list_transform(list_filter(list_transform($toks, ($tv, $iv) -> " +
          s"CASE WHEN $tv = '${sqlQuote(t)}' THEN $iv ELSE -1 END), " +
          s"$pv -> $pv > 0), $pv -> $pv * $Enc + $pv)"
      case IMatch(ts, ordered, g) =>
        go(IAllOf(ts.map(t => IMatch(Seq(t))), ordered, g))
      case IPrefix(pfx) =>
        // substr compare, not LIKE — a prefix containing %/_ must not
        // become a pattern metacharacter
        val (tv, iv, pv) = (s"t${fresh()}", s"i${fresh()}", s"p${fresh()}")
        s"list_transform(list_filter(list_transform($toks, ($tv, $iv) -> " +
          s"CASE WHEN substr($tv, 1, ${pfx.length}) = '${sqlQuote(pfx)}' THEN $iv ELSE -1 END), " +
          s"$pv -> $pv > 0), $pv -> $pv * $Enc + $pv)"
      case IFuzzy(t, f) =>
        val (tv, iv, pv) = (s"t${fresh()}", s"i${fresh()}", s"p${fresh()}")
        s"list_transform(list_filter(list_transform($toks, ($tv, $iv) -> " +
          s"CASE WHEN levenshtein($tv, '${sqlQuote(t)}') <= $f THEN $iv ELSE -1 END), " +
          s"$pv -> $pv > 0), $pv -> $pv * $Enc + $pv)"
      case IWildcard(p) =>
        // pattern is already in LIKE spelling — identical semantics on
        // both engines over the lowercased token stream
        val (tv, iv, pv) = (s"t${fresh()}", s"i${fresh()}", s"p${fresh()}")
        s"list_transform(list_filter(list_transform($toks, ($tv, $iv) -> " +
          s"CASE WHEN $tv LIKE '${sqlQuote(p)}' THEN $iv ELSE -1 END), " +
          s"$pv -> $pv > 0), $pv -> $pv * $Enc + $pv)"
      case IAllOf(cs, ordered, g) =>
        val children = cs.map(go)
        val x0 = s"x${fresh()}"
        val init = s"list_transform(${children.head}, $x0 -> [$x0])"
        val combos = children.tail.foldLeft(init) { (acc, ch) =>
          val (cv, xv) = (s"cm${fresh()}", s"x${fresh()}")
          s"flatten(list_transform($acc, $cv -> " +
            s"list_transform($ch, $xv -> list_concat($cv, [$xv]))))"
        }
        val nC = cs.length
        val cv = s"cm${fresh()}"
        def comp(i: Int) = s"$cv[$i]"
        val orderedOk =
          if (!ordered || nC == 1) "TRUE"
          else (1 until nC).map(i =>
            s"${comp(i)} % $Enc < ${comp(i + 1)} // $Enc").mkString(" AND ")
        val gapsOk =
          if (g < 0) "TRUE"
          else {
            val ss = (1 to nC).map(i => s"${comp(i)} // $Enc")
            val es = (1 to nC).map(i => s"${comp(i)} % $Enc")
            val s = if (nC == 1) ss.head else s"least(${ss.mkString(", ")})"
            val e = if (nC == 1) es.head else s"greatest(${es.mkString(", ")})"
            val ranges = (1 to nC).map(i =>
              s"range(${comp(i)} // $Enc, ${comp(i)} % $Enc + 1)")
            val union = ranges.reduce((a, b) => s"list_concat($a, $b)")
            s"$e - $s + 1 - len(list_distinct($union)) <= $g"
          }
        val valid = s"list_filter($combos, $cv -> $orderedOk AND $gapsOk)"
        val cv2 = s"cm${fresh()}"
        val ss2 = (1 to nC).map(i => s"$cv2[$i] // $Enc")
        val es2 = (1 to nC).map(i => s"$cv2[$i] % $Enc")
        val s2 = if (nC == 1) ss2.head else s"least(${ss2.mkString(", ")})"
        val e2 = if (nC == 1) es2.head else s"greatest(${es2.mkString(", ")})"
        minimizeSql(s"list_transform($valid, $cv2 -> ($s2) * $Enc + ($e2))")
      case IAnyOf(cs) =>
        minimizeSql(cs.map(go).reduce((a, b) => s"list_concat($a, $b)"))
      case IFilter(src, mode, ref) =>
        require(FilterModes(mode), s"unknown intervals filter mode: $mode")
        val (srcSql, refSql) = (go(src), go(ref))
        val (av, bv) = (s"a${fresh()}", s"b${fresh()}")
        val rel = mode.stripPrefix("not_") match {
          case "containing" =>
            s"$av // $Enc <= $bv // $Enc AND $bv % $Enc <= $av % $Enc"
          case "contained_by" =>
            s"$bv // $Enc <= $av // $Enc AND $av % $Enc <= $bv % $Enc"
          case "overlapping" =>
            s"$av // $Enc <= $bv % $Enc AND $bv // $Enc <= $av % $Enc"
        }
        val cmp = if (mode.startsWith("not_")) "= 0" else "> 0"
        s"list_filter($srcSql, $av -> " +
          s"len(list_filter($refSql, $bv -> $rel)) $cmp)"
      case IExpand(c, pre, post) =>
        require(pre >= 0 && post >= 0, "expand buffers must be >= 0")
        val cSql = go(c)
        if (pre == 0 && post == 0) cSql
        else {
          val v = s"v${fresh()}"
          s"list_distinct(list_transform($cSql, $v -> " +
            s"greatest($v // $Enc - $pre, 0) * $Enc + " +
            s"least($v % $Enc + $post, ${Enc - 1})))"
        }
    }
    go(node)
  }

  /** Full DuckDB oracle for [[intervalsAstQuery]] on `documents`. */
  def oracleSql(node: Node, k: Int): String = {
    val expr = compileSql(node, "toks")
    raw"""WITH tk AS (SELECT doc_id,
         |    string_split_regex(lower(text), '\s+') AS toks FROM documents),
         |iv AS (SELECT doc_id, $expr AS iv FROM tk)
         |SELECT doc_id, CAST(len(iv) AS BIGINT) AS n_intervals,
         |       CAST(list_min(list_transform(iv, v0 -> v0 // $Enc)) AS BIGINT) AS first_start
         |FROM iv WHERE len(iv) > 0
         |ORDER BY n_intervals DESC, doc_id LIMIT $k""".stripMargin
  }
}
