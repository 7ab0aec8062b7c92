package graft.text

import org.apache.spark.sql.DataFrame

import graft.text.IntervalsAst._

/** ES span queries (span_term / span_near / span_or / span_not),
  * compiled onto the intervals algebra (r14).
  *
  * Elastic's own guidance is that span queries and intervals queries
  * express the same positional algebra, with intervals the
  * recommended modern surface — this layer makes the equivalence
  * executable: a small span AST whose ONLY compilation target is an
  * [[IntervalsAst.Node]], so every span query inherits the intervals
  * compiler, its generated DuckDB oracle, and its property-fuzzed
  * minimal-interval semantics for free. The mapping (each the
  * documented migration):
  *
  *  - `span_term(t)` → `match(t)` (width-1 intervals);
  *  - `span_near(clauses, slop, in_order)` →
  *    `all_of(clauses, ordered = in_order, max_gaps = slop)` — slop,
  *    like max_gaps, counts intervening non-matched positions;
  *  - `span_or(clauses)` → `any_of(clauses)`;
  *  - `span_not(include, exclude, pre, post)` →
  *    `filter(include, not_overlapping, expand(exclude, pre, post))`
  *    — the pre/post buffers extend each exclusion span backwards/
  *    forwards ([[IntervalsAst.IExpand]]), exactly Lucene's
  *    SpanNotQuery(pre, post) semantics.
  *
  * Scale shape is the intervals shape: one narrow corpus projection,
  * bounded top-k, no joins. Reference context: the span family is part
  * of the ES query surface the river's sink serves
  * (HBaseRiver.java:104). */
object Spans {

  sealed trait Span
  final case class STerm(term: String) extends Span
  final case class SNear(clauses: Seq[Span], slop: Int,
      inOrder: Boolean) extends Span
  final case class SOr(clauses: Seq[Span]) extends Span
  final case class SNot(include: Span, exclude: Span,
      pre: Int = 0, post: Int = 0) extends Span
  /** span_within(little, big): matches of `little` enclosed by a
    * `big` match (r15 — the remaining span family members, each the
    * ES-documented intervals migration). */
  final case class SWithin(little: Span, big: Span) extends Span
  /** span_containing(big, little): matches of `big` that enclose a
    * `little` match. */
  final case class SContaining(big: Span, little: Span) extends Span
  /** span_multi over a prefix (multi-term query wrapped as a span —
    * prefix and wildcard are the rewrites Lucene's SpanMultiTermQuery
    * supports that intervals express directly). */
  final case class SMultiPrefix(prefix: String) extends Span
  final case class SMultiWildcard(pattern: String) extends Span

  /** The executable ES-documented span → intervals mapping. */
  def toIntervals(s: Span): Node = s match {
    case STerm(t) => IMatch(Seq(t))
    case SNear(cs, slop, inOrder) =>
      require(cs.nonEmpty, "span_near needs at least one clause")
      IAllOf(cs.map(toIntervals), ordered = inOrder, maxGaps = slop)
    case SOr(cs) =>
      require(cs.nonEmpty, "span_or needs at least one clause")
      IAnyOf(cs.map(toIntervals))
    case SNot(inc, exc, pre, post) =>
      IFilter(toIntervals(inc), "not_overlapping",
        IExpand(toIntervals(exc), pre, post))
    case SWithin(little, big) =>
      IFilter(toIntervals(little), "contained_by", toIntervals(big))
    case SContaining(big, little) =>
      IFilter(toIntervals(big), "containing", toIntervals(little))
    case SMultiPrefix(p) => IPrefix(p)
    case SMultiWildcard(w) => IWildcard(w)
  }

  /** Docs ranked by minimal-interval count for the span query —
    * [[IntervalsAst.intervalsAstQuery]] over the compiled tree. */
  def spanSearch(docs: DataFrame, span: Span, k: Int): DataFrame =
    IntervalsAst.intervalsAstQuery(docs, toIntervals(span), k)

  /** The generated DuckDB oracle — same compiled tree. */
  def oracleSql(span: Span, k: Int): String =
    IntervalsAst.oracleSql(toIntervals(span), k)
}
