package graft.text

/** ES query_string / simple_query_string parser: the `q=` mini-language
  * users type into Kibana, compiled onto the [[BoolDsl]] AST (one
  * parse, one Column predicate + score — the same single-scan execution
  * every bool tree gets). Supported subset, matching the ES grammar
  * where it is deterministic:
  *
  *  - bare `term` → full-text match on `text` (MatchQ, tf-scored)
  *  - `field:value` → keyword term query (TermQ)
  *  - `field:prefix*` → keyword prefix query (PrefixQ)
  *  - `field:>=N` `:>N` `:<=N` `:<N` → numeric range (RangeQ; `>N`
  *    becomes `>= nextUp` only for integers via N+1 — the synthetic
  *    numeric fields are integral, documented)
  *  - `AND` / `OR` / `NOT` with standard precedence (NOT > AND > OR),
  *    parentheses; bare juxtaposition = the default operator OR with
  *    minimum_should_match=1 (the ES query_string default). Pure
  *    negative clauses at the OR level apply conjunctively (`a NOT b`
  *    ≡ `a AND NOT b`) — Lucene's BooleanQuery has no OR-NOT
  *  - leading `-` = NOT (the simple_query_string spelling), including
  *    `-(...)` group negation; a bare dash is rejected
  *  - `+` / `|` = the simple_query_string infix spellings of AND / OR
  *    (whitespace-optional — `foo|bar` tokenizes like `foo | bar`);
  *    a dangling operator is rejected, not silently matched as a term
  *
  * Out of scope (documented, not silently wrong): quoted phrases,
  * fuzziness suffixes, boosts (`^2`), wildcards mid-token, and regex
  * literals — each exists as a standalone operator
  * (phraseMatch/fuzzySearch/multiMatch/wildcardSearch) and would
  * compile onto those the same way.
  */
object QueryString {

  import BoolDsl._

  /** Fields treated as numeric for range atoms; everything else is a
    * keyword string field. */
  private val numericFields = Set("n_chars", "doc_id", "value", "user_id", "event_id")

  def parse(q: String): Query = {
    val toks = tokenize(q)
    val (tree, rest) = parseOr(toks)
    require(rest.isEmpty, s"dangling input after query: ${rest.mkString(" ")}")
    tree
  }

  private def tokenize(q: String): List[String] = {
    val spaced = q.replace("(", " ( ").replace(")", " ) ")
    spaced.split("\\s+").filter(_.nonEmpty).toList.flatMap(splitOps)
  }

  /** The simple_query_string '+'/'|' spellings inside a raw token are
    * operators only when EVERY occurrence has a nonempty operand on
    * both sides (`hash|join` → hash OR join). A token where any side
    * is empty is a literal term (`tag:c++`, `a+`), restoring the
    * pre-r14 parse for terms that merely contain these characters
    * (r14 ADVICE: global spacing made 'tag:c++' throw). Standalone
    * whitespace-delimited '+'/'|' are always operators. */
  private def splitOps(tok: String): List[String] =
    if (tok.length <= 1 || !tok.exists(c => c == '+' || c == '|')) List(tok)
    else {
      val segs = tok.split("[+|]", -1)
      if (segs.exists(_.isEmpty)) List(tok) // literal: c++, +x, a+|b
      else {
        val ops = tok.filter(c => c == '+' || c == '|').toList
        segs.head :: ops.zip(segs.tail).flatMap { case (op, s) =>
          List(op.toString, s) }
      }
    }

  /** A clause that is nothing but negation (`NOT x` / `-x`). In a
    * Lucene BooleanQuery a NOT clause is always conjunctive — there is
    * no OR-NOT — so at the OR level these apply as must_not over the
    * whole level, never as a should option ('a NOT b' ≡ a AND NOT b,
    * the ES/Lucene query_string reading; r12 ADVICE). */
  private def isPureNegative(q: Query): Boolean = q match {
    case b: Bool => b.must.isEmpty && b.should.isEmpty && b.filter.isEmpty &&
      b.mustNot.nonEmpty
    case _ => false
  }

  // OR level: a OR b, and bare juxtaposition (the ES default operator)
  private def parseOr(toks: List[String]): (Query, List[String]) = {
    val (first, rest0) = parseAnd(toks)
    var parts = List(first)
    var rest = rest0
    var continue = true
    while (continue) rest match {
      case op :: tail if op == "OR" || op == "|" =>
        val (nxt, r) = parseAnd(tail)
        parts = nxt :: parts; rest = r
      case tok :: _ if tok != ")" && tok != "AND" && tok != "OR" &&
          tok != "+" && tok != "|" =>
        // juxtaposition → default operator OR
        val (nxt, r) = parseAnd(rest)
        parts = nxt :: parts; rest = r
      case _ => continue = false
    }
    val (negs, pos) = parts.reverse.partition(isPureNegative)
    val nots = negs.collect { case b: Bool => b.mustNot }.flatten
    val q = (pos, nots) match {
      case (Seq(one), Nil) => one
      case (Nil, ns)       => Bool(mustNot = ns) // all-negative level
      case (Seq(one), ns)  => Bool(must = Seq(one), mustNot = ns)
      case (ps, ns) =>
        Bool(should = ps, mustNot = ns, minimumShouldMatch = 1)
    }
    (q, rest)
  }

  private def parseAnd(toks: List[String]): (Query, List[String]) = {
    val (first, rest0) = parseUnary(toks)
    var parts = List(first)
    var rest = rest0
    var continue = true
    while (continue) rest match {
      case op :: tail if op == "AND" || op == "+" =>
        val (nxt, r) = parseUnary(tail)
        parts = nxt :: parts; rest = r
      case _ => continue = false
    }
    val q = if (parts.size == 1) parts.head else Bool(must = parts.reverse)
    (q, rest)
  }

  private def parseUnary(toks: List[String]): (Query, List[String]) = toks match {
    case "NOT" :: tail =>
      val (inner, rest) = parseUnary(tail)
      (Bool(mustNot = Seq(inner)), rest)
    case tok :: tail if tok.startsWith("-") && tok.length > 1 =>
      val (inner, rest) = parseUnary(tok.drop(1) :: tail)
      (Bool(mustNot = Seq(inner)), rest)
    case "-" :: "(" :: tail => // tokenizer spaces '(' so '-(x)' lands here
      val (inner, rest) = parseUnary("(" :: tail)
      (Bool(mustNot = Seq(inner)), rest)
    case "-" :: _ =>
      throw new IllegalArgumentException("bare '-' must negate a term or group")
    case "(" :: tail =>
      val (inner, rest) = parseOr(tail)
      rest match {
        case ")" :: r => (inner, r)
        case _ => throw new IllegalArgumentException("unclosed ( in query")
      }
    case tok :: tail => (atom(tok), tail)
    case Nil => throw new IllegalArgumentException("empty query")
  }

  private def atom(tok: String): Query = tok.split(":", 2) match {
    case Array(op) if op == "+" || op == "|" =>
      throw new IllegalArgumentException(s"dangling operator '$op'")
    case Array(term) => MatchQ(term.toLowerCase)
    case Array(field, v) if v.startsWith(">=") => rangeAtom(field, gte = Some(v.drop(2)))
    case Array(field, v) if v.startsWith("<=") => rangeAtom(field, lte = Some(v.drop(2)))
    case Array(field, v) if v.startsWith(">") =>
      rangeAtom(field, gte = Some((v.drop(1).toLong + 1).toString)) // integral fields
    case Array(field, v) if v.startsWith("<") =>
      rangeAtom(field, lte = Some((v.drop(1).toLong - 1).toString))
    case Array(field, v) if v.endsWith("*") => PrefixQ(field, v.dropRight(1))
    case Array(field, v) => TermQ(field, v)
  }

  private def rangeAtom(field: String, gte: Option[String] = None,
      lte: Option[String] = None): Query = {
    require(numericFields(field), s"range atom on non-numeric field $field")
    RangeQ(field, gte = gte.map(_.toDouble), lte = lte.map(_.toDouble))
  }
}
