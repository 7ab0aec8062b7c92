package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic merges-table BPE token counting (SURVEY §2 round 11 —
  * replaces the chars/4 estimate so `pipe_pack_sequences` budgets are
  * computed from REAL token counts).
  *
  * The merge table is a fixed, priority-ordered artifact — exactly the
  * shape of a published `merges.txt` (GPT-2's tokenizer ships its merge
  * list as a static file; application, not training, is the engine-side
  * operation). Convention: rules apply in priority order, one
  * left-to-right non-overlapping pass per rule (leftmost-first — the
  * standard greedy convention), over the word alphabet `[a-z0-9']`.
  *
  * Execution trick that keeps BOTH engines exact and fast: every token
  * (base char or merged) is assigned a single-character SYMBOL, so a
  * merge is a 2-char → 1-char `replace` on a plain string — no arrays,
  * no loops, no UDFs; a chain of `replace` calls IS the merge loop, and
  * the final token count is just `length()`. `replace`'s left-to-right
  * non-overlapping scan is identical in Spark and DuckDB, so the oracle
  * replays the loop verbatim from the same generated rule list
  * ([[tokenCountSql]] — the geohashSql "generated from one source"
  * pattern). Symbols are drawn outside the input alphabet (uppercase +
  * accented capitals), so a rule can never re-match its own output.
  */
object Bpe {

  /** The merges table, priority-ordered; every side is a token produced
    * by earlier rules (or a base char) — the defining BPE property. */
  val mergeTokens: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
    ("e", "n"), ("o", "r"), ("e", "s"), ("s", "t"), ("a", "r"),
    ("o", "u"), ("l", "l"), ("c", "o"), ("s", "e"), ("l", "e"),
    ("d", "e"), ("m", "e"), ("t", "o"), ("i", "s"), ("e", "d"),
    ("a", "l"), ("t", "i"), ("ti", "on"), ("u", "n"), ("w", "h"),
    ("c", "h"), ("f", "o"), ("fo", "r"), ("w", "i"), ("wi", "th"),
    ("b", "e"), ("h", "a"), ("p", "e"), ("er", "s"), ("q", "u"))

  /** Symbol alphabet for merged tokens: single BMP chars outside
    * `[a-z0-9']` (uppercase + Latin-1 capitals), one per rule. */
  private val symbols: String = "ABCDEFGHIJKLMNOPQRSTUVWXYZÀÁÂÃÄÅÆÇÈÉÊËÌÍÎÏ"

  /** (2-char pattern, 1-char replacement) per rule, in priority order. */
  val compiled: Seq[(String, String)] = {
    require(mergeTokens.size <= symbols.length, "extend the symbol alphabet")
    val sym = scala.collection.mutable.Map[String, String]()
    mergeTokens.zipWithIndex.map { case ((a, b), i) =>
      def of(t: String): String =
        if (t.length == 1) t
        else sym.getOrElse(t, sys.error(s"merge ($a,$b): '$t' not yet produced"))
      val rule = (of(a) + of(b), symbols(i).toString)
      sym(a + b) = rule._2
      rule
    }
  }

  /** symbol char → the token string it stands for (base chars map to
    * themselves) — for decoding in [[tokenize]]. */
  val symbolToken: Map[String, String] = {
    val m = scala.collection.mutable.Map[String, String]()
    mergeTokens.zipWithIndex.foreach { case ((a, b), i) =>
      def tok(s: String) = m.getOrElse(s, s)
      m(symbols(i).toString) = tok(a) + tok(b)
    }
    m.toMap
  }

  private val wordPattern = "[a-z0-9']+"

  /** Everything that is NOT a token character after merging: words are
    * `[a-z0-9']`, merged tokens are single symbol chars. No regex
    * metacharacters appear in either set. */
  private val nonTokenClass = "[^a-z0-9'" + symbols.take(mergeTokens.size) + "]"

  /** The merge loop over one (already-lowercased, in-alphabet) word. */
  private def mergeWord(w: Column): Column =
    compiled.foldLeft(w) { case (acc, (pat, sym)) =>
      replace(acc, lit(pat), lit(sym))
    }

  /** Per-document BPE token count (word tokens only — the
    * `n_word_tokens` convention; punctuation/whitespace don't count).
    *
    * Runs the replace chain over the WHOLE lowercased text at once,
    * not per word: merge patterns contain only word-alphabet chars and
    * words are maximal `[a-z0-9']` runs, so a pattern can never span a
    * word boundary — whole-text merging is exactly per-word merging
    * (the `tokenCount == size(tokenize)` spec pins the equivalence)
    * while skipping the per-word array materialization, which measured
    * ~4× of the operator's cost at sf0.1. The count is then one strip
    * of non-token chars + length. */
  def tokenCount(textCol: Column): Column =
    length(regexp_replace(mergeWord(lower(textCol)), nonTokenClass, ""))
      .cast("long")

  /** Per-document token strings (flattened across words), for specs and
    * downstream consumers that need the pieces, not just the count. */
  def tokenize(textCol: Column): Column = {
    val decode = typedLit(
      ((('a' to 'z') ++ ('0' to '9') :+ '\'').map(c => c.toString -> c.toString)
        ++ symbolToken.toSeq).toMap)
    flatten(transform(
      regexp_extract_all(lower(textCol), lit(wordPattern), lit(0)),
      w => transform(split(mergeWord(w), ""), c => element_at(decode, c))))
  }

  /** The identical merge loop as a DuckDB SQL expression over
    * `wordExpr` (generated from [[compiled]], so the engines cannot
    * drift). */
  def mergeWordSql(wordExpr: String): String =
    compiled.foldLeft(wordExpr) { case (acc, (pat, sym)) =>
      s"replace($acc, '$pat', '$sym')"
    }

  /** Per-document token count through the large-vocab kernel
    * ([[BpeTokenCount]]): merge table broadcast once per executor,
    * classic priority-merge loop per word. Use past a few hundred
    * rules, where the replace-chain form's per-rule cost takes over
    * (SCALING.md round-12 probe); equal to [[tokenCount]] for any
    * well-formed table (`BpeMergeSpec`). */
  def tokenCountLargeVocab(spark: org.apache.spark.sql.SparkSession,
      textCol: Column, merges: Seq[(String, String)] = mergeTokens): Column = {
    import org.apache.spark.sql.graftglue.Glue
    val bc = spark.sparkContext.broadcast(merges.toArray)
    Glue.column(BpeTokenCount(Glue.expression(textCol), bc)) // kernel lowercases
  }

  /** Per-document token count as DuckDB SQL over a text column — the
    * same whole-text replace chain + non-token strip as [[tokenCount]]. */
  def tokenCountSql(textExpr: String): String = {
    val cls = nonTokenClass.replace("'", "''")
    s"CAST(length(regexp_replace(${mergeWordSql(s"lower($textExpr)")}, '$cls', '', 'g')) AS BIGINT)"
  }

  /** Generated DuckDB replay of the token-frequency profile: merged
    * text → strip non-token chars → per-CHAR unnest (every token is
    * one symbol char by construction) → decode symbols back to token
    * strings via a generated CASE over [[symbolToken]]. Counting
    * characters of the merged text IS counting tokens — the symbol
    * encoding makes the unigram profile a string-length problem. */
  def vocabFreqSql(textExpr: String): String = {
    val cls = nonTokenClass.replace("'", "''")
    val whens = symbolToken.toSeq.sortBy(_._1)
      .map { case (s, t) => s"WHEN '$s' THEN '${t.replace("'", "''")}'" }
      .mkString(" ")
    s"""WITH m AS (SELECT regexp_replace(${mergeWordSql(s"lower($textExpr)")}, '$cls', '', 'g') AS s FROM documents),
       |c AS (SELECT unnest(string_split(s, '')) AS ch FROM m WHERE s <> '')
       |SELECT CASE ch $whens ELSE ch END AS token,
       |       CAST(count(*) AS BIGINT) AS n
       |FROM c GROUP BY 1""".stripMargin
  }

  /** Distributed BPE merge TRAINING (r15) — the other half of the
    * tokenizer story: [[mergeTokens]] is the shape of a published
    * merges.txt, and this LEARNS one from the corpus (Sennrich's
    * algorithm, the vocab-induction step every training pipeline runs
    * before it can count a token):
    *
    *  1. ONE corpus pass builds the (word, count) table — after that,
    *     every iteration works on the VOCAB (distinct words), which is
    *     orders of magnitude smaller than the corpus at any scale (the
    *     reason BPE training is feasible at all);
    *  2. per iteration: adjacent symbol-pair counts weighted by word
    *     count (overlapping positions count, the reference
    *     `get_stats` convention) → the winner by (count desc, pair
    *     asc) is a 1-row TakeOrdered — bounded driver metadata;
    *  3. the merge applies as the same 2-char → 1-symbol `replace`
    *     the application side uses (leftmost non-overlapping;
    *     injective, since the symbol char is fresh — distinct words
    *     stay distinct, so no re-aggregation);
    *  4. merges accumulate as a LAZY replace chain over the one
    *     checkpointed vocab (r22, guide §2.4): unlike the
    *     label-propagation loop — whose per-round SELF-JOIN lineage
    *     grows exponentially without truncation — the merge apply is a
    *     linear chain of narrow `replace` expressions, so
    *     checkpointing it per round bought nothing and cost one
    *     eager vocab job per merge (the round-i argmax re-evaluates i
    *     replaces over the vocab instead: k²/2 cheap string ops on
    *     VOCAB-sized data vs k extra jobs — at any corpus scale the
    *     vocab is the small side, that trade only widens). Each round
    *     is now exactly ONE Spark job (the 1-row TakeOrdered argmax);
    *     the learned sequence is unchanged because round i's argmax
    *     input — the replace chain of merges 1..i−1 applied to the
    *     base vocab — is the same values the checkpointed frame held.
    *
    * Determinism: the tie-break orders on the current symbol-string
    * pair, and symbols are assigned in learned order — same corpus,
    * same merges, any engine/partitioning. Not SQL-expressible (an
    * iterative argmax loop) → rows-only gate + an exact
    * naive-recompute spec in `BpeMergeSpec`. Output: (rank, left,
    * right, pair_count) with sides DECODED to token strings — every
    * side is a base char or a previously-produced token, the defining
    * BPE property (spec-pinned). */
  def trainMerges(docs: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1 && k <= symbols.length, s"k=$k beyond the symbol alphabet")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z0-9']+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val symToTok = scala.collection.mutable.Map[Char, String]()
    def tokOf(c: Char): String = symToTok.getOrElse(c, c.toString)
    val learned = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var exhausted = false
    for (i <- 0 until k if !exhausted) {
      val top = words
        .filter(length(col("w")) >= 2)
        .select(col("cnt"),
          explode(transform(sequence(lit(1), length(col("w")) - 1),
            j => col("w").substr(j, lit(2)))).as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val best = top(0).getString(0)
        val symc = symbols(i)
        symToTok(symc) = tokOf(best(0)) + tokOf(best(1))
        learned += ((i + 1L, tokOf(best(0)), tokOf(best(1)), top(0).getLong(1)))
        words = words
          .withColumn("w", replace(col("w"), lit(best), lit(symc.toString)))
      }
    }
    learned.toSeq.toDF("rank", "left", "right", "pair_count")
  }
}
