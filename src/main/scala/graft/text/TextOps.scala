package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language ID,
  * document fingerprinting. All are pure column expressions (whole-stage
  * codegen, no UDFs), so they stream through a 100 TB scan without state.
  *
  * Determinism: every ratio is a single IEEE division of exact integer
  * counts, so results are bit-identical across engines and partitionings.
  */
object TextOps {

  /** Languages scored by stopword hits; CJK detected by codepoint class. */
  val stopwords: Map[String, String] = Map(
    "en" -> "the|and|of|to|in|is|a",
    "de" -> "der|die|das|und|ist|ein",
    "fr" -> "le|la|les|et|est|un",
    "es" -> "el|los|las|es|y|una")

  private def hits(c: Column, pattern: String): Column =
    size(regexp_extract_all(lower(c), lit(pattern), lit(0))).cast("long")

  private def stopHits(c: Column, lang: String): Column =
    hits(c, "\\b(" + stopwords(lang) + ")\\b")

  /** Whitespace tokens, wordlike regex tokens, and a BPE-ish length/4
    * estimate (the classic chars-per-token heuristic). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(split(col("text"), "\\s+")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9']+"), lit(0))).cast("long").as("n_word_tokens"),
      ceil(length(col("text")) / lit(4.0)).cast("long").as("est_bpe_tokens"))

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * token length, and a composite score in [0,1]. */
  def quality(docs: DataFrame): DataFrame = {
    val nChars = length(col("text")).cast("long")
    val nTokens = size(split(col("text"), "\\s+")).cast("long")
    val stop = hits(col("text"), "\\b(the|a|and|of|to|in|is|for|on|with)\\b")
    val punct = size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("long")
    val alpha = length(regexp_replace(col("text"), "[^a-zA-Z0-9]", "")).cast("long")
    docs.select(col("doc_id"), nChars.as("n_chars"), nTokens.as("n_tokens"),
        stop.as("stop_hits"), punct.as("punct_hits"), alpha.as("n_alnum"))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .withColumn("punct_ratio", col("punct_hits").cast("double") / col("n_chars"))
      .withColumn("mean_token_len", col("n_alnum").cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens") / lit(100.0)) *
          (lit(1.0) - col("punct_ratio")) * (lit(0.5) + lit(0.5) * col("stop_ratio")))
  }

  /** Language ID: per-language stopword scores + CJK codepoint count,
    * deterministic priority argmax (zh > en > de > fr > es on ties). */
  def langId(docs: DataFrame): DataFrame = {
    val zh = size(regexp_extract_all(col("text"), lit("[\\x{4e00}-\\x{9fff}]"), lit(0))).cast("long")
    docs.select(col("doc_id"),
        stopHits(col("text"), "en").as("s_en"), stopHits(col("text"), "de").as("s_de"),
        stopHits(col("text"), "fr").as("s_fr"), stopHits(col("text"), "es").as("s_es"),
        zh.as("s_zh"))
      .withColumn("lang_pred",
        when(col("s_zh") > 0, "zh")
          .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") && col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es"))
  }

  /** OpenRefine-style fingerprint: md5 of the sorted distinct token set —
    * a deterministic near-dup clustering key (word-order/multiplicity
    * insensitive). */
  def fingerprintCol(textCol: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(lower(textCol), "\\s+")))))

  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprintCol(col("text")).as("fingerprint"),
      size(array_distinct(split(lower(col("text")), "\\s+"))).cast("long").as("n_distinct_tokens"))

  /** ES match query: OR'd query terms scored by term frequency over the
    * token stream, top-k by score (tie → doc_id) — the relevance-ranked
    * text search the reference's sink serves. A single narrow scan per
    * doc plus a driver-bounded top-k; no shuffle of the corpus. */
  def matchQuery(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val toks = split(lower(col("text")), "\\s+")
    val termArr = typedlit(terms)
    docs
      .select(col("doc_id"),
        size(filter(toks, t => array_contains(termArr, t))).cast("long").as("score"),
        size(toks).cast("long").as("n_tokens"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Corpus-level term frequencies, top-k by count (tie → term order):
    * the explode feeds a map-side-combinable hash aggregation, so at
    * 100 TB the shuffle carries one partial count per (partition,
    * distinct term), not one row per token occurrence. */
  def topTerms(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)
}
