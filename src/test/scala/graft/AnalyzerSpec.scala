package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** ES analyzer chain (r20 — VERDICT r19 #6): stem → synonym token map.
  * Pins the three compiles of the one rule set against each other —
  * the driver-side Scala reference (`analyzeTerm`, which analyzes the
  * query string and generates the oracle), the Column expression
  * (`analyzedTokens`, the corpus side), and, via Verify's hash gate,
  * the generated DuckDB CASE ladder — and proves the chain is
  * LOAD-BEARING in both directions (stemming conflates query-side
  * inflections; the synonym map canonicalizes corpus-side tokens). */
class AnalyzerSpec extends SparkSpec {

  test("Column analyzer == Scala reference over the corpus vocabulary " +
      "plus crafted inflections (every stem rule exercised)") {
    import spark.implicits._
    // corpus vocabulary (closed set) + one word per stem rule + guards
    val corpusVocab = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct()
      .collect().map(_.getString(0)).toSeq
    val crafted = Seq("flies", "quickly", "sorting", "pressed", "class",
      "miss", "tables", "merges", "keys", "ies", "ly", "ed", "ss", "s",
      "us", "is", "big", "fast", "slow", "agg", "dup", "merge")
    val words = (corpusVocab ++ crafted).distinct
    val got = words.map(w => (w, "")).toDF("w", "pad")
      .select(col("w"),
        element_at(TextOps.analyzedTokens(col("w")), 1).as("a"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach { w =>
      assert(got(w) == TextOps.analyzeTerm(w),
        s"column analyzer diverges from reference on '$w': " +
          s"${got(w)} != ${TextOps.analyzeTerm(w)}")
    }
    // the crafted set exercises every rule: spot-pin the table
    assert(TextOps.analyzeTerm("flies") == "fly")
    assert(TextOps.analyzeTerm("quickly") == "quick")
    assert(TextOps.analyzeTerm("sorting") == "sort")
    assert(TextOps.analyzeTerm("pressed") == "press")
    assert(TextOps.analyzeTerm("class") == "class") // -ss guard
    assert(TextOps.analyzeTerm("tables") == "table")
    assert(TextOps.analyzeTerm("ies") == "ies") // min-length guards
    assert(TextOps.analyzeTerm("merges") == "join") // stem THEN synonym
    assert(TextOps.analyzeTerm("big") == "large")
  }

  test("the chain is load-bearing in both directions (fixture + wired corpus)") {
    import spark.implicits._
    val fx = Seq(
      (1L, "merge batch"), // matches query 'joins' only via stem+synonym
      (2L, "join row"), // matches 'joins' via stem alone
      (3L, "scan column") // matches nothing in the query
    ).toDF("doc_id", "text")
    val hits = TextOps.analyzerSearch(fx, "joins")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L, 2L -> 1L),
      s"chain must conflate merges/joins/merge/join, got $hits")
    // raw-token control: no raw token of doc 1 equals any raw query token
    assert(!fx.filter(col("doc_id") === 1L)
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .collect().map(_.getString(0)).contains("joins"))
    // wired corpus: at least one doc matches a canonical term ONLY via
    // the synonym map (contains 'merge' but not 'join') — the filter
    // changes the wired query's answer at this verify SF
    val docs = Tables.documents(spark, sfDir)
    val synOnly = docs.filter(col("text").rlike("\\bmerge\\b") &&
      !col("text").rlike("\\bjoin\\b")).count()
    assert(synOnly > 0, "corpus must exercise the synonym-only path")
    // and the wired query itself is non-vacuous with a full score range
    val wired = TextOps.analyzerSearch(docs,
      "merges big tables quickly sorting").collect()
    assert(wired.nonEmpty)
    assert(wired.map(_.getLong(1)).max >= 2, "multi-term matches expected")
  }
}
