package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

class PipelineSpec extends SparkSpec {

  test("wordNgrams slides over whitespace tokens") {
    val df = spark.range(1).select(lit("a b c d e").as("text"))
    val got = df.select(Pipeline.wordNgrams(col("text"), 3).as("g"))
      .head().getSeq[String](0)
    assert(got == Seq("a b c", "b c d", "c d e"))
    // shorter than n → empty, not negative-size
    val short = df.select(Pipeline.wordNgrams(lit("a b"), 3).as("g"))
      .head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val spark2 = spark; import spark2.implicits._
    val docs = Seq(
      (1L, "bench", "the quick brown fox jumps"),
      (2L, "corpus", "a very quick brown fox indeed"), // shares "quick brown fox"
      (3L, "corpus", "nothing in common here at all"),
      (4L, "corpus", "the quick brown fox jumps again") // shares 2 grams
    ).toDF("doc_id", "source", "text")
    val got = Pipeline.decontaminate(docs, Seq("bench"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet == Set(2L, 4L))
    assert(got(2L) == 1L) // "quick brown fox"
    assert(got(4L) == 3L) // "the quick brown", "quick brown fox", "brown fox jumps"
    // the operator's stated precondition holds on the wired input: doc_id
    // is row-unique in the documents table (duplicate doc_id rows would
    // double-count shared grams — see the scaladoc contract)
    val real = Tables.documents(spark, sfDir)
    assert(real.groupBy("doc_id").count().filter(col("count") > 1).isEmpty)
  }

  test("decontaminateFuzzy: ratios replay naively, the threshold binds " +
      "both ways (r15)") {
    val spark2 = spark; import spark2.implicits._
    val docs = Seq(
      (1L, "bench", "the quick brown fox jumps over the lazy dog today"),
      // 10 words → 8 distinct 3-grams, 7 shared (87.5%) → flagged
      (2L, "corpus", "so the quick brown fox jumps over the lazy dog"),
      // one shared gram of 8 (12.5%) → under a 50% threshold
      (3L, "corpus", "a very quick brown fox went somewhere else entirely now"),
      (4L, "corpus", "nothing in common here at all with anything above")
    ).toDF("doc_id", "source", "text")
    val got = Pipeline.decontaminateFuzzy(docs, Seq("bench"), 3, 50).collect()
    assert(got.map(_.getLong(0)).toSet == Set(2L))
    val r = got.head
    assert(r.getLong(2) == 7L && r.getLong(3) == 8L)
    assert(r.getDouble(4) == 7.0 / 8.0)
    // at a 10% threshold doc 3 crosses too; doc 4 never does
    val loose = Pipeline.decontaminateFuzzy(docs, Seq("bench"), 3, 10)
      .collect().map(_.getLong(0)).toSet
    assert(loose == Set(2L, 3L))
    // naive recompute over the real table agrees
    val real = Tables.documents(spark, sfDir)
    val rows = real.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(t: String, n: Int): Set[String] =
      t.split(" ", -1).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    val bench = rows.filter(r => Set("src0", "src1")(r._2))
      .flatMap(r => grams(r._3, 4)).toSet
    val want = rows.filterNot(r => Set("src0", "src1")(r._2)).flatMap {
      case (id, src, t) =>
        val g = grams(t, 4); val sh = g.count(bench)
        if (g.nonEmpty && sh * 100 >= 10 * g.size) Some(id -> (sh.toLong, g.size.toLong))
        else None
    }.toMap
    val gotReal = Pipeline.decontaminateFuzzy(real, Seq("src0", "src1"), 4, 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(gotReal == want)
  }

  test("temperatureMix: integer ladder replays naively, alpha=0.5 " +
      "flattens proportions, budget binds (r15)") {
    val real = Tables.documents(spark, sfDir)
    val got = Pipeline.temperatureMix(real, 200L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // naive replay of the whole ladder from the raw table
    val rows = real.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nBySrc = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val w = nBySrc.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble) * 1048576.0).toLong).toMap
    val bigW = w.values.sum
    def md5hex(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = nBySrc.map { case (src, n) =>
      val target = 200L * w(src) / bigW
      val tCap = math.min(target, n)
      val band = tCap * 16777216L / n
      val thr = f"${band}%06x".takeRight(6)
      val kept = rows.filter(_._2 == src).count { case (id, _) =>
        band >= 16777216L || md5hex(id).substring(0, 6) < thr }
      src -> (n, w(src), target, kept.toLong)
    }
    assert(got == want)
    // the temperature property: the smallest source keeps a strictly
    // larger fraction of itself than the largest (unless capped equal)
    val bySize = got.toSeq.sortBy(_._2._1)
    val (smallN, smallKept) = (bySize.head._2._1, bySize.head._2._4)
    val (bigN, bigKept) = (bySize.last._2._1, bySize.last._2._4)
    if (smallN < bigN && bigKept > 0) {
      assert(smallKept.toDouble / smallN >= bigKept.toDouble / bigN - 1e-9,
        s"alpha=0.5 must not keep small sources at a lower rate: " +
          s"$smallKept/$smallN vs $bigKept/$bigN")
    }
    // total kept respects the budget within per-source rounding slack
    val totalKept = got.values.map(_._4).sum
    val totalDocs = got.values.map(_._1).sum
    assert(totalKept <= math.min(200L + got.size * 2L, totalDocs) + totalDocs / 8,
      s"kept $totalKept far past budget")
  }

  test("lossMaskManifest: spans tile the concat stream and agree with " +
      "packSequences (r15)") {
    val docs = Tables.documents(spark, sfDir)
    val got = Pipeline.lossMaskManifest(docs, 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    // contiguity: each doc starts where the previous ended
    var expectStart = 0L
    got.foreach { case (id, nTok, bin, off, lenIn, over) =>
      val start = bin * 1000L + off
      assert(start == expectStart, s"doc $id starts at $start, want $expectStart")
      expectStart = start + nTok
      // the in-bin span + overflow account for every token exactly
      assert(lenIn == math.min(nTok, 1000L - off))
      assert(over == math.max(0L, off + nTok - 1000L))
      assert(lenIn + over == nTok || off + nTok <= 1000L)
      assert(off >= 0 && off < 1000L && lenIn >= 0 && over >= 0)
    }
    // bin assignment matches packSequences' inventory
    val bins = Pipeline.packSequences(docs, 1000L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    val byBin = got.groupBy(_._3)
    assert(byBin.keySet == bins.keySet)
    byBin.foreach { case (b, rows) =>
      assert(rows.length.toLong == bins(b)._1)
      assert(rows.map(_._1).min == bins(b)._2 && rows.map(_._1).max == bins(b)._3)
    }
    // the fixture must exercise the overflow path (some doc crosses a cut)
    assert(got.exists(_._6 > 0), "no doc crosses a bin boundary at this SF")
  }

  test("crossSourceDup: pair counts replay from a naive fingerprint " +
      "self-join (r15)") {
    val real = Tables.documents(spark, sfDir)
    val got = Pipeline.crossSourceDup(real).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty, "fixture must contain cross-source duplicates")
    // naive: fingerprint = sorted distinct lowercase token set
    val fps = real.select("source", "text").collect().map { r =>
      (r.getString(0),
        r.getString(1).toLowerCase.split("\\s+").distinct.sorted.mkString(" "))
    }.distinct
    val bySrcs = fps.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val want = bySrcs.values.filter(_.length >= 2).flatMap { ss =>
      for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want)
    // ordering + asymmetry invariants
    got.keys.foreach { case (a, b) => assert(a < b) }
  }

  test("vocabFreq: piece counts replay from tokenize, totals match " +
      "tokenCount, output is vocab-bounded (r15)") {
    import graft.text.Bpe
    val real = Tables.documents(spark, sfDir)
    val got = Pipeline.vocabFreq(real).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // totals: sum of piece counts == sum of per-doc token counts
    val totalTok = real.select(sum(Bpe.tokenCount(col("text")))).head.getLong(0)
    assert(got.values.sum == totalTok)
    // naive replay from the tokenize column itself
    val want = real.select(Bpe.tokenize(col("text")).as("t")).collect()
      .flatMap(_.getSeq[String](0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == want)
    // vocab bound: base alphabet + one piece per merge rule
    assert(got.keySet.size <= 37 + Bpe.mergeTokens.size)
    // multi-char merged pieces genuinely fire on the corpus
    assert(got.keys.exists(_.length >= 2), "no merged piece fired")
  }

  test("curriculumOrder: stages never interleave, within-stage order is " +
      "the seeded hash, replay agrees (r15)") {
    val real = Tables.documents(spark, sfDir)
    val got = Pipeline.curriculumOrder(real, 7, 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 100)
    // positions are 1..k and stages are non-decreasing along them
    assert(got.map(_._1).sorted.toSeq == (1L to 100L))
    val inOrder = got.sortBy(_._1)
    inOrder.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3, "stages must not interleave")
      case _ =>
    }
    // naive replay: stage = popcount of the rule mask from qualityRules
    val mask = Pipeline.qualityRules(real).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = mask.toSeq.map { case (id, m) =>
      (id, java.lang.Long.bitCount(m).toLong, md5hex(s"7:$id")) }
      .sortBy { case (id, st, h) => (st, h, id) }.take(100)
      .zipWithIndex.map { case ((id, st, _), i) => (i + 1L, id, st) }
    assert(inOrder.toSeq == want)
    // widen k past the cleanest stage so the schedule provably crosses
    // a stage boundary (the head-100 can be single-stage at this SF)
    val nStage0 = mask.values.count(m => java.lang.Long.bitCount(m) == 0)
    val k2 = math.min(nStage0 + 10, mask.size)
    val wide = Pipeline.curriculumOrder(real, 7, k2).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(wide.map(_._2).distinct.length > 1, "schedule never staged")
    assert(wide.take(nStage0).forall(_._2 == 0L),
      "clean docs must fill the schedule head")
  }

  test("lmScore: per-bigram nll replays through the DetLn replica; " +
      "reference text scores lower than gibberish (r15)") {
    val spark2 = spark; import spark2.implicits._
    import graft.util.DetLn
    val crafted = Seq(
      (1L, "ref", "the cat sat on the mat and the cat sat again"),
      (2L, "corpus", "the cat sat on the mat"),       // in-distribution
      (3L, "corpus", "zq xv qqq zzz vvv xxx www yyy") // all-OOV gibberish
    ).toDF("doc_id", "source", "text")
    val got = Pipeline.lmScore(crafted, Seq("ref")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // naive replay with the plain-Scala DetLn replica
    val refToks = "the cat sat on the mat and the cat sat again".split(" ").toSeq
    val c1 = refToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c12 = refToks.sliding(2).toSeq.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val v = c1.size.toLong
    def nllFp(w1: String, w2: String): Long = {
      val arg = (c1.getOrElse(w1, 0L) + v).toDouble /
        (c12.getOrElse(Seq(w1, w2), 0L) + 1L).toDouble
      math.floor(DetLn.lnScala(arg) * 1.0e9).toLong
    }
    def docFp(text: String): (Long, Long) = {
      val pairs = text.split(" ").toSeq.sliding(2).filter(_.length == 2).toSeq
      (pairs.length.toLong, pairs.map(p => nllFp(p(0), p(1))).sum)
    }
    Seq(2L -> "the cat sat on the mat",
        3L -> "zq xv qqq zzz vvv xxx www yyy").foreach { case (id, t) =>
      val (n, fp) = docFp(t)
      assert(got(id)._1 == n, s"doc $id n_bigrams")
      assert(got(id)._2 == fp, s"doc $id nll_fp")
      assert(got(id)._3 == (fp.toDouble / 1.0e9) / n.toDouble, s"doc $id avg")
    }
    // the filter's point: in-distribution text scores well below gibberish
    assert(got(2L)._3 < got(3L)._3,
      s"in-distribution ${got(2L)._3} must be < gibberish ${got(3L)._3}")
    // real-table smoke: every doc with >= 2 tokens scores, values finite
    val real = Pipeline.lmScore(Tables.documents(spark, sfDir),
      Seq("src0", "src1")).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getLong(2) > 0 && !r.getDouble(3).isNaN))
  }

  test("importanceResample: weights and bands replay naively via BigInt, " +
      "acceptance is the md5 band, target-like text out-bands gibberish (r18)") {
    val spark2 = spark; import spark2.implicits._
    val crafted = Seq(
      (1L, "ref", "the cat sat on the mat and the cat sat again"),
      (2L, "corpus", "the cat sat on the mat"),        // in-distribution
      (3L, "corpus", "zq xv qqq zzz vvv xxx www yyy"), // all-OOV
      (4L, "corpus", "the cat zq xv")                  // mixed
    ).toDF("doc_id", "source", "text")
    val got = Pipeline.importanceResample(crafted, Seq("ref"), lambdaInv = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // naive replay (BigInt arithmetic, scala md5)
    val refToks = "the cat sat on the mat and the cat sat again".split(" ").toSeq
    val corpusTexts = Map(
      2L -> "the cat sat on the mat",
      3L -> "zq xv qqq zzz vvv xxx www yyy",
      4L -> "the cat zq xv")
    val allToks = refToks ++ corpusTexts.values.flatMap(_.split(" "))
    val ct = refToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tT = BigInt(refToks.size)
    val tA = BigInt(allToks.size)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = corpusTexts.flatMap { case (id, text) =>
      val toks = text.split(" ").toSeq
      val num = BigInt(toks.map(w => ct.getOrElse(w, 0L) + 1L).sum)
      val den = BigInt(toks.map(w => ca.getOrElse(w, 0L) + 1L).sum)
      val band =
        if (num * tA >= den * tT * 2) BigInt(16777216)
        else (num * tA * 16777216) / (den * tT * 2)
      val accept = band >= 16777216 ||
        md5hex(id.toString).take(6) < f"${band.toLong}%06x"
      if (accept) Some(id -> (num.toLong, den.toLong, band.toLong)) else None
    }
    assert(got == expect)
    // the selector's point: in-distribution text gets a wider band
    def bandOf(text: String): BigInt = {
      val toks = text.split(" ").toSeq
      val num = BigInt(toks.map(w => ct.getOrElse(w, 0L) + 1L).sum)
      val den = BigInt(toks.map(w => ca.getOrElse(w, 0L) + 1L).sum)
      if (num * tA >= den * tT * 2) BigInt(16777216)
      else (num * tA * 16777216) / (den * tT * 2)
    }
    assert(bandOf(corpusTexts(2L)) > bandOf(corpusTexts(3L)),
      "in-distribution band must exceed the OOV band")
    // real-table smoke: only non-target docs, bands in range, and the
    // rejected complement is exactly the docs whose md5 prefix clears
    // the band (re-derivable from the emitted band)
    val real = Pipeline.importanceResample(Tables.documents(spark, sfDir),
      Seq("src0", "src1")).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val band = r.getLong(3)
      assert(band >= 0L && band <= 16777216L)
      assert(band >= 16777216L ||
        md5hex(r.getLong(0).toString).take(6) < f"$band%06x")
    }
    val targetIds = Tables.documents(spark, sfDir)
      .filter(col("source").isin("src0", "src1"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(real.forall(r => !targetIds(r.getLong(0))),
      "target-source docs must never appear in the resampled output")
  }

  test("dedupCascadeReport: stage accounting chains exactly and each " +
      "stage's count replays from its standalone operator (r18)") {
    import graft.text.TextOps
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val got = Pipeline.dedupCascadeReport(docs, emb).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == Set("1_exact", "2_fuzzy", "3_semantic"))
    // accounting: in − removed = out, and stages chain
    got.values.foreach { case (in, rem, out) => assert(in - rem == out) }
    assert(got("1_exact")._3 == got("2_fuzzy")._1)
    assert(got("2_fuzzy")._3 == got("3_semantic")._1)
    // stage 1 replays from the fingerprint operator
    val nAll = docs.count()
    val nKeep = docs.select(TextOps.fingerprintCol(col("text")).as("fp"))
      .distinct().count()
    assert(got("1_exact") == ((nAll, nAll - nKeep, nKeep)))
    // stage 2 replays from ngramJaccard over the exact survivors
    val keepers = docs
      .select(col("doc_id"), col("text"), TextOps.fingerprintCol(col("text")).as("fp"))
      .withColumn("keep", col("doc_id") === min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("keep")).select("doc_id", "text")
    val fzRemoved = Dedup.ngramJaccard(keepers, 3, 0.8)
      .select("b_id").distinct().count()
    assert(got("2_fuzzy")._2 == fzRemoved)
    // stage 3 replays from semDedup over the fuzzy survivors
    val s2 = keepers.select("doc_id")
      .join(Dedup.ngramJaccard(keepers, 3, 0.8)
        .select(col("b_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    val semRemoved = Pipeline.semDedup(
      emb.join(s2.select(col("doc_id").as("vec_id")), Seq("vec_id")), 8, 0.4)
      .count()
    assert(got("3_semantic")._2 == semRemoved)
    // the cascade is non-vacuous at this SF: every stage removes
    assert(got.values.forall(_._2 > 0),
      s"a stage removed nothing: $got")
  }

  test("rakeKeywords: the textbook example scores exactly; repeated " +
      "phrases keep their single-occurrence score; real-table replay (r18)") {
    import graft.text.TextOps
    val spark2 = spark; import spark2.implicits._
    val crafted = Seq(
      (1L, "the quick brown fox and the lazy dog"),
      (2L, "quick brown fox and quick brown fox") // repeated candidate
    ).toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(crafted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // doc 1: candidates "quick brown fox" (each word deg 3, freq 1 →
    // 3e6; phrase 9e6) and "lazy dog" (deg 2 → 2e6 each; phrase 4e6)
    val d1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.toSeq == Seq(
      (1L, 1L, "quick brown fox", 9000000L, 1L),
      (1L, 2L, "lazy dog", 4000000L, 1L)))
    // doc 2: the candidate occurs twice — degree 6, freq 2 per word →
    // 3e6 each → phrase 9e6, n_occurrences 2 (same per-occurrence
    // score as doc 1's single occurrence)
    val d2 = got.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 1L, "quick brown fox", 9000000L, 2L)))
    // real-table replay: full naive RAKE over every doc
    val stops = TextOps.rakeStops.toSet
    val real = TextOps.rakeKeywords(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, text) =>
      val tk = text.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).toSeq
      val phrases = tk.map(t => if (stops(t)) "|" else t).mkString(" ")
        .split("\\|").map(_.trim).filter(_.nonEmpty).toSeq
      if (phrases.isEmpty) Nil
      else {
        val wordRows = phrases.flatMap { p =>
          val ws = p.split(" ").toSeq; ws.map(w => (w, ws.size.toLong)) }
        val deg = wordRows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val frq = wordRows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        def wfp(w: String) = deg(w) * 1000000L / frq(w)
        val perPhrase = phrases.groupBy(identity).toSeq.map { case (p, os) =>
          (p, p.split(" ").map(wfp).sum, os.size.toLong) }
        perPhrase.sortBy { case (p, s, _) => (-s, p) }.take(3).zipWithIndex
          .map { case ((p, s, n), i) => (id, i + 1L) -> (p, s, n) }
      }
    }.toMap
    assert(real == expect)
  }

  test("qualityClassifier: scores replay naively (md5 bucket, frozen " +
      "fixed-point weights, unigram+bigram features); threshold binds " +
      "both ways (r18)") {
    val got = Pipeline.qualityClassifier(Tables.documents(spark, sfDir))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toMap
    val w = {
      val rnd = new java.util.Random(424242L)
      IndexedSeq.fill(1024)((rnd.nextInt(1 << 20) - (1 << 19)).toLong)
    }
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def wt(f: String): Long =
      w((java.lang.Long.parseLong(md5hex(f).take(6), 16) % 1024).toInt)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.flatMap { case (id, text) =>
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val feats = tk ++ tk.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      if (feats.isEmpty) None
      else {
        val fp = feats.map(wt).sum
        Some(id -> (feats.size.toLong, fp, fp.toDouble / 1048576.0,
          if (fp > 0) "keep" else "drop"))
      }
    }.toMap
    assert(got == expect)
    // the gate is non-vacuous: both labels occur at this SF
    val labels = got.values.map(_._4).toSet
    assert(labels == Set("keep", "drop"),
      s"expected both labels under the seeded model, got $labels")
  }

  test("qualityClassifierTrain: bucket stats replay naively; the weight " +
      "formula is the exact integer form (r19)") {
    val seed = Tables.documents(spark, sfDir).filter(col("doc_id") % 10 === 0)
    val got = Pipeline.qualityClassifierTrain(seed).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // naive recompute: teacher labels from the frozen classifier, then
    // per-bucket feature-instance counts and the Laplace weight
    val w = {
      val rnd = new java.util.Random(424242L)
      IndexedSeq.fill(1024)((rnd.nextInt(1 << 20) - (1 << 19)).toLong)
    }
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bkt(f: String): Int =
      (java.lang.Long.parseLong(md5hex(f).take(6), 16) % 1024).toInt
    val docs = seed.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    docs.foreach { case (_, text) =>
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val feats = tk ++ tk.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      if (feats.nonEmpty) {
        val pos = feats.map(f => w(bkt(f))).sum > 0
        feats.foreach { f =>
          val b = bkt(f)
          val (p, n) = counts.getOrElse(b, (0L, 0L))
          counts(b) = if (pos) (p + 1, n) else (p, n + 1)
        }
      }
    }
    val expect = counts.map { case (b, (p, n)) =>
      b.toLong -> (p, n, (p + 1) * 1048576L / (p + n + 2) - 524288L) }.toMap
    assert(got == expect && got.nonEmpty)
    // the learned signal is non-vacuous: weights of both signs
    assert(got.values.exists(_._3 > 0) && got.values.exists(_._3 < 0))
  }

  test("train→infer round trip (r19): weights distilled from the frozen " +
      "teacher reproduce its decisions on a crafted fixture") {
    import spark.implicits._
    // single-token docs: the teacher's decision for each doc is exactly
    // the sign of its token's frozen bucket weight, so a faithful
    // student must recover the decision wherever the bucket's evidence
    // is unanimous (hash collisions with conflicting teachers are the
    // only sanctioned disagreement — computed, not assumed)
    val fx = (0 until 300)
      .map(i => (i.toLong, s"tok$i")).toDF("doc_id", "text")
    val teacher = Pipeline.qualityClassifier(fx).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    val stats = Pipeline.qualityClassifierTrain(fx)
    val weights = Pipeline.trainedWeights(stats, 1024)
    val student = Pipeline.qualityClassifierWith(fx, weights).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    // unanimity at the bucket grain, from the fixture itself
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val byBucket = (0 until 300).groupBy(i =>
      (java.lang.Long.parseLong(md5hex(s"tok$i").take(6), 16) % 1024).toInt)
    val unanimous = byBucket.values.filter(ids =>
      ids.map(i => teacher(i.toLong)).toSet.size == 1).flatten.toSet
    assert(unanimous.size >= 250, s"fixture too collided: ${unanimous.size}")
    unanimous.foreach { i =>
      assert(student(i.toLong) == teacher(i.toLong),
        s"doc $i: student ${student(i.toLong)} != teacher ${teacher(i.toLong)}")
    }
    assert(teacher.values.toSet == Set("keep", "drop"),
      "fixture must exercise both teacher labels")
  }

  test("qualityEval (r20 — VERDICT r19 #4): eval of weights trained on a " +
      "separable fixture is PERFECT (fp=fn=0, precision=recall=f1=1); " +
      "the wired split eval is internally consistent") {
    import spark.implicits._
    // class-disjoint vocab: pos docs draw from {alpha..}, neg from
    // {omega..} — no shared features, so (barring md5 bucket collisions
    // ACROSS the two vocabularies, absent for this fixed vocab) every
    // bucket's evidence is pure and the trained sign reproduces the
    // label on every doc
    val fx = ((0 until 40).map(i =>
        (i.toLong, s"alpha bravo charlie delta${i % 4}", 1)) ++
      (40 until 80).map(i =>
        (i.toLong, s"omega sigma lambda kappa${i % 4}", 0)))
      .toDF("doc_id", "text", "pos")
    val labels = fx.select("doc_id", "pos")
    val stats = Pipeline.trainFromLabels(fx.select("doc_id", "text"),
      labels, 1024)
    val weights = Pipeline.trainedWeights(stats, 1024)
    val row = Pipeline.qualityEvalFrom(fx.select("doc_id", "text"),
      weights, labels).collect()(0)
    assert(row.getLong(row.fieldIndex("tp")) == 40, row.toString)
    assert(row.getLong(row.fieldIndex("tn")) == 40, row.toString)
    assert(row.getLong(row.fieldIndex("fp")) == 0, row.toString)
    assert(row.getLong(row.fieldIndex("fn")) == 0, row.toString)
    assert(row.getLong(row.fieldIndex("n_eval")) == 80)
    assert(row.getDouble(row.fieldIndex("prec")) == 1.0)
    assert(row.getDouble(row.fieldIndex("rec")) == 1.0)
    assert(row.getDouble(row.fieldIndex("f1")) == 1.0)
    // the wired held-out eval: one row, counts partition n_eval, ratios
    // in [0,1], and the held-out split is genuinely disjoint from train
    val docs = Tables.documents(spark, sfDir)
    val wired = Pipeline.qualityEval(docs).collect()(0)
    val (tp, fp, fn, tn) = (wired.getLong(0), wired.getLong(1),
      wired.getLong(2), wired.getLong(3))
    assert(tp + fp + fn + tn == wired.getLong(wired.fieldIndex("n_eval")))
    assert(wired.getLong(wired.fieldIndex("n_eval")) ==
      docs.filter(col("doc_id") % 10 === 5).count(),
      "every held-out doc with features must be evaluated exactly once")
    Seq("prec", "rec", "f1").foreach { c =>
      val v = wired.getDouble(wired.fieldIndex(c))
      assert(v >= 0.0 && v <= 1.0, s"$c=$v")
    }
  }

  test("semDedup: pruned set replays naively under the frozen " +
      "assignment; pruning is within-cluster only; keeper rule is " +
      "(max cos, min id) (r18)") {
    val emb = Tables.embeddings(spark, sfDir)
    val (k, tau) = (8, 0.4)
    val got = Pipeline.semDedup(emb, k, tau).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toMap
    // naive replay: frozen assignment by cosine argmax, within-cluster
    // lower-id pairs over tau, (max cos, min id) duplicate pick
    val rows = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = (0 until k).map { i =>
      val rnd = new java.util.Random(90210L + 31L * i)
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    def assign(e: Array[Double]): Int = {
      val sims = cents.map(c => cos(e, c))
      sims.indices.minBy(i => (-sims(i), i)) // first-index-wins argmax
    }
    val byCluster = rows.groupBy(r => assign(r._2))
    val expect = byCluster.toSeq.flatMap { case (cl, members) =>
      members.flatMap { case (id, e) =>
        val dups = members.filter(_._1 < id)
          .map { case (lid, le) => (lid, cos(e, le)) }
          .filter(_._2 > tau)
        if (dups.isEmpty) None
        else {
          val (dupOf, c) = dups.minBy { case (lid, cc) => (-cc, lid) }
          Some(id -> (cl.toLong, dupOf, c, dups.size.toLong))
        }
      }
    }.toMap
    assert(got == expect)
    assert(got.nonEmpty, "tau=0.4 must prune something at this SF")
    // non-vacuous both ways: some docs survive
    assert(got.size < rows.length, "semdedup must not prune everything")
  }

  test("tokenizerFertility: sums replay from per-doc counts, the " +
      "zero-char guard binds (r18)") {
    val spark2 = spark; import spark2.implicits._
    // per-doc replay off the same token-count kernel (the kernel itself
    // is pinned in BpeSpec; this pins the aggregation + division)
    val perDoc = Tables.documents(spark, sfDir)
      .select(col("lang"), col("source"), col("n_chars"),
        graft.text.Bpe.tokenCount(col("text")).as("n_tok"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expect = perDoc.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      val (ch, tk) = (rs.map(_._3).sum, rs.map(_._4).sum)
      k -> (rs.length.toLong, ch, tk,
        if (ch == 0) 0.0 else tk.toDouble / ch.toDouble)
    }
    val got = Pipeline.tokenizerFertility(Tables.documents(spark, sfDir))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got == expect)
    // zero-char guard: an all-empty slice reports fertility 0.0, not NaN
    val crafted = Seq((1L, "", "xx", "s", 0L), (2L, "", "xx", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val g = Pipeline.tokenizerFertility(crafted).collect()
    assert(g.length == 1 && g.head.getDouble(5) == 0.0 &&
      !g.head.getDouble(5).isNaN)
  }

  test("spanCorruption: spans are in-bounds, non-overlapping, ~15% of " +
      "tokens, and a pure function of (doc_id, n_tok) (r15)") {
    import graft.text.Bpe
    val real = Tables.documents(spark, sfDir)
    val got = Pipeline.spanCorruption(real).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val nTok = real.select(col("doc_id"), Bpe.tokenCount(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive replay of the whole placement
    val want = nTok.toSeq.flatMap { case (id, n) =>
      val spans = n / 20
      (0L until spans).map { k =>
        val stratum = n / spans
        val room = math.max(1L, stratum - 2L)
        val jitter = ((id % 2147483647L) * 1103515245L + k * 12345L) % room
        val start = k * stratum + jitter
        (id, k, start, math.min(3L, n - start))
      }
    }.toSet
    assert(got.toSet == want)
    // structural invariants per doc: sorted spans never overlap, all
    // in-bounds, full length, corruption mass ≈ n/20 spans
    got.groupBy(_._1).foreach { case (id, ss) =>
      val n = nTok(id)
      assert(ss.length.toLong == n / 20)
      val sorted = ss.sortBy(_._3)
      sorted.foreach { case (_, _, st, ln) =>
        assert(st >= 0 && st + ln <= n && ln == 3L, s"doc $id span $st")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 <= b._3, s"overlap in doc $id")
        case _ =>
      }
    }
  }

  test("holdoutSplit: disjoint+complete, content-stable, and stable " +
      "under re-partitioning (r15)") {
    val real = Tables.documents(spark, sfDir)
    val got = Pipeline.holdoutSplit(real).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // complete: totals equal the corpus
    assert(got.values.map(_._1).sum == real.count())
    // naive replay of the band rule
    def md5hex(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val rows = real.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = rows.groupBy { case (id, src, _) =>
      val b = md5hex(id).substring(0, 2)
      (if (b < "03") "test" else if (b < "06") "val" else "train", src)
    }.map { case (k, g) => k -> (g.length.toLong, g.map(_._3).sum) }
    assert(got == want)
    // every split is populated at this SF
    assert(Set("train", "val", "test").subsetOf(got.keySet.map(_._1)))
    // partition-invariance: same audit after a violent repartition
    val re = Pipeline.holdoutSplit(real.repartition(17)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(re == got)
  }

  test("contaminationReport: argmax attribution replays naively and " +
      "covers exactly the decontaminate-flagged docs (r15)") {
    val real = Tables.documents(spark, sfDir)
    val got = Pipeline.contaminationReport(real, Seq("src0", "src1"), 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.nonEmpty)
    // attribution rows are exactly the any-overlap flagged docs
    val flagged = Pipeline.decontaminate(real, Seq("src0", "src1"), 4)
      .collect().map(_.getLong(0)).toSet
    assert(got.keySet == flagged)
    // naive argmax replay
    val rows = real.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(t: String): Set[String] =
      t.split(" ", -1).sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
    val bench = rows.filter(r => Set("src0", "src1")(r._2))
      .map(r => r._1 -> grams(r._3))
    rows.filterNot(r => Set("src0", "src1")(r._2)).foreach { case (id, _, t) =>
      val g = grams(t)
      val hits = bench.map { case (bid, bg) => (bid, (g & bg).size.toLong) }
        .filter(_._2 > 0)
      if (hits.nonEmpty) {
        val top = hits.minBy { case (bid, n) => (-n, bid) }
        assert(got(id) == ((top._1, top._2, hits.length.toLong)), s"doc $id")
      } else assert(!got.contains(id))
    }
  }

  test("redact scrubs every PII class and reports pre-scrub counts") {
    val spark2 = spark; import spark2.implicits._
    val docs = Seq(
      (1L, "mail me at a.b+c@sub.example.org or x@y.io thanks"),
      (2L, "call 123-456-7890 and file 987-65-4321 please"),
      (3L, "clean text with numbers 12345 and dashes a-b only"),
      (4L, "dup emails a@b.co a@b.co and phone 555-555-5555")
    ).toDF("doc_id", "text")
    val got = Pipeline.redact(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((2L, 0L, 0L, "mail me at [EMAIL] or [EMAIL] thanks")))
    assert(got(2L) == ((0L, 1L, 1L, "call [PHONE] and file [ID] please")))
    assert(got(3L) == ((0L, 0L, 0L, "clean text with numbers 12345 and dashes a-b only")))
    assert(got(4L) == ((2L, 1L, 0L, "dup emails [EMAIL] [EMAIL] and phone [PHONE]")))
    // no residue: a scrubbed corpus re-scrubs to zero counts
    val again = Pipeline.redact(
      Pipeline.redact(docs).select(col("doc_id"), col("redacted").as("text")))
    assert(again.filter(col("n_emails") + col("n_phones") + col("n_ids") > 0).isEmpty)
  }

  test("releaseManifest: every stage fires on a crafted corpus") {
    val spark2 = spark; import spark2.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val t2 = "a solid piece of writing with the usual words and a few more tokens to pass the gate"
    val t3 = "with the usual words and a few more tokens to pass the gate a solid piece of writing"
    val t4 = "the quick brown fox jumps over the lazy dog and keeps running for a while today"
    val t6 = "please reach me at someone@example.org for more of the details and thanks"
    val docs = Seq(
      (1L, "bench", "the quick brown fox jumps over things"),
      (2L, "web", t2),                  // kept
      (3L, "web", t3),                  // same token set as 2 → deduped
      (4L, "web", t4),                  // shares a 4-gram with bench → dropped
      (5L, "web", "!!! ??? ***"),       // junk → quality-gated
      (6L, "web", t6)                   // kept, 1 email redacted
    ).toDF("doc_id", "source", "text")
    val got = Pipeline.releaseManifest(docs, Seq("bench"), 4, 0.05).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(4),
        r.getString(5)))).toMap
    assert(got.keySet == Set(2L, 6L),
      s"expected exactly docs 2 and 6 to survive, got ${got.keySet}")
    assert(got(2L) == (("web", t2.split("\\s+").length.toLong, 0L, md5hex(t2))))
    val t6Redacted = t6.replace("someone@example.org", "[EMAIL]")
    assert(got(6L) == (("web", t6.split("\\s+").length.toLong, 1L, md5hex(t6Redacted))))
  }

  test("releaseManifestV2: near-dup stage drops what fingerprint dedup cannot") {
    val spark2 = spark; import spark2.implicits._
    val base = "a solid piece of writing with the usual words and a few " +
      "more tokens to pass the gate"
    val near = base + " extra" // J = 16/17 3-gram shingles, but the extra
                               // token changes the fingerprint — invisible
                               // to v1's exact stage, caught by v2's
    val docs = Seq(
      (1L, "bench", "the quick brown fox jumps over things"),
      (2L, "web", base),
      (3L, "web", near),
      (4L, "web", "please reach me at someone@example.org for more of the details and thanks")
    ).toDF("doc_id", "source", "text")
    val v1 = Pipeline.releaseManifest(docs, Seq("bench"), 4, 0.05)
      .collect().map(_.getLong(0)).toSet
    val v2 = Pipeline.releaseManifestV2(docs, Seq("bench"), 4, 0.05)
      .collect().map(_.getLong(0)).toSet
    assert(v1 === Set(2L, 3L, 4L), "v1 must keep the near-dup (different fingerprint)")
    assert(v2 === Set(2L, 4L), "v2 must collapse the near-dup cluster to its keeper")
  }

  test("v2 banding loses nothing vs all-pairs Jaccard on the corpus (oracle precondition)") {
    // the driver oracle replays v2's confirmed-pair set as ALL-PAIRS
    // shingle-Jaccard over the fingerprint keepers; that replay is only
    // exact if the recall-first 16×2 banding catches every ≥τ pair on
    // this data. Candidacy is pairwise and per-doc-deterministic, so
    // completeness over the full corpus implies completeness over any
    // keeper subset.
    import graft.dedup.MinHash
    val docs = Tables.documents(spark, sfDir)
    val confirmed = MinHash.nearDupPairs(docs, 3, 32, 16, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> r.getString(1).split(" ").sliding(3)
        .filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val allPairs = (for {
      i <- sh.indices.iterator; j <- ((i + 1) until sh.length).iterator
      (ida, a) = sh(i); (idb, b) = sh(j)
      inter = (a & b).size
      if inter.toDouble / (a.size + b.size - inter) >= 0.8
    } yield (math.min(ida, idb), math.max(ida, idb))).toSet
    assert(confirmed === allPairs)
    assert(allPairs.nonEmpty, "spec corpus must contain ≥0.8 shingle-Jaccard pairs")
  }

  test("releaseManifestV3: semantic stage drops paraphrases the string stages keep") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val v2 = Pipeline.releaseManifestV2(docs, Seq("src0", "src1"), 4, 0.2)
      .collect().map(_.getLong(0)).toSet
    val v3 = Pipeline.releaseManifestV3(docs, emb, Seq("src0", "src1"), 4, 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(v3.subsetOf(v2), "the semantic stage can only remove docs")
    assert(v3.size < v2.size,
      "the semantic stage must fire: >=1 high-cosine pair among string-stage keepers")
  }

  test("releaseManifestV4: shard deal preserves the v3 manifest and balances the load") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val v3 = Pipeline.releaseManifestV3(docs, emb, Seq("src0", "src1"), 4, 0.2)
      .select("doc_id", "n_tok", "n_redacted").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val v4 = Pipeline.releaseManifestV4(docs, emb, Seq("src0", "src1"), 4, 0.2, 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(v4.keySet == Set(0L, 1L, 2L, 3L))
    // conservation: every v3 doc lands in exactly one shard
    assert(v4.values.map(_._1).sum == v3.length.toLong)
    assert(v4.values.map(_._2).sum == v3.map(_._2).sum)
    assert(v4.values.map(_._3).sum == v3.map(_._3).sum)
    // the round-robin deal replays: rank by (n_tok desc, doc_id) mod 4
    val naive = v3.sortBy { case (id, t, _) => (-t, id) }.zipWithIndex
      .groupBy(_._2 % 4)
      .map { case (sh, rs) => sh.toLong ->
        ((rs.length.toLong, rs.map(_._1._2).sum, rs.map(_._1._3).sum)) }
    assert(v4 == naive)
    // balance: shard token loads within one max-doc of each other
    val loads = v4.values.map(_._2)
    assert(loads.max - loads.min <= v3.map(_._2).max)
  }

  test("v3 semantic candidates lose nothing vs all-pairs cosine (oracle precondition)") {
    // the driver oracle replays v3's semantic pair set as ALL-PAIRS
    // exact cosine >= 0.45 over the string-stage keepers; that replay
    // is only exact if the tau-dispatched candidate generator (IVF at
    // 0.45) catches every >=tau pair on this data. Both branches
    // confirm exact cosine in-stage, so candidates can only be
    // missing, never wrong — subset + completeness = equality.
    // ivfNprobe=4 is what v3 wires (nprobe=2 measured 5/7 here — the
    // recall-first setting is load-bearing, not decorative).
    import graft.dedup.Dedup
    val emb = Tables.embeddings(spark, sfDir)
    val auto = Dedup.embeddingNearDupAuto(emb, 0.45, ivfNprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.embeddingNearDup(emb, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus must contain >=0.45-cosine pairs")
    assert(auto === exact,
      s"missing=${(exact -- auto).take(5)} extra=${(auto -- exact).take(5)}")
  }

  test("v3 semantic completeness holds on the EXACT keeper-subset frame v3 feeds") {
    // the full-table completeness case above is necessary but not
    // sufficient: v3 runs embeddingNearDupAuto on the string-stage
    // keeper SUBSET, whose seeded centroids and nCent differ from the
    // full table's, so subset recall must be pinned on that exact
    // frame — rebuilt here with the same calls releaseManifestV3 makes
    import graft.dedup.{Dedup, MinHash}
    import graft.pipeline.Pipeline
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val fpKeepers = Pipeline.fingerprintKeepers(docs, Seq("src0", "src1"))
    val pairs = MinHash.nearDupPairs(fpKeepers, n = 3, numHashes = 32,
      bands = 16, tau = 0.8)
    val strLabels = Dedup.nearDupClusters(pairs).withColumnRenamed("id", "doc_id")
    val strKeepers = fpKeepers.join(strLabels, Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
      .drop("cluster")
    val keeperEmb = emb.select(col("vec_id"), col("embedding"))
      .join(strKeepers.select(col("doc_id").as("vec_id")), "vec_id")
    val auto = Dedup.embeddingNearDupAuto(keeperEmb, 0.45, ivfNprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.embeddingNearDup(keeperEmb, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "keeper subset must still contain >=0.45-cosine pairs")
    assert(auto === exact,
      s"missing=${(exact -- auto).take(5)} extra=${(auto -- exact).take(5)}")
  }

  test("stripRepeatedSpans removes exactly the span-covered tokens") {
    import graft.dedup.Dedup
    val k = 8
    val docs = Tables.documents(spark, sfDir)
    val got = Pipeline.stripRepeatedSpans(docs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet

    val spans = Dedup.substringDedup(docs, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3))).toMap
    val expected = docs.collect().map { r =>
      val id = r.getLong(0)
      val toks = r.getString(1).split(" ", -1)
      val sp = spans.getOrElse(id, Array.empty[(Long, Long)])
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !sp.exists(s => i >= s._1 && i <= s._2) => t
      }
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (id, toks.length.toLong, (toks.length - kept.length).toLong, md)
    }.toSet
    assert(got == expected)
    assert(got.exists(_._3 > 0), "some doc must lose a repeated span at this SF")
    assert(got.exists(_._3 == 0), "untouched docs must pass through unchanged")
  }

  test("weightedMix epochs: full copies always, fractional copy by hash band") {
    val spark2 = spark; import spark2.implicits._
    val docs = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "up" else "down", "t")).toDF("doc_id", "source", "text")
    val w = when(col("source") === "up", lit(2.5)).otherwise(lit(0.25))
    val band = when(col("source") === "up", lit("80")).otherwise(lit("40"))
    val mixed = Pipeline.weightedMix(docs, w, band).cache()
    val perDoc = mixed.groupBy("doc_id", "source").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // upsampled docs appear 2 or 3 times, downsampled 0 or 1
    perDoc.foreach {
      case (_, "up", n) => assert(n == 2 || n == 3)
      case (_, "down", n) => assert(n == 1)
      case other => fail(other.toString)
    }
    val upDocs = perDoc.count(_._2 == "up")
    assert(upDocs == 200) // every up doc survives
    val downDocs = perDoc.count(_._2 == "down")
    assert(downDocs > 10 && downDocs < 90, s"~25% of 200 expected, got $downDocs")
    // deterministic: a second evaluation is identical
    val again = Pipeline.weightedMix(docs, w, band)
      .groupBy("doc_id", "source").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(perDoc.toSet == again.toSet)
    mixed.unpersist()
  }

  test("packSequences matches the single-window cumulative form") {
    val docs = Tables.documents(spark, sfDir)
    val budget = 500L
    val got = Pipeline.packSequences(docs, budget)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap

    val w = Window.orderBy("doc_id")
    val expect = docs
      .select(col("doc_id"), graft.text.Bpe.tokenCount(col("text")).as("n_tok"))
      .withColumn("bin", ((sum("n_tok").over(w) - col("n_tok")) / budget).cast("long"))
      .groupBy("bin").agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
    assert(got.size > 1, "expected multiple bins")
    // no single-partition exchange in the scale path's plan
    val plan = Pipeline.packSequences(docs, budget)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("paragraphNearDupPairs equals an all-pairs naive recompute on the corpus") {
    import graft.dedup.MinHash
    val docs = Tables.documents(spark, sfDir)
    val (pt, n, tau) = (32, 3, 0.8)
    val got = MinHash.paragraphNearDupPairs(docs, pt, n, tau = tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // naive: fixed token blocks, string 3-gram shingles, all pairs
    val paras = docs.select(col("doc_id"), col("text")).collect().flatMap { r =>
      val toks = r.getString(1).split(" ", -1)
      toks.grouped(pt).zipWithIndex.collect {
        case (block, p) if block.length >= n =>
          ((r.getLong(0), p.toLong),
            block.sliding(n).map(_.mkString(" ")).toSet)
      }
    }
    val naive = (for {
      (ka, sa) <- paras
      (kb, sb) <- paras
      if ka._1 < kb._1 || (ka._1 == kb._1 && ka._2 < kb._2)
      if sa.nonEmpty && sb.nonEmpty
      inter = sa.intersect(sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= tau
    } yield (ka._1, ka._2, kb._1, kb._2)).toSet
    assert(got == naive, s"missing=${(naive -- got).take(3)} extra=${(got -- naive).take(3)}")
    assert(got.nonEmpty, "the corpus must carry paragraph-grain signal")
  }

  test("stripDuplicateParagraphs + releaseManifestV5: the non-canonical " +
      "paragraph copy is stripped, audit column counts it") {
    val spark2 = spark; import spark2.implicits._
    // a shared 32-token paragraph (block-aligned in both docs), unique
    // remainders; doc 20 holds the canonical (smaller doc_id) copy
    val para = (0 until 32).map(i => s"dup$i").mkString(" ")
    val tailA = (0 until 32).map(i => s"alpha$i").mkString(" ")
    val tailB = (0 until 32).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      (20L, "s", s"$para $tailA"),
      (21L, "s", s"$para $tailB"),
      (22L, "s", (0 until 40).map(i => s"solo$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val got = Pipeline.stripDuplicateParagraphs(docs, 32, 0.8).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got(20L) == (s"$para $tailA", 0L), "canonical copy must survive")
    assert(got(21L) == (tailB, 1L), "dup paragraph must strip, remainder stays")
    assert(got(22L)._2 == 0L)
    // and through the v5 manifest: the doc-grain stages must NOT merge
    // 20/21 (doc Jaccard < 0.8 by construction), the paragraph stage
    // must fire, and n_tok must reflect the stripped text
    def unit(i: Int) = Array.tabulate(8)(j => if (j == i) 1f else 0f)
    val emb = Seq((20L, unit(0)), (21L, unit(1)), (22L, unit(2)))
      .toDF("vec_id", "embedding")
    // cosTau 0.6 routes the semantic stage to the LSH branch — the
    // IVF route's centroid training needs a real corpus, not 3 rows
    val m = Pipeline.releaseManifestV5(docs, emb, Seq("none"), 4, 0.0,
      cosTau = 0.6)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(6))).toMap
    assert(m(21L) == (32L, 1L), s"v5 must strip doc 21 to 32 tokens: $m")
    assert(m(20L) == (64L, 0L) && m(22L) == (40L, 0L))
  }

  test("datasetCard: per-source counters match a naive recompute (r15)") {
    import graft.text.Bpe
    val docs = Tables.documents(spark, sfDir)
    val got = Pipeline.datasetCard(docs, 0.2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getString(7))).toMap
    val rows = docs.select(col("source"), col("lang"), col("text"),
        Bpe.tokenCount(col("text")).as("bpe")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val bySrc = rows.groupBy(_._1)
    bySrc.foreach { case (src, rs) =>
      val (nDocs, sumChars, nQok, nLangs, nFpDup, topLang) = got(src)
      assert(nDocs == rs.length)
      assert(sumChars == rs.map(_._3.length.toLong).sum)
      assert(nLangs == rs.map(_._2).distinct.length)
      val fps = rs.map(r => r._3.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .distinct.sorted.mkString(" "))
      // fingerprint dup = docs minus distinct token-set keys
      assert(nFpDup == rs.length - fps.distinct.length)
      val wantTop = rs.groupBy(_._2).view.mapValues(_.length).toSeq
        .minBy { case (l, n) => (-n, l) }._1
      assert(topLang == wantTop)
      def score(t: String): Double = {
        val nt = t.split("\\s+", -1).length.toDouble
        val nc = t.length.toDouble
        val stop = "\\b(the|a|and|of|to|in|is|for|on|with)\\b".r
          .findAllIn(t.toLowerCase).length
        val punct = t.count(c => !c.isLetterOrDigit && !c.isWhitespace)
        math.min(1.0, nt / 100.0) * (1.0 - punct / nc) * (0.5 + 0.5 * (stop / nt))
      }
      assert(nQok == rs.count(r => score(r._3) >= 0.2))
    }
    assert(got.keySet == bySrc.keySet)
  }

  test("epochShuffle: per-epoch orders are independent, reproducible, " +
      "and computed via TakeOrdered, not a global sort (r15)") {
    val docs = Tables.documents(spark, sfDir)
    val df = Pipeline.epochShuffle(docs, 3, 50)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 3 epochs × 50 contiguous positions
    val byEpoch = got.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.values.foreach(h => assert(h.length == 50))
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to 50L)) }
    // independent permutations: epoch heads differ pairwise
    assert(byEpoch(0L) != byEpoch(1L) && byEpoch(1L) != byEpoch(2L))
    // reproducible: a second run returns the identical rows
    assert(Pipeline.epochShuffle(docs, 3, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == got.toSeq)
    // naive recompute of epoch 1's head
    val want = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => (id, java.security.MessageDigest.getInstance("MD5")
        .digest(s"1:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString))
      .sortBy(_._2).take(50).map(_._1).toSeq
    assert(byEpoch(1L) == want)
    // scale shape: the per-epoch head is a TakeOrdered, never a global Sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("packSequences bins are contiguous doc_id ranges filling the budget") {
    val docs = Tables.documents(spark, sfDir)
    val rows = Pipeline.packSequences(docs, 500L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // bins partition the id space in order: each first_doc follows the
    // previous bin's last_doc
    rows.sliding(2).foreach {
      case Array((_, _, _, _, prevLast), (_, _, _, first, _)) =>
        assert(first > prevLast)
      case _ =>
    }
    // every bin except possibly the last spans at least the budget once
    // its last doc is included (concat-stream semantics)
    val totalTok = docs
      .select(graft.text.Bpe.tokenCount(col("text")).as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(rows.map(_._3).sum == totalTok)
    assert(rows.map(_._2).sum == docs.count())
  }

  test("qualityRules: each rule bit fires on exactly its crafted violation") {
    val spark2 = spark; import spark2.implicits._
    val ok = (("word " * 30) + "the a and of to").trim // 35 words, stops, alpha
    val docs = Seq(
      (0L, ok),                                     // passes everything
      (1L, "the a of to in short"),                 // too few words -> bit 0
      (2L, ("ab " * 20 + "the a of in xy").trim),   // mean word len < 3 -> bits 0? no: 25 words
      (3L, (("word " * 30) + "# # # # the a").trim), // symbols -> bit 2
      (4L, (("12345 " * 30) + "the a of").trim),    // non-alpha words -> bit 3
      (5L, ("word " * 30).trim)                     // no stopwords -> bit 4
    ).toDF("doc_id", "text")
    val got = Pipeline.qualityRules(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(got(0L) == 0L)
    assert((got(1L) & 1L) != 0L)       // word count
    assert((got(2L) & 2L) != 0L, got)  // mean word length below 3
    assert((got(3L) & 4L) != 0L)       // symbol ratio
    assert((got(4L) & 8L) != 0L)       // alpha fraction
    assert(got(5L) == 16L)             // stopword rule only
    // pass column is exactly rules_failed == 0
    val rows = Pipeline.qualityRules(docs).collect()
    rows.foreach(r => assert(r.getBoolean(7) == (r.getLong(6) == 0L)))
  }

  test("qualityRules counters match a naive Scala recompute on real docs") {
    val docs = Tables.documents(spark, sfDir)
    val got = Pipeline.qualityRules(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    val raw = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    raw.foreach { case (id, text) =>
      val words = text.split("\\s+")
      val stops = Set("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")
      val expect = (words.length.toLong,
        text.replaceAll("\\s", "").length.toLong,
        words.count(_.exists(_.isLetter)).toLong,
        words.count(stops.contains).toLong)
      assert(got(id) == expect, s"doc $id")
    }
  }

  test("repetitionFilter finds the dominant 2-gram and duplicated 5-gram coverage") {
    val spark2 = spark; import spark2.implicits._
    val docs = Seq(
      // "x y" appears 3 times (positions 0,2,4 of the repeated pair)
      (0L, "x y x y x y"),
      // a duplicated 5-gram: "a b c d e" twice (and no other dup 5-gram)
      (1L, "a b c d e a b c d e"),
      (2L, "unique words only here now")
    ).toDF("doc_id", "text")
    val got = Pipeline.repetitionFilter(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .toMap
    assert(got(0L)._1 == 3L && got(0L)._2 == "x y" && got(0L)._3 == 9L)
    assert(!got(0L)._5) // 9*16 > 11 chars -> repetitious
    // doc 1: 2-grams "a b","b c","c d","d e" twice each, "e a" once;
    // top by (cnt, gram desc) = "e a"? no: cnt 2 beats 1; tie on cnt=2
    // resolves to the lexicographically greatest gram "d e"
    assert(got(1L)._1 == 2L && got(1L)._2 == "d e")
    // dup 5-grams: "a b c d e" (cnt 2, len 9) -> 18 covered chars
    assert(got(1L)._4 == 18L)
    assert(got(2L)._1 == 1L && got(2L)._4 == 0L)
    // empty/one-word doc degrades to zero counters, never a dropped row
    val tiny = Seq((9L, "solo")).toDF("doc_id", "text")
    val t = Pipeline.repetitionFilter(tiny).collect()
    assert(t.length == 1 && t(0).getLong(2) == 0L && t(0).getBoolean(6))
  }

  test("domainMix admits the id-ordered prefix until the budget is crossed") {
    val docs = Tables.documents(spark, sfDir)
    val budget = 1000L
    val got = Pipeline.domainMix(docs, budget).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // naive replay per source: cumulative BPE counts in doc_id order
    val toks = docs.select(col("source"), col("doc_id"),
        graft.text.Bpe.tokenCount(col("text")).as("t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    toks.groupBy(_._1).foreach { case (src, rows) =>
      val ordered = rows.sortBy(_._2).map(_._3)
      val cums = ordered.scanLeft(0L)(_ + _).tail
      val kept = cums.count(_ <= budget)
      val expect = (kept.toLong, (ordered.length - kept).toLong,
        ordered.take(kept).sum, ordered.sum)
      assert(got(src) == expect, s"source $src")
      // the budget must genuinely bind somewhere and admit somewhere
    }
    assert(got.values.exists(_._2 > 0), "budget must drop docs at this SF")
    assert(got.values.forall(_._1 > 0), "budget must admit a prefix everywhere")
  }
}
