package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.BoolDsl
import graft.text.BoolDsl._

/** Percolator scaling probe (round 13): exhaustive one-pass tree eval
  * vs the term-index-prefiltered form, as the REGISTERED QUERY COUNT
  * grows (the axis ES's candidate-query design exists for — corpus
  * scaling is the same linear scan either way, ×100 audit).
  *
  * Generated stored set: single-term matches over the corpus vocab
  * crossed with n_chars bands — every query extractable, the
  * percolator's common case. Equality of the two forms is asserted at
  * the smallest N each run (the spec pins it corpus-wide; here it
  * guards the probe itself).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.PercProbe [nQueries…]
  */
object PercProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default ceiling 10⁴ (r14): confirms the indexed form's
    // query-count scaling stays sub-linear well past the ≈100
    // crossover measured in r13
    val ns = (if (args.nonEmpty) args.toSeq
      else Seq("10", "50", "200", "800", "3000", "10000")).map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).cache()
    docs.count() // warm

    // vocab terms by frequency — enough raw material for any N
    val vocab = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "").groupBy("t").count()
      .orderBy(col("count").desc, col("t")).limit(200)
      .collect().map(_.getString(0)).toSeq

    def mkQueries(n: Int): Seq[(String, Query)] =
      (0 until n).map { i =>
        val term = vocab(i % vocab.size)
        val band = (i / vocab.size) * 40
        s"pq$i" -> Bool(
          must = Seq(MatchQ(term)),
          filter = Seq(RangeQ("n_chars", gte = Some(band.toDouble))))
      }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // warm all three plans once (untimed) at the smallest N so the
    // first timed row excludes JIT/plan-compile noise (r13 ADVICE: the
    // comment claimed this without the run existing)
    locally {
      val warmQs = mkQueries(ns.min)
      BoolDsl.percolateDsl(docs, warmQs).count()
      BoolDsl.percolateDslIndexed(docs, warmQs).count()
      BoolDsl.percolateDslIndexedAtScale(docs, warmQs).count()
    }

    // the exhaustive and CASE-chain forms die in the analyzer
    // (Column→Expression recursion stack overflow) between 800 and
    // 3000 stored queries — measured r14; only the at-scale
    // interpreter form runs past the cliff
    val chainCeiling = 800

    println(f"${"N"}%6s ${"exhaustive(s)"}%14s ${"indexed(s)"}%12s ${"atscale(s)"}%12s matches")
    ns.foreach { n =>
      val qs = mkQueries(n)
      val (tAt, nAt) = time(BoolDsl.percolateDslIndexedAtScale(docs, qs).count())
      if (n <= chainCeiling) {
        val (tEx, nEx) = time(BoolDsl.percolateDsl(docs, qs).count())
        val (tIx, nIx) = time(BoolDsl.percolateDslIndexed(docs, qs).count())
        require(nEx == nIx && nEx == nAt,
          s"form disagreement at N=$n: $nEx vs $nIx vs $nAt")
        println(f"$n%6d $tEx%14.2f $tIx%12.2f $tAt%12.2f $nEx")
      } else
        println(f"$n%6d ${"-"}%14s ${"-"}%12s $tAt%12.2f $nAt")
    }
    spark.stop()
  }
}
