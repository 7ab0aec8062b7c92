package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** Pins the large-vocab BPE kernel (broadcast merge loop,
  * `BpeTokenCount`) to the replace-chain contract: equal counts on the
  * official 40-rule table AND on a generated 300-rule table — the
  * standard sequential-pass == priority-loop BPE equivalence the kernel
  * scaladoc argues. */
class BpeMergeSpec extends SparkSpec {

  test("kernel token counts equal the 40-rule replace chain on documents") {
    val docs = Tables.documents(spark, sfDir)
    val diff = docs.select(
        Bpe.tokenCount(col("text")).as("chain"),
        Bpe.tokenCountLargeVocab(spark, col("text")).as("kernel"))
      .filter(col("chain") =!= col("kernel"))
    assert(diff.count() == 0)
    val total = docs.select(sum(Bpe.tokenCountLargeVocab(spark, col("text"))))
      .head.getLong(0)
    assert(total > 0)
  }

  test("kernel equals the replace chain on a generated 300-rule table") {
    val merges = BpeProbe.syntheticMerges(300)
    val docs = Tables.documents(spark, sfDir)
    val diff = docs.select(
        BpeProbe.replaceChain(merges, col("text")).as("chain"),
        Bpe.tokenCountLargeVocab(spark, col("text"), merges).as("kernel"))
      .filter(col("chain") =!= col("kernel"))
    assert(diff.count() == 0)
  }

  test("kernel merge loop hand-check: priority order and leftmost-first ties") {
    import spark.implicits._
    // official table: (t,h) is rank 0, (th,e) rank 1 → "the" = 1 token;
    // "tthh" → th + t? no: pass for (t,h): leftmost-first gives th,th →
    // 2 tokens; "in going" → in + g? (i,n)=2, (in,g)=3: "going" g,o,in..
    val rows = Seq("the", "tthh", "in going", "", "  ", "don't").toDF("text")
      .select(Bpe.tokenCountLargeVocab(spark, col("text")).as("n"),
        Bpe.tokenCount(col("text")).as("chain"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (n, chain) => assert(n == chain, s"$n != $chain") }
    assert(rows.head._1 == 1L) // "the" merges to a single token
  }
}
