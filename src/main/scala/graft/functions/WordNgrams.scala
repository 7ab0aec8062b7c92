package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a text column — whitespace(-regex " ")-split, then
  * positional width-n slices joined with single spaces — as ONE
  * codegen'd kernel (r22, guide §4).
  *
  * Replaces the
  * `transform(sequence(1, size(words) − n + 1), i => array_join(slice(words, i, n), " "))`
  * form, a higher-order function Catalyst evaluates as an INTERPRETED
  * lambda per gram (CodegenFallback), with per-gram slice allocations —
  * the dominant per-row cost of the decontamination and repetition
  * operators. Bit-identical by construction: the split is the SAME
  * `UTF8String.split(" ", -1)` call the StringSplit expression makes
  * (regex " " ≡ the literal), and the join is exact byte
  * concatenation, which no builder strategy can change. Texts shorter
  * than n words yield the empty array (the HOF form's explicit
  * `when` case — Spark sequences would DESCEND). Pinned against the
  * HOF form in `WordNgramsSpec`. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string column, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Per-row kernel, called from both eval and generated code. */
  def ngramsOf(text: UTF8String): GenericArrayData = {
    val words = text.split(WordNgrams.Space, -1)
    val m = words.length - n + 1
    if (m <= 0) return WordNgrams.Empty
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) =
        if (n == 1) words(i)
        else {
          val parts = new Array[UTF8String](2 * n - 1)
          var j = 0
          while (j < n) {
            parts(2 * j) = words(i + j)
            if (j < n - 1) parts(2 * j + 1) = WordNgrams.Space
            j += 1
          }
          UTF8String.concat(parts: _*)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    ngramsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNgrams", this, classOf[WordNgrams].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.ngramsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNgrams {
  private[functions] val Space = UTF8String.fromString(" ")
  private[functions] val Empty = new GenericArrayData(Array.empty[Any])

  /** `word_ngrams(text, n)` as a Column. */
  def ngrams(text: Column, n: Int): Column =
    Glue.column(WordNgrams(Glue.expression(text), n))
}
