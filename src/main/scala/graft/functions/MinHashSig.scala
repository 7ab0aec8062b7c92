package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types._

/** The full MinHash signature — slot i = min over shingle hashes h of
  * `xxhash64(h, i)` — as ONE codegen'd kernel (r22, guide §4).
  *
  * The previous formulation,
  * `transform(sequence(0, k−1), i => array_min(transform(sh, h => xxhash64(h, i))))`,
  * is a nested higher-order function: CodegenFallback (interpreted
  * lambda evaluation per element, with a fresh array allocation per
  * slot) AND it re-hashes every shingle k times from scratch —
  * `xxhash64(h, i)` seeds with hashLong(h, 42) before mixing i, and
  * the inner transform recomputes that h-hash for every slot. This
  * kernel hashes each shingle ONCE (`XXH64.hashLong(h, 42)`) and mixes
  * the k slot indices off that state (`XXH64.hashInt(i, hl)`) in a
  * tight primitive loop — k× less hashing, zero interpretation, zero
  * per-slot allocation. Bit-identical to the HOF form by construction:
  * Spark's own XXH64 static kernels, same child order, same 42 seed
  * (`xxhash64(h, i)` = hashInt(i, hashLong(h, 42)) for BIGINT h and
  * INT i — the exact fold XxHash64.computeHash performs), and the
  * empty-shingle edge mirrors `array_min(empty) = null` per slot
  * (unreachable from the wired operators, which filter
  * `size(sh) > 0` upstream; pinned in `MinHashSigSpec`). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint> shingle hashes, got ${t.sql}")
  }

  // element nullability mirrors the HOF form: array_min over an empty
  // shingle set yields a null slot
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  /** Per-row kernel, called from both eval and generated code. */
  def sigOf(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var j = 0
    while (j < n) {
      val hl = XXH64.hashLong(arr.getLong(j), 42L)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashInt(i, hl)
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    sigOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.sigOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** `minhash_sig(shingleHashes, k)` as a Column. */
  def sig(sh: Column, numHashes: Int): Column =
    Glue.column(MinHashSig(Glue.expression(sh), numHashes))
}
