package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`k` nearest centroids of an embedding against a CONSTANT centroid
  * matrix — cosine descending, matrix-row-index ascending on ties —
  * returned as `array<int>` of matrix row indices.
  *
  * This expression exists because every alternative formulation of
  * "assign each corpus vector to its nearest centroid(s)" explodes or
  * sorts the corpus once the centroid count grows with √n:
  *
  *  - broadcast-join + `max_by`/struct-`max`/TopKPairs aggregation
  *    materializes n·nCent rows, and the per-vector aggregate has an
  *    immutable (struct / object) buffer, so Spark plans SortAggregate
  *    or falls back to sort-based object aggregation — measured at
  *    ×100 (500k vectors × 1414 centroids = 7·10⁸ rows): tens of GB
  *    of sort spill until the disk died;
  *  - the literal-expression argmax (`array_max` over per-centroid
  *    cosine structs) drops out of whole-stage codegen past ~100
  *    centroids and interprets every cosine (measured 15× slower).
  *
  * Here the centroid matrix rides along as a plan reference (constant,
  * broadcast with the serialized plan — index metadata, not data), each
  * row does one tight primitive-array loop (JIT-compiled via the
  * expression-reference call, never an interpreted expression tree),
  * and NO extra rows exist: the operator output is n rows of small int
  * arrays. Cosine arithmetic matches [[CosineSimilarity]] exactly
  * (sequential double accumulation, `dot / (sqrt(na)·sqrt(nb))`).
  *
  * Zero-norm vectors produce NaN cosines, which never displace a
  * top-k slot; unfilled slots are trimmed from the output. */
object TopCentroids {
  /** Matrix-size bound (nCentroids × dim double values) under which the
    * plan-reference (literal) form is fine: ~1e6 doubles ≈ 8 MB rides
    * the serialized plan without hurting task dispatch. Above it — at
    * n=10⁹ vectors, 2√n ≈ 63k centroids — the matrix must be a
    * `SparkContext.broadcast` fetched once per executor
    * ([[TopCentroidsBcast]]), not re-shipped with every task binary
    * (VERDICT r11 next #7). */
  val maxLiteralValues: Long = 1L << 20

  /** Shared per-row kernel: top-`k` matrix row indices by (cosine desc,
    * index asc) — one tight primitive-array loop, no allocation beyond
    * the k-slot buffers. Strictly-greater insertion keeps the earliest
    * (smallest) index on cosine ties, matching the (cos desc, id asc)
    * contract of the join/aggregate forms this replaces. */
  def topIndices(cents: Array[Array[Double]], centNorms: Array[Double],
      isFloat: Boolean, k: Int, arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    var na = 0.0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      v(i) = x; na += x * x; i += 1
    }
    val vnorm = math.sqrt(na)
    val m = cents.length
    val kk = math.min(k, m)
    val bCos = Array.fill(kk)(Double.NegativeInfinity)
    val bIdx = Array.fill(kk)(-1)
    var c = 0
    while (c < m) {
      val cent = cents(c)
      val lim = math.min(n, cent.length)
      var dot = 0.0; var j = 0
      while (j < lim) { dot += v(j) * cent(j); j += 1 }
      val cos = dot / (vnorm * centNorms(c))
      if (cos > bCos(kk - 1)) {
        var p = kk - 1
        while (p > 0 && cos > bCos(p - 1)) {
          bCos(p) = bCos(p - 1); bIdx(p) = bIdx(p - 1); p -= 1
        }
        bCos(p) = cos; bIdx(p) = c
      }
      c += 1
    }
    var filled = 0
    while (filled < kk && bIdx(filled) >= 0) filled += 1
    new GenericArrayData(java.util.Arrays.copyOf(bIdx, filled))
  }

  def norms(cents: Array[Array[Double]]): Array[Double] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
}

case class TopCentroids(child: Expression, cents: Array[Array[Double]], k: Int)
    extends UnaryExpression {

  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_centroids requires array<float|double> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val centNorms: Array[Double] = TopCentroids.norms(cents)

  /** Per-row kernel, called from both eval and generated code. */
  def topIndices(arr: ArrayData): ArrayData =
    TopCentroids.topIndices(cents, centNorms, childIsFloat, k, arr)

  override def nullSafeEval(input: Any): Any =
    topIndices(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topCentroids", this, classOf[TopCentroids].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.topIndices($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // case-class equality over an Array field is reference identity, which
  // would make two semantically identical instances never compare equal
  // and silently defeat Catalyst canonicalization / common-subexpression
  // elimination — compare the centroid matrix by value instead
  override def equals(other: Any): Boolean = other match {
    case t: TopCentroids =>
      k == t.k && child == t.child &&
        cents.length == t.cents.length &&
        cents.indices.forall(i => java.util.Arrays.equals(cents(i), t.cents(i)))
    case _ => false
  }

  override def hashCode(): Int = {
    var h = 31 * child.hashCode() + k
    var i = 0
    while (i < cents.length) { h = h * 31 + java.util.Arrays.hashCode(cents(i)); i += 1 }
    h
  }

  override def prettyName: String = "top_centroids"
}

/** [[TopCentroids]] with the centroid matrix behind a
  * `SparkContext.broadcast` instead of a plan reference: the task
  * binary carries only the broadcast HANDLE; executors fetch the matrix
  * blocks once and every task on that executor shares them. Semantics
  * and kernel are identical (same [[TopCentroids.topIndices]]) — use
  * this form once nCentroids × dim exceeds
  * [[TopCentroids.maxLiteralValues]] (`Ann.centroidAssigner` picks). */
case class TopCentroidsBcast(child: Expression,
    bcast: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]], k: Int)
    extends UnaryExpression {

  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_centroids_bcast requires array<float|double> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // resolved on first use per JVM: driver-side eval reads the local
  // value; executors fetch the broadcast blocks
  @transient private lazy val cents: Array[Array[Double]] = bcast.value
  @transient private lazy val centNorms: Array[Double] = TopCentroids.norms(cents)

  /** Per-row kernel, called from both eval and generated code. */
  def topIndices(arr: ArrayData): ArrayData =
    TopCentroids.topIndices(cents, centNorms, childIsFloat, k, arr)

  override def nullSafeEval(input: Any): Any =
    topIndices(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topCentroidsBcast", this,
      classOf[TopCentroidsBcast].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.topIndices($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // broadcast identity (id) stands in for matrix value equality — two
  // expressions over the same broadcast are interchangeable for
  // canonicalization; different broadcasts are conservatively distinct
  override def equals(other: Any): Boolean = other match {
    case t: TopCentroidsBcast => k == t.k && child == t.child && bcast.id == t.bcast.id
    case _ => false
  }

  override def hashCode(): Int =
    (31 * child.hashCode() + k) * 31 + bcast.id.toInt

  override def prettyName: String = "top_centroids_bcast"
}
