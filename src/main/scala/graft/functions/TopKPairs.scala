package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (score, id) pairs with the
  * highest score (ties → smallest id) per group, as a
  * TypedImperativeAggregate with partial aggregation.
  *
  * This is the scale path for per-key top-k: a window `row_number`
  * must shuffle and sort EVERY row of a group to rank it, while this
  * aggregate's map-side combine ships at most k pairs per group per
  * input partition — at 100 TB the shuffle volume drops from the data
  * size to k × groups × partitions. Deterministic: the result is a
  * function of the pair multiset only.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_pairs expects (double, bigint), got " +
        s"${score.dataType.sql}, ${id.dataType.sql}")

  /** best first: higher score wins (NaN greatest, matching SQL
    * `ORDER BY score DESC` in both Spark and DuckDB), ties broken by
    * smaller id. */
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // NaN sorts greatest → first
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val kept = buf.sorted(ord).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sorted(ord).take(k).map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val trimmed = compact(buf)
    val bb = ByteBuffer.allocate(4 + trimmed.length * 16)
    bb.putInt(trimmed.length)
    trimmed.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_pairs"
}

object TopKPairs {
  /** `top_k_pairs(score, id, k)` as an aggregate Column. */
  def topK(score: Column, id: Column, k: Int): Column =
    Glue.column(TopKPairs(Glue.expression(score), Glue.expression(id), k)
      .toAggregateExpression())
}
