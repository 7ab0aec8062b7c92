package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lexicographic max of a (bigint, string) pair as a
  * hash-aggregable aggregate (r22, guide §2 "aggregate before you
  * shuffle" / the TopCentroids SortAggregate lesson): the built-in
  * `max(struct(cnt, gram))` is exactly this, but a struct aggregation
  * buffer is immutable, so Spark plans SortAggregate — the whole
  * input sorts by group key twice (partial + final) just to keep one
  * running pair per group. A TypedImperativeAggregate runs in
  * ObjectHashAggregate with map-side partial aggregation instead
  * (plans/r22/pipe_repetition_filter_before.txt operators 11–15 are
  * the sorts this removes).
  *
  * Ordering matches the struct max field-by-field: cnt by signed
  * long, gram by UTF8String binary order (Spark's default-collation
  * string comparison — the same order `max(struct(...))` used and the
  * oracle's ORDER BY cnt DESC, gram DESC replays). NULL cnt rows are
  * skipped (the `when(...)` gate the callers wrap); an all-null group
  * evaluates to NULL, like the built-in max. */
case class MaxLongStr(
    cnt: Expression,
    str: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MaxLongStr.Buf] {

  override def children: Seq[Expression] = Seq(cnt, str)
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (cnt.dataType, str.dataType) match {
      case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (c, s) => TypeCheckResult.TypeCheckFailure(
        s"max_long_str expects (bigint, string), got ${c.sql}, ${s.sql}")
    }

  override def createAggregationBuffer(): MaxLongStr.Buf = new MaxLongStr.Buf

  override def update(buf: MaxLongStr.Buf, input: InternalRow): MaxLongStr.Buf = {
    val c = cnt.eval(input)
    val s = str.eval(input)
    if (c != null && s != null)
      // copy: the UTF8String points into a reused row buffer
      buf.offer(c.asInstanceOf[Long], s.asInstanceOf[UTF8String].copy())
    buf
  }

  override def merge(buf: MaxLongStr.Buf, other: MaxLongStr.Buf): MaxLongStr.Buf = {
    if (other.set) buf.offer(other.cnt, other.str)
    buf
  }

  override def eval(buf: MaxLongStr.Buf): Any =
    if (!buf.set) null
    else new GenericInternalRow(Array[Any](buf.cnt, buf.str))

  override def serialize(buf: MaxLongStr.Buf): Array[Byte] =
    if (!buf.set) Array.emptyByteArray
    else {
      val sb = buf.str.getBytes
      val bb = java.nio.ByteBuffer.allocate(8 + sb.length)
      bb.putLong(buf.cnt); bb.put(sb)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): MaxLongStr.Buf = {
    val buf = new MaxLongStr.Buf
    if (bytes.nonEmpty) {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val c = bb.getLong
      buf.offer(c, UTF8String.fromBytes(bytes, 8, bytes.length - 8))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MaxLongStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MaxLongStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(cnt = newChildren(0), str = newChildren(1))

  override def prettyName: String = "max_long_str"
}

object MaxLongStr {
  final class Buf {
    var set = false
    var cnt = 0L
    var str: UTF8String = _
    def offer(c: Long, s: UTF8String): Unit =
      if (!set || c > cnt || (c == cnt && s.compareTo(str) > 0)) {
        set = true; cnt = c; str = s
      }
  }

  /** `max_long_str(cnt, str)` as an aggregate Column — lexicographic
    * (cnt, str) max, struct-typed result. */
  def maxPair(cnt: Column, str: Column): Column =
    Glue.column(MaxLongStr(Glue.expression(cnt), Glue.expression(str))
      .toAggregateExpression())
}
