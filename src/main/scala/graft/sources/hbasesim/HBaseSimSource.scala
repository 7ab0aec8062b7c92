package graft.sources.hbasesim

import java.util

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 "hbase-sim" source (SURVEY §2): the Spark-native
  * equivalent of the reference's HBase scanner
  * (HBaseParser.java:82-118 — one column family, qualifier projection,
  * `Scanner.setMinTimestamp`). The "HBase table" is the events parquet
  * file; the source exposes HBase-scan semantics natively:
  *
  *  - `SupportsPushDownRequiredColumns` = qualifier projection: only
  *    requested columns are decoded (reference `qualifiers`,
  *    HBaseRiver.java:85);
  *  - `SupportsPushDownFilters` accepts `ts_us > x` (the reference's
  *    minStamp watermark) and `event_type = f` (the family filter);
  *    accepted filters are applied inside the scan, with whole row
  *    groups skipped via parquet column statistics — at 100 TB the
  *    incremental import reads only row groups past the watermark;
  *  - one InputPartition per parquet row group, so a 1000-executor
  *    cluster scans row groups in parallel with no driver fan-in.
  *
  * Exposes `ts` as `ts_us` (epoch micros). The file's physical INT64 may
  * carry ns, µs, or ms — the unit comes from the parquet footer's
  * logical-type annotation per file ([[HBaseSimTable.tsToMicros]]), never
  * from an assumption.
  */
class HBaseSimProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "hbasesim"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HBaseSimTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HBaseSimTable(properties.get("path"))
}

object HBaseSimTable {
  /** The simulated HBase row: key, cell timestamp (µs), and the cells. */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  /** source column → parquet column (ts_us is derived from raw `ts`). */
  val parquetField: Map[String, String] =
    schema.fieldNames.map(n => n -> (if (n == "ts_us") "ts" else n)).toMap

  /** raw INT64 `ts` → epoch-µs converter, dispatched ONCE PER FILE on the
    * parquet footer's logical-type annotation (round-10 postmortem: a
    * fixed ÷1000 read regenerated TIMESTAMP_MICROS data as 1000× too
    * small — silently. Unit handling must come from file metadata, never
    * be assumed):
    *  - TIMESTAMP(MICROS) (current driver data, NTZ or adjusted): as-is;
    *  - TIMESTAMP(NANOS) or unannotated INT64 (legacy ns data): ÷1000
    *    (the same truncation DuckDB's epoch_us applies);
    *  - TIMESTAMP(MILLIS): ×1000.
    * INT96 (Spark's default write type!) is rejected with a pointer at
    * the outputTimestampType conf rather than decoded wrong. */
  def tsToMicros(schema: MessageType): Long => Long = {
    if (!schema.containsField("ts")) identity
    else {
      val t = schema.getType(Seq("ts"): _*).asPrimitiveType()
      require(t.getPrimitiveTypeName == PrimitiveType.PrimitiveTypeName.INT64,
        s"hbasesim: ts must be INT64 (µs/ns/ms), found ${t.getPrimitiveTypeName}; " +
          "write the file with spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS")
      t.getLogicalTypeAnnotation match {
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS => identity
            case LogicalTypeAnnotation.TimeUnit.NANOS => (v: Long) => v / 1000L
            case LogicalTypeAnnotation.TimeUnit.MILLIS => (v: Long) => Math.multiplyExact(v, 1000L)
          }
        case _ => (v: Long) => v / 1000L // unannotated INT64: legacy epoch-ns
      }
    }
  }

  /** A "table" is either one parquet file or a directory of part files
    * (the layout any distributed writer produces — the single-file form
    * only exists at toy scale). Hidden/metadata entries are skipped the
    * way Spark's own file index does. */
  def dataFiles(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
          !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
        .map(_.getPath.toString).sorted
    else Seq(path)
  }
}

class HBaseSimTable(path: String) extends Table with SupportsRead {
  require(path != null, "hbasesim requires a 'path' option")
  override def name(): String = s"hbasesim:$path"
  override def schema(): StructType = HBaseSimTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HBaseSimScanBuilder(path)
}

class HBaseSimScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var required: StructType = HBaseSimTable.schema
  private var accepted: Array[Filter] = Array.empty
  private var minStamp: Long = Long.MinValue
  private var family: Option[String] = None
  private var aggRow: Option[(StructType, Seq[Any], String)] = None
  private var limit: Option[Int] = None
  private var topNOrders: Seq[(String, Boolean)] = Seq.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case GreaterThan("ts_us", _: java.lang.Long | _: Long) => true
      case EqualTo("event_type", _: String) => true
      case _ => false
    }
    ok.foreach {
      case GreaterThan("ts_us", v) =>
        minStamp = math.max(minStamp, v.asInstanceOf[Number].longValue())
      case EqualTo("event_type", v) => family = Some(v.asInstanceOf[String])
      case _ =>
    }
    accepted = ok
    rest // Spark evaluates everything we didn't accept
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown (the reference's zero-scan watermark facet:
  // HBaseParser.setMinTimestamp:258-280 asks ES for max(_timestamp)
  // without touching rows; here max/min/count come from parquet footer
  // statistics — 0 row reads, 0 row groups opened) ------------------------

  private def singleCol(e: V2Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
    case _ => None
  }

  /** max/min over the numeric columns + count(*) / count(non-null col),
    * only when no filter narrows the scan (stats describe the whole
    * file) and there is no grouping. */
  private def statsAnswerable(agg: Aggregation): Boolean =
    accepted.isEmpty && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty && agg.aggregateExpressions.forall {
        case m: Max => singleCol(m.column).exists(HBaseSimStats.numericCols)
        case m: Min => singleCol(m.column).exists(HBaseSimStats.numericCols)
        case _: CountStar => true
        // every source column is non-nullable, so count(col) = count(*)
        case c: Count if !c.isDistinct => singleCol(c.column).isDefined
        case _ => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    statsAnswerable(agg) && HBaseSimStats.fromFooter(path, agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!statsAnswerable(agg)) return false
    HBaseSimStats.fromFooter(path, agg) match {
      case Some((schema, values)) =>
        val desc = agg.aggregateExpressions.map(_.toString).mkString(", ")
        aggRow = Some((schema, values, desc)); true
      case None => false // a needed footer statistic is absent → scan rows
    }
  }

  // ---- limit / top-N pushdown (ES keyset pagination: the index serves
  // sorted pages; here each row-group reader keeps a bounded heap) --------

  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    val cols = orders.toSeq.map(o =>
      singleCol(o.expression()).filter(HBaseSimStats.numericCols)
        .map(c => c -> (o.direction() == SortDirection.ASCENDING)))
    if (cols.exists(_.isEmpty)) return false
    topNOrders = cols.flatten
    limit = Some(n)
    true
  }

  // rows beyond the per-partition top-N/limit are cut, but partitions
  // still need Spark's global merge (sort + final limit)
  override def isPartiallyPushed: Boolean = true

  override def build(): Scan = aggRow match {
    case Some((schema, values, desc)) => new HBaseSimAggScan(schema, values, desc)
    case None => new HBaseSimScan(path, required, minStamp, family, limit, topNOrders)
  }
}

/** Footer-statistics answers for pushed aggregates. */
object HBaseSimStats {
  val numericCols: Set[String] = Set("event_id", "ts_us", "user_id", "value")

  private def aggField(f: AggregateFunc): Option[(String, DataType)] = f match {
    case m: Max => m.column match {
      case nr: NamedReference => Some(("max(" + nr.fieldNames.head + ")",
        HBaseSimTable.schema(nr.fieldNames.head).dataType))
      case _ => None
    }
    case m: Min => m.column match {
      case nr: NamedReference => Some(("min(" + nr.fieldNames.head + ")",
        HBaseSimTable.schema(nr.fieldNames.head).dataType))
      case _ => None
    }
    case _: CountStar => Some(("count(*)", LongType))
    case c: Count => Some(("count", LongType))
    case _ => None
  }

  /** (output schema, one row of values) from the parquet footer alone, or
    * None when a required statistic is missing. ts_us derives from the raw
    * `ts` stats via each FILE's own logical-type unit (tsToMicros) — unit
    * conversion commutes with min/max (monotone). */
  def fromFooter(path: String, agg: Aggregation): Option[(StructType, Seq[Any])] = {
    import scala.collection.JavaConverters._
    // all row groups of all part files, each paired with its file's ts
    // unit converter: block metadata survives reader close, so the
    // footers open briefly and only metadata is held. ONE Configuration
    // hoisted out and the per-file opens fanned across a small thread
    // pool: the r17 sf1 anchor caught this loop serially constructing a
    // Configuration (~tens of ms EACH) per part file on the driver —
    // ×12 at 32 files, and at warehouse scale (thousands of files) the
    // "0 row reads" promise would have drowned in driver-side metadata
    // latency. Footer reads are independent; order is restored by the
    // indexed map so min/max folds stay deterministic.
    val conf = new Configuration()
    val files = HBaseSimTable.dataFiles(path)
    // dedicated bounded pool, NOT ForkJoinPool.commonPool: footer opens
    // are blocking I/O, and at thousands of files they would starve the
    // JVM-wide common pool every other library shares. 8 threads bounds
    // driver-side fan-out regardless of file count; the pool is torn
    // down before returning so repeated pushdowns don't leak threads.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val blocks =
      try {
        val futures = files.toList.map { f =>
          java.util.concurrent.CompletableFuture.supplyAsync(() => {
            val reader = ParquetFileReader.open(
              HadoopInputFile.fromPath(new Path(f), conf))
            try {
              val toUs = HBaseSimTable.tsToMicros(reader.getFooter.getFileMetaData.getSchema)
              reader.getFooter.getBlocks.asScala.toList.map(b => (b, toUs))
            } finally reader.close()
          }, pool)
        }
        // join() wraps task failures in CompletionException — rethrow the
        // original cause so fromFooter keeps the same exception surface as
        // the serial loop it replaced. List order already matches file
        // order (map preserves it), so the fold stays deterministic.
        futures.flatMap { fu =>
          try fu.join()
          catch {
            case e: java.util.concurrent.CompletionException if e.getCause != null =>
              throw e.getCause
          }
        }
      } finally pool.shutdown()
    // zero row groups (empty table): decline the pushdown — Spark then
    // computes the aggregate itself over zero rows, producing the
    // correct NULL max/min and 0 count (footer stats cannot represent
    // "no rows" in this non-nullable result shape)
    if (blocks.isEmpty) return None
    locally {
      val rowCount = blocks.map(_._1.getRowCount).sum
      def minMax(src: String, isMax: Boolean): Option[Any] = {
        val pq = HBaseSimTable.parquetField(src)
        val per = blocks.map { case (b, toUs) =>
          b.getColumns.asScala.find(_.getPath.toDotString == pq)
            .flatMap(c => Option(c.getStatistics)).filter(_.hasNonNullValue)
            .map { s =>
              val raw = (if (isMax) s.genericGetMax else s.genericGetMin) match {
                case l: java.lang.Long => l.longValue(): Any
                case d: java.lang.Double => d.doubleValue(): Any
              }
              if (src == "ts_us") (toUs(raw.asInstanceOf[Long]): Any) else raw
            }
        }
        if (!per.forall(_.isDefined)) return None
        Some(per.map(_.get).reduce { (a, b) =>
          val cmp = (a, b) match {
            case (x: Long, y: Long) => x.compareTo(y)
            case (x: Double, y: Double) => x.compareTo(y)
          }
          if ((cmp >= 0) == isMax) a else b
        })
      }
      val fields = agg.aggregateExpressions.toSeq.map(aggField)
      if (fields.exists(_.isEmpty)) return None
      val values = agg.aggregateExpressions.toSeq.map {
        case m: Max => minMax(m.column.asInstanceOf[NamedReference].fieldNames.head, isMax = true)
        case m: Min => minMax(m.column.asInstanceOf[NamedReference].fieldNames.head, isMax = false)
        case _: CountStar => Some(rowCount)
        case _: Count => Some(rowCount)
        case _ => None
      }
      if (values.exists(_.isEmpty)) None
      else Some((StructType(fields.flatten.map { case (n, t) =>
        StructField(n, t, nullable = false) }), values.flatten))
    }
  }
}

/** A scan whose entire result was computed on the driver from footer
  * statistics: one partition, one row, zero row reads. */
class HBaseSimAggScan(schema: StructType, values: Seq[Any], desc: String)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"hbasesim PushedAggregates=[$desc] (footer stats, 0 row reads)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(HBaseSimAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory = HBaseSimAggReaderFactory
}

case class HBaseSimAggPartition(values: Seq[Any]) extends InputPartition

object HBaseSimAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val vs = partition.asInstanceOf[HBaseSimAggPartition].values
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(vs.toArray)
      override def close(): Unit = ()
    }
  }
}

class HBaseSimScan(path: String, required: StructType, minStamp: Long,
    family: Option[String], limit: Option[Int] = None,
    topNOrders: Seq[(String, Boolean)] = Seq.empty) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"hbasesim minStamp=$minStamp family=${family.getOrElse("*")} " +
      s"cols=${required.fieldNames.mkString(",")}" +
      limit.map { n =>
        if (topNOrders.nonEmpty)
          s" PushedTopN=[${topNOrders.map { case (c, asc) =>
            c + (if (asc) " ASC" else " DESC") }.mkString(",")} LIMIT $n]"
        else s" PushedLimit=$n"
      }.getOrElse("")

  /** One partition per row group; groups whose ts max is at or below the
    * watermark are pruned here on the driver via footer statistics. */
  override def planInputPartitions(): Array[InputPartition] =
    HBaseSimTable.dataFiles(path).toArray.flatMap { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), new Configuration()))
      try {
        val toUs = HBaseSimTable.tsToMicros(reader.getFooter.getFileMetaData.getSchema)
        val blocks = reader.getFooter.getBlocks.asScala.toArray
        blocks.zipWithIndex.flatMap { case (block, i) =>
          val tsMaxRaw = block.getColumns.asScala
            .find(_.getPath.toDotString == "ts")
            .flatMap(c => Option(c.getStatistics))
            .filter(_.hasNonNullValue)
            .map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          val survives = tsMaxRaw.forall(maxRaw => toUs(maxRaw) > minStamp)
          if (survives) Some(HBaseSimInputPartition(f, i): InputPartition) else None
        }
      } finally reader.close()
    }

  override def createReaderFactory(): PartitionReaderFactory =
    HBaseSimReaderFactory(required.json, minStamp, family, limit, topNOrders)
}

case class HBaseSimInputPartition(path: String, rowGroup: Int) extends InputPartition

case class HBaseSimReaderFactory(requiredJson: String, minStamp: Long,
    family: Option[String], limit: Option[Int] = None,
    topNOrders: Seq[(String, Boolean)] = Seq.empty) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HBaseSimInputPartition]
    new HBaseSimPartitionReader(p.path, p.rowGroup,
      DataType.fromJson(requiredJson).asInstanceOf[StructType], minStamp, family,
      limit, topNOrders)
  }
}

/** Reads one parquet row group through parquet-mr's example Group API,
  * decoding only the projected columns, applying the accepted filters
  * per row. A pushed limit stops the read after `limit` passing rows; a
  * pushed top-N keeps a bounded heap of the best `limit` rows instead
  * (partial pushdown — Spark's final sort+limit merges partitions). */
class HBaseSimPartitionReader(path: String, rowGroup: Int, required: StructType,
    minStamp: Long, family: Option[String], limit: Option[Int] = None,
    topNOrders: Seq[(String, Boolean)] = Seq.empty) extends PartitionReader[InternalRow] {

  // columns to decode = projection ∪ filter columns ∪ top-N sort columns
  private val neededSource: Seq[String] = {
    val f = Seq("ts_us").filter(_ => minStamp != Long.MinValue) ++
      Seq("event_type").filter(_ => family.isDefined) ++ topNOrders.map(_._1)
    (required.fieldNames ++ f).distinct.toSeq
  }

  private val reader = ParquetFileReader.open(
    HadoopInputFile.fromPath(new Path(path), new Configuration()))
  private val fileSchema: MessageType = reader.getFooter.getFileMetaData.getSchema
  private val projection: MessageType = new MessageType("hbasesim_projection",
    neededSource.map { n =>
      val f: String = HBaseSimTable.parquetField(n)
      fileSchema.getType(Seq(f): _*)
    }: _*)
  reader.setRequestedSchema(projection)

  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var remaining: Long = 0L
  private var current: InternalRow = _

  locally {
    var i = 0
    while (i < rowGroup) { reader.skipNextRowGroup(); i += 1 }
    val pages: PageReadStore = reader.readNextRowGroup()
    remaining = pages.getRowCount
    val columnIO = new ColumnIOFactory().getColumnIO(projection)
    recordReader = columnIO.getRecordReader(pages, new GroupRecordConverter(projection))
  }

  // Per-row work must not re-resolve schema metadata: getFieldIndex is
  // a string-keyed lookup that the original form paid per column per
  // row. Resolve each needed column to its ordinal ONCE and bind a
  // decode closure per output column; the per-row loop is then array
  // indexing only. (Measured effect at ×10 is small — ~5% — because
  // Group ASSEMBLY, not field access, dominates the row decode; see
  // SCALING.md round 7 for the measured throughput and the
  // vectorize-vs-descope disposition.)
  // the file's own ts unit (footer logical type), resolved once per reader
  private val tsToUs: Long => Long = HBaseSimTable.tsToMicros(fileSchema)

  private def decoderFor(source: String): Group => Any = {
    val idx = projection.getFieldIndex(HBaseSimTable.parquetField(source))
    source match {
      case "event_id" | "user_id" => g => g.getLong(idx, 0)
      case "ts_us" => g => tsToUs(g.getLong(idx, 0))
      case "value" => g => g.getDouble(idx, 0)
      case "event_type" | "props" => g => UTF8String.fromString(g.getString(idx, 0))
    }
  }
  private val rowDecoders: Array[Group => Any] = required.fieldNames.map(decoderFor)
  private val keyDecoders: Array[Group => Any] =
    topNOrders.map(o => decoderFor(o._1)).toArray

  private val tsIdx: Int =
    if (minStamp == Long.MinValue) -1 else projection.getFieldIndex("ts")
  private val familyIdx: Int =
    if (family.isEmpty) -1 else projection.getFieldIndex("event_type")
  private val familyName: String = family.orNull

  private def passes(g: Group): Boolean =
    (tsIdx < 0 || tsToUs(g.getLong(tsIdx, 0)) > minStamp) &&
    (familyIdx < 0 || g.getString(familyIdx, 0) == familyName)

  private def buildRow(g: Group): InternalRow = {
    val vals = new Array[Any](rowDecoders.length)
    var i = 0
    while (i < rowDecoders.length) { vals(i) = rowDecoders(i)(g); i += 1 }
    new GenericInternalRow(vals)
  }

  private var emittedCount = 0
  private var topNIter: Iterator[InternalRow] = _

  /** lexicographic compare on the sort key, direction-aware; sort
    * columns are numeric (enforced at pushTopN). */
  private def cmpKeys(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < topNOrders.length) {
      val c = (a(i), b(i)) match {
        case (x: Long, y: Long) => java.lang.Long.compare(x, y)
        case (x: Double, y: Double) => java.lang.Double.compare(x, y)
        case (x, y) => x.toString.compareTo(y.toString)
      }
      val signed = if (topNOrders(i)._2) c else -c
      if (signed != 0) return signed
      i += 1
    }
    0
  }

  /** One pass over the row group keeping the best `limit` rows in a
    * worst-at-head heap (O(rows · log limit), memory O(limit)). */
  private def drainTopN(): Iterator[InternalRow] = {
    val n = math.max(limit.getOrElse(1), 1)
    val heap = new java.util.PriorityQueue[(Array[Any], InternalRow)](
      n + 1, (p, q) => cmpKeys(q._1, p._1))
    while (remaining > 0) {
      remaining -= 1
      val g = recordReader.read()
      if (passes(g)) {
        val keys = keyDecoders.map(_(g))
        if (heap.size < n) heap.add((keys, buildRow(g)))
        else if (cmpKeys(keys, heap.peek()._1) < 0) {
          heap.poll(); heap.add((keys, buildRow(g)))
        }
      }
    }
    import scala.collection.JavaConverters._
    heap.iterator.asScala.map(_._2) // order irrelevant: Spark re-sorts
  }

  override def next(): Boolean = {
    if (topNOrders.nonEmpty) {
      if (topNIter == null) topNIter = drainTopN()
      if (topNIter.hasNext) { current = topNIter.next(); true } else false
    } else if (limit.exists(emittedCount >= _)) {
      false
    } else {
      while (remaining > 0) {
        remaining -= 1
        val g = recordReader.read()
        if (passes(g)) {
          current = buildRow(g)
          emittedCount += 1
          return true
        }
      }
      false
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
