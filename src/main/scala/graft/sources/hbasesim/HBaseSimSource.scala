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
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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
  * Exposes `ts` as `ts_us` (epoch micros, ns÷1000 — the same truncation
  * DuckDB's `epoch_us` applies).
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

  /** source column → parquet column (ts_us is derived from ns `ts`). */
  val parquetField: Map[String, String] =
    schema.fieldNames.map(n => n -> (if (n == "ts_us") "ts" else n)).toMap
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = HBaseSimTable.schema
  private var accepted: Array[Filter] = Array.empty
  private var minStamp: Long = Long.MinValue
  private var family: Option[String] = None

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

  override def build(): Scan = new HBaseSimScan(path, required, minStamp, family)
}

class HBaseSimScan(path: String, required: StructType, minStamp: Long,
    family: Option[String]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"hbasesim minStamp=$minStamp family=${family.getOrElse("*")} " +
      s"cols=${required.fieldNames.mkString(",")}"

  /** One partition per row group; groups whose ts max is at or below the
    * watermark are pruned here on the driver via footer statistics. */
  override def planInputPartitions(): Array[InputPartition] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), new Configuration()))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toArray
      blocks.zipWithIndex.flatMap { case (block, i) =>
        val tsMaxNs = block.getColumns.asScala
          .find(_.getPath.toDotString == "ts")
          .flatMap(c => Option(c.getStatistics))
          .filter(_.hasNonNullValue)
          .map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        val survives = tsMaxNs.forall(maxNs => maxNs / 1000L > minStamp)
        if (survives) Some(HBaseSimInputPartition(path, i): InputPartition) else None
      }
    } finally reader.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    HBaseSimReaderFactory(required.json, minStamp, family)
}

case class HBaseSimInputPartition(path: String, rowGroup: Int) extends InputPartition

case class HBaseSimReaderFactory(requiredJson: String, minStamp: Long,
    family: Option[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HBaseSimInputPartition]
    new HBaseSimPartitionReader(p.path, p.rowGroup,
      DataType.fromJson(requiredJson).asInstanceOf[StructType], minStamp, family)
  }
}

/** Reads one parquet row group through parquet-mr's example Group API,
  * decoding only the projected columns, applying the accepted filters
  * per row. */
class HBaseSimPartitionReader(path: String, rowGroup: Int, required: StructType,
    minStamp: Long, family: Option[String]) extends PartitionReader[InternalRow] {

  // columns to decode = projection ∪ filter columns
  private val neededSource: Seq[String] = {
    val f = Seq("ts_us").filter(_ => minStamp != Long.MinValue) ++
      Seq("event_type").filter(_ => family.isDefined)
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

  private def fieldValue(g: Group, source: String): Any = {
    val idx = projection.getFieldIndex(HBaseSimTable.parquetField(source))
    source match {
      case "event_id" | "user_id" => g.getLong(idx, 0)
      case "ts_us" => g.getLong(idx, 0) / 1000L
      case "value" => g.getDouble(idx, 0)
      case "event_type" | "props" => UTF8String.fromString(g.getString(idx, 0))
    }
  }

  override def next(): Boolean = {
    while (remaining > 0) {
      remaining -= 1
      val g = recordReader.read()
      val passes =
        (minStamp == Long.MinValue ||
          g.getLong(projection.getFieldIndex("ts"), 0) / 1000L > minStamp) &&
        family.forall(f =>
          g.getString(projection.getFieldIndex("event_type"), 0) == f)
      if (passes) {
        current = new GenericInternalRow(
          required.fieldNames.map(n => fieldValue(g, n)).toArray[Any])
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
