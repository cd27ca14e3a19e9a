package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSourceV2 connector for the reference's landing layout
  * (A1+A11-A14 rebuilt Spark-first): NDJSON page files under
  * `{root}/CNPJ_{cnpj}/{endpoint}/[{yyyyMMdd}/]response_pg{page}.json`
  * (/root/reference/src/main.py:25-31). Where the reference fetches
  * pages strictly sequentially (main.py:57-87), this source plans ONE
  * InputPartition PER PAGE FILE — page-level parallelism for free, and
  * the unit of retry becomes the page exactly like the reference's
  * page-retry loop (A5) but handled by Spark task re-execution.
  *
  * Pushdown:
  *  - `dt` comparisons prune page files by path segment BEFORE reading
  *    (the watermark/partition-pruning pattern of A7, §4 row 1);
  *  - column pruning projects the parsed JSON to the required fields
  *    (the `ignore_unknown_values` lenient-read of §1.3 is inherent:
  *    unknown keys are never materialized).
  *
  * Usage:
  * {{{
  * spark.read.format("graft-landing").schema(dataSchema)
  *   .option("path", root).option("endpoint", "vendas").load()
  * }}}
  * The produced table appends three path-derived columns to the data
  * schema: dt (string, "" for undated), page (long), src_file (string)
  * — src_file doubles as A9's gcs_uri provenance column.
  */
class LandingSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-landing"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-landing requires an explicit data schema (schema-on-read with declared projection, SURVEY.md §1.3)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("option 'path' is required"))
    val endpoint = Option(properties.get("endpoint"))
    LandingTable(schema, path, endpoint)
  }
}

object LandingSource {
  val DT_COL = "dt"
  val PAGE_COL = "page"
  val FILE_COL = "src_file"

  def fullSchema(dataSchema: StructType): StructType =
    StructType(dataSchema.fields ++ Seq(
      StructField(DT_COL, StringType, nullable = false),
      StructField(PAGE_COL, LongType, nullable = false),
      StructField(FILE_COL, StringType, nullable = false)))

  private[sources] val PagePattern = """response_pg(\d+)\.json""".r

  /** List page files under the layout, optionally restricted to one
    * endpoint. Returns (path, dt, page, sizeBytes). Walks directories
    * explicitly so it (a) never descends into `.staging-*`/`.bak` work
    * dirs — uncommitted pages stay invisible — and (b) tolerates
    * directories vanishing mid-walk (a concurrent commit cleaning its
    * staging dir must not fail a reader's listing). */
  def listPages(root: String, endpoint: Option[String],
      hadoopConf: org.apache.hadoop.conf.Configuration): Seq[(String, String, Long, Long)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hadoopConf)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long)]
    def walk(dir: Path): Unit = {
      val entries =
        try fs.listStatus(dir)
        catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] }
      entries.foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          if (!name.contains(".staging") && !name.endsWith(".bak")) walk(st.getPath)
        } else name match {
          case PagePattern(pg) =>
            val parent = st.getPath.getParent
            val (dt, endpointDir) =
              if (parent.getName.matches("""\d{8}""")) (parent.getName, parent.getParent.getName)
              else ("", parent.getName)
            if (endpoint.forall(_ == endpointDir))
              out += ((st.getPath.toString, dt, pg.toLong, st.getLen))
          case _ => ()
        }
      }
    }
    try walk(rootPath)
    catch { case _: java.io.FileNotFoundException => () }
    out.toSeq.sortBy(p => (p._2, p._3, p._1))
  }
}

case class LandingTable(dataSchema: StructType, path: String, endpoint: Option[String])
    extends Table with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"graft-landing:$path"
  // data schema only: dt/page/src_file are METADATA columns (hidden
  // unless selected, excluded from write resolution)
  override def schema(): StructType = dataSchema
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = {
    import org.apache.spark.sql.connector.catalog.MetadataColumn
    def mc(n: String, dt: DataType) = new MetadataColumn {
      override def name(): String = n
      override def dataType(): DataType = dt
      override def isNullable: Boolean = false
    }
    Array(mc(LandingSource.DT_COL, StringType),
      mc(LandingSource.PAGE_COL, LongType),
      mc(LandingSource.FILE_COL, StringType))
  }
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LandingScanBuilder(dataSchema, path, endpoint)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new LandingWriteBuilder(info.schema(), path,
      info.options().asScala.toMap ++ endpoint.map("endpoint" -> _))
}

class LandingScanBuilder(dataSchema: StructType, path: String, endpoint: Option[String])
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = dataSchema
  private var pushed: Array[Filter] = Array.empty

  /** dt filters prune files by path segment; everything else stays a
    * residual filter evaluated by Spark above the scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (dtFilters, residual) = filters.partition {
      case EqualTo(LandingSource.DT_COL, _: String) => true
      case GreaterThan(LandingSource.DT_COL, _: String) => true
      case GreaterThanOrEqual(LandingSource.DT_COL, _: String) => true
      case LessThan(LandingSource.DT_COL, _: String) => true
      case LessThanOrEqual(LandingSource.DT_COL, _: String) => true
      case _ => false
    }
    pushed = dtFilters
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = LandingScan(dataSchema, required, path, endpoint, pushed)
}

case class LandingScan(dataSchema: StructType, required: StructType, path: String,
    endpoint: Option[String], pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    // micro-batch planning runs no column-pruning pass and appends ALL
    // declared metadata columns to the scan output, so the streaming
    // reader must emit the full (data ++ dt/page/src_file) layout
    new LandingMicroBatchStream(LandingSource.fullSchema(dataSchema),
      path, endpoint, checkpointLocation)
  override def description(): String =
    s"graft-landing path=$path pushedDt=[${pushed.mkString(", ")}]"

  private def dtAccepts(dt: String): Boolean = pushed.forall {
    case EqualTo(_, v: String) => dt == v
    case GreaterThan(_, v: String) => dt > v
    case GreaterThanOrEqual(_, v: String) => dt >= v
    case LessThan(_, v: String) => dt < v
    case LessThanOrEqual(_, v: String) => dt <= v
    case _ => true
  }

  @transient private lazy val confSer = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  // one listing per scan instance: estimateStatistics and
  // planInputPartitions must agree (and not double-bill the store)
  @transient private lazy val prunedPages: Seq[(String, String, Long, Long)] =
    LandingSource.listPages(path, endpoint, confSer.value)
      .filter { case (_, dt, _, _) => dtAccepts(dt) }

  override def planInputPartitions(): Array[InputPartition] =
    prunedPages
      .map { case (file, dt, page, _) => PagePartition(file, dt, page): InputPartition }
      .toArray

  /** Post-pruning size estimate → Catalyst join planning (e.g. a small
    * pruned landing table becomes broadcast-eligible). */
  override def estimateStatistics(): Statistics = {
    val bytes = prunedPages.map(_._4).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(required.json, confSer)
}

/** One landing page file = one partition (= one task = one retry unit). */
case class PagePartition(file: String, dt: String, page: Long) extends InputPartition

class PageReaderFactory(requiredJson: String, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    new PageReader(p, DataType.fromJson(requiredJson).asInstanceOf[StructType], conf)
  }
}

/** Hadoop Configuration is not Java-serializable; this wrapper ships
  * the driver's conf (incl. spark.hadoop.* overrides like object-store
  * credentials) to executor-side readers. */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

class PageReader(p: PagePartition, required: StructType, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  // the cached FS instance is process-shared: never close IT, close the stream
  private val stream = {
    val path = new Path(p.file)
    path.getFileSystem(conf.value).open(path)
  }
  private val lines = scala.io.Source.fromInputStream(stream, "UTF-8")
    .getLines().filter(_.nonEmpty)
  private var current: InternalRow = _

  private def convert(node: JsonNode, f: StructField): Any = f.name match {
    case LandingSource.DT_COL => UTF8String.fromString(p.dt)
    case LandingSource.PAGE_COL => p.page
    case LandingSource.FILE_COL => UTF8String.fromString(p.file)
    case name =>
      val v = node.get(name)
      if (v == null || v.isNull) null
      else f.dataType match {
        // unparseable values become null (PERMISSIVE semantics) rather
        // than Jackson's silent 0/0.0/false coercion
        case StringType => UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
        case LongType =>
          if (v.canConvertToLong) v.asLong()
          else scala.util.Try(v.asText().trim.toLong).map(java.lang.Long.valueOf).toOption.orNull
        case IntegerType =>
          if (v.canConvertToInt) v.asInt()
          else scala.util.Try(v.asText().trim.toInt).map(java.lang.Integer.valueOf).toOption.orNull
        case DoubleType =>
          if (v.isNumber) v.asDouble()
          else scala.util.Try(v.asText().trim.toDouble).map(java.lang.Double.valueOf).toOption.orNull
        case BooleanType =>
          if (v.isBoolean) v.asBoolean()
          else v.asText().trim.toLowerCase match {
            case "true" => java.lang.Boolean.TRUE
            case "false" => java.lang.Boolean.FALSE
            case _ => null
          }
        case TimestampType =>
          scala.util.Try(DateTimeUtils.stringToTimestampAnsi(
            UTF8String.fromString(v.asText()), java.time.ZoneOffset.UTC))
            .map(java.lang.Long.valueOf).toOption.orNull
        case TimestampNTZType =>
          scala.util.Try(DateTimeUtils.localDateTimeToMicros(
            java.time.LocalDateTime.parse(v.asText())))
            .map(java.lang.Long.valueOf).toOption.orNull
        case other =>
          throw new UnsupportedOperationException(s"graft-landing: type $other")
      }
  }

  override def next(): Boolean =
    if (!lines.hasNext) false
    else {
      val node = mapper.readTree(lines.next())
      current = InternalRow.fromSeq(required.fields.toSeq.map(convert(node, _)))
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}
