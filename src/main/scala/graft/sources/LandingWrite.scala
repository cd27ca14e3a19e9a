package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DSv2 write path for the landing layout: each task writes NDJSON
  * page files named by the reference's deterministic scheme
  * (`response_pg{page}.json`, A11/A12 — /root/reference/src/main.py:
  * 25-31, gcs_helper.py:45-49), one page per task ("page" = Spark
  * partition id), committed via a staging-directory rename so a failed
  * job never leaves partial pages where the reader lists (the
  * deterministic-name-overwrite idempotency of A11, made atomic).
  *
  * Options: `endpoint` (dir name), `cnpj` (tenant prefix, normalized),
  * `dt` (optional yyyyMMdd partition dir).
  */
class LandingWriteBuilder(dataSchema: StructType, path: String,
    options: Map[String, String]) extends WriteBuilder with SupportsTruncate {

  // commit() already replaces the whole target page-set atomically
  // (delete+rename), which IS truncate semantics — the reference's
  // WRITE_TRUNCATE reload (A16, bigquery_helper.py:120)
  override def truncate(): WriteBuilder = this

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new LandingBatchWrite(dataSchema, path, options)
  }
}

class LandingBatchWrite(schema: StructType, root: String, options: Map[String, String])
    extends BatchWrite {

  private val cnpj = options.getOrElse("cnpj", "00000000000000").replaceAll("[./-]", "")
  private val endpoint = options.getOrElse("endpoint", "data")
  private val dt = options.get("dt")

  private def finalDir: String =
    (Seq(root, s"CNPJ_$cnpj", endpoint) ++ dt.toSeq).mkString("/")
  private def stagingDir: String = finalDir + ".staging"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LandingWriterFactory(schema.json, stagingDir,
      new SerializableHadoopConf(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val dst = new Path(finalDir)
    val fs = dst.getFileSystem(conf)
    fs.delete(dst, true)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(new Path(stagingDir), dst))
      throw new java.io.IOException(s"landing commit failed: $stagingDir -> $dst")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val stage = new Path(stagingDir)
    stage.getFileSystem(conf).delete(stage, true)
  }
}

class LandingWriterFactory(schemaJson: String, stagingDir: String,
    conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PageWriter(DataType.fromJson(schemaJson).asInstanceOf[StructType],
      stagingDir, partitionId, conf)
}

/** Writes one `response_pg{partitionId}.json` NDJSON page. */
class PageWriter(schema: StructType, stagingDir: String, page: Int,
    conf: SerializableHadoopConf) extends DataWriter[InternalRow] {

  private val mapper = new ObjectMapper()
  private val path = new Path(s"$stagingDir/response_pg$page.json")
  private val out = {
    val fs = path.getFileSystem(conf.value)
    fs.mkdirs(path.getParent)
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(path, true), java.nio.charset.StandardCharsets.UTF_8))
  }
  private var first = true

  override def write(row: InternalRow): Unit = {
    val node = JsonNodeFactory.instance.objectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) node.putNull(f.name)
      else f.dataType match {
        case StringType => node.put(f.name, row.getUTF8String(i).toString)
        case LongType => node.put(f.name, row.getLong(i))
        case IntegerType => node.put(f.name, row.getInt(i))
        case DoubleType => node.put(f.name, row.getDouble(i))
        case BooleanType => node.put(f.name, row.getBoolean(i))
        case TimestampType =>
          node.put(f.name, java.time.Instant.ofEpochSecond(
            Math.floorDiv(row.getLong(i), 1000000L),
            Math.floorMod(row.getLong(i), 1000000L) * 1000L).toString)
        case other => throw new UnsupportedOperationException(s"graft-landing write: $other")
      }
    }
    if (!first) out.write("\n")
    first = false
    out.write(mapper.writeValueAsString(node))
  }

  override def commit(): WriterCommitMessage = { out.close(); PageCommitted(page) }
  override def abort(): Unit = out.close()
  override def close(): Unit = ()
}

case class PageCommitted(page: Int) extends WriterCommitMessage
