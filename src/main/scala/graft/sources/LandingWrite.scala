package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DSv2 write path for the landing layout (`response_pg{page}.json`
  * NDJSON pages, A11/A12 — /root/reference/src/main.py:25-31,
  * gcs_helper.py:45-49).
  *
  * Commit protocol:
  *  - every task ATTEMPT writes to a job-unique staging dir under a
  *    name containing partition AND task id (speculative attempts
  *    cannot clobber each other); only files named in the driver-side
  *    commit messages — i.e., attempts the coordinator committed — are
  *    promoted;
  *  - append mode renumbers new pages after the existing max page, so
  *    landed pages are never overwritten;
  *  - overwrite (truncate) mode moves the live page-set aside to a
  *    `.bak`, promotes, then drops the backup — at no crash point are
  *    both the live dir and the backup gone;
  *  - staging/backup dirs carry a `.staging-*`/`.bak` suffix that
  *    [[LandingSource.listPages]] excludes, so readers and streams
  *    never see uncommitted pages.
  *
  * (True multi-writer atomicity on object stores needs a manifest log
  * — Delta/Iceberg territory, out of scope; single-writer-per-target
  * is the landing contract, as it was for the reference.)
  */
class LandingWriteBuilder(dataSchema: StructType, path: String,
    options: Map[String, String]) extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val t = doTruncate
    new Write {
      override def toBatch: BatchWrite = new LandingBatchWrite(dataSchema, path, options, t)
    }
  }
}

class LandingBatchWrite(schema: StructType, root: String, options: Map[String, String],
    truncate: Boolean) extends BatchWrite {

  private val cnpj = options.getOrElse("cnpj", "00000000000000").replaceAll("[./-]", "")
  private val endpoint = options.getOrElse("endpoint", "data")
  private val dt = options.get("dt")
  private val jobId = java.util.UUID.randomUUID().toString

  private def finalDir: String =
    (Seq(root, s"CNPJ_$cnpj", endpoint) ++ dt.toSeq).mkString("/")
  private def stagingDir: String = finalDir + s".staging-$jobId"

  private def hadoopConf =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LandingWriterFactory(schema.json, stagingDir, new SerializableHadoopConf(hadoopConf))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dst = new Path(finalDir)
    val bak = new Path(finalDir + ".bak")
    val fs = dst.getFileSystem(hadoopConf)
    val committed = messages.collect { case PageCommitted(partition, file) => (partition, file) }
      .sortBy(_._1)

    val basePage =
      if (truncate || !fs.exists(dst)) 0L
      else { // append: continue after the highest landed page
        val existing = LandingSource.listPages(finalDir, None, hadoopConf)
        if (existing.isEmpty) 0L else existing.map(_._3).max + 1L
      }

    if (truncate && fs.exists(dst)) {
      fs.delete(bak, true)
      if (!fs.rename(dst, bak))
        throw new java.io.IOException(s"landing commit: cannot move $dst aside")
    }
    fs.mkdirs(dst)
    committed.foreach { case (partition, file) =>
      val target = new Path(dst, s"response_pg${basePage + partition}.json")
      if (!fs.rename(new Path(file), target))
        throw new java.io.IOException(s"landing commit: $file -> $target failed")
    }
    fs.delete(new Path(stagingDir), true)   // losing speculative attempts
    if (truncate) fs.delete(bak, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val stage = new Path(stagingDir)
    stage.getFileSystem(hadoopConf).delete(stage, true)
  }
}

class LandingWriterFactory(schemaJson: String, stagingDir: String,
    conf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PageWriter(DataType.fromJson(schemaJson).asInstanceOf[StructType],
      stagingDir, partitionId, taskId, conf)
}

/** Writes one page per task attempt; the attempt-unique name means a
  * speculative twin can never corrupt the committed attempt's file. */
class PageWriter(schema: StructType, stagingDir: String, partition: Int, taskId: Long,
    conf: SerializableHadoopConf) extends DataWriter[InternalRow] {

  private val mapper = new ObjectMapper()
  private val path = new Path(s"$stagingDir/attempt-p$partition-t$taskId.json")
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
        case TimestampNTZType =>
          node.put(f.name,
            org.apache.spark.sql.catalyst.util.DateTimeUtils
              .microsToLocalDateTime(row.getLong(i)).toString)
        case other => throw new UnsupportedOperationException(s"graft-landing write: $other")
      }
    }
    if (!first) out.write("\n")
    first = false
    out.write(mapper.writeValueAsString(node))
  }

  override def commit(): WriterCommitMessage = { out.close(); PageCommitted(partition, path.toString) }
  override def abort(): Unit = out.close()
  override def close(): Unit = ()
}

case class PageCommitted(partition: Int, stagedFile: String) extends WriterCommitMessage
