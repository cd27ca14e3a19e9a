package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming over the landing layout: the reference's
  * poll-sleep incremental loop (/root/reference/src/main.py:86,243)
  * becomes a real streaming source. The offset is a position in the
  * deterministic (dt, page, path) ordering of page files; each trigger
  * picks up files landed past the committed offset — exactly the
  * watermark-resume semantics of A7, but checkpoint-backed.
  */
class LandingMicroBatchStream(dataSchema: StructType, required: StructType,
    path: String, endpoint: Option[String], checkpointLocation: String)
    extends MicroBatchStream {

  private def hadoopConf = org.apache.spark.sql.SparkSession.active
    .sparkContext.hadoopConfiguration

  /** Deterministic, append-only file ordering (dt, page, path). */
  private def pages(): Seq[(String, String, Long)] =
    LandingSource.listPages(path, endpoint, hadoopConf)

  override def initialOffset(): Offset = LandingOffset(0)

  override def latestOffset(): Offset = LandingOffset(pages().length)

  override def deserializeOffset(json: String): Offset =
    LandingOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[LandingOffset].pos.toInt
    val to = end.asInstanceOf[LandingOffset].pos.toInt
    pages().slice(from, to)
      .map { case (file, dt, page) => PagePartition(file, dt, page): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(dataSchema.json, required.json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = count of page files already processed (files are landed
  * append-only under deterministic names, so the sorted prefix is
  * stable — the same property the reference's watermark relies on). */
case class LandingOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}
