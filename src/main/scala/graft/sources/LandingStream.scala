package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming over the landing layout: the reference's
  * poll-sleep incremental loop (/root/reference/src/main.py:86,243)
  * becomes a real streaming source.
  *
  * Offset semantics = the reference's WATERMARK semantics (A7): the
  * offset is the maximum (dt, page, path) key processed so far. Each
  * trigger picks up files with keys ABOVE the committed watermark.
  * A file that lands with a key at or below the watermark (a backfill
  * of an earlier day/page) is deliberately skipped — exactly like the
  * reference's resume-from-max-date, which never refetches days ≤ the
  * watermark (main.py:195-209). This keeps offsets stable under any
  * listing change: a positional offset (count of files in sorted
  * order) would both re-emit and permanently skip files whenever a
  * late file shifted the sort.
  */
class LandingMicroBatchStream(required: StructType,
    path: String, endpoint: Option[String], checkpointLocation: String)
    extends MicroBatchStream {

  private val confSer = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  /** Stable, totally ordered watermark key for a page file. */
  private def key(dt: String, page: Long, file: String): String =
    f"$dt/$page%012d/$file"

  private def pages(): Seq[(String, String, Long)] =
    LandingSource.listPages(path, endpoint, confSer.value).map(p => (p._1, p._2, p._3))

  /** Listing snapshot pinned at latestOffset time: the planned batch
    * reads exactly the files that defined its end offset — a file
    * landing between listing and planning (with a key ≤ the end
    * watermark) is consistently treated as late, never planned from a
    * second, different listing. On recovery-replay (no snapshot) the
    * range is re-listed; landed pages are immutable per the layout
    * contract, so the replayed range content matches. */
  @volatile private var snapshot: Seq[(String, String, Long)] = Nil

  override def initialOffset(): Offset = LandingOffset("")

  override def latestOffset(): Offset = {
    val ps = pages()
    snapshot = ps
    val ks = ps.map { case (f, dt, pg) => key(dt, pg, f) }
    LandingOffset(if (ks.isEmpty) "" else ks.max)
  }

  override def deserializeOffset(json: String): Offset = LandingOffset(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[LandingOffset].watermark
    val hi = end.asInstanceOf[LandingOffset].watermark
    val snap = snapshot
    val base =
      if (snap.nonEmpty && snap.map { case (f, dt, pg) => key(dt, pg, f) }.max == hi) snap
      else pages()
    base
      .filter { case (f, dt, pg) => val k = key(dt, pg, f); k > lo && k <= hi }
      .map { case (file, dt, page) => PagePartition(file, dt, page): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(required.json, confSer)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = high-water mark over the (dt, page, path) key order. */
case class LandingOffset(watermark: String) extends Offset {
  override def json(): String = watermark
}
