package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode/feature-extract
  * runs per-partition over iterators (constant memory per task, no
  * driver collect). The actual codec is STUBBED — media libraries are
  * not in this container — behind [[FakeCodec]], a deterministic fake
  * with the real Spark-side plumbing (schema, batching, partitioning)
  * in place, so swapping in a real decoder is a one-function change.
  */
object Multimodal {

  /** Typed media record: payload + extracted metadata. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      checksum: Long)

  /** STUB decoder: deterministic pseudo-metadata derived from the
    * payload bytes (stands in for an image decode; replace with a real
    * codec off-container). */
  object FakeCodec {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val checksum = bytes.foldLeft(1125899906842597L)((h, b) => 31 * h + b)
      val fmtIdx = math.floorMod(checksum, 3).toInt
      MediaMeta(
        doc_id = id,
        n_bytes = bytes.length.toLong,
        format = Seq("png", "jpeg", "webp")(fmtIdx),
        width = 64 + math.floorMod(checksum >> 8, 1024).toInt,
        height = 64 + math.floorMod(checksum >> 24, 1024).toInt,
        checksum = checksum)
    }
  }

  /** documents.text cast to a binary payload column — the fixture's
    * stand-in for real media bytes. */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Per-partition decode: iterator-to-iterator (streams batches, no
    * materialization), the Scala analogue of a vectorized decode UDF.
    * One task per input split; at 100 TB parallelism follows the scan. */
  def decodeMeta(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        FakeCodec.decode(id, if (bytes == null) Array.empty else bytes)
      })
  }

  /** Frame-sampling stub: emits every `stride`-th chunk of the payload
    * as a "frame" — the flatMap (UDTF-style) shape of video sampling. */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes0) =>
        val bytes = if (bytes0 == null) Array.empty[Byte] else bytes0
        // an empty payload still yields one zero-byte frame (ceil
        // semantics — matches the oracle's (len-1)//stride + 1 count)
        if (bytes.isEmpty) Seq((id, 0, 0))
        else bytes.grouped(stride).zipWithIndex.collect {
          case (chunk, idx) if idx % 2 == 0 => (id, idx, chunk.length)
        }.toSeq
      }
      .toDF("doc_id", "frame_idx", "frame_bytes")
  }
}
