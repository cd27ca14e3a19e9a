package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode/feature-extract
  * runs per-partition over iterators (constant memory per task, no
  * driver collect).
  *
  * The decode path is REAL for the formats the JDK ships codecs for
  * (PNG/JPEG/GIF/BMP via `javax.imageio` — [[ImageCodec]]): it sniffs
  * the payload's magic bytes, decodes genuine width/height/pixels, and
  * the `multimodal_image_meta` query judges those decoded values
  * against an oracle that derives them from the staging generator's
  * parameters. Payloads NO in-container codec recognizes (audio/video,
  * or the text-bytes stand-ins) fall back to [[FakeCodec]], a
  * deterministic stub that keeps the plumbing exercised — swapping in
  * an external decoder remains a one-function change.
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

  /** REAL image codec over the JDK's bundled `javax.imageio` readers
    * (PNG, JPEG, GIF, BMP — no external media libraries needed).
    * Executor-side, allocation-per-payload only; the in-memory cache
    * flag avoids ImageIO's default temp-file spill per decode. */
  object ImageCodec {
    javax.imageio.ImageIO.setUseCache(false)

    /** Encode a solid-`rgb` `width`x`height` PNG — the deterministic
      * staging generator for the judged decode query: PNG is lossless,
      * so every decoded property (dims, any pixel) is derivable by the
      * oracle from these three parameters alone. */
    def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode→SCALE→re-encode: the image TRANSFORM leg. Graphics2D
      * scaling of a SOLID-COLOR source is provably the same solid
      * color at any target size (interpolation weights sum to 1 and
      * all contributing pixels are equal), which is what keeps the
      * resize oracle analytic — while the pass still runs a genuine
      * decode, raster scale, and PNG re-encode per payload. */
    def resizePng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try g.drawImage(src, 0, 0, w, h, null) finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }

    /** Decode metadata from real payload bytes: format sniffed from the
      * magic bytes, width/height from the decoded frame, `checksum` =
      * the (0,0) pixel's 24-bit RGB — a value the oracle can predict
      * for generated fixtures. Unrecognized payloads (no JDK reader
      * claims them: audio/video/raw text) fall back to [[FakeCodec]]. */
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      if (bytes.isEmpty) return FakeCodec.decode(id, bytes)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) FakeCodec.decode(id, bytes)
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val img = r.read(0)
            MediaMeta(
              doc_id = id,
              n_bytes = bytes.length.toLong,
              format = r.getFormatName.toLowerCase(java.util.Locale.ROOT),
              width = img.getWidth,
              height = img.getHeight,
              checksum = (img.getRGB(0, 0) & 0xFFFFFF).toLong)
          } finally r.dispose()
        }
      } finally iis.close()
    }
  }

  /** documents.text cast to a binary payload column — the fixture's
    * stand-in for real media bytes. */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Per-partition decode: iterator-to-iterator (streams batches, no
    * materialization), the Scala analogue of a vectorized decode UDF.
    * One task per input split; at 100 TB parallelism follows the scan.
    * Real-first: [[ImageCodec]] decodes any payload a JDK image reader
    * recognizes; everything else takes the [[FakeCodec]] stub path. */
  def decodeMeta(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ImageCodec.decode(id, if (bytes == null) Array.empty else bytes)
      })
  }

  /** Typed audio record: decoded stream parameters + an exact integer
    * content fingerprint (the signed-sample sum). */
  final case class AudioMeta(
      doc_id: Long,
      sample_rate: Long,
      channels: Long,
      bits: Long,
      n_frames: Long,
      sample_sum: Long)

  /** REAL audio codec over the JDK's bundled `javax.sound.sampled` WAV
    * support — the audio leg of the multimodal path, no external
    * libraries. The staging generator emits deterministic 16-bit mono
    * PCM whose every sample is an arithmetic function of (doc_id, i),
    * so the oracle recomputes the decoded frame count AND the exact
    * signed-sample sum analytically; the decode side reads genuine WAV
    * bytes back through `AudioSystem` (header parse + PCM frame
    * extraction), so a corrupted header, channel/endianness mix-up, or
    * truncated payload breaks the judged hash. */
  object AudioCodec {
    /** sample(i) = ((id·31 + i·7919) mod 65536) − 32768 — exact int16. */
    def encodeWav(id: Long): Array[Byte] = {
      val n = (100 + (id % 100)).toInt
      val data = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = (((id * 31 + i.toLong * 7919) % 65536L) - 32768L).toShort
        data(2 * i) = (v & 0xFF).toByte
        data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** 2:1 decimation — the audio TRANSFORM leg: decode the PCM, keep
      * the even-index frames, re-encode a genuine WAV at half the
      * sample rate. Every output sample is an input sample verbatim,
      * so the oracle recomputes the decimated frame count and exact
      * signed-sample sum from the generator arithmetic alone. */
    def decimateWav(bytes: Array[Byte]): Array[Byte] = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        val pcm = ais.readAllBytes()
        val nIn = pcm.length / 2
        val nOut = (nIn + 1) / 2
        val out = new Array[Byte](nOut * 2)
        var i = 0
        while (i < nOut) { out(2 * i) = pcm(4 * i); out(2 * i + 1) = pcm(4 * i + 1); i += 1 }
        val of = new javax.sound.sampled.AudioFormat(f.getSampleRate / 2, 16, 1, true, false)
        val oais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(out), of, nOut.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(oais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      } finally ais.close()
    }

    /** Decode real WAV bytes: format params from the parsed header,
      * exact signed-sample sum from the little-endian PCM frames. */
    def decode(id: Long, bytes: Array[Byte]): AudioMeta = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        val nFrames = ais.getFrameLength
        val pcm = ais.readAllBytes()
        var sum = 0L
        var i = 0
        while (i + 1 < pcm.length) {
          sum += (pcm(i + 1).toInt << 8) | (pcm(i) & 0xFF)
          i += 2
        }
        AudioMeta(id, f.getSampleRate.toLong, f.getChannels.toLong,
          f.getSampleSizeInBits.toLong, nFrames, sum)
      } finally ais.close()
    }
  }

  /** Per-partition image resize: decode → scale to `w`x`h` → PNG
    * re-encode, iterator-to-iterator. The transform twin of
    * [[decodeMeta]] — at 100 TB this is the thumbnail/normalization
    * pass of a vision-data pipeline, parallelism following the scan. */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, ImageCodec.resizePng(bytes, w, h))
      }).toDF("doc_id", "payload")
  }

  /** Per-partition audio decode — same iterator-to-iterator shape as
    * [[decodeMeta]]. */
  def decodeAudio(df: DataFrame): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => AudioCodec.decode(id, bytes) })
  }

  /** Per-partition audio decimation — decode → drop odd frames →
    * re-encode, the transform twin of [[decodeAudio]]. */
  def decimateAudio(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, AudioCodec.decimateWav(bytes)) })
      .toDF("doc_id", "payload")
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
