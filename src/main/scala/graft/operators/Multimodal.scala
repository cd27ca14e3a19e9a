package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata; decode/feature-extract
  * runs per-partition over iterators (constant memory per task, no
  * driver collect).
  *
  * Every modality decodes through a REAL JDK codec (round 12 closed
  * the last stub): still images via `javax.imageio` PNG/JPEG/GIF/BMP
  * readers ([[ImageCodec]]), audio via `javax.sound.sampled` WAV
  * ([[AudioCodec]]), and multi-frame video via the animated-GIF path
  * of `javax.imageio` ([[VideoCodec]] — genuine per-frame ImageReader
  * loop). Payloads NO reader recognizes (e.g. the raw text-bytes
  * stand-ins) get an honest `unknown` record — byte length and a
  * content checksum, zero dims — rather than fabricated metadata. */
object Multimodal {

  /** Typed media record: payload + extracted metadata. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      checksum: Long)

  /** Honest fallback for payloads no JDK reader claims: `unknown`
    * format, zero dims, a deterministic content checksum (the only
    * metadata raw bytes really carry). */
  private[operators] def unknownMeta(id: Long, bytes: Array[Byte]): MediaMeta =
    MediaMeta(id, bytes.length.toLong, "unknown", 0, 0,
      bytes.foldLeft(1125899906842597L)((h, b) => 31 * h + b))

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
      * claims them: audio/raw text) get the honest [[unknownMeta]]
      * record. */
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      if (bytes.isEmpty) return unknownMeta(id, bytes)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) unknownMeta(id, bytes)
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
    * recognizes; everything else gets the honest `unknown` record. */
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

  /** Typed video frame record: one row per decoded frame. */
  final case class VideoFrame(
      doc_id: Long,
      frame_idx: Long,
      width: Long,
      height: Long,
      pixel: Long)

  /** REAL multi-frame video codec over the JDK's animated-GIF path in
    * `javax.imageio` (round-12 verdict item 4 — the last FakeCodec
    * modality, closed with a genuine codec and no new dependencies).
    * The staging generator writes one animated GIF per document whose
    * frame count, dims, and per-frame solid color are pure functions
    * of doc_id (GIF's palette is lossless for solid frames, so every
    * judged value is analytic); the decode side walks a genuine
    * `ImageReader` sequence — `getNumImages` + per-frame `read(f)` on
    * the RAW stored frame — so a frame-count miscount, a palette
    * corruption, or a disposal/compositing mix-up breaks the hash. */
  object VideoCodec {
    javax.imageio.ImageIO.setUseCache(false)

    /** nFrames = 2 + id%4 solid frames of (1 + id%8)×(1 + (id/8)%8),
      * frame f's color = (id·2654435761 + f·7919) mod 2²⁴. */
    def encodeGif(id: Long): Array[Byte] = {
      val w = 1 + (id % 8).toInt
      val h = 1 + ((id / 8) % 8).toInt
      val nFrames = (2 + id % 4).toInt
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val rgb = ((id * 2654435761L + f * 7919L) % 16777216L).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally { ios.close(); writer.dispose() }
      bos.toByteArray
    }

    /** Decode EVERY stored frame of a real GIF payload: frame count
      * from the reader's own sequence scan, per-frame dims + (0,0)
      * pixel from each decoded raster. `read(f)` returns the raw
      * stored frame (no animation compositing) — the right unit for a
      * frame-extraction pipeline. */
    def frames(id: Long, bytes: Array[Byte]): Seq[VideoFrame] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no JDK reader claims video payload for doc $id")
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(true)
          (0 until n).map { f =>
            val img = r.read(f)
            VideoFrame(id, f.toLong, img.getWidth.toLong, img.getHeight.toLong,
              (img.getRGB(0, 0) & 0xFFFFFF).toLong)
          }
        } finally r.dispose()
      } finally iis.close()
    }
  }

  /** Per-partition multi-frame decode — the flatMap (one payload → N
    * frame rows) twin of [[decodeMeta]]; at 100 TB this is the
    * frame-extraction pass of a video pipeline, parallelism following
    * the scan, per-task memory bounded by one payload. */
  def decodeVideoFrames(df: DataFrame): Dataset[VideoFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) => VideoCodec.frames(id, bytes) }
  }

  /** Byte-chunk sampler: emits every `stride`-th chunk of the payload
    * as a "frame" — the flatMap (UDTF-style) shape of payload
    * sampling over opaque bytes (the codec-true frame path is
    * [[decodeVideoFrames]]). */
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

  /** Perceptual-hash (dHash) image dedup kernel — the media-side twin
    * of dedup_simhash: a 64-bit difference hash over a decoded 9×8
    * grayscale raster (bit k = "pixel (x,y) brighter than its right
    * neighbour", k = y·8 + x), carried as two unsigned 32-bit halves
    * (lo = bits 0–31, hi = bits 32–63) so neither engine ever touches
    * the BIGINT sign bit.
    *
    * Fixture construction inverts the hash: [[bitsFor]] draws 64
    * md5-derived bits per image id and [[encodePng]] REALIZES them as
    * pixels (each row is a ±1 brightness walk from 128, descending
    * exactly where the bit is set), so the DuckDB oracle can
    * regenerate every hash from `md5(id)` arithmetic while the Spark
    * side must round-trip real PNG bytes through the JDK codec —
    * [[dHash]] of the decoded raster equals [[bitsFor]] iff encode →
    * PNG → decode is pixel-exact. Twins ([[twinBits]]) flip two
    * distinct bit positions (6·id+11 ≢ 0 mod 64 for any id, so the
    * planted pair distance is always exactly 2). */
  object PHash {
    // in-memory stream caches (VideoCodec sets this too, but PHash
    // must not depend on that object having been initialized first —
    // the default FILE cache would write a tmp file per image)
    javax.imageio.ImageIO.setUseCache(false)
    val W = 9; val H = 8

    /** 64 md5-derived bits for image `id` as (lo, hi) 32-bit halves:
      * bit k of half = parity of hex nibble k of md5(id ++ salt). */
    def bitsFor(id: Long): (Long, Long) = {
      def half(salt: String): Long = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest((id.toString + salt).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (0 until 32).foldLeft(0L) { (acc, k) =>
          if ((Character.digit(hex(k), 16) & 1) == 1) acc | (1L << k) else acc
        }
      }
      (half("a"), half("b"))
    }

    /** Twin bits: flip positions id%64 and (7·id+11)%64 (never equal). */
    def twinBits(id: Long, lo: Long, hi: Long): (Long, Long) = {
      def flip(l: Long, h: Long, k: Long): (Long, Long) =
        if (k < 32) (l ^ (1L << k), h) else (l, h ^ (1L << (k - 32)))
      val (l1, h1) = flip(lo, hi, id % 64)
      flip(l1, h1, (7 * id + 11) % 64)
    }

    /** 9×8 grayscale PNG whose dHash is exactly (lo, hi): each row
      * starts at 128 and walks ±1 per column — down where the bit is
      * set (left pixel brighter), up where clear. Values stay in
      * [120, 136]; PNG is lossless so decode returns them verbatim. */
    def encodePng(lo: Long, hi: Long): Array[Byte] = {
      def bit(k: Int): Boolean =
        if (k < 32) ((lo >> k) & 1L) == 1L else ((hi >> (k - 32)) & 1L) == 1L
      val img = new java.awt.image.BufferedImage(
        W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < H) {
        var v = 128
        img.setRGB(0, y, v * 0x10101)
        var x = 0
        while (x < W - 1) {
          v = if (bit(y * 8 + x)) v - 1 else v + 1
          img.setRGB(x + 1, y, v * 0x10101)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** dHash of a real decoded payload: gray value = low byte (the
      * fixture is achromatic; a production kernel would mix RGB). */
    def dHash(bytes: Array[Byte]): (Long, Long) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null && img.getWidth == W && img.getHeight == H,
        s"payload is not a ${W}x$H raster")
      var lo = 0L; var hi = 0L
      var y = 0
      while (y < H) {
        var x = 0
        while (x < W - 1) {
          val l = img.getRGB(x, y) & 0xFF
          val r = img.getRGB(x + 1, y) & 0xFF
          if (l > r) {
            val k = y * 8 + x
            if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
          }
          x += 1
        }
        y += 1
      }
      (lo, hi)
    }
  }

  /** The ONE copy of the fixture's base+twin payload rule (one base
    * image per id, plus a twin at id + 10^9 for every id % 10 == 0) —
    * phashCorpus and phashGatedCorpus both build on this so the twin
    * cadence, offset, and flip positions can never drift between the
    * dedup query and the capstone (and their two SQL oracles encode
    * the same constants). */
  private def phashPayloads(id: Long): Seq[(Long, Array[Byte])] = {
    val (lo, hi) = PHash.bitsFor(id)
    val base = (id, PHash.encodePng(lo, hi))
    if (id % 10 == 0) {
      val (tl, th) = PHash.twinBits(id, lo, hi)
      Seq(base, (id + 1000000000L, PHash.encodePng(tl, th)))
    } else Seq(base)
  }

  /** Encode the fixture image corpus for `ids` ([[phashPayloads]]'s
    * layout) and hash every payload back through the real codec:
    * returns (img_id, lo, hi) with the hash computed from DECODED
    * bytes. */
  def phashCorpus(ids: org.apache.spark.sql.Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.flatMap(boxed => phashPayloads(boxed.longValue()))
      .map { case (id, png) =>
        val (lo, hi) = PHash.dHash(png)
        (id, lo, hi)
      }.toDF("img_id", "lo", "hi")
  }

  /** The multimodal-capstone corpus: [[phashPayloads]]'s layout,
    * except every id % 13 == 7 payload is PLANTED JUNK (md5-derived
    * bytes) and junk ids get no twin. The decode GATE is judged for
    * real: each payload round-trips the actual codec and only
    * decodable 9×8 rasters survive — a payload emitted for a junk id,
    * or a valid image dropped, each changes the downstream row set
    * and breaks the capstone hash. A reader CLAIMING junk bytes (a
    * magic-number coincidence in the md5 prefix — BMP's 'BM', JPEG's
    * FFD8 — odds ~2^-16 per junk id, certain to occur at corpus
    * scale) throws from read() rather than returning null, so decode
    * exceptions gate the row exactly like a null decode instead of
    * failing the task. Returns (img_id, w, h, lo, hi) for
    * survivors. */
  def phashGatedCorpus(ids: org.apache.spark.sql.Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.flatMap { boxed =>
      val id = boxed.longValue()
      if (id % 13 == 7) {
        // junk: 64 md5 bytes (no valid image STRUCTURE, though a
        // 2-byte magic prefix can collide — see the gate below)
        val md = java.security.MessageDigest.getInstance("MD5")
        val junk = (0 until 4).flatMap(i =>
          md.digest(s"junk-$id-$i".getBytes("UTF-8")).toSeq).toArray
        Seq((id, junk))
      } else phashPayloads(id)
    }.flatMap { case (id, bytes) =>
      // the gate: a genuine decode attempt, not an arithmetic check;
      // a throwing reader (claimed-but-garbage payload) gates the row
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null || img.getWidth != PHash.W || img.getHeight != PHash.H) None
      else {
        val (lo, hi) = PHash.dHash(bytes)
        Some((id, img.getWidth.toLong, img.getHeight.toLong, lo, hi))
      }
    }.toDF("img_id", "w", "h", "lo", "hi")
  }
}
