package graft.multimodal

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque binary payloads with
  * typed metadata, processed by per-partition codec instances.
  *
  * The media fixture is REAL encoded media: images/videos are 24-bit
  * uncompressed BMP files (written by [[MediaCodecs.encodeBmp]]), audio is
  * 16-bit PCM mono WAV (written by [[MediaCodecs.encodeWav]]). The decode
  * path runs the JDK's actual codecs — `javax.imageio.ImageIO` for BMP,
  * `javax.sound.sampled.AudioSystem` for WAV — NOT a stub. Because the
  * encoded content is a pure function of (media_id, unit index), both the
  * exact file byte length and the exact per-pixel/per-sample statistics
  * are closed-form SQL, so the full encode→decode round trip is
  * oracle-checked by DuckDB (q_media_meta, q_media_features).
  *
  * Scale notes:
  *  - One codec instance per PARTITION, not per row (mapPartitions):
  *    codec/model init is amortized over ~maxPartitionBytes of media. At
  *    100 TB the fixture generator is replaced by a parquet scan of real
  *    payloads and `MediaDecoder` by a JNI codec — the Spark plumbing
  *    (schema, batching, partitioning) is unchanged.
  *  - Binary payloads stay columnar in parquet; metadata-only transforms
  *    (resize plan, frame index computation) work on [[Multimodal.mediaTable]]
  *    which carries NO bytes column at all, so the payload never reaches
  *    the wire for those queries.
  */
final case class MediaMeta(
    format: String, width: Int, height: Int, durationMs: Long)

/** Metadata-only row describing one media object to encode (`n_samples`
  * is the PCM sample budget for audio rows; ignored for bmp rows).
  */
final case class MediaSpec(
    media_id: Long, kind: String, meta: MediaMeta, n_samples: Long)

final case class MediaRecord(
    media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

/** Exact integer decode statistics over the media's units (pixels for
  * bmp, samples for wav) — oracle-comparable, no floating point.
  */
final case class MediaStats(
    media_id: Long, unit_count: Long, unit_sum: Long,
    unit_min: Long, unit_max: Long)

/** Per-row decode outcome for the quarantine path: corrupt payloads are
  * flagged, never thrown — at 100 TB some fraction of payloads WILL be
  * undecodable and one bad row must not fail the job.
  */
final case class MediaDecodeOutcome(
    media_id: Long, kind: String, ok: Boolean, err: String,
    unit_count: Long, unit_sum: Long, unit_min: Long, unit_max: Long)

/** Deterministic encoders for the two container formats plus their
  * closed-form size arithmetic (mirrored in the DuckDB oracles).
  */
object MediaCodecs {

  /** Content functions: unit i of media `id`. Pure integer arithmetic so
    * DuckDB reproduces them exactly.
    */
  def pixelValue(id: Long, i: Long): Int = ((id * 31 + i * 7) % 256).toInt
  def sampleValue(id: Long, i: Long): Int =
    ((id * 31 + i * 7) % 4096).toInt - 2048

  /** 24-bit BMP row stride is padded to a 4-byte boundary. */
  def bmpRowSize(w: Int): Int = ((3 * w + 3) / 4) * 4
  def bmpByteLen(w: Int, h: Int): Int = 54 + bmpRowSize(w) * h
  def wavByteLen(n: Long): Long = 44 + 2 * n

  private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }

  /** A complete, valid 24-bit uncompressed (BI_RGB) BMP: 14-byte file
    * header + 40-byte BITMAPINFOHEADER + bottom-up padded BGR rows.
    * Gray pixel at row-major index i = y*w + x carries `pixel(i)`.
    */
  def encodeBmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val rowSize = bmpRowSize(w)
    val dataSize = rowSize * h
    val b = new Array[Byte](54 + dataSize)
    b(0) = 'B'; b(1) = 'M'
    putInt(b, 2, 54 + dataSize); putInt(b, 10, 54)
    putInt(b, 14, 40); putInt(b, 18, w); putInt(b, 22, h)
    b(26) = 1; b(28) = 24 // planes=1, bpp=24, compression=0 (BI_RGB)
    putInt(b, 34, dataSize)
    putInt(b, 38, 2835); putInt(b, 42, 2835) // 72 dpi
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * rowSize // bottom-up storage
      var x = 0
      while (x < w) {
        val v = pixelValue(id, y.toLong * w + x).toByte
        val o = rowOff + 3 * x
        b(o) = v; b(o + 1) = v; b(o + 2) = v
        x += 1
      }
      y += 1
    }
    b
  }

  /** A complete RIFF/WAVE container: PCM_SIGNED, 16-bit little-endian,
    * mono, 8 kHz; sample i carries `sampleValue(id, i)`.
    */
  def encodeWav(id: Long, n: Int): Array[Byte] = {
    val b = new Array[Byte](44 + 2 * n)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putInt(b, 4, 36 + 2 * n)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    putInt(b, 16, 16)
    b(20) = 1; b(22) = 1 // PCM, mono
    putInt(b, 24, 8000); putInt(b, 28, 16000) // rate, byte rate
    b(32) = 2; b(34) = 16 // block align, bits
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    putInt(b, 40, 2 * n)
    var i = 0
    while (i < n) {
      val s = sampleValue(id, i)
      b(44 + 2 * i) = s.toByte; b(45 + 2 * i) = (s >> 8).toByte
      i += 1
    }
    b
  }
}

/** Real decode via the JDK codecs. One instance per partition (the
  * `open()` hook is where a heavyweight codec/model would load once and
  * be reused for every row of the partition) — and the BMP ImageReader
  * IS reused across the partition's rows: `ImageIO.read` would do an
  * SPI lookup and allocate a fresh reader per image, which dominates
  * decode cost for small images.
  */
final class MediaDecoder private () {

  // one reader for the whole partition; setInput rebinds it per image
  private val bmpReader =
    javax.imageio.ImageIO.getImageReadersByFormatName("bmp").next()

  /** Decode a WAV payload to PCM bytes, VALIDATING the container format:
    * the sample loops below assume 16-bit little-endian signed PCM mono,
    * and a valid-but-different WAV (8-bit, big-endian, stereo) would
    * otherwise silently decode to garbage samples and a wrong
    * fingerprint. Mirrors the require in image(); the quarantine path
    * turns the throw into a flagged row.
    */
  private def pcmBytes(r: MediaRecord): Array[Byte] = {
    val ais = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new ByteArrayInputStream(r.bytes))
    try {
      val f = ais.getFormat
      require(
        f.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16 && !f.isBigEndian &&
          f.getChannels == 1,
        s"media ${r.media_id}: unsupported wav format ($f) — decoder " +
          "requires 16-bit little-endian signed PCM mono")
      ais.readAllBytes()
    } finally ais.close()
  }

  /** Decode a WAV payload to its 16-bit little-endian samples. */
  def samples(r: MediaRecord): Array[Short] = {
    val data = pcmBytes(r)
    val out = new Array[Short](data.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
      i += 1
    }
    out
  }

  /** Decode a BMP payload with the partition-shared reader. */
  def image(r: MediaRecord): java.awt.image.BufferedImage = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(r.bytes))
    val img =
      try {
        bmpReader.setInput(iis)
        bmpReader.read(0)
      } finally iis.close()
    require(img != null, s"undecodable bmp payload for media ${r.media_id}")
    img
  }

  /** Exact integer stats over decoded units: pixels (gray channel of
    * the decoded image) for bmp media, 16-bit samples for wav.
    */
  def stats(r: MediaRecord): MediaStats = r.meta.format match {
    case "wav" =>
      val data = pcmBytes(r)
      val n = data.length / 2
      var i = 0; var sum = 0L
      var min = Long.MaxValue; var max = Long.MinValue
      while (i < n) {
        val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toLong
        sum += s; if (s < min) min = s; if (s > max) max = s
        i += 1
      }
      MediaStats(r.media_id, n.toLong, sum, min, max)
    case _ =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(r.bytes))
      val img =
        try {
          bmpReader.setInput(iis)
          bmpReader.read(0)
        } finally iis.close()
      require(img != null, s"undecodable bmp payload for media ${r.media_id}")
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L; var min = Long.MaxValue; var max = Long.MinValue
      img.getRaster.getDataBuffer match {
        // 24-bit BMPs decode to TYPE_3BYTE_BGR: walk the raw byte
        // buffer directly (any channel — the pixels are gray). A
        // per-pixel getRGB walk pays a ColorModel conversion per call.
        case db: java.awt.image.DataBufferByte
            if img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
              db.getData.length == w * h * 3 => // no scanline padding
          val bytes = db.getData
          var i = 0
          while (i < bytes.length) {
            val v = (bytes(i) & 0xff).toLong
            sum += v; if (v < min) min = v; if (v > max) max = v
            i += 3
          }
        case _ =>
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = (img.getRGB(x, y) & 0xff).toLong
              sum += v; if (v < min) min = v; if (v > max) max = v
              x += 1
            }
            y += 1
          }
      }
      MediaStats(r.media_id, w.toLong * h, sum, min, max)
  }
}

object MediaDecoder {
  /** Per-partition "open" — the hook where a real heavyweight codec
    * would initialize.
    */
  def open(): MediaDecoder = {
    // ImageIO must not try to reach a display pipeline on executors.
    System.setProperty("java.awt.headless", "true")
    new MediaDecoder()
  }
}

/** Exact 128-bit comparison a*b > c*d for NON-NEGATIVE longs — the
  * fingerprint bit tests below compare blockSum*totalCount against
  * totalSum*blockCount, whose 64-bit products overflow for ~>45 min of
  * 48 kHz audio (or gigapixel images); Math.multiplyHigh keeps the
  * comparison exact at any length instead of silently flipping bits.
  */
private[graft] object ExactCmp {
  def productGreater(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }
}

/** Audio energy fingerprint: 64 equal time windows (window of sample i
  * = i*64/n), each bit = "window mean |amplitude| strictly above the
  * global mean |amplitude|", same integer-exact cross-product
  * comparison as AHash. Windows that receive no samples (only when
  * n < 64) emit no bit — mirrored by the oracle's group-by, which
  * produces rows only for observed windows.
  */
private[multimodal] object AudioHash {
  def of(mediaId: Long, samples: Array[Short]): (Long, String) = {
    val n = samples.length
    val bs = new Array[Long](64)
    val bn = new Array[Long](64)
    var i = 0
    while (i < n) {
      val w = (i.toLong * 64 / n).toInt
      bs(w) += math.abs(samples(i).toLong)
      bn(w) += 1
      i += 1
    }
    val ts = bs.sum
    val tn = bn.sum
    val sb = new java.lang.StringBuilder(64)
    var b = 0
    while (b < 64) {
      if (bn(b) > 0)
        sb.append(
          if (ExactCmp.productGreater(bs(b), tn, ts, bn(b))) '1' else '0')
      b += 1
    }
    (mediaId, sb.toString)
  }
}

/** Average-hash (aHash) perceptual fingerprint of a decoded image: the
  * 8x8 grid of block means, each bit = "block mean strictly above the
  * global mean", emitted as a 64-char '0'/'1' string in block
  * row-major order. All comparisons are exact integer cross products
  * (blockSum * totalPixels > totalSum * blockPixels) — no floating
  * point, so any engine computing from the same pixels gets the same
  * hash bit-for-bit.
  */
private[multimodal] object AHash {
  def of(mediaId: Long, img: java.awt.image.BufferedImage): (Long, String) = {
    val (w, h) = (img.getWidth, img.getHeight)
    require(w >= 8 && h >= 8, s"aHash needs >=8x8, got ${w}x$h for $mediaId")
    val bs = new Array[Long](64)
    val bn = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // getRGB handles BMP scanline padding and bottom-up storage;
        // at 8x8-block granularity the per-call ColorModel cost is
        // dwarfed by the decode itself
        val g = (img.getRGB(x, y) & 0xff).toLong
        val blk = (y * 8 / h) * 8 + (x * 8 / w)
        bs(blk) += g
        bn(blk) += 1
        x += 1
      }
      y += 1
    }
    val ts = bs.sum
    val tn = bn.sum
    val sb = new java.lang.StringBuilder(64)
    var b = 0
    while (b < 64) {
      sb.append(
        if (ExactCmp.productGreater(bs(b), tn, ts, bn(b))) '1' else '0')
      b += 1
    }
    (mediaId, sb.toString)
  }
}

object Multimodal {

  implicit private val encSpec: Encoder[MediaSpec] =
    Encoders.product[MediaSpec]
  implicit private val encRecord: Encoder[MediaRecord] =
    Encoders.product[MediaRecord]
  implicit private val encStats: Encoder[MediaStats] =
    Encoders.product[MediaStats]

  /** Metadata-only media table derived from the documents fixture — NO
    * bytes column, so metadata queries (frames, resize plans) prune the
    * payload entirely. All fields are pure column expressions the DuckDB
    * oracle reproduces.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      struct(
        when(col("doc_id") % 3 === 1, lit("wav")).otherwise(lit("bmp"))
          .as("format"),
        (lit(16) + (col("n_chars") % 16) * 2).cast("int").as("width"),
        (lit(16) + (col("n_chars") % 12) * 2).cast("int").as("height"),
        (col("n_chars") * 20).cast("long").as("durationMs")).as("meta"),
      (col("n_chars") + 16).cast("long").as("n_samples"))

  /** Materialize real encoded payloads (BMP for image/video, WAV for
    * audio) — one encoder pass per partition. Fixture-generation stage:
    * at production scale the bytes arrive from parquet instead and this
    * stage disappears; everything downstream is unchanged.
    */
  def encodeMedia(table: DataFrame): Dataset[MediaRecord] =
    table.as[MediaSpec].mapPartitions { it =>
      it.map { s =>
        val bytes =
          if (s.meta.format == "wav")
            MediaCodecs.encodeWav(s.media_id, s.n_samples.toInt)
          else MediaCodecs.encodeBmp(s.media_id, s.meta.width, s.meta.height)
        MediaRecord(s.media_id, s.kind, bytes, s.meta)
      }
    }

  /** Batched real decode: one JDK codec instance per partition, exact
    * integer stats out — the UDF signature and batch shape of a real
    * decode stage, with oracle-checkable output.
    */
  def decodeStats(media: Dataset[MediaRecord]): Dataset[MediaStats] =
    media.mapPartitions { it =>
      val decoder = MediaDecoder.open() // once per partition
      it.map(decoder.stats)
    }

  /** Perceptual fingerprints for the BMP media (image + video kinds):
    * real JDK decode per partition, then the integer-exact aHash. The
    * downstream dedup move is the usual one — group or self-join on the
    * hash (a 64-bit key), never pixels; near-dup at Hamming<=k rides the
    * same 16-bit pigeonhole banding as q_simhash if ever needed.
    */
  def perceptualHash(media: Dataset[MediaRecord]): DataFrame = {
    implicit val enc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    media.mapPartitions { it =>
      val decoder = MediaDecoder.open()
      it.filter(_.meta.format == "bmp")
        .map(r => AHash.of(r.media_id, decoder.image(r)))
    }.toDF("media_id", "ahash")
  }

  /** Audio fingerprints for the WAV media: real decode, then the
    * 64-window integer-exact energy hash — the audio face of
    * [[perceptualHash]], same dedup move on the same key shape.
    */
  def audioHash(media: Dataset[MediaRecord]): DataFrame = {
    implicit val enc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    media.mapPartitions { it =>
      val decoder = MediaDecoder.open()
      it.filter(_.meta.format == "wav")
        .map(r => AudioHash.of(r.media_id, decoder.samples(r)))
    }.toDF("media_id", "ahash")
  }

  /** Quarantining decode: per-partition codec as in [[decodeStats]], but
    * an undecodable payload yields a flagged row (truncated error text,
    * zeroed stats) instead of failing the task. The good-path output is
    * bit-identical to decodeStats.
    */
  def decodeQuarantine(media: Dataset[MediaRecord])
      : Dataset[MediaDecodeOutcome] = {
    implicit val enc: Encoder[MediaDecodeOutcome] =
      Encoders.product[MediaDecodeOutcome]
    media.mapPartitions { it =>
      val decoder = MediaDecoder.open()
      it.map { r =>
        try {
          val s = decoder.stats(r)
          MediaDecodeOutcome(r.media_id, r.kind, ok = true, "",
            s.unit_count, s.unit_sum, s.unit_min, s.unit_max)
        } catch {
          case scala.util.control.NonFatal(e) =>
            MediaDecodeOutcome(r.media_id, r.kind, ok = false,
              s"${e.getClass.getSimpleName}: ${e.getMessage}".take(200),
              0L, 0L, 0L, 0L)
        }
      }
    }
  }

  /** Resize plan: metadata-only transform — payload column (if any)
    * untouched, so parquet column pruning skips it entirely when
    * downstream only reads metadata.
    */
  def resizePlan(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(
        col("meta.format"),
        lit(w).as("width"),
        lit(h).as("height"),
        col("meta.durationMs")))

  /** Frame sampling for video rows: one output row per sampled frame
    * (explode over the deterministic frame index range; no bytes read).
    * Zero-duration media yields no frames: `(0-1) div everyMs` truncates
    * to 0 (one spurious frame) while floor division gives -1 (none), so
    * the filter keeps both engines — and common sense — agreeing.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.where(col("kind") === "video" && col("meta.durationMs") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L),
          expr(s"(meta.durationMs - 1) div $everyMs"))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        (col("frame_idx") * everyMs).as("frame_ts_ms"))
}
