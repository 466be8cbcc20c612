package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque binary payloads with
  * typed metadata, processed by per-partition "decoders".
  *
  * The DECODE MATH here is a deliberate, clearly-marked STUB (this
  * container has no image/audio codecs): `FakeDecoder` derives
  * deterministic features from the bytes. Everything around it — the
  * schema, the typed Dataset plumbing, the mapPartitions batching with
  * one decoder instance per partition, the frame-sampling explode — is
  * the real production shape: at 100 TB you swap `FakeDecoder` for a JNI
  * codec and nothing else changes.
  *
  * Scale notes:
  *  - One decoder per PARTITION, not per row (mapPartitions): codec/model
  *    init is amortized over ~maxPartitionBytes of media.
  *  - Binary payloads stay columnar in parquet; metadata-only transforms
  *    (resize plan, frame index computation) never touch the bytes, so
  *    column pruning keeps them off the wire.
  */
final case class MediaMeta(
    format: String, width: Int, height: Int, durationMs: Long)

final case class MediaRecord(
    media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

final case class MediaFeatures(media_id: Long, features: Array[Float])

final case class MediaFrame(
    media_id: Long, frame_idx: Int, frame_ts_ms: Long)

/** STUB decoder — stands in for a real image/audio codec. Deterministic:
  * feature i is a 64-bit FNV-1a hash of (bytes, i) scaled into [0, 1).
  */
final class FakeDecoder private () {
  def features(bytes: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim) { i =>
      var h = 0xcbf29ce484222325L ^ i.toLong
      var j = 0
      while (j < bytes.length) {
        h ^= bytes(j); h *= 0x100000001b3L; j += 1
      }
      ((h >>> 11) % 1000000L).toFloat / 1000000.0f
    }
}

object FakeDecoder {
  /** Per-partition "open" — the hook where a real codec would load. */
  def open(): FakeDecoder = new FakeDecoder()
}

object Multimodal {

  implicit private val encRecord: Encoder[MediaRecord] =
    Encoders.product[MediaRecord]
  implicit private val encFeatures: Encoder[MediaFeatures] =
    Encoders.product[MediaFeatures]

  /** Derive a deterministic media table from the documents fixture: the
    * payload is the utf-8 text (a stand-in blob); metadata is a pure
    * function of doc fields so the DuckDB oracle can reproduce it.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        lit("raw").as("format"),
        (lit(64) + (col("n_chars") % 64) * 8).cast("int").as("width"),
        (lit(64) + (col("n_chars") % 48) * 8).cast("int").as("height"),
        (col("n_chars") * 20).cast("long").as("durationMs")).as("meta"))

  /** Batched feature extraction: one decoder per partition, features as
    * array<float> — the UDF signature and batch shape of a real decode
    * stage.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      val decoder = FakeDecoder.open() // once per partition
      it.map(r => MediaFeatures(r.media_id, decoder.features(r.bytes, dim)))
    }

  /** Resize plan: metadata-only transform — bytes column untouched, so
    * parquet column pruning skips the payload entirely when downstream
    * only reads metadata.
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
