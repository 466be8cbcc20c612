package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaRecord, Multimodal}

/** Multimodal-pipeline queries over the synthetic media table derived
  * from `documents` (payload = utf-8 text; metadata = pure function of
  * doc fields, so the metadata path is fully oracle-checked while the
  * stubbed byte-decode path is rows-only).
  */
object MultimodalQueries {

  def defs: Map[String, QueryDef] = Map(
    // Metadata path: schema + derivations, no byte access — oracle-checked.
    "q_media_meta" -> QueryDef(
      (s, dir) => Multimodal.mediaFromDocuments(
        Tables.load(s, dir, "documents"))
        .select(col("media_id"), col("kind"),
          length(col("bytes")).cast("long").as("byte_len"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.durationMs").as("duration_ms")),
      Some("""SELECT doc_id AS media_id,
        ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        CAST(strlen(text) AS BIGINT) AS byte_len,
        CAST(64 + (n_chars % 64) * 8 AS INTEGER) AS width,
        CAST(64 + (n_chars % 48) * 8 AS INTEGER) AS height,
        CAST(n_chars * 20 AS BIGINT) AS duration_ms
        FROM documents""")),

    // Frame sampling: explode over deterministic frame indices —
    // oracle-checked, bytes never read (column pruning keeps the payload
    // out of the scan).
    "q_media_frames" -> QueryDef(
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents")),
        1000L),
      Some("""SELECT doc_id AS media_id,
        CAST(unnest(generate_series(0, CAST(floor((n_chars * 20 - 1) / 1000) AS BIGINT))) AS INTEGER) AS frame_idx,
        unnest(generate_series(0, CAST(floor((n_chars * 20 - 1) / 1000) AS BIGINT))) * 1000 AS frame_ts_ms
        FROM documents WHERE doc_id % 3 = 2""")),

    // Byte-decode path through the per-partition stub decoder: rows-only
    // check (the FNV feature math runs JVM-side, not in SQL).
    "q_media_features" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.Encoders
        val media = Multimodal.mediaFromDocuments(
          Tables.load(s, dir, "documents"))
          .as[MediaRecord](Encoders.product[MediaRecord])
        Multimodal.extractFeatures(media, 8).toDF()
          .select(col("media_id"),
            Det.r4(graft.functions.VectorFunctions.norm(col("features")))
              .as("feature_norm"))
      },
      None,
      bench = true))
}
