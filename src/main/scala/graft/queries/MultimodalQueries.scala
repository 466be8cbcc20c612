package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaRecord, Multimodal}

/** Multimodal-pipeline queries over real encoded media (24-bit BMP for
  * image/video, 16-bit PCM WAV for audio) derived deterministically from
  * `documents`. Because the encoded content is a pure function of
  * (media_id, unit index), DuckDB predicts the exact container byte
  * lengths (q_media_meta) and the exact decoded pixel/sample statistics
  * (q_media_features) in closed form — so the whole encode→JDK-decode
  * round trip is oracle-checked, not just the plumbing.
  */
object MultimodalQueries {

  def defs: Map[String, QueryDef] = Map(
    // Container metadata + MEASURED byte length of the real encoded
    // payload vs DuckDB's closed-form BMP/WAV size arithmetic: a hash
    // match proves the writers emit exactly the documented file layout.
    "q_media_meta" -> QueryDef(
      (s, dir) => Multimodal.encodeMedia(
        Multimodal.mediaTable(Tables.load(s, dir, "documents")))
        .toDF()
        .select(col("media_id"), col("kind"),
          length(col("bytes")).cast("long").as("byte_len"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.durationMs").as("duration_ms")),
      Some("""SELECT doc_id AS media_id,
        ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        CAST(CASE WHEN doc_id % 3 = 1 THEN 44 + 2 * (n_chars + 16)
             ELSE 54 + ((3 * (16 + (n_chars % 16) * 2) + 3) // 4) * 4
                       * (16 + (n_chars % 12) * 2) END AS BIGINT) AS byte_len,
        CAST(16 + (n_chars % 16) * 2 AS INTEGER) AS width,
        CAST(16 + (n_chars % 12) * 2 AS INTEGER) AS height,
        CAST(n_chars * 20 AS BIGINT) AS duration_ms
        FROM documents""")),

    // Frame sampling: explode over deterministic frame indices —
    // oracle-checked, bytes never materialized (the metadata-only media
    // table carries no payload column at all).
    "q_media_frames" -> QueryDef(
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.mediaTable(Tables.load(s, dir, "documents")),
        1000L),
      Some("""SELECT doc_id AS media_id,
        CAST(unnest(generate_series(0, CAST(floor((n_chars * 20 - 1) / 1000) AS BIGINT))) AS INTEGER) AS frame_idx,
        unnest(generate_series(0, CAST(floor((n_chars * 20 - 1) / 1000) AS BIGINT))) * 1000 AS frame_ts_ms
        FROM documents WHERE doc_id % 3 = 2""")),

    // Full decode path through the JDK codecs (ImageIO for BMP,
    // AudioSystem for WAV), one codec instance per partition: exact
    // integer unit stats, matched against DuckDB's closed-form
    // reconstruction of the encoded content.
    "q_media_features" -> QueryDef(
      (s, dir) => Multimodal.decodeStats(
        Multimodal.encodeMedia(
          Multimodal.mediaTable(Tables.load(s, dir, "documents"))))
        .toDF(),
      Some("""WITH m AS (
          SELECT doc_id, doc_id % 3 AS k,
            CASE WHEN doc_id % 3 = 1 THEN n_chars + 16
                 ELSE (16 + (n_chars % 16) * 2) * (16 + (n_chars % 12) * 2)
            END AS n_units
          FROM documents),
        u AS (
          SELECT doc_id, k, unnest(generate_series(0, n_units - 1)) AS i
          FROM m),
        v AS (
          SELECT doc_id,
            CASE WHEN k = 1 THEN (doc_id * 31 + i * 7) % 4096 - 2048
                 ELSE (doc_id * 31 + i * 7) % 256 END AS val
          FROM u)
        SELECT doc_id AS media_id,
          CAST(count(*) AS BIGINT) AS unit_count,
          CAST(sum(val) AS BIGINT) AS unit_sum,
          CAST(min(val) AS BIGINT) AS unit_min,
          CAST(max(val) AS BIGINT) AS unit_max
        FROM v GROUP BY doc_id"""),
      bench = true),

    // Quarantine path: payloads of every 50th doc are deterministically
    // truncated to 10 bytes — neither JDK codec can read them — and the
    // decode stage must flag, not fail. Per-kind totals oracle-checked.
    "q_media_quarantine" -> QueryDef(
      (s, dir) => {
        import org.apache.spark.sql.Encoders
        implicit val enc = Encoders.product[MediaRecord]
        val media = Multimodal.encodeMedia(
          Multimodal.mediaTable(Tables.load(s, dir, "documents")))
          .map(r => if (r.media_id % 50 == 0)
            r.copy(bytes = r.bytes.take(10)) else r)
        Multimodal.decodeQuarantine(media).toDF()
          .groupBy("kind")
          .agg(count(lit(1)).as("n_total"),
            count(when(col("ok"), 1)).as("n_ok"),
            count(when(!col("ok"), 1)).as("n_quarantined"))
      },
      Some("""SELECT
        ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        count(*) AS n_total,
        count(*) FILTER (WHERE doc_id % 50 <> 0) AS n_ok,
        count(*) FILTER (WHERE doc_id % 50 = 0) AS n_quarantined
        FROM documents GROUP BY 1""")),

    // Perceptual image dedup: aHash over the REAL decode path (encode ->
    // JDK ImageIO -> 8x8 integer-exact block bits), clustered by hash.
    // The oracle recomputes the hash from the closed-form pixel function
    // — so a hash match proves the whole codec round trip AND the
    // binning/threshold arithmetic, per image. Dedup itself is a window
    // over the 64-bit key: the shuffle carries (hash, id), never pixels.
    "q_media_phash" -> QueryDef(
      (s, dir) => {
        val hashes = Multimodal.perceptualHash(Multimodal.encodeMedia(
          Multimodal.mediaTable(Tables.load(s, dir, "documents"))))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("ahash")
        hashes.select(col("media_id"), col("ahash"),
          count(lit(1)).over(w).as("n_same"),
          min("media_id").over(w).as("rep_id"))
      },
      Some("""WITH m AS (SELECT doc_id,
            16 + (n_chars % 16) * 2 AS w, 16 + (n_chars % 12) * 2 AS h
          FROM documents WHERE doc_id % 3 <> 1),
        px AS (SELECT doc_id, w, h, i % w AS x, i // w AS y,
            (doc_id * 31 + i * 7) % 256 AS g
          FROM m, unnest(generate_series(0, w * h - 1)) AS t(i)),
        bk AS (SELECT doc_id, (y * 8 // h) * 8 + (x * 8 // w) AS blk,
            sum(g) AS bs, count(*) AS bn
          FROM px GROUP BY 1, 2),
        tot AS (SELECT doc_id, sum(bs) AS ts, sum(bn) AS tn
          FROM bk GROUP BY 1),
        hs AS (SELECT b.doc_id,
            string_agg(CASE WHEN b.bs * t.tn > t.ts * b.bn
              THEN '1' ELSE '0' END, '' ORDER BY b.blk) AS ahash
          FROM bk b JOIN tot t USING (doc_id) GROUP BY b.doc_id)
        SELECT doc_id AS media_id, ahash,
          CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_same,
          CAST(min(doc_id) OVER (PARTITION BY ahash) AS BIGINT) AS rep_id
        FROM hs""")),

    // Audio dedup fingerprint — the WAV face of q_media_phash: 64
    // time-window energy bits over the real AudioSystem decode, same
    // integer-exact comparisons, oracle reconstructing the samples in
    // closed form (abs of the signed 16-bit value).
    "q_media_audiohash" -> QueryDef(
      (s, dir) => {
        val hashes = Multimodal.audioHash(Multimodal.encodeMedia(
          Multimodal.mediaTable(Tables.load(s, dir, "documents"))))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("ahash")
        hashes.select(col("media_id"), col("ahash"),
          count(lit(1)).over(w).as("n_same"),
          min("media_id").over(w).as("rep_id"))
      },
      Some("""WITH m AS (SELECT doc_id, n_chars + 16 AS n
          FROM documents WHERE doc_id % 3 = 1),
        sm AS (SELECT doc_id, i * 64 // n AS w,
            abs((doc_id * 31 + i * 7) % 4096 - 2048) AS a
          FROM m, unnest(generate_series(0, n - 1)) AS t(i)),
        bk AS (SELECT doc_id, w, sum(a) AS bs, count(*) AS bn
          FROM sm GROUP BY 1, 2),
        tot AS (SELECT doc_id, sum(bs) AS ts, sum(bn) AS tn
          FROM bk GROUP BY 1),
        hs AS (SELECT b.doc_id,
            string_agg(CASE WHEN b.bs * t.tn > t.ts * b.bn
              THEN '1' ELSE '0' END, '' ORDER BY b.w) AS ahash
          FROM bk b JOIN tot t USING (doc_id) GROUP BY b.doc_id)
        SELECT doc_id AS media_id, ahash,
          CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_same,
          CAST(min(doc_id) OVER (PARTITION BY ahash) AS BIGINT) AS rep_id
        FROM hs""")))
}
