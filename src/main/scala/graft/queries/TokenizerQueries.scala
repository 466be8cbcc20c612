package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE tokenizer queries over the `documents` table — trainer, encoder,
  * and their oracled anchors (see graft.operators.Bpe for the scale
  * contract: one corpus pass, vocabulary-sized training rounds, map-only
  * encode).
  *
  * Oracle strategy, same pattern as the LSH family: the iterative merge
  * loop is not SQL-expressible (each round's argmax feeds the next
  * round's frame), so the trainer itself is pinned by BpeSpec against an
  * in-spec reference implementation, while the two stages that ARE
  * SQL-expressible get hard DuckDB anchors:
  *   - q_bpe_pairs: the weighted pair-count frame every round aggregates
  *     (round-0 instance).
  *   - q_bpe_merge1: one full training round — argmax pair selection AND
  *     its application — via DuckDB `replace` (left-to-right
  *     non-overlapping, exactly BpeMergeAdjacent's consumption order).
  */
object TokenizerQueries {

  private val oracleWords =
    """SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
         t -> len(t) > 0)) AS word FROM documents"""

  private val oraclePairAgg =
    s"""wc AS (SELECT word, count(*) AS cnt FROM w GROUP BY 1),
        p AS (SELECT substr(word, CAST(i AS INTEGER), 1) AS l,
                     substr(word, CAST(i AS INTEGER) + 1, 1) AS r, cnt
              FROM wc, unnest(generate_series(1, len(word) - 1)) AS t(i)
              WHERE len(word) >= 2),
        agg AS (SELECT l, r, CAST(sum(cnt) AS BIGINT) AS n
                FROM p GROUP BY 1, 2)"""

  def defs: Map[String, QueryDef] = Map(
    // Round-0 adjacent-pair counts weighted by word frequency — the
    // exact frame Bpe.train aggregates before its first argmax.
    "q_bpe_pairs" -> QueryDef(
      (s, dir) => Bpe.pairCounts(
        Bpe.wordCounts(Tables.load(s, dir, "documents"), col("text")))
        .select(col("l"), col("r"), col("n").cast("long").as("n")),
      Some(s"""WITH w AS ($oracleWords), $oraclePairAgg
        SELECT l, r, n FROM agg""")),

    // ONE full training round, cross-engine: pick the argmax pair
    // (count desc, then lexicographic) and apply it to every word;
    // report per-document symbol counts before/after. DuckDB applies
    // the merge with `replace` — for single-char pairs its left-to-right
    // non-overlapping scan is exactly BpeMergeAdjacent's greedy order
    // (["a","a","a"] -> 2 symbols either way).
    "q_bpe_merge1" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val top = Bpe.train(Bpe.wordCounts(docs, col("text")), nMerges = 1)
        // empty corpus degenerates to a no-op merge pair that matches
        // nothing; the oracle's CROSS JOIN best would yield zero rows,
        // so keep the fixture assumption explicit instead of silent
        require(top.nonEmpty, "q_bpe_merge1 requires a non-empty corpus")
        val (l, r) = (top.head.left, top.head.right)
        val toks = graft.functions.TextFunctions.tokens(col("text"))
        docs.select(col("doc_id"),
          size(toks).cast("long").as("n_words"),
          aggregate(toks, lit(0L), (a, t) => a + length(t)).as("n_syms"),
          aggregate(toks, lit(0L), (a, t) => a + size(
            graft.expressions.BpeMergeAdjacent(split(t, ""), l, r)))
            .as("n_merged"))
      },
      Some(s"""WITH w AS ($oracleWords), $oraclePairAgg,
        best AS (SELECT l, r FROM agg ORDER BY n DESC, l, r LIMIT 1),
        per AS (SELECT w.doc_id,
            count(*) AS n_words,
            sum(len(w.word)) AS n_syms,
            sum(len(w.word) -
              (len(w.word) - len(replace(w.word, b.l || b.r, ''))) // 2)
              AS n_merged
          FROM w CROSS JOIN best b GROUP BY 1)
        SELECT d.doc_id,
          CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
          CAST(coalesce(p.n_syms, 0) AS BIGINT) AS n_syms,
          CAST(coalesce(p.n_merged, 0) AS BIGINT) AS n_merged
        FROM documents d LEFT JOIN per p USING (doc_id)""")),

    // Out-of-vocabulary rate under a FIXED-COUNT top-K vocabulary (the
    // tokenizer-budget planning metric): K=24 here so the cut bites on
    // the fixture; the vocab is a K-row broadcast AT ANY CORPUS SIZE
    // (count-desc, token-asc deterministic tiebreak — the q_top_tokens
    // contract), and the scoring pass is one scan + one broadcast
    // anti-probe folded into the per-doc aggregation.
    "q_oov_rate" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val vocab = Bpe.wordCounts(docs, col("text"))
          .orderBy(col("cnt").desc, col("word").asc)
          .limit(24).select("word")
        val toks = docs.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
        toks.join(broadcast(vocab.withColumn("in_v", lit(true))),
            Seq("word"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            Det.r4(col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
      },
      Some(s"""WITH w AS ($oracleWords),
        vocab AS (SELECT word FROM (
            SELECT word, count(*) AS cnt FROM w GROUP BY 1)
          ORDER BY cnt DESC, word LIMIT 24),
        per AS (SELECT w.doc_id,
            count(*) AS n_tokens,
            sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS n_oov
          FROM w LEFT JOIN vocab v USING (word) GROUP BY 1)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
          CAST(n_oov AS BIGINT) AS n_oov,
          ${Det.sqlR4("CAST(n_oov AS DOUBLE) / n_tokens")} AS oov_rate
        FROM per""")),

    // The learned merge table (32 merges on this corpus's vocabulary),
    // via the production trainLocal path (one collect of the
    // Heaps-bounded vocabulary, in-memory indexed training, zero
    // per-merge jobs — BpeSpec pins trainLocal == train merge-for-
    // merge). no_oracle: the round-over-round argmax is inherently
    // iterative; BpeSpec pins the trainer against an in-spec reference
    // implementation on both a hand-checked fixture and this corpus.
    "q_bpe_vocab" -> QueryDef(
      (s, dir) => {
        val merges = Bpe.trainLocal(
          Bpe.wordCounts(Tables.load(s, dir, "documents"), col("text")), 32)
        s.createDataFrame(merges.map(m =>
          (m.rank.toLong, m.left, m.right, m.merged)))
          .toDF("rank", "left", "right", "merged")
      },
      None),

    // Greedy BPE encode under a FIXED 4-merge table, fully DuckDB-
    // oracled — the cross-engine anchor for BpeEncode's rank-priority
    // apply semantics (q_bpe_encode below runs the same expression under
    // a TRAINED table, where the table itself is not SQL-derivable).
    //
    // Why an oracle exists here: for a merge table in valid training
    // order — every pair references only symbols that exist at its rank
    // (single characters or earlier merges) — greedy lowest-rank-first
    // encoding equals applying the merges rank-sequentially, each
    // exhaustively left-to-right: a later merge can only create
    // adjacencies involving ITS merged symbol, which no earlier pair
    // mentions, so once rank i is exhausted it never reappears. DuckDB
    // expresses exactly that as nested `replace` calls, with each merged
    // symbol rewritten to a sentinel character (chr 1..4) so multi-char
    // symbols stay single string positions and no pattern can match
    // across a symbol boundary; `replace` scans left-to-right
    // non-overlapping, BpeMergeAdjacent's consumption order.
    "q_bpe_encode_small" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val merges = Seq(("t", "h"), ("th", "e"), ("a", "n"), ("i", "n"))
        docs.select(col("doc_id"),
          size(Bpe.encodeTokens(col("text"), Bpe.asMerges(merges)))
            .cast("long").as("n_bpe_tokens"))
      },
      Some(s"""WITH w AS ($oracleWords),
        enc AS (SELECT doc_id, len(
            replace(replace(replace(replace(word,
              'th', chr(1)),
              chr(1) || 'e', chr(2)),
              'an', chr(3)),
              'in', chr(4))) AS n_syms
          FROM w),
        per AS (SELECT doc_id, sum(n_syms) AS n_bpe_tokens
          FROM enc GROUP BY 1)
        SELECT d.doc_id,
          CAST(coalesce(p.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
        FROM documents d LEFT JOIN per p USING (doc_id)""")),

    // End-to-end encode with the trained table: per-document BPE token
    // counts (map-only scan once training is done). no_oracle (greedy
    // rank-priority apply isn't SQL-expressible for a trained table);
    // BpeSpec pins encode against the reference implementation, and
    // q_bpe_encode_small above anchors the greedy-apply semantics
    // cross-engine on a fixed table.
    "q_bpe_encode" -> QueryDef(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val merges = Bpe.trainLocal(Bpe.wordCounts(docs, col("text")), 32)
        docs.select(col("doc_id"),
          size(Bpe.encodeTokens(col("text"), merges)).cast("long")
            .as("n_bpe_tokens"))
      },
      None))
}
