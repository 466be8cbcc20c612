package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.{BpeEncode, BpeMergeAdjacent}
import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer: the trainer and encoder a real LLM data
  * pipeline runs before packing (reference scope ends at whitespace
  * tokenization, pkg/processing/default_operators.go:264-268 — this is
  * beyond-parity surface).
  *
  * Scale contract — the part that matters at 100 TB:
  *   - The CORPUS is touched exactly once: `wordCounts` is one
  *     combiner-friendly `groupBy(word)` (partial aggregation map-side,
  *     shuffle carries only distinct words per partition).
  *   - TRAINING never sees the corpus again. Every merge round runs over
  *     the weighted VOCABULARY table, whose size is bounded by distinct
  *     words — sublinear in corpus bytes (Heaps' law: ~10^6-10^7 rows for
  *     a web-scale corpus, vs 10^13 corpus bytes). Each round is one
  *     explode+groupBy job over that small table plus a 1-row argmax to
  *     the driver (the chosen pair — the same bounded driver contract as
  *     Packing's |buckets|-row offsets).
  *   - ENCODE is a map-only scan-stage pass with the merge table embedded
  *     as per-expression constant state (see BpeEncode) — no join, no
  *     shuffle, no broadcast wait.
  *
  * Lineage discipline: each round stacks one BpeMergeAdjacent projection
  * on the symbol frame; every `checkpointEvery` rounds the frame is
  * localCheckpoint'ed and the superseded generation's blocks are freed
  * (same two-generation discipline as Components).
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String) {
    def merged: String = left + right
  }

  /** (word, cnt) over whitespace tokens — the single corpus pass. */
  def wordCounts(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(TextFunctions.tokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol pairs weighted by word count: (l, r, n). Exposed for
    * the oracled anchor query (q_bpe_pairs) — it is also exactly the
    * frame each training round aggregates.
    */
  def pairCounts(wordCounts: DataFrame): DataFrame =
    pairCountsOf(wordCounts.select(col("cnt"), split(col("word"), "").as("syms")))

  private def pairCountsOf(syms: DataFrame): DataFrame =
    syms.where(size(col("syms")) >= 2)
      .select(col("cnt"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("n"))

  /** Learn `nMerges` merges from a (word, cnt) frame. Deterministic:
    * ties on count resolve to the lexicographically smallest (l, r).
    * Stops early if the vocabulary runs out of adjacent pairs.
    */
  def train(wordCounts: DataFrame, nMerges: Int, checkpointEvery: Int = 8): Seq[Merge] = {
    require(nMerges >= 0, "nMerges must be >= 0")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    // truncate the corpus lineage once — rounds re-plan from this table
    var syms = wordCounts
      .select(col("cnt"), split(col("word"), "").as("syms"))
      .localCheckpoint()
    var lastCheckpoint = syms
    val merges = new ArrayBuffer[Merge](nMerges)
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val top = pairCountsOf(syms)
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(round, l, r)
        syms = syms.withColumn("syms", BpeMergeAdjacent(col("syms"), l, r))
        if ((round + 1) % checkpointEvery == 0) {
          val cp = syms.localCheckpoint()
          Components.freeCheckpoint(lastCheckpoint)
          lastCheckpoint = cp
          syms = cp
        }
      }
      round += 1
    }
    Components.freeCheckpoint(lastCheckpoint)
    merges.toSeq
  }

  /** Encode a text column: whitespace words, each greedy-BPE encoded,
    * concatenated back to one token array per document. Map-only.
    */
  def encodeTokens(text: Column, merges: Seq[Merge]): Column =
    flatten(transform(TextFunctions.tokens(text),
      t => BpeEncode(t, merges.map(m => (m.left, m.right)))))
}
