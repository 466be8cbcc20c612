package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination as an OFFLINE ARTIFACT plus a stateless
  * gate — the ingest-plane face of q_contamination_bloom, the same
  * split Importance gets: `fitBuckets` collapses the eval suite to its
  * distinct shingle-bucket set (bounded by the EVAL suite — the domain
  * caps it at |eval shingles|, <=4 MB of longs at any realistic suite
  * size), and `hitCount` is a per-row column counting how many of a
  * document's shingle buckets land in that set. Dropping at
  * `hits >= minShared` mirrors the batch query's n_shared >= 2 cut.
  *
  * Approximation contract (identical to the batch bloom path): a
  * bucket hit is a 2^20-bucket hash collision test, so FPR per shingle
  * is |eval buckets| / 2^20; minShared >= 2 squares the per-doc odds.
  * The exact verify (join back on the shingle string) remains the batch
  * path's second stage — an ingest gate trades that for zero state.
  */
object Decontamination {

  val BloomBuckets = 1048576L // 2^20, matches q_contamination_bloom

  def bucket(shingle: Column): Column =
    pmod(xxhash64(shingle), lit(BloomBuckets))

  /** Distinct shingle buckets of the eval suite — the artifact. */
  def fitBuckets(evalDocs: DataFrame, textCol: Column, nGram: Int = 3): Set[Long] =
    evalDocs
      .select(explode(array_distinct(
        TextFunctions.wordShingles(textCol, nGram))).as("s"))
      .select(bucket(col("s")).as("b")).distinct()
      .collect().map(_.getLong(0)).toSet

  /** How many of this document's distinct shingle buckets are in the
    * eval set. `isInCollection` over the set resolves to an InSet hash
    * probe per shingle — per-row cost linear in shingles, no join.
    */
  def hitCount(text: Column, evalBuckets: Set[Long], nGram: Int = 3): Column =
    if (evalBuckets.isEmpty) lit(0)
    else size(filter(
      array_distinct(TextFunctions.wordShingles(text, nGram)),
      s => bucket(s).isInCollection(evalBuckets)))
}
