package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.queries.Det

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Two paths:
  *  - bruteForceTopK: exact baseline — corpus x broadcast(queries), one
  *    codegen'd dot per pair, per-query top-k. Cost |corpus|*|Q|*dim;
  *    right when |Q| is small.
  *  - ivfTopK: the scale path — corpus is coarse-quantized once into
  *    cells around a centroid set (one aggregation, no pairwise blowup);
  *    each query probes only its nprobe nearest cells. Cost per query
  *    drops by ~|cells|/nprobe. Centroids come from the caller (a seeded
  *    sample or offline k-means); at 100 TB the cell assignment is a
  *    write-once partitioning of the corpus that all future queries
  *    reuse.
  *
  * Determinism: every ranking ties-breaks on ids after rounding scores
  * (Det.r4), so the cut is stable across engines and partitionings.
  */
object Ann {

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id"))
    // rn cast to long: keeps the output representation identical to SQL
    // engines whose row_number() is 64-bit (cross-engine hash stability).
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select("q_id", "vec_id", "score", "rn")
  }

  private def cosineScore(a: Column, b: Column): Column =
    Det.r4(VectorFunctions.cosine(a, b))

  /** Exact top-k: queries must be small (broadcast side). Expects
    * corpus(vec_id, embedding) and queries(q_id, q_emb).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    topKPerQuery(
      corpus.crossJoin(broadcast(queries))
        .select(col("q_id"), col("vec_id"),
          cosineScore(col("q_emb"), col("embedding")).as("score")),
      k)

  /** Assign each corpus vector to its nearest centroid (max cosine, id
    * tiebreak) — one map-side pass over corpus x broadcast(centroids)
    * and a single partial-aggregated max_by per vector.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cell_id"),
        cosineScore(col("embedding"), col("cell_emb")).as("aff"))
      .groupBy(col("vec_id"))
      .agg(
        first(col("embedding")).as("embedding"),
        max_by(col("cell_id"), struct(col("aff"), -col("cell_id")))
          .as("cell_id"))

  /** Embedding near-duplicate pairs: multi-band random-hyperplane LSH
    * candidate generation, then exact cosine >= threshold verification.
    *
    * Scale shape mirrors the MinHash-LSH path: the band self-join carries
    * only (vec_id, band, h) — ids and two small ints, never embeddings —
    * candidates are deduped BEFORE the vectors are joined back for the
    * one exact cosine per surviving pair. Nothing is all-pairs; the
    * candidate count is bounded by per-bucket populations (~n^2/2^bits
    * per band at worst, with nBands/bitsPerBand the recall/volume dial —
    * see VectorFunctions.hyperplaneBands). Expects emb(vec_id, embedding).
    */
  def nearDupPairs(emb: DataFrame, dim: Int, threshold: Double,
      nBands: Int = 16, bitsPerBand: Int = 8, seed: Long = 42L): DataFrame = {
    // Materialize the banded projection before the self-join: the
    // HyperplaneBands expression evaluates per reference — uncached,
    // each join side would recompute the full nBands x bitsPerBand x dim
    // projection pass (and regenerate the plane matrix per expression
    // instance) — same reasoning as the MinHash signature cache. At
    // cluster scale this stage is a checkpoint/parquet write instead.
    val banded = emb.select(col("vec_id"),
        explode(VectorFunctions.hyperplaneBands(
          col("embedding"), dim, nBands, bitsPerBand, seed)).as("bh"))
      .select(col("vec_id"), col("bh.band").as("band"), col("bh.h").as("h"))
      .cache()
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.h") === col("y.h") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val result = cands
      .join(vecs.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
      .join(vecs.select(col("vec_id").as("b"), col("embedding").as("eb")), "b")
      .select(col("a"), col("b"), cosineScore(col("ea"), col("eb")).as("score"))
      .where(col("score") >= threshold)
    // release the banded cache once the pair frame first materializes —
    // a long-lived session calling this repeatedly must not accumulate
    // executor storage (the cache exists only to share the projection
    // between the self-join's two sides within one action)
    graft.core.CacheHygiene.unpersistAfterFirstUse(banded, result)
  }

  /** IVF search: probe the nprobe highest-affinity cells per query, exact
    * top-k within the probed cells. Expects centroids(cell_id, cell_emb).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val cells = assignCells(corpus, centroids)
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("aff").desc, col("cell_id"))
    val probes = queries.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("cell_id"),
        cosineScore(col("q_emb"), col("cell_emb")).as("aff"))
      .withColumn("prn", row_number().over(probeW))
      .where(col("prn") <= nprobe)
      .select("q_id", "q_emb", "cell_id")
    topKPerQuery(
      cells.join(broadcast(probes), "cell_id")
        .select(col("q_id"), col("vec_id"),
          cosineScore(col("q_emb"), col("embedding")).as("score")),
      k)
  }
}
