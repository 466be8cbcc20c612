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
      k: Int, nprobe: Int): DataFrame =
    ivfTopKFromCells(assignCells(corpus, centroids), queries, centroids,
      k, nprobe)

  /** IVF search over a PRE-ASSIGNED corpus — the query-many half of
    * train-once/query-many: `cells` is assignCells' output, computed
    * once (or persisted) and amortized across every query wave, so a
    * single wave costs one broadcast probe selection plus the probed
    * cells' exact scoring — no corpus-wide assignment pass. The
    * streaming face (AnnStream.ivfQueryRelay) runs exactly this per
    * micro-batch.
    */
  def ivfTopKFromCells(cells: DataFrame, queries: DataFrame,
      centroids: DataFrame, k: Int, nprobe: Int): DataFrame = {
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

  /** One Lloyd assignment step in ORACLE-DETERMINISTIC form: nearest
    * centroid by squared-L2 (the |v|² term dropped — constant per
    * vector, argmin-invariant), distance r4-quantized BEFORE the argmin
    * with cluster-id tiebreak, per-(cluster, dim) mean via exact decimal
    * sums. Returns (cluster_id, dim 1-based, n_members, c_next).
    *
    * Scale shape: centroids broadcast (k rows), assignment is one
    * map-side pass + one partial-aggregated min per vector, the update
    * is a combiner-friendly (cluster, dim)-keyed agg — the corpus
    * shuffles once per step, carrying (cluster_id, dim, component).
    * Expects centroids(cluster_id, cvec); emb(vec_id, embedding).
    */
  def kmeansStep(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val cent = centroids.select(col("cluster_id"), col("cvec"),
      VectorFunctions.dot(col("cvec"), col("cvec")).as("cn"))
    emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("cluster_id"),
        Det.r4(lit(-2.0) *
          VectorFunctions.dot(col("embedding"), col("cvec")) + col("cn"))
          .as("dq"))
      .groupBy(col("vec_id"), col("embedding"))
      .agg(min(struct(col("dq"), col("cluster_id"))).as("m"))
      .select(col("m.cluster_id").as("cluster_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cluster_id"), (col("pos") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n_members"),
        Det.r4(
          sum(col("x").cast("double").cast("decimal(28,10)")).cast("double") /
            count(lit(1))).as("c_next"))
  }

  /** Offline k-means trainer — the producer of [[ivfTopK]]'s centroid
    * frame (its scaladoc's "offline k-means" is now in the library, not
    * an exercise for the caller). Deterministic throughout: init =
    * the k lowest vec_ids (a fixture-friendly stand-in for k-means++;
    * callers with better priors pass their own via `init`), assignment
    * ties break on cluster id, and each iteration's centroids are
    * collected to the driver — k*dim doubles, the k-means state every
    * distributed trainer keeps driver-side — and re-broadcast, so the
    * lineage does not grow with iterations. An empty cluster keeps its
    * previous centroid (the standard Lloyd degeneracy guard).
    * Returns centroids(cluster_id, cvec: array<double>).
    */
  def kmeansTrain(emb: DataFrame, k: Int, iters: Int,
      init: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && iters >= 0, s"k=$k, iters=$iters must be positive")
    val spark = emb.sparkSession
    import scala.jdk.CollectionConverters._
    val embD = emb.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    var cent: DataFrame = init.getOrElse(
      embD.orderBy(col("vec_id")).limit(k)
        .withColumn("cluster_id",
          row_number().over(Window.orderBy(col("vec_id"))).cast("long") - 1)
        .select(col("cluster_id"), col("v").as("cvec")))
    for (_ <- 0 until iters) {
      val cn = cent.select(col("cluster_id"), col("cvec"),
        VectorFunctions.dot(col("cvec"), col("cvec")).as("cn"))
      val next = embD.crossJoin(broadcast(cn))
        .select(col("vec_id"), col("v"), col("cluster_id"),
          (lit(-2.0) * VectorFunctions.dot(col("v"), col("cvec")) +
            col("cn")).as("d"))
        .groupBy(col("vec_id"), col("v"))
        .agg(min(struct(col("d"), col("cluster_id"))).as("m"))
        .select(col("m.cluster_id").as("cluster_id"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster_id", "pos")
        .agg((sum(col("x")) / count(lit(1))).as("cx"))
        .groupBy("cluster_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          s => s.getField("cx")).as("cvec"))
      // k rows to the driver: keeps lineage O(1) across iterations and
      // carries empty clusters' previous centroids forward
      val updated = next.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val prev = cent.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val rows = prev.map { case (cid, v) =>
        org.apache.spark.sql.Row(cid, updated.getOrElse(cid, v))
      }.toList.asJava
      cent = spark.createDataFrame(rows, cent.schema)
    }
    cent
  }
}
