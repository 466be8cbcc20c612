package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` columns.
  *
  * Built on `zip_with` / `aggregate` so everything is a codegen'd
  * expression evaluated inside the scan stage — no UDF serialization, no
  * shuffle. All math is promoted to double for cross-engine determinism.
  */
object VectorFunctions {

  /** Codegen'd native expression (graft.expressions.DotProduct): same
    * index-order double fold as the `aggregate`/`zip_with` formulation —
    * bit-identical results — but compiled to a primitive loop instead of
    * one interpreted lambda dispatch per element.
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** One-pass codegen'd native expression (graft.expressions.CosineSim):
    * bit-identical to dot(a,b) / (norm(a) * norm(b)) — same three sums
    * in the same index order, same final op sequence — but ONE array
    * traversal instead of three. Cosine is the per-candidate verifier
    * in every near-dup/ANN path, so this triples the throughput of the
    * hottest scalar in the engine.
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosineSim(a, b)

  /** Squared L2 — the PQ/k-means workhorse (argmin-invariant without
    * the sqrt, and the form the ADC distance tables store). Native
    * codegen'd expression (graft.expressions.L2Sq); same fold order and
    * null conventions as the previous zip_with/aggregate formulation,
    * compiled to a primitive loop instead of one interpreted lambda
    * dispatch per element.
    */
  def l2sq(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.l2sq(a, b)

  def l2Distance(a: Column, b: Column): Column = sqrt(l2sq(a, b))

  /** Pre-normalize once so repeated cosine comparisons are a plain dot
    * product — the right trade at 100 TB: normalization is a single
    * narrow pass; every subsequent candidate comparison saves two norms.
    */
  def normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }

  /** Random-hyperplane LSH bucket id: sign bits of `nBits` fixed random
    * projections packed into a long. Deterministic (seeded) so bucket
    * assignment is stable across runs and cluster topologies.
    */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column =
    bandHash(vec, planeSet(dim, nBits, new scala.util.Random(seed)))

  /** Multi-band hyperplane LSH: `nBands` independent bucket ids, each from
    * its own `bitsPerBand` sign bits — array<struct<band:int, h:long>>.
    * Banding trades selectivity for recall the same way MinHash LSH does:
    * a pair collides if ANY band's full bucket matches, so recall at
    * cosine c is 1 - (1 - p^bitsPerBand)^nBands with p = 1 - acos(c)/pi.
    * A single wide bucket (the old shape) has recall p^bits — under 0.5
    * for 16 bits even at cosine 0.99; 16x8 banding is ~1.0 there.
    * bitsPerBand tunes candidate volume (~n^2/2^bits per band per bucket
    * population): 8 bits suits moderate-similarity mining, 16 bits the
    * production near-dup (cosine>0.99) regime at corpus scale.
    */
  def hyperplaneBands(vec: Column, dim: Int, nBands: Int, bitsPerBand: Int,
      seed: Long = 42L): Column =
    // one-pass native expression; plane sequence identical to the
    // Column-composed form (see HyperplaneBands scaladoc for why the
    // composed form's 128 expression subtrees fall out of JIT)
    graft.expressions.HyperplaneBands(vec, dim, nBands, bitsPerBand, seed)

  private def planeSet(dim: Int, nBits: Int,
      rng: scala.util.Random): Seq[Array[Double]] =
    Seq.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))

  private def bandHash(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = graft.expressions.VectorExpressions.dot(vec, lit(p))
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
}
