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

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, v) => acc + v))

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
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val planes: Seq[Array[Double]] =
      Seq.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val proj = graft.expressions.VectorExpressions.dot(vec, lit(p))
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }
}
