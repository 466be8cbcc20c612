package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash families for MinHash / SimHash sketching.
  *
  * Strategy: hash each token ONCE with Spark's codegen'd `xxhash64`, then
  * derive the k MinHash functions as affine transforms of that base hash
  * (`h_i = a_i * h + b_i`, odd multipliers, natural 64-bit overflow). This
  * is the standard trick that turns k hash passes over the text into one
  * pass plus k cheap integer ops — the difference between O(k·len) and
  * O(len + k) per document, which matters at 100 TB.
  */
object HashFunctions {

  /** MinHash signature (array<long> of length k) over an array of string
    * shingles. Empty shingle sets get Long.MaxValue sentinels.
    *
    * Implemented as the native one-pass expression
    * graft.expressions.MinHashSignature: each shingle is hashed once,
    * each of the k hash functions is a constant-size re-hash of that
    * base — O(len + k) per shingle with no per-element Catalyst
    * dispatch (the Column-composed k-subtree formulation pays k
    * interpreted lambda passes).
    */
  def minhashSignature(shingles: Column, k: Int, seed: Long = 42L): Column =
    graft.expressions.MinHashSignature(shingles, k, seed)

  /** Group a k-length signature into `bands` band-hash values for LSH
    * banding: two documents collide on a band iff that band's signature
    * rows are all equal. Returns array<struct<band:int, h:long>>.
    *
    * Band hashes are multi-arg xxhash64 over the band's signature
    * elements — fully codegen'd, no string building. IMPORTANT: pass a
    * MATERIALIZED signature column (from a cached/checkpointed stage),
    * not the raw minhashSignature expression: lambda-based expressions
    * get no common-subexpression elimination, so an inline signature
    * would be recomputed once per band.
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column = {
    val entries = (0 until bands).map { b =>
      val elems = (1 to rowsPerBand).map(r =>
        element_at(signature, b * rowsPerBand + r))
      struct(lit(b).as("band"), xxhash64(elems: _*).as("h"))
    }
    array(entries: _*)
  }

  /** 64-bit SimHash over token hashes: bit j of the result is the sign of
    * sum over tokens of (+1 if bit j of xxhash64(token) else -1).
    * Near-duplicate docs land within small Hamming distance.
    */
  def simhash64(tokens: Column): Column =
    graft.expressions.SimHashExpr(tokens)

  /** Hamming distance between two long-encoded bit vectors. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of two string arrays treated as sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }
}
