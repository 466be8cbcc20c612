package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** MinHash signature as ONE native expression: a single pass over the
  * shingle array computes all k minima. Each shingle is md5-digested
  * ONCE; the k hash functions are the Kirsch–Mitzenmacher double-hash
  * family h_i = (a + i*b) mod P over the Mersenne prime P = 2^31-1,
  * with a and b sliced from the digest:
  *
  *   a = (int48(digest bytes 0..5)  + seed) mod P      (hex digits 1-12)
  *   b =  int48(digest bytes 6..11) mod (P-1) + 1      (hex digits 13-24)
  *
  * Every step is exact integer arithmetic on values < 2^49, so the
  * family is reproducible in ANY engine with md5 and 64-bit integers —
  * the DuckDB oracle recomputes it digit-for-digit (q_minhash_lsh is
  * hash-compared end to end, not rows-only). b is forced nonzero so no
  * permutation collapses to a constant; signature values lie in [0, P),
  * and an empty shingle set yields the out-of-range sentinel P per slot.
  *
  * Why one expression: the Column-composed formulation (k separate
  * `array_min(transform(...))` subtrees) costs k interpreted lambda
  * passes per row — higher-order functions get neither codegen nor CSE.
  * This is one tight JVM loop: one md5 per shingle plus k add-and-wrap
  * steps (h_{i+1} = h_i + b mod P), with zero per-element Catalyst
  * dispatch. CodegenFallback costs one virtual call per ROW, which is
  * noise next to the loop it wraps.
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
  extends UnaryExpression with CodegenFallback {

  require(k > 0, "k must be positive")
  // Upper bound keeps aRaw (< 2^48) + seed exact in a 64-bit Long on
  // BOTH engines: the DuckDB twin adds the same literals under BIGINT,
  // where overflow raises while Spark would wrap to a negative a —
  // silent engine divergence. seed < P also keeps the offset canonical
  // (any seed >= P aliases seed mod P anyway).
  require(seed >= 0 && seed < MinHashSignature.P,
    s"seed must lie in [0, ${MinHashSignature.P}) — larger seeds alias mod P " +
      "and risk 64-bit overflow divergence vs the SQL oracle")

  import MinHashSignature.P

  // Provider lookup is surprisingly costly; hoist the digest out of the
  // loop — ONE PER THREAD (the ImportanceLogw pattern), because a plan
  // fragment shared across concurrently-running tasks in one JVM would
  // silently interleave a per-instance digest.
  @transient private lazy val md5 =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = md5.get()
    val mins = Array.fill(k)(P) // sentinel: out of the [0, P) hash range
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(e).getBytes)
        val aRaw = MinHashSignature.int48(d, 0)
        val bRaw = MinHashSignature.int48(d, 6)
        val a = (aRaw + seed) % P
        val b = bRaw % (P - 1) + 1
        var h = a
        var i = 0
        while (i < k) {
          if (h < mins(i)) mins(i) = h
          h += b
          if (h >= P) h -= P
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  /** Mersenne prime 2^31 - 1: the hash range of the double-hash family.
    * Values < 2^31 keep every downstream band-hash product exact in
    * 64-bit integers on both Spark (ANSI, no wraparound) and DuckDB.
    */
  val P: Long = 2147483647L

  /** Unsigned 48-bit big-endian read: 6 digest bytes = 12 hex digits. */
  private[expressions] def int48(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = off
    while (i < off + 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  def apply(shingles: Column, k: Int, seed: Long): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingles), k, seed))
}

/** The md5-sliced Kirsch–Mitzenmacher double-hash family shared by the
  * MinHash signature and the Count-Min sketch — any sketch whose
  * hashing must be reproducible digit-for-digit in an external SQL
  * engine: a = int48(md5 bytes 0..5) mod P, b = int48(bytes 6..11)
  * mod (P-1) + 1, h_i = (a + i*b) mod P over P = 2^31-1. Every step is
  * exact integer arithmetic on values < 2^49 — portable to any engine
  * with md5 and 64-bit integers (the DuckDB twin is Det.sqlMd5Int48).
  */
object Md5DoubleHash {
  import MinHashSignature.{P, int48}
  /** (a, b) of the family for one key's md5 digest. */
  def params(d: Array[Byte]): (Long, Long) =
    (int48(d, 0) % P, int48(d, 6) % (P - 1) + 1)
}
