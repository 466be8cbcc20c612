package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit SimHash over a token array in ONE pass. The Column-composed
  * formulation built 64 separate `aggregate` subtrees — each an
  * interpreted lambda scan of the array, and (no CSE across lambdas)
  * each recomputing every token's hash — O(64 x tokens) interpreted
  * work per row. This expression hashes each token once and updates
  * all 64 sign counters in a tight loop.
  *
  * The per-token bit source is ENGINE-PORTABLE: the first 8 bytes of
  * the token's md5 read as a big-endian long (equivalently: signature
  * bit j is bit (j mod 4) of md5 hex digit (63-j)/4 + 1), so an
  * external SQL engine with md5 rebuilds every signature — and every
  * downstream 16-bit pigeonhole block and Hamming distance —
  * digit-for-digit, making q_simhash hash-compared end to end. The
  * former xxhash64 bit source had no SQL twin (rows-only check); md5
  * costs ~2-3x per token, the price of the oracle. A tied or empty
  * counter leaves its bit 0; null tokens are ignored (token arrays
  * here never contain nulls — TextFunctions.tokens filters empties).
  */
case class SimHashExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  // one digest per thread — see MinHashSignature's note
  @transient private lazy val md5 =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = md5.get()
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(k).getBytes)
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      k += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override def prettyName: String = "simhash64"

  override protected def withNewChildInternal(
      newChild: Expression): SimHashExpr = copy(child = newChild)
}

object SimHashExpr {
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(tokens)))
}
