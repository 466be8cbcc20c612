package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit SimHash over a token array in ONE pass. The Column-composed
  * formulation built 64 separate `aggregate` subtrees — each an
  * interpreted lambda scan of the array, and (no CSE across lambdas)
  * each recomputing every token's xxhash — O(64 x tokens) interpreted
  * work per row. This expression hashes each token once with the exact
  * same XXH64 (seed 42, UTF-8 bytes — bit-identical to Spark's
  * `xxhash64`) and updates all 64 sign counters in a tight loop.
  *
  * Null tokens hash to the seed, matching `xxhash64(null)`.
  */
case class SimHashExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      val h =
        if (arr.isNullAt(k)) 42L
        else {
          val t = arr.getUTF8String(k)
          XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
            t.numBytes, 42L)
        }
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
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
