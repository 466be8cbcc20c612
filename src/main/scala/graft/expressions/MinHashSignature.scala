package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE native expression: a single pass over the
  * shingle array computes all k minima (each shingle is xxhash64'd once;
  * the k hash functions are constant-size re-hashes of that base value).
  *
  * Why: the Column-composed formulation (k separate
  * `array_min(transform(...))` subtrees) costs k interpreted lambda
  * passes per row — higher-order functions get neither codegen nor CSE.
  * This expression is one tight JVM loop: O(|shingles| * k) long mixes
  * with zero per-element Catalyst dispatch. CodegenFallback costs one
  * virtual call per ROW, which is noise next to the loop it wraps.
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
  extends UnaryExpression with CodegenFallback {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        val s = arr.getUTF8String(e)
        val base = XxHash64Function.hash(s, StringType, seed)
        var i = 0
        while (i < k) {
          val h = XxHash64Function.hash(base, LongType, i.toLong)
          if (h < mins(i)) mins(i) = h
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
  def apply(shingles: Column, k: Int, seed: Long): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingles), k, seed))
}
