package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `depth` Count-Min probe coordinates of a key in ONE pass:
  * element r = the row-r counter index of the key, computed with the
  * identical seeded FNV-1a the sketch aggregator uses
  * (graft.functions.Aggregators.CountMinSketch.bucket). Replaces the
  * last udf in the query catalog — estimation joins the posexploded
  * (row, bucket) pairs of each candidate key against the broadcast grid.
  */
case class CmsBuckets(child: Expression, depth: Int, width: Int)
  extends UnaryExpression with CodegenFallback {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"cms_buckets requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new Array[Any](depth)
    var r = 0
    while (r < depth) {
      var h = 0xcbf29ce484222325L ^ r.toLong
      var i = 0
      while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
      out(r) = ((h >>> 1) % width).toInt
      r += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "cms_buckets"

  override protected def withNewChildInternal(newChild: Expression): CmsBuckets =
    copy(child = newChild)
}

object CmsBuckets {
  def apply(key: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(CmsBuckets(ColumnBridge.expression(key), depth, width))
}
