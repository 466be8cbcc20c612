package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `depth` Count-Min probe coordinates of a key in ONE pass:
  * element r = h_r mod width with h_r = (a + r*b) mod P the md5-sliced
  * double-hash family ([[Md5DoubleHash]]) — identical to the sketch
  * aggregator's bucket function (graft.functions.Aggregators
  * .CountMinSketch, pinned by SourcesSpec) AND reproducible in an
  * external SQL engine, so the DuckDB oracle recomputes the entire
  * grid and q_heavy_hitters is hash-compared end to end (one md5 per
  * key plus depth add-and-wrap steps replaced the per-row seeded FNV,
  * which no SQL engine could reproduce). Estimation joins the
  * posexploded (row, bucket) pairs of each candidate key against the
  * broadcast grid.
  */
case class CmsBuckets(child: Expression, depth: Int, width: Int)
  extends UnaryExpression with CodegenFallback {

  require(depth > 0 && width > 0, "depth and width must be positive")

  import MinHashSignature.P

  // one digest per thread — see MinHashSignature's note
  @transient private lazy val md5 =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"cms_buckets requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val md = md5.get()
    md.reset()
    val (a, b) = Md5DoubleHash.params(
      md.digest(input.asInstanceOf[UTF8String].getBytes))
    val out = new Array[Any](depth)
    var h = a
    var r = 0
    while (r < depth) {
      out(r) = (h % width).toInt
      h += b
      if (h >= P) h -= P
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
