package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** All random-hyperplane LSH band buckets in ONE native expression pass:
  * array<struct<band:int, h:long>> where bit i of band b's `h` is the
  * sign of the vector's projection onto plane (b, i).
  *
  * Why: the Column-composed form builds nBands x bitsPerBand separate
  * `DotProduct` subtrees feeding a generator — 128 expression evals per
  * row whose generated code outgrows JIT method limits and degrades to
  * interpreted dispatch (measured ~5x slower end-to-end on the near-dup
  * bench). Here the plane matrix is one reference object and the whole
  * signature is a tight O(nBands * bitsPerBand * dim) primitive loop;
  * CodegenFallback costs one virtual call per ROW, noise next to the
  * loop it wraps (same trade as MinHashSignature).
  *
  * The plane sequence is generated from `seed` in the exact order of the
  * previous Column formulation (per band, per bit, `dim` gaussians), so
  * bucket assignments for well-formed vectors are unchanged. DEGENERATE
  * inputs differ deliberately: a null or wrong-length vector yields NULL
  * (DotProduct's mismatch contract) and drops out at the explode, where
  * the old composed form hashed every such vector to (band, h=0) — one
  * giant spurious candidate clique of all malformed vectors.
  */
case class HyperplaneBands(child: Expression, dim: Int, nBands: Int,
    bitsPerBand: Int, seed: Long)
  extends UnaryExpression with CodegenFallback {

  require(dim > 0 && nBands > 0 && bitsPerBand > 0 && bitsPerBand <= 63)

  @transient private lazy val planes: Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBands * bitsPerBand)(Array.fill(dim)(rng.nextGaussian()))
  }

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands requires array<float>/array<double>, got " +
        dt.simpleString)
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return null
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (!arr.isNullAt(d))
        v(d) = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      d += 1
    }
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var h = 0L
      var i = 0
      while (i < bitsPerBand) {
        val p = planes(b * bitsPerBand + i)
        var s = 0.0
        var k = 0
        while (k < dim) { s += v(k) * p(k); k += 1 }
        if (s >= 0) h |= (1L << i)
        i += 1
      }
      out(b) = new GenericInternalRow(Array[Any](b, h)): InternalRow
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBands = copy(child = newChild)

  override def prettyName: String = "hyperplane_bands"
}

object HyperplaneBands {
  def apply(vec: Column, dim: Int, nBands: Int, bitsPerBand: Int,
      seed: Long): Column =
    ColumnBridge.column(HyperplaneBands(
      ColumnBridge.expression(vec), dim, nBands, bitsPerBand, seed))
}
