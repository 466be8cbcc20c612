package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native PQ kernels (guide §4: eliminate non-codegen expression chains
  * in the hot path; §2.4: remove shuffles outright).
  *
  * [[PqCodesExpr]] encodes one vector against the WHOLE codebook in one
  * per-row pass: the previous pqEncode plan exploded every vector into
  * m subvector rows, broadcast-joined all m*k codebook entries (n*m*k
  * rows of codegen'd L2), and then needed a min(struct(dq, code))
  * aggregation whose struct buffer forces SortAggregate — a per-
  * partition SORT of n*m*k rows plus an Exchange, for an argmin that is
  * a pure function of one row. This expression does the same m*k
  * quantized-L2 argmins in a tight JVM loop and returns the m codes;
  * encode becomes map-only.
  *
  * Equivalence: dq was Det.r4(l2sq) = floor(l2*10000 + 0.5)/10000, and
  * the argmin compared (dq, code) lexicographically. The quantized long
  * q = floor(l2*10000 + 0.5) is a strictly monotone image of dq
  * (long -> double division by 10000 is injective far below 2^53), so
  * comparing (q, code) picks the identical code. The plan-embedded
  * guards (dim % m != 0, codebook subvector length mismatch) raise with
  * the same pqEncode messages instead of silently mis-slicing.
  */
case class PqCodesExpr(left: Expression, right: Expression, m: Int)
  extends BinaryExpression with CodegenFallback {

  override def nullable: Boolean = true

  private def isVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
    right.dataType) match {
    case (v, ArrayType(StructType(fields), _))
      if isVector(v) && fields.length == 3 &&
        fields(0).dataType == IntegerType &&
        fields(1).dataType == LongType && isVector(fields(2).dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "graft_pq_codes requires (array<float|double>, array<struct<sub:int," +
        s"code:bigint,cvec:array<float|double>>>), got ${l.simpleString} " +
        s"and ${r.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // defs, not vals: children's dataType is only safe to ask after analysis
  private def embFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def cvecFloat = right.dataType match {
    case ArrayType(StructType(fields), _) => fields(2).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val emb = a.asInstanceOf[ArrayData]
    val entries = b.asInstanceOf[ArrayData]
    val d = emb.numElements()
    if (d % m != 0) throw new RuntimeException(
      s"pqEncode: embedding dim $d not divisible by m=$m")
    val sd = d / m
    val bestQ = Array.fill(m)(Long.MaxValue)
    val bestC = Array.fill(m)(Long.MaxValue)
    val covered = new Array[Boolean](m)
    val ef = embFloat
    val cf = cvecFloat
    var seen = false
    var i = 0
    val n = entries.numElements()
    while (i < n) {
      val e = entries.getStruct(i, 3)
      val sub = e.getInt(0)
      val code = e.getLong(1)
      val cvec = e.getArray(2)
      if (sub < 0 || sub >= m) throw new RuntimeException(
        s"pqEncode: codebook sub $sub out of range for m=$m")
      if (cvec.numElements() != sd) throw new RuntimeException(
        s"pqEncode: codebook subvector length ${cvec.numElements()} " +
          s"!= expected $sd")
      var l2 = 0.0
      var j = 0
      val base = sub * sd
      while (j < sd) {
        val x = if (ef) emb.getFloat(base + j).toDouble
          else emb.getDouble(base + j)
        val y = if (cf) cvec.getFloat(j).toDouble
          else cvec.getDouble(j)
        val diff = x - y
        l2 += diff * diff
        j += 1
      }
      val q = java.lang.Math.floor(l2 * 10000.0 + 0.5).toLong
      if (q < bestQ(sub) || (q == bestQ(sub) && code < bestC(sub))) {
        bestQ(sub) = q
        bestC(sub) = code
      }
      covered(sub) = true
      seen = true
      i += 1
    }
    if (!seen) return null // empty codebook: no joined rows before either
    var s = 0
    while (s < m) {
      // loud, not a silent MaxValue code: the old broadcast-join form
      // simply emitted no row for an uncovered sub, which downstream
      // ANSI map probes then caught — here an uncovered sub is a
      // malformed codebook and fails at the source
      if (!covered(s)) throw new RuntimeException(
        s"pqEncode: codebook has no entries for sub $s (m=$m)")
      s += 1
    }
    new GenericArrayData(bestC)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodesExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_pq_codes"
}

/** ADC distance: Σ_{sub} dtable[sub * k + codes[sub]] over a
  * position-indexed per-query distance table — the integer PQ scoring
  * kernel. The previous spelling folded a higher-order `aggregate` over
  * `element_at` calls against two MAP columns per scored row: each map
  * probe is a linear scan of an ArrayBasedMapData (m*k entries for the
  * distance table), interpreted per lambda dispatch — on the
  * |corpus| x |queries| hottest row count of the PQ path. This is one
  * codegen-fallback-free-of-boxing JVM loop with O(1) array indexing.
  * The summed values are the identical quantized longs, so `dist` is
  * unchanged. Malformed inputs (code out of range for the table) raise
  * loudly, matching the engine's guard convention.
  *
  * Has a real `doGenCode` (not CodegenFallback): this expression scores
  * the |corpus| x |queries| hottest row count of the PQ path, and the
  * fallback's per-row boxed `eval` dispatch sat inside the scan stage
  * (guide §4; the CosineSim precedent). The generated loop is the
  * identical arithmetic and the identical guard, so results and failure
  * messages are unchanged.
  */
case class AdcSumExpr(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
    right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "graft_adc_sum requires (array<bigint>, array<bigint>), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val dtable = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val tlen = dtable.numElements()
    var sum = 0L
    var sub = 0
    while (sub < m) {
      val code = codes.getLong(sub)
      val idx = sub * k + code
      if (code < 0 || code >= k || idx >= tlen) throw new RuntimeException(
        s"adcSum: code $code at sub $sub out of range for k=$k, " +
          s"table length $tlen")
      sum += dtable.getLong(idx.toInt)
      sub += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val tlen = ctx.freshName("tlen")
      val sum = ctx.freshName("sum")
      val sub = ctx.freshName("sub")
      val code = ctx.freshName("code")
      val idx = ctx.freshName("idx")
      s"""
         |int $m = $a.numElements();
         |int $tlen = $b.numElements();
         |long $sum = 0L;
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  long $code = $a.getLong($sub);
         |  long $idx = (long) $sub * $k + $code;
         |  if ($code < 0 || $code >= $k || $idx >= $tlen) {
         |    throw new RuntimeException("adcSum: code " + $code +
         |      " at sub " + $sub + " out of range for k=$k, table length " +
         |      $tlen);
         |  }
         |  $sum += $b.getLong((int) $idx);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSumExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_adc_sum"
}

object PqExpressions {
  def pqCodes(embedding: Column, entries: Column, m: Int): Column =
    ColumnBridge.column(PqCodesExpr(
      ColumnBridge.expression(embedding), ColumnBridge.expression(entries), m))

  def adcSum(codes: Column, dtable: Column, k: Int): Column =
    ColumnBridge.column(AdcSumExpr(
      ColumnBridge.expression(codes), ColumnBridge.expression(dtable), k))
}
