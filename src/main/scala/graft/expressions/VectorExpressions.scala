package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math.
  *
  * Why custom expressions: Spark's higher-order functions (`zip_with`,
  * `aggregate`) evaluate their lambda per element through the interpreter
  * — no whole-stage codegen, one closure dispatch per element. A brute-
  * force ANN pass does |queries| * |corpus| * dim element operations; at
  * 100 TB that interpreter overhead dominates. These expressions compile
  * to a tight primitive loop inside the generated code (SURVEY §7.3
  * preference order: built-ins, then a native Expression with doGenCode,
  * then UDFs).
  */

/** dot(a, b): Σ a_i * b_i over two array<float> or array<double> columns,
  * accumulated in double in index order (same fold order as the
  * `aggregate`-based formulation, so results are bit-identical). Null
  * array -> null; null elements are treated as 0. A DIMENSION MISMATCH
  * yields null — matching the `zip_with`-based vector functions — so an
  * embedding-dimension bug surfaces as missing results, never as a
  * plausible-looking partial dot product.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // Nullable even over non-null inputs: mismatched lengths produce null.
  override def nullable: Boolean = true

  private def isVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVector(left.dataType) && isVector(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<float>/array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0
        else if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0
        else if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(arr: String, side: Expression, i: String): String =
        if (elemType(side) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double xv = $a.isNullAt($i) ? 0.0 : ${getter(a, left, i)};
         |    double yv = $b.isNullAt($i) ? 0.0 : ${getter(b, right, i)};
         |    $sum += xv * yv;
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** first_equal_index(a, b): the 0-based index of the FIRST position
  * where two array<long> columns hold equal non-null elements, -1 if
  * none. The LSH min-band emission predicate (Ann.nearDupPairs,
  * `firstEqualIndex(x.sigs, y.sigs) = x.band`) runs this once per
  * JOINED candidate row — the hottest row count any expression in the
  * engine sees (~3·10⁹ at the mult=300 fixture) — which is exactly the
  * case the scaladoc above names: the zip_with/array_position spelling
  * allocates a boolean array and dispatches a lambda per element
  * through the interpreter, per joined row. This compiles to an
  * early-exit long-compare loop inside whole-stage codegen. Null
  * array or length mismatch -> null (the DotProduct convention: shape
  * bugs surface as missing rows, not plausible indexes); null
  * ELEMENTS compare as not-equal.
  */
case class FirstEqualIndex(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_first_equal_index requires array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val found = ctx.freshName("found")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  int $found = -1;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |        $a.getLong($i) == $b.getLong($i)) { $found = $i; break; }
         |  }
         |  ${ev.value} = $found;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_first_equal_index"
}

/** cosine(a, b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) in ONE
  * array traversal. The composed VectorFunctions.cosine spelling runs
  * three independent DotProduct passes over the same two arrays per
  * evaluation — and cosine is THE per-candidate verifier (near-dup
  * verify joins, semdedup pair mining, ANN scoring), the hottest
  * per-row arithmetic in the engine after the LSH band scan. The three
  * sums are accumulated in the SAME index order as three separate
  * dots, then combined by the IDENTICAL op sequence
  * (ab / (sqrt(aa) * sqrt(bb))), so results are bit-equal to the
  * composed form — including the null conventions (null array or
  * length mismatch -> null; null elements contribute 0.0 to every
  * sum) and zero-norm NaN (0/0).
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  private def isVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVector(left.dataType) && isVector(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine_sim requires array<float>/array<double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0
        else if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0
        else if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      ab += xv * yv
      aa += xv * xv
      bb += yv * yv
      i += 1
    }
    ab / (java.lang.Math.sqrt(aa) * java.lang.Math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(arr: String, side: Expression, i: String): String =
        if (elemType(side) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double xv = $a.isNullAt($i) ? 0.0 : ${getter(a, left, i)};
         |    double yv = $b.isNullAt($i) ? 0.0 : ${getter(b, right, i)};
         |    $ab += xv * yv;
         |    $aa += xv * xv;
         |    $bb += yv * yv;
         |  }
         |  ${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine_sim"
}

/** l2sq(a, b) = Σ (a_i - b_i)² in index order — the PQ/k-means distance,
  * compiled to a primitive loop. Null conventions replicate the
  * zip_with/aggregate formulation EXACTLY (they differ from DotProduct's):
  * a null array -> null, a LENGTH MISMATCH -> null (zip_with pads with
  * nulls and the sum absorbs them), and a null ELEMENT -> null (the
  * lambda's null - y propagates through the whole fold).
  */
case class L2Sq(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  private def isVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVector(left.dataType) && isVector(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq requires array<float>/array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(arr: String, side: Expression, i: String): String =
        if (elemType(side) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      double xv = ${getter(a, left, i)};
         |      double yv = ${getter(b, right, i)};
         |      double d = xv - yv;
         |      $sum += d * d;
         |    }
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_l2sq"
}

object VectorExpressions {
  /** Column-level handle for the codegen'd dot product. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level handle for the codegen'd first-equal-index scan. */
  def firstEqualIndex(a: Column, b: Column): Column =
    ColumnBridge.column(FirstEqualIndex(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level handle for the one-pass codegen'd cosine. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level handle for the codegen'd squared-L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(L2Sq(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
