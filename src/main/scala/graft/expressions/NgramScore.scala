package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Hashed-bigram logistic score in ONE native pass:
  * sigmoid(bias + Σ over adjacent token pairs of w(md5-bucket)) — the
  * scoring kernel of QualityModel's 256-bucket n-gram classifier.
  *
  * Why native (the MinHashSignature/HyperplaneBands trade): the Column
  * form embedded the 256-double weight vector as a CreateArray literal
  * INSIDE an `aggregate` lambda. Higher-order-function lambdas get no
  * codegen and no CSE, so the 256-element literal was re-materialized
  * per BIGRAM per row, interpreted — measured 29.7 s for one gradient
  * step at sf0.1 (every other catalog query ≤ 2.4 s), invisible until
  * the round-12 full-catalog radar because the query is not a bench
  * headliner. Here the weights are one reference object and scoring is
  * a tight loop: md5 per bigram, first digest byte as bucket, one
  * add. CodegenFallback costs a virtual call per row, noise next to
  * the md5s.
  *
  * Numerics replicate the Column form EXACTLY (the oracle and the spec
  * pins depend on it): the bucket sum folds left-to-right from 0.0 and
  * bias is added LAST (bias + ((0+w1)+w2)+...), the bucket is the
  * first md5 byte of the UTF-8 bytes of "tokA tokB" (= md5 hex digits
  * 1-2 via conv(...,16,10)), and the sigmoid is 1.0/(1.0+exp(-z)) in
  * that operation order — with StrictMath.exp, because Spark's Exp
  * expression evaluates via StrictMath (platform-stable), and
  * Math.exp diverges from it by an ulp on some inputs (caught by the
  * differential spec under random weights). A null token array yields null; a null
  * ELEMENT yields null (the old form's concat/md5/element_at null
  * chain collapsed the whole aggregate to null) — unreachable from
  * whitespace tokenization, pinned for parity anyway.
  */
case class NgramScore(child: Expression, bias: Double,
    weights: Array[Double])
  extends UnaryExpression with CodegenFallback {

  require(weights.length == 256,
    s"NgramScore expects 256 bucket weights, got ${weights.length}")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ngram_score requires array<string> tokens, got ${dt.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // MessageDigest is stateful — one per thread (the ImportanceLogw
  // pattern): a plan fragment evaluated concurrently by two tasks in
  // one JVM must not interleave digests
  @transient private lazy val md5 =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val md = md5.get()
    val n = toks.numElements()
    var s = 0.0
    var i = 0
    while (i < n - 1) {
      if (toks.isNullAt(i) || toks.isNullAt(i + 1)) return null
      val a = toks.getUTF8String(i).getBytes
      val b = toks.getUTF8String(i + 1).getBytes
      val bg = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, bg, 0, a.length)
      bg(a.length) = ' '
      System.arraycopy(b, 0, bg, a.length + 1, b.length)
      md.reset()
      val bucket = md.digest(bg)(0) & 0xff
      s += weights(bucket)
      i += 1
    }
    val z = bias + s
    1.0 / (1.0 + StrictMath.exp(-z))
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramScore = copy(child = newChild)

  override def prettyName: String = "ngram_score"
}

object NgramScore {
  def apply(tokens: Column, bias: Double, weights: Array[Double]): Column =
    ColumnBridge.column(NgramScore(
      ColumnBridge.expression(tokens), bias, weights))
}

/** Score from PRE-COMPUTED bucket ids (array<long>): the fusion face —
  * a frame that materializes [[NgramBucketIds]] once (because the
  * gradient also explodes it) scores with a plain weight-lookup fold,
  * no second tokenize/md5 pass. Same numerics as [[NgramScore]]: fold
  * from 0.0 in array order, bias added last, 1/(1+exp(-z)).
  */
case class NgramScoreFromBuckets(child: Expression, bias: Double,
    weights: Array[Double])
  extends UnaryExpression with CodegenFallback {

  require(weights.length == 256,
    s"NgramScoreFromBuckets expects 256 bucket weights, got ${weights.length}")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ngram_score_from_buckets requires array<long>, got ${dt.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any = {
    val bs = input.asInstanceOf[ArrayData]
    val n = bs.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (bs.isNullAt(i)) return null
      s += weights(bs.getLong(i).toInt)
      i += 1
    }
    val z = bias + s
    1.0 / (1.0 + StrictMath.exp(-z))
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramScoreFromBuckets = copy(child = newChild)

  override def prettyName: String = "ngram_score_from_buckets"
}

object NgramScoreFromBuckets {
  def apply(buckets: Column, bias: Double, weights: Array[Double]): Column =
    ColumnBridge.column(NgramScoreFromBuckets(
      ColumnBridge.expression(buckets), bias, weights))
}

/** The bucket ids themselves (array<long>, one per adjacent token
  * pair) — the EXPLODE side of the sparse gradient, same one-pass md5
  * loop as [[NgramScore]] (the Column form was a `transform` lambda:
  * interpreted md5+substring+conv per element). Same bucket recipe
  * byte-for-byte: first md5 byte of "tokA tokB" UTF-8. Null element →
  * null array (the old concat/md5 chain produced a null ELEMENT; a
  * whole-row null is the strictly-louder contract and unreachable from
  * whitespace tokenization either way).
  */
case class NgramBucketIds(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ngram_bucket_ids requires array<string> tokens, got ${dt.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  // one digest per thread — see NgramScore's note
  @transient private lazy val md5 =
    ThreadLocal.withInitial[MessageDigest](() =>
      MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val md = md5.get()
    val n = toks.numElements()
    val out = new Array[Long](math.max(n - 1, 0))
    var i = 0
    while (i < n - 1) {
      if (toks.isNullAt(i) || toks.isNullAt(i + 1)) return null
      val a = toks.getUTF8String(i).getBytes
      val b = toks.getUTF8String(i + 1).getBytes
      val bg = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, bg, 0, a.length)
      bg(a.length) = ' '
      System.arraycopy(b, 0, bg, a.length + 1, b.length)
      md.reset()
      out(i) = (md.digest(bg)(0) & 0xff).toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramBucketIds = copy(child = newChild)

  override def prettyName: String = "ngram_bucket_ids"
}

object NgramBucketIds {
  def apply(tokens: Column): Column =
    ColumnBridge.column(NgramBucketIds(ColumnBridge.expression(tokens)))
}
