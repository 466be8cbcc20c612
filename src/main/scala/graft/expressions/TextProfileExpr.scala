package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text profile: token count, stopword count, punctuation
  * count, and character (code point) count in a single scan of the
  * string. The Column-composed quality/ratio formulas re-tokenized the
  * text once per component through interpreted higher-order functions
  * (no CSE across lambdas); the downstream score arithmetic stays in
  * ordinary codegen'd Column expressions over this struct, so the
  * oracle-compared doubles are computed by the exact same IEEE ops as
  * before.
  *
  * Parity contract (mirrored by the DuckDB oracles): tokens are maximal
  * non-`\s` runs; a stopword is a token whose lowercase form is in the
  * stopword list; punctuation is any character of
  * `[.,;:!?'"()\[\]{}-]`; n_chars counts code points (Spark's
  * `length`).
  */
case class TextProfileExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"text_profile requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = TextProfileExpr.schema

  override def nullSafeEval(input: Any): Any = {
    import TextProfileExpr._
    val s = input.asInstanceOf[UTF8String].toString
    @inline def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
    var nTokens = 0L
    var nStop = 0L
    var nPunct = 0L
    var nChars = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      // count code points (Spark length()) and punctuation in the same
      // sweep as tokenization
      while (i < len && isWs(s.charAt(i))) { nChars += 1; i += 1 }
      val start = i
      while (i < len && !isWs(s.charAt(i))) {
        val c = s.charAt(i)
        if (Punct.indexOf(c) >= 0) nPunct += 1
        nChars += 1
        if (Character.isHighSurrogate(c) && i + 1 < len &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
          i += 2 // one code point, two UTF-16 units
        } else i += 1
      }
      if (i > start) {
        nTokens += 1
        if (i - start <= MaxStopLen) {
          val tok = s.substring(start, i).toLowerCase(java.util.Locale.ROOT)
          if (Stop.contains(tok)) nStop += 1
        }
      }
    }
    InternalRow(nTokens, nStop, nPunct, nChars)
  }

  override def prettyName: String = "text_profile"

  override protected def withNewChildInternal(
      newChild: Expression): TextProfileExpr = copy(child = newChild)
}

object TextProfileExpr {
  private[expressions] val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  // identical to the regexp class [.,;:!?'"()\[\]{}-]
  private val Punct = ".,;:!?'\"()[]{}-"
  private val Stop = {
    val h = new java.util.HashSet[String]()
    graft.functions.TextFunctions.StopWords.foreach(h.add)
    h
  }
  private val MaxStopLen =
    graft.functions.TextFunctions.StopWords.map(_.length).max

  def apply(text: Column): Column =
    ColumnBridge.column(TextProfileExpr(ColumnBridge.expression(text)))
}

/** Polynomial rolling-hash fingerprint in one pass over the code
  * points: acc = (acc * 257 + codePoint) mod 1_000_000_007 — exactly
  * the composed `aggregate(transform(sequence(...)))` formulation (and
  * the DuckDB list_reduce oracle), without materializing a position
  * array and a character array per row through interpreted lambdas.
  */
case class FingerprintExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"fingerprint requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 257L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override def prettyName: String = "fingerprint"

  override protected def withNewChildInternal(
      newChild: Expression): FingerprintExpr = copy(child = newChild)
}

object FingerprintExpr {
  def apply(text: Column): Column =
    ColumnBridge.column(FingerprintExpr(ColumnBridge.expression(text)))
}
