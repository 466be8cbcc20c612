package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document repetition profile: token count, distinct-token
  * count, max token multiplicity, 2-gram count and max 2-gram
  * multiplicity in a single scan of the string.
  *
  * Why an expression (guide §2.3/§2.4): every statistic here is a
  * function of ONE document's own tokens, yet the Column-composed
  * q_repetition shipped every token occurrence AND every 2-gram
  * occurrence of the corpus through two (doc_id, token)-keyed exchanges
  * plus two (doc_id) re-aggregations and a join — at corpus scale that
  * is two shuffles of the full token stream for per-row arithmetic.
  * This form computes the same five integers inside the scan stage;
  * the only shuffle left in q_repetition is none at all.
  *
  * Parity contract: tokens are maximal non-`\s` runs (identical to
  * TextFunctions.tokens' trim+split and the DuckDB
  * regexp_split_to_array+filter twin); a 2-gram is
  * `token_i ++ " " ++ token_{i+1}` (WordShingles n=2). Counting joined
  * strings equals counting token pairs: tokens contain no whitespace,
  * so the space-join is injective. All five outputs are exact integer
  * counts — no floating point anywhere in this expression.
  */
case class RepetitionProfileExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"repetition_profile requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = RepetitionProfileExpr.schema

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    @inline def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
    val tokCounts = new java.util.HashMap[String, Long]()
    val gramCounts = new java.util.HashMap[String, Long]()
    var nTokens = 0L
    var topN = 0L
    var topG = 0L
    var prev: String = null
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) {
        val tok = s.substring(start, i)
        nTokens += 1
        val c = tokCounts.merge(tok, 1L, (a, b) => a + b)
        if (c > topN) topN = c
        if (prev != null) {
          val g = gramCounts.merge(prev + " " + tok, 1L, (a, b) => a + b)
          if (g > topG) topG = g
        }
        prev = tok
      }
    }
    InternalRow(nTokens, tokCounts.size.toLong, topN,
      math.max(nTokens - 1, 0L), topG)
  }

  override def prettyName: String = "repetition_profile"

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionProfileExpr = copy(child = newChild)
}

object RepetitionProfileExpr {
  private[expressions] val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_n", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("top_g", LongType, nullable = false)))

  def apply(text: Column): Column =
    ColumnBridge.column(RepetitionProfileExpr(ColumnBridge.expression(text)))
}
