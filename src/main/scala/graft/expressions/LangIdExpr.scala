package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass marker-based language ID. The Column-composed formulation
  * (transform + one filter lambda per language) pays the
  * higher-order-function tax five times over: HOF lambdas are
  * interpreted, get no common-subexpression elimination (the tokenize +
  * lowercase array is recomputed per language), and each token is
  * compared against each marker list linearly. This expression
  * tokenizes once and scores every language per token via hash-set
  * lookups.
  *
  * Semantics are identical to the composed form and to the DuckDB
  * oracle: tokens are maximal non-`\s` runs, scores count lowercased
  * marker hits, argmax resolves ties to the lexicographically GREATEST
  * language code (struct array_max parity), and a language wins over
  * "unknown" only with >= 1 hit.
  */
case class LangIdExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lang_id requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    import LangIdExpr._
    val s = input.asInstanceOf[UTF8String].toString
    @inline def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
    val scores = new Array[Int](Langs.length)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      // tokens longer than any marker cannot score — skip the alloc
      if (i > start && i - start <= MaxMarkerLen) {
        val tok = s.substring(start, i).toLowerCase(java.util.Locale.ROOT)
        var l = 0
        while (l < Langs.length) {
          if (Sets(l).contains(tok)) scores(l) += 1
          l += 1
        }
      }
    }
    var best = 0
    var l = 1
    while (l < Langs.length) {
      if (scores(l) > scores(best) ||
        (scores(l) == scores(best) && Langs(l).compareTo(Langs(best)) > 0))
        best = l
      l += 1
    }
    if (scores(best) > 0) UTF8String.fromString(Langs(best))
    else Unknown
  }

  override def prettyName: String = "lang_id"

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  // single source of truth for the marker lists lives in TextFunctions
  private val markers = graft.functions.TextFunctions.LangMarkers
  private val Langs: Array[String] = markers.map(_._1).toArray
  private val Sets: Array[java.util.HashSet[String]] = markers.map {
    case (_, ms) =>
      val h = new java.util.HashSet[String]()
      ms.foreach(h.add)
      h
  }.toArray
  private val MaxMarkerLen: Int = markers.flatMap(_._2).map(_.length).max
  private val Unknown = UTF8String.fromString("unknown")

  def apply(text: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text)))
}
