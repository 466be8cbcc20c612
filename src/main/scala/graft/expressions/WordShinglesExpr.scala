package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as one native pass: whitespace-tokenize and emit
  * the n-token windows joined by single spaces. Fewer than n tokens ->
  * empty array (the Column-composed formulation hit Spark's descending
  * `sequence(1, 0)` there and a crashing `slice(_, 0, _)` — this
  * expression is also the fix for that edge).
  *
  * Semantics match the DuckDB oracle exactly: tokens are maximal runs of
  * non-whitespace; shingle i = tokens[i..i+n-1] joined by " ".
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n > 0, "shingle size must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // maximal runs of non-whitespace, with regex-\s whitespace exactly
    // ([ \t\n\x0B\f\r] — Character.isWhitespace would also match
    // Unicode spaces and diverge from the regex-split formulation)
    @inline def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
    val tokens = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) tokens += s.substring(start, i)
    }
    val k = tokens.length - (n - 1)
    if (k <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](k)
      var j = 0
      while (j < k) {
        val sb = new java.lang.StringBuilder()
        var t = 0
        while (t < n) {
          if (t > 0) sb.append(' ')
          sb.append(tokens(j + t))
          t += 1
        }
        out(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
