package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DSIR log importance weight of one document under a fitted bucket LM,
  * as ONE native expression: whitespace-tokenize, md5-bucket each token
  * (bucket = first md5 byte — exactly `conv(substring(md5(t),1,2),16,10)`,
  * the oracle's arithmetic), sum the i4-quantized per-bucket log ratios
  * (integer adds — order-independent), then the r4 floor-form.
  *
  * Why native instead of the functions-DSL fold it replaced: (a) the
  * interpreted higher-order `aggregate` lambda cost one dispatch per
  * token; this is one tight loop per row (the MinHashSignature trade);
  * (b) a composed Column cannot cross the SQL-injection boundary — an
  * injected builder must return a Catalyst tree, and bridged unresolved
  * ColumnNodes leak into execution unevaluable. The LM rides as
  * per-expression constant state (same rule as the BPE merge table).
  */
case class ImportanceLogw(child: Expression, dw: Map[Long, Long], default: Long)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"importance_logw requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = DoubleType

  @transient private lazy val table: java.util.HashMap[Long, Long] = {
    val m = new java.util.HashMap[Long, Long](dw.size * 2)
    dw.foreach { case (k, v) => m.put(k, v) }
    m
  }

  // MessageDigest is stateful — one per thread, reset by digest()
  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  // exactly Java regex \s — the separator class TextFunctions.tokens
  // splits on (Character.isWhitespace would also match unicode spaces)
  private def isSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val digest = md5.get()
    var sum = 0L
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isSep(text.charAt(i))) i += 1
      val start = i
      while (i < n && !isSep(text.charAt(i))) i += 1
      if (i > start) {
        val token = text.substring(start, i)
        val h = digest.digest(token.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        val bucket = (h(0) & 0xff).toLong
        sum += table.getOrDefault(bucket, default)
      }
    }
    // identical double op sequence to Det.r4(sum / 10000.0)
    val x = sum.toDouble / 10000.0
    math.floor(x * 10000 + 0.5) / 10000
  }

  override protected def withNewChildInternal(newChild: Expression): ImportanceLogw =
    copy(child = newChild)

  override def prettyName: String = "importance_logw"
}

object ImportanceLogw {
  def apply(text: Column, dw: Map[Long, Long], default: Long): Column =
    ColumnBridge.column(
      ImportanceLogw(ColumnBridge.expression(text), dw, default))
}
