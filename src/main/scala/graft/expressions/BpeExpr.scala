package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge round applied to a symbol array: every left-to-right
  * non-overlapping occurrence of the adjacent pair (left, right) is
  * replaced by the concatenated symbol. This is the inner step of BPE
  * TRAINING (graft.operators.Bpe.train) — each round the trainer picks
  * the most frequent pair over the weighted vocabulary and maps every
  * word's symbol array through one of these.
  *
  * Left-to-right consumption matters when left == right: ["a","a","a"]
  * under (a,a) becomes ["aa","a"], never ["a","aa"] — the same greedy
  * order a streaming `replace` performs, which is what keeps the single-
  * merge anchor query (q_bpe_merge1) reproducible in DuckDB with plain
  * string `replace`.
  *
  * CodegenFallback: one virtual call per row wrapping a tight loop over
  * a short array — same trade as MinHashSignature.
  */
case class BpeMergeAdjacent(child: Expression, left: String, right: String)
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  @transient private lazy val lr = UTF8String.fromString(left + right)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_adjacent requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && !arr.isNullAt(i) && !arr.isNullAt(i + 1) &&
          arr.getUTF8String(i).equals(l) && arr.getUTF8String(i + 1).equals(r)) {
        out += lr
        i += 2
      } else {
        if (!arr.isNullAt(i)) out += arr.getUTF8String(i)
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeAdjacent =
    copy(child = newChild)

  override def prettyName: String = "bpe_merge_adjacent"
}

object BpeMergeAdjacent {
  def apply(syms: Column, left: String, right: String): Column =
    ColumnBridge.column(
      BpeMergeAdjacent(ColumnBridge.expression(syms), left, right))
}

/** Full greedy BPE encode of ONE word with a learned merge table: start
  * from the word's characters; repeatedly find the lowest-RANK adjacent
  * pair present and merge all its left-to-right occurrences; stop when no
  * adjacent pair is in the table. This is the standard apply order
  * (rank = training order), so encode(train(corpus)) reproduces the
  * trainer's final symbol arrays on the training vocabulary — BpeSpec
  * pins exactly that, plus the round-trip `concat(tokens) == word`.
  *
  * The merge table is per-expression constant state (like the hyperplane
  * matrices): embedded in the plan, built into a hash map once per task,
  * never shuffled. At a real 100 TB run the table is vocabulary-sized
  * (tens of k entries) — a few hundred KB of plan literals, far below
  * broadcast territory, and encode stays a map-only scan-stage pass.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with CodegenFallback {

  // rank lookup keyed on the (left, right) PAIR itself — no separator
  // character, so no separator-collision class regardless of what bytes
  // learned symbols contain
  @transient private lazy val rank: java.util.HashMap[(String, String), Int] = {
    val m = new java.util.HashMap[(String, String), Int](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) => m.putIfAbsent(p, i) }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    // split into code points (never cuts a surrogate pair in half)
    var syms = new ArrayBuffer[String](word.length)
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val w = Character.charCount(cp)
      syms += word.substring(ci, ci + w)
      ci += w
    }
    var done = syms.length < 2
    while (!done) {
      // lowest-rank adjacent pair present in the table
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val rk = rank.getOrDefault((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < best) best = rk
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val next = new ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            next += a + b
            j += 2
          } else {
            next += syms(j)
            j += 1
          }
        }
        syms = next
        if (syms.length < 2) done = true
      }
    }
    new GenericArrayData(syms.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncode {
  def apply(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(
      BpeEncode(ColumnBridge.expression(word), merges))

  /** Parse the SQL-surface serialization: "l r,l r,..." (symbols are
    * space-separated inside a pair, pairs comma-separated). Mirrors
    * `serializeMerges`. Delimiter characters INSIDE a symbol are
    * percent-escaped (%20 space, %2C comma, %25 percent) — learned
    * symbols genuinely contain commas/percents (tokens are only
    * whitespace-split), and an unescaped table would fail to round-trip.
    * The escaping is PART OF THE FORMAT: a hand-written literal whose
    * symbols contain '%' must escape it as %25 (a bare "%20" in an
    * entry is parsed as a space by design — tables produced by
    * serializeMerges are always self-consistent).
    */
  def parseMerges(s: String): Seq[(String, String)] =
    if (s.isEmpty) Seq.empty
    else s.split(",", -1).toSeq.map { p =>
      val parts = p.split(" ", -1)
      require(parts.length == 2,
        s"bpe merge entry '$p' must be 'left right' (space-separated)")
      (unescapeSym(parts(0)), unescapeSym(parts(1)))
    }

  def serializeMerges(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"${escapeSym(a)} ${escapeSym(b)}" }
      .mkString(",")

  private def escapeSym(s: String): String =
    s.replace("%", "%25").replace(" ", "%20").replace(",", "%2C")

  private def unescapeSym(s: String): String =
    s.replace("%2C", ",").replace("%20", " ").replace("%25", "%")
}
