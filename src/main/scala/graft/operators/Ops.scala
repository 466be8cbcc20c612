package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** The reference's stateless operator catalog, re-expressed as pure
  * `DataFrame => DataFrame` / `Dataset` combinators (reference:
  * pkg/processing/default_operators.go and default_filter_operators.go).
  *
  * Design stance: operators are *declarative plan fragments*, not
  * per-event callbacks. Catalyst fuses chains of these into a single
  * whole-stage-codegen'd stage, so a 10-operator pipeline costs one pass
  * over the data — the Spark-native replacement for the reference's
  * goroutine-per-operator dataflow (reference: operator_engine.go:64-105).
  */
object Ops {

  type Op = DataFrame => DataFrame

  // --- filter family (reference: default_filter_operators.go:11-75) ----

  /** Keep rows satisfying `pred` (reference Filter, :11-20). */
  def filterOp(pred: Column): Op = _.where(pred)

  /** content > c (reference Greater, :23-28). */
  def greater(c: Column, v: Any): Op = _.where(c > lit(v))

  /** content < c (reference Smaller, :31-36). */
  def smaller(c: Column, v: Any): Op = _.where(c < lit(v))

  /** Even integer part. The reference truncates floats before the parity
    * test (reference: default_filter_operators.go:39-44; float behavior
    * pinned by default_operators_test.go:117-143) — so cast-to-long
    * (truncation toward zero), not rounding.
    */
  def even(c: Column): Op = _.where(c.cast("long") % 2 === 0)

  /** Odd integer part (reference :47-52). */
  def odd(c: Column): Op = _.where(c.cast("long") % 2 =!= 0)

  /** First n rows in `orderCols` order (reference Limit, :55-67 — the
    * reference's unsynchronized counter makes its limit approximate; we
    * implement exact-n, deterministic under an explicit ordering).
    */
  def limitOp(n: Int, orderCols: Column*): Op =
    df => (if (orderCols.nonEmpty) df.orderBy(orderCols: _*) else df).limit(n)

  /** Substring filter (reference Contains, :70-75). */
  def containsOp(c: Column, substr: String): Op = _.where(c.contains(substr))

  // --- map family (reference: default_operators.go:61-268) -------------

  /** 1:1 column-level transform (reference Map, :104-113). */
  def mapOp(outputs: Column*): Op = _.select(outputs: _*)

  /** Typed 1:1 transform for genuinely opaque functions. Prefer `mapOp`
    * (codegen'd); this exists for parity with arbitrary Go closures.
    */
  def mapTyped[A, B: Encoder](f: A => B): Dataset[A] => Dataset[B] = _.map(f)

  /** Numeric cast (reference Convert, :61-76). */
  def convert(c: Column, to: String, as: String): Op =
    df => df.withColumn(as, c.cast(to))

  /** Project one key out of a JSON/map payload; missing key → NULL
    * (reference SelectFromMap, :81-101; NULL behavior pinned by
    * default_operators_test.go:339-362).
    */
  def selectFromJson(c: Column, key: String, as: String): Op =
    df => df.withColumn(as, get_json_object(c, s"$$.$key"))

  def selectFromMap(c: Column, key: String, as: String): Op =
    df => df.withColumn(as, element_at(c, key))

  /** 1:N transform; N may be 0, making it a filter too (reference FlatMap,
    * :221-242; 0-output behavior pinned by default_operators_test.go:244-273).
    */
  def flatMapOp(arrayExpr: Column, as: String): Op =
    df => df.withColumn(as, explode(arrayExpr))

  /** Split strings into whitespace tokens, one row per token (reference
    * Tokenize, :264-268).
    */
  def tokenize(c: Column, as: String = "token"): Op =
    df => df.withColumn(as, explode(graft.functions.TextFunctions.tokens(c)))

  /** Side-effect tap, pass-through (reference Observe, :245-261). In a
    * distributed engine observation is a sink concern; for plan-level
    * parity this is identity (use `foreach` sinks / listeners to observe).
    */
  def observe(f: DataFrame => Unit): Op = df => { f(df); df }

  // --- beyond the reference (it has no sort/distinct/top-k — SURVEY
  // §2.2 exhaustiveness note); Spark built-ins exposed for completeness --

  /** Total sort (range-partitioned shuffle; avoid in hot paths). */
  def sortOp(cols: Column*): Op = _.orderBy(cols: _*)

  /** Distinct rows (hash-aggregate shuffle on all columns). */
  def distinctOp: Op = _.distinct()

  /** Deterministic top-k by `ordering` with explicit tiebreak columns:
    * per-partition partial top-k, then a single reduced sort — Spark
    * plans orderBy+limit as TakeOrderedAndProject (no full sort).
    */
  def topK(k: Int, ordering: Column*): Op = _.orderBy(ordering: _*).limit(k)
}
