package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Content-defined chunking: boundaries fall where the rolling prefix
  * hash of the token stream (token fingerprints folded base-257 mod
  * 1e9+7 — the oracled q_fingerprint polynomial) hits `h % mask == 0`.
  * Because boundaries anchor to content, an insertion or deletion
  * perturbs only the chunk it lands in — every chunk before it and
  * after it hashes identically (CdcSpec pins this invariance; it is why
  * CDC, not fixed-stride, is the storage-dedup standard).
  *
  * Scale shape: boundary detection is one O(tokens) per-row aggregate in
  * the scan stage; no shuffle exists until the caller aggregates the
  * chunk frame. The HOF lambdas are interpreted (no codegen) — linear
  * per-row cost, paid once.
  */
object Cdc {

  private val P = 1000000007L

  /** (doc_id, chunk_md5) — one row per chunk in document order. */
  def chunks(docs: DataFrame, textCol: Column, mask: Int = 16): DataFrame = {
    val withToks = docs
      .select(col("doc_id"), TextFunctions.tokens(textCol).as("toks"))
      .where(size(col("toks")) > 0)
    val bounds = aggregate(
      transform(col("toks"), t => TextFunctions.fingerprint(t)),
      struct(lit(0L).as("h"), lit(0).as("i"), array(lit(0)).as("b")),
      (acc, f) => {
        val h2 = (acc.getField("h") * 257 + f) % P
        val i2 = acc.getField("i") + 1
        struct(h2.as("h"), i2.as("i"),
          when(h2 % mask === 0, concat(acc.getField("b"), array(i2)))
            .otherwise(acc.getField("b")).as("b"))
      },
      acc => when(
        element_at(acc.getField("b"), -1) === acc.getField("i"),
        acc.getField("b"))
        .otherwise(concat(acc.getField("b"), array(acc.getField("i")))))
    withToks
      .withColumn("bounds", bounds)
      .select(col("doc_id"), col("toks"), explode(zip_with(
        slice(col("bounds"), lit(1), size(col("bounds")) - 1),
        slice(col("bounds"), lit(2), size(col("bounds")) - 1),
        (a, b) => struct(a.as("s"), b.as("e")))).as("c"))
      .select(col("doc_id"),
        md5(array_join(slice(col("toks"), col("c.s") + 1,
          col("c.e") - col("c.s")), " ").cast("binary")).as("chunk_md5"))
  }
}
