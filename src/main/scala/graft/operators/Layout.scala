package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data layout: Z-order (Morton) clustering, the
  * organization that makes MULTI-column min/max file pruning work at
  * 100 TB. `q_zorder` / `q_zorder3` (RelationalQueries) audit the
  * effect from the read side; this operator is the producer.
  *
  * Why range-partition by the Morton code rather than hash or sort
  * alone: `repartitionByRange` samples the code distribution and gives
  * every output file a compact, non-overlapping z-RANGE, so each file's
  * parquet footer covers a tight hyper-rectangle in key space — a scan
  * filtered on ANY of the keys skips most files on file-level
  * statistics alone, where a linear sort gives tight bounds on the
  * leading column only. The in-file `sortWithinPartitions` additionally
  * tightens page-level (column index) bounds. All shuffle work is one
  * range exchange of the rows being written — the same cost a plain
  * sorted write pays.
  *
  * The interleave uses the low `bits` of each key (keys are masked to
  * 2^bits, matching the audits' arithmetic; keys.size * bits <= 62
  * keeps the code ANSI-safe in a long). Rows whose keys exceed the mask
  * still land deterministically — the mask wraps them into the grid
  * rather than failing a write. Real tables filter on 3+ dimensions;
  * the per-dimension resolution falls as 62/N bits, which is the
  * fundamental Z-order trade (a 3-key layout still gives each file a
  * tight box at 2^20 per-dimension resolution — far beyond file-count
  * granularity).
  */
object Layout {

  /** Morton interleave of the low `bits` of N non-negative keys: bit i
    * of key k lands at position i * N + k (for N = 2 this is the classic
    * x-even / y-odd interleave). Identical term generation as the
    * q_zorder / q_zorder3 oracle SQL.
    */
  def mortonN(keys: Seq[Column], bits: Int): Column = {
    val n = keys.size
    require(n >= 2, s"mortonN needs at least 2 keys, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"need bits >= 1 and keys*bits <= 62, got $n keys * $bits bits")
    val masked = keys.map(k => pmod(k.cast("long"), lit(1L << bits)))
    (for {
      i <- 0 until bits
      (m, k) <- masked.zipWithIndex
    } yield shiftleft(shiftright(m, i).bitwiseAND(1), i * n + k))
      .reduce(_ + _)
  }

  /** The two-key Morton interleave (bit i of x at 2i, of y at 2i+1). */
  def morton(x: Column, y: Column, bits: Int = 16): Column =
    mortonN(Seq(x, y), bits)

  /** The frame re-clustered into `numFiles` compact z-ranges over any
    * number of keys, ordered within each. Write the result with any
    * sink; each output file gets a tight hyper-rectangle.
    */
  def zorderByN(df: DataFrame, keys: Seq[Column], numFiles: Int,
      bits: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val z = mortonN(keys, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Two-key zorderByN. */
  def zorderBy(df: DataFrame, x: Column, y: Column, numFiles: Int,
      bits: Int = 16): DataFrame =
    zorderByN(df, Seq(x, y), numFiles, bits)

  /** Z-order `df` by `keys` and write it as parquet. */
  def writeZOrderedN(df: DataFrame, path: String, keys: Seq[Column],
      numFiles: Int, bits: Int): Unit =
    zorderByN(df, keys, numFiles, bits).write.parquet(path)

  /** Z-order `df` by (x, y) and write it as parquet. */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      numFiles: Int, bits: Int = 16): Unit =
    writeZOrderedN(df, path, Seq(x, y), numFiles, bits)
}
