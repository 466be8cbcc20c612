package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data layout: Z-order (Morton) clustering, the
  * organization that makes MULTI-column min/max file pruning work at
  * 100 TB. `q_zorder` (RelationalQueries) audits the effect from the
  * read side; this operator is the producer.
  *
  * Why range-partition by the Morton code rather than hash or sort
  * alone: `repartitionByRange` samples the code distribution and gives
  * every output file a compact, non-overlapping z-RANGE, so each file's
  * parquet footer covers a tight rectangle in (x, y) space — a scan
  * filtered on EITHER column skips most files on file-level statistics
  * alone, where a linear sort gives tight bounds on the leading column
  * only. The in-file `sortWithinPartitions` additionally tightens
  * page-level (column index) bounds. All shuffle work is one range
  * exchange of the rows being written — the same cost a plain sorted
  * write pays.
  *
  * The interleave uses the low `bits` of each key (keys are masked to
  * 2^bits, matching q_zorder's audit arithmetic; 2*bits <= 62 keeps the
  * code ANSI-safe in a long). Rows whose keys exceed the mask still
  * land deterministically — the mask wraps them into the grid rather
  * than failing a write.
  */
object Layout {

  /** Morton interleave of the low `bits` of two non-negative keys: bit i
    * of x lands at 2i, bit i of y at 2i+1. Identical term generation as
    * q_zorder's oracle SQL.
    */
  def morton(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mx = pmod(x.cast("long"), lit(1L << bits))
    val my = pmod(y.cast("long"), lit(1L << bits))
    (0 until bits).map(i =>
      shiftleft(shiftright(mx, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(my, i).bitwiseAND(1), 2 * i + 1))
      .reduce(_ + _)
  }

  /** The frame re-clustered into `numFiles` compact z-ranges, ordered
    * within each. Write the result with any sink; each output file gets
    * a tight (x, y) rectangle.
    */
  def zorderBy(df: DataFrame, x: Column, y: Column, numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val z = morton(x, y, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Z-order `df` by (x, y) and write it as parquet. */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      numFiles: Int, bits: Int = 16): Unit =
    zorderBy(df, x, y, numFiles, bits).write.parquet(path)
}
