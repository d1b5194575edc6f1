package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for scan
  * pruning — the standard answer to "my 100 TB table is filtered on two or
  * three columns and no single sort order serves them all". Sorting by the
  * interleaved-bit Z-value clusters rows so that EVERY interleaved column
  * has a bounded value range within each row group; parquet footer min/max
  * stats then let the reader skip the row groups a filter on ANY of those
  * columns cannot match (a single-column sort gives this for one column and
  * destroys it for the rest).
  *
  * Kept to Spark-native bitwise expressions (shift/and/or — whole-stage
  * codegen'd): the curve is pure integer arithmetic, so composition beats a
  * custom Expression here, and the identical formula is reproducible in any
  * engine (the q80 oracle mirrors it verbatim in SQL).
  */
object Layout {

  /** Z-value (Morton code) of bounded non-negative ints: bit `i` of
    * `cols(j)` lands at position `i * cols.size + j`. Callers bound each
    * column into `[0, 2^bits)` first (e.g. `pmod`, quantized rank —
    * anything deterministic); values outside the range would silently
    * alias, so the low `bits` bits are masked explicitly. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zValue: at least one column")
    require(bits >= 1 && bits * n <= 63, s"zValue: bits*cols must fit a long, got $bits*$n")
    cols.zipWithIndex.flatMap { case (c, j) =>
      val cl = c.cast("long")
      (0 until bits).map(i =>
        shiftleft(shiftright(cl, i).bitwiseAND(lit(1L)), i * n + j))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` as parquet Z-ordered on `cols` (each masked to `bits`):
    * one range exchange on the Z-value (sampled boundaries), an
    * in-partition sort, and the layout column dropped before the write.
    * `targetFiles` bounds output files; `blockBytes` sets the parquet
    * row-group size — the pruning granularity (smaller groups = finer
    * skipping = more footer overhead; 128 MB default is right for 100 TB,
    * tests shrink it to force multi-group files at toy scale).
    *
    * Like bucketing (q70), the exchange is paid ONCE at layout time and
    * amortized over every subsequent scan: a filter on any interleaved
    * column reads only the row groups whose min/max straddle it. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], bits: Int, path: String,
                    targetFiles: Int, blockBytes: Long = 128L << 20): Unit = {
    val z = zValue(cols.map(c => pmod(col(c).cast("long"), lit(1L << bits))), bits)
    df.withColumn("__z", z)
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes)
      .parquet(path)
  }
}
