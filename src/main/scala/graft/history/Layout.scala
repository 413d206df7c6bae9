package graft.history

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order file layout for the historical store — multi-dimensional data
  * skipping (the Delta OPTIMIZE ZORDER / Hudi clustering technique,
  * Morton 1966). The dt-partitioned sink prunes on TIME; scheduled
  * queries and correlation rules also filter on entity columns
  * (user/ip/rule), and within a dt partition those reads scan every
  * file. Laying files out along a Z-curve over (entity, time) makes the
  * per-file min/max footer stats narrow in BOTH dimensions, so parquet
  * row-group/file skipping works for either predicate — no index, no
  * extra storage, just placement.
  *
  * All arithmetic is integer Column work (rank-normalize each dimension
  * to 16 bits against a one-row min/max broadcast, interleave bits) —
  * codegen'd, zero UDFs, one range exchange on the z-value. */
object Layout {

  /** Interleave the low 16 bits of two rank-normalized columns:
    * bit i of `r1` lands at 2i, bit i of `r2` at 2i+1. */
  private def interleave16(r1: Column, r2: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(r1, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(r2, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** The z-value column for two numeric dimensions, normalized to 16-bit
    * ranks against the GIVEN bounds (pass corpus min/max; a degenerate
    * dimension — min == max — contributes constant 0 and the z-order
    * gracefully becomes a sort on the other dimension). */
  def zValue(c1: Column, min1: Column, max1: Column,
      c2: Column, min2: Column, max2: Column): Column = {
    // floor, not cast: Spark's double→long cast truncates toward zero but
    // DuckDB's rounds — floor is the one both engines agree on
    def rank16(c: Column, lo: Column, hi: Column): Column =
      when(hi > lo,
        floor((c.cast("double") - lo.cast("double")) /
          (hi.cast("double") - lo.cast("double")) * 65535.0))
        .otherwise(lit(0L))
    interleave16(rank16(c1, min1, max1), rank16(c2, min2, max2))
  }

  /** Attach `__z` over two numeric columns, bounds from one tiny
    * aggregate broadcast-joined back (a single row — never a shuffle of
    * the data). */
  def withZValue(df: DataFrame, c1: String, c2: String): DataFrame = {
    val bounds = df.agg(
      min(col(c1)).as("__min1"), max(col(c1)).as("__max1"),
      min(col(c2)).as("__min2"), max(col(c2)).as("__max2"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", zValue(
        col(c1), col("__min1"), col("__max1"),
        col(c2), col("__min2"), col("__max2")))
      .drop("__min1", "__max1", "__min2", "__max2")
  }

  /** Write `df` z-ordered over (c1, c2): one range exchange on the
    * z-value, sort within partitions, drop the helper column at the
    * writer. Each output file then covers a compact z-range — a narrow
    * min/max rectangle in BOTH dimensions — so a filter on EITHER column
    * prunes most files at the footer. */
  def zorderWrite(df: DataFrame, c1: String, c2: String, path: String,
      numFiles: Int): Unit =
    withZValue(df, c1, c2)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
