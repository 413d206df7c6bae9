package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.history.Layout

/** Z-order layout: the file-skipping benefit itself — a filter on EITHER
  * dimension touches a small fraction of z-ordered files, where a
  * time-sorted layout only helps the time predicate. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("z-order files are narrow in both dimensions; either filter skips most files") {
    // 40k rows over 200 users × a long time axis
    val rows = spark.range(40000).select(
      col("id").as("event_id"),
      (col("id") % 200).as("user_id"),
      (lit(1704067200000000L) + col("id") * 1000000L).as("tus"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.zorderWrite(rows, "user_id", "tus", s"$dir/z", numFiles = 16)
    // baseline: the same data laid out by time only
    rows.repartitionByRange(16, col("tus")).sortWithinPartitions("tus")
      .write.mode("overwrite").parquet(s"$dir/t")
    def filesTouched(path: String, cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).where(cond)
        .select(input_file_name()).distinct().count()
    val total = spark.read.parquet(s"$dir/z")
      .select(input_file_name()).distinct().count()
    assert(total >= 12, s"expected ~16 files, got $total")
    // a single-user filter: z-order confines the user to few z-ranges;
    // the time-sorted layout scatters every user across ALL files
    val zUser = filesTouched(s"$dir/z", col("user_id") === 7)
    val tUser = filesTouched(s"$dir/t", col("user_id") === 7)
    assert(zUser <= total / 2, s"z-order user filter touched $zUser/$total files")
    assert(tUser >= total - 2, s"time layout should scatter users, got $tUser")
    assert(zUser < tUser, s"z-order must beat time layout on the entity filter")
    // a time-slice filter still skips most z-ordered files too (the curve
    // keeps time locality as well — that's the point of interleaving)
    val zTime = filesTouched(s"$dir/z",
      col("tus") < lit(1704067200000000L + 2000L * 1000000L))
    assert(zTime <= total / 2, s"z-order time filter touched $zTime/$total files")
    // correctness: both layouts hold the same rows
    assert(spark.read.parquet(s"$dir/z").count() == 40000)
    assert(spark.read.parquet(s"$dir/z").columns.toSet ==
      Set("event_id", "user_id", "tus"))
  }

  test("file blooms: point lookup reads only admitted files; missing key reads none") {
    import graft.history.FileBlooms
    val root = java.nio.file.Files.createTempDirectory("fblooms").toString
    val (store, idx) = (s"$root/store", s"$root/index")
    // 4 range-partitioned files: each holds one contiguous user slice
    spark.range(0, 4000).selectExpr("id AS user_id", "id % 7 AS v")
      .repartitionByRange(4, col("user_id"))
      .write.parquet(store)
    FileBlooms.build(spark.read.parquet(store), "user_id", idx,
      expectedPerFile = 2000, numBits = 1L << 16)
    val total = spark.read.parquet(idx).count()
    assert(total == 4)
    val cand = FileBlooms.candidateFiles(spark, idx, 1234L)
    assert(cand.nonEmpty && cand.size < 4,
      s"bloom must prune most range files, admitted ${cand.size}")
    val hit = FileBlooms.lookup(spark, store, idx, "user_id", 1234L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hit.toSeq == Seq((1234L, 1234L % 7)))
    // absent key: no candidate files, empty result with the store schema
    val miss = FileBlooms.lookup(spark, store, idx, "user_id", 999999L)
    assert(miss.columns.toSeq == Seq("user_id", "v") && miss.isEmpty)
  }
}
