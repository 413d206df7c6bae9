package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.history.Snapshots

/** Manifest-based snapshot store: atomic commits, time travel,
  * non-destructive compaction, and expiry. */
class SnapshotsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("commits append atomically; reads pin a version; time travel reproduces history") {
    val root = java.nio.file.Files.createTempDirectory("snapstore").toString
    assert(Snapshots.versions(spark, root).isEmpty)
    val v1 = Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), root)
    val v2 = Snapshots.commit(Seq((2L, "b")).toDF("id", "v"), root)
    val v3 = Snapshots.commit(Seq((3L, "c")).toDF("id", "v"), root)
    assert(Seq(v1, v2, v3) == Seq(1L, 2L, 3L))
    assert(Snapshots.read(spark, root).count() == 3)
    assert(Snapshots.read(spark, root, Some(2L))
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(Snapshots.read(spark, root, Some(1L)).count() == 1)
  }

  test("readVersionDelta equals the exceptAll diff; rewritten history falls back") {
    val root = java.nio.file.Files.createTempDirectory("snapdelta").toString
    // duplicate rows across batches on purpose: the manifest shortcut must
    // reproduce exceptAll's MULTISET semantics, not a distinct-set diff
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root)
    Snapshots.commit(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(rows(Snapshots.readVersionDelta(spark, root, 1L)) ==
      Seq((1L, "a"), (2L, "b")))
    val want2 = rows(Snapshots.read(spark, root, Some(2L))
      .exceptAll(Snapshots.read(spark, root, Some(1L))))
    assert(rows(Snapshots.readVersionDelta(spark, root, 2L)) == want2)
    assert(want2 == Seq((2L, "b"), (3L, "c")))
    // compaction rewrites history: v3's file set is no longer a superset
    // of v2's, so the delta must take the real exceptAll path
    Snapshots.commit(Snapshots.read(spark, root), root, replace = true)
    val want3 = rows(Snapshots.read(spark, root, Some(3L))
      .exceptAll(Snapshots.read(spark, root, Some(2L))))
    assert(rows(Snapshots.readVersionDelta(spark, root, 3L)) == want3)
  }

  test("replace commit compacts without disturbing pinned history; expire reclaims") {
    val root = java.nio.file.Files.createTempDirectory("snapstore2").toString
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), root)
    Snapshots.commit(Seq((2L, "b")).toDF("id", "v"), root)
    // compaction: rewrite the union as one directory, replace semantics
    val compacted = Snapshots.read(spark, root).repartition(1)
    val v3 = Snapshots.commit(compacted, root, replace = true)
    assert(v3 == 3L)
    assert(Snapshots.read(spark, root).count() == 2, "latest sees compacted set")
    assert(Snapshots.read(spark, root, Some(2L)).count() == 2,
      "pinned history still readable after compaction")
    // expire everything but the latest: v1/v2 manifests go, their data
    // dirs (unreferenced by v3's replace manifest) are reclaimed
    val reclaimed = Snapshots.expire(spark, root, keepLast = 1)
    assert(reclaimed.nonEmpty)
    assert(Snapshots.versions(spark, root) == Seq(3L))
    assert(Snapshots.read(spark, root).count() == 2,
      "latest version unaffected by expiry")
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, root, Some(2L))
    }
  }

  test("sweepOrphans removes crash debris but spares live data and the in-flight dir") {
    val root = java.nio.file.Files.createTempDirectory("snapstore3").toString
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), root)
    Snapshots.commit(Seq((2L, "b")).toDF("id", "v"), root)
    // crash debris: a data dir whose manifest never published (not the
    // next version's slot), plus the NEXT version's in-flight dir
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/data/d99"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/data/d3")) // in-flight
    val swept = Snapshots.sweepOrphans(spark, root)
    assert(swept.map(new org.apache.hadoop.fs.Path(_).getName) == Seq("d99"),
      s"must sweep exactly the orphan: $swept")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/data/d3")),
      "in-flight next-version dir must survive")
    assert(Snapshots.read(spark, root).count() == 2, "live data untouched")
    // idempotent: nothing left to sweep
    assert(Snapshots.sweepOrphans(spark, root).isEmpty)
  }

  test("materialized view: incremental refresh reads ONLY new directories; replace falls back") {
    import graft.history.Materialized
    import graft.pipeline.Sketches
    val base = java.nio.file.Files.createTempDirectory("mvbase").toString
    val view = java.nio.file.Files.createTempDirectory("mview").toString
    val partial = (df: org.apache.spark.sql.DataFrame) =>
      Sketches.momentSketches(df, Seq("g"), col("cents"))
    val merge = (df: org.apache.spark.sql.DataFrame) =>
      Sketches.momentMerge(df, Seq("g"))
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    Snapshots.commit(Seq(("a", 100L), ("a", 200L)).toDF("g", "cents"), base)
    val v1 = Materialized.refresh(spark, base, view, partial, merge)
    assert(stats(v1.select("g", "n", "s")) == Map("a" -> (2L, 300L)))
    // PROOF of incrementality: delete batch 1's data from disk — a
    // full-rescan refresh would now fail; the delta refresh must not care
    val f = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(f.delete(new org.apache.hadoop.fs.Path(s"$base/data/d1"), true))
    Snapshots.commit(Seq(("a", 50L), ("b", 10L)).toDF("g", "cents"), base)
    val v2 = Materialized.refresh(spark, base, view, partial, merge)
    assert(stats(v2.select("g", "n", "s")) ==
      Map("a" -> (3L, 350L), "b" -> (1L, 10L)),
      "delta refresh must fold only the new directory into the stored view")
    // refresh when already current: unchanged
    assert(stats(Materialized.refresh(spark, base, view, partial, merge)
      .select("g", "n", "s")) == stats(v2.select("g", "n", "s")))
    // replace-commit rewrites history -> detected, full rebuild from latest
    Snapshots.commit(Seq(("c", 7L)).toDF("g", "cents"), base, replace = true)
    val v3 = Materialized.refresh(spark, base, view, partial, merge)
    assert(stats(v3.select("g", "n", "s")) == Map("c" -> (1L, 7L)),
      "history rewrite must trigger a full rebuild, never a stale merge")
    // crashed refresh: meta published for a view version that never
    // committed must be ignored — the delta is applied exactly ONCE
    val orphanV = Snapshots.versions(spark, view).last + 1
    val out = f.create(
      new org.apache.hadoop.fs.Path(s"$view/base_of_v$orphanV"), true)
    out.write(s"${Snapshots.versions(spark, base).last}\n".getBytes("UTF-8"))
    out.close()
    Snapshots.commit(Seq(("c", 3L)).toDF("g", "cents"), base)
    val v4 = Materialized.refresh(spark, base, view, partial, merge)
    assert(stats(v4.select("g", "n", "s")) == Map("c" -> (2L, 10L)),
      "orphan meta from a crashed refresh must not skip or double-merge the delta")
  }

  test("streaming sink: foreachBatch commits one atomic snapshot per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("snapstream").toString
    val input = MemoryStream[Long]
    def drain(): Unit = {
      val q = input.toDF().toDF("id").writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          Snapshots.commit(b, root): Unit
        }.start()
      q.processAllAvailable(); q.stop()
    }
    input.addData(1L, 2L); drain()
    input.addData(3L); drain()
    assert(Snapshots.versions(spark, root) == Seq(1L, 2L))
    assert(Snapshots.read(spark, root).count() == 3)
    assert(Snapshots.read(spark, root, Some(1L)).count() == 2,
      "each micro-batch must be its own pinnable snapshot")
  }

  test("a half-written data directory is invisible until its manifest publishes") {
    val root = java.nio.file.Files.createTempDirectory("snapstore3").toString
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), root)
    // simulate a writer that landed data but crashed before publishing
    Seq((99L, "zz")).toDF("id", "v").write.parquet(s"$root/data/d999")
    assert(Snapshots.read(spark, root).count() == 1,
      "unpublished data dir must not leak into reads")
    assert(Snapshots.versions(spark, root) == Seq(1L))
    // crashed-commit debris at the NEXT version number: the retry must
    // overwrite the unpublished directory and publish cleanly
    Seq((50L, "half")).toDF("id", "v").write.parquet(s"$root/data/d2")
    val v2 = Snapshots.commit(Seq((2L, "b")).toDF("id", "v"), root)
    assert(v2 == 2L)
    assert(Snapshots.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "retried commit must replace crash debris, not surface it")
  }
}
