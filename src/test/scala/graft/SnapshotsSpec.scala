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

  test("a half-written data directory is invisible until its manifest publishes") {
    val root = java.nio.file.Files.createTempDirectory("snapstore3").toString
    Snapshots.commit(Seq((1L, "a")).toDF("id", "v"), root)
    // simulate a writer that landed data but crashed before publishing
    Seq((99L, "zz")).toDF("id", "v").write.parquet(s"$root/data/d999")
    assert(Snapshots.read(spark, root).count() == 1,
      "unpublished data dir must not leak into reads")
    assert(Snapshots.versions(spark, root) == Seq(1L))
  }
}
