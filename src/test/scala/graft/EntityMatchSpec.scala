package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Blocked fuzzy entity matching: keep-best determinism, the distance
  * threshold, and blocking as a hard wall. */
class EntityMatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val clean = Seq(
    (1L, "alice smith", "uk"), (2L, "alyce smith", "uk"),
    (3L, "bob jones", "us"), (4L, "alice smith", "us"))
    .toDF("id", "name", "geo")

  private def matchAll(dirty: org.apache.spark.sql.DataFrame, maxDist: Int) =
    Dedup.entityMatch(dirty, clean, "d_id", "id", "d_name", "name",
        blockKeys = Seq(col("d_geo") -> col("geo")), maxDist = maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("best match wins; ties break to the smallest clean id") {
    // 'alice smyth' is dist 1 from 'alice smith' and dist 2 from
    // 'alyce smith' -> links to 1; exact duplicate name ties at dist 0
    val dirty = Seq((10L, "alice smyth", "uk"), (11L, "alice smith", "uk"))
      .toDF("d_id", "d_name", "d_geo")
    assert(matchAll(dirty, 2).sorted == Seq((10L, 1L, 1L), (11L, 1L, 0L)))
  }

  test("blocking is a hard wall and the threshold drops non-matches") {
    // same name in a different geo block never matches; gibberish under
    // the threshold is absent from the output
    val dirty = Seq((20L, "alice smith", "de"), (21L, "zzzzz", "uk"))
      .toDF("d_id", "d_name", "d_geo")
    assert(matchAll(dirty, 2).isEmpty)
    // but the us block has its own alice
    val dirtyUs = Seq((22L, "alice smith", "us")).toDF("d_id", "d_name", "d_geo")
    assert(matchAll(dirtyUs, 2) == Seq((22L, 4L, 0L)))
  }
}
