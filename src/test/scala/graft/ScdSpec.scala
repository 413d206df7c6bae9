package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.history.Scd

/** SCD2 assembly semantics: no-op folding, interval chaining, current
  * flags, and key isolation. */
class ScdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def log = Seq(
    // key 1: value change at t=10, no-op at t=20 (folds), change at t=30
    (1L, 0L, "a"), (1L, 10L, "b"), (1L, 20L, "b"), (1L, 30L, "c"),
    // key 2: single version
    (2L, 5L, "x")
  ).toDF("k", "ts", "v")

  test("no-op versions fold into the predecessor's interval") {
    val out = Scd.scd2(log, Seq("k"), "ts", Seq("v"))
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, "a", 0L, 10L, false),
      (1L, "b", 10L, 30L, false), // t=20 no-op folded; interval spans to 30
      (1L, "c", 30L, -1L, true),
      (2L, "x", 5L, -1L, true)))
  }

  test("a value that returns to an earlier state is still a new version") {
    val flip = Seq((1L, 0L, "a"), (1L, 10L, "b"), (1L, 20L, "a"))
      .toDF("k", "ts", "v")
    val out = Scd.scd2(flip, Seq("k"), "ts", Seq("v"))
      .select("v", "valid_from").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 0L), ("b", 10L), ("a", 20L)),
      "a->b->a must keep three versions (change detection is vs predecessor)")
  }

  test("scd2StoreStep: seed, incremental change batches, idempotent re-delivery") {
    val root = java.nio.file.Files.createTempDirectory("scdstore").toString
    // batch 1 seeds the store
    val seeded = Scd.scd2StoreStep(
      Seq((1L, 0L, "a"), (2L, 0L, "x")).toDF("k", "ts", "v"),
      root, Seq("k"), "ts", Seq("v"))
    assert(seeded.count() == 2 &&
      seeded.where(col("is_current")).count() == 2)
    // batch 2: real update for key 1, no-op for key 2, new key 3
    val batch2 = Seq((1L, 10L, "b"), (2L, 10L, "x"), (3L, 10L, "z"))
      .toDF("k", "ts", "v")
    val after = Scd.scd2StoreStep(batch2, root, Seq("k"), "ts", Seq("v"))
      .select("k", "v", "valid_from", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(after == Set(
      (1L, "a", 0L, false), (1L, "b", 10L, true),   // version chain rebuilt
      (2L, "x", 0L, true),                          // no-op folded away
      (3L, "z", 10L, true)))                        // insert
    // re-delivering batch 2 changes nothing (dropDuplicates on (k, ts))
    val again = Scd.scd2StoreStep(batch2, root, Seq("k"), "ts", Seq("v"))
      .select("k", "v", "valid_from", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(again == after, "store step must be idempotent under re-delivery")
  }

  test("randomized: intervals chain, no consecutive no-ops, state-at-T matches the naive model") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 30) {
      val log = (1L to 4L).flatMap { k =>
        val nv = 1 + rnd.nextInt(6)
        rnd.shuffle((0L until 20L).toList).take(nv)
          .map(ts => (k, ts, s"v${rnd.nextInt(3)}"))
      }
      val out = Scd.scd2(log.toDF("k", "ts", "v"), Seq("k"), "ts", Seq("v"))
        .select("k", "v", "valid_from", "valid_to")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
        .groupBy(_._1)
      for ((k, rows) <- out) {
        val chain = rows.sortBy(_._3)
        // intervals partition time from the first version onward
        for (Array(a, b) <- chain.sliding(2).map(_.toArray))
          assert(a._4 == b._3, s"gap/overlap in key $k: $chain")
        assert(chain.last._4 == Long.MaxValue)
        // no-op folding: consecutive versions always differ
        for (Array(a, b) <- chain.sliding(2).map(_.toArray))
          assert(a._2 != b._2, s"consecutive equal versions in key $k")
        // state at time T == last version at or before T in the raw log
        val versions = log.filter(_._1 == k).sortBy(_._2)
        for (t <- 0L until 20L if versions.exists(_._2 <= t)) {
          val expect = versions.filter(_._2 <= t).last._3
          val got = chain.find(c => c._3 <= t && t < c._4).get._2
          assert(got == expect, s"state at t=$t for key $k: $got != $expect")
        }
      }
    }
  }

  test("exactly one current row per key") {
    val cur = Scd.scd2(log, Seq("k"), "ts", Seq("v"))
      .where(col("is_current")).groupBy("k").count().collect()
    assert(cur.forall(_.getLong(1) == 1L))
  }
}
