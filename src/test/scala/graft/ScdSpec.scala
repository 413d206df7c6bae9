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

  test("exactly one current row per key") {
    val cur = Scd.scd2(log, Seq("k"), "ts", Seq("v"))
      .where(col("is_current")).groupBy("k").count().collect()
    assert(cur.forall(_.getLong(1) == 1L))
  }
}
