package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The co-located-join story SCALE.md promises: two fact tables written
  * `bucketBy` the join key join WITHOUT any Exchange — at 100 TB this is
  * the difference between a nightly full shuffle and a scan-local join.
  * Pinned here because bucketing silently degrades (a mismatched bucket
  * count or a non-bucketed reader reintroduces the shuffle with no
  * error). */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equal-bucketed tables join with zero Exchange; mismatched bucketing shuffles") {
    // warehouse.dir is static — the shared session's default (spark-
    // warehouse under the test cwd) is fine; tables drop in finally
    val left = (1L to 1000L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 1000L).map(k => (k, k % 7)).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bj_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bj_right")
    // force the join shape that would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bj_left").join(spark.table("bj_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free:\n$plan")
      assert(joined.count() == 1000)

      // the degradation case: a non-bucketed side reintroduces the shuffle
      right.createOrReplaceTempView("bj_plain")
      val degraded = spark.table("bj_left").join(spark.table("bj_plain"), "k")
      assert(degraded.queryExecution.executedPlan.toString.contains("Exchange"),
        "a non-bucketed side must shuffle (this is the silent regression)")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bj_left")
      spark.sql("DROP TABLE IF EXISTS bj_right")
    }
  }
}
