package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins
import java.sql.Timestamp

/** Temporal join semantics: as-of tie/before-first rules, range-join
  * half-open boundaries and multi-bucket intervals. */
class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: latest version <= ts wins, equal-ts matches, before-first is null") {
    val dim = Seq(
      (1L, ts("2024-01-01 10:00:00"), "v1"),
      (1L, ts("2024-01-01 12:00:00"), "v2"),
      (2L, ts("2024-01-01 11:00:00"), "w1"))
      .toDF("user_id", "ts", "ver")
    val fact = Seq(
      (100L, 1L, ts("2024-01-01 09:59:59")), // before any version -> null
      (101L, 1L, ts("2024-01-01 10:00:00")), // equal ts -> v1 (ties match)
      (102L, 1L, ts("2024-01-01 11:59:59")), // between -> v1
      (103L, 1L, ts("2024-01-01 12:00:01")), // after v2 -> v2
      (104L, 2L, ts("2024-01-01 12:00:00")), // other key -> w1, never v*
      (105L, 3L, ts("2024-01-01 12:00:00"))) // keyless -> null
      .toDF("event_id", "user_id", "ts")
    val out = TemporalJoins.asofJoin(fact, dim, Seq("user_id"), "ts", Seq("ver"))
      .select("event_id", "asof_ver").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(100L -> None, 101L -> Some("v1"), 102L -> Some("v1"),
      103L -> Some("v2"), 104L -> Some("w1"), 105L -> None))
  }

  test("range join: half-open [start, end), multi-bucket intervals, bucket-boundary facts") {
    val iv = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 13:30:00")), // spans 4 hour-buckets
      (2L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:00:00"))) // ends ON a boundary
      .toDF("window_id", "ws", "we")
    val fact = Seq(
      (200L, ts("2024-01-01 10:00:00")), // == start of 1 -> in 1 only
      (201L, ts("2024-01-01 10:30:00")), // in both
      (202L, ts("2024-01-01 10:59:59")), // in both
      (203L, ts("2024-01-01 11:00:00")), // we of 2 is exclusive -> 1 only
      (204L, ts("2024-01-01 13:29:59")), // last instant of 1
      (205L, ts("2024-01-01 13:30:00")), // end of 1 -> matches nothing
      (206L, ts("2024-01-01 09:59:59"))) // before everything
      .toDF("event_id", "ts")
    val got = TemporalJoins.rangeJoinBucketed(fact, "ts", iv, "ws", "we")
      .select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((200L, 1L), (201L, 1L), (201L, 2L), (202L, 1L),
      (202L, 2L), (203L, 1L), (204L, 1L)))
  }
}
