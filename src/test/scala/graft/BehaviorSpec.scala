package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Behavior

/** Funnel / cohort-retention semantics on hand-computed timelines. */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("funnel: order is strict — a step before its predecessor doesn't count") {
    val events = Seq(
      // u1 completes the funnel in order
      (1L, ts(1), "signup"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2 purchases BEFORE clicking: reaches step 2 only
      (2L, ts(1), "signup"), (2L, ts(5), "click"), (2L, ts(4), "purchase"),
      // u3 clicks before signing up, then never again: step 1 only
      (3L, ts(1), "click"), (3L, ts(2), "signup"),
      // u4 never signs up: no steps
      (4L, ts(1), "click"), (4L, ts(2), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Behavior.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1, "signup", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel: equal timestamps do not advance (strictly-after semantics)") {
    val events = Seq(
      (1L, ts(1), "signup"), (1L, ts(1), "click"), // same instant: no advance
      (2L, ts(1), "signup"), (2L, ts(2), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Behavior.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("signup", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(out == Map("signup" -> 2L, "click" -> 1L))
  }

  test("funnel: per-step conversion window excludes slow conversions") {
    val events = Seq(
      (1L, ts(1), "signup"), (1L, ts(5), "click"),   // 4 min: converts
      (2L, ts(1), "signup"), (2L, ts(40), "click"))  // 39 min: too slow
      .toDF("user_id", "ts", "event_type")
    val bounded = Behavior.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("signup", "click"), stepWithinMicros = Some(10L * 60 * 1000000))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(bounded == Map("signup" -> 2L, "click" -> 1L))
    // unbounded: both convert
    val open = Behavior.funnelCounts(events, "user_id", "ts", "event_type",
        Seq("signup", "click"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(open == Map("signup" -> 2L, "click" -> 2L))
  }

  test("retention cohorts: offsets count distinct members of the first-week cohort") {
    def wts(week: Int, day: Int) = new java.sql.Timestamp(
      (week * 7L + day) * 86400L * 1000L)
    val events = Seq(
      // u1 first active week 0, returns weeks 1 and 3
      (1L, wts(0, 1)), (1L, wts(1, 2)), (1L, wts(3, 0)), (1L, wts(3, 4)),
      // u2 first active week 0 only
      (2L, wts(0, 3)),
      // u3 first active week 1, returns week 2
      (3L, wts(1, 0)), (3L, wts(2, 6)))
      .toDF("user_id", "ts")
    val out = Behavior.retentionCohorts(events, "user_id", "ts", maxOffset = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val w0 = events.select(expr("unix_micros(ts) div 604800000000"))
      .as[Long].collect().min
    assert(out == Map(
      (w0, 0L) -> 2L, (w0 + 1L, 0L) -> 1L,
      (w0, 1L) -> 1L, (w0 + 1L, 1L) -> 1L,
      (w0, 3L) -> 1L))
  }

  test("dialogue validation: alternation, opening and closing roles") {
    import org.apache.spark.sql.functions._
    // conv 1: user/asst/user/asst — valid. conv 2: double user turn.
    // conv 3: opens with assistant. conv 4: ends on the user.
    val ev = Seq(
      (1L, 1L, "u"), (1L, 2L, "a"), (1L, 3L, "u"), (1L, 4L, "a"),
      (2L, 1L, "u"), (2L, 2L, "u"), (2L, 3L, "a"),
      (3L, 1L, "a"), (3L, 2L, "u"), (3L, 3L, "a"),
      (4L, 1L, "u"), (4L, 2L, "a"), (4L, 3L, "u"))
      .toDF("conv", "seq", "r")
      .withColumn("ts", col("seq").cast("timestamp"))
    val out = graft.operators.Behavior.validateDialogues(ev, "conv", "ts",
        when(col("r") === "u", "user").otherwise("assistant"), "seq")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getBoolean(3), x.getBoolean(4), x.getBoolean(5))).toMap
    assert(out(1L) == ((4L, 0L, true, true, true)), s"valid conv: ${out(1L)}")
    assert(out(2L) == ((3L, 1L, true, true, false)), s"repeat: ${out(2L)}")
    assert(out(3L) == ((3L, 0L, false, true, false)), s"opens wrong: ${out(3L)}")
    assert(out(4L) == ((3L, 0L, true, false, false)), s"ends wrong: ${out(4L)}")
  }
}
