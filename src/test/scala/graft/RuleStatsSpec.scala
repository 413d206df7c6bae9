package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.rules._

class RuleStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("observe() collects per-rule fire counts with no extra pass") {
    val typed = Seq((1L, "error", 200.0), (2L, "ok", 10.0), (3L, "error", 5.0))
      .toDF("event_id", "etype", "value")
      .select(struct(col("event_id"), col("etype"), col("value")).as("record"))
    val rules = Seq(
      Rule("any_error", RuleOpts(logs = Seq("t")), r => r.getField("etype") === "error"),
      Rule("big", RuleOpts(logs = Seq("t")), r => r.getField("value") > 100))
    val engine = new RulesEngine(rules, deterministicIds = true)
    val (observedAlerts, obs) = RuleStats.observed(engine.evaluate(typed, "t"), rules)
    observedAlerts.count() // action completes the observation
    val m = obs.get
    assert(m("alerts_total") == 3L)
    assert(m("alerts_any_error") == 2L)
    assert(m("alerts_big") == 1L)
    assert(RuleStats.report(m).contains("any_error"))
  }
}
