package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.alerts.CarbonBlack

/** carbonblack.py:60-109 ban-hash state machine: action precedence,
  * resulting-state fold, and the dispatcher's idempotence (a replayed
  * plan must not change the banned table again). */
class CarbonBlackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ctx(action: String, value: Option[String]): String =
    value match {
      case Some(v) => s"""{"carbonblack":{"action":"$action","value":"$v"}}"""
      case None    => s"""{"carbonblack":{"action":"$action"}}"""
    }

  private val banned = Seq(
    ("h_enabled", true, "seed"),
    ("h_disabled", false, "seed")).toDF("md5hash", "enabled", "text")

  private val alerts = Seq(
    (1L, null.asInstanceOf[String]),            // falsy context
    (2L, "{}"),                                 // empty dict is falsy too
    (3L, ctx("isolate", Some("h_enabled"))),    // unsupported action
    (4L, ctx("ban", None)),                     // no hash value
    (5L, ctx("ban", Some("h_enabled"))),        // already banned+enabled
    (6L, ctx("ban", Some("h_disabled"))),       // banned but disabled
    (7L, ctx("ban", Some("h_new"))),            // not banned yet
    (8L, ctx("ban", Some("h_new")))             // same new hash twice
  ).toDF("alert_id", "context")

  test("banPlan follows the reference's precedence (carbonblack.py:72-109)") {
    val plan = CarbonBlack.banPlan(alerts, banned)
      .orderBy("alert_id")
      .select("alert_id", "action_plan", "success")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(plan === Seq(
      (1L, "error_no_context", false),
      (2L, "error_no_context", false),
      (3L, "error_unsupported_action", false),
      (4L, "error_no_value", false),
      (5L, "noop_already_banned", true),
      (6L, "reenable", true),
      (7L, "create_ban", true),
      (8L, "create_ban", true)))
  }

  test("falsy context matches Python truthiness on the parsed value") {
    // carbonblack.py:73 `if not alert.context` — the falsy JSON texts
    val falsy = Seq("{}", "{ }", " {}", "null", " null ", "", "  ",
      "[]", "[ ]", "false", "0", "\"\"",
      "\tnull", "\n{}\n", "0.0", "-0", "0e0", "0.00e-2")
    val truthy = Seq("""{"a":1}""", """{"carbonblack":{}}""", "\"0\"",
      "[0]", "true", "1", "\"x\"", "0.5", "10")
    val df = (falsy ++ truthy).zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("alert_id", "context")
    val plans = CarbonBlack.banPlan(df, banned).orderBy("alert_id")
      .select("action_plan").as[String].collect().toSeq
    assert(plans.take(falsy.length).forall(_ == "error_no_context"),
      s"falsy variants must all be error_no_context: $plans")
    assert(plans.drop(falsy.length).forall(_ != "error_no_context"),
      s"truthy variants must never be error_no_context: $plans")
  }

  test("applyPlan re-enables, creates once per hash, keeps text on re-enable") {
    val plan = CarbonBlack.banPlan(alerts, banned)
    val next = CarbonBlack.applyPlan(plan, banned)
      .orderBy("md5hash").as[(String, Boolean, String)].collect().toSeq
    assert(next === Seq(
      ("h_disabled", true, "seed"), // re-enabled, original text kept
      ("h_enabled", true, "seed"),
      ("h_new", true, CarbonBlack.BanText))) // one row despite two alerts
  }

  test("redelivery is idempotent: the same alerts against the new state are no-ops") {
    val s1 = CarbonBlack.applyPlan(CarbonBlack.banPlan(alerts, banned), banned)
    val replay = CarbonBlack.banPlan(alerts, s1)
    assert(replay.filter(col("success") &&
      col("action_plan") =!= "noop_already_banned").count() === 0)
    val s2 = CarbonBlack.applyPlan(replay, s1)
    assert(s2.orderBy("md5hash").collect().toSeq ===
      s1.orderBy("md5hash").collect().toSeq)
  }

  test("replaying the same MATERIALIZED plan cannot grow duplicate keys") {
    val plan = CarbonBlack.banPlan(alerts, banned)
    val s1 = CarbonBlack.applyPlan(plan, banned)
    val s2 = CarbonBlack.applyPlan(plan, s1) // same plan, not recomputed
    assert(s2.orderBy("md5hash").collect().toSeq ===
      s1.orderBy("md5hash").collect().toSeq)
    assert(s2.groupBy("md5hash").count().filter(col("count") > 1).count() === 0)
  }
}
