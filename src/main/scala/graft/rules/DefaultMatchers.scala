package graft.rules

import org.apache.spark.sql.functions._

/** The shipped matcher library (matchers/default.py:19-89) re-expressed as
  * Column predicates: GuardDuty finding detection, osquery action/login
  * matchers, AWS Config compliance/remediation matchers. Registered under
  * the reference's names so rule configs port unchanged. */
object DefaultMatchers {

  private val Runlevels = Seq("", "LOGIN", "reboot", "shutdown", "runlevel")

  def registry: MatcherRegistry = {
    val m = new MatcherRegistry

    // AwsGuardDutyMatcher.guard_duty (default.py:23-25)
    m.register("guard_duty")(rec =>
      rec.getField("detail-type") === "GuardDuty Finding")

    // OsqueryMatcher.added (default.py:40-41)
    m.register("added")(rec => rec.getField("action") === "added")

    // OsqueryMatcher.user_login (default.py:44-55)
    m.register("user_login")(rec =>
      rec.getField("name") === "pack_incident-response_last" &&
        rec.getField("columns").getField("type").cast("long") === 7L &&
        !rec.getField("columns").getField("username").isin(Runlevels: _*))

    // AwsConfigMatcher.is_config_compliance (default.py:61-76)
    m.register("is_config_compliance")(rec =>
      rec.getField("eventSource") === "config.amazonaws.com" &&
        rec.getField("eventName") === "PutEvaluations" &&
        !rec.getField("requestParameters").getField("testMode").cast("boolean"))

    // AwsConfigMatcher.is_auto_remediation (default.py:79-89)
    m.register("is_auto_remediation")(rec =>
      rec.getField("eventName") === "StartAutomationExecution" &&
        rec.getField("eventSource") === "ssm.amazonaws.com" &&
        rec.getField("sourceIPAddress") === "config.amazonaws.com")

    m
  }
}
