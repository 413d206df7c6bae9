package graft.conformance

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.testing.{RuleTestEvent, RuleTestHarness}

/** Cross-engine rule conformance: the reference's OWN community-rule test
  * events (ported verbatim under src/test/resources/conformance — see the
  * README there) replayed through the real classify → rules pipeline, with
  * the reference's `trigger_rules` expectations as the assertion
  * (streamalert_cli/test/event.py:34-43 format,
  * streamalert_cli/test/handler.py:243-276 pass criterion). A divergence
  * here means the Scala rule ports and the reference's Python rules disagree
  * on a REAL fixture the reference itself tests against. */
class ConformanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fixtures = Seq(
    "cloudtrail_put_object_acl_public",
    "cloudtrail_root_account_usage",
    "cloudtrail_put_bucket_acl",
    "cloudtrail_network_acl_ingress_anywhere",
    "cloudtrail_security_group_ingress_anywhere",
    "cloudtrail_ec2_image_creation",
    "guard_duty_all",
    "binaryalert_yara_match",
    "cloudtrail_aws_config",
    "duo_anonymous_ip_failure", // 2nd event = override_record + defaults
    "right_to_left_character", // datatype-selected rule over 2 log types
    "duo_lookup_tables_example", // test_fixtures.lookup_tables leg
    "onelogin_events_threat_intel_example", // test_fixtures.threat_intel leg
    // ghe:general family: syslog envelope + json_regex_key classify leg
    "github_disable_dismiss_stale_pull_request_approvals",
    "github_disable_protect_this_branch",
    "github_disable_required_pull_request_reviews",
    "github_disable_required_status_checks",
    "github_disable_two_factor_requirement_org",
    "github_disable_two_factor_requirement_user",
    "github_oauth_application_create",
    "github_site_admin_action",
    "github_site_admin_user_promotion",
    "duo_bypass_code_create_non_auto_generated", // JSON-in-a-string probes
    "duo_bypass_code_create_non_expiring",
    "duo_bypass_code_create_unlimited_use",
    "duo_fraud",
    "fleet_bad_action", // data_sources disambiguation vs osquery
    "ssh_login_activity", // matcher-gated (added + user_login)
    "trendmicro_malware_event", // json_path "[*]" raw-array explosion
    "onelogin_events_assumed_role",
    "okta_new_login", // classification-only negative (no okta rules)
    "packetbeat_blacklisted_domain",
    "packetbeat_blacklisted_ip",
    "packetbeat_dns_lookup",
    "cloudtrail_critical_api_calls", // 15-event positive/negative sweep
    "cloudtrail_mfa_policy_abuse_attempt",
    "cloudtrail_public_resources", // policyuniverse is_internet_accessible
    "cloudtrail_snapshot_or_ami_made_public",
    // publisher_tests leg: slack Summary/RuleInfo/FullRecord + pagerduty
    // populate_fields/ShortenTitle/as_custom_details payload assertions
    "cloudtrail_put_object_acl_public_publisher_example")

  private def load(name: String): Seq[RuleTestEvent] = {
    val in = getClass.getResourceAsStream(s"/conformance/$name.json")
    require(in != null, s"missing fixture resource $name.json")
    try RuleTestEvent.fromJson(new String(in.readAllBytes(), "UTF-8"))
    finally in.close()
  }

  private lazy val harness = {
    // cloudtrail:events loads from the reference's own conf declaration
    // (Records[*] json_path explosion) — the conformance run exercises the
    // real envelope/explosion classify path, not a flattened stand-in
    val cloudtrail = CommunityRules.cloudtrailEvents.getOrElse(
      fail("reference conf/schemas/cloudtrail.json unavailable"))
    val onelogin = CommunityRules.oneloginEvents.getOrElse(
      fail("reference conf/schemas/onelogin.json unavailable"))
    val ghe = CommunityRules.gheGeneral.getOrElse(
      fail("reference conf/schemas/ghe.json unavailable"))
    def ref(s: Option[graft.core.LogSchema], what: String) =
      s.getOrElse(fail(s"reference conf schema $what unavailable"))
    val schemas = Seq(CommunityRules.cloudwatchEvents, CommunityRules.binaryalert,
      CommunityRules.duoAuthentication, cloudtrail, onelogin, ghe,
      ref(CommunityRules.duoAdministrator, "duo:administrator"),
      ref(CommunityRules.fleetResults, "fleet:results"),
      ref(CommunityRules.trendmicroMalware, "trendmicro:malwareevent"),
      ref(CommunityRules.packetbeatDns, "packetbeat:dns"),
      ref(CommunityRules.packetbeatFlow, "packetbeat:flow"),
      ref(CommunityRules.oktaLogevents, "okta:logevents")) ++
      CommunityRules.mitreSchemas
    assert(CommunityRules.mitreSchemas.size == 2,
      "carbonblack/osquery schemas must load from the reference conf")
    val tiConf = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/conf/threat_intel.json")), "UTF-8")
    // the reference's own cluster data_sources mapping narrows each event's
    // candidate schemas by (service, source) — this is what separates
    // fleet:results (s3) from osquery:differential (kinesis), whose
    // required key sets overlap
    val clusterConf = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/conf/clusters/prod.json")), "UTF-8")
    new RuleTestHarness(schemas, CommunityRules.all,
      matchers = CommunityRules.matchers,
      normalization = schemas.map(s => s.name -> s.normalization).toMap,
      threatIntelConfJson = Some(tiConf),
      dataSources = Some(graft.core.DataSources.loadClusterJson(clusterConf)))
  }

  // one batched run per fixture file, every event asserted individually so
  // a failure names the reference event that diverged
  for (fixture <- fixtures) {
    test(s"reference fixture $fixture matches the reference trigger expectations") {
      val events = load(fixture)
      assert(events.nonEmpty, s"$fixture parsed no events")
      val results = harness.run(spark, events)
      val failures = results.filterNot(_.passed)
      assert(failures.isEmpty,
        failures.map(_.report).mkString("\n", "\n", ""))
    }
  }

  test("every ported rule is exercised by at least one fixture event") {
    val events = fixtures.flatMap(load)
    val untested = harness.untestedRules(events)
    assert(untested.isEmpty, s"rules with no triggering fixture: $untested")
  }
}
