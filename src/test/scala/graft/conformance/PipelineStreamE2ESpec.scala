package graft.conformance

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.testing.{RuleTestEvent, RuleTestHarness}
import graft.streaming.Pipeline

/** End-to-end STREAMING composition receipt (r16 verdict ask #5): the
  * reference's conformance corpus replayed as a LIVE Structured Streaming
  * run through the full `Pipeline.start` topology (source → classify →
  * normalize → rules → merge → alerts parquet sink), asserting per-batch
  * alert-set equality against the batch harness ([[RuleTestHarness]]) on
  * IDENTICAL configuration. The operator rows prove the parts; this pins
  * the composition: what the batch engine triggers for an event is
  * exactly what lands in the streaming alerts table, in the batch the
  * event arrived.
  *
  * Scope notes: community rules declare no merge keys, so every alert
  * takes the merge passthrough and lands in its arrival batch (the
  * stateful merge path is pinned by MergeSpec with controlled event
  * times, and exercised at volume by StreamBench's pipeline mode);
  * events needing per-event fixtures (lookup tables / threat intel),
  * `override_record` resolution, or the zlib wire round-trip are
  * excluded — their paths are covered by ConformanceSpec, and the
  * streaming source replays raw lines. */
class PipelineStreamE2ESpec extends AnyFunSuite {
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
    "right_to_left_character",
    "github_disable_dismiss_stale_pull_request_approvals",
    "github_disable_protect_this_branch",
    "github_disable_required_pull_request_reviews",
    "github_disable_required_status_checks",
    "github_disable_two_factor_requirement_org",
    "github_disable_two_factor_requirement_user",
    "github_oauth_application_create",
    "github_site_admin_action",
    "github_site_admin_user_promotion",
    "duo_bypass_code_create_non_auto_generated",
    "duo_bypass_code_create_non_expiring",
    "duo_bypass_code_create_unlimited_use",
    "duo_fraud",
    "ssh_login_activity",
    "trendmicro_malware_event",
    "packetbeat_blacklisted_domain",
    "packetbeat_blacklisted_ip",
    "packetbeat_dns_lookup",
    "cloudtrail_critical_api_calls",
    "cloudtrail_mfa_policy_abuse_attempt",
    "cloudtrail_public_resources",
    "cloudtrail_snapshot_or_ami_made_public")

  private def load(name: String): Seq[RuleTestEvent] = {
    val in = getClass.getResourceAsStream(s"/conformance/$name.json")
    require(in != null, s"missing fixture resource $name.json")
    try RuleTestEvent.fromJson(new String(in.readAllBytes(), "UTF-8"))
    finally in.close()
  }

  private lazy val schemas = {
    def ref(s: Option[graft.core.LogSchema], what: String) =
      s.getOrElse(fail(s"reference conf schema $what unavailable"))
    Seq(CommunityRules.cloudwatchEvents, CommunityRules.binaryalert,
      CommunityRules.duoAuthentication,
      ref(CommunityRules.cloudtrailEvents, "cloudtrail:events"),
      ref(CommunityRules.gheGeneral, "ghe:general"),
      ref(CommunityRules.duoAdministrator, "duo:administrator"),
      ref(CommunityRules.trendmicroMalware, "trendmicro:malwareevent"),
      ref(CommunityRules.packetbeatDns, "packetbeat:dns"),
      ref(CommunityRules.packetbeatFlow, "packetbeat:flow")) ++
      CommunityRules.mitreSchemas
  }

  test("streamed Pipeline.start alert sets equal the batch harness, batch by batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // raw-line-replayable subset: no wire compression, no override_record
    // back-fill, no per-event fixture mocks
    val events = fixtures.flatMap(load).filter(e =>
      !e.compress && e.overrideRecordJson.isEmpty && e.dataJson != null &&
        e.lookupTableFixtures.isEmpty && e.threatIntelFixtures.isEmpty)
    assert(events.size >= 50, s"subset too small: ${events.size}")

    // batch ground truth on the SAME schemas/rules/matchers, no narrowing
    val harness = new RuleTestHarness(schemas, CommunityRules.all,
      matchers = CommunityRules.matchers,
      normalization = schemas.map(s => s.name -> s.normalization).toMap)
    val truth = harness.run(spark, events)
    assert(truth.size == events.size)
    val expectedByEvent: Seq[Seq[String]] = truth.map(_.triggered.toSeq)
    assert(expectedByEvent.flatten.nonEmpty, "ground truth triggered nothing")

    val batches: Seq[Seq[Int]] =
      events.indices.groupBy(_ % 3).toSeq.sortBy(_._1).map(_._2)

    val root = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val pipeline = new Pipeline(schemas,
      new graft.rules.RulesEngine(CommunityRules.all, CommunityRules.matchers),
      schemas.map(s => s.name -> s.normalization).toMap)
    val input = MemoryStream[String]
    val q = pipeline.start(input.toDS().toDF("value"),
      s"$root/alerts", s"$root/ckpt")
    try {
      var landedSoFar = Map.empty[String, Long]
      for (batch <- batches) {
        input.addData(batch.map(i => events(i).dataJson))
        q.processAllAvailable()
        val landed = (
          if (new java.io.File(s"$root/alerts").exists())
            spark.read.parquet(s"$root/alerts")
              .groupBy("rule_name").count()
              .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          else Map.empty[String, Long])
        val delta = landed.map { case (k, v) =>
          k -> (v - landedSoFar.getOrElse(k, 0L)) }.filter(_._2 > 0)
        val expected = batch.flatMap(expectedByEvent)
          .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        assert(delta === expected,
          s"batch alert multiset diverged: stream=$delta batch=$expected")
        landedSoFar = landed
      }
      // passthrough merge: every landed row is a single-alert group
      val counts = spark.read.parquet(s"$root/alerts")
        .select("alert_count").distinct().as[Long].collect().toSet
      assert(counts == Set(1L), s"expected singleton merge groups, got $counts")
      val total = spark.read.parquet(s"$root/alerts").count()
      assert(total == expectedByEvent.flatten.size.toLong)
    } finally q.stop()
  }
}
