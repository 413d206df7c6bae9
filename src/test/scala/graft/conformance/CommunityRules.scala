package graft.conformance

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.{FieldType, LogSchema, ParserKind}
import graft.core.FieldType._
import graft.rules.{Helpers, MatcherRegistry, Rule, RuleOpts}

/** Scala ports of the reference's community cloudwatch_events rules — the
  * rules exercised by the conformance fixtures under
  * `src/test/resources/conformance/`.
  *
  * The reference declares `detail` as a loose `{}` object
  * (conf/schemas/cloudwatch.json "cloudwatch:events") and its Python rules
  * walk the parsed dict dynamically. The engine keeps the same schema shape:
  * `{}` is an open map whose nested values stay raw JSON text, so these
  * ports navigate sub-documents with `get_json_object` (plan-time JSONPath,
  * codegen'd) instead of declaring a struct the reference never declares.
  * Every predicate cites the Python rule it re-expresses; trigger semantics
  * are pinned event-by-event by ConformanceSpec against the reference's own
  * `trigger_rules` expectations.
  */
object CommunityRules {

  /** conf/schemas/cloudwatch.json "cloudwatch:events": nine top-level keys,
    * loose detail. */
  val cloudwatchEvents: LogSchema = LogSchema(
    name = "cloudwatch:events",
    parser = ParserKind.Json,
    schema = TStruct.of(
      "account" -> TString, "detail" -> TAnyMap, "detail-type" -> TString,
      "id" -> TString, "region" -> TString, "resources" -> TList,
      "source" -> TString, "time" -> TString, "version" -> TString))

  private def detail(rec: Column, key: String): Column =
    rec.getField("detail").getField(key)

  /** `'needle' in get_keys(subdoc, key)` over a raw-JSON sub-document: the
    * reference BFS-walks the dict for `key` anywhere (shared/utils.py
    * get_keys); on compact re-serialized JSON the equivalent is the exact
    * `"key":"value"` adjacency. */
  private def jsonKeyHasValue(rawJson: Column, key: String, value: String): Column = {
    val needle = "\"" + key + "\":\"" + value + "\""
    coalesce(rawJson.contains(needle), lit(false))
  }

  private val PublicAcls = Seq(
    "http://acs.amazonaws.com/groups/global/AuthenticatedUsers",
    "http://acs.amazonaws.com/groups/global/AllUsers")

  /** cloudtrail_put_object_acl_public.py:18-39: PutObjectAcl granting
    * AllUsers/AuthenticatedUsers (substring match — the URI appears bare or
    * as `uri=...`), except for expected-public buckets. */
  val putObjectAclPublic: Rule = Rule(
    "cloudtrail_put_object_acl_public",
    RuleOpts(
      logs = Seq("cloudwatch:events"),
      reqSubkeys = Map("detail" -> Seq("requestParameters")),
      description = "Identifies new S3 object ACLs that grant access to the public"),
    rec => {
      val rp = detail(rec, "requestParameters")
      detail(rec, "eventName") === "PutObjectAcl" &&
        Helpers.rawJsonHasSubstring(rp, PublicAcls) &&
        // reference: req_params.get('bucketName') not in _PUBLIC_BUCKETS —
        // absent bucketName passes the not-in check
        coalesce(!get_json_object(rp, "$.bucketName")
          .isin("example-bucket-to-ignore"), lit(true))
    })

  /** cloudtrail_root_account_usage.py:19-22: Root credentials used directly
    * (not invoked by a service, not an AwsServiceEvent). */
  val rootAccountUsage: Rule = Rule(
    "cloudtrail_root_account_usage",
    RuleOpts(
      logs = Seq("cloudwatch:events"),
      reqSubkeys = Map("detail" -> Seq("userIdentity", "eventType")),
      description = "Root AWS credentials are being used"),
    rec => {
      val ui = detail(rec, "userIdentity")
      get_json_object(ui, "$.type") === "Root" &&
        get_json_object(ui, "$.invokedBy").isNull &&
        detail(rec, "eventType") =!= "AwsServiceEvent"
    })

  /** cloudtrail_put_bucket_acl.py:20-46: PutBucketAcl whose grant list
    * includes an AllUsers/AuthenticatedUsers grantee URI. */
  val putBucketAcl: Rule = Rule(
    "cloudtrail_put_bucket_acl",
    RuleOpts(
      logs = Seq("cloudwatch:events"),
      reqSubkeys = Map("detail" -> Seq("requestParameters", "eventName")),
      description = "S3 bucket ACL grants access to AllUsers/AuthenticatedUsers"),
    rec => {
      val rp = detail(rec, "requestParameters")
      // Grant is a list in the event shape; the reference iterates it and
      // exact-matches each Grantee URI against the denied set
      val uris = coalesce(
        get_json_object(rp, "$.AccessControlPolicy.AccessControlList.Grant[*].Grantee.URI"),
        get_json_object(rp, "$.AccessControlPolicy.AccessControlList.Grant.Grantee.URI"),
        lit(""))
      detail(rec, "eventName") === "PutBucketAcl" &&
        PublicAcls.map(uri => uris.contains("\"" + uri + "\"") || uris === uri)
          .reduce(_ || _)
    })

  /** cloudtrail_network_acl_ingress_anywhere.py:17-27: CreateNetworkAclEntry
    * allowing ingress (egress=false) from 0.0.0.0/0. */
  val networkAclIngressAnywhere: Rule = Rule(
    "cloudtrail_network_acl_ingress_anywhere",
    RuleOpts(
      logs = Seq("cloudwatch:events"),
      reqSubkeys = Map("detail" -> Seq("eventName", "requestParameters")),
      description = "Network ACL allows ingress from anywhere"),
    rec => {
      val rp = detail(rec, "requestParameters")
      detail(rec, "eventName") === "CreateNetworkAclEntry" &&
        get_json_object(rp, "$.cidrBlock") === "0.0.0.0/0" &&
        get_json_object(rp, "$.ruleAction") === "allow" &&
        get_json_object(rp, "$.egress") === "false"
    })

  /** cloudtrail_security_group_ingress_anywhere.py:17-33:
    * AuthorizeSecurityGroupIngress with any nested cidrIp 0.0.0.0/0 or
    * cidrIpv6 ::/0 (the reference deep-searches with get_keys). */
  val securityGroupIngressAnywhere: Rule = Rule(
    "cloudtrail_security_group_ingress_anywhere",
    RuleOpts(
      logs = Seq("cloudwatch:events"),
      reqSubkeys = Map("detail" -> Seq("eventName", "requestParameters")),
      description = "Security Group allows ingress from anywhere"),
    rec => {
      val rp = detail(rec, "requestParameters")
      detail(rec, "eventName") === "AuthorizeSecurityGroupIngress" &&
        (jsonKeyHasValue(rp, "cidrIp", "0.0.0.0/0") ||
          jsonKeyHasValue(rp, "cidrIpv6", "::/0"))
    })

  /** cloudtrail_ec2_image_creation.py unencrypted_ami_volume: CreateImage
    * whose block devices include no encrypted volume (the reference collects
    * each device's ebs.encrypted and alerts when none is truthy). */
  val unencryptedAmiVolume: Rule = Rule(
    "unencrypted_ami_volume",
    RuleOpts(
      logs = Seq("cloudwatch:events"),
      reqSubkeys = Map("detail" -> Seq("requestParameters", "eventName")),
      description = "AMI created with a non-encrypted volume"),
    rec => {
      val rp = detail(rec, "requestParameters")
      val items = get_json_object(rp, "$.blockDeviceMapping.items[*]")
      val encrypted = get_json_object(rp, "$.blockDeviceMapping.items[*].ebs.encrypted")
      detail(rec, "eventName") === "CreateImage" &&
        items.isNotNull &&
        coalesce(!encrypted.contains("true"), lit(true))
    })

  /** cloudtrail_ec2_image_creation.py public_ami: ModifyImageAttribute
    * adding a launch permission for the `all` group. */
  val publicAmi: Rule = Rule(
    "public_ami",
    RuleOpts(
      logs = Seq("cloudwatch:events"),
      reqSubkeys = Map("detail" -> Seq("requestParameters", "eventName")),
      description = "AMI made public via launchPermission group=all"),
    rec => {
      val rp = detail(rec, "requestParameters")
      val groups = get_json_object(rp, "$.launchPermission.add.items[*].group")
      detail(rec, "eventName") === "ModifyImageAttribute" &&
        coalesce(groups.contains("\"all\"") || groups === "all", lit(false))
    })

  /** conf/schemas/duo.json "duo:authentication": flat scalars + two loose
    * sub-documents. Its fixture's second event arrives as an
    * `override_record` (sparse record over schema zero-values), exercising
    * that leg of the reference test-event format. */
  val duoAuthentication: LogSchema = LogSchema(
    name = "duo:authentication",
    parser = ParserKind.Json,
    schema = TStruct.of(
      "access_device" -> TAnyMap, "alias" -> TString, "device" -> TString,
      "factor" -> TString, "integration" -> TString, "ip" -> TString,
      "isotimestamp" -> TString, "location" -> TAnyMap,
      "new_enrollment" -> TBoolean, "reason" -> TString, "result" -> TString,
      "timestamp" -> TInteger, "username" -> TString))

  /** duo_authentication/duo_anonymous_ip_failure.py: FAILURE with reason
    * 'Anonymous IP'. */
  val duoAnonymousIpFailure: Rule = Rule(
    "duo_anonymous_ip_failure",
    RuleOpts(
      logs = Seq("duo:authentication"),
      description = "Duo auth failure due to an Anonymous IP"),
    rec => rec.getField("result") === "FAILURE" &&
      rec.getField("reason") === "Anonymous IP")

  /** conf/schemas/binaryalert.json: two loose sub-documents + a count the
    * reference coerces from its string test value. */
  val binaryalert: LogSchema = LogSchema(
    name = "binaryalert",
    parser = ParserKind.Json,
    schema = TStruct.of(
      "FileInfo" -> TAnyMap, "MatchedRules" -> TAnyMap,
      "NumMatchedRules" -> TInteger))

  /** The reference's OWN cloudtrail:events schema declaration
    * (conf/schemas/cloudtrail.json — Records[*] json_path explosion,
    * 18 optional top-level keys), loaded verbatim so the conformance run
    * classifies through the exact declared shape. */
  lazy val cloudtrailEvents: Option[LogSchema] = {
    val f = new java.io.File("/root/reference/conf/schemas/cloudtrail.json")
    if (!f.isFile) None
    else LogSchema.loadConfJson(
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      .find(_.name == "cloudtrail:events")
  }

  /** The library matchers the community rules reference
    * (matchers/default.py:20-95), as reusable Column predicates. */
  val matchers: MatcherRegistry = {
    val m = new MatcherRegistry
    // AwsGuardDutyMatcher.guard_duty (default.py:23-24)
    m.register("guard_duty")(rec =>
      rec.getField("detail-type") === "GuardDuty Finding")
    // AwsConfigMatcher.is_config_compliance (default.py:61-74): config
    // PutEvaluations outside testMode (`not testMode` — absent counts as
    // not-test, matching Python falsiness)
    m.register("is_config_compliance") { rec =>
      val testMode = rec.getField("requestParameters").getField("testMode")
      rec.getField("eventSource") === "config.amazonaws.com" &&
        rec.getField("eventName") === "PutEvaluations" &&
        !coalesce(testMode === "true", lit(false))
    }
    // AwsConfigMatcher.is_auto_remediation (default.py:77-89)
    m.register("is_auto_remediation")(rec =>
      rec.getField("eventName") === "StartAutomationExecution" &&
        rec.getField("eventSource") === "ssm.amazonaws.com" &&
        rec.getField("sourceIPAddress") === "config.amazonaws.com")
    // OsqueryMatcher.added (default.py:40-41)
    m.register("osquery_added")(rec => rec.getField("action") === "added")
    // OsqueryMatcher.user_login (default.py:43-55): last-table login rows
    // (type 7) whose username is not a runlevel pseudo-user; `columns` is a
    // loose sub-document so `int(columns['type'])` becomes a bigint cast
    m.register("osquery_user_login") { rec =>
      val cols = rec.getField("columns")
      rec.getField("name") === "pack_incident-response_last" &&
        coalesce(cols.getField("type").cast("bigint") === 7, lit(false)) &&
        coalesce(!cols.getField("username")
          .isin("", "LOGIN", "reboot", "shutdown", "runlevel"), lit(false))
    }
    m
  }

  /** guardduty/guard_duty_all.py: matcher-gated, body returns True. */
  val guardDutyAll: Rule = Rule(
    "guard_duty_all",
    RuleOpts(
      logs = Seq("cloudwatch:events"),
      matchers = Seq("guard_duty"),
      description = "Alert on GuardDuty events"),
    _ => lit(true))

  /** binaryalert/binaryalert_yara_match.py: NumMatchedRules > 0. */
  val binaryalertYaraMatch: Rule = Rule(
    "binaryalert_yara_match",
    RuleOpts(
      logs = Seq("binaryalert"),
      description = "BinaryAlert found a binary matching a YARA rule"),
    rec => rec.getField("NumMatchedRules") > 0)

  /** cloudtrail/cloudtrail_aws_config.py config_compliance: any evaluation
    * NON_COMPLIANT (the RULES_TO_ALERT_ON allowlist ships empty — all
    * rules in scope, the branch the fixtures exercise). */
  val configCompliance: Rule = Rule(
    "config_compliance",
    RuleOpts(
      logs = Seq("cloudtrail:events"),
      matchers = Seq("is_config_compliance"),
      description = "AWS Config compliance change of NON_COMPLIANT"),
    rec => {
      val evals = rec.getField("requestParameters").getField("evaluations")
      coalesce(get_json_object(evals, "$[*].complianceType")
        .contains("NON_COMPLIANT"), lit(false))
    })

  /** cloudtrail/cloudtrail_aws_config.py config_auto_remediation:
    * matcher-gated, body returns True. */
  val configAutoRemediation: Rule = Rule(
    "config_auto_remediation",
    RuleOpts(
      logs = Seq("cloudtrail:events"),
      matchers = Seq("is_auto_remediation"),
      description = "AWS Config auto-remediation"),
    _ => lit(true))

  /** The two log types the mitre right_to_left_character fixtures span,
    * loaded from the reference's own conf declarations (v2 normalization
    * embedded: carbonblack `command_line`→command, osquery
    * `columns.command`→command) with the v1 normalized_types.json merged
    * like a real deployment. */
  lazy val mitreSchemas: Seq[LogSchema] = {
    val confDir = new java.io.File("/root/reference/conf")
    def read(p: java.io.File): String =
      new String(java.nio.file.Files.readAllBytes(p.toPath), "UTF-8")
    def load(name: String): Seq[LogSchema] =
      LogSchema.loadConfJson(read(new java.io.File(confDir, s"schemas/$name")))
    if (!confDir.isDirectory) Nil
    else {
      val wanted = load("carbonblack.json")
        .filter(_.name == "carbonblack:ingress.event.procstart") ++
        load("osquery.json").filter(_.name == "osquery:differential")
      val v1 = new java.io.File(confDir, "normalized_types.json")
      if (v1.isFile)
        LogSchema.mergeV1Normalization(wanted,
          LogSchema.loadNormalizedTypesJson(read(v1)))
      else wanted
    }
  }

  /** mitre_attack/.../right_to_left_character.py: a DATATYPE-selected rule
    * (no logs list — it runs wherever command/path/file_name normalize),
    * alerting when any normalized value carries the U+202E
    * right-to-left-override character. The read surface is
    * `Normalizer.get_values_for_normalized_type` exactly as the reference
    * (normalize.py:336-352 → [[graft.classify.Normalizer.valuesForNormalizedType]]). */
  val rightToLeftCharacter: Rule = Rule(
    "right_to_left_character",
    RuleOpts(
      datatypes = Seq("command", "path", "file_name"),
      description = "File disguised with the RLO unicode trick"),
    _ => Seq("command", "path", "file_name").map { t =>
      coalesce(exists(
        graft.classify.Normalizer.valuesForNormalizedType(
          col(graft.classify.Normalizer.NormalizationKey), t),
        v => v.contains("\u202e")), lit(false))
    }.reduce(_ || _))

  /** The reference's onelogin:events schema + the v1 normalized-types merge
    * (sourceAddress ← ipaddr/proxy_ip) the threat-intel candidates need,
    * loaded verbatim from the reference conf. */
  lazy val oneloginEvents: Option[LogSchema] = {
    val confDir = new java.io.File("/root/reference/conf")
    if (!confDir.isDirectory) None
    else {
      def read(p: java.io.File): String =
        new String(java.nio.file.Files.readAllBytes(p.toPath), "UTF-8")
      val loaded = LogSchema.loadConfJson(
        read(new java.io.File(confDir, "schemas/onelogin.json")))
        .filter(_.name == "onelogin:events")
      LogSchema.mergeV1Normalization(loaded, LogSchema.loadNormalizedTypesJson(
        read(new java.io.File(confDir, "normalized_types.json")))).headOption
    }
  }

  /** duo_authentication/duo_lookup_tables_example.py: the browser sits in a
    * lookup-table blacklist. The table arrives via the event's
    * `test_fixtures.lookup_tables` (a LIST value — MapLookupTable carries it
    * as JSON text, parsed back here), read through the same
    * `LookupTables.get(table, key, default)` author surface as the
    * reference. */
  val duoLookupTablesExample: Rule = Rule(
    "duo_lookup_tables_example",
    RuleOpts(
      logs = Seq("duo:authentication"),
      description = "Duo auth from a blacklisted browser per lookup table"),
    rec => {
      val blacklist = from_json(
        graft.testing.TestFixtures.lookupTables.get(
          "dynamo-backed-table", lit("duo_blacklisted_browsers"), lit("[]")),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
      coalesce(array_contains(blacklist,
        rec.getField("access_device").getField("browser")), lit(false))
    })

  /** onelogin/onelogin_events_threat_intel_example.py: fires when the
    * record's annotated IOC map has an `ip` entry — the mocked IOC table
    * comes from `test_fixtures.threat_intel` and joins through the REAL
    * ThreatIntel.annotate path (normalization → candidates → broadcast IOC
    * join). Deviation, documented: the reference ships this rule @disable'd
    * (TI needs deployment config); the port enables it so the fixture's
    * recorded trigger expectation is actually asserted. */
  val oneloginThreatIntelExample: Rule = Rule(
    "onelogin_events_threat_intel_example",
    RuleOpts(
      logs = Seq("onelogin:events"),
      description = "OneLogin activity from a malicious IP per threat intel"),
    _ => coalesce(
      size(element_at(col(graft.rules.ThreatIntel.IocKey), "ip")) > 0,
      lit(false)))

  /** Load one schema verbatim from the reference's conf/schemas tree, so
    * conformance classifies through the exact declared shape. */
  private def refSchema(file: String, name: String): Option[LogSchema] = {
    val f = new java.io.File(s"/root/reference/conf/schemas/$file")
    if (!f.isFile) None
    else LogSchema.loadConfJson(
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      .find(_.name == name)
  }

  /** The reference's ghe:general schema: syslog envelope keys +
    * `json_regex_key: "message"` extraction (the audit JSON rides inside a
    * syslog line), with loose `data`/`org_id` sub-documents — the
    * conformance run exercises the real envelope + json-regex-key classify
    * leg. */
  lazy val gheGeneral: Option[LogSchema] = refSchema("ghe.json", "ghe:general")

  /** duo:administrator (conf/schemas/duo.json): flat admin-action records
    * whose `description` field is a JSON document in a string. */
  lazy val duoAdministrator: Option[LogSchema] =
    refSchema("duo.json", "duo:administrator")

  /** fleet:results (conf/schemas/fleet.json). All nine keys required —
    * its events ALSO satisfy osquery:differential's required set, so
    * resolution rides the cluster data_sources filter (fleet arrives via
    * s3, osquery via kinesis), exactly as the reference disambiguates. */
  lazy val fleetResults: Option[LogSchema] =
    refSchema("fleet.json", "fleet:results")

  /** trendmicro:malwareevent (conf/schemas/trendmicro.json): `json_path
    * "[*]"` — each payload is a raw JSON ARRAY that explodes into events,
    * exercising the explosion classify leg on a reference-declared shape. */
  lazy val trendmicroMalware: Option[LogSchema] =
    refSchema("trendmicro.json", "trendmicro:malwareevent")

  lazy val packetbeatDns: Option[LogSchema] =
    refSchema("packetbeat.json", "packetbeat:dns")

  lazy val packetbeatFlow: Option[LogSchema] =
    refSchema("packetbeat.json", "packetbeat:flow")

  /** okta:logevents — its fixture declares no rules (a classification-only
    * negative: the event must classify and fire nothing). */
  lazy val oktaLogevents: Option[LogSchema] =
    refSchema("okta.json", "okta:logevents")

  private def gheActionRule(name: String, action: String, desc: String): Rule =
    Rule(name, RuleOpts(logs = Seq("ghe:general"), description = desc),
      rec => rec.getField("action") === action)

  /** rules/community/github (nine .py files) — the ghe:general
    * audit-action rules. Seven are exact
    * `rec['action'] == ...` checks; the ported predicates cite each file. */
  val githubDisableDismissStale: Rule = gheActionRule(
    "github_disable_dismiss_stale_pull_request_approvals",
    // github_disable_dismiss_stale_pull_request_approvals.py:18
    "protected_branch.dismiss_stale_reviews",
    "Dismiss stale pull request approvals was disabled for a repo")

  val githubDisableProtectBranch: Rule = gheActionRule(
    "github_disable_protect_this_branch",
    // github_disable_protect_this_branch.py:20
    "protected_branch.destroy",
    "Protect this branch was disabled for a repo")

  /** github_disable_required_pull_request_reviews.py:19-21: dismissal
    * restriction update with `data.authorized_actors_only is True`; the
    * shipped `actor_ignorelist` is empty so the not-in check always holds
    * (noted, not ported as a constant-true conjunct). `data` is a loose
    * sub-document (map of raw-JSON value text), so the `is True` read
    * compares against the literal `true`. */
  val githubDisableRequiredReviews: Rule = Rule(
    "github_disable_required_pull_request_reviews",
    RuleOpts(
      logs = Seq("ghe:general"),
      description = "Require pull request reviews before merging was disabled"),
    rec => rec.getField("action") === "protected_branch.dismissal_restricted_users_teams" &&
      coalesce(rec.getField("data").getField("authorized_actors_only") === "true",
        lit(false)))

  /** github_disable_required_status_checks.py:18-23: enforcement level reset
    * to 0 (unchecked); the JSON number 0 reads back as the text "0". */
  val githubDisableRequiredStatusChecks: Rule = Rule(
    "github_disable_required_status_checks",
    RuleOpts(
      logs = Seq("ghe:general"),
      description = "Required status checks was disabled for a repo"),
    rec => rec.getField("action") === "protected_branch.update_required_status_checks_enforcement_level" &&
      coalesce(rec.getField("data").getField("required_status_checks_enforcement_level") === "0",
        lit(false)))

  val githubDisableTwoFactorOrg: Rule = gheActionRule(
    "github_disable_two_factor_requirement_org",
    // github_disable_two_factor_requirement_org.py:17
    "org.disable_two_factor_requirement",
    "Two-factor authentication requirement was disabled for an org")

  val githubDisableTwoFactorUser: Rule = gheActionRule(
    "github_disable_two_factor_requirement_user",
    // github_disable_two_factor_requirement_user.py:14
    "two_factor_authentication.disabled",
    "Two-factor authentication requirement was disabled for a user")

  val githubOauthApplicationCreate: Rule = gheActionRule(
    "github_oauth_application_create",
    // github_oauth_application_create.py:13
    "oauth_application.create",
    "An OAuth application was registered within Github")

  /** github_site_admin_action.py:15: prefix match on staff.* actions. */
  val githubSiteAdminAction: Rule = Rule(
    "github_site_admin_action",
    RuleOpts(
      logs = Seq("ghe:general"),
      description = "A Github site admin tool/action was used"),
    rec => rec.getField("action").startsWith("staff."))

  val githubSiteAdminUserPromotion: Rule = gheActionRule(
    "github_site_admin_user_promotion",
    // github_site_admin_user_promotion.py:15
    "user.promote",
    "A Github Enterprise user account was promoted to a site admin")

  /** cloudtrail_put_object_acl_public_publisher_example.py:18-63: the
    * publisher-demo variant of the public-ACL rule — gated to its own test
    * event via the `sourceIPAddress == 1.2.3.4` hack the reference
    * documents. Carries the reference docstring VERBATIM as the rule
    * description (the Summary / AttachRuleInfo publishers parse it) and the
    * `populate_fields` context list. */
  val putObjectAclPublisherExample: Rule = {
    // the rule's context['populate_fields'] list, bound at registration
    // exactly as the reference's publisher reads it from the alert context
    graft.alerts.Publishers.register("populate_fields_acl_example")(
      graft.alerts.Publishers.populateFields(Seq(
        "userName", "sourceIPAddress", "eventTime", "eventName",
        "eventSource", "bucketName")))
    Rule(
    "cloudtrail_put_object_acl_public_publisher_example",
    RuleOpts(
      logs = Seq("cloudwatch:events"),
      reqSubkeys = Map("detail" ->
        Seq("eventName", "requestParameters", "sourceIPAddress")),
      outputs = Seq("slack:sample-channel", "pagerduty:sample-integration"),
      // the reference's publishers={'slack': [...], 'pagerduty': [...]}
      // dict form, resolved per output by RulesEngine.configurePublishers
      publishersByOutput = Map(
        "slack" -> Seq(
          "slack_summary", "slack_attach_rule_info", "slack_attach_full_record"),
        "pagerduty" -> Seq(
          "add_record", "populate_fields_acl_example", "pretty_print_arrays",
          "pagerduty_shorten_title", "pagerduty_as_custom_details")),
      context = Map("populate_fields" ->
        "userName,sourceIPAddress,eventTime,eventName,eventSource,bucketName"),
      description =
        """description:    Identifies a change to an S3 object ACL that grants access
          |                to AllUsers (anyone on the internet) or AuthenticatedUsers
          |                (any user with an AWS account).
          |
          |note: This is purely for example purposes in testing, and is not meant to be used as-is""".stripMargin),
    rec => {
      val rp = detail(rec, "requestParameters")
      detail(rec, "sourceIPAddress") === "1.2.3.4" &&
        detail(rec, "eventName") === "PutObjectAcl" &&
        Helpers.rawJsonHasSubstring(rp, PublicAcls)
    })
  }

  /** cloudtrail_critical_api_calls.py:57-93: destructive/log-stopping API
    * calls, GuardDuty disable, public-access-block weakening, and AWS
    * Organizations changes. */
  val criticalApiCalls: Rule = {
    val criticalEvents = Seq(
      "DeleteFlowLogs", "DeleteSubnet", "DeleteVpc", "DeleteDBCluster",
      "DeleteCluster", "DeleteTrail", "PutEventSelectors", "UpdateTrail",
      "StopLogging", "DeleteDeliveryChannel", "StopConfigurationRecorder",
      "DeleteRule", "DisableRule", "DeleteDetector",
      "DeleteAccountPublicAccessBlock", "DisableEbsEncryptionByDefault")
    val orgEvents = Seq(
      "AttachPolicy", "CreateOrganizationUnit", "CreatePolicy",
      "DeletePolicy", "DeleteOrganizationUnit", "DetachPolicy",
      "DisableAWSServiceAccess", "DisablePolicyType", "EnableAllFeatures",
      "EnableAWSServiceAccess", "EnablePolicyType", "LeaveOrganization",
      "MoveAccount", "RemoveAccountFromOrganization", "UpdatePolicy")
    val blockActions = Seq(
      "RestrictPublicBuckets", "BlockPublicPolicy", "BlockPublicAcls",
      "IgnorePublicAcls")
    Rule(
      "cloudtrail_critical_api_calls",
      RuleOpts(
        logs = Seq("cloudtrail:events"),
        description = "API calls that stop/delete security logs or critical resources"),
      rec => {
        val name = rec.getField("eventName")
        val rp = rec.getField("requestParameters")
        // :74-77 UpdateDetector with enable explicitly false (absent
        // defaults True — no alert)
        val guardDutyDisable = name === "UpdateDetector" &&
          coalesce(rp.getField("enable") === "false", lit(false))
        // :79-87 any public-access-block knob explicitly set to False
        val blockConfig = rp.getField("PublicAccessBlockConfiguration")
        val blockWeakened =
          name.isin("PutBucketPublicAccessBlock", "PutAccountPublicAccessBlock") &&
            blockActions.map(a => coalesce(
              get_json_object(blockConfig, s"$$.$a") === "false", lit(false)))
              .reduce(_ || _)
        val orgChange = rec.getField("eventSource") === "organizations.amazonaws.com" &&
          name.isin(orgEvents: _*)
        name.isin(criticalEvents: _*) || guardDutyDisable || blockWeakened || orgChange
      })
  }

  /** cloudtrail_mfa_policy_abuse_attempt.py:40-70: non-MFA sessions
    * deactivating MFA, touching sensitive IAM actions, or erroring on MFA
    * device creation/enable. Optional `errorCode` backfills to '' (falsy),
    * matching the reference classifier's zero-value defaults. */
  val mfaPolicyAbuseAttempt: Rule = {
    val iamActions = Seq(
      "CreateUser", "CreateAccessKey", "DetachUserPolicy",
      "DetachGroupPolicy", "RemoveUserFromGroup", "DeleteUserPolicy",
      "PutGroupPolicy", "PutUserPolicy")
    Rule(
      "cloudtrail_mfa_policy_abuse_attempt",
      RuleOpts(
        logs = Seq("cloudtrail:events"),
        description = "Non-MFA calls that may abuse a flawed MFA enforcement policy"),
      rec => {
        val name = rec.getField("eventName")
        val mfa = coalesce(get_json_object(
          rec.getField("userIdentity").getField("sessionContext"),
          "$.attributes.mfaAuthenticated"), lit("false"))
        val err = rec.getField("errorCode")
        val hasError = err.isNotNull && err =!= ""
        mfa =!= "true" && (
          name === "DeactivateMFADevice" ||
            name.isin(iamActions: _*) ||
            (hasError && name.isin("CreateVirtualMFADevice", "EnableMFADevice")))
      })
  }

  /** `Policy.is_internet_accessible()` as the conformance fixtures pin it
    * (policyuniverse via cloudtrail_public_resources.py:24-77): any
    * statement with Effect Allow, a `*` principal (bare, `{"AWS":"*"}`, or
    * in the AWS list), and NO whittling Condition. `Statement` may be a
    * single object or a list. */
  private def internetAccessible(policyText: Column): Column = {
    val stmts = coalesce(
      from_json(get_json_object(policyText, "$.Statement"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      array(get_json_object(policyText, "$.Statement")))
    coalesce(exists(stmts, s => {
      val aws = get_json_object(s, "$.Principal.AWS[*]")
      get_json_object(s, "$.Effect") === "Allow" &&
        get_json_object(s, "$.Condition").isNull &&
        (get_json_object(s, "$.Principal") === "*" ||
          get_json_object(s, "$.Principal.AWS") === "*" ||
          aws === "*" || coalesce(aws.contains("\"*\""), lit(false)))
    }), lit(false))
  }

  /** cloudtrail_public_resources.py:17-77: resource policies made
    * internet-accessible across S3 / ES / Glacier / SQS / SNS / ECR / KMS /
    * SecretsManager — the per-service `policy_string` extraction chain,
    * then the policyuniverse check. */
  val publicResources: Rule = Rule(
    "cloudtrail_public_resources",
    RuleOpts(
      logs = Seq("cloudtrail:events"),
      reqSubkeys = Map.empty,
      description = "A resource policy was made internet-accessible"),
    rec => {
      val name = rec.getField("eventName")
      val rp = rec.getField("requestParameters")
      // :18-25 — S3 bucketPolicy is a real JSON object, not a string
      val s3 = name === "PutBucketPolicy" &&
        internetAccessible(rp.getField("bucketPolicy"))
      // :27-66 — the string-policy extraction chain
      val policyString = when(
        name.isin("CreateElasticsearchDomain", "UpdateElasticsearchDomainConfig"),
        rp.getField("accessPolicies"))
        .when(name === "SetVaultAccessPolicy",
          get_json_object(rp.getField("policy"), "$.policy"))
        .when(name.isin("SetQueueAttributes", "CreateTopic"),
          get_json_object(rp.getField("attributes"), "$.Policy"))
        .when(name === "SetTopicAttributes" &&
          coalesce(rp.getField("attributeName") === "Policy", lit(false)),
          rp.getField("attributeValue"))
        .when(name === "SetRepositoryPolicy", rp.getField("policyText"))
        .when(name.isin("PutKeyPolicy", "CreateKey"), rp.getField("policy"))
        .when(name === "PutResourcePolicy", rp.getField("resourcePolicy"))
      s3 || (policyString.isNotNull && policyString =!= "" &&
        internetAccessible(policyString))
    })

  /** cloudtrail_snapshot_or_ami_made_public.py:17-46: launch/volume
    * permissions or RDS snapshot attributes granted to the `all` group. */
  val snapshotOrAmiMadePublic: Rule = {
    def addsGroupAll(subdoc: Column): Column = {
      val groups = get_json_object(subdoc, "$.add.items[*].group")
      coalesce(groups === "all" || groups.contains("\"all\""), lit(false))
    }
    Rule(
      "cloudtrail_snapshot_or_ami_made_public",
      RuleOpts(
        logs = Seq("cloudtrail:events"),
        description = "An EBS/RDS snapshot or AMI was made public"),
      rec => {
        val name = rec.getField("eventName")
        val rp = rec.getField("requestParameters")
        val attrType = coalesce(rp.getField("attributeType"), lit(""))
        (name === "ModifyImageAttribute" && attrType === "launchPermission" &&
          addsGroupAll(rp.getField("launchPermission"))) ||
          (name === "ModifySnapshotAttribute" && attrType === "CREATE_VOLUME_PERMISSION" &&
            addsGroupAll(rp.getField("createVolumePermission"))) ||
          (name === "ModifyDBClusterSnapshotAttribute" &&
            coalesce(array_contains(from_json(rp.getField("valuesToAdd"),
              org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
              "all"), lit(false)))
      })
  }

  /** duo_administrator/duo_bypass_code_create_*.py: all three gate on
    * `action == 'bypass_create'` then probe `safe_json_loads(description)`
    * — the description field is JSON-in-a-string, so the probes are
    * JSONPath reads (absent key, JSON null, and unparseable text all read
    * back as SQL NULL, matching `safe_json_loads(...).get(...) is None`). */
  val duoBypassNonAutoGenerated: Rule = Rule(
    "duo_bypass_code_create_non_auto_generated",
    RuleOpts(
      logs = Seq("duo:administrator"),
      description = "A Duo bypass code was artisanally crafted, not auto-generated"),
    rec => rec.getField("action") === "bypass_create" &&
      // ...non_auto_generated.py:14: auto_generated is False (exactly)
      coalesce(get_json_object(rec.getField("description"),
        "$.auto_generated") === "false", lit(false)))

  val duoBypassNonExpiring: Rule = Rule(
    "duo_bypass_code_create_non_expiring",
    RuleOpts(
      logs = Seq("duo:administrator"),
      description = "A non-expiring Duo bypass code was created"),
    rec => rec.getField("action") === "bypass_create" &&
      // ...non_expiring.py:14: valid_secs is None
      get_json_object(rec.getField("description"), "$.valid_secs").isNull)

  val duoBypassUnlimitedUse: Rule = Rule(
    "duo_bypass_code_create_unlimited_use",
    RuleOpts(
      logs = Seq("duo:administrator"),
      description = "An unlimited-use Duo bypass code was created"),
    rec => rec.getField("action") === "bypass_create" &&
      // ...unlimited_use.py:14: remaining_uses is None
      get_json_object(rec.getField("description"), "$.remaining_uses").isNull)

  /** duo_authentication/duo_fraud.py:14: result marked FRAUD. */
  val duoFraud: Rule = Rule(
    "duo_fraud",
    RuleOpts(
      logs = Seq("duo:authentication"),
      description = "Duo authentication marked as fraud"),
    rec => rec.getField("result") === "FRAUD")

  /** fleet/fleet_bad_action.py:18-20: `columns.get('bad_action', '1') ==
    * '1'`. Deviation, documented: the reference ships this rule @disable'd;
    * the port enables it so the fixture's trigger expectation is asserted
    * (same treatment as onelogin_events_threat_intel_example). */
  val fleetBadAction: Rule = Rule(
    "fleet_bad_action",
    RuleOpts(
      logs = Seq("fleet:results"),
      description = "A Fleet osquery result flagged a bad action"),
    rec => coalesce(rec.getField("columns").getField("bad_action"), lit("1")) === "1")

  /** osquery/ssh_login_activity.py: matcher-gated (OsqueryMatcher.added +
    * user_login), body returns True. */
  val sshLoginActivity: Rule = Rule(
    "ssh_login_activity",
    RuleOpts(
      logs = Seq("osquery:differential"),
      matchers = Seq("osquery_added", "osquery_user_login"),
      description = "SSH login activity from the osquery last table"),
    _ => lit(true))

  /** trendmicro/trendmicro_malware_event.py: log-type gated, body True —
    * every exploded trendmicro:malwareevent element alerts. */
  val trendmicroMalwareEvent: Rule = Rule(
    "trendmicro_malware_event",
    RuleOpts(
      logs = Seq("trendmicro:malwareevent"),
      description = "Trend Micro identified malware on an agent"),
    _ => lit(true))

  /** onelogin/onelogin_events_assumed_role.py:14: event_type_id == 3. */
  val oneloginAssumedRole: Rule = Rule(
    "onelogin_events_assumed_role",
    RuleOpts(
      logs = Seq("onelogin:events"),
      description = "A OneLogin user assumed the role of someone else"),
    rec => rec.getField("event_type_id") === 3)

  /** packetbeat/packetbeat_blacklisted_domain.py:17: the queried name sits
    * in the DNS blacklist; `dns` is a loose sub-document, so the nested
    * question.name read is a JSONPath over the question's raw JSON text. */
  val packetbeatBlacklistedDomain: Rule = Rule(
    "packetbeat_blacklisted_domain",
    RuleOpts(
      logs = Seq("packetbeat:dns"),
      description = "DNS lookup of a blacklisted (CnC) domain"),
    rec => coalesce(get_json_object(rec.getField("dns").getField("question"),
      "$.name").isin("evil.com."), lit(false)))

  /** packetbeat/packetbeat_blacklisted_ip.py:18: destination IP in the
    * blacklist, guarded by the source parsing as an IPv4 address (the
    * reference constructs ipaddress.IPv4Address(source.ip), which raises —
    * rule false — on a malformed source). */
  val packetbeatBlacklistedIp: Rule = Rule(
    "packetbeat_blacklisted_ip",
    RuleOpts(
      logs = Seq("packetbeat:flow"),
      description = "Network connection to a blacklisted IP"),
    rec => {
      val src = rec.getField("source")
      val dst = rec.getField("dest")
      coalesce(Helpers.validIp(src.getField("ip")), lit(false)) &&
        coalesce(dst.getField("ip").isin("222.173.190.239"), lit(false))
    })

  /** packetbeat/packetbeat_dns_lookup.py:14: question name under the
    * blacklisted apex (`endswith('.evil.com.')`). */
  val packetbeatDnsLookup: Rule = Rule(
    "packetbeat_dns_lookup",
    RuleOpts(
      logs = Seq("packetbeat:dns"),
      description = "DNS lookup of a subdomain of a blacklisted domain"),
    rec => coalesce(get_json_object(rec.getField("dns").getField("question"),
      "$.name").endsWith(".evil.com."), lit(false)))

  val all: Seq[Rule] = Seq(
    putObjectAclPublic, rootAccountUsage, putBucketAcl,
    networkAclIngressAnywhere, securityGroupIngressAnywhere,
    unencryptedAmiVolume, publicAmi,
    guardDutyAll, binaryalertYaraMatch,
    configCompliance, configAutoRemediation,
    duoAnonymousIpFailure, rightToLeftCharacter,
    duoLookupTablesExample, oneloginThreatIntelExample,
    githubDisableDismissStale, githubDisableProtectBranch,
    githubDisableRequiredReviews, githubDisableRequiredStatusChecks,
    githubDisableTwoFactorOrg, githubDisableTwoFactorUser,
    githubOauthApplicationCreate, githubSiteAdminAction,
    githubSiteAdminUserPromotion,
    duoBypassNonAutoGenerated, duoBypassNonExpiring, duoBypassUnlimitedUse,
    duoFraud, fleetBadAction, sshLoginActivity, trendmicroMalwareEvent,
    oneloginAssumedRole, packetbeatBlacklistedDomain,
    packetbeatBlacklistedIp, packetbeatDnsLookup,
    criticalApiCalls, mfaPolicyAbuseAttempt, publicResources,
    snapshotOrAmiMadePublic, putObjectAclPublisherExample)
}
