package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.core.LogSchema
import graft.core.{NormCondition, NormalizedField}
import graft.core.FieldType._
import graft.classify.Classifier
import graft.classify.{ArtifactExtractor, Normalizer, Sanitizer}
import graft.rules._
import graft.alerts.{AlertMerger, MergeInputAlert, Publishers}
import graft.sources.Sources
import graft.history.{HistoricalSink, RulePromotion, ScheduledQueries}
import graft.pipeline.{Dedup, Eval, Multimodal, Preference, Similarity, Sketches, TextAnalysis}

/** Alert pipeline rows (A1-A6): merge groups, publishers (16 payload
  * dialects), dispatch fan-out, attempt ledger. */
private[graft] trait AlertsQueries extends RegistryBase {


  register(
    "a2_merge_groups",
    """SELECT CAST(event_id // 30 AS VARCHAR) AS merge_keys,
      |       count(*) AS alert_count,
      |       min(TIMESTAMP '2024-01-01 00:00:00'
      |           + to_minutes(CAST(event_id % 4 * 10 AS BIGINT))) AS alert_time_first,
      |       max(TIMESTAMP '2024-01-01 00:00:00'
      |           + to_minutes(CAST(event_id % 4 * 10 AS BIGINT))) AS alert_time_last,
      |       concat('{"mk":"', CAST(event_id // 30 AS VARCHAR), '"}') AS merged_by_json
      |FROM events
      |GROUP BY event_id // 30 ORDER BY CAST(event_id // 30 AS BIGINT)""".stripMargin) {
    (s, dir) =>
      import org.apache.spark.sql.Encoders
      implicit val enc = Encoders.product[MergeInputAlert]
      val alerts = eventsWide(s, dir).select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("merge_demo").as("rule_name"),
        // 1704067200 = 2024-01-01T00:00:00Z; +10min per (event_id % 4)
        (lit(1704067200L) + col("event_id") % 4 * 600L).cast(TimestampType).as("created"),
        to_json(struct(
          col("event_id"),
          floor(col("event_id") / 30).cast("string").as("mk"))).as("record_json"),
        lit("mk").as("merge_by_keys"),
        lit(35).as("merge_window_mins"),
        array(lit("aws-firehose:alerts")).as("outputs"),
        lit(false).as("staged"),
        // precomputed merge-key values (the RulesEngine path) — grouping
        // then needs no JSON parse
        floor(col("event_id") / 30).cast("string").as("merge_key_vals"))
        .as[MergeInputAlert]
      AlertMerger.mergeBatch(alerts)
        .select(col("merge_keys"), col("alert_count"), col("alert_time_first"),
          col("alert_time_last"), col("merged_by_json"))
        .orderBy(col("merge_keys").cast("long"))
  }


  // A3: merged-record common/diff surface (alert.py:289-380). Records carry a
  // group-constant field ('svc' -> always in OtherCommonKeys) and a varying
  // field ('etype' -> common iff uniform in the group, else per-alert diffs
  // keyed by the alert's created Instant). The corpus is shaped so both JSON
  // fields are exactly constructible in SQL: flat records, distinct whole-
  // second created per group member, deterministic field order (svc, etype).
  register(
    "a3_merge_common_diff",
    """WITH base AS (
      |  SELECT event_id // 30 AS grp,
      |         'svc-' || CAST((event_id // 30) % 3 AS VARCHAR) AS svc,
      |         event_type AS etype,
      |         TIMESTAMP '2024-01-01 00:00:00'
      |           + to_seconds(CAST(event_id % 30 AS BIGINT)) AS created
      |  FROM events),
      |g AS (
      |  SELECT grp, any_value(svc) AS svc, count(*) AS n,
      |         min(etype) AS min_e, max(etype) AS max_e
      |  FROM base GROUP BY grp),
      |d AS (
      |  SELECT b.grp,
      |         string_agg(
      |           '"' || strftime(b.created, '%Y-%m-%dT%H:%M:%SZ') || '":'
      |             || CASE WHEN g.min_e = g.max_e THEN '{}'
      |                     ELSE '{"etype":"' || b.etype || '"}' END,
      |           ',' ORDER BY b.created) AS body
      |  FROM base b JOIN g USING (grp) GROUP BY b.grp)
      |SELECT CAST(g.grp AS VARCHAR) AS merge_keys,
      |       g.n AS alert_count,
      |       CASE WHEN g.min_e = g.max_e
      |            THEN '{"svc":"' || g.svc || '","etype":"' || g.min_e || '"}'
      |            ELSE '{"svc":"' || g.svc || '"}' END AS other_common_keys_json,
      |       '{' || d.body || '}' AS value_diffs_json
      |FROM g JOIN d USING (grp)""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[MergeInputAlert]
    val grp = floor(col("event_id") / 30).cast("string")
    val alerts = eventsWide(s, dir).select(
      md5(col("event_id").cast("string")).as("alert_id"),
      lit("common_diff_demo").as("rule_name"),
      (lit(1704067200L) + col("event_id") % 30).cast(TimestampType).as("created"),
      to_json(struct(
        grp.as("mk"),
        concat(lit("svc-"), (floor(col("event_id") / 30) % 3).cast("string")).as("svc"),
        col("event_type").as("etype"))).as("record_json"),
      lit("mk").as("merge_by_keys"),
      lit(35).as("merge_window_mins"),
      array(lit("aws-firehose:alerts")).as("outputs"),
      lit(false).as("staged"),
      grp.as("merge_key_vals"))
      .as[MergeInputAlert]
    AlertMerger.mergeBatch(alerts)
      .select(col("merge_keys"), col("alert_count"),
        col("other_common_keys_json"), col("value_diffs_json"))
  }


  // A4/A6: dispatch round-trip (alert_processor/main.py:76-151). Alerts fan
  // out to per-service FileDispatchers once; the redelivery proof then runs
  // the production ledger gate (Outputs.freshAgainst) against the landed
  // sink read back ONCE — the same frame also yields the final counts, so
  // the second fan-out's duplicate explode/collect/empty-append jobs fold
  // away while the idempotence assertion (ledger filters every alert)
  // stays. Counts are exactly one per (alert_id, output) because the sink
  // dir doubles as the outputs_sent ledger (main.py:99-115); a true double
  // fanOut through the dispatcher is pinned at unit scale in PipelineSpec.
  register(
    "a6_dispatch_roundtrip",
    """SELECT * FROM (
      |  SELECT 'aws-firehose:alerts' AS output, 'any_purchase' AS rule_name,
      |         count(*) AS n
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT 'aws-firehose:alerts', 'big_error', count(*) FROM events
      |  WHERE event_type = 'error' AND value > 100
      |  UNION ALL
      |  SELECT 'slack:alerts', 'big_error', count(*) FROM events
      |  WHERE event_type = 'error' AND value > 100)
      |ORDER BY output, rule_name""".stripMargin) { (s, dir) =>
    import graft.alerts.Outputs
    val root = s"/tmp/graft_a6_${dir.replaceAll("\\W", "_")}"
    val rootFile = new java.io.File(root)
    if (rootFile.exists()) org.apache.commons.io.FileUtils.deleteDirectory(rootFile)
    val rules = Seq(
      Rule("any_purchase", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("event_type") === "purchase"),
      Rule("big_error",
        RuleOpts(logs = Seq("demo:json_events"), outputs = Seq("slack:alerts")),
        rec => rec.getField("event_type") === "error" && rec.getField("value") > 100))
    // persisted across the two fan-outs: the classify->rules pipeline
    // evaluates once, both deliveries read the cache
    val alerts = new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events").persist()
    val dispatchers = Map(
      "aws-firehose" -> Outputs.FileDispatcher(s"$root/aws-firehose"),
      "slack" -> Outputs.FileDispatcher(s"$root/slack"))
    try {
      Outputs.fanOut(alerts, dispatchers)
      val sinks = Seq(
        "aws-firehose:alerts" -> s"$root/aws-firehose/alerts",
        "slack:alerts" -> s"$root/slack/alerts")
        .map { case (out, path) => out -> s.read.parquet(path).persist() }
      try {
        // redelivery: the production gate must filter EVERY alert against
        // the landed ledger — one union job instead of a second fan-out
        val redelivered = sinks.map { case (out, sent) =>
          Outputs.freshAgainst(
            alerts.where(array_contains(col("outputs"), out)),
            Some(sent.select("alert_id").distinct()))
            .select("alert_id")
        }.reduce(_ unionAll _)
        require(redelivered.isEmpty,
          "outputs_sent ledger failed to gate redelivery")
        sinks.map { case (out, sent) =>
          sent.select(lit(out).as("output"), col("rule_name"), col("alert_id"))
        }
          .reduce(_ unionAll _)
          .groupBy("output", "rule_name").agg(count(lit(1)).as("n"))
          .orderBy("output", "rule_name")
          .localCheckpoint(eager = true) // 3 rows; lets the sink caches release
      } finally sinks.foreach(_._2.unpersist(false))
    } finally alerts.unpersist()
  }


  // A4/A6: the attempt-ledger retry loop, oracle-proven end-to-end — a
  // transiently failing dispatcher records a failed attempt WITHOUT
  // aborting the fan-out; the next fan-out retries exactly the unsent
  // pairs (attempts=2) and never re-dispatches sent ones (attempts stays
  // 1). The ledger state IS the reference alert table's Attempts /
  // OutputsSent bookkeeping (shared/alert_table.py:84-190).
  register(
    "a7_attempt_ledger",
    """SELECT * FROM (
      |  SELECT 'aws-firehose:alerts' AS output, CAST(1 AS BIGINT) AS attempts,
      |         true AS sent, count(*) AS n_pairs
      |  FROM events WHERE event_id < 20000
      |    AND (event_type = 'purchase' OR (event_type = 'error' AND value > 100))
      |  UNION ALL
      |  SELECT 'slack:alerts', CAST(2 AS BIGINT), true, count(*)
      |  FROM events WHERE event_id < 20000
      |    AND event_type = 'error' AND value > 100)
      |ORDER BY output""".stripMargin) { (s, dir) =>
    import graft.alerts.Outputs
    val root = s"/tmp/graft_a7_${dir.replaceAll("\\W", "_")}"
    val rootFile = new java.io.File(root)
    if (rootFile.exists()) org.apache.commons.io.FileUtils.deleteDirectory(rootFile)
    val rules = Seq(
      Rule("any_purchase", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("event_type") === "purchase"),
      Rule("big_error",
        RuleOpts(logs = Seq("demo:json_events"), outputs = Seq("slack:alerts")),
        rec => rec.getField("event_type") === "error" && rec.getField("value") > 100))
    // the event_id cap is pushed to the parquet scan, BEFORE the JSON
    // round-trip — filtering the classified frame instead would serialize
    // and re-parse the whole events table to keep 2% of it
    val raw = t(s, dir, "events").where(col("event_id") < 20000).select(
      to_json(struct(col("event_id"), col("event_type"), col("value"), col("props")))
        .as("line"))
    val typed = new Classifier(Seq(DemoSchemas.jsonEvents))
      .classify(raw, "line").forType("demo:json_events")
    val alerts = new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(typed, "demo:json_events")
      .persist()
    val ledger = Outputs.AttemptLedger(s"$root/ledger")
    // slack is transiently down for the first fan-out only
    var slackDown = true
    val dispatchers = Map(
      "aws-firehose" -> Outputs.FileDispatcher(s"$root/aws-firehose"),
      "slack" -> Outputs.WebhookDispatcher((_, _) =>
        if (slackDown) sys.error("transient 500")))
    try {
      val r1 = Outputs.fanOutTracked(alerts, dispatchers, ledger,
        clock = Some(fixedClock))
      require(r1("slack:alerts") == false && r1("aws-firehose:alerts") == true,
        s"expected slack down / firehose up on attempt 1, got $r1")
      slackDown = false
      val r2 = Outputs.fanOutTracked(alerts, dispatchers, ledger,
        clock = Some(fixedClock))
      require(r2("slack:alerts") == true, s"expected slack retry to succeed, got $r2")
      ledger.state(s).groupBy("output", "attempts", "sent")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("output")
        .localCheckpoint(eager = true)
    } finally alerts.unpersist()
  }


  // A5: publisher chain — strip internal fields, publication JSON produced.
  register(
    "a5_publishers",
    """SELECT event_id, 'high_value' AS rule_name FROM events
      |WHERE value > 150 ORDER BY event_id""".stripMargin) { (s, dir) =>
    val rules = Seq(Rule("high_value", RuleOpts(logs = Seq("demo:json_events")),
      rec => rec.getField("value") > 150))
    val alerts = new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
      .withColumn("staged", lit(false))
    Publishers.publish(alerts, Seq("remove_internal_fields"))
      .select(col("record.event_id").as("event_id"), col("rule_name"))
      .orderBy("event_id")
  }


  // A5c: real publication shapes — the slack default message (header,
  // mrkdwn'd record attachment with sorted bolded keys / tabbed nesting /
  // html escape, rule-description pretext; slack.py:68-149,297-412) and the
  // pagerduty-v2 event (descriptor-namespaced dedup_key, critical payload;
  // pagerduty.py:56-144) — every published field reconstructed
  // byte-for-byte in SQL.
  register(
    "a5c_publishers_shapes",
    """SELECT event_id,
      |  '*StreamAlert Rule Triggered: high_value*' AS slack_text,
      |  'Record:' AS slack_title,
      |  '*Rule Description:*' || chr(10) || 'Large value event' || chr(10) AS slack_pretext,
      |  '*event_id:* ' || event_id || chr(10)
      |    || '*event_type:* ' || event_type || chr(10)
      |    || '*note:* a&lt;b&amp;c&quot;d&#x27;e' || chr(10)
      |    || '*tags:*' || chr(10)
      |    || chr(9) || '*[1]* x' || chr(10) || chr(9) || '*[2]* y' || chr(10)
      |    || '*who:*' || chr(10) || chr(9) || '*uid:* ' || user_id AS slack_mrkdwn,
      |  'demo:' || md5(CAST(event_id AS VARCHAR)) AS pd_dedup_key,
      |  'StreamAlert Rule Triggered - high_value' AS pd_summary,
      |  'demo:json_events' AS pd_source,
      |  'critical' AS pd_severity,
      |  event_id AS pd_event_id,
      |  'StreamAlert high_value' AS jira_summary,
      |  'SECOPS' AS jira_project,
      |  'Task' AS jira_issuetype,
      |  '{code:JSON}' || to_json(struct_pack(record := struct_pack(
      |     event_id := event_id, event_type := event_type,
      |     note := 'a<b&c"d''e', tags := ['x','y'],
      |     who := struct_pack(uid := user_id)))) || '{code}' AS jira_description
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        lit("Large value event").as("rule_description"),
        lit("demo:json_events").as("log_type"),
        struct(col("event_id"), col("event_type"),
          lit("a<b&c\"d'e").as("note"),
          array(lit("x"), lit("y")).as("tags"),
          struct(col("user_id").as("uid")).as("who")).as("record"))
    Publishers.register("pagerduty_v2_demo")(
      Publishers.pagerDutyV2Event(routingKey = "demo-routing-key", descriptor = "demo"))
    val slack = Publishers.publish(alerts, Seq("slack_message"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.text").as("slack_text"),
        get_json_object(col("publication"), "$.attachments[0].title").as("slack_title"),
        get_json_object(col("publication"), "$.attachments[0].pretext").as("slack_pretext"),
        get_json_object(col("publication"), "$.attachments[0].text").as("slack_mrkdwn"))
    val pd = Publishers.publish(alerts, Seq("pagerduty_v2_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.dedup_key").as("pd_dedup_key"),
        get_json_object(col("publication"), "$.payload.summary").as("pd_summary"),
        get_json_object(col("publication"), "$.payload.source").as("pd_source"),
        get_json_object(col("publication"), "$.payload.severity").as("pd_severity"),
        get_json_object(col("publication"), "$.payload.custom_details.record.event_id")
          .cast("long").as("pd_event_id"))
    Publishers.register("jira_demo")(
      Publishers.jiraIssueFields(projectKey = "SECOPS", issueType = "Task"))
    // record_only first: the jira body renders the publication dict, here
    // pinned to the record so the oracle byte-matches the {code:JSON} block
    val jira = Publishers.publish(alerts, Seq("record_only", "jira_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.summary").as("jira_summary"),
        get_json_object(col("publication"), "$.project.key").as("jira_project"),
        get_json_object(col("publication"), "$.issuetype.name").as("jira_issuetype"),
        get_json_object(col("publication"), "$.description").as("jira_description"))
    slack.join(pd, "alert_id").join(jira, "alert_id")
      .drop("alert_id").orderBy("event_id")
  }


  // A5d: github + teams publication shapes (the two most commonly deployed
  // dialects after a5c's slack/pagerduty/jira). The github issue body IS
  // json.dumps(record, indent=2, sort_keys=True) in a fenced block
  // (github.py:110-114) — reconstructed byte-for-byte in SQL including
  // two-space nesting, sorted keys, and JSON string escaping; the teams
  // card (teams.py:95-154) checks title/text/themeColor plus both facts
  // sections.
  register(
    "a5d_publishers_github_teams",
    """SELECT event_id,
      |  'StreamAlert: high_value' AS gh_title,
      |  '### Description' || chr(10) || 'Large value event' || chr(10) || chr(10)
      |    || '### Event data' || chr(10) || chr(10) || '```' || chr(10)
      |    || '{' || chr(10)
      |    || '  "event_id": ' || event_id || ',' || chr(10)
      |    || '  "event_type": "' || event_type || '",' || chr(10)
      |    || '  "note": "a<b&c\"d''e",' || chr(10)
      |    || '  "tags": [' || chr(10)
      |    || '    "x",' || chr(10)
      |    || '    "y"' || chr(10)
      |    || '  ],' || chr(10)
      |    || '  "who": {' || chr(10)
      |    || '    "uid": ' || user_id || chr(10)
      |    || '  }' || chr(10)
      |    || '}' || chr(10) || '```' AS gh_body,
      |  '["security","streamalert"]' AS gh_labels,
      |  'StreamAlert Rule Triggered: high_value' AS tm_title,
      |  'Large value event' AS tm_text,
      |  'E81123' AS tm_color,
      |  'Alert Info' AS tm_alert_title,
      |  'high_value' AS tm_fact_rule,
      |  md5(CAST(event_id AS VARCHAR)) AS tm_fact_alert_id,
      |  'StreamAlert Alert Record' AS tm_record_title,
      |  'a<b&c"d''e' AS tm_fact_note,
      |  CAST(event_id AS VARCHAR) AS tm_fact_event_id
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        lit("Large value event").as("rule_description"),
        lit("demo:json_events").as("log_type"),
        struct(col("event_id"), col("event_type"),
          lit("a<b&c\"d'e").as("note"),
          array(lit("x"), lit("y")).as("tags"),
          struct(col("user_id").as("uid")).as("who")).as("record"))
    Publishers.register("github_demo")(
      Publishers.githubIssue(labels = Seq("security", "streamalert")))
    val gh = Publishers.publish(alerts, Seq("github_demo"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.title").as("gh_title"),
        get_json_object(col("publication"), "$.body").as("gh_body"),
        get_json_object(col("publication"), "$.labels").as("gh_labels"))
    Publishers.register("teams_demo")(Publishers.teamsCard())
    val tm = Publishers.publish(alerts, Seq("teams_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.title").as("tm_title"),
        get_json_object(col("publication"), "$.text").as("tm_text"),
        get_json_object(col("publication"), "$.themeColor").as("tm_color"),
        get_json_object(col("publication"), "$.sections[0].activityTitle").as("tm_alert_title"),
        get_json_object(col("publication"), "$.sections[0].facts[0].value").as("tm_fact_rule"),
        get_json_object(col("publication"), "$.sections[0].facts[1].value").as("tm_fact_alert_id"),
        get_json_object(col("publication"), "$.sections[1].activityTitle").as("tm_record_title"),
        get_json_object(col("publication"), "$.sections[1].facts[2].value").as("tm_fact_note"),
        get_json_object(col("publication"), "$.sections[1].facts[0].value").as("tm_fact_event_id"))
    gh.join(tm, "alert_id").drop("alert_id").orderBy("event_id")
  }


  // A5e: victorops + komand + demisto publication shapes. Demisto is the
  // interesting one: the publication flattens into sorted string labels
  // with RUNTIME list indices (record.tags[0], record.tags[1]) — the
  // byte-exact labels JSON is reconstructed in SQL below.
  register(
    "a5e_publishers_victorops_demisto",
    """SELECT event_id,
      |  'CRITICAL' AS vo_message_type,
      |  'streamalert/alert' AS vo_entity_id,
      |  'high_value' AS vo_entity_display_name,
      |  event_id AS vo_event_id,
      |  'high_value' AS ko_data_rule,
      |  'high_value' AS dm_name,
      |  'StreamAlert' AS dm_owner,
      |  'Unclassified' AS dm_type,
      |  '0.0' AS dm_severity,
      |  'Unknown' AS dm_playbook,
      |  'true' AS dm_create,
      |  'Large value event' AS dm_details,
      |  '[{"type":"record.event_id","value":"' || event_id
      |    || '"},{"type":"record.event_type","value":"' || event_type
      |    || '"},{"type":"record.note","value":"a<b&c\"d''e"}'
      |    || ',{"type":"record.tags[0]","value":"x"}'
      |    || ',{"type":"record.tags[1]","value":"y"}'
      |    || ',{"type":"record.who.uid","value":"' || user_id || '"}]' AS dm_labels
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        lit("Large value event").as("rule_description"),
        struct(col("event_id"), col("event_type"),
          lit("a<b&c\"d'e").as("note"),
          array(lit("x"), lit("y")).as("tags"),
          struct(col("user_id").as("uid")).as("who")).as("record"))
    val vo = Publishers.publish(alerts, Seq("victorops_message"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.message_type").as("vo_message_type"),
        get_json_object(col("publication"), "$.entity_id").as("vo_entity_id"),
        get_json_object(col("publication"), "$.entity_display_name").as("vo_entity_display_name"),
        get_json_object(col("publication"), "$.record.event_id")
          .cast("long").as("vo_event_id"))
    val ko = Publishers.publish(alerts, Seq("komand_envelope"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.data.rule_name").as("ko_data_rule"))
    Publishers.register("demisto_demo")(Publishers.demistoIncident())
    val dm = Publishers.publish(alerts, Seq("record_only", "demisto_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.name").as("dm_name"),
        get_json_object(col("publication"), "$.owner").as("dm_owner"),
        get_json_object(col("publication"), "$.type").as("dm_type"),
        get_json_object(col("publication"), "$.severity").as("dm_severity"),
        get_json_object(col("publication"), "$.playbook").as("dm_playbook"),
        get_json_object(col("publication"), "$.createInvestigation").as("dm_create"),
        get_json_object(col("publication"), "$.details").as("dm_details"),
        get_json_object(col("publication"), "$.labels").as("dm_labels"))
    vo.join(ko, "alert_id").join(dm, "alert_id")
      .drop("alert_id").orderBy("event_id")
  }


  // A5f: aws-sns + aws-ses shapes — both build on the indent-2 sorted-keys
  // dump (aws.py:532 / :727). SNS additionally exercises the 99-char
  // middle-elision of an over-long subject (helpers.py:19-33) with a
  // 160-char rule name.
  register(
    "a5f_publishers_sns_ses",
    """WITH a AS (
      |  SELECT event_id, event_type, user_id,
      |         md5(CAST(event_id AS VARCHAR)) AS alert_id,
      |         'high_value_' || repeat('x', 100) AS long_rule,
      |         '{' || chr(10)
      |           || '  "record": {' || chr(10)
      |           || '    "event_id": ' || event_id || ',' || chr(10)
      |           || '    "event_type": "' || event_type || '",' || chr(10)
      |           || '    "note": "a<b&c\"d''e",' || chr(10)
      |           || '    "tags": [' || chr(10)
      |           || '      "x",' || chr(10)
      |           || '      "y"' || chr(10)
      |           || '    ],' || chr(10)
      |           || '    "who": {' || chr(10)
      |           || '      "uid": ' || user_id || chr(10)
      |           || '    }' || chr(10)
      |           || '  }' || chr(10) || '}' AS pub_dump,
      |         '{' || chr(10)
      |           || '  "event_id": ' || event_id || ',' || chr(10)
      |           || '  "event_type": "' || event_type || '",' || chr(10)
      |           || '  "note": "a<b&c\"d''e",' || chr(10)
      |           || '  "tags": [' || chr(10)
      |           || '    "x",' || chr(10)
      |           || '    "y"' || chr(10)
      |           || '  ],' || chr(10)
      |           || '  "who": {' || chr(10)
      |           || '    "uid": ' || user_id || chr(10)
      |           || '  }' || chr(10) || '}' AS rec_dump
      |  FROM events WHERE event_id < 200),
      |s AS (SELECT *, long_rule || ' triggered alert ' || alert_id AS subj FROM a)
      |SELECT event_id,
      |  substr(subj, 1, 47) || ' ... ' || right(subj, 47) AS sns_subject,
      |  pub_dump AS sns_message,
      |  'secops@example.com' AS ses_to,
      |  'alerts@example.com' AS ses_from,
      |  'high_value triggered alert ' || alert_id AS ses_subject,
      |  'Please review the attached record.json' AS ses_body,
      |  'record.json' AS ses_att_name,
      |  rec_dump AS ses_att_content
      |FROM s ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    def alerts(rule: Column) = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        rule.as("rule_name"),
        struct(col("event_id"), col("event_type"),
          lit("a<b&c\"d'e").as("note"),
          array(lit("x"), lit("y")).as("tags"),
          struct(col("user_id").as("uid")).as("who")).as("record"))
    val longRule = concat(lit("high_value_"),
      array_join(array_repeat(lit("x"), 100), ""))
    val sns = Publishers.publish(alerts(longRule), Seq("record_only", "sns_message"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.subject").as("sns_subject"),
        get_json_object(col("publication"), "$.message").as("sns_message"))
    Publishers.register("ses_demo")(
      Publishers.sesEmailFields("secops@example.com", "alerts@example.com"))
    val ses = Publishers.publish(alerts(lit("high_value")), Seq("ses_demo"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.to").as("ses_to"),
        get_json_object(col("publication"), "$.from").as("ses_from"),
        get_json_object(col("publication"), "$.subject").as("ses_subject"),
        get_json_object(col("publication"), "$.body").as("ses_body"),
        get_json_object(col("publication"), "$.attachment.filename").as("ses_att_name"),
        get_json_object(col("publication"), "$.attachment.content").as("ses_att_content"))
    ses.join(sns, "alert_id").drop("alert_id").orderBy("event_id")
  }


  // A5g: phantom container + artifact payloads (the last payload-shaped
  // dialect; carbonblack remains out as a device-action API). The
  // container_id is the dispatcher-resolved parameter.
  register(
    "a5g_publishers_phantom",
    """SELECT event_id,
      |  'high_value' AS ph_container_name,
      |  'Large value event' AS ph_container_desc,
      |  42 AS ph_container_id,
      |  'Phantom Artifact' AS ph_artifact_name,
      |  'Alert' AS ph_artifact_label,
      |  event_id AS ph_cef_event_id,
      |  event_type AS ph_data_event_type
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        lit("Large value event").as("rule_description"),
        struct(col("event_id"), col("event_type")).as("record"))
    Publishers.register("phantom_demo")(Publishers.phantomShapes(containerId = 42L))
    Publishers.publish(alerts, Seq("record_only", "phantom_demo"))
      .select(col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.container.name").as("ph_container_name"),
        get_json_object(col("publication"), "$.container.description").as("ph_container_desc"),
        get_json_object(col("publication"), "$.artifact.container_id")
          .cast("int").as("ph_container_id"),
        get_json_object(col("publication"), "$.artifact.name").as("ph_artifact_name"),
        get_json_object(col("publication"), "$.artifact.label").as("ph_artifact_label"),
        get_json_object(col("publication"), "$.artifact.cef.event_id")
          .cast("long").as("ph_cef_event_id"),
        get_json_object(col("publication"), "$.artifact.data.record.event_type")
          .as("ph_data_event_type"))
      .orderBy("event_id")
  }


  // A5h: the remaining pagerduty dialects — Events v1 (with context
  // validation: an invalid context is dropped, valid link/image re-emit
  // only standardized keys) and the REST incident payload (service /
  // escalation-policy references, urgency validation). Completes the
  // pagerduty family alongside a5c's v2 event.
  register(
    "a5h_publishers_pagerduty_family",
    """SELECT event_id,
      |  'svc-key-1' AS pd1_service_key,
      |  'trigger' AS pd1_event_type,
      |  'StreamAlert Rule Triggered - high_value' AS pd1_description,
      |  'Large value event' AS pd1_details_desc,
      |  event_id AS pd1_record_event_id,
      |  'streamalert' AS pd1_client,
      |  '[{"type":"link","href":"https://runbook.example.com","text":"Runbook"},{"type":"image","src":"https://img.example.com/a.png"}]'
      |    AS pd1_contexts,
      |  'StreamAlert Incident - Rule triggered: high_value' AS pdi_title,
      |  'SVC123' AS pdi_service_id,
      |  'service_reference' AS pdi_service_type,
      |  'incident_body' AS pdi_body_type,
      |  'Large value event' AS pdi_body_details,
      |  'EP456' AS pdi_policy_id,
      |  'escalation_policy_reference' AS pdi_policy_type,
      |  'high' AS pdi_urgency
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        lit("Large value event").as("rule_description"),
        struct(col("event_id")).as("record"))
    Publishers.register("pd1_demo")(Publishers.pagerDutyV1Event(
      serviceKey = "svc-key-1",
      contexts = Seq(
        Map("type" -> "link", "href" -> "https://runbook.example.com",
          "text" -> "Runbook", "extra" -> "stripped"), // extra key dropped
        Map("type" -> "bogus", "href" -> "x"),          // invalid: dropped
        Map("type" -> "image", "src" -> "https://img.example.com/a.png"))))
    val pd1 = Publishers.publish(alerts, Seq("pd1_demo"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.service_key").as("pd1_service_key"),
        get_json_object(col("publication"), "$.event_type").as("pd1_event_type"),
        get_json_object(col("publication"), "$.description").as("pd1_description"),
        get_json_object(col("publication"), "$.details.description").as("pd1_details_desc"),
        get_json_object(col("publication"), "$.details.record.event_id")
          .cast("long").as("pd1_record_event_id"),
        get_json_object(col("publication"), "$.client").as("pd1_client"),
        get_json_object(col("publication"), "$.contexts").as("pd1_contexts"))
    Publishers.register("pdi_demo")(Publishers.pagerDutyIncident(
      serviceId = "SVC123", escalationPolicyId = "EP456",
      urgency = Some("high")))
    val pdi = Publishers.publish(alerts, Seq("pdi_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.incident.title").as("pdi_title"),
        get_json_object(col("publication"), "$.incident.service.id").as("pdi_service_id"),
        get_json_object(col("publication"), "$.incident.service.type").as("pdi_service_type"),
        get_json_object(col("publication"), "$.incident.body.type").as("pdi_body_type"),
        get_json_object(col("publication"), "$.incident.body.details").as("pdi_body_details"),
        get_json_object(col("publication"), "$.incident.escalation_policy.id").as("pdi_policy_id"),
        get_json_object(col("publication"), "$.incident.escalation_policy.type").as("pdi_policy_type"),
        get_json_object(col("publication"), "$.incident.urgency").as("pdi_urgency"))
    pd1.join(pdi, "alert_id").drop("alert_id").orderBy("event_id")
  }


  // A5i: the raw AWS output payloads — lambda invocation (with the v1
  // function:qualifier parsing, both branches pinned), sqs message body,
  // and the cloudwatch-log indent-2 dump. Together with sns/ses (a5f) and
  // the firehose/s3 file sinks this covers every payload-shaped AWS output;
  // carbonblack remains out as a device-action API.
  register(
    "a5i_publishers_aws",
    """SELECT event_id,
      |  'alert-fn' AS l1_function,
      |  'prod' AS l1_qualifier,
      |  'Event' AS l1_invocation_type,
      |  '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}'
      |    AS l1_payload,
      |  'bare-fn' AS l2_function,
      |  '__absent' AS l2_qualifier,
      |  '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}'
      |    AS sqs_body,
      |  '{' || chr(10)
      |    || '  "record": {' || chr(10)
      |    || '    "event_id": ' || event_id || ',' || chr(10)
      |    || '    "event_type": "' || event_type || '"' || chr(10)
      |    || '  }' || chr(10) || '}' AS cw_dump
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        struct(col("event_id"), col("event_type")).as("record"))
    // full-ARN config: 8 parts -> function=parts[-2], qualifier=parts[-1]
    Publishers.register("lambda_arn_demo")(Publishers.lambdaInvocation(
      "arn:aws:lambda:us-east-1:123456789012:function:alert-fn:prod"))
    // bare name: 1 part -> function as-is, qualifier key omitted entirely
    Publishers.register("lambda_bare_demo")(Publishers.lambdaInvocation("bare-fn"))
    Publishers.register("sqs_demo")(Publishers.sqsMessage())
    Publishers.register("cw_demo")(Publishers.cloudwatchLogEntry())
    val l1 = Publishers.publish(alerts, Seq("lambda_arn_demo"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.function_name").as("l1_function"),
        get_json_object(col("publication"), "$.qualifier").as("l1_qualifier"),
        get_json_object(col("publication"), "$.invocation_type").as("l1_invocation_type"),
        get_json_object(col("publication"), "$.payload").as("l1_payload"))
    val l2 = Publishers.publish(alerts, Seq("lambda_bare_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.function_name").as("l2_function"),
        coalesce(get_json_object(col("publication"), "$.qualifier"),
          lit("__absent")).as("l2_qualifier"))
    val sqs = Publishers.publish(alerts, Seq("sqs_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.message_body").as("sqs_body"))
    val cw = Publishers.publish(alerts, Seq("record_only", "cw_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.message").as("cw_dump"))
    l1.join(l2, "alert_id").join(sqs, "alert_id").join(cw, "alert_id")
      .drop("alert_id").orderBy("event_id")
  }


  // A5j: the community slack/pagerduty LAYOUT chains (slack_layout.py
  // Summary + AttachRuleInfo + AttachFullRecord; pagerduty_layout.py
  // populate_fields + PrettyPrintArrays + ShortenTitle + as_custom_details)
  // — full publication JSON byte-exact against SQL-built strings,
  // including the parsed rule description, the github-search title link,
  // the indent-2 record dump inside the code fence, and the
  // single-hit-scalar populate arity.
  register(
    "a5j_publishers_layout",
    """SELECT event_id,
      |  '{"@slack.text":"Rule triggered","@slack.attachments":['
      |  || '{"fallback":"Rule triggered: layout_demo","color":"#ff5a5f",'
      |  || '"author_name":"","author_link":"","author_icon":"",'
      |  || '"title":"layout_demo","title_link":'
      |  || '"https://github.com/airbnb/streamalert/search?q=layout_demo+path%3A%2Frules",'
      |  || '"text":"Demo of the slack layout chain","image_url":"","thumb_url":"",'
      |  || '"footer":"","footer_icon":"","ts":1704067200,"mrkdwn_in":[]},'
      |  || '{"color":"#8ce071","fields":[{"title":"Note","value":"First note line continues here"},'
      |  || '{"title":"Playbook","value":"(a) check the runbook"}]},'
      |  || '{"color":"#7b0051","author":"stream-1","title":"Record",'
      |  || '"text":"```\n\n{\n  \"event_id\": ' || event_id
      |  || ',\n  \"event_type\": \"' || event_type || '\"\n}\n```",'
      |  || '"fields":[{"title":"Alert Id","value":"' || md5(event_id::VARCHAR) || '"}],'
      |  || '"footer":"via <https://console.aws.amazon.com/kinesis/home|kinesis>",'
      |  || '"footer_icon":"","mrkdwn_in":["text"]}],'
      |  || '"@slack._previous_publication":{"record":{"event_id":' || event_id
      |  || ',"event_type":"' || event_type || '"}}}' AS slack_pub,
      |  '{"event_id":' || event_id || ',"event_type":"' || event_type || '",'
      |  || '"@pagerduty-v2.summary":"layout_demo",'
      |  || '"@pagerduty-incident.incident_title":"layout_demo",'
      |  || '"@pagerduty.description":"layout_demo",'
      |  || '"@pagerduty.details":{"event_id":' || event_id
      |  || ',"event_type":"' || event_type || '"},'
      |  || '"@pagerduty-v2.custom_details":{"event_id":' || event_id
      |  || ',"event_type":"' || event_type || '"}}' AS pd_pub
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("layout_demo").as("rule_name"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
          .cast("timestamp").as("created"),
        lit("kinesis").as("source_service"),
        lit("stream-1").as("source_entity"),
        lit("description: Demo of the slack layout chain\n\n" +
          "note: First note line\n  continues here\n" +
          "playbook: (a) check the runbook").as("rule_description"),
        struct(col("event_id"), col("event_type")).as("record"))
    Publishers.register("populate_a5j")(
      Publishers.populateFields(Seq("event_id", "event_type")))
    val slackChain = Seq("record_only", "slack_summary",
      "slack_attach_rule_info", "slack_attach_full_record")
    val pdChain = Seq("record_only", "populate_a5j", "pretty_print_arrays",
      "pagerduty_shorten_title", "pagerduty_as_custom_details")
    val sl = Publishers.publish(alerts, slackChain)
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        col("publication").as("slack_pub"))
    val pd = Publishers.publish(alerts, pdChain)
      .select(col("alert_id"), col("publication").as("pd_pub"))
    sl.join(pd, "alert_id").drop("alert_id").orderBy("event_id")
  }


  // A5b: community publisher library — record_only + enumerate_fields
  // (dotted-path flattening, generic.py:115-168) and populate_fields (deep
  // get_keys extraction with the reference's single-hit-publishes-scalar
  // arity, generic.py:171-203) — publication JSON checked byte-for-byte
  // against SQL-built strings.
  register(
    "a5b_publishers_library",
    """SELECT event_id,
      |       '{"record.event_id":' || event_id
      |         || ',"record.event_type":"' || event_type
      |         || '","record.who.uid":' || user_id || '}' AS enum_pub,
      |       '{"uid":' || user_id || '}' AS pop_pub
      |FROM events""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").select(
      md5(col("event_id").cast("string")).as("alert_id"),
      lit("pub_demo").as("rule_name"),
      struct(col("event_id"), col("event_type"),
        struct(col("user_id").as("uid")).as("who")).as("record"),
      lit(false).as("staged"))
    Publishers.register("populate_uid")(Publishers.populateFields(Seq("uid")))
    val enumPub = Publishers.publish(alerts, Seq("record_only", "enumerate_fields"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        col("publication").as("enum_pub"))
    val popPub = Publishers.publish(alerts, Seq("populate_uid"))
      .select(col("alert_id"), col("publication").as("pop_pub"))
    enumPub.join(popPub, "alert_id").drop("alert_id")
  }


  // S9 carbonblack (the one previously declared-out dialect): the
  // dispatcher's ban-hash state machine (carbonblack.py:60-109) as a
  // join + case over (alerts × banned table). Fixture: alerts derived
  // from events (every 7th has no context, the next an unsupported
  // action, the next a ban with no hash value; the rest ban one of 40
  // hashes), banned table seeds hashes 0..19 alternating enabled.
  private val cbStateSql =
    """SELECT md5(CAST(x AS VARCHAR)) AS md5hash, x % 2 = 0 AS enabled,
      |       'seed' AS text
      |FROM range(20) t(x)""".stripMargin

  private val cbAlertsSql =
    """SELECT event_id AS alert_id,
      |       event_id % 7 <> 0 AS has_context,
      |       CASE WHEN event_id % 7 = 0 THEN NULL
      |            WHEN event_id % 7 = 1 THEN 'isolate' ELSE 'ban' END AS action,
      |       CASE WHEN event_id % 7 IN (0, 1, 2) THEN NULL
      |            ELSE md5(CAST(event_id % 40 AS VARCHAR)) END AS md5hash
      |FROM events WHERE event_id < 240""".stripMargin

  private val cbPlanSql =
    s"""WITH state AS ($cbStateSql), al AS ($cbAlertsSql)
       |SELECT alert_id, al.md5hash,
       |       CASE WHEN NOT has_context THEN 'error_no_context'
       |            WHEN action IS NULL OR action <> 'ban'
       |              THEN 'error_unsupported_action'
       |            WHEN al.md5hash IS NULL THEN 'error_no_value'
       |            WHEN s.enabled THEN 'noop_already_banned'
       |            WHEN s.enabled IS NOT NULL THEN 'reenable'
       |            ELSE 'create_ban' END AS action_plan
       |FROM al LEFT JOIN state s ON al.md5hash = s.md5hash""".stripMargin

  private def cbFixture(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val alerts = t(s, dir, "events").where(col("event_id") < 240).select(
      col("event_id").as("alert_id"),
      // falsy-context variants rotate through the Python-falsy JSON set
      // (NULL, "{ }", " null ", "", "[]", "false") — all must classify
      // error_no_context exactly like plain NULL (carbonblack.py:73)
      when(col("event_id") % 7 === 0, element_at(
        array(lit(null).cast("string"), lit("{ }"), lit(" null "),
          lit(""), lit("[]"), lit("false")),
        ((col("event_id") / 7).cast("int") % 6) + 1))
        .when(col("event_id") % 7 === 1, to_json(struct(
          struct(lit("isolate").as("action")).as("carbonblack"))))
        .when(col("event_id") % 7 === 2, to_json(struct(
          struct(lit("ban").as("action")).as("carbonblack"))))
        .otherwise(to_json(struct(struct(lit("ban").as("action"),
          md5((col("event_id") % 40).cast("string")).as("value"))
          .as("carbonblack")))).as("context"))
    val banned = s.range(20).select(
      md5(col("id").cast("string")).as("md5hash"),
      (col("id") % 2 === 0).as("enabled"), lit("seed").as("text"))
    (alerts, banned)
  }

  register(
    "a8_carbonblack_plan",
    s"""SELECT alert_id, md5hash, action_plan,
       |       action_plan IN ('noop_already_banned', 'reenable', 'create_ban')
       |         AS success
       |FROM ($cbPlanSql) ORDER BY alert_id""".stripMargin) { (s, dir) =>
    val (alerts, banned) = cbFixture(s, dir)
    graft.alerts.CarbonBlack.banPlan(alerts, banned).orderBy("alert_id")
  }

  register(
    "a8b_carbonblack_state",
    s"""WITH plan AS ($cbPlanSql), state AS ($cbStateSql)
       |SELECT md5hash,
       |       enabled OR md5hash IN
       |         (SELECT md5hash FROM plan WHERE action_plan = 'reenable')
       |         AS enabled,
       |       text
       |FROM state
       |UNION ALL
       |SELECT DISTINCT md5hash, true AS enabled,
       |       'Banned from StreamAlert' AS text
       |FROM plan WHERE action_plan = 'create_ban'
       |ORDER BY md5hash""".stripMargin) { (s, dir) =>
    val (alerts, banned) = cbFixture(s, dir)
    val plan = graft.alerts.CarbonBlack.banPlan(alerts, banned)
    graft.alerts.CarbonBlack.applyPlan(plan, banned).orderBy("md5hash")
  }
}
