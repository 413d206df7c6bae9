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

/** Rules engine rows (R1-R12): dispatch, predicates, matchers,
  * threat intel, lookup tables, staging, stats, dynamic outputs. */
private[graft] trait RulesQueries extends RegistryBase {


  // R1+R2: dispatch by log type, predicate evaluation, multi-rule explosion.
  register(
    "r1_rule_dispatch",
    """SELECT * FROM (
      |  SELECT 'any_error' AS rule_name, count(*) AS n FROM events WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT 'big_value' AS rule_name, count(*) AS n FROM events WHERE value > 150)
      |ORDER BY rule_name""".stripMargin) { (s, dir) =>
    val rules = Seq(
      Rule("any_error", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("event_type") === "error"),
      Rule("big_value", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("value") > 150))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
      .groupBy("rule_name").agg(count(lit(1)).as("n")).orderBy("rule_name")
  }


  // R2 projection + A1 alert field surface (fixed clock for determinism).
  register(
    "r2_alert_construction",
    """SELECT 'high_value_error' AS rule_name,
      |       TIMESTAMP '2024-01-01 00:00:00' AS created,
      |       'local' AS cluster, 'demo:json_events' AS log_type,
      |       'aws-firehose:alerts,slack:alerts' AS outputs,
      |       event_id, value AS val
      |FROM events WHERE event_type = 'error' AND value > 100""".stripMargin) { (s, dir) =>
    val rules = Seq(
      Rule("high_value_error",
        RuleOpts(logs = Seq("demo:json_events"), outputs = Seq("slack:alerts")),
        rec => rec.getField("event_type") === "error" && rec.getField("value") > 100))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
      .select(
        col("rule_name"), col("created"), col("cluster"), col("log_type"),
        array_join(col("outputs"), ",").as("outputs"),
        col("record.event_id").as("event_id"),
        col("record.value").as("val"))
  }


  // R3: matchers ANDed ahead of the rule body.
  register(
    "r3_matchers",
    """SELECT event_id FROM events
      |WHERE event_type = 'purchase' AND value > 100""".stripMargin) { (s, dir) =>
    val m = new MatcherRegistry
    m.register("is_purchase")(rec => rec.getField("event_type") === "purchase")
    val rules = Seq(
      Rule("big_purchase", RuleOpts(logs = Seq("demo:json_events"), matchers = Seq("is_purchase")),
        rec => rec.getField("value") > 100))
    new RulesEngine(rules, m, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
      .select(col("record.event_id").as("event_id"))
  }


  // R4: req_subkeys null-safety guard over a nested optional struct.
  register(
    "r4_req_subkeys",
    """SELECT event_id FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 != 0""".stripMargin) { (s, dir) =>
    import graft.core.FieldType._
    val schema = graft.core.LogSchema(
      name = "demo:json_subkeys", parser = graft.core.ParserKind.Json,
      schema = TStruct.of("event_id" -> TInteger,
        "props" -> TStruct.of("k" -> TInteger)),
      optionalTopLevelKeys = Set("props"))
    val raw = eventsWide(s, dir).select(
      to_json(struct(
        col("event_id"),
        when(get_json_object(col("props"), "$.k").cast("long") % 5 =!= 0,
          struct(get_json_object(col("props"), "$.k").cast("long").as("k")))
          .as("props"))).as("line"))
    val typed = new Classifier(Seq(schema)).classify(raw, "line").forType("demo:json_subkeys")
    val rules = Seq(
      Rule("has_k", RuleOpts(logs = Seq("demo:json_subkeys"),
        reqSubkeys = Map("props" -> Seq("k"))), _ => lit(true)))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(typed, "demo:json_subkeys")
      .select(col("record.event_id").as("event_id"))
  }


  // R6: helper library — CIDR membership + prefix matching as codegen'd
  // Column predicates.
  register(
    "r6_helpers",
    """SELECT event_id,
      |       concat(CASE WHEN user_id % 2 = 0 THEN '10.0.' ELSE '192.168.' END,
      |              CAST(user_id % 256 AS VARCHAR), '.',
      |              CAST(event_id % 256 AS VARCHAR)) AS ip
      |FROM events
      |WHERE user_id % 2 = 0
      |  AND (event_type LIKE 'p%' OR event_type LIKE 's%')""".stripMargin) { (s, dir) =>
    import graft.core.FieldType._
    val schema = graft.core.LogSchema(
      name = "demo:json_ip", parser = graft.core.ParserKind.Json,
      schema = TStruct.of("event_id" -> TInteger, "etype" -> TString, "ip" -> TString))
    val raw = eventsWide(s, dir).select(
      to_json(struct(
        col("event_id"), col("event_type").as("etype"),
        concat(
          when(col("user_id") % 2 === 0, lit("10.0.")).otherwise(lit("192.168.")),
          (col("user_id") % 256).cast("string"), lit("."),
          (col("event_id") % 256).cast("string")).as("ip"))).as("line"))
    val typed = new Classifier(Seq(schema)).classify(raw, "line").forType("demo:json_ip")
    val rules = Seq(
      Rule("internal_ps", RuleOpts(logs = Seq("demo:json_ip")), rec =>
        Helpers.inNetwork(rec.getField("ip"), Seq("10.0.0.0/8")) &&
          Helpers.startsWithAny(rec.getField("etype"), Seq("p", "s"))))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(typed, "demo:json_ip")
      .select(col("record.event_id").as("event_id"), col("record.ip").as("ip"))
  }


  // R10: per-rule stats via observe() metrics (shared/stats.py:26-100) —
  // counts ride the alerts action as AggregateMetrics, zero extra passes;
  // the query materializes the collected Observation as rows. alerts_total
  // is the sum of per-rule counts (a record firing k rules is k alerts).
  register(
    "r10_rule_stats",
    """SELECT * FROM (
      |  SELECT 'any_error' AS rule_name, count(*) AS n FROM events
      |  WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT 'big_value', count(*) FROM events WHERE value > 150
      |  UNION ALL
      |  SELECT '__total__',
      |         (SELECT count(*) FROM events WHERE event_type = 'error')
      |         + (SELECT count(*) FROM events WHERE value > 150))
      |ORDER BY rule_name""".stripMargin) { (s, dir) =>
    import graft.rules.RuleStats
    val rules = Seq(
      Rule("any_error", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("event_type") === "error"),
      Rule("big_value", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("value") > 150))
    val alerts = new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
    val (observed, obs) = RuleStats.observed(alerts, rules)
    observed.write.mode("overwrite").format("noop").save() // action -> metrics
    val m = obs.get
    import s.implicits._
    (Seq("__total__" -> m("alerts_total").asInstanceOf[Long]) ++
      rules.map(r => r.name -> m(s"alerts_${r.name}").asInstanceOf[Long]))
      .toDF("rule_name", "n").orderBy("rule_name")
  }


  // R6b: typed-record deep search (shared/utils.py:79-145 get_keys BFS +
  // base.py:203-224 data_has_value_from_substring_list) over a 3-level
  // nested schema with a string list. The needles hit DIFFERENT branches:
  // 'err' matches meta.type for error events, 'tag-3' matches a tags list
  // element — the plan-time BFS must find both without knowing where.
  register(
    "r6b_deep_search",
    """SELECT event_id, event_type AS type_val FROM events
      |WHERE event_type LIKE '%err%'
      |   OR CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 3""".stripMargin) {
    (s, dir) =>
    import graft.core.FieldType._
    val schema = graft.core.LogSchema(
      name = "demo:json_deep", parser = graft.core.ParserKind.Json,
      schema = TStruct.of(
        "event_id" -> TInteger,
        "meta" -> TStruct.of(
          "type" -> TString,
          "inner" -> TStruct.of("v" -> TFloat)),
        "tags" -> TList))
    val raw = eventsWide(s, dir).select(
      to_json(struct(
        col("event_id"),
        struct(col("event_type").as("type"),
          struct(col("value").as("v")).as("inner")).as("meta"),
        array(concat(lit("tag-"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).cast("string")))
          .as("tags"))).as("line"))
    val typed = new Classifier(Seq(schema)).classify(raw, "line")
      .forType("demo:json_deep")
    val recType = typed.schema("record").dataType
    val rec = col("record")
    typed
      .where(Helpers.dataHasValueFromSubstringList(rec, recType, Seq("err", "tag-3")))
      .select(col("record.event_id").as("event_id"),
        Helpers.getFirstKey(rec, recType, "type", lit("(n/a)")).as("type_val"))
  }


  // R11+R12: dynamic outputs computed from the record, unioned with rule +
  // required outputs, ':'-validated.
  register(
    "r11_dynamic_outputs",
    """SELECT event_id,
      |       concat('aws-firehose:alerts,pagerduty:',
      |              CASE WHEN value > 150 THEN 'high' ELSE 'low' END,
      |              ',slack:chan') AS outputs
      |FROM events WHERE event_type = 'error'""".stripMargin) { (s, dir) =>
    val rules = Seq(
      Rule("dyn", RuleOpts(logs = Seq("demo:json_events"),
        outputs = Seq("slack:chan", "bad-no-colon"),
        dynamicOutputs = Some(rec => array(
          concat(lit("pagerduty:"),
            when(rec.getField("value") > 150, lit("high")).otherwise(lit("low")))))),
        rec => rec.getField("event_type") === "error"))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
      .select(
        col("record.event_id").as("event_id"),
        array_join(col("outputs"), ",").as("outputs"))
  }


  // R5: datatype-selected rule reading values via the normalization map
  // (get_values_for_normalized_type).
  register(
    "r5_datatype_rule",
    "SELECT event_id FROM events WHERE event_type = 'purchase'") { (s, dir) =>
    val rules = Seq(
      Rule("purchase_by_datatype",
        RuleOpts(datatypes = Seq("event_category")),
        _ => array_contains(
          Normalizer.valuesForNormalizedType(
            col(Normalizer.NormalizationKey), "event_category"), "purchase")))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(normalizedEvents(s, dir), "demo:json_norm")
      .select(col("record.event_id").as("event_id"))
  }


  // ---------------------------------------------------------------------------
  // Joins (SURVEY §2.3 R7-R9): threat intel, lookup tables, staging gate
  // ---------------------------------------------------------------------------

  // R7: IOC annotate — explode candidates from the normalization map,
  // broadcast-join the IOC table, CIDR exclusions, re-aggregate per record.
  register(
    "r7_threat_intel",
    """WITH ips AS (
      |  SELECT event_id, user_id,
      |         concat('10.0.', CAST(user_id % 256 AS VARCHAR), '.',
      |                CAST(event_id % 256 AS VARCHAR)) AS ip
      |  FROM events),
      |ioc AS (SELECT DISTINCT ip AS ioc_value FROM ips
      |        WHERE event_id % 13 = 0 AND user_id % 256 != 99)
      |SELECT i.event_id, i.ip FROM ips i JOIN ioc ON i.ip = ioc.ioc_value
      |ORDER BY i.event_id""".stripMargin) { (s, dir) =>
    import graft.core.FieldType._
    val ipSchema = graft.core.LogSchema(
      name = "demo:json_ioc", parser = graft.core.ParserKind.Json,
      schema = TStruct.of("event_id" -> TInteger, "ip" -> TString))
    val ipCol = concat(lit("10.0."), (col("user_id") % 256).cast("string"),
      lit("."), (col("event_id") % 256).cast("string"))
    val raw = eventsWide(s, dir).select(
      to_json(struct(col("event_id"), ipCol.as("ip"))).as("line"))
    val typed = new Classifier(Seq(ipSchema)).classify(raw, "line").forType("demo:json_ioc")
      .withColumn(Normalizer.NormalizationKey,
        Normalizer.normalizationCol(col("record"),
          Map("sourceAddress" -> Seq(NormalizedField(path = Seq("ip")))),
          Some(ipSchema.schema)))
      .withColumn(Normalizer.RecordIdKey,
        Normalizer.recordIdCol(col(Normalizer.NormalizationKey),
          deterministicFrom = Some(col("record.event_id"))))
    // IOC table: every 13th event's ip is "malicious" (minus an excluded /24)
    val iocTable = t(s, dir, "events")
      .where(col("event_id") % 13 === 0 && col("user_id") % 256 =!= 99)
      .select(ipCol.as("ioc_value"), lit("ip").as("sub_type")).distinct()
    val ti = new ThreatIntel(iocTable,
      normalizedTypeToIoc = Map("sourceAddress" -> "ip"),
      excluded = Map("ip" -> Seq("10.0.99.0/24")))
    val annotated = ti.annotate(typed)
    annotated.where(size(map_keys(col(ti.IocKey))) > 0)
      .select(col("record.event_id").as("event_id"), col("record.ip").as("ip"))
      .orderBy("event_id")
  }


  // R8: lookup-table reference join — small S3-style doc as a literal map
  // (zero-join path) used inside a rule body.
  register(
    "r8_lookup_table",
    """SELECT c_custkey, c_name, n.n_name AS nation_name
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE n.n_name LIKE 'NATION_1%'""".stripMargin) { (s, dir) =>
    val nationMap = t(s, dir, "nation").collect()
      .map(r => r.getInt(0).toString -> r.getString(1)).toMap
    val lookups = new LookupTables(Map("nations" -> MapLookupTable(nationMap)))
    t(s, dir, "customer")
      .withColumn("nation_name",
        lookups.get("nations", col("c_nationkey"), lit("unknown")))
      .where(Helpers.startsWithAny(col("nation_name"), Seq("NATION_1")))
      .select("c_custkey", "c_name", "nation_name")
  }


  // R8b: DataFrame-style lookup join (the DynamoDB per-key driver analogue)
  // via broadcast-hash join.
  register(
    "r8_lookup_join",
    """SELECT s_suppkey, s_name, coalesce(n.n_name, 'unknown') AS nation_name
      |FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey""".stripMargin) {
    (s, dir) =>
      val table = DataFrameLookupTable(t(s, dir, "nation"), "n_nationkey", "n_name")
      table.join(t(s, dir, "supplier"), col("s_nationkey"), "nation_name", lit("unknown"))
        .select("s_suppkey", "s_name", "nation_name")
  }


  // R9: staging gate — staged rules restricted to required outputs.
  register(
    "r9_staging_gate",
    """SELECT * FROM (
      |  SELECT 'staged_rule' AS rule_name, true AS staged,
      |         'aws-firehose:alerts' AS outputs, count(*) AS n
      |  FROM events WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT 'live_rule', false, 'aws-firehose:alerts,slack:live', count(*)
      |  FROM events WHERE value > 150) ORDER BY rule_name""".stripMargin) { (s, dir) =>
    val rules = Seq(
      Rule("staged_rule", RuleOpts(logs = Seq("demo:json_events"), outputs = Seq("slack:staged")),
        rec => rec.getField("event_type") === "error"),
      Rule("live_rule", RuleOpts(logs = Seq("demo:json_events"), outputs = Seq("slack:live")),
        rec => rec.getField("value") > 150))
    val alerts = new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
    val ruleTable = s.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row("staged_rule", true),
        org.apache.spark.sql.Row("live_rule", false)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rule_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("staged",
          org.apache.spark.sql.types.BooleanType))))
    Staging.applyStaging(alerts, ruleTable)
      .groupBy(col("rule_name"), col("staged"), array_join(col("outputs"), ",").as("outputs"))
      .agg(count(lit(1)).as("n"))
      .orderBy("rule_name")
  }
}
