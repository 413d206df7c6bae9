package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.rules._

/** Mirrors behaviors of tests/unit/streamalert/rules_engine/ and
  * tests/unit/streamalert/shared/test_rule.py: dispatch by log type,
  * matcher conjunction, req_subkeys guard, output union/validation,
  * alert field surface. */
class RulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def typedEvents = {
    Seq(
      (1L, "error", 185.0, Some(7L)),
      (2L, "purchase", 9.0, Some(3L)),
      (3L, "error", 42.0, None),
      (4L, "signup", 200.0, Some(1L)))
      .toDF("event_id", "etype", "value", "k")
      .select(struct(col("event_id"), col("etype"), col("value"),
        struct(col("k")).as("props")).as("record"))
  }

  private val matchers = {
    val m = new MatcherRegistry
    m.register("is_error")(rec => rec.getField("etype") === "error")
    m
  }

  test("rule dispatch by log type + single-pass multi-rule explosion") {
    val rules = Seq(
      Rule("big_value", RuleOpts(logs = Seq("demo:events")),
        rec => rec.getField("value") > 100),
      Rule("any_error", RuleOpts(logs = Seq("demo:events")),
        rec => rec.getField("etype") === "error"),
      Rule("other_log", RuleOpts(logs = Seq("other:type")), _ => lit(true)))
    val eng = new RulesEngine(rules, matchers, deterministicIds = true,
      clock = Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val alerts = eng.evaluate(typedEvents, "demo:events")
    val got = alerts.select("rule_name", "record.event_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(identity).toSeq
    // event 1: both rules; event 3: any_error; event 4: big_value
    assert(got == Seq(("any_error", 1L), ("any_error", 3L), ("big_value", 1L), ("big_value", 4L)))
  }

  test("matchers are ANDed before the rule body") {
    val rules = Seq(Rule("error_and_big",
      RuleOpts(logs = Seq("demo:events"), matchers = Seq("is_error")),
      rec => rec.getField("value") > 100))
    val eng = new RulesEngine(rules, matchers, deterministicIds = true)
    val got = eng.evaluate(typedEvents, "demo:events")
      .select("record.event_id").as[Long].collect().toSeq
    assert(got == Seq(1L)) // event 4 is big but not error
  }

  test("req_subkeys guards null nested fields") {
    val rules = Seq(Rule("has_k",
      RuleOpts(logs = Seq("demo:events"), reqSubkeys = Map("props" -> Seq("k"))),
      _ => lit(true)))
    val eng = new RulesEngine(rules, matchers, deterministicIds = true)
    val got = eng.evaluate(typedEvents, "demo:events")
      .select("record.event_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 2L, 4L)) // event 3 has props.k = null
  }

  test("outputs = required ∪ rule ∪ dynamic, ':'-validated, sorted distinct") {
    val rules = Seq(Rule("dyn",
      RuleOpts(logs = Seq("demo:events"), outputs = Seq("slack:chan", "bad-no-colon"),
        dynamicOutputs = Some(rec =>
          array(when(rec.getField("value") > 100, lit("pagerduty:high"))
            .otherwise(lit("pagerduty:low"))))),
      _ => lit(true)))
    val eng = new RulesEngine(rules, matchers, deterministicIds = true)
    val got = eng.evaluate(typedEvents, "demo:events")
      .select(col("record.event_id"), array_join(col("outputs"), ",").as("o"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got(0) == (1L, "aws-firehose:alerts,pagerduty:high,slack:chan"))
    assert(got(1) == (2L, "aws-firehose:alerts,pagerduty:low,slack:chan"))
  }

  test("deterministic alert ids + fixed clock for replayable tests") {
    val rules = Seq(Rule("r", RuleOpts(logs = Seq("demo:events")), _ => lit(true)))
    val eng = new RulesEngine(rules, matchers, deterministicIds = true,
      clock = Some(java.sql.Timestamp.valueOf("2024-06-01 12:00:00")))
    val a = eng.evaluate(typedEvents, "demo:events")
      .select("alert_id", "created").collect()
    assert(a.map(_.getString(0)).distinct.length == 4) // unique per record
    assert(a.forall(_.getTimestamp(1) == java.sql.Timestamp.valueOf("2024-06-01 12:00:00")))
    // same input -> same ids
    val b = eng.evaluate(typedEvents, "demo:events").select("alert_id").collect()
    assert(a.map(_.getString(0)).sorted.sameElements(b.map(_.getString(0)).sorted))
  }

  test("helpers: cidr membership, glob matching, ip validity") {
    val df = Seq("10.1.2.3", "192.168.0.5", "not-an-ip", "10.255.0.1")
      .toDF("ip")
    val got = df.select(
      Helpers.inNetwork(col("ip"), Seq("10.0.0.0/8")).as("in10"),
      Helpers.validIp(col("ip")).as("valid"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1))).toSeq
    assert(got == Seq((true, true), (false, true), (false, false), (true, true)))
    val m = Seq("prod-web-1").toDF("h").select(
      Helpers.matchesAny(col("h"), Seq("prod-*")),
      Helpers.startsWithAny(col("h"), Seq("dev-", "prod-")),
      Helpers.pathMatchesAny(lit("/Users/foo/path/to/file"), Seq("/Users/*/path/*/file")))
      .collect()(0)
    assert(m.getBoolean(0) && m.getBoolean(1) && m.getBoolean(2))
  }

  test("rule context lands on the alert as a map column (rule.py:70-76)") {
    val typed = Seq((1L, "error")).toDF("event_id", "etype")
      .select(struct(col("event_id"), col("etype")).as("record"))
    val rules = Seq(
      Rule("with_ctx", RuleOpts(logs = Seq("t"),
        context = Map("populate_fields" -> "event_id", "team" -> "sec")),
        r => r.getField("etype") === "error"))
    val alert = new RulesEngine(rules, deterministicIds = true)
      .evaluate(typed, "t")
      .select(element_at(col("context"), "team"),
        element_at(col("context"), "populate_fields")).collect()(0)
    assert(alert.getString(0) == "sec" && alert.getString(1) == "event_id")
  }

  test("typed deep search: get_keys BFS + data_has_value family (utils.py:79-145)") {
    // the get_keys docstring example: 'path' at root, nested struct, and a
    // list of structs -> all three values, root first
    val df = spark.sql(
      """SELECT named_struct(
        |  'path', 'ABC',
        |  'details', named_struct('parent', named_struct('path', 'DEF')),
        |  'events', array(named_struct('path', 'GHI'), named_struct('path', 'JKL')),
        |  'count', 7L,
        |  'labels', map('env', 'prod')) AS record""".stripMargin)
    val recType = df.schema("record").dataType
    val rec = col("record")
    val r = df.select(
      Helpers.getKeys(rec, recType, "path").as("paths"),
      Helpers.getFirstKey(rec, recType, "path", lit("(n/a)")).as("first"),
      Helpers.getFirstKey(rec, recType, "missing_key_in_map_only", lit("dflt")).as("miss"),
      Helpers.dataHasValue(rec, recType, "DEF").as("hasDef"),
      Helpers.dataHasValue(rec, recType, 7L).as("has7"),
      Helpers.dataHasValue(rec, recType, "7").as("hasStr7"),   // str != int
      Helpers.dataHasValue(rec, recType, "prod").as("hasMapVal"),
      Helpers.dataHasValueWithSubstring(rec, recType, "HI").as("hasHi"),
      Helpers.dataHasValueFromSubstringList(rec, recType, Seq("zz", "KL")).as("hasKl"),
      Helpers.dataHasValueFromList(rec, recType, Seq("A*")).as("globA"))
      .collect()(0)
    assert(r.getSeq[String](0) == Seq("ABC", "DEF", "GHI", "JKL"))
    assert(r.getString(1) == "ABC")
    assert(r.getString(2) == "dflt")
    assert(r.getBoolean(3) && r.getBoolean(4) && !r.getBoolean(5))
    assert(r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8) && r.getBoolean(9))
    // map direct-lookup path of get_keys
    val env = df.select(Helpers.getKeys(rec, recType, "env").as("envs")).collect()(0)
    assert(env.getSeq[String](0) == Seq("prod"))
  }

  test("merge_key_vals resolves through map-typed fields; arrays fall back to null") {
    // detail is an open map ({} schema) — the typed path must navigate it
    // (cloudwatch:events-style mergeByKeys = detail.region); a path through
    // an ARRAY is not statically resolvable and must yield NULL so the
    // merger's Jackson fallback does the grouping instead of a sentinel
    val df = Seq(
      (1L, Map("region" -> "us-east-1"), Seq("t1")),
      (2L, Map("region" -> "eu-west-2"), Seq("t2")))
      .toDF("event_id", "detail", "tags")
      .select(struct(col("event_id"), col("detail"), col("tags")).as("record"))
    val viaMap = new RulesEngine(Seq(
      Rule("by_region", RuleOpts(logs = Seq("demo:map"),
        mergeByKeys = Seq("detail.region"), mergeWindowMins = 5), _ => lit(true))),
      deterministicIds = true).evaluate(df, "demo:map")
      .select("merge_key_vals").as[String].collect().sorted.toSeq
    assert(viaMap == Seq("eu-west-2", "us-east-1"))
    val viaArray = new RulesEngine(Seq(
      Rule("by_tag", RuleOpts(logs = Seq("demo:map"),
        mergeByKeys = Seq("tags.name"), mergeWindowMins = 5), _ => lit(true))),
      deterministicIds = true).evaluate(df, "demo:map")
      .select("merge_key_vals").collect()
    assert(viaArray.forall(_.isNullAt(0)), "unresolvable path must be null")
  }

  test("publisher assignment: blanket, dict precedence, firehose exclusion, unknown drop") {
    // rules_engine.py:341-408 _configure_publishers
    import graft.alerts.Publishers
    Publishers.register("pub_a")(identity)
    Publishers.register("pub_b")(identity)
    Publishers.register("pub_c")(identity)
    val outputs = Seq("slack:chan", "pagerduty:svc", "aws-firehose:alerts")

    // blanket list applies to every output; required firehose is excluded
    val blanket = Rule("r1", RuleOpts(logs = Seq("t"),
      publishers = Seq("pub_a", "pub_b")), _ => lit(true))
    assert(RulesEngine.configurePublishers(blanket, outputs) ==
      Map("slack:chan" -> Seq("pub_a", "pub_b"),
        "pagerduty:svc" -> Seq("pub_a", "pub_b")))

    // dict form: SERVICE key's chain loads first, exact output+descriptor
    // key's chain appends after it; unmatched outputs get an empty chain
    val dict = Rule("r2", RuleOpts(logs = Seq("t"),
      publishersByOutput = Map(
        "slack" -> Seq("pub_a"),
        "slack:chan" -> Seq("pub_b"))), _ => lit(true))
    assert(RulesEngine.configurePublishers(dict, outputs) ==
      Map("slack:chan" -> Seq("pub_a", "pub_b"),
        "pagerduty:svc" -> Nil))

    // unregistered names drop (standardize_publisher_name warning path)
    val unknown = Rule("r3", RuleOpts(logs = Seq("t"),
      publishers = Seq("pub_c", "never_registered")), _ => lit(true))
    assert(RulesEngine.configurePublishers(unknown, Seq("slack:chan")) ==
      Map("slack:chan" -> Seq("pub_c")))

    // no declaration at all -> no assignment (reference returns None)
    val none = Rule("r4", RuleOpts(logs = Seq("t")), _ => lit(true))
    assert(RulesEngine.configurePublishers(none, outputs).isEmpty)
  }
}
