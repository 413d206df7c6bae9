package graft.testing

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import graft.classify.{Classifier, Normalizer}
import graft.core.LogSchema
import graft.rules.{MatcherRegistry, Rule, RulesEngine}

/** The reference's rule integration-test contract
  * (streamalert_cli/test/event.py:34-43): JSON test events living next to
  * each rule — `{description, log, service, source, data, trigger_rules,
  * classify_only}` — fed through the REAL classifier → rules engine, with
  * the triggered-rule set as the assertion
  * (streamalert_cli/test/handler.py:243-276).
  */
final case class RuleTestEvent(
    description: String,
    log: String,
    service: String,
    source: String,
    dataJson: String,
    triggerRules: Set[String],
    classifyOnly: Boolean,
    /** `compress` (event.py:37,80-81,271-272): the kinesis test shape
      * zlib-compresses `data` before base64-encoding it into the record;
      * the classifier transparently inflates (kinesis.py:52-56). The
      * harness replicates the wire round-trip: compress driver-side, decode
      * through the REAL [[graft.sources.Sources.decodeKinesisData]] column. */
    compress: Boolean = false,
    /** `override_record` (event.py:51-58, 360-380): a SPARSE record whose
      * missing fields back-fill with the log schema's zero values. Resolved
      * against the schema by [[RuleTestHarness]] at run time. */
    overrideRecordJson: Option[String] = None,
    /** `test_fixtures.lookup_tables` (event.py:36-43 + test/mocks.py
      * LookupTableMocks): table -> key -> value (non-textual values kept as
      * their JSON text, the MapLookupTable convention). Installed into
      * [[TestFixtures.lookupTables]] for the run. */
    lookupTableFixtures: Map[String, Map[String, String]] = Map.empty,
    /** `test_fixtures.threat_intel` (ThreatIntelMocks): mocked IOC rows
      * (ioc_value, ioc_type, sub_type) the run's annotate joins against. */
    threatIntelFixtures: Seq[(String, String, String)] = Nil,
    /** `publisher_tests` (event.py + test/format docs): per-output
      * assertions over the published payload — a JMESPath expression, a
      * condition (`is` / `contains`), and the expected JSON value. */
    publisherTests: Map[String, Seq[PublisherAssertion]] = Map.empty)

/** One publisher_tests assertion row (either the
  * `{jmespath_expression, condition, value}` object form or the
  * 3-element list form). */
final case class PublisherAssertion(
    expression: String,
    condition: String,
    expected: com.fasterxml.jackson.databind.JsonNode)

object RuleTestEvent {
  private val mapper = new ObjectMapper()

  /** Parse a test-event file (a JSON array of events, the reference layout). */
  def fromJson(json: String): Seq[RuleTestEvent] = {
    val root = mapper.readTree(json)
    root.elements().asScala.map { e =>
      RuleTestEvent(
        description = Option(e.get("description")).map(_.asText).getOrElse(""),
        log = e.get("log").asText,
        service = Option(e.get("service")).map(_.asText).getOrElse("graft"),
        source = Option(e.get("source")).map(_.asText).getOrElse("test"),
        // string data is the RAW record text (event.py:45-49 — non-JSON
        // parsers and pre-serialized payloads like the trendmicro array),
        // not a JSON-quoted string
        dataJson = Option(e.get("data")).map(n =>
          if (n.isTextual) n.asText else mapper.writeValueAsString(n)).orNull,
        triggerRules = Option(e.get("trigger_rules"))
          .map(_.elements().asScala.map(_.asText).toSet).getOrElse(Set.empty),
        classifyOnly = Option(e.get("classify_only")).exists(_.asBoolean),
        compress = Option(e.get("compress")).exists(_.asBoolean),
        overrideRecordJson =
          Option(e.get("override_record")).map(mapper.writeValueAsString),
        lookupTableFixtures = Option(e.get("test_fixtures"))
          .flatMap(f => Option(f.get("lookup_tables"))).map { lt =>
            lt.properties().asScala.map { t =>
              t.getKey -> t.getValue.properties().asScala.map { kv =>
                kv.getKey -> (if (kv.getValue.isTextual) kv.getValue.asText
                  else kv.getValue.toString)
              }.toMap
            }.toMap
          }.getOrElse(Map.empty),
        threatIntelFixtures = Option(e.get("test_fixtures"))
          .flatMap(f => Option(f.get("threat_intel"))).map { ti =>
            ti.elements().asScala.map(r =>
              (r.get("ioc_value").asText, r.get("ioc_type").asText,
                Option(r.get("sub_type")).map(_.asText).getOrElse(""))).toSeq
          }.getOrElse(Nil),
        publisherTests = Option(e.get("publisher_tests")).map { pt =>
          pt.properties().asScala.map { out =>
            out.getKey -> out.getValue.elements().asScala.map { a =>
              if (a.isArray)
                PublisherAssertion(a.get(0).asText, a.get(1).asText, a.get(2))
              else
                PublisherAssertion(a.get("jmespath_expression").asText,
                  a.get("condition").asText, a.get("value"))
            }.toSeq
          }.toMap
        }.getOrElse(Map.empty))
    }.toSeq
  }
}

/** The run-scoped fixture mocks (streamalert_cli/test/mocks.py): the
  * reference patches its global LookupTables / ThreatIntel singletons with
  * each event file's fixtures; rule PORTS that read lookup tables reference
  * [[TestFixtures.lookupTables]], which [[RuleTestHarness.run]] installs
  * from the events' `test_fixtures` before building the rule plan (rule
  * predicates are Column BUILDERS, evaluated at plan time — after install). */
object TestFixtures {
  @volatile var lookupTables: graft.rules.LookupTables =
    new graft.rules.LookupTables(Map.empty)
}

/** The subset of JMESPath the reference's publisher_tests exercise
  * (quoted/bare keys, `.field` and `[idx]` traversal, `keys(@)`), plus the
  * `is` / `contains` conditions. */
object JmesPathLite {
  import com.fasterxml.jackson.databind.JsonNode
  private val mapper = new ObjectMapper()

  def eval(root: JsonNode, expr: String): JsonNode = {
    val e = expr.trim
    if (e == "keys(@)") {
      val arr = mapper.createArrayNode()
      root.fieldNames().asScala.foreach(arr.add)
      arr
    } else {
      var i = 0
      var node: JsonNode = root
      def missing = mapper.nullNode()
      def step(n: JsonNode): JsonNode = if (n == null) missing else n
      def parseIdent(): String =
        if (i < e.length && e(i) == '"') {
          val end = e.indexOf('"', i + 1)
          require(end > i, s"unterminated quoted key in $expr")
          val s = e.substring(i + 1, end); i = end + 1; s
        } else {
          val start = i
          while (i < e.length && e(i) != '.' && e(i) != '[') i += 1
          e.substring(start, i)
        }
      node = step(node.get(parseIdent()))
      while (i < e.length) {
        e(i) match {
          case '.' => i += 1; node = step(node.get(parseIdent()))
          case '[' =>
            val end = e.indexOf(']', i)
            require(end > i, s"unterminated index in $expr")
            node = step(node.get(e.substring(i + 1, end).toInt)); i = end + 1
          case c => throw new IllegalArgumentException(
            s"unsupported JMESPath syntax '$c' in $expr")
        }
      }
      node
    }
  }

  def check(root: JsonNode, a: PublisherAssertion): Option[String] = {
    val actual = eval(root, a.expression)
    val ok = a.condition match {
      case "is" => actual == a.expected
      case "contains" =>
        if (actual.isTextual) actual.asText.contains(a.expected.asText)
        else if (actual.isArray) actual.elements().asScala.contains(a.expected)
        else false
      case c => throw new IllegalArgumentException(s"unsupported condition $c")
    }
    if (ok) None
    else Some(s"${a.expression} ${a.condition} ${a.expected} — got $actual")
  }
}

final case class RuleTestResult(
    event: RuleTestEvent,
    classifiedAs: Option[String],
    triggered: Set[String],
    passed: Boolean,
    /** output -> publication JSON, for events with publisher_tests */
    publications: Map[String, String] = Map.empty,
    publicationFailures: Seq[String] = Nil) {
  def report: String = {
    val status = if (passed) "PASS" else "FAIL"
    s"$status  [${event.log}] ${event.description}: classified=${classifiedAs.getOrElse("-")}" +
      s" triggered=${triggered.toSeq.sorted.mkString(",")}" +
      s" expected=${event.triggerRules.toSeq.sorted.mkString(",")}" +
      publicationFailures.map(f => s"\n        publisher: $f").mkString
  }
}

/** Runs test events through classify → normalize → rules in one batch job
  * (the reference runs classifier + rules engine in-process with AWS
  * patched; here there is nothing to patch — the pipeline IS local). */
final class RuleTestHarness(
    schemas: Seq[LogSchema],
    rules: Seq[Rule],
    matchers: MatcherRegistry = new MatcherRegistry,
    normalization: Map[String, Map[String, Seq[graft.core.NormalizedField]]] = Map.empty,
    /** conf/threat_intel.json text: when given AND events carry
      * `test_fixtures.threat_intel` rows, the run annotates records through
      * the REAL [[graft.rules.ThreatIntel]] join against the mocked IOC
      * table before rule evaluation (the reference's ThreatIntelMocks). */
    threatIntelConfJson: Option[String] = None,
    /** Cluster `data_sources` conf (conf/clusters/<id>.json): when given,
      * each event's candidate schemas narrow to the log families declared
      * for its (service, source) — the reference test runner's cluster
      * resolution (handler.py:328-366) feeding the classifier's
      * logs-for-resource filter. Without it every schema is a candidate
      * (pure first-match ordering). */
    dataSources: Option[Map[String, Map[String, Seq[String]]]] = None) {

  private val mapper = new ObjectMapper()

  /** Reference `default_optional_values` (parsers.py:139-142): the zero
    * value of each declared type — note a nested dict declaration zeroes to
    * an EMPTY dict (`type(value)()`), not a recursive default. */
  private def zeroNode(ft: graft.core.FieldType): com.fasterxml.jackson.databind.JsonNode = {
    import com.fasterxml.jackson.databind.node._
    import graft.core.FieldType
    ft match {
      case FieldType.TString  => TextNode.valueOf("")
      case FieldType.TInteger => IntNode.valueOf(0)
      case FieldType.TFloat   => DoubleNode.valueOf(0.0)
      case FieldType.TBoolean => BooleanNode.FALSE
      case FieldType.TList    => mapper.createArrayNode()
      case FieldType.TAnyMap  => mapper.createObjectNode()
      case _: FieldType.TStruct => mapper.createObjectNode()
    }
  }

  /** RFC-1950 zlib framing, the reference test shape's `zlib.compress`
    * (event.py:272). */
  private def zlibCompress(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Resolve an event's payload: `data` verbatim, or `override_record`
    * merged over the log schema's zero-value defaults (event.py:360-380 —
    * defaults come from `envelope_keys` when the log declares them, else
    * the main schema; the merge is a shallow top-level update). */
  private def effectiveData(e: RuleTestEvent): String = e.overrideRecordJson match {
    case None => e.dataJson
    case Some(ov) =>
      val s = schemas.find(_.name == e.log).getOrElse(throw new NoSuchElementException(
        s"override_record event references unknown log type ${e.log}"))
      val base = s.envelope.getOrElse(s.schema)
      val obj = mapper.createObjectNode()
      base.fields.foreach { case (k, ft) => obj.set[ObjectNode](k, zeroNode(ft)) }
      mapper.readTree(ov).properties().asScala
        .foreach(en => obj.set[ObjectNode](en.getKey, en.getValue))
      mapper.writeValueAsString(obj)
  }

  def run(spark: SparkSession, events: Seq[RuleTestEvent]): Seq[RuleTestResult] = {
    import spark.implicits._
    val engine = new RulesEngine(rules, matchers, deterministicIds = true,
      clock = Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))

    // install the events' lookup-table fixtures BEFORE any rule predicate
    // builds its plan (mocks.py LookupTableMocks.add_fixtures)
    val lookupFixtures = events.flatMap(_.lookupTableFixtures).toMap
    TestFixtures.lookupTables = new graft.rules.LookupTables(
      lookupFixtures.map { case (t, data) =>
        t -> (graft.rules.MapLookupTable(data): graft.rules.LookupTable) })

    // the mocked IOC table (ThreatIntelMocks.add_fixtures), joined through
    // the real annotate path whenever TI is configured — an event file with
    // no TI fixtures annotates against an EMPTY table, so rules reading the
    // ioc column always resolve (the reference's mocks are likewise always
    // installed, just empty)
    val tiRows = events.flatMap(_.threatIntelFixtures).distinct
    val threatIntel = threatIntelConfJson.map(conf =>
      graft.rules.ThreatIntel.fromConfJson(conf,
        tiRows.toDF("ioc_value", "ioc_type", "sub_type")))

    // one classify+evaluate batch per (service, source) group — when a
    // data_sources conf is present each group sees only its cluster's
    // candidate schemas (handler.py:328-366); otherwise one group, all
    // schemas, pure first-match ordering
    val groups: Seq[((String, String), Seq[LogSchema], Seq[(RuleTestEvent, Int)])] =
      dataSources match {
        case None => Seq((("graft", "test"), schemas, events.zipWithIndex))
        case Some(ds) =>
          events.zipWithIndex.groupBy { case (e, _) => (e.service, e.source) }
            .toSeq.map { case ((svc, res), evs) =>
              ((svc, res), graft.core.DataSources.candidates(schemas, ds, svc, res), evs)
            }
      }

    val perGroup = groups.map { case ((svc, res), cands, evs) =>
      val ctx = graft.rules.AlertContext(sourceService = svc, sourceEntity = res)
      // compress events take the kinesis wire round-trip: zlib + base64
      // driver-side (event.py:271-276 format_record), then the engine's
      // own decode column inflates them back before classification
      val df = evs.map { case (e, i) =>
        val data = effectiveData(e)
        if (e.compress)
          (i, java.util.Base64.getEncoder.encodeToString(zlibCompress(data)), true)
        else (i, data, false)
      }.toDF("__evt_idx", "__wire", "__compressed")
        .withColumn("value", when(col("__compressed"),
          graft.sources.Sources.decodeKinesisData(col("__wire")))
          .otherwise(col("__wire")))
        .drop("__wire", "__compressed")
      val classified = new Classifier(cands).classify(df)

      val types = classified.tagged
        .select(col("__evt_idx"), col("log_schema_type"))
        .collect().flatMap(r => Option(r.getString(1)).map(r.getInt(0) -> _))
        .toMap

      val pubEvents = evs.filter(_._1.publisherTests.nonEmpty).map(_._2).toSet
      val fired = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      val pubs = scala.collection.mutable.Map.empty[(Int, String), String]
      cands.foreach { s =>
        if (engine.rulesForLogType(s.name).nonEmpty) {
          val typed = classified.forType(s.name)
          val normConfig = normalization.getOrElse(s.name, Map.empty)
          val withNorm = typed.withColumn(Normalizer.NormalizationKey,
            Normalizer.normalizationCol(col("record"), normConfig, Some(s.schema)))
          val annotated = threatIntel.fold(withNorm)(
            _.annotate(withNorm, recordId = "__evt_idx"))
          val alerts = engine.evaluate(annotated, s.name, ctx = ctx,
            passthrough = Seq("__evt_idx"))
          fired ++= alerts.select(col("__evt_idx"), col("rule_name"))
            .collect().map(r => r.getInt(0) -> r.getString(1))

          // the publisher leg: re-publish each tested event's fired alert
          // through the chain the RULE declares for that output, resolved
          // by the engine's assignment pass (handler.py publisher tests)
          evs.collect { case (e, i) if pubEvents(i) =>
            e.publisherTests.keys.foreach { output =>
              val rule = rules.find(r => e.triggerRules.contains(r.name))
                .getOrElse(throw new NoSuchElementException(
                  s"publisher_tests event has no ported trigger rule"))
              val chain = RulesEngine.configurePublishers(rule, rule.opts.outputs)
                .getOrElse(output, throw new NoSuchElementException(
                  s"rule ${rule.name} declares no publishers for $output"))
              val one = alerts
                .filter(col("__evt_idx") === i &&
                  col("rule_name").isin(e.triggerRules.toSeq: _*))
                .drop("__evt_idx")
              val rows = graft.alerts.Publishers.publish(one, chain)
                .select(col(graft.alerts.Publishers.PublicationCol))
                .collect()
              rows.headOption.foreach(r => pubs((i, output)) = r.getString(0))
            }
          }
        }
      }
      (types, fired.toSeq, pubs.toMap)
    }

    val types: Map[Int, String] = perGroup.flatMap(_._1).toMap
    val triggered: Map[Int, Set[String]] = perGroup.flatMap(_._2)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val publications: Map[(Int, String), String] =
      perGroup.flatMap(_._3).toMap

    events.zipWithIndex.map { case (e, i) =>
      val cls = types.get(i)
      val fired = triggered.getOrElse(i, Set.empty)
      val pubsForEvent = e.publisherTests.keys.flatMap(out =>
        publications.get((i, out)).map(out -> _)).toMap
      val pubFailures = e.publisherTests.toSeq.flatMap { case (out, asserts) =>
        pubsForEvent.get(out) match {
          case None => Seq(s"$out: no publication produced (rule did not fire?)")
          case Some(json) =>
            val root = mapper.readTree(json)
            asserts.flatMap(a => JmesPathLite.check(root, a).map(f => s"$out: $f"))
        }
      }
      val passed =
        if (e.classifyOnly) cls.contains(e.log)
        else cls.contains(e.log) && fired == e.triggerRules && pubFailures.isEmpty
      RuleTestResult(e, cls, fired, passed, pubsForEvent, pubFailures)
    }
  }

  /** Rules lacking any test event (handler.py:294-302). */
  def untestedRules(events: Seq[RuleTestEvent]): Seq[String] = {
    val covered = events.flatMap(_.triggerRules).toSet
    rules.map(_.name).filterNot(covered)
  }
}
