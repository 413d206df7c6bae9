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
    /** `override_record` (event.py:51-58, 360-380): a SPARSE record whose
      * missing fields back-fill with the log schema's zero values. Resolved
      * against the schema by [[RuleTestHarness]] at run time. */
    overrideRecordJson: Option[String] = None)

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
        dataJson = Option(e.get("data")).map(mapper.writeValueAsString).orNull,
        triggerRules = Option(e.get("trigger_rules"))
          .map(_.elements().asScala.map(_.asText).toSet).getOrElse(Set.empty),
        classifyOnly = Option(e.get("classify_only")).exists(_.asBoolean),
        overrideRecordJson =
          Option(e.get("override_record")).map(mapper.writeValueAsString))
    }.toSeq
  }
}

final case class RuleTestResult(
    event: RuleTestEvent,
    classifiedAs: Option[String],
    triggered: Set[String],
    passed: Boolean) {
  def report: String = {
    val status = if (passed) "PASS" else "FAIL"
    s"$status  [${event.log}] ${event.description}: classified=${classifiedAs.getOrElse("-")}" +
      s" triggered=${triggered.toSeq.sorted.mkString(",")}" +
      s" expected=${event.triggerRules.toSeq.sorted.mkString(",")}"
  }
}

/** Runs test events through classify → normalize → rules in one batch job
  * (the reference runs classifier + rules engine in-process with AWS
  * patched; here there is nothing to patch — the pipeline IS local). */
final class RuleTestHarness(
    schemas: Seq[LogSchema],
    rules: Seq[Rule],
    matchers: MatcherRegistry = new MatcherRegistry,
    normalization: Map[String, Map[String, Seq[graft.core.NormalizedField]]] = Map.empty) {

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
    val df = events.zipWithIndex
      .map { case (e, i) => (i, effectiveData(e)) }.toDF("__evt_idx", "value")
    val classified = new Classifier(schemas).classify(df)

    val types: Map[Int, String] = classified.tagged
      .select(col("__evt_idx"), col("log_schema_type"))
      .collect().flatMap(r => Option(r.getString(1)).map(r.getInt(0) -> _)).toMap

    val triggered: Map[Int, Set[String]] = schemas.flatMap { s =>
      if (engine.rulesForLogType(s.name).isEmpty) Nil
      else {
        val typed = classified.forType(s.name)
        val normConfig = normalization.getOrElse(s.name, Map.empty)
        val withNorm = typed.withColumn(Normalizer.NormalizationKey,
          Normalizer.normalizationCol(col("record"), normConfig, Some(s.schema)))
        engine.evaluate(withNorm, s.name, passthrough = Seq("__evt_idx"))
          .select(col("__evt_idx"), col("rule_name"))
          .collect().map(r => r.getInt(0) -> r.getString(1))
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    events.zipWithIndex.map { case (e, i) =>
      val cls = types.get(i)
      val fired = triggered.getOrElse(i, Set.empty)
      val passed =
        if (e.classifyOnly) cls.contains(e.log)
        else cls.contains(e.log) && fired == e.triggerRules
      RuleTestResult(e, cls, fired, passed)
    }
  }

  /** Rules lacking any test event (handler.py:294-302). */
  def untestedRules(events: Seq[RuleTestEvent]): Seq[String] = {
    val covered = events.flatMap(_.triggerRules).toSet
    rules.map(_.name).filterNot(covered)
  }
}
