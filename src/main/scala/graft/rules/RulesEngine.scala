package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Static alert metadata attached at construction
  * (rules_engine/rules_engine.py:183-217: cluster, log source/type, source
  * entity/service). In a deployed pipeline these come from the stream
  * metadata columns; literals here. */
final case class AlertContext(
    cluster: String = "local",
    sourceService: String = "graft",
    sourceEntity: String = "stream")

/** Rule evaluation + alert construction — the "WHERE clause" surface
  * (SURVEY §2.3) re-expressed as ONE narrow Catalyst pass per log type.
  *
  * The reference loops rules-per-record in Python
  * (rules_engine/rules_engine.py:484-501). Here all applicable rules are
  * evaluated in a single projection building `array(CASE WHEN pred_i THEN
  * 'rule_i')`; a record firing k rules explodes into k alerts. Guards run in
  * the reference's order (req_subkeys → matchers → rule body,
  * rules_engine.py:490-497) via && short-circuit. No shuffle; predicate
  * pushdown and codegen come free. At 100 TB this is scan-side map work that
  * scales linearly with executors.
  */
final class RulesEngine(
    rules: Seq[Rule],
    matchers: MatcherRegistry = new MatcherRegistry,
    requiredOutputs: Seq[String] = Seq("aws-firehose:alerts"), // rules_engine.py:364-365
    deterministicIds: Boolean = false,
    clock: Option[java.sql.Timestamp] = None) {

  /** Every rule's resolved per-output publisher chains over its requested
    * outputs (the assignment the reference stores on each alert,
    * rules_engine.py:326-338) — what the dispatch fan-out consults. */
  def publisherAssignments: Map[String, Map[String, Seq[String]]] =
    rules.map(r => r.name -> RulesEngine.configurePublishers(r, r.opts.outputs))
      .filter(_._2.exists(_._2.nonEmpty)).toMap

  /** rules_for_log_type (shared/rule.py:231-234): rules whose `logs` list
    * contains the type, or datatype-driven rules with no `logs`. */
  def rulesForLogType(logType: String): Seq[Rule] =
    rules.filter(r =>
      r.opts.logs.contains(logType) || (r.opts.logs.isEmpty && r.opts.datatypes.nonEmpty))

  /** req_subkeys (rules_engine.py:135-170) → null-safety conjunction;
    * matchers (rule.py:92-122) → ANDed shared predicates; then rule body. */
  def fullPredicate(r: Rule, record: Column): Column = {
    val subkeys = r.opts.reqSubkeys.toSeq.flatMap { case (key, subs) =>
      subs.map(sub => record.getField(key).getField(sub).isNotNull)
    }.reduceOption(_ && _).getOrElse(lit(true))
    val matched = r.opts.matchers.map(m => matchers(m)(record))
      .reduceOption(_ && _).getOrElse(lit(true))
    subkeys && matched && r.predicate(record)
  }

  private def perRule(fired: Column, pairs: Seq[(String, Column)], default: Column): Column =
    pairs.foldRight(default) { case ((name, c), acc) => when(fired === name, c).otherwise(acc) }

  /** Evaluate all applicable rules over a classified typed stream
    * (columns: `record` struct + passthrough metadata) and construct alerts
    * (shared/alert.py:37-109 field surface). */
  def evaluate(typed: DataFrame, logType: String, ctx: AlertContext = AlertContext(),
      passthrough: Seq[String] = Nil): DataFrame = {
    val applicable = rulesForLogType(logType)
    if (applicable.isEmpty) return typed.sparkSession.emptyDataFrame

    val rec = col("record")
    val firedArr = array_compact(array(
      applicable.map(r => when(fullPredicate(r, rec), lit(r.name))): _*))

    val fired = typed
      .withColumn("__fired", firedArr)
      .where(size(col("__fired")) > 0)
      .withColumn("rule_name", explode(col("__fired")))
      .drop("__fired")

    // Per-rule static metadata via CASE chains on rule_name.
    val ruleOutputs = perRule(col("rule_name"),
      applicable.map(r => r.name -> array(r.opts.outputs.map(lit): _*)),
      array().cast("array<string>"))
    val dynOutputs = perRule(col("rule_name"),
      applicable.map(r => r.name ->
        r.opts.dynamicOutputs.map(f => f(rec)).getOrElse(array().cast("array<string>"))),
      array().cast("array<string>"))
    // Output union + `service:descriptor` validation (rules_engine.py:219-243,310-338)
    val outputs = array_sort(array_distinct(filter(
      concat(array(requiredOutputs.map(lit): _*), ruleOutputs, dynOutputs),
      o => o.contains(":"))))

    // Merge-key VALUES, extracted column-side from the typed record struct —
    // paths are plan-time literals per rule, so the merger's groupBy key
    // needs no JSON parse at all (the old path Jackson-parsed record_json
    // once per record just to group). Semantics mirror
    // MergeRecord.valueAtPath over to_json(record): string fields verbatim,
    // scalars as their JSON text, nested containers as JSON, absent paths /
    // null values (which to_json omits) -> '(n/a)'.
    val recType = typed.schema("record").dataType.asInstanceOf[StructType]
    def typedPathValue(path: String): Option[Column] = {
      val parts = path.split('.').toSeq
      def resolve(dt: DataType, ps: Seq[String]): Option[DataType] = ps match {
        case Seq() => Some(dt)
        case p +: rest => dt match {
          case st: StructType if st.fieldNames.contains(p) => resolve(st(p).dataType, rest)
          // open-map ({} / TAnyMap) fields: getField navigates map keys too,
          // the value type is the map's declared value type
          case mt: MapType => resolve(mt.valueType, rest)
          case _ => None
        }
      }
      resolve(recType, parts).map { dt =>
        val c = parts.foldLeft(rec)((acc, p) => acc.getField(p))
        val str = dt match {
          case StringType => c
          case _: StructType | _: MapType | _: ArrayType => to_json(c)
          case TimestampType => date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
          case _ => c.cast(StringType)
        }
        coalesce(str, lit("(n/a)"))
      }
    }
    val mergeKeyVals = perRule(col("rule_name"),
      applicable.map { r =>
        val resolved = r.opts.mergeByKeys.map(typedPathValue)
        r.name -> (
          if (r.opts.mergeByKeys.isEmpty) lit("")
          // any statically-unresolvable path (e.g. through an array) →
          // NULL, so the merger's groupKey falls back to the Jackson walk
          // over record_json rather than grouping everything under a
          // sentinel value
          else if (resolved.exists(_.isEmpty)) lit(null).cast(StringType)
          else concat_ws("|", resolved.flatten: _*))
      },
      lit(""))

    val createdCol = clock.map(ts => lit(ts).cast(TimestampType))
      .getOrElse(current_timestamp())
    val idCol =
      if (deterministicIds) md5(concat_ws(":", col("rule_name"), to_json(rec)))
      else expr("uuid()")

    val alertCols = Seq(
      idCol.as("alert_id"),
      col("rule_name"),
      createdCol.as("created"),
      lit(ctx.cluster).as("cluster"),
      lit(logType).as("log_type"),
      lit(ctx.sourceService).as("source_service"),
      lit(ctx.sourceEntity).as("source_entity"),
      outputs.as("outputs"),
      perRule(col("rule_name"),
        applicable.map(r => r.name -> lit(r.opts.mergeByKeys.mkString(","))),
        lit("")).as("merge_by_keys"),
      perRule(col("rule_name"),
        applicable.map(r => r.name -> lit(r.opts.mergeWindowMins)),
        lit(0)).as("merge_window_mins"),
      mergeKeyVals.as("merge_key_vals"),
      perRule(col("rule_name"),
        applicable.map(r => r.name -> lit(r.opts.publishers.mkString(","))),
        lit("")).as("publishers"),
      perRule(col("rule_name"),
        applicable.map(r => r.name -> lit(r.opts.description)),
        lit("")).as("rule_description"),
      perRule(col("rule_name"),
        applicable.map(r => r.name -> (
          if (r.opts.context.isEmpty) map().cast("map<string,string>")
          else map(r.opts.context.toSeq.flatMap {
            case (k, v) => Seq(lit(k), lit(v)) }: _*))),
        map().cast("map<string,string>")).as("context"),
      rec.as("record"))
    fired.select(alertCols ++ passthrough.map(col): _*)
  }
}

object RulesEngine {

  /** _configure_publishers (rules_engine.py:341-408): resolve a rule's
    * publisher declaration to a per-output chain.
    *
    *   - the blanket string/list form applies to every requested output;
    *   - the dict form loads the SERVICE key's chain first, then appends
    *     the exact output+descriptor key's chain;
    *   - `aws-firehose:alerts` is deliberately excluded (required outputs
    *     never have their alerts transformed);
    *   - names missing from the publisher registry drop with a warning
    *     (standardize_publisher_name, :443-446). */
  def configurePublishers(rule: Rule,
      requestedOutputs: Seq[String]): Map[String, Seq[String]] = {
    val opts = rule.opts
    if (opts.publishers.isEmpty && opts.publishersByOutput.isEmpty) Map.empty
    else requestedOutputs.filterNot(_ == "aws-firehose:alerts").map { out =>
      val requested =
        if (opts.publishersByOutput.nonEmpty) {
          val service = out.split(':').head
          opts.publishersByOutput.getOrElse(service, Nil) ++
            opts.publishersByOutput.getOrElse(out, Nil)
        } else opts.publishers
      val (known, unknown) =
        requested.partition(graft.alerts.Publishers.isRegistered)
      unknown.foreach(n => System.err.println(
        s"[graft] rule ${rule.name}: requested publisher ($n) is not registered"))
      out -> known
    }.toMap
  }
}
