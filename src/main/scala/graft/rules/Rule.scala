package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The rule-author surface — Scala analogue of the reference's `@rule`
  * decorator kwargs (streamalert/shared/rule.py:53-80: logs, datatypes,
  * matchers, merge_by_keys, merge_window_mins, outputs, dynamic_outputs,
  * publishers, req_subkeys).
  *
  * Dual-path design (SURVEY §7.5): the primary path is a `Column`-building
  * predicate, compiled into Catalyst so rule evaluation stays inside
  * whole-stage codegen and benefits from predicate pushdown; an opaque
  * Scala-function fallback (`RowRule`) exists for rules that genuinely need
  * imperative logic — it costs an Encoder round-trip, mirroring the
  * reference's try/except→False contract (rule.py:142-164).
  */
final case class RuleOpts(
    logs: Seq[String] = Nil,
    datatypes: Seq[String] = Nil,
    matchers: Seq[String] = Nil,
    reqSubkeys: Map[String, Seq[String]] = Map.empty,
    outputs: Seq[String] = Nil,
    dynamicOutputs: Option[Column => Column] = None, // record struct -> array<string>
    mergeByKeys: Seq[String] = Nil,
    mergeWindowMins: Int = 0,
    /** the blanket string/list publisher form (rules_engine.py:371-377):
      * these apply to every requested output */
    publishers: Seq[String] = Nil,
    /** the dict publisher form (rules_engine.py:378-403): keys are either a
      * service (`slack`) or an exact output (`slack:channel`); resolution
      * loads the service key's chain first, then appends the exact output
      * key's — see [[RulesEngine.configurePublishers]] */
    publishersByOutput: Map[String, Seq[String]] = Map.empty,
    description: String = "No rule description provided",
    /** static per-rule context dict (rule.py:70-76) — lands on the alert as
      * a map column, so downstream publishers/outputs read it exactly like
      * the reference's alert.context (e.g. remove_fields/populate_fields
      * configuration) */
    context: Map[String, String] = Map.empty) {
  require(logs.nonEmpty || datatypes.nonEmpty,
    "rule must have either 'logs' or 'datatypes' declared") // rule.py:86-90
}

final case class Rule(
    name: String,
    opts: RuleOpts,
    /** record-struct column => boolean column */
    predicate: Column => Column)

/** Named reusable predicates ANDed before the rule body
  * (shared/rule.py:92-122; library matchers/default.py:19-89). */
final class MatcherRegistry {
  private val m = scala.collection.mutable.LinkedHashMap[String, Column => Column]()
  def register(name: String)(fn: Column => Column): Unit = m(name) = fn
  def apply(name: String): Column => Column =
    m.getOrElse(name, throw new NoSuchElementException(s"unknown matcher: $name"))
  def contains(name: String): Boolean = m.contains(name)
}
