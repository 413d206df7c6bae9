package graft.alerts

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** The merged-record algebra (streamalert/shared/alert.py:271-433):
  *  - cleanRecord: drop merge keys at every nesting level (:271-287)
  *  - computeCommon: greatest common sub-dict across records (:289-336)
  *  - computeDiff: record minus common (:338-380)
  *
  * Runs over Jackson JsonNode so it works for ANY record schema — the record
  * enters as the JSON text of the typed struct. Used inside the merge
  * Aggregator/flatMapGroups; the per-group cardinality is capped at 50
  * (alert_merger/main.py:34) so per-call cost is bounded regardless of
  * stream size. */
object MergeRecord {
  private val mapper = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  def parse(json: String): JsonNode = mapper.readTree(json)
  def write(node: JsonNode): String = mapper.writeValueAsString(node)

  /** Remove ignored keys from every level (alert.py:271-287). */
  def cleanRecord(node: JsonNode, ignored: Set[String]): JsonNode = node match {
    case obj: ObjectNode =>
      val out = F.objectNode()
      obj.properties().asScala.foreach { e =>
        if (!ignored.contains(e.getKey)) {
          val v = e.getValue
          out.set[JsonNode](e.getKey, if (v.isObject) cleanRecord(v, ignored) else v)
        }
      }
      out
    case other => other
  }

  /** Greatest common subset of all records (alert.py:289-336). */
  def computeCommon(records: Seq[JsonNode]): JsonNode = {
    if (records.isEmpty) return F.objectNode()
    if (records.size == 1) return records.head
    val first = records.head
    if (!first.isObject) return F.objectNode()
    val others = records.tail
    val common = F.objectNode()
    first.properties().asScala.foreach { e =>
      val (key, value) = (e.getKey, e.getValue)
      if (others.forall(r => r.isObject && r.has(key))) {
        if (others.forall(r => r.get(key) == value)) {
          common.set[JsonNode](key, value)
        } else if (value.isObject && others.forall(_.get(key).isObject)) {
          val nested = computeCommon(records.map(_.get(key)))
          if (nested.size() > 0) common.set[JsonNode](key, nested)
        }
      }
    }
    common
  }

  /** Record subset not covered by common (alert.py:338-380). */
  def computeDiff(common: JsonNode, record: JsonNode): JsonNode = {
    if (common.size() == 0) return record
    if (!record.isObject) return record
    val diff = F.objectNode()
    record.properties().asScala.foreach { e =>
      val (key, value) = (e.getKey, e.getValue)
      if (!common.has(key)) diff.set[JsonNode](key, value)
      else if (common.get(key) != value) {
        if (value.isObject && common.get(key).isObject) {
          val inner = computeDiff(common.get(key), value)
          if (inner.size() > 0) diff.set[JsonNode](key, inner)
        } else diff.set[JsonNode](key, value)
      }
    }
    diff
  }

  /** First value at a dotted path, stringified; '(n/a)' when absent
    * (alert.py:409-411 MergedBy via get_first_key). */
  def valueAtPath(node: JsonNode, path: String, default: String = "(n/a)"): String = {
    val target = path.split('.').foldLeft(Option(node)) {
      case (Some(n), p) if n.isObject && n.has(p) => Some(n.get(p))
      case _ => None
    }
    target.map(t => if (t.isTextual) t.asText else write(t)).getOrElse(default)
  }
}
