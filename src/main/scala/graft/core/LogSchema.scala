package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

/** Which parser a log type uses — reference `conf/schemas JSON files` `parser` key
  * (json/csv/kv/syslog; streamalert/classifier/parsers.py JSONParser:516,
  * CSVParser:625, KVParser:748, SyslogParser:815). */
sealed trait ParserKind
object ParserKind {
  case object Json extends ParserKind
  case object Csv extends ParserKind
  case object Kv extends ParserKind
  case object Syslog extends ParserKind
  def fromString(s: String): ParserKind = s match {
    case "json" => Json
    case "csv" => Csv
    case "kv" => Kv
    case "syslog" => Syslog
    case other => throw new IllegalArgumentException(s"unknown parser: $other")
  }
}

/** One declared log type: `source:subtype` name + schema + parser options.
  *
  * Mirrors the reference's schema conf surface
  * (conf/schemas/cloudwatch.json:1-55; option plumbing
  * streamalert/classifier/parsers.py:92-122):
  *   - optionalTopLevelKeys — parsers.py:105-107, back-filled with zero values
  *   - logPatterns — fnmatch globs, ALL fields must match, ANY pattern per
  *     field (parsers.py:173-221)
  *   - jsonPath — JMESPath record explosion, subset `a.b[].c` (parsers.py:429-448)
  *   - embeddedJson — JSON string inside extracted field (parsers.py:546-563)
  *   - jsonRegexKey — regex-extract a JSON blob from a string field (parsers.py:565-593)
  *   - envelope — selected top-level keys of the original payload lifted into
  *     each child record (parsers.py:410-427,480-491)
  */
final case class LogSchema(
    name: String,
    parser: ParserKind,
    schema: FieldType.TStruct,
    optionalTopLevelKeys: Set[String] = Set.empty,
    logPatterns: Map[String, Seq[String]] = Map.empty, // field path (dot-joined) -> glob patterns
    jsonPath: Option[String] = None,
    embeddedJson: Boolean = false,
    jsonRegexKey: Option[String] = None,
    envelope: Option[FieldType.TStruct] = None,
    optionalEnvelopeKeys: Set[String] = Set.empty,
    csvDelimiter: String = ",",
    csvQuote: String = "\"",
    csvEscape: Option[String] = None,
    kvDelimiter: String = " ",
    kvSeparator: String = "=",
    normalization: Map[String, Seq[NormalizedField]] = Map.empty) {

  require(optionalTopLevelKeys.subsetOf(schema.keys),
    s"optional keys not in schema for $name") // parsers.py:380-391 _validate_schema

  /** Envelope column name — parsers.py:64 ENVELOPE_KEY ('streamalert:envelope_keys');
    * ':' is hostile to parquet/SQL so we use the sanitized form throughout. */
  def envelopeColumn: String = LogSchema.EnvelopeKey
}

/** One normalization extraction: v2 config embedded in the schema conf
  * (streamalert/shared/normalize.py:371-426). `path` walks the record;
  * `condition` optionally gates extraction (normalize.py:279-318). */
final case class NormalizedField(
    path: Seq[String],
    function: Option[String] = None,
    condition: Option[NormCondition] = None,
    sendToArtifacts: Boolean = true)

/** Conditions: is / is_not / in / not_in / contains / not_contains
  * (normalize.py:279-318; lowercased compare per :297). */
final case class NormCondition(path: Seq[String], op: String, operand: Seq[String])

object LogSchema {
  val EnvelopeKey = "streamalert_envelope_keys"

  private val mapper = new ObjectMapper()

  /** Load the reference's conf/schemas JSON files format:
    * { "type:name": {"schema": {...}, "parser": "json", "configuration": {...}}, ... } */
  def loadConfJson(json: String): Seq[LogSchema] = {
    val root = mapper.readTree(json)
    root.properties().asScala.map { e => fromConfNode(e.getKey, e.getValue) }.toSeq
  }

  def fromConfNode(name: String, node: JsonNode): LogSchema = {
    val schema = FieldType.fromConf(node.get("schema")) match {
      case s: FieldType.TStruct => s
      case _ => throw new IllegalArgumentException(s"schema of $name must be an object")
    }
    val parser = ParserKind.fromString(node.get("parser").asText)
    val conf = Option(node.get("configuration"))

    def confStr(key: String): Option[String] =
      conf.flatMap(c => Option(c.get(key))).map(_.asText)
    def confStrSet(key: String): Set[String] =
      conf.flatMap(c => Option(c.get(key))).map(_.elements().asScala.map(_.asText).toSet)
        .getOrElse(Set.empty)

    val logPatterns: Map[String, Seq[String]] =
      conf.flatMap(c => Option(c.get("log_patterns"))).map { lp =>
        // flatten nested pattern dicts to dot-joined field paths
        def walk(prefix: Seq[String], n: JsonNode): Seq[(String, Seq[String])] =
          n.properties().asScala.toSeq.flatMap { e =>
            val p = prefix :+ e.getKey
            val v = e.getValue
            if (v.isObject) walk(p, v)
            else if (v.isArray) Seq(p.mkString(".") -> v.elements().asScala.map(_.asText).toSeq)
            else Seq(p.mkString(".") -> Seq(v.asText))
          }
        walk(Nil, lp).toMap
      }.getOrElse(Map.empty)

    // v2 normalization embedded in the schema conf (normalize.py:371-426):
    // per type either a bare path array ["a","b"] or a list of
    // {path, function, condition?, send_to_artifacts?} param objects
    val normalization: Map[String, Seq[NormalizedField]] =
      conf.flatMap(c => Option(c.get("normalization"))).map { n =>
        def parseCondition(cn: JsonNode): NormCondition = {
          val path = cn.get("path").elements().asScala.map(_.asText).toSeq
          val (op, operandNode) = cn.properties().asScala
            .find(_.getKey != "path")
            .map(e => e.getKey -> e.getValue)
            .getOrElse(throw new IllegalArgumentException("condition without operator"))
          val operand =
            if (operandNode.isArray) operandNode.elements().asScala.map(_.asText).toSeq
            else Seq(operandNode.asText)
          NormCondition(path, op, operand)
        }
        n.properties().asScala.map { e =>
          val v = e.getValue
          val fields: Seq[NormalizedField] =
            if (v.isArray && v.elements().asScala.forall(_.isTextual))
              Seq(NormalizedField(path = v.elements().asScala.map(_.asText).toSeq))
            else v.elements().asScala.map { p =>
              NormalizedField(
                path = p.get("path").elements().asScala.map(_.asText).toSeq,
                function = Option(p.get("function")).map(_.asText),
                condition = Option(p.get("condition")).map(parseCondition),
                sendToArtifacts = Option(p.get("send_to_artifacts")).forall(_.asBoolean))
            }.toSeq
          e.getKey -> fields
        }.toMap
      }.getOrElse(Map.empty)

    val envelope = conf.flatMap(c => Option(c.get("envelope_keys"))).map { ek =>
      FieldType.fromConf(ek) match {
        case s: FieldType.TStruct => s
        case _ => throw new IllegalArgumentException("envelope_keys must be an object")
      }
    }

    LogSchema(
      name = name,
      parser = parser,
      schema = schema,
      optionalTopLevelKeys = confStrSet("optional_top_level_keys"),
      logPatterns = logPatterns,
      jsonPath = confStr("json_path"),
      embeddedJson = conf.flatMap(c => Option(c.get("embedded_json"))).exists(_.asBoolean),
      jsonRegexKey = confStr("json_regex_key"),
      envelope = envelope,
      optionalEnvelopeKeys = confStrSet("optional_envelope_keys"),
      csvDelimiter = confStr("delimiter").getOrElse(","),
      csvQuote = confStr("quotechar").getOrElse("\""),
      csvEscape = confStr("escapechar"),
      kvDelimiter = if (parser == ParserKind.Kv) confStr("delimiter").getOrElse(" ") else " ",
      kvSeparator = confStr("separator").getOrElse("="),
      normalization = normalization)
  }

  /** Load the v1 normalization conf (`conf/normalized_types.json`): keyed by
    * log SOURCE (the part before ':'), normalized_type -> list of original
    * key NAMES. The v1 engine deep-searched those key names anywhere in each
    * record at runtime (the format predates v2's explicit paths). */
  def loadNormalizedTypesJson(json: String): Map[String, Map[String, Seq[String]]] = {
    val root = mapper.readTree(json)
    root.properties().asScala.map { src =>
      src.getKey -> src.getValue.properties().asScala.map { t =>
        t.getKey -> t.getValue.elements().asScala.map(_.asText).toSeq
      }.toMap
    }.toMap
  }

  /** Merge v1 normalization into a loaded schema set (the reference loads
    * both formats and unions them per log type). Each v1 original-key NAME
    * is resolved against the declared schema at LOAD time — a pre-order
    * search over the TStruct, the typed analogue of the v1 runtime deep
    * search — yielding one NormalizedField per site where the key exists. A
    * normalized type already defined by v2 keeps its v2 definition; v1 keys
    * absent from a log type's schema contribute nothing there. */
  def mergeV1Normalization(schemas: Seq[LogSchema],
      v1: Map[String, Map[String, Seq[String]]]): Seq[LogSchema] =
    schemas.map { s =>
      v1.get(s.name.split(':').head) match {
        case None => s
        case Some(types) =>
          def findPaths(st: FieldType.TStruct, prefix: Seq[String],
              key: String): Seq[Seq[String]] =
            st.fields.toSeq.flatMap { case (n, ft) =>
              val self = if (n == key) Seq(prefix :+ n) else Seq.empty
              val nested = ft match {
                case inner: FieldType.TStruct => findPaths(inner, prefix :+ n, key)
                case _ => Seq.empty
              }
              self ++ nested
            }
          val fromV1 = types.flatMap { case (normType, keys) =>
            if (s.normalization.contains(normType)) None // v2 wins
            else {
              val fields = keys.flatMap(k => findPaths(s.schema, Nil, k))
                .map(p => NormalizedField(path = p))
              if (fields.isEmpty) None else Some(normType -> fields)
            }
          }
          s.copy(normalization = s.normalization ++ fromV1)
      }
    }
}
