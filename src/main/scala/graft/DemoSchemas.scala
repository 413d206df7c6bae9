package graft

import graft.core._
import graft.core.FieldType._

/** Log-type declarations used by the operator-coverage queries: the same
  * shapes the reference ships in conf/schemas (cloudwatch.json, carbonblack
  * csv/kv examples, syslog), instantiated over the TESTDATA.md tables so the
  * DuckDB oracle can reproduce expected output with plain SQL. */
object DemoSchemas {

  /** JSON events: mirrors a typical `source:subtype` JSON schema with mixed
    * scalar types (conf/schemas layout; parsers.py JSONParser). */
  val jsonEvents: LogSchema = LogSchema(
    name = "demo:json_events",
    parser = ParserKind.Json,
    schema = TStruct.of(
      "event_id" -> TInteger, "event_type" -> TString,
      "value" -> TFloat, "props" -> TString))

  /** JSON with json_path explosion + envelope keys — the CloudTrail
    * `Records[]` shape (conf/schemas/cloudtrail.json; parsers.py:429-448). */
  val jsonNested: LogSchema = LogSchema(
    name = "demo:json_nested",
    parser = ParserKind.Json,
    schema = TStruct.of("n" -> TInteger, "v" -> TFloat),
    jsonPath = Some("Records[]"),
    envelope = Some(TStruct.of("event_id" -> TInteger)))

  /** JSON with optional keys that back-fill zero values (parsers.py:157-171). */
  val jsonOptional: LogSchema = LogSchema(
    name = "demo:json_optional",
    parser = ParserKind.Json,
    schema = TStruct.of(
      "event_id" -> TInteger, "opt_s" -> TString, "opt_i" -> TInteger),
    optionalTopLevelKeys = Set("opt_s", "opt_i"))

  /** JSON gated by log_patterns fnmatch globs (parsers.py:173-221). */
  val jsonPatterned: LogSchema = LogSchema(
    name = "demo:json_patterned",
    parser = ParserKind.Json,
    schema = TStruct.of("event_id" -> TInteger, "etype" -> TString),
    logPatterns = Map("etype" -> Seq("p*", "s*")))

  /** Positional CSV (parsers.py CSVParser:625-745). */
  val csvParts: LogSchema = LogSchema(
    name = "demo:csv_parts",
    parser = ParserKind.Csv,
    schema = TStruct.of("partkey" -> TInteger, "brand" -> TString, "psize" -> TInteger))

  /** KV pairs (parsers.py KVParser:748-812). */
  val kvEvents: LogSchema = LogSchema(
    name = "demo:kv_events",
    parser = ParserKind.Kv,
    schema = TStruct.of("uid" -> TInteger, "etype" -> TString, "eid" -> TInteger))

  /** Syslog fixed-regex format (parsers.py SyslogParser:815-844). */
  val syslog: LogSchema = LogSchema(
    name = "demo:syslog",
    parser = ParserKind.Syslog,
    schema = TStruct.of(
      "timestamp" -> TString, "host" -> TString,
      "application" -> TString, "message" -> TString))
}
