package graft.classify

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{FieldType, LogSchema, ParserKind}
import graft.functions.Glob

/** Compiles a [[LogSchema]] into pure Column pipelines.
  *
  * The reference parses row-at-a-time in Python
  * (streamalert/classifier/parsers.py:450-501 `parse()`); here every check —
  * strict key-set equality (parsers.py:256-272), type coercion
  * (parsers.py:294-369), log_patterns (parsers.py:173-221), JMESPath record
  * explosion (parsers.py:429-448) — is a Catalyst expression over the raw
  * string column, so classification stays inside whole-stage codegen with no
  * UDFs and no shuffle. Validity is decided WITHOUT materializing the parse:
  * `validCol` is usable as a predicate in a CASE/first-match chain, and the
  * typed record column is only computed for rows already routed to this type.
  */
final case class CompiledSchema(s: LogSchema) {

  private val required: Set[String] = s.schema.keys -- s.optionalTopLevelKeys

  /** All-string mirror of the declared schema: structure preserved, every
    * scalar leaf read as StringType so we control coercion (and its failure
    * semantics) ourselves, mirroring parsers.py:294-369. */
  private def stringified(t: FieldType): DataType = t match {
    case FieldType.TStruct(fs) =>
      StructType(fs.map { case (n, ft) => StructField(n, stringified(ft), nullable = true) }.toSeq)
    case FieldType.TList   => ArrayType(StringType, containsNull = true)
    case FieldType.TAnyMap => MapType(StringType, StringType, valueContainsNull = true)
    case _                 => StringType
  }

  private val rawStructType: StructType = stringified(s.schema).asInstanceOf[StructType]

  // -------------------------------------------------------------------------
  // JSON helpers
  // -------------------------------------------------------------------------

  private def jsonKeys(c: Column): Column = call_function("json_object_keys", c)

  /** Strict key-set check on a JSON object string (parsers.py:256-272):
    * record keys ∪ optionals == schema keys, i.e. keys ⊆ schema AND
    * required ⊆ keys. Nested struct fields are checked recursively
    * (parsers.py:274-284); `{}`-typed (TAnyMap) fields skip the check
    * (parsers.py:240-242). */
  private def jsonKeyCheck(json: Column, struct: FieldType.TStruct,
      optionals: Set[String], pathPrefix: String = "$"): Column = {
    val node = if (pathPrefix == "$") json else get_json_object(json, pathPrefix)
    val keys = jsonKeys(node)
    val schemaKeys = array(struct.fields.keys.toSeq.map(lit): _*)
    val req = (struct.keys -- optionals).toSeq
    val topOk = keys.isNotNull &&
      size(array_except(keys, schemaKeys)) === 0 &&
      (if (req.isEmpty) lit(true)
       else size(array_except(array(req.map(lit): _*), keys)) === 0)
    struct.fields.foldLeft(topOk) {
      case (acc, (name, nested: FieldType.TStruct)) =>
        val childJson = get_json_object(json, s"$pathPrefix.$name")
        val childOk = jsonKeyCheck(json, nested, Set.empty, s"$pathPrefix.$name")
        // absent optional nested struct: skip; present: strict recursive check
        if (optionals.contains(name)) acc && (childJson.isNull || childOk) else acc && childOk
      case (acc, _) => acc
    }
  }

  private def jsonKeyCheckAt(json: Column, struct: FieldType.TStruct, optionals: Set[String],
      path: String): Column =
    jsonKeyCheck(if (path == "$") json else get_json_object(json, path), struct, optionals)

  // -------------------------------------------------------------------------
  // Coercion (shared by all parsers): raw string struct -> typed struct
  // -------------------------------------------------------------------------

  /** (typedColumn, castFailed) for one field. Failure semantics mirror
    * parsers.py:294-369: int/float coercion failure invalidates the record;
    * boolean is `lower(v)=='true'`; falsey values are skipped (here: null). */
  private def coerceField(raw: Column, t: FieldType): (Column, Column) = t match {
    case FieldType.TString  => (raw, lit(false))
    case FieldType.TInteger =>
      val nonEmpty = raw.isNotNull && trim(raw) =!= ""
      val casted = raw.try_cast(LongType)
      (when(nonEmpty, casted), nonEmpty && casted.isNull)
    case FieldType.TFloat =>
      val nonEmpty = raw.isNotNull && trim(raw) =!= ""
      val casted = raw.try_cast(DoubleType)
      (when(nonEmpty, casted), nonEmpty && casted.isNull)
    case FieldType.TBoolean => (lower(raw) === "true", lit(false))
    case FieldType.TList    => (raw, lit(false))   // presence-checked only (parsers.py:357-363)
    case FieldType.TAnyMap  => (raw, lit(false))
    case st: FieldType.TStruct => coerceStruct(raw, st, Set.empty)
  }

  /** Build the typed struct from the all-string struct, collecting cast
    * failures; optional keys absent → zero-value default (parsers.py:157-171). */
  private def coerceStruct(raw: Column, st: FieldType.TStruct,
      optionals: Set[String]): (Column, Column) = {
    val parts = st.fields.toSeq.map { case (name, ft) =>
      val (typed, failed) = coerceField(raw.getField(name), ft)
      val withDefault =
        if (optionals.contains(name)) coalesce(typed, ft.zeroLiteral) else typed
      (name, withDefault, failed)
    }
    val structCol = struct(parts.map { case (n, c, _) => c.as(n) }: _*)
    val anyFailed = parts.map(_._3).reduceOption(_ || _).getOrElse(lit(false))
    (structCol, anyFailed)
  }

  /** Typed record from a JSON child string. */
  def jsonRecord(childJson: Column): Column = {
    val raw = from_json(childJson, rawStructType)
    coerceStruct(raw, s.schema, s.optionalTopLevelKeys)._1
  }

  private def jsonCastFailed(childJson: Column): Column = {
    val raw = from_json(childJson, rawStructType)
    coerceStruct(raw, s.schema, s.optionalTopLevelKeys)._2
  }

  // -------------------------------------------------------------------------
  // log_patterns (parsers.py:173-221): ALL fields must match, ANY pattern per
  // field; fnmatch globs compiled to anchored regexes at plan-build time.
  // -------------------------------------------------------------------------

  private def patternsOk(record: Column, envelope: Option[Column]): Column = {
    // a pattern field not declared in the schema can never be "in record" —
    // the reference logs + returns False (parsers.py:204-211); resolve that
    // at plan time instead of building an unresolvable getField
    def declared(parts: Seq[String], st: FieldType.TStruct): Boolean =
      parts match {
        case Seq(p) => st.fields.contains(p)
        case p +: rest => st.fields.get(p) match {
          case Some(inner: FieldType.TStruct) => declared(rest, inner)
          // open map: one level of runtime key lookup (deeper values are
          // raw JSON text, not navigable columns)
          case Some(FieldType.TAnyMap) => rest.size == 1
          case _ => false
        }
        case _ => false
      }
    if (s.logPatterns.isEmpty) lit(true)
    else s.logPatterns.map { case (fieldPath, patterns) =>
      val parts = fieldPath.split('.').toSeq
      val isEnvelope =
        parts.head == "streamalert:envelope_keys" || parts.head == LogSchema.EnvelopeKey
      if (!isEnvelope && !declared(parts, s.schema)) lit(false)
      else if (isEnvelope && !s.envelope.exists(e => declared(parts.tail, e)))
        lit(false)
      else {
        val target: Column =
          if (isEnvelope)
            parts.tail.foldLeft(envelope.getOrElse(lit(null)))((c, p) => c.getField(p))
          else parts.foldLeft(record)((c, p) => c.getField(p))
        val str = target.cast(StringType)
        patterns.map(p => str.rlike(Glob.toRegex(p))).reduce(_ || _)
      }
    }.reduce(_ && _)
  }

  // -------------------------------------------------------------------------
  // JMESPath subset (parsers.py:429-448): `a.b` nested access, `arr[]` /
  // `arr[*]` explosion, optional `.tail` projection after the explode.
  // -------------------------------------------------------------------------

  private case class JsonPathPlan(arrayPath: Option[String], tail: Option[String],
      scalarPath: Option[String])

  private val jsonPathPlan: Option[JsonPathPlan] = s.jsonPath.map { jp =>
    val norm = jp.replace("[*]", "[]")
    if (norm.contains("[]")) {
      val idx = norm.indexOf("[]")
      val arr = norm.substring(0, idx)
      val tail = norm.substring(idx + 2).stripPrefix(".")
      // bare "[*]" (e.g. trendmicro's conf): the payload ITSELF is the
      // array — "$" addresses the root
      JsonPathPlan(Some(if (arr.isEmpty) "$" else "$." + arr),
        if (tail.isEmpty) None else Some("$." + tail), None)
    } else JsonPathPlan(None, None, Some("$." + norm))
  }

  /** Array of child JSON strings extracted from the payload. from_json with
    * ArrayType(StringType) yields each element's raw JSON text. */
  def childrenArray(value: Column): Column = jsonPathPlan match {
    case None => array(value)
    case Some(JsonPathPlan(Some(arrPath), tail, _)) =>
      val arr = from_json(get_json_object(value, arrPath), ArrayType(StringType))
      val projected = tail match {
        case Some(t) => transform(arr, c => get_json_object(c, t))
        case None    => arr
      }
      coalesce(projected, array())
    case Some(JsonPathPlan(None, _, Some(p))) =>
      val one = get_json_object(value, p)
      when(one.isNotNull, array(one)).otherwise(array())
    case _ => array(value)
  }

  /** Validity of ONE child JSON string (key check + coercion + patterns). */
  def jsonChildValid(child: Column, envelope: Option[Column]): Column =
    // native one-pass validation (graft.functions.JsonSchemaValid) — inside
    // exists() lambdas the column formulation would re-parse per field check
    graft.functions.JsonSchemaValid.column(child, s.schema, s.optionalTopLevelKeys) &&
      patternsOk(jsonRecord(child), envelope)

  // -------------------------------------------------------------------------
  // Envelope (parsers.py:410-427,480-491): selected top-level keys of the
  // ORIGINAL payload, key-subset-checked, coerced, optional-filled.
  // -------------------------------------------------------------------------

  def envelopeOk(value: Column): Column = s.envelope match {
    case None => lit(true)
    case Some(env) =>
      val requiredEnv = (env.keys -- s.optionalEnvelopeKeys).toSeq
      val keys = jsonKeys(value)
      val present =
        if (requiredEnv.isEmpty) lit(true)
        else keys.isNotNull && size(array_except(array(requiredEnv.map(lit): _*), keys)) === 0
      val castOk = !envelopeStruct(value).map { case (_, failed) => failed }
        .getOrElse(lit(false))
      present && castOk
  }

  private def envelopeStruct(value: Column): Option[(Column, Column)] = s.envelope.map { env =>
    val parts = env.fields.toSeq.map { case (name, ft) =>
      val raw = get_json_object(value, s"$$.$name")
      val (typed, failed) = coerceField(raw, ft)
      val withDefault =
        if (s.optionalEnvelopeKeys.contains(name)) coalesce(typed, ft.zeroLiteral) else typed
      (name, withDefault, failed)
    }
    (struct(parts.map { case (n, c, _) => c.as(n) }: _*),
      parts.map(_._3).reduceOption(_ || _).getOrElse(lit(false)))
  }

  def envelopeColumn(value: Column): Column =
    envelopeStruct(value).map(_._1).getOrElse(lit(null).cast(StringType))

  // -------------------------------------------------------------------------
  // CSV (parsers.py:625-745)
  // -------------------------------------------------------------------------

  /** Sentinel-extended CSV schema: one extra trailing string column so that a
    * row with more tokens than the schema is detectable (the reference checks
    * exact column count, parsers.py:727-728). nullValue is remapped so empty
    * fields survive as "" and only MISSING fields are null. */
  private val csvOptions = Map(
    "sep" -> s.csvDelimiter, "quote" -> s.csvQuote,
    "nullValue" -> "\u0000") ++ s.csvEscape.map("escape" -> _)

  private val csvSentinel = "__graft_extra__"

  private def csvRawType: StructType = {
    val base = s.schema.fields.keys.toSeq.map(n => StructField(n, StringType, nullable = true))
    StructType(base :+ StructField(csvSentinel, StringType, nullable = true))
  }

  private def csvRaw(value: Column): Column =
    from_csv(value, csvRawType, csvOptions)

  def csvValid(value: Column): Column = {
    val raw = csvRaw(value)
    val lastField = s.schema.fields.keys.last
    val countOk = raw.getField(csvSentinel).isNull && raw.getField(lastField).isNotNull
    countOk && !csvCoerced(value)._2 && patternsOk(csvCoerced(value)._1, None)
  }

  private def csvCoerced(value: Column): (Column, Column) = {
    val raw = csvRaw(value)
    // nested dict schema in CSV = CSV-in-CSV cell (parsers.py:732-740)
    val parts = s.schema.fields.toSeq.map {
      case (name, nested: FieldType.TStruct) =>
        val cellType = StructType(nested.fields.keys.toSeq
          .map(n => StructField(n, StringType, nullable = true)))
        val cell = from_csv(raw.getField(name), cellType, csvOptions)
        val (typed, failed) = coerceStruct(cell, nested, Set.empty)
        (name, typed, failed || cell.isNull)
      case (name, ft) =>
        val (typed, failed) = coerceField(raw.getField(name), ft)
        (name, typed, failed)
    }
    (struct(parts.map { case (n, c, _) => c.as(n) }: _*),
      parts.map(_._3).reduceOption(_ || _).getOrElse(lit(false)))
  }

  def csvRecord(value: Column): Column = csvCoerced(value)._1

  // -------------------------------------------------------------------------
  // KV (parsers.py:748-812)
  // -------------------------------------------------------------------------

  private val kvNFields = "__graft_kv_nfields"
  private val kvBadField = "__graft_kv_badfield"

  /** Positional KV parse with the duplicate-key fallback
    * (parsers.py:786-812): split on the literal delimiter dropping empty
    * fields; each field's key is the text before the FIRST separator; a key
    * that an earlier field already produced is replaced by the schema key
    * at this field's POSITION; later fields overwrite earlier ones for the
    * same effective key (dict semantics). The schema width is known at plan
    * time, so the whole parse unrolls into codegen'd split/substring
    * expressions — no str_to_map (CodegenFallback) anywhere.
    *
    * Returns a struct: one resolved string per schema key (null = absent)
    * plus field-count / bad-field bookkeeping for the validity check. */
  private def kvRaw(value: Column): Column = {
    val n = s.schema.fields.size
    val schemaKeys = s.schema.fields.keys.toSeq
    val fields = filter(split(value, java.util.regex.Pattern.quote(s.kvDelimiter)),
      f => f =!= "")
    val field = (0 until n).map(i => try_element_at(fields, lit(i + 1)))
    val hasSep = (0 until n).map(i =>
      coalesce(field(i).contains(s.kvSeparator), lit(false)))
    val rawKey = (0 until n).map(i => substring_index(field(i), s.kvSeparator, 1))
    val vals = (0 until n).map { i =>
      field(i).substr(length(rawKey(i)) + (s.kvSeparator.length + 1), length(field(i)))
    }
    // effective key per position: duplicate of any earlier field's effective
    // key -> the schema key at this index (parsers.py:795-801)
    val effKey = scala.collection.mutable.ArrayBuffer[Column]()
    for (i <- 0 until n) {
      val dup = (0 until i).map(j => hasSep(j) && effKey(j) === rawKey(i))
        .reduceOption(_ || _).getOrElse(lit(false))
      effKey += when(dup, lit(schemaKeys(i))).otherwise(rawKey(i))
    }
    val resolved = schemaKeys.map { name =>
      coalesce(((n - 1) to 0 by -1).map(i =>
        when(hasSep(i) && effKey(i) === name, vals(i))): _*)
    }
    // a present field either lacks the separator (reference logs + skips,
    // leaving its schema key unfilled) or resolves outside the schema
    val badField = (0 until n).map(i =>
      field(i).isNotNull &&
        (!hasSep(i) || !effKey(i).isin(schemaKeys.map(k => k: Any): _*)))
      .reduceOption(_ || _).getOrElse(lit(false))
    struct((schemaKeys.zip(resolved).map { case (nm, c) => c.as(nm) } ++ Seq(
      size(fields).as(kvNFields),
      coalesce(badField, lit(false)).as(kvBadField))): _*)
  }

  private def kvValidFromRaw(raw: Column): Column = {
    val (typed, castFailed) = kvCoercedFromRawStruct(raw)
    // field count must equal schema size (parsers.py:791-793) and every
    // schema key must have resolved a value
    raw.getField(kvNFields) === s.schema.fields.size &&
      !raw.getField(kvBadField) &&
      s.schema.fields.keys.map(k => raw.getField(k).isNotNull)
        .reduceOption(_ && _).getOrElse(lit(true)) &&
      !castFailed && patternsOk(typed, None)
  }

  private def kvCoercedFromRawStruct(raw: Column): (Column, Column) = {
    val parts = s.schema.fields.toSeq.map { case (name, ft) =>
      val (typed, failed) = coerceField(raw.getField(name), ft)
      (name, typed, failed)
    }
    (struct(parts.map { case (n, c, _) => c.as(n) }: _*),
      parts.map(_._3).reduceOption(_ || _).getOrElse(lit(false)))
  }

  def kvValid(value: Column): Column = kvValidFromRaw(kvRaw(value))

  def kvRecord(value: Column): Column = kvCoercedFromRawStruct(kvRaw(value))._1

  // -------------------------------------------------------------------------
  // Syslog (parsers.py:815-844)
  // -------------------------------------------------------------------------

  private val syslogRegex =
    "^(\\w{3}\\s\\d{2}\\s(?:\\d{2}:?)+)\\s((?:\\w[-]*)+)\\s(\\w+)(?:\\[\\w+\\])*:\\s(.*)$"

  def syslogValid(value: Column): Column =
    value.rlike(syslogRegex) && patternsOk(syslogRecord(value), None)

  def syslogRecord(value: Column): Column = {
    val groups = Map("timestamp" -> 1, "host" -> 2, "application" -> 3, "message" -> 4)
    struct(s.schema.fields.keys.toSeq.map { n =>
      regexp_extract(value, syslogRegex, groups.getOrElse(n, 0)).as(n)
    }: _*)
  }

  // -------------------------------------------------------------------------
  // Split parse/validate surface — performance-critical path.
  //
  // from_json / from_csv / str_to_map are CodegenFallback expressions: any
  // operator containing them drops out of whole-stage codegen, and the
  // interpreted path re-evaluates EVERY occurrence. A validity predicate
  // that derives each field check from `from_json(value).field` therefore
  // re-parses the payload dozens of times per row. The split below performs
  // the expensive parse ONCE into a materialized column (CollapseProject
  // keeps non-cheap aliases with multiple consumers as projection
  // boundaries), and validity/record are cheap GetStructField trees over
  // that attribute. ~10× on the classify hot path at sf0.1.
  // -------------------------------------------------------------------------

  /** The single expensive parse for this schema, when separable from
    * validation (not possible for json_path / json_regex_key schemas whose
    * children only exist inside a lambda). */
  def rawParse(value: Column): Option[Column] = s.parser match {
    case ParserKind.Json if jsonPathPlan.isEmpty && s.jsonRegexKey.isEmpty =>
      Some(from_json(value, rawStructType))
    case ParserKind.Csv if s.jsonPath.isEmpty => Some(csvRaw(value))
    case ParserKind.Kv  => Some(kvRaw(value))
    case _ => None
  }

  /** Validity from the materialized raw parse (+ the original value for the
    * key-set check, which must see undeclared keys the struct dropped). */
  def validFromRaw(value: Column, raw: Column): Column = s.parser match {
    case ParserKind.Json =>
      val (typed, castFailed) = coerceStruct(raw, s.schema, s.optionalTopLevelKeys)
      val env = envelopeStruct(value).map(_._1)
      // Key-check strategy by schema shape: the Column formulation parses
      // the payload once per nested level (each get_json_object /
      // json_object_keys is an independent parse), so for nested schemas
      // the native one-pass JsonSchemaValid (which also subsumes the
      // coercion-failure check) is cheaper despite being interpreted; flat
      // schemas keep the fully codegen'd single json_object_keys path.
      val hasNestedStruct =
        s.schema.fields.values.exists(_.isInstanceOf[FieldType.TStruct])
      val structurallyValid =
        if (hasNestedStruct)
          graft.functions.JsonSchemaValid.column(value, s.schema, s.optionalTopLevelKeys)
        else jsonKeyCheck(value, s.schema, s.optionalTopLevelKeys) && !castFailed
      envelopeOk(value) && structurallyValid && patternsOk(typed, env)
    case ParserKind.Csv =>
      val (typed, castFailed) = csvCoercedFromRaw(raw)
      val lastField = s.schema.fields.keys.last
      raw.getField(csvSentinel).isNull && raw.getField(lastField).isNotNull &&
        !castFailed && patternsOk(typed, None)
    case ParserKind.Kv => kvValidFromRaw(raw)
    case ParserKind.Syslog => syslogValid(value)
  }

  /** Typed record from the materialized raw parse. */
  def recordFromRaw(raw: Column): Column = s.parser match {
    case ParserKind.Json => coerceStruct(raw, s.schema, s.optionalTopLevelKeys)._1
    case ParserKind.Csv  => csvCoercedFromRaw(raw)._1
    case ParserKind.Kv   => kvCoercedFromRawStruct(raw)._1
    case ParserKind.Syslog =>
      throw new IllegalStateException("syslog has no separable raw parse")
  }

  private def csvCoercedFromRaw(raw: Column): (Column, Column) = {
    val parts = s.schema.fields.toSeq.map {
      case (name, nested: FieldType.TStruct) =>
        val cellType = StructType(nested.fields.keys.toSeq
          .map(n => StructField(n, StringType, nullable = true)))
        val cell = from_csv(raw.getField(name), cellType, csvOptions)
        val (typed, failed) = coerceStruct(cell, nested, Set.empty)
        (name, typed, failed || cell.isNull)
      case (name, ft) =>
        val (typed, failed) = coerceField(raw.getField(name), ft)
        (name, typed, failed)
    }
    (struct(parts.map { case (n, c, _) => c.as(n) }: _*),
      parts.map(_._3).reduceOption(_ || _).getOrElse(lit(false)))
  }

  // -------------------------------------------------------------------------
  // Unified surface
  // -------------------------------------------------------------------------

  /** Classification predicate over the raw value column — usable inside a
    * first-match CASE chain (classifier.py:116-149 "first full success wins").
    * For exploding (json_path) schemas this is `exists(children, valid)`
    * without materializing the explode. */
  def validCol(value: Column): Column = s.parser match {
    case ParserKind.Json =>
      val env = envelopeStruct(value).map(_._1)
      envelopeOk(value) && exists(childrenArray(value), c => jsonChildValid(childJson(c), env))
    case ParserKind.Csv =>
      // CSV-within-JSON via json_path (parsers.py:676-683)
      if (s.jsonPath.isDefined) exists(childrenArray(value), c => csvValid(c))
      else csvValid(value)
    case ParserKind.Kv     => kvValid(value)
    case ParserKind.Syslog => syslogValid(value)
  }

  /** embedded_json / json_regex_key transform of one extracted child
    * (parsers.py:546-563, :565-593). */
  private def childJson(c: Column): Column = s.jsonRegexKey match {
    case Some(key) =>
      regexp_extract(get_json_object(c, s"$$.$key"), "(\\{.+[:,].+\\}|\\[.+[,:].+\\])", 1)
    case None => c // embedded_json children are already the extracted JSON strings
  }

  /** DataFrame-level materialization for rows already classified as this
    * type: explode children (json_path), attach typed `record` + envelope.
    * Invalid children within a valid payload are dropped here and counted
    * upstream via the dead-letter path (parsers.py:393-408). */
  def parseTyped(df: DataFrame, valueCol: String): DataFrame = {
    val value = col(valueCol)
    s.parser match {
      case ParserKind.Json =>
        val env = envelopeStruct(value).map(_._1)
        val withChild =
          if (jsonPathPlan.isEmpty && s.jsonRegexKey.isEmpty)
            df.withColumn("__child", value)
          else df
            // generators cannot nest inside expressions: explode into a
            // column first, then apply the regex-key/embedded transform
            .withColumn("__child0", explode(childrenArray(value)))
            .withColumn("__child", childJson(col("__child0")))
            .drop("__child0")
        withChild
          // parse once per child; record derives from the attribute
          .withColumn("__raw", from_json(col("__child"), rawStructType))
          .withColumn("record", recordFromRaw(col("__raw")))
          .where(jsonChildValid(col("__child"), env))
          .withColumn(LogSchema.EnvelopeKey, envelopeColumn(value))
          .drop("__child", "__raw")
      case ParserKind.Csv if s.jsonPath.isDefined =>
        df.withColumn("__child", explode(childrenArray(value)))
          .withColumn("record", csvRecord(col("__child")))
          .where(csvValid(col("__child")))
          .withColumn(LogSchema.EnvelopeKey, envelopeColumn(value))
          .drop("__child")
      case ParserKind.Csv =>
        df.withColumn("record", csvRecord(value))
          .withColumn(LogSchema.EnvelopeKey, lit(null).cast(StringType))
      case ParserKind.Kv =>
        df.withColumn("record", kvRecord(value))
          .withColumn(LogSchema.EnvelopeKey, lit(null).cast(StringType))
      case ParserKind.Syslog =>
        df.withColumn("record", syslogRecord(value))
          .withColumn(LogSchema.EnvelopeKey, lit(null).cast(StringType))
    }
  }
}
