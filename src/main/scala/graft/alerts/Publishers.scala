package graft.alerts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Publishers (SURVEY §2.4 A5; streamalert/shared/publisher.py:39-266 +
  * publishers/community/generic.py): ordered chain of alert→publication
  * transforms applied per output before dispatch.
  *
  * The reference passes `(alert, publication)` through each publisher and
  * deep-copies between stages (CompositePublisher). Here the publication is
  * a STRUCT COLUMN built from the alert row; each publisher is a DataFrame
  * transform that rewrites that column (bookkeeping columns — alert_id,
  * outputs — stay untouched for the dispatcher), the chain fuses into one
  * projection, and "copy" is free. `publish` serializes the final struct to
  * the `publication` JSON per alert.
  *
  * Library parity (generic.py):
  *   - default                           = full alert dict (publisher.py default)
  *   - strip_record / add_record / record_only (blank+add_record composite)
  *   - remove_internal_fields            (generic.py:38-46)
  *   - remove_streamalert_normalization  (generic.py:109-112)
  *   - enumerate_fields                  (generic.py:115-168): nested structs
  *     flatten to dotted keys sorted alphabetically; arrays/maps serialize as
  *     JSON (plan-time schemas cannot enumerate runtime indices)
  *   - populateFields(keys)              (generic.py:171-203): deep get_keys
  *     per key; always an array of hits (the reference unwraps singleton
  *     extractions — runtime arity, not expressible in a fixed column type)
  */
object Publishers {

  type Publisher = DataFrame => DataFrame

  val PublicationCol = "publication"

  private def onPub(f: Column => Column): Publisher =
    df => df.withColumn(PublicationCol, f(col(PublicationCol)))

  private val registry = scala.collection.mutable.LinkedHashMap[String, Publisher](
    "default" -> identity,
    "strip_record" -> onPub(_.dropFields("record")),
    "add_record" -> (df => df.withColumn(PublicationCol,
      col(PublicationCol).withField("record", col("record")))),
    // the practical blank-then-add_record composition (generic.py blank:32-34
    // exists to start a fresh dict; an empty struct column is untypable)
    "record_only" -> (df => df.withColumn(PublicationCol, struct(col("record")))),
    "remove_internal_fields" -> onPub(_.dropFields(
      "staged", "publishers", "outputs", "merge_by_keys", "merge_window_mins",
      "merge_key_vals")),
    "remove_streamalert_normalization" -> onPub(
      _.dropFields(graft.classify.Normalizer.NormalizationKey)),
    "enumerate_fields" -> (df => df.withColumn(PublicationCol,
      enumerateFields(col(PublicationCol),
        df.schema(PublicationCol).dataType.asInstanceOf[StructType]))))

  def register(name: String)(p: Publisher): Unit = registry(name) = p

  /** AlertPublisherRepository.has_publisher — the registration check the
    * assignment pass uses to drop unknown names with a warning. */
  def isRegistered(name: String): Boolean = registry.contains(name)

  def apply(name: String): Publisher =
    registry.getOrElse(name, throw new NoSuchElementException(s"unknown publisher: $name"))

  /** Compose an ordered chain (CompositePublisher, publisher.py:150-200). */
  def chain(names: Seq[String]): Publisher =
    names.map(apply).foldLeft(identity[DataFrame] _)(_ andThen _)

  /** Publication JSON per alert for a given output's chain. */
  def publish(alerts: DataFrame, names: Seq[String]): DataFrame = {
    val withPub = alerts.withColumn(PublicationCol,
      struct(alerts.columns.map(col): _*))
    val transformed = chain(if (names.isEmpty) Seq("default") else names)(withPub)
    transformed.withColumn(PublicationCol, to_json(col(PublicationCol)))
  }

  /** enumerate_fields (generic.py:115-168): collapse nested structs into a
    * single level with dotted-path keys, alphabetical. */
  private def enumerateFields(pub: Column, dt: StructType): Column = {
    def flat(c: Column, t: DataType, path: String): Seq[(String, Column)] = t match {
      case st: StructType => st.fields.toSeq.flatMap { f =>
        val p = if (path.isEmpty) f.name else s"$path.${f.name}"
        flat(c.getField(f.name), f.dataType, p)
      }
      case _: ArrayType | _: MapType => Seq(path -> to_json(c))
      case _ => Seq(path -> c)
    }
    val fields = flat(pub, dt, "").sortBy(_._1)
    struct(fields.map { case (p, c) => c.as(p) }: _*)
  }

  /** Scalar values of `"key":` occurrences inside a raw JSON text value —
    * the deep-search continuation across the typed boundary where a loose
    * sub-document (`{}` schema) keeps its nested values as compact
    * re-serialized JSON. Strings unescape through a one-element JSON-array
    * readback; container values (objects/arrays) are out of scope for the
    * regex and are skipped. */
  private def jsonTextScalarValues(raw: Column, key: String): Column = {
    val pat = java.util.regex.Pattern.quote("\"" + key + "\":") +
      "(\"(?:[^\"\\\\]|\\\\.)*\"|[^,}\\]{\\[]+)"
    transform(regexp_extract_all(coalesce(raw, lit("")), lit(pat), lit(1)),
      v => when(v.startsWith("\""),
        get_json_object(concat(lit("["), v, lit("]")), "$[0]")).otherwise(v))
  }

  /** One deep-search path for [[populateFields]]: the hit array, its value
    * type, and whether the path is statically single-valued (a struct field
    * or direct map lookup, vs. array elements / raw-JSON descent). */
  private def populatePaths(c: Column, dt: DataType,
      key: String): Seq[(Column, DataType, Boolean)] = dt match {
    case st: StructType =>
      val self = st.fields.filter(_.name == key).toSeq.map { f =>
        val v = c.getField(f.name)
        (when(v.isNotNull, array(v)).otherwise(array().cast(ArrayType(f.dataType))),
          f.dataType, true)
      }
      val nested = st.fields.toSeq.flatMap(f =>
        populatePaths(c.getField(f.name), f.dataType, key))
      self ++ nested
    case at: ArrayType =>
      val probe = populatePaths(element_at(c, 1), at.elementType, key)
      probe.indices.map { i =>
        val t = probe(i)._2
        (coalesce(flatten(transform(c, e =>
          populatePaths(e, at.elementType, key)(i)._1)),
          array().cast(ArrayType(t))), t, false)
      }
    case mt: MapType =>
      val direct = (when(map_contains_key(c, lit(key)),
        array(element_at(c, lit(key)))).otherwise(
        array().cast(ArrayType(mt.valueType))), mt.valueType, true)
      val descent = mt.valueType match {
        case StringType => Seq((
          coalesce(flatten(transform(map_values(c),
            v => jsonTextScalarValues(v, key))),
            array().cast(ArrayType(StringType))), StringType, false))
        case _ => Nil
      }
      direct +: descent
    case _ => Nil
  }

  /** populate_fields (generic.py:171-203): keep ONLY the requested keys,
    * each deep-searched through the publication — including scalar values
    * inside loose raw-JSON sub-documents, the typed equivalent of the
    * reference's whole-dict get_keys walk. Reference arity: exactly one
    * hit publishes the value itself, none publishes null (omitted from the
    * JSON where the reference renders `null`), several publish an array
    * (as a JSON text when the hit count is only known at run time). */
  def populateFields(keys: Seq[String]): Publisher = df => {
    val pubType = df.schema(PublicationCol).dataType
    val cols = keys.map { k =>
      val paths = populatePaths(col(PublicationCol), pubType, k)
      val c = paths match {
        case Seq() => lit(null).cast(StringType)
        case Seq((arr, _, true)) => element_at(arr, 1)
        case many =>
          val hits = concat(many.map { case (arr, t, _) =>
            transform(arr, v => pyStr(v, t)) }: _*)
          when(size(hits) === 1, element_at(hits, 1))
            .when(size(hits) > 1, to_json(hits))
      }
      c.as(k)
    }
    df.withColumn(PublicationCol, struct(cols: _*))
  }

  // ---------------------------------------------------------------------------
  // Real publication shapes (SURVEY §2.4 A5 / S9 practical gap): the slack
  // attachment layout and the pagerduty-v2 event, as pure column transforms.
  // The HTTP delivery stays a Dispatcher concern; these produce the exact
  // payload dicts the reference POSTs.
  // ---------------------------------------------------------------------------

  /** Python `str(value)` for a scalar column (what the reference's mrkdwn
    * renderer interpolates with '{}'.format): True/False for booleans,
    * None for null. */
  private def pyStr(c: Column, dt: DataType): Column = dt match {
    case BooleanType =>
      coalesce(when(c, lit("True")).otherwise(lit("False")), lit("None"))
    case _ => coalesce(c.cast(StringType), lit("None"))
  }

  /** slack.py:336-412 `_json_to_slack_mrkdwn`: render a value as indented
    * mrkdwn lines — dict keys sorted and bolded (`*key:*`), list items
    * `*[i]*` 1-based, nested non-empty containers on their own header line
    * with children one tab deeper, scalars inline. The recursion is over
    * the plan-time schema, so the whole rendering fuses into one
    * projection; maps (runtime keys) support scalar values. */
  private[graft] def slackMrkdwnLines(c: Column, dt: DataType, indent: Int): Column = {
    val pad = "\t" * indent
    dt match {
      case st: StructType =>
        val fieldLines = st.fields.sortBy(_.name).toSeq.map { f =>
          val child = c.getField(f.name)
          f.dataType match {
            case cst: StructType =>
              // a struct is a dict with plan-time keys: always truthy
              concat(array(lit(s"$pad*${f.name}:*")),
                slackMrkdwnLines(child, cst, indent + 1))
            case at: ArrayType =>
              when(size(child) > 0,
                concat(array(lit(s"$pad*${f.name}:*")),
                  slackMrkdwnLines(child, at, indent + 1)))
                .otherwise(array(lit(s"$pad*${f.name}:* []")))
            case mt: MapType =>
              when(size(child) > 0,
                concat(array(lit(s"$pad*${f.name}:*")),
                  slackMrkdwnLines(child, mt, indent + 1)))
                .otherwise(array(lit(s"$pad*${f.name}:* {}")))
            case t =>
              array(concat(lit(s"$pad*${f.name}:* "), pyStr(child, t)))
          }
        }
        concat(fieldLines: _*)
      case ArrayType(et, _) => et match {
        case est: StructType =>
          flatten(transform(c, (v, i) =>
            concat(array(concat(lit(s"$pad*["), (i + 1).cast(StringType), lit("]*"))),
              slackMrkdwnLines(v, est, indent + 1))))
        case innerAt: ArrayType =>
          flatten(transform(c, (v, i) =>
            when(size(v) > 0,
              concat(
                array(concat(lit(s"$pad*["), (i + 1).cast(StringType), lit("]*"))),
                slackMrkdwnLines(v, innerAt, indent + 1)))
              .otherwise(array(concat(
                lit(s"$pad*["), (i + 1).cast(StringType), lit("]* []"))))))
        case t =>
          transform(c, (v, i) =>
            concat(lit(s"$pad*["), (i + 1).cast(StringType), lit("]* "), pyStr(v, t)))
      }
      case MapType(_, vt, _) =>
        // runtime dict: sorted entries, scalar values inline
        transform(array_sort(map_entries(c)), e =>
          concat(lit(s"$pad*"), e.getField("key").cast(StringType), lit(":* "),
            pyStr(e.getField("value"), vt)))
      case t => array(pyStr(c, t))
    }
  }

  /** Python `html.escape` (quote=True), as the reference applies to the
    * joined mrkdwn before chunking (slack.py:81-82). `&` first. */
  private[graft] def htmlEscape(c: Column): Column = {
    val repl = Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
      "\"" -> "&quot;", "'" -> "&#x27;")
    repl.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to) }
  }

  /** `cgi.escape(s)` with the quote=False default the community slack
    * layout publishers use (slack_layout.py) — only & < > escape. */
  private[graft] def htmlEscapeNoQuote(c: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;").foldLeft(c) {
      case (acc, (from, to)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }

  /** slack.py:68-102 `_split_attachment_text`: chunk escaped text into
    * ≤`max`-char parts, splitting at the last newline in the first max+1
    * chars, else the last space, else hard at max (the reference then skips
    * one char — reproduced faithfully). Runs as ONE `aggregate` loop over
    * `maxParts` steps, so plan size is O(1) in the part cap. */
  private[graft] def slackSplitText(text: Column, max: Int, maxParts: Int): Column = {
    val zero = struct(
      array().cast(ArrayType(StringType)).as("parts"), text.as("rest"))
    val stepped = aggregate(
      sequence(lit(1), lit(maxParts)), zero, (st, _) => {
        val rest = st.getField("rest")
        val prefix = substring(rest, 1, max + 1)
        val revNl = locate("\n", reverse(prefix))
        val revSp = locate(" ", reverse(prefix))
        // 1-based position of the split char; max+1 = hard split
        val pos = coalesce(
          when(revNl > 0, length(prefix) - revNl + 1),
          when(revSp > 0, length(prefix) - revSp + 1),
          lit(max + 1))
        val fits = length(rest) <= max
        val part = when(fits, rest).otherwise(rest.substr(lit(1), pos - 1))
        val newRest = when(fits, lit("")).otherwise(
          rest.substr(pos + 1, length(rest)))
        struct(
          when(length(part) > 0, concat(st.getField("parts"), array(part)))
            .otherwise(st.getField("parts")).as("parts"),
          newRest.as("rest"))
      })
    stepped.getField("parts")
  }

  /** The slack default message (slack.py:297-333 `_format_message` +
    * :105-149 `_format_default_attachments`): header text, mrkdwn'd +
    * html-escaped record chunked into ≤4000-char attachments titled
    * `Record:` / `Record (Part i of N):`, rule description as the first
    * attachment's pretext, color #b22222, fallback = header. `maxParts`
    * bounds the chunk loop (the reference caps at MAX_ATTACHMENTS=20). */
  def slackDefaultMessage(maxParts: Int = 20): Publisher = df => {
    val recType = df.schema("record").dataType
    val header = concat(lit("*StreamAlert Rule Triggered: "),
      col("rule_name"), lit("*"))
    val escaped = htmlEscape(
      array_join(slackMrkdwnLines(col("record"), recType, 0), "\n"))
    val parts = slackSplitText(escaped, max = 4000, maxParts = maxParts)
    val n = size(parts)
    val attachments = transform(parts, (m, i) => struct(
      header.as("fallback"),
      lit("#b22222").as("color"),
      when(i === 0, concat(lit("*Rule Description:*\n"),
        col("rule_description"), lit("\n"))).otherwise(lit("")).as("pretext"),
      when(n === 1, lit("Record:")).otherwise(concat(
        lit("Record (Part "), (i + 1).cast(StringType),
        lit(" of "), n.cast(StringType), lit("):"))).as("title"),
      m.as("text"),
      array(lit("text"), lit("pretext")).as("mrkdwn_in")))
    df.withColumn(PublicationCol, struct(
      header.as("text"), lit(true).as("mrkdwn"), attachments.as("attachments")))
  }

  /** The pagerduty-v2 event (pagerduty.py:56-144 `events_v2_data`):
    * trigger action, descriptor-namespaced dedup_key, payload with
    * critical severity and description+record custom_details, StreamAlert
    * client fields. */
  def pagerDutyV2Event(routingKey: String, descriptor: String,
      withRecord: Boolean = true): Publisher = df => {
    val details =
      if (withRecord)
        struct(col("rule_description").as("description"), col("record").as("record"))
      else struct(col("rule_description").as("description"))
    df.withColumn(PublicationCol, struct(
      lit(routingKey).as("routing_key"),
      lit("trigger").as("event_action"),
      concat_ws(":", lit(descriptor), col("alert_id")).as("dedup_key"),
      struct(
        concat(lit("StreamAlert Rule Triggered - "), col("rule_name")).as("summary"),
        col("log_type").as("source"),
        lit("critical").as("severity"),
        details.as("custom_details"),
        lit(null).cast(StringType).as("component"),
        lit(null).cast(StringType).as("group"),
        lit(null).cast(StringType).as("class")).as("payload"),
      lit("StreamAlert").as("client"),
      lit(null).cast(StringType).as("client_url"),
      array().cast(ArrayType(StringType)).as("images"),
      array().cast(ArrayType(StringType)).as("links")))
  }

  /** Recursively sort struct fields by name — `json.dumps(...,
    * sort_keys=True)`'s key order, applied at plan time so `to_json`
    * renders it directly. */
  private def sortKeysDeep(c: Column, dt: DataType): Column = dt match {
    case st: StructType =>
      struct(st.fields.sortBy(_.name).toSeq.map(f =>
        sortKeysDeep(c.getField(f.name), f.dataType).as(f.name)): _*)
    case ArrayType(est: StructType, _) =>
      transform(c, v => sortKeysDeep(v, est))
    case _ => c
  }

  /** The jira issue `fields` payload (jira.py:224-233 `_create_issue` +
    * :305-312 presentation defaults): summary `StreamAlert <rule_name>`,
    * description = the publication as a `{code:JSON}` block with keys
    * sorted (`json.dumps(publication, sort_keys=True)`), project key and
    * issue type from the output's creds. jira-v2 (jira_v2.py:233-258)
    * POSTs the IDENTICAL field surface wrapped under a `fields` key —
    * `struct(jiraIssueFields(...)("...").col(PublicationCol).as("fields"))`
    * — its differences are auth (API key vs session cookie), a Dispatcher
    * concern. One documented deviation: the JSON inside the code block
    * uses compact separators (Spark's `to_json`) where CPython's default
    * is `", "` / `": "` — a wire-format detail of the interior dump, not
    * a field difference. */
  def jiraIssueFields(projectKey: String, issueType: String): Publisher = df => {
    val pubType = df.schema(PublicationCol).dataType
    val body = concat(lit("{code:JSON}"),
      to_json(sortKeysDeep(col(PublicationCol), pubType)), lit("{code}"))
    df.withColumn(PublicationCol, struct(
      struct(lit(projectKey).as("key")).as("project"),
      concat(lit("StreamAlert "), col("rule_name")).as("summary"),
      body.as("description"),
      struct(lit(issueType).as("name")).as("issuetype")))
  }

  /** Python `json.dumps(value, indent=2, sort_keys=True)` rendered at plan
    * time from the static schema — the github default issue body dumps the
    * record exactly this way (github.py:110-114). Struct keys sort, nested
    * levels indent by two spaces, empty containers stay inline. Documented
    * deviations (wire details of the interior dump, not field differences):
    * non-ASCII is not \uXXXX-escaped (CPython's ensure_ascii) and maps
    * fall back to compact `to_json` (runtime keys are not plan-sortable). */
  private[graft] def jsonDumpsIndent2(c: Column, dt: DataType, indent: Int): Column = {
    val pad = " " * indent
    val pad2 = " " * (indent + 2)
    dt match {
      case st: StructType =>
        val inner = st.fields.sortBy(_.name).toSeq.map { f =>
          concat(lit(pad2 + "\"" + f.name + "\": "),
            jsonDumpsIndent2(c.getField(f.name), f.dataType, indent + 2))
        }
        if (inner.isEmpty) when(c.isNull, lit("null")).otherwise(lit("{}"))
        else when(c.isNull, lit("null")).otherwise(
          concat(lit("{\n"), concat_ws(",\n", inner: _*), lit("\n" + pad + "}")))
      case ArrayType(et, _) =>
        when(c.isNull, lit("null"))
          .when(size(c) === 0, lit("[]"))
          .otherwise(concat(lit("[\n"),
            array_join(transform(c, e =>
              concat(lit(pad2), jsonDumpsIndent2(e, et, indent + 2))), ",\n"),
            lit("\n" + pad + "]")))
      case MapType(StringType, StringType, _) =>
        // a loose sub-document: direct keys sort and indent like the
        // reference's parsed dict; each value re-renders from its raw
        // JSON text (containers pretty-print via the char fold; scalars
        // by shape — a numeric-LOOKING string renders unquoted and keys
        // inside nested raw text keep source order, the two documented
        // typed-boundary deviations)
        when(c.isNull, lit("null"))
          .when(size(c) === 0, lit("{}"))
          .otherwise(concat(lit("{\n"),
            array_join(transform(sort_array(map_keys(c)), k =>
              concat(lit(pad2 + "\""), k, lit("\": "),
                renderLooseValue(element_at(c, k), indent + 2))), ",\n"),
            lit("\n" + pad + "}")))
      case _: MapType => to_json(c) // compact fallback, see Scaladoc
      case StringType =>
        // JSON-escape exactly as a dump would: render a one-element array,
        // strip the brackets
        val j = to_json(array(c))
        when(c.isNull, lit("null")).otherwise(j.substr(lit(2), length(j) - 2))
      case _ => coalesce(c.cast(StringType), lit("null"))
    }
  }

  /** One raw-JSON-text value from a loose sub-document, rendered for an
    * indented dump: containers re-format through [[jsonPrettyText]],
    * boolean/null/numeric shapes pass through, anything else is a string
    * and gets JSON-quoted. */
  private def renderLooseValue(v: Column, indent: Int): Column = {
    val quoted = { val j = to_json(array(v)); j.substr(lit(2), length(j) - 2) }
    when(v.isNull, lit("null"))
      .when(v.startsWith("{") || v.startsWith("["), jsonPrettyText(v, indent))
      .when(v === "true" || v === "false" || v === "null" ||
        v.rlike("^-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"), v)
      .otherwise(quoted)
  }

  /** Re-format compact JSON text as `json.dumps(indent=2, separators=(',',
    * ': '))` would — one aggregate char fold tracking depth, in-string, and
    * a pending opener (so empty containers stay inline). Runs on raw
    * sub-document text whose structure only exists at run time; keys keep
    * their source order (the plan cannot sort keys it cannot see). */
  private[graft] def jsonPrettyText(raw: Column, baseIndent: Int): Column = {
    val spaces = lit(" " * 200)
    def pad(d: Column): Column = spaces.substr(lit(1), lit(baseIndent) + d * 2)
    val chars = filter(split(coalesce(raw, lit("null")), ""), c => c =!= "")
    val init = struct(lit("").as("out"), lit(0).as("d"),
      lit("").as("pend"), lit(false).as("str"), lit(false).as("esc"))
    val folded = aggregate(chars, init, (st, ch) => {
      val out = st.getField("out"); val d = st.getField("d")
      val pend = st.getField("pend"); val inStr = st.getField("str")
      val esc = st.getField("esc")
      // inside a string literal: copy verbatim, track escapes
      val strState = struct(concat(out, ch).as("out"), d.as("d"),
        pend.as("pend"), (!(ch === "\"" && !esc)).as("str"),
        (ch === "\\" && !esc).as("esc"))
      // structural character: flush any pending opener first
      val closesPend = (pend === "{" && ch === "}") || (pend === "[" && ch === "]")
      val out1 = when(pend === "", out)
        .when(closesPend, concat(out, pend, ch))
        .otherwise(concat(out, pend, lit("\n"), pad(d + 1)))
      val d1 = when(pend =!= "" && !closesPend, d + 1).otherwise(d)
      val isOpen = ch === "{" || ch === "["
      val isClose = ch === "}" || ch === "]"
      val d2 = when(!closesPend && isClose, d1 - 1).otherwise(d1)
      val out2 = when(closesPend || isOpen, out1)
        .when(isClose, concat(out1, lit("\n"), pad(d2), ch))
        .when(ch === ":", concat(out1, lit(": ")))
        .when(ch === ",", concat(out1, lit(",\n"), pad(d2)))
        .otherwise(concat(out1, ch))
      val pend2 = when(closesPend, lit("")).when(isOpen, ch).otherwise(lit(""))
      val structural = struct(out2.as("out"), d2.as("d"), pend2.as("pend"),
        (ch === "\"").as("str"), lit(false).as("esc"))
      when(inStr, strState).otherwise(structural)
    }, st => concat(st.getField("out"),
      when(st.getField("pend") =!= "", st.getField("pend")).otherwise(lit(""))))
    folded
  }

  /** The github issue payload (github.py:105-126 `_dispatch`): title
    * `StreamAlert: <rule_name>`, body = `### Description` + the rule
    * description + the record fenced as json.dumps(indent=2,
    * sort_keys=True), labels split from the output's conf
    * (github.py:120-125). The POST itself stays a Dispatcher concern. */
  def githubIssue(labels: Seq[String]): Publisher = df => {
    val recType = df.schema("record").dataType
    val body = concat(
      lit("### Description\n"), col("rule_description"),
      lit("\n\n### Event data\n\n```\n"),
      jsonDumpsIndent2(col("record"), recType, 0),
      lit("\n```"))
    df.withColumn(PublicationCol, struct(
      concat(lit("StreamAlert: "), col("rule_name")).as("title"),
      body.as("body"),
      array(labels.map(lit): _*).cast(ArrayType(StringType)).as("labels")))
  }

  /** The teams connector-card payload (teams.py:95-131): title
    * `StreamAlert Rule Triggered: <rule_name>`, text = rule description,
    * themeColor (default E81123), an `Alert Info` facts section with
    * rule_name + alert_id (teams.py:156-177), and a
    * `StreamAlert Alert Record` section with one str(value) fact per
    * top-level record field in declared order (teams.py:133-154).
    * Deviation: non-scalar fact values render as SQL casts, not Python
    * repr (the reference str()s nested dicts verbatim). */
  def teamsCard(cardColor: String = "E81123"): Publisher = df => {
    val recType = df.schema("record").dataType.asInstanceOf[StructType]
    def fact(name: String, value: Column) =
      struct(lit(name).as("name"), value.as("value"))
    val recordFacts = recType.fields.toSeq.map(f =>
      fact(f.name, pyStr(col("record").getField(f.name), f.dataType)))
    df.withColumn(PublicationCol, struct(
      concat(lit("StreamAlert Rule Triggered: "), col("rule_name")).as("title"),
      col("rule_description").as("text"),
      lit(cardColor).as("themeColor"),
      array(
        struct(lit("Alert Info").as("activityTitle"),
          array(
            fact("rule_name", col("rule_name")),
            fact("alert_id", col("alert_id"))).as("facts")),
        struct(lit("StreamAlert Alert Record").as("activityTitle"),
          array(recordFacts: _*).as("facts"))).as("sections")))
  }

  /** The victorops message (victorops.py:99-104): CRITICAL message type,
    * fixed entity id, rule name as the display name, and the publication's
    * record verbatim. */
  def victoropsMessage(): Publisher = df =>
    df.withColumn(PublicationCol, struct(
      lit("CRITICAL").as("message_type"),
      lit("streamalert/alert").as("entity_id"),
      col("rule_name").as("entity_display_name"),
      col("record").as("record")))

  /** The komand envelope (komand.py:85-86): the whole publication POSTed
    * under a `data` key. */
  def komandEnvelope(): Publisher = df =>
    df.withColumn(PublicationCol, struct(col(PublicationCol).as("data")))

  /** Demisto label rows: EVERY leaf of the publication flattened to
    * `{type: dotted[indexed] path, value: str(value)}`, list elements
    * indexed at RUNTIME via transform's index lambda (demisto.py:321-338
    * `enumerate_fields` — unlike the generic `enumerate_fields` publisher,
    * which must JSON-serialize arrays because its OUTPUT keys are struct
    * fields; labels are an array column, so runtime arity is fine here),
    * sorted by path (demisto.py:219-220 `add_label` keeps labels sorted
    * by type; paths are unique so the value tiebreak never fires). */
  private def demistoLabels(c: Column, dt: DataType, path: Column): Seq[Column] =
    dt match {
      case st: StructType => st.fields.toSeq.flatMap { f =>
        val p = when(length(path) > 0, concat(path, lit("." + f.name)))
          .otherwise(lit(f.name))
        demistoLabels(c.getField(f.name), f.dataType, p)
      }
      case ArrayType(et, _) =>
        Seq(flatten(transform(c, (v, i) =>
          concat(demistoLabels(v, et,
            concat(path, lit("["), i.cast(StringType), lit("]"))): _*))))
      case _: MapType => // runtime keys: one label with the JSON value
        Seq(array(struct(path.as("type"), to_json(c).as("value"))))
      case t =>
        Seq(array(struct(path.as("type"), pyStr(c, t).as("value"))))
    }

  /** The demisto create-incident request (demisto.py:136-147 request_data +
    * :278-338 assembler defaults): incident name = rule name, details =
    * rule description, the publication flattened into sorted string labels,
    * createInvestigation always true (demisto.py:318), empty customFields. */
  def demistoIncident(incidentType: String = "Unclassified",
      playbook: String = "Unknown", severity: Double = 0.0,
      owner: String = "StreamAlert"): Publisher = df => {
    val pubType = df.schema(PublicationCol).dataType
    val labels = array_sort(concat(
      demistoLabels(col(PublicationCol), pubType, lit("")): _*))
    df.withColumn(PublicationCol, struct(
      lit(incidentType).as("type"),
      col("rule_name").as("name"),
      lit(owner).as("owner"),
      lit(severity).as("severity"),
      labels.as("labels"),
      map().cast(MapType(StringType, StringType)).as("customFields"),
      col("rule_description").as("details"),
      lit(playbook).as("playbook"),
      lit(true).as("createInvestigation")))
  }

  /** elide_string_middle (alert_processor/helpers.py:19-33): replace the
    * middle with " ... " so the text fits `maxLength` (SNS caps subjects
    * at 100 chars). */
  def elideStringMiddle(text: Column, maxLength: Int): Column = {
    val halfLen = (maxLength - 5) / 2
    when(length(text) <= maxLength, text)
      .otherwise(concat(substring(text, 1, halfLen), lit(" ... "),
        substring(text, -halfLen, halfLen)))
  }

  /** The aws-sns publication (aws.py:529-543): subject
    * `<rule> triggered alert <id>` elided to 99 chars, message =
    * json.dumps(publication, indent=2, sort_keys=True). */
  def snsMessage(): Publisher = df => {
    val pubType = df.schema(PublicationCol).dataType
    df.withColumn(PublicationCol, struct(
      elideStringMiddle(concat(col("rule_name"), lit(" triggered alert "),
        col("alert_id")), 99).as("subject"),
      jsonDumpsIndent2(col(PublicationCol), pubType, 0).as("message")))
  }

  /** The aws-ses email surface (aws.py:695-735 `_build_email`): To/From
    * from the output's creds, default subject/body, and the record.json
    * attachment = json.dumps(record, sort_keys=True, indent=2). MIME
    * packaging stays delivery-side (a Dispatcher concern). */
  def sesEmailFields(toEmails: String, fromEmail: String): Publisher = df => {
    val recType = df.schema("record").dataType
    df.withColumn(PublicationCol, struct(
      lit(toEmails).as("to"),
      lit(fromEmail).as("from"),
      concat(col("rule_name"), lit(" triggered alert "),
        col("alert_id")).as("subject"),
      lit("Please review the attached record.json").as("body"),
      struct(lit("record.json").as("filename"),
        jsonDumpsIndent2(col("record"), recType, 0).as("content"))
        .as("attachment")))
  }

  /** The aws-lambda invocation surface (aws.py:160-258
    * `LambdaOutput._dispatch`): payload = COMPACT json.dumps of the alert
    * record (`separators=(',', ':')` — Spark's `to_json` matches; an
    * `@aws-lambda.alert_data` override is just an earlier publisher in the
    * chain), invocation type `Event`, and the v1 qualifier parsing of the
    * configured function value — `'name'`, `'name:qualifier'`, or a full
    * ARN `'arn:aws:lambda:region:acct:function:name:qualifier'`: 2 or 8
    * colon-separated parts mean the last part is the qualifier
    * (aws.py:233-241); the qualifier key is OMITTED entirely when absent,
    * exactly as the reference omits `Qualifier` from invoke_params
    * (aws.py:253-256). aws-lambda-v2 (aws.py:263-377) sends the identical
    * payload with function/qualifier configured directly as creds. */
  def lambdaInvocation(functionConfig: String): Publisher = df => {
    val parts = functionConfig.split(":")
    val (function, qualifier) =
      if (parts.length == 2 || parts.length == 8)
        (parts(parts.length - 2), Some(parts.last))
      else (parts.last, None)
    val base = Seq(
      lit(function).as("function_name"),
      lit("Event").as("invocation_type"),
      to_json(col("record")).as("payload"))
    df.withColumn(PublicationCol,
      struct(qualifier.fold(base)(q => base :+ lit(q).as("qualifier")): _*))
  }

  /** The aws-sqs message (aws.py:554-605 `SQSOutput._dispatch`):
    * MessageBody = compact json.dumps of the record (an
    * `@aws-sqs.message_data` override chains as an earlier publisher). */
  def sqsMessage(): Publisher = df =>
    df.withColumn(PublicationCol,
      struct(to_json(col("record")).as("message_body")))

  /** The aws-cloudwatch-log entry (aws.py:609-642
    * `CloudwatchLogOutput._dispatch`): the whole publication logged as a
    * `json.dumps(publication, indent=2)` dump. Documented deviation: keys
    * render SORTED (the plan-time dump sorts struct fields; the reference
    * preserves Python dict insertion order, an artifact of dict building
    * that has no stable analogue in a column plan). */
  def cloudwatchLogEntry(): Publisher = df => {
    val pubType = df.schema(PublicationCol).dataType
    df.withColumn(PublicationCol, struct(
      jsonDumpsIndent2(col(PublicationCol), pubType, 0).as("message")))
  }

  /** The phantom two-POST payloads (phantom.py:104-127 container setup +
    * :171-175 artifact): container = {name: rule, description}, artifact =
    * {cef: record, container_id, data: publication, fixed name/label}.
    * `containerId` is the value the dispatcher resolved from the container
    * POST (or the existing-container lookup, phantom.py:71-102) — the HTTP
    * round-trip is a Dispatcher concern; both payload shapes are column
    * work. */
  def phantomShapes(containerId: Long): Publisher = df =>
    df.withColumn(PublicationCol, struct(
      struct(col("rule_name").as("name"),
        col("rule_description").as("description")).as("container"),
      struct(col("record").as("cef"),
        lit(containerId).as("container_id"),
        col(PublicationCol).as("data"),
        lit("Phantom Artifact").as("name"),
        lit("Alert").as("label")).as("artifact")))

  /** _strip_invalid_contexts (pagerduty.py:311-346): keep only valid
    * link/image contexts, re-emitting ONLY the standardized keys.
    * Contexts come from publisher-author config (plan-time literals), so
    * this is a plain function applied before folding them into the
    * payload. */
  def stripInvalidContexts(contexts: Seq[Map[String, String]]): Seq[Map[String, String]] =
    contexts.flatMap { c =>
      c.get("type") match {
        case Some("link") if c.contains("href") && c.contains("text") =>
          Some(Map("type" -> "link", "href" -> c("href"), "text" -> c("text")))
        case Some("image") if c.contains("src") =>
          Some(Map("type" -> "image", "src" -> c("src")))
        case _ => None
      }
    }

  /** The pagerduty Events v1 payload (pagerduty.py:289-309 presentation +
    * :1395-1410 `send_event` body): trigger event keyed by the service
    * key, description `StreamAlert Rule Triggered - <rule>`, details =
    * {rule description, record}, fixed `streamalert` client, validated
    * contexts. */
  def pagerDutyV1Event(serviceKey: String, clientUrl: String = "",
      contexts: Seq[Map[String, String]] = Nil): Publisher = df => {
    val ctxCols = stripInvalidContexts(contexts).map { c =>
      map(c.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    }
    val ctxArray =
      if (ctxCols.isEmpty) array().cast(ArrayType(MapType(StringType, StringType)))
      else array(ctxCols: _*)
    df.withColumn(PublicationCol, struct(
      lit(serviceKey).as("service_key"),
      lit("trigger").as("event_type"),
      concat(lit("StreamAlert Rule Triggered - "), col("rule_name")).as("description"),
      struct(col("rule_description").as("description"),
        col("record").as("record")).as("details"),
      lit("streamalert").as("client"),
      lit(clientUrl).as("client_url"),
      ctxArray.as("contexts")))
  }

  /** The pagerduty REST incident payload (pagerduty.py:747-803
    * `_construct_incident_put_request_data` + :852-862 escalation policy):
    * title `StreamAlert Incident - Rule triggered: <rule>`, service
    * reference, incident_body = rule description, escalation-policy
    * reference (the no-assignments default branch), optional validated
    * urgency. */
  def pagerDutyIncident(serviceId: String, escalationPolicyId: String,
      urgency: Option[String] = None): Publisher = df => {
    val base = struct(
      lit("incident").as("type"),
      concat(lit("StreamAlert Incident - Rule triggered: "),
        col("rule_name")).as("title"),
      struct(lit(serviceId).as("id"),
        lit("service_reference").as("type")).as("service"),
      struct(lit("incident_body").as("type"),
        col("rule_description").as("details")).as("body"),
      struct(lit(escalationPolicyId).as("id"),
        lit("escalation_policy_reference").as("type")).as("escalation_policy"))
    // urgency must be 'high'|'low' or it is dropped (pagerduty.py:820-828)
    val incident = urgency.filter(Set("low", "high")) match {
      case Some(u) => base.withField("urgency", lit(u))
      case None => base
    }
    df.withColumn(PublicationCol, struct(incident.as("incident")))
  }

  // ---------------------------------------------------------------------------
  // Community layout publishers (publishers/community/slack/slack_layout.py +
  // pagerduty/pagerduty_layout.py): the Summary / AttachRuleInfo /
  // AttachFullRecord slack chain and the ShortenTitle / as_custom_details /
  // PrettyPrintArrays pagerduty chain, as pure column transforms over the
  // publication.
  // ---------------------------------------------------------------------------

  /** RuleDescriptionParser (shared/description.py:19-162) as one plan-time
    * fold over the description's lines: `field:` lines open a new field
    * (never http/https), continuation lines join with a space, blank lines
    * buffer newlines as the joiner, and a line that extends a URL joins
    * with no separator. Returns struct(author, description,
    * fields: array<struct<title, value>>) — fields in first-appearance
    * order with author/maintainer/description lifted out, titles
    * Python-`str.capitalize()`d, ready for AttachRuleInfo. */
  private[graft] def presentRuleDescription(desc: Column): Column = {
    val fieldExtract = "^([a-zA-Z0-9\\-_&\\s]{0,20}):([\\s\\S]*)$"
    // description.py:70-72 _URL_REGEX, anchored full-line
    val urlRegex = "^(?:http(?:s)?://)?[\\w.-]+(?:\\.[\\w\\.-]+)+" +
      "[\\w\\-\\._~:/?#\\[\\]@!\\$&'\\(\\)\\*\\+,;=.]+$"
    val lines = transform(split(coalesce(desc, lit("")), "\n"), l => trim(l))
    val strMap = "map<string,string>"
    val init = struct(
      lit("description").as("cur"),
      map().cast(strMap).as("docs"),
      map().cast(strMap).as("buf"))
    val folded = aggregate(lines, init, (acc, line) => {
      val isField = line.rlike("^[a-zA-Z0-9\\-_&\\s]{0,20}:") &&
        !line.startsWith("http:") && !line.startsWith("https:")
      val field = when(isField,
        lower(trim(regexp_extract(line, fieldExtract, 1)))).otherwise(acc.getField("cur"))
      val value = when(isField,
        trim(regexp_extract(line, fieldExtract, 2))).otherwise(line)
      val doc = element_at(acc.getField("docs"), field)
      val bufF = coalesce(element_at(acc.getField("buf"), field), lit(""))
      val urlJoined = concat(doc, value).rlike(urlRegex)
      val newDoc = when(value === "", doc)
        .when(doc.isNull, value)
        .when(urlJoined, concat(doc, value))
        .otherwise(concat(doc,
          when(bufF === "", lit(" ")).otherwise(bufF), value))
      // blank line buffers a newline; the URL branch keeps the buffer
      // (description.py:123-140), everything else clears it
      val newBuf = when(value === "", concat(bufF, lit("\n")))
        .when(doc.isNull || !urlJoined, lit(""))
        .otherwise(bufF)
      def updated(m: Column, v: Column): Column = map_concat(
        map_filter(m, (k, _) => k =!= field), map(field, v))
      struct(
        field.as("cur"),
        when(newDoc.isNull, acc.getField("docs"))
          .otherwise(updated(acc.getField("docs"), newDoc)).as("docs"),
        updated(acc.getField("buf"), newBuf).as("buf"))
    })
    val docs = folded.getField("docs")
    // buf keys accumulate every field in first-encounter order — the
    // field list even when a field's lines were all blank
    val fieldKeys = filter(map_keys(folded.getField("buf")),
      k => !k.isin("author", "maintainer", "description"))
    struct(
      coalesce(element_at(docs, "author"),
        element_at(docs, "maintainer"), lit("")).as("author"),
      coalesce(element_at(docs, "description"), lit("")).as("description"),
      transform(fieldKeys, k => struct(
        concat(upper(substring(k, 1, 1)), lower(substring(k, 2, 1000000)))
          .as("title"),
        coalesce(element_at(docs, k), lit("")).as("value"))).as("fields"))
  }

  /** The one attachment shape all slack layout publishers share — a
    * superstruct of the three dict layouts (to_json omits the nulls each
    * publisher leaves unset, so each attachment serializes with exactly
    * its own keys). */
  private def slackAttachment(
      fallback: Column = lit(null).cast(StringType),
      color: Column = lit(null).cast(StringType),
      authorName: Column = lit(null).cast(StringType),
      authorLink: Column = lit(null).cast(StringType),
      authorIcon: Column = lit(null).cast(StringType),
      author: Column = lit(null).cast(StringType),
      title: Column = lit(null).cast(StringType),
      titleLink: Column = lit(null).cast(StringType),
      text: Column = lit(null).cast(StringType),
      imageUrl: Column = lit(null).cast(StringType),
      thumbUrl: Column = lit(null).cast(StringType),
      fields: Column = lit(null).cast("array<struct<title:string,value:string>>"),
      footer: Column = lit(null).cast(StringType),
      footerIcon: Column = lit(null).cast(StringType),
      ts: Column = lit(null).cast("bigint"),
      mrkdwnIn: Column = lit(null).cast("array<string>")): Column = struct(
    fallback.as("fallback"), color.as("color"), authorName.as("author_name"),
    authorLink.as("author_link"), authorIcon.as("author_icon"),
    author.as("author"), title.as("title"), titleLink.as("title_link"),
    text.as("text"), imageUrl.as("image_url"), thumbUrl.as("thumb_url"),
    fields.as("fields"), footer.as("footer"), footerIcon.as("footer_icon"),
    ts.as("ts"), mrkdwnIn.as("mrkdwn_in"))

  private val SlackAttachmentsType =
    "array<struct<fallback:string,color:string,author_name:string," +
      "author_link:string,author_icon:string,author:string,title:string," +
      "title_link:string,text:string,image_url:string,thumb_url:string," +
      "fields:array<struct<title:string,value:string>>,footer:string," +
      "footer_icon:string,ts:bigint,mrkdwn_in:array<string>>>"

  /** `publication['@slack.attachments'] = publication.get(...) + [more]` —
    * the append idiom every non-Summary slack layout publisher uses. */
  private def appendSlackAttachments(df: DataFrame, atts: Column): DataFrame = {
    val pubType = df.schema(PublicationCol).dataType.asInstanceOf[StructType]
    val existing =
      if (pubType.fieldNames.contains("@slack.attachments"))
        col(PublicationCol).getField("@slack.attachments")
      else lit(null)
    df.withColumn(PublicationCol, col(PublicationCol).withField(
      "`@slack.attachments`",
      concat(coalesce(existing, array().cast(SlackAttachmentsType)), atts)))
  }

  /** slack Summary (slack_layout.py:31-109): a fresh publication with the
    * rule summary attachment; the prior publication passes through under
    * `@slack._previous_publication`. The title link is the
    * github-search URL the reference urlencodes (rule names are
    * [a-z0-9_], so only the static query tail needs encoding). */
  def slackSummary: Publisher = df => {
    val presented = presentRuleDescription(col("rule_description"))
    val att = slackAttachment(
      fallback = concat(lit("Rule triggered: "), col("rule_name")),
      color = lit("#ff5a5f"), // RAUSCH
      authorName = presented.getField("author"),
      authorLink = lit(""), authorIcon = lit(""),
      title = col("rule_name"),
      titleLink = concat(
        lit("https://github.com/airbnb/streamalert/search?q="),
        col("rule_name"), lit("+path%3A%2Frules")),
      text = htmlEscapeNoQuote(presented.getField("description")),
      imageUrl = lit(""), thumbUrl = lit(""),
      footer = lit(""), footerIcon = lit(""),
      ts = unix_timestamp(col("created")),
      mrkdwnIn = array().cast("array<string>"))
    df.withColumn(PublicationCol, struct(
      lit("Rule triggered").as("@slack.text"),
      array(att).as("@slack.attachments"),
      col(PublicationCol).as("@slack._previous_publication")))
  }

  /** slack AttachRuleInfo (slack_layout.py:112-137): one attachment whose
    * fields are the description's non-author non-description fields. */
  def slackAttachRuleInfo: Publisher = df =>
    appendSlackAttachments(df, array(slackAttachment(
      color = lit("#8ce071"), // LIMA
      fields = presentRuleDescription(col("rule_description")).getField("fields"))))

  /** slack AttachFullRecord (slack_layout.py:225-307): the record as
    * json.dumps(indent=2, sort_keys), html-escaped FIRST, then diced into
    * <=3990-char line-aligned chunks, one attachment each — first carries
    * the source entity and Record title, last carries the Alert Id field
    * and the console-link footer. */
  def slackAttachFullRecord: Publisher = df => {
    val recType = df.schema("record").dataType
    val escaped = htmlEscapeNoQuote(jsonDumpsIndent2(col("record"), recType, 0))
    val docLines = split(escaped, "\n")
    val limit = 4000 - 10 // _SLACK_MAXIMUM_ATTACHMENT_CHARACTER_LENGTH - padding
    val folded = aggregate(docLines,
      struct(array().cast("array<string>").as("parts"), lit("").as("cur")),
      (acc, line) => {
        val parts = acc.getField("parts")
        val cur = acc.getField("cur")
        val flush = cur =!= "" && (length(line) + length(cur)) > limit
        struct(
          when(flush, concat(parts, array(cur))).otherwise(parts).as("parts"),
          concat(when(flush, lit("")).otherwise(cur), lit("\n"), line).as("cur"))
      },
      acc => when(acc.getField("cur") =!= "",
        concat(acc.getField("parts"), array(acc.getField("cur"))))
        .otherwise(acc.getField("parts")))
    val n = size(folded)
    val atts = transform(folded, (doc, i) => {
      val isFirst = i === 0
      val isLast = i === n - 1
      slackAttachment(
        color = lit("#7b0051"), // HACKBERRY
        author = when(isFirst, col("source_entity")).otherwise(lit("")),
        title = when(isFirst, lit("Record")).otherwise(lit("")),
        text = concat(lit("```\n"), doc, lit("\n```")),
        fields = when(isLast, array(struct(lit("Alert Id").as("title"),
          col("alert_id").as("value"))))
          .otherwise(array().cast("array<struct<title:string,value:string>>")),
        footer = when(isLast, concat(lit("via <https://console.aws.amazon.com/"),
          col("source_service"), lit("/home|"), col("source_service"), lit(">")))
          .otherwise(lit("")),
        footerIcon = lit(""),
        mrkdwnIn = array(lit("text")))
    })
    appendSlackAttachments(df, atts)
  }

  /** pagerduty ShortenTitle (pagerduty_layout.py:21-38): replace the
    * three dialects' titles with the bare rule name. */
  def pagerdutyShortenTitle: Publisher = df =>
    df.withColumn(PublicationCol, col(PublicationCol)
      .withField("`@pagerduty-v2.summary`", col("rule_name"))
      .withField("`@pagerduty-incident.incident_title`", col("rule_name"))
      .withField("`@pagerduty.description`", col("rule_name")))

  /** pagerduty as_custom_details (pagerduty_layout.py:41-57): everything
    * that is not an @pagerduty special field becomes the details dict. */
  def pagerdutyAsCustomDetails: Publisher = df => {
    val pubType = df.schema(PublicationCol).dataType.asInstanceOf[StructType]
    val custom = pubType.fields.filterNot(_.name.startsWith("@pagerduty")).toSeq
    val details = struct(custom.map(f =>
      col(PublicationCol).getField(f.name).as(f.name)): _*)
    df.withColumn(PublicationCol, col(PublicationCol)
      .withField("`@pagerduty.details`", details)
      .withField("`@pagerduty-v2.custom_details`", details))
  }

  /** StringifyArrays (generic.py:206-246) / PrettyPrintArrays
    * (pagerduty_layout.py:85-106): every scalar array anywhere in the
    * publication joins into one string on the delimiter. */
  def stringifyArrays(delimiter: String = "\n"): Publisher = df => {
    def walk(c: Column, dt: DataType): Column = dt match {
      case st: StructType =>
        struct(st.fields.toSeq.map(f =>
          walk(c.getField(f.name), f.dataType).as(f.name)): _*)
      case ArrayType(et, _) if !et.isInstanceOf[StructType] &&
        !et.isInstanceOf[ArrayType] && !et.isInstanceOf[MapType] =>
        array_join(transform(c, e => pyStr(e, et)), delimiter)
      case ArrayType(et, _) => transform(c, e => walk(e, et))
      case _ => c
    }
    df.withColumn(PublicationCol,
      walk(col(PublicationCol), df.schema(PublicationCol).dataType))
  }

  register("slack_summary")(slackSummary)
  register("slack_attach_rule_info")(slackAttachRuleInfo)
  register("slack_attach_full_record")(slackAttachFullRecord)
  register("pagerduty_shorten_title")(pagerdutyShortenTitle)
  register("pagerduty_as_custom_details")(pagerdutyAsCustomDetails)
  register("stringify_arrays")(stringifyArrays())
  register("pretty_print_arrays")(stringifyArrays("\n\n----------\n\n"))

  register("slack_message")(slackDefaultMessage())
  register("victorops_message")(victoropsMessage())
  register("komand_envelope")(komandEnvelope())
  register("sns_message")(snsMessage())
  register("sqs_message")(sqsMessage())
  register("cloudwatch_log_entry")(cloudwatchLogEntry())
}
