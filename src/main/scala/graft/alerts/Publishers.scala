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

  /** populate_fields (generic.py:171-203): keep ONLY the requested keys,
    * each deep-searched through the publication (typed get_keys); a key
    * absent from the schema publishes an empty array (reference: None). */
  def populateFields(keys: Seq[String]): Publisher = df => {
    val pubType = df.schema(PublicationCol).dataType
    val cols = keys.map { k =>
      val hits = scala.util.Try(
        graft.rules.Helpers.getKeys(col(PublicationCol), pubType, k))
      hits.getOrElse(array().cast(ArrayType(StringType))).as(k)
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
      case _: MapType => to_json(c) // compact fallback, see Scaladoc
      case StringType =>
        // JSON-escape exactly as a dump would: render a one-element array,
        // strip the brackets
        val j = to_json(array(c))
        when(c.isNull, lit("null")).otherwise(j.substr(lit(2), length(j) - 2))
      case _ => coalesce(c.cast(StringType), lit("null"))
    }
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

  register("slack_message")(slackDefaultMessage())
  register("victorops_message")(victoropsMessage())
  register("komand_envelope")(komandEnvelope())
  register("sns_message")(snsMessage())
  register("sqs_message")(sqsMessage())
  register("cloudwatch_log_entry")(cloudwatchLogEntry())
}
