package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, TimestampType}

/** Optimizer rule: rewrite an inequality-only interval join into an
  * equi-join on a derived time bucket.
  *
  * A join whose entire condition is `point >= start AND point < end`
  * (any of `>=`/`>` for the lower and `<`/`<=` for the upper bound, either
  * orientation) has no equi-predicate, so Spark plans a nested-loop —
  * O(|fact|·|intervals|) comparisons, catastrophic at 100 TB. This rule
  * rebuilds it as the bucketed range join (the shape
  * `graft.operators.TemporalJoins.rangeJoinBucketed` hand-writes): the
  * point side gains `bucket = unix_micros(point) div W`, the interval side
  * explodes to the buckets each interval covers, and the join becomes a
  * HASH join on bucket equality with the exact containment predicate kept
  * as a residual. Coverage is correct for any monotone bucket function, so
  * truncating `div` is fine; `<=` upper bounds are covered because the
  * explode always includes `bucket(end)`.
  *
  * Width comes from `spark.graft.rangeJoin.bucketSeconds` (default 3600);
  * disable with `spark.graft.rangeJoin.enabled=false`. The rewrite fires
  * once: the rewritten join HAS an equality conjunct, so it no longer
  * matches. Registered through [[GraftExtensions]] —
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan]
    with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean
  private def bucketMicros: Long =
    conf.getConfString("spark.graft.rangeJoin.bucketSeconds", "3600").toLong * 1000000L

  /** (point, start, end) when the condition is exactly a lower and an
    * upper bound on one timestamp expression against bounds from the other
    * side. */
  private def asRange(cond: Expression, leftSet: AttributeSet,
      rightSet: AttributeSet): Option[(Expression, Expression, Expression, Boolean)] = {
    def sideOf(e: Expression): Option[Boolean] = // true = left
      if (e.references.subsetOf(leftSet)) Some(true)
      else if (e.references.subsetOf(rightSet)) Some(false)
      else None
    // normalize each conjunct to (point, bound, isLower)
    def norm(c: Expression): Option[(Expression, Expression, Boolean)] = c match {
      case GreaterThanOrEqual(p, b) => Some((p, b, true))
      case GreaterThan(p, b)        => Some((p, b, true))
      case LessThan(p, b)           => Some((p, b, false))
      case LessThanOrEqual(p, b)    => Some((p, b, false))
      case _ => None
    }
    // flip `start <= point` style orientations so the point is on the left
    def oriented(c: Expression): Seq[(Expression, Expression, Boolean)] = c match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
      case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case _ => Seq.empty
    }
    splitConjunctivePredicates(cond) match {
      case Seq(c1, c2) =>
        (for {
          (p1, b1, low1) <- oriented(c1)
          (p2, b2, low2) <- oriented(c2)
          if low1 && !low2 && p1.semanticEquals(p2)
          if p1.dataType == TimestampType && b1.dataType == TimestampType &&
            b2.dataType == TimestampType
          ps <- sideOf(p1); bs1 <- sideOf(b1); bs2 <- sideOf(b2)
          if bs1 == bs2 && ps != bs1
        } yield (p1, b1, b2, ps)).headOption
      case _ => None
    }
  }

  private def bucketOf(e: Expression): Expression =
    IntegralDivide(UnixMicros(e), Literal(bucketMicros))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if asRange(cond, left.outputSet, right.outputSet).isDefined =>
        val (point, start, end, pointOnLeft) =
          asRange(cond, left.outputSet, right.outputSet).get
        val (factSide, intervalSide) = if (pointOnLeft) (left, right) else (right, left)
        val factBucket = AttributeReference("__graft_bucket_f", LongType,
          nullable = true)()
        val ivBucket = AttributeReference("__graft_bucket_i", LongType,
          nullable = true)()
        val fact = Project(factSide.output :+
          Alias(bucketOf(point), factBucket.name)(factBucket.exprId), factSide)
        // explode to every bucket the interval touches; bucket(end) is
        // always included, which also covers `<=` upper bounds exactly
        // Sequence is TimeZoneAwareExpression: without an explicit zone it
        // stays unresolved and the optimizer rejects the plan
        val intervals = Generate(
          Explode(Sequence(bucketOf(start), bucketOf(end), None,
            Some(conf.sessionLocalTimeZone))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(ivBucket), child = intervalSide)
        val (newLeft, newRight) =
          if (pointOnLeft) (fact, intervals) else (intervals, fact)
        val newCond = And(EqualTo(factBucket, ivBucket), cond)
        Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}

/** `SparkSessionExtensions` entry point for graft's Catalyst extensions.
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RangeJoinRewrite())
    // the custom expressions, callable from scheduled SQL text — the
    // reference's users write raw SQL (Athena), so engine extensions
    // that only exist on the Column API would be invisible to them
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {
  type FnEntry = (org.apache.spark.sql.catalyst.FunctionIdentifier,
    ExpressionInfo, Seq[Expression] => Expression)

  /** The SQL-surface registrations, shared by the injection path and the
    * registry-based spec. */
  val functions: Seq[FnEntry] = Seq(
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[graft.functions.RollingHash].getName,
        "rolling_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "rolling_hash(str) takes one argument")
        graft.functions.RollingHash(args.head)
      }),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[graft.functions.MisraGriesAgg].getName,
        "misra_gries"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "misra_gries(item, k) takes two arguments")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"misra_gries k must be an integer literal, got $other")
        }
        graft.functions.MisraGriesAgg(args.head, k)
      }),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[graft.functions.CountMinAgg].getName,
        "count_min"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "count_min(item, depth, width) takes three arguments")
        val ints = args.drop(1).map {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"count_min depth/width must be integer literals, got $other")
        }
        graft.functions.CountMinAgg(args.head, ints(0), ints(1))
      }),
    binaryFn("dot_product", classOf[graft.functions.DotProduct].getName,
      graft.functions.DotProduct(_, _)),
    binaryFn("l2_sq", classOf[graft.functions.L2Squared].getName,
      graft.functions.L2Squared(_, _)),
    binaryFn("intersect_size", classOf[graft.functions.IntersectSizeLong].getName,
      graft.functions.IntersectSizeLong(_, _)),
    binaryFn("lcs_length", classOf[graft.functions.LcsLength].getName,
      graft.functions.LcsLength(_, _)),
    binaryFn("array_edit_distance",
      classOf[graft.functions.ArrayEditDistance].getName,
      graft.functions.ArrayEditDistance(_, _)),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("warc_split"),
      new ExpressionInfo(classOf[graft.functions.WarcSplit].getName,
        "warc_split"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "warc_split(blob) takes one argument")
        graft.functions.WarcSplit(args.head)
      })) ++ prestoAliases

  /** Presto/Athena dialect aliases, so the reference's user-authored query
    * packs run VERBATIM through `spark.sql` (its own sample pack calls
    * `json_extract` at scheduled_queries/sample/athena.py:27, which Spark
    * spells `get_json_object`). Mappings:
    *
    *  - `json_extract(json, path)` / `json_extract_scalar(json, path)` →
    *    [[graft.functions.PrestoJsonExtract]], Presto-faithful since r18:
    *    `json_extract` returns the JSON-ENCODED value (string scalars
    *    keep their quotes, objects/arrays return as JSON text with field
    *    order preserved, JSON `null` is the text `null`);
    *    `json_extract_scalar` unquotes scalars and returns SQL NULL for
    *    objects/arrays/JSON-null — the two halves of the divergence the
    *    r17 GetJsonObject alias documented and conceded.
    *  - `from_iso8601_timestamp(s)` → ANSI cast to TIMESTAMP (ISO 8601
    *    with optional offset parses; malformed input throws, as Presto's
    *    does).
    *  - `to_unixtime(ts)` → epoch seconds as DOUBLE with fractional
    *    seconds (Presto returns DOUBLE; Spark's `unix_timestamp` truncates
    *    to BIGINT, so this computes `unix_micros/1e6`).
    *  - `strpos(s, sub)` → 1-based first occurrence, 0 when absent, as
    *    BIGINT (Presto's return type; Spark's `instr` is INT).
    *  - `arbitrary(x)` → `first(x) ignoring nulls` (Presto returns an
    *    arbitrary NON-NULL value when one exists).
    *  - `approx_distinct(x[, e])` → HyperLogLog++ with Presto's default
    *    max standard error 0.023 (Spark's default is 0.05); the optional
    *    second argument is the standard error, a double literal. */
  private def prestoAliases: Seq[FnEntry] = Seq(
    binaryFn("json_extract", classOf[graft.functions.PrestoJsonExtract].getName,
      graft.functions.PrestoJsonExtract(_, _, scalarMode = false)),
    binaryFn("json_extract_scalar",
      classOf[graft.functions.PrestoJsonExtract].getName,
      graft.functions.PrestoJsonExtract(_, _, scalarMode = true)),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("from_iso8601_timestamp"),
      new ExpressionInfo(classOf[Cast].getName, "from_iso8601_timestamp"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "from_iso8601_timestamp(str) takes one argument")
        Cast(args.head, TimestampType)
      }),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("to_unixtime"),
      new ExpressionInfo(classOf[Divide].getName, "to_unixtime"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "to_unixtime(timestamp) takes one argument")
        Divide(Cast(UnixMicros(Cast(args.head, TimestampType)), DoubleType),
          Literal(1000000.0d))
      }),
    binaryFn("strpos", classOf[StringInstr].getName,
      (s, sub) => Cast(StringInstr(s, sub), LongType)),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("arbitrary"),
      new ExpressionInfo(classOf[aggregate.First].getName, "arbitrary"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "arbitrary(x) takes one argument")
        aggregate.First(args.head, ignoreNulls = true)
      }),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("approx_distinct"),
      new ExpressionInfo(classOf[aggregate.HyperLogLogPlusPlus].getName,
        "approx_distinct"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "approx_distinct(x[, e]) takes one or two arguments")
        // Presto text has no double-literal suffix — a plain SQL decimal
        // (`approx_distinct(x, 0.0040625)`) parses as DecimalType, so all
        // numeric literal shapes must convert
        val rsd = if (args.length == 1) 0.023 else args(1) match {
          case Literal(v: Double, _) => v
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case Literal(v: Int, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"approx_distinct standard error must be a numeric literal, got $other")
        }
        aggregate.HyperLogLogPlusPlus(args.head, rsd)
      }),
    // Presto's URL accessors (CloudTrail/ALB-log packs lean on these) —
    // all views over Spark's ParseUrl; url_extract_parameter is the
    // QUERY:<name> form. Presto returns NULL on malformed URLs; ParseUrl
    // does too (failOnError = false).
    urlFn("url_extract_host", "HOST"),
    urlFn("url_extract_path", "PATH"),
    urlFn("url_extract_protocol", "PROTOCOL"),
    urlFn("url_extract_query", "QUERY"),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("url_extract_parameter"),
      new ExpressionInfo(classOf[ParseUrl].getName, "url_extract_parameter"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "url_extract_parameter(url, name) takes two arguments")
        ParseUrl(Seq(args.head, Literal.create("QUERY",
          org.apache.spark.sql.types.StringType), args(1)), failOnError = false)
      })) ++ prestoAliases2

  /** r18 batch — the rest of the high-frequency Athena/Presto function
    * surface (CloudTrail/ALB/VPC-flow pack idioms), still parse-time
    * aliases over native Catalyst expressions (zero runtime cost):
    *
    *  - `date_parse(s, '%Y-%m-%d...')` — MySQL format converted to a JDK
    *    pattern ([[PrestoDateFormat.mysqlToJdk]]; unknown `%x` throws,
    *    never silently misparses).
    *  - `format_datetime` / `parse_datetime` (Joda patterns; the common
    *    tokens — yyyy MM dd HH mm ss — are JDK-identical, exotic Joda
    *    tokens may diverge and are documented as such).
    *  - `date_diff('unit', a, b)` / `date_add('unit', n, ts)` — the
    *    3-arg unit-literal Presto forms map to TimestampDiff/TimestampAdd;
    *    the 2-arg forms FALL THROUGH to Spark's own date_diff/date_add
    *    semantics so the builtins are not shadowed.
    *  - `map_agg(k, v)` → map_from_entries over a null-key-skipping
    *    collect_list with a keep-first dedup fold (Presto's map_agg
    *    SKIPS null keys and keeps the first value per duplicate key —
    *    see the NOTE at the implementation; it never throws).
    *  - `to_hex`/`from_hex`/`to_base64`/`from_base64` → Hex/Unhex/
    *    Base64/UnBase64; `sha256(x)` → unhex(sha2(x, 256)) (varbinary
    *    return, as Presto's).
    *  - `try(e)` → TryEval (NULL on runtime error);
    *    `is_nan`/`infinity`/`nan`; `bitwise_and/or/xor/not`;
    *    `codepoint` (first char's code point); `levenshtein_distance`;
    *    `normalize(s)` → NFC via the native [[graft.functions.NfcNormalize]]
    *    (only the NFC form is supported; other forms throw). */
  private def prestoAliases2: Seq[FnEntry] = Seq(
    binaryFn("date_parse", classOf[ParseToTimestamp].getName, (s, f) => {
      val fmt = f match {
        case Literal(v, _) if v != null =>
          PrestoDateFormat.mysqlToJdk(v.toString)
        case other => throw new IllegalArgumentException(
          s"date_parse format must be a string literal, got $other")
      }
      new ParseToTimestamp(s, Literal.create(fmt,
        org.apache.spark.sql.types.StringType))
    }),
    binaryFn("format_datetime", classOf[DateFormatClass].getName,
      (ts, f) => DateFormatClass(Cast(ts, TimestampType), f)),
    binaryFn("parse_datetime", classOf[ParseToTimestamp].getName,
      (s, f) => new ParseToTimestamp(s, f)),
    // NOTE: Presto's date_diff('unit', a, b) / date_add('unit', n, ts)
    // are NOT aliased here — Spark's PARSER intercepts those names with
    // its own unit-keyword special form before the registry is consulted
    // (same argument order and semantics as Presto's); only the QUOTED
    // unit differs, which ScheduledQueries.rewritePrestoUnits unquotes
    // at parse time.
    // Presto's map_agg SKIPS null keys and KEEPS THE FIRST value for a
    // duplicate key (KeyValuePairs dedups on insert); map_from_entries
    // over a raw collect_list would instead throw under Spark's default
    // duplicate-key policy. So: null-keyed entries never enter the
    // collect (CollectList ignores null inputs), and a keep-first fold
    // dedups the entry array before the map builds. "First" is collect
    // order — arbitrary across partitions in both engines.
    binaryFn("map_agg", classOf[MapFromEntries].getName, (k, v) => {
      def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
      // fixed field names — CreateStruct would inherit the (arbitrary)
      // input expression names and break the key-field lookup below
      val entries = aggregate.CollectList(
        CaseWhen(Seq((IsNotNull(k), CreateNamedStruct(Seq(
          Literal("__k"), k, Literal("__v"), v)))), None))
        .toAggregateExpression()
      val (acc, e, x) = (lv("acc"), lv("e"), lv("x"))
      val sameKey = LambdaFunction(
        EqualTo(
          org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
            x, Literal("__k")),
          org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
            e, Literal("__k"))), Seq(x))
      val dedup = ArrayAggregate(
        entries,
        Slice(entries, Literal(1), Literal(0)), // empty array, right type
        LambdaFunction(
          If(ArrayExists(acc, sameKey), acc,
            Concat(Seq(acc, CreateArray(Seq(e))))), Seq(acc, e)),
        LambdaFunction(lv("fin"), Seq(lv("fin"))))
      MapFromEntries(dedup)
    }),
    unaryFn("to_hex", classOf[Hex].getName, Hex(_)),
    unaryFn("from_hex", classOf[Unhex].getName, Unhex(_)),
    unaryFn("to_base64", classOf[Base64].getName, Base64(_)),
    unaryFn("from_base64", classOf[UnBase64].getName, UnBase64(_)),
    unaryFn("sha256", classOf[Sha2].getName,
      e => Unhex(Sha2(e, Literal(256)))),
    unaryFn("try", classOf[TryEval].getName, new TryEval(_)),
    unaryFn("is_nan", classOf[IsNaN].getName, IsNaN(_)),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("infinity"),
      new ExpressionInfo(classOf[Literal].getName, "infinity"),
      (args: Seq[Expression]) => {
        require(args.isEmpty, "infinity() takes no arguments")
        Literal(Double.PositiveInfinity)
      }),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("nan"),
      new ExpressionInfo(classOf[Literal].getName, "nan"),
      (args: Seq[Expression]) => {
        require(args.isEmpty, "nan() takes no arguments")
        Literal(Double.NaN)
      }),
    binaryFn("bitwise_and", classOf[BitwiseAnd].getName, BitwiseAnd(_, _)),
    binaryFn("bitwise_or", classOf[BitwiseOr].getName, BitwiseOr(_, _)),
    binaryFn("bitwise_xor", classOf[BitwiseXor].getName, BitwiseXor(_, _)),
    unaryFn("bitwise_not", classOf[BitwiseNot].getName, BitwiseNot(_)),
    // Presto's codepoint is varchar(1)-typed — anything but exactly one
    // character is a query error there, so a silent 0/first-char answer
    // would be the misparse class this batch bans (the date_parse rule)
    unaryFn("codepoint", classOf[Ascii].getName, e =>
      If(EqualTo(Length(e), Literal(1)), Ascii(e),
        Cast(new RaiseError(Literal.create(
          "codepoint requires exactly one character (Presto varchar(1))",
          org.apache.spark.sql.types.StringType)),
          org.apache.spark.sql.types.IntegerType))),
    binaryFn("levenshtein_distance", classOf[Levenshtein].getName,
      new Levenshtein(_, _)),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("normalize"),
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName,
        "normalize"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => graft.functions.NfcNormalize(s)
        case Seq(s, Literal(form, _)) if form != null &&
            form.toString.equalsIgnoreCase("NFC") =>
          graft.functions.NfcNormalize(s)
        // Presto's bare-keyword form normalize(s, NFC) is NOT reachable
        // here: the analyzer resolves the bare identifier as a column
        // (and fails) before this builder runs. The 1-arg form IS
        // Presto's NFC default; other forms need the quoted spelling.
        case other => throw new IllegalArgumentException(
          "normalize supports normalize(s) and normalize(s, 'NFC'); got " + other)
      })) ++ prestoAliases3

  /** r19 batch — the next idioms a real CloudTrail/ALB pack reaches for
    * (the arbitrary-pack contract,
    * scheduled_queries/query_packs/configuration.py:20-56), same
    * parse-time-alias pattern:
    *
    *  - `json_parse(s)` / `json_format(j)` → [[graft.functions.PrestoJsonParse]]
    *    (validate + compact canonical re-encode in the engine's
    *    JSON-as-text representation; INVALID INPUT THROWS as Presto's
    *    json_parse does — `TRY(json_parse(x))` is the null-on-bad form).
    *  - `contains(arr, x)` → [[graft.functions.PrestoContains]], which
    *    dispatches on the first argument's resolved type so Spark's own
    *    string `contains` keeps working on the same session.
    *  - `reduce(arr, init, merge, finish)` → ArrayAggregate (Spark's
    *    `aggregate`; identical argument order and lambda semantics).
    *  - `zip(a, b, ...)` → ArraysZip with Presto's `field0..fieldN`
    *    row-field names (Spark's default names come from the input
    *    expressions; a pack that reads `z.field0` needs Presto's).
    *  - `split_to_map(s, entryDelim, kvDelim)` → StringToMap with the
    *    LITERAL delimiters regex-quoted (Spark's str_to_map treats both
    *    delimiters as regexes; Presto's are literal — an unquoted `.` or
    *    `|` would silently shred the string). Duplicate keys throw in
    *    both engines (Spark's default EXCEPTION dedup policy = Presto's
    *    "Duplicate keys are not allowed").
    *  - `day_of_week`/`dow` (ISO 1=Monday..7=Sunday — Spark's
    *    `dayofweek` is 1=Sunday, so this is WeekDay+1), `day_of_year`/
    *    `doy`, `week`/`week_of_year` (ISO week), `year_of_week`/`yow`
    *    (ISO week-year), `day_of_month` — each BIGINT-typed as Presto
    *    returns.
    *
    * `url_encode`/`url_decode` need NO alias: Spark's builtins share
    * Presto's name and x-www-form-urlencoded semantics (space → '+');
    * they are exercised by the sq_presto_functions3 row instead. */
  private def prestoAliases3: Seq[FnEntry] = Seq(
    unaryFn("json_parse", classOf[graft.functions.PrestoJsonParse].getName,
      graft.functions.PrestoJsonParse(_, "json_parse")),
    unaryFn("json_format", classOf[graft.functions.PrestoJsonParse].getName,
      graft.functions.PrestoJsonParse(_, "json_format")),
    binaryFn("contains", classOf[graft.functions.PrestoContains].getName,
      graft.functions.PrestoContains(_, _)),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("reduce"),
      new ExpressionInfo(classOf[ArrayAggregate].getName, "reduce"),
      (args: Seq[Expression]) => {
        // Presto's reduce is 4-arg; Spark's own `reduce` builtin (an
        // aggregate alias this registration REPLACES) also accepts the
        // 3-arg identity-finish form — keep it working
        require(args.length == 3 || args.length == 4,
          "reduce(array, init, merge[, finish]) takes 3 or 4 arguments")
        if (args.length == 4) ArrayAggregate(args(0), args(1), args(2), args(3))
        else {
          val v = UnresolvedNamedLambdaVariable(Seq("__graft_fin"))
          ArrayAggregate(args(0), args(1), args(2), LambdaFunction(v, Seq(v)))
        }
      }),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("zip"),
      new ExpressionInfo(classOf[ArraysZip].getName, "zip"),
      (args: Seq[Expression]) => {
        require(args.length >= 2, "zip takes at least two arrays")
        ArraysZip(args, args.indices.map(i => Literal.create(s"field$i",
          org.apache.spark.sql.types.StringType)))
      }),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("split_to_map"),
      new ExpressionInfo(classOf[StringToMap].getName, "split_to_map"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "split_to_map(s, entryDelim, kvDelim) takes three arguments")
        def quoted(e: Expression, which: String): Expression = e match {
          case Literal(v, org.apache.spark.sql.types.StringType) if v != null =>
            Literal.create(java.util.regex.Pattern.quote(v.toString),
              org.apache.spark.sql.types.StringType)
          case other => throw new IllegalArgumentException(
            s"split_to_map $which delimiter must be a string literal " +
              s"(Presto's delimiters are literal, Spark's are regexes), " +
              s"got $other")
        }
        StringToMap(args(0), quoted(args(1), "entry"), quoted(args(2), "key-value"))
      })) ++ Seq[(Seq[String], Expression => Expression)](
    (Seq("day_of_week", "dow"),
      d => Add(WeekDay(d), Literal(1))),
    (Seq("day_of_year", "doy"), DayOfYear(_)),
    (Seq("week", "week_of_year"), WeekOfYear(_)),
    (Seq("year_of_week", "yow"), YearOfWeek(_)),
    (Seq("day_of_month"), DayOfMonth(_))
  ).flatMap { case (names, mk) =>
    names.map(name => unaryFn(name, classOf[WeekDay].getName,
      // Presto accepts date or timestamp and returns BIGINT; the Cast to
      // DateType carries the session zone for timestamps
      e => Cast(mk(Cast(e, org.apache.spark.sql.types.DateType)), LongType)))
  } ++ prestoAliases4 ++ packOverrides

  /** r19 batch 4, global half — Presto names Spark does NOT use, so the
    * session-wide registration shadows nothing:
    *
    *  - `any_match(arr, x -> p)` → ArrayExists (Spark's `exists`),
    *    `all_match` → ArrayForAll (`forall`), `none_match` →
    *    NOT exists — all three keep Presto's three-valued NULL logic
    *    (a NULL predicate result propagates unless decided by a
    *    true/false element), which is Spark's default too.
    *  - `format(fmt, args...)` → FormatString (Spark's `format_string`;
    *    both engines speak java.util.Formatter syntax).
    *  - `to_iso8601(x)` → [[graft.functions.PrestoToIso8601]] (renders
    *    by resolved input type: date `yyyy-MM-dd`, timestamp
    *    `yyyy-MM-dd'T'HH:mm:ss.SSS`; other types fail at analysis).
    *  - `from_iso8601_date(s)` → ANSI cast to DATE.
    *  - `regexp_split(s, pattern)` → StringSplit keeping trailing empty
    *    fields; 2-arg `regexp_replace(s, p)` (match REMOVAL) joins the
    *    builtin's 3/4-arg forms, which pass through unchanged.
    *
    * The CONFLICTING-semantics half of batch 4 (`regexp_extract`,
    * `split_part`, `from_unixtime`, `array_agg`, `date_format`,
    * `split`) is NOT here under its own names — those are Spark
    * builtins with different conventions, so they register under
    * reserved `__presto_*` names the pack-text rewrite targets
    * ([[packOverrides]]). */
  private def prestoAliases4: Seq[FnEntry] = Seq(
    binaryFn("any_match", classOf[ArrayExists].getName, ArrayExists(_, _)),
    binaryFn("all_match", classOf[ArrayForAll].getName, ArrayForAll(_, _)),
    // NOT(exists) would be the direct spelling, but the analyzer requires
    // a function whose arguments contain a lambda to RESOLVE to a
    // higher-order function (INVALID_LAMBDA_FUNCTION_CALL otherwise), so
    // the negation moves inside: none_match(a, p) ≡ all_match(a, NOT p),
    // identical under three-valued logic (any true → false; else a null
    // element propagates NULL; else true)
    binaryFn("none_match", classOf[ArrayForAll].getName, (a, f) => f match {
      case LambdaFunction(body, largs, hidden) =>
        ArrayForAll(a, LambdaFunction(Not(body), largs, hidden))
      case other => throw new IllegalArgumentException(
        s"none_match(arr, x -> pred) requires a lambda predicate, got $other")
    }),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("format"),
      new ExpressionInfo(classOf[FormatString].getName, "format"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty, "format(fmt, args...) takes at least one argument")
        FormatString(args: _*)
      }),
    // to_iso8601's rendering depends on the resolved input TYPE (date vs
    // timestamp), so it dispatches like PrestoContains; other types fail
    // loudly at analysis
    unaryFn("to_iso8601", classOf[graft.functions.PrestoToIso8601].getName,
      graft.functions.PrestoToIso8601(_)),
    unaryFn("from_iso8601_date", classOf[Cast].getName,
      e => Cast(e, org.apache.spark.sql.types.DateType)),
    // regexp_split is Presto's regex-delimiter split (Spark spells it
    // `split`); -1 keeps trailing empty fields, as Presto does
    binaryFn("regexp_split", classOf[StringSplit].getName,
      (s, p) => StringSplit(s, p, Literal(-1))),
    // ngrams(arr, n) — adjacent-n sub-sequences; composed as
    // transform(sequence(1, greatest(size-n+1, 1)), i -> slice(arr, i, n)).
    // Trino's edges reproduce exactly: a shorter-than-n (or empty) array
    // yields ONE gram holding the whole array (numGrams = max(len-n+1,1);
    // Spark's slice truncates at the end the same way).
    binaryFn("ngrams", classOf[ArrayTransform].getName, (a, n) => {
      val i = UnresolvedNamedLambdaVariable(Seq("__graft_ng"))
      ArrayTransform(
        Sequence(Literal(1),
          Greatest(Seq(Subtract(Add(Size(a), Literal(1)), n), Literal(1))),
          None),
        LambdaFunction(Slice(a, i, n), Seq(i)))
    }),
    // geometric_mean(x) = exp(avg(ln(x))). Divergence on non-positive
    // inputs, documented: Presto's log yields NaN and poisons the mean;
    // Spark's Log yields NULL and the row silently drops from the
    // average — callers filter x > 0 for identical answers.
    unaryFn("geometric_mean", classOf[aggregate.Average].getName,
      x => Exp(aggregate.Average(Log(x)).toAggregateExpression())),
    // Presto's 2-arg regexp_replace REMOVES matches; Spark's builtin
    // requires the replacement. 3/4-arg forms pass through with
    // identical semantics, so the replacement only ADDS the 2-arg form
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("regexp_replace"),
      new ExpressionInfo(classOf[RegExpReplace].getName, "regexp_replace"),
      (args: Seq[Expression]) => args match {
        case Seq(s, p) => RegExpReplace(s, p, Literal(""))
        case Seq(s, p, r) => RegExpReplace(s, p, r)
        case Seq(s, p, r, pos) => RegExpReplace(s, p, r, pos)
        case other => throw new IllegalArgumentException(
          s"regexp_replace takes 2-4 arguments, got ${other.length}")
      }))

  /** r19 batch 4, pack-scoped half — Presto names whose semantics
    * CONFLICT with the same-named Spark builtin. Registered GLOBALLY
    * under reserved `__presto_*` names; the pack TEXT is token-rewritten
    * onto them by [[graft.history.ScheduledQueries.rewritePackCalls]],
    * so pack text gets Presto behavior while plain `spark.sql` — and,
    * critically, every catalog VIEW a pack reads, whose text re-resolves
    * against the reading session's registry — keeps Spark's. (A
    * clone-registry override was tried first and leaked into view
    * resolution; see the rewritePackCalls Scaladoc.)
    *
    *  - `regexp_extract(s, p[, group])` → NULL when the pattern does not
    *    match (Spark returns `''` — a pack's `IS NOT NULL` gate would
    *    silently pass everything); the 2-arg form returns the WHOLE
    *    match, group 0 (Spark's 2-arg default is group 1). Residual
    *    divergence: a matched-but-nonparticipating group returns `''`
    *    here where Presto returns NULL — needs a custom expression for
    *    one exotic case, documented instead.
    *  - `split_part(s, delim, n)` → NULL when n exceeds the field count
    *    (Spark returns `''`); n <= 0 raises (Presto's INVALID_FUNCTION_
    *    ARGUMENT; Spark's 0 raises too but negatives count from the
    *    end — silently different fields, the misparse class this
    *    surface bans).
    *  - `from_unixtime(t)` → TIMESTAMP from epoch SECONDS, fractional
    *    seconds kept (Presto returns timestamp(3); Spark's builtin
    *    returns a formatted STRING). Presto's 2-arg zone / 3-arg
    *    hours-minutes forms throw loudly — mapping the zone argument
    *    onto Spark's format argument would silently misparse.
    *  - `array_agg(x)` → KEEPS NULL elements (Presto's default; Spark's
    *    collect_list drops them — a count-preserving pack aggregation
    *    would silently shrink): nulls ride a non-null struct wrapper
    *    through the collect, then unwrap.
    *  - `date_format(ts, '%Y-%m-%d...')` → MySQL tokens converted in
    *    OUTPUT mode ([[PrestoDateFormat.mysqlToJdk]] — %a/%W day names
    *    allowed, %v still banned; Spark's same-named builtin speaks JDK
    *    patterns, under which a pack's '%Y-%m-%d' renders literally).
    *  - `split(s, delim[, limit])` → delimiter regex-QUOTED (Presto's
    *    delimiter is literal, Spark's is a regex — `split(col, '.')`
    *    would silently shred); the regex spelling stays available in
    *    pack scope as `regexp_split`.
    *
    * Scala-side callers never see these: the Column API has no
    * `runPresto`, and no builtin name is ever replaced (pinned by
    * PrestoAliasSpec). */
  private def packOverrides: Seq[FnEntry] = Seq(
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("regexp_extract"),
      new ExpressionInfo(classOf[RegExpExtract].getName, "regexp_extract"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "regexp_extract(s, pattern[, group]) takes two or three arguments")
        val grp = if (args.length == 3) args(2) else Literal(0)
        If(RLike(args(0), args(1)),
          RegExpExtract(args(0), args(1), grp),
          Literal.create(null, StringType))
      }),
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("split_part"),
      new ExpressionInfo(classOf[StringSplitSQL].getName, "split_part"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "split_part(s, delimiter, index) takes three arguments")
        val idx = Cast(args(2), org.apache.spark.sql.types.IntegerType)
        If(GreaterThan(idx, Literal(0)),
          ElementAt(StringSplitSQL(args(0), args(1)), idx,
            defaultValueOutOfBound = None, failOnError = false),
          Cast(new RaiseError(Literal.create(
            "split_part index must be positive (Presto INVALID_FUNCTION_ARGUMENT)",
            StringType)), StringType))
      }),
    unaryFn("from_unixtime", classOf[SecondsToTimestamp].getName,
      e => SecondsToTimestamp(Cast(e, DoubleType))),
    // Presto's date_format speaks MySQL %-tokens (the output sibling of
    // date_parse); Spark's same-named builtin speaks JDK patterns — a
    // CloudTrail pack's '%Y-%m-%d' would render LITERALLY under Spark's.
    // Output mode allows the day-name tokens parsing must reject.
    binaryFn("date_format", classOf[DateFormatClass].getName, (ts, f) => {
      val fmt = f match {
        case Literal(v, _) if v != null =>
          PrestoDateFormat.mysqlToJdk(v.toString, forOutput = true)
        case other => throw new IllegalArgumentException(
          s"date_format format must be a string literal, got $other")
      }
      DateFormatClass(Cast(ts, TimestampType), Literal.create(fmt,
        org.apache.spark.sql.types.StringType))
    }),
    // Presto's split delimiter is LITERAL; Spark's same-named builtin
    // treats it as a REGEX — a pack's split(col, '.') or split(col, '|')
    // would silently shred every row (the split_to_map hazard class).
    // Presto's optional limit shares Spark's remainder-in-last-element
    // semantics; no limit = keep all fields incl. trailing empties (-1).
    (new org.apache.spark.sql.catalyst.FunctionIdentifier("split"),
      new ExpressionInfo(classOf[StringSplit].getName, "split"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "split(s, delimiter[, limit]) takes two or three arguments")
        val quoted = args(1) match {
          case Literal(v, StringType) if v != null =>
            Literal.create(java.util.regex.Pattern.quote(v.toString),
              StringType)
          case other => throw new IllegalArgumentException(
            s"split delimiter must be a string literal (Presto's is " +
              s"literal, Spark's is a regex), got $other")
        }
        StringSplit(args(0), quoted,
          if (args.length == 3) args(2) else Literal(-1))
      }),
    unaryFn("array_agg", classOf[aggregate.CollectList].getName, { x =>
      val collected = aggregate.CollectList(
        CreateNamedStruct(Seq(Literal("__v"), x))).toAggregateExpression()
      val e = UnresolvedNamedLambdaVariable(Seq("__graft_av"))
      ArrayTransform(collected, LambdaFunction(
        org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
          e, Literal("__v")), Seq(e)))
    })).map { case (id, info, b) =>
    (new org.apache.spark.sql.catalyst.FunctionIdentifier(
      "__presto_" + id.funcName), info, b)
  }

  private def unaryFn(name: String, className: String,
      mk: Expression => Expression): FnEntry =
    (new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new ExpressionInfo(className, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name takes one argument")
        mk(args.head)
      })

  private def urlFn(name: String, part: String): FnEntry =
    (new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new ExpressionInfo(classOf[ParseUrl].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name(url) takes one argument")
        ParseUrl(Seq(args.head, Literal.create(part,
          org.apache.spark.sql.types.StringType)), failOnError = false)
      })

  private def binaryFn(name: String, className: String,
      mk: (Expression, Expression) => Expression): FnEntry =
    (new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new ExpressionInfo(className, name),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name takes two arguments")
        mk(args(0), args(1))
      })
}
