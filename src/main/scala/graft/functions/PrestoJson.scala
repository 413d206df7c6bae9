package graft.functions

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Presto-faithful `json_extract` / `json_extract_scalar` — the dialect
  * gap the r17 alias conceded (both names were mapped to Spark's
  * unquoting `get_json_object`). Presto's contract, which a user pack
  * that round-trips extracted JSON depends on
  * (reference behavior: scheduled_queries accepts arbitrary Athena SQL,
  * scheduled_queries/query_packs/configuration.py:20-56):
  *
  *  - `json_extract(json, path)` returns the JSON-ENCODED value: a
  *    string scalar KEEPS its quotes (and escapes), objects/arrays
  *    return as JSON text with field order preserved, a JSON `null`
  *    returns the text `null`; SQL NULL only for a missing path or
  *    unparseable document.
  *  - `json_extract_scalar(json, path)` returns the UNQUOTED scalar as
  *    varchar, and SQL NULL when the value is an object, an array, or
  *    JSON `null` (get_json_object instead returns objects/arrays as
  *    text — the second half of the conceded divergence).
  *
  * Floats deserialize as BigDecimal so literal number text round-trips
  * (`1.50` stays `1.50`, matching Presto's token-copying extractor and
  * DuckDB's yyjson). Path syntax is the Presto subset: `$`, `.field`,
  * `['field']` / `["field"]`, `[index]`; a malformed PATH throws (as
  * Presto's INVALID_FUNCTION_ARGUMENT does), malformed JSON yields NULL. */
case class PrestoJsonExtract(left: Expression, right: Expression,
    scalarMode: Boolean) extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (scalarMode) "json_extract_scalar" else "json_extract"

  override def nullSafeEval(json: Any, path: Any): Any =
    PrestoJsonUtil.extract(json.asInstanceOf[UTF8String],
      path.asInstanceOf[UTF8String], scalarMode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, p) => {
      s"""
         |${ev.value} = graft.functions.PrestoJsonUtil.extract($j, $p, $scalarMode);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrestoJsonExtract =
    copy(left = newLeft, right = newRight)
}

/** Presto-faithful `json_parse(varchar)` / `json_format(json)` — in this
  * engine's JSON-as-text representation both are the same operation:
  * validate and re-serialize to compact JSON text (field order preserved,
  * BigDecimal number round-trip, the [[PrestoJsonExtract]] encoder).
  * INVALID JSON THROWS, as Presto's json_parse does
  * (INVALID_FUNCTION_ARGUMENT) — returning SQL NULL would be the silent
  * misparse class the dialect batch bans; `TRY(json_parse(x))` gives the
  * null-on-bad-input form, exactly as in Presto. `fnName` keeps error
  * messages honest for whichever alias was called. */
case class PrestoJsonParse(child: Expression, fnName: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = fnName

  override def nullSafeEval(json: Any): Any =
    PrestoJsonUtil.parseCanonical(json.asInstanceOf[UTF8String], fnName)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = ctx.addReferenceObj("fnName", fnName, "java.lang.String")
    nullSafeCodeGen(ctx, ev, j =>
      s"${ev.value} = graft.functions.PrestoJsonUtil.parseCanonical($j, $fn);")
  }

  override protected def withNewChildInternal(newChild: Expression): PrestoJsonParse =
    copy(child = newChild)
}

object PrestoJsonUtil {
  // readTree on a shared mapper is thread-safe; BigDecimal floats (with
  // the exact-decimals node factory — the default one strips trailing
  // zeros) keep the literal's scale so re-serialization round-trips
  // number text the way Presto's token-copying extractor does
  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)
    .setNodeFactory(com.fasterxml.jackson.databind.node.JsonNodeFactory
      .withExactBigDecimals(true))

  private sealed trait Step
  private final case class Field(name: String) extends Step
  private final case class Index(i: Int) extends Step

  // paths are almost always literals — one entry per distinct path text,
  // with a hard cap so a pathological dynamic-path query cannot leak
  private val pathCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Step]]()
  private val PathCacheCap = 1024

  /** `$`, then any sequence of `.name`, `['name']`, `["name"]`, `[int]`.
    * Throws IllegalArgumentException on anything else. */
  private def parsePath(path: String): Array[Step] = {
    val cached = pathCache.get(path)
    if (cached != null) return cached
    val s = path.trim
    require(s.nonEmpty && s.charAt(0) == '$', s"invalid JSON path: '$path'")
    val steps = scala.collection.mutable.ArrayBuffer.empty[Step]
    var i = 1
    while (i < s.length) {
      s.charAt(i) match {
        case '.' =>
          val start = i + 1
          var j = start
          while (j < s.length && s.charAt(j) != '.' && s.charAt(j) != '[') j += 1
          require(j > start, s"empty field name in JSON path: '$path'")
          steps += Field(s.substring(start, j))
          i = j
        case '[' =>
          val end = s.indexOf(']', i)
          require(end > i + 1, s"unterminated bracket in JSON path: '$path'")
          val inner = s.substring(i + 1, end).trim
          if ((inner.startsWith("'") && inner.endsWith("'") && inner.length >= 2) ||
              (inner.startsWith("\"") && inner.endsWith("\"") && inner.length >= 2)) {
            steps += Field(inner.substring(1, inner.length - 1))
          } else {
            val idx = try inner.toInt catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"invalid bracket step '$inner' in JSON path: '$path'")
            }
            require(idx >= 0, s"negative index in JSON path: '$path'")
            steps += Index(idx)
          }
          i = end + 1
        case c => throw new IllegalArgumentException(
          s"unexpected '$c' in JSON path: '$path'")
      }
    }
    val arr = steps.toArray
    if (pathCache.size < PathCacheCap) pathCache.put(path, arr)
    arr
  }

  /** Codegen entry point for [[PrestoJsonParse]]: compact canonical
    * re-serialization, field order preserved; invalid JSON throws. */
  def parseCanonical(json: UTF8String, fnName: String): UTF8String = {
    val root = try mapper.readTree(json.toString) catch {
      case e: com.fasterxml.jackson.core.JacksonException =>
        throw new IllegalArgumentException(
          s"$fnName: invalid JSON text: ${e.getOriginalMessage}")
    }
    if (root == null) throw new IllegalArgumentException(
      s"$fnName: invalid JSON text: empty input")
    UTF8String.fromString(root.toString)
  }

  /** Codegen entry point (called from generated Java). Null = SQL NULL. */
  def extract(json: UTF8String, path: UTF8String,
      scalarMode: Boolean): UTF8String = {
    val steps = parsePath(path.toString) // malformed path throws (Presto contract)
    val root = try mapper.readTree(json.toString) catch {
      case _: com.fasterxml.jackson.core.JacksonException => return null
    }
    if (root == null) return null // empty input
    var node: JsonNode = root
    var i = 0
    while (i < steps.length) {
      if (node == null) return null
      steps(i) match {
        case Field(name) =>
          node = if (node.isObject) node.get(name) else null
        case Index(idx) =>
          node = if (node.isArray) node.get(idx) else null
      }
      i += 1
    }
    if (node == null || node.isMissingNode) null
    else if (scalarMode) {
      // scalar varchar, SQL NULL for object/array/JSON-null
      if (node.isTextual) UTF8String.fromString(node.textValue())
      else if (node.isNumber || node.isBoolean) UTF8String.fromString(node.asText())
      else null
    } else {
      // JSON-encoded text: quotes kept, field order preserved, compact
      UTF8String.fromString(node.toString)
    }
  }
}
