package graft.classify

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{NormCondition, NormalizedField}

/** Normalization v2 (streamalert/shared/normalize.py:175-334): extract
  * configured paths from the typed record into a canonical map column
  *
  *   streamalert_normalization:
  *     map<string, array<struct<values array<string>, function string,
  *                             send_to_artifacts boolean>>>
  *
  * plus `streamalert_record_id` (normalize.py:178-179,218). Entirely
  * Column-level: conditions (normalize.py:279-318) become `when` guards,
  * path walks become struct field accesses resolved at plan time — per-row
  * cost is a handful of codegen'd expressions, vs the reference's recursive
  * Python dict walk.
  */
object Normalizer {
  val NormalizationKey = "streamalert_normalization"
  val RecordIdKey = "streamalert_record_id"

  val entryType: DataType = ArrayType(StructType(Seq(
    StructField("values", ArrayType(StringType)),
    StructField("function", StringType),
    StructField("send_to_artifacts", BooleanType))))

  /** Schema-aware path walk. The reference digs through schemaless dicts
    * (normalize.py:224-238); our typed records flatten `{}`-declared open
    * maps to map<string,string> whose nested objects are raw JSON text — so
    * a path crossing an open map continues via get_json_object, and a path
    * descending into a scalar yields null (the reference's "not found"). */
  private def walk(record: Column, path: Seq[String],
      schema: Option[graft.core.FieldType] = None): Column = {
    import graft.core.FieldType._
    def go(c: Column, t: Option[graft.core.FieldType], rest: Seq[String]): Column = rest match {
      case Seq() => c
      case p +: tail => t match {
        case Some(TStruct(fs)) if fs.contains(p) => go(c.getField(p), Some(fs(p)), tail)
        case Some(TStruct(_)) => lit(null).cast(StringType) // undeclared key
        case Some(TAnyMap) =>
          val v = element_at(c, p)
          if (tail.isEmpty) v else get_json_object(v, "$." + tail.mkString("."))
        case Some(_) => lit(null).cast(StringType) // walked into a scalar/list
        case None => go(c.getField(p), None, tail) // schemaless fallback
      }
    }
    go(record, schema, path)
  }

  /** Python falsey semantics of `_find_value` (normalize.py:224-238):
    * None / '' / 0 / 0.0 / False / [] all read as "not found". */
  private def isFalsey(c: Column): Column = {
    val s = c.cast(StringType)
    c.isNull || s === "" || s === "0" || s === "0.0" || lower(s) === "false" || s === "[]"
  }

  private def conditionOk(record: Column, cond: NormCondition,
      schema: Option[graft.core.FieldType.TStruct]): Column = {
    val v = lower(walk(record, cond.path, schema).cast(StringType))
    val present = !isFalsey(walk(record, cond.path, schema))
    val opExpr = cond.op match {
      case "is"           => v === cond.operand.head
      case "is_not"       => v =!= cond.operand.head
      case "in"           => v.isin(cond.operand: _*)
      case "not_in"       => !v.isin(cond.operand: _*)
      case "contains"     => v.contains(cond.operand.head)
      case "not_contains" => !v.contains(cond.operand.head)
      case other => throw new IllegalArgumentException(s"unknown condition op: $other")
    }
    present && opExpr
  }

  /** One normalized-type entry: array of result structs for each configured
    * path whose condition passes and whose value is present (non-falsey).
    * Lists keep their elements; scalars are stringified (normalize.py:262-277). */
  private def entriesFor(record: Column, fields: Seq[NormalizedField],
      schema: Option[graft.core.FieldType.TStruct]): Column = {
    val structs = fields.map { f =>
      val target = walk(record, f.path, schema)
      // list-ness comes from the DECLARED schema (resolution hasn't run yet)
      val declared = schema.flatMap(st => f.path.foldLeft(
        Option(st): Option[graft.core.FieldType]) {
          case (Some(graft.core.FieldType.TStruct(fs)), p) => fs.get(p)
          case _ => None
        })
      val isList = declared.contains(graft.core.FieldType.TList)
      val valuesCol =
        if (isList) target.cast(ArrayType(StringType))
        else array(target.cast(StringType))
      val gate = !isFalsey(target) &&
        f.condition.map(conditionOk(record, _, schema)).getOrElse(lit(true))
      when(gate, struct(
        valuesCol.as("values"),
        f.function.map(lit).getOrElse(lit(null).cast(StringType)).as("function"),
        lit(f.sendToArtifacts).as("send_to_artifacts")))
    }
    array_compact(array(structs: _*)).cast(entryType)
  }

  /** The normalization map column for one log type's config. Types with no
    * extracted values are absent from the map (normalize.py:211-215). */
  def normalizationCol(record: Column, config: Map[String, Seq[NormalizedField]],
      schema: Option[graft.core.FieldType.TStruct] = None): Column = {
    if (config.isEmpty) return map().cast(MapType(StringType, entryType))
    val keys = config.keys.toSeq
    val m = map_from_arrays(
      array(keys.map(lit): _*),
      array(keys.map(k => entriesFor(record, config(k), schema)): _*))
    // fenced: keeps explode-inferred filters (size>0) from re-inlining the
    // whole map construction into upstream predicates
    graft.functions.OptimizerFence.fence(map_filter(m, (_, v) => size(v) > 0))
  }

  /** streamalert_record_id (normalize.py:218): uuid per record when anything
    * normalized; deterministic variant for replayable tests. */
  def recordIdCol(normCol: Column, deterministicFrom: Option[Column] = None): Column = {
    val id = deterministicFrom.map(c => md5(c.cast(StringType))).getOrElse(expr("uuid()"))
    when(size(map_keys(normCol)) > 0, id)
  }

  /** get_values_for_normalized_type (normalize.py:336-352): set-union of all
    * paths' values for a type — the datatype-rule read surface (R5). */
  def valuesForNormalizedType(normCol: Column, datatype: String): Column =
    array_distinct(flatten(transform(
      coalesce(element_at(normCol, datatype), array().cast(entryType)),
      e => e.getField("values"))))
}
