package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import graft.core.FieldType
import scala.jdk.CollectionConverters._

/** Native strict-schema JSON validation in ONE Jackson pass — the custom
  * Catalyst expression for the classifier's hottest non-separable path.
  *
  * Inside `exists(children, ...)` lambdas (json_path schemas) the per-child
  * validity cannot be materialized as a column, so the pure-Column
  * formulation re-parses the child for every field check (~40 interpreted
  * from_json/json_object_keys evaluations per child — all CodegenFallback).
  * This expression parses once and walks the tree, implementing the same
  * semantics as CompiledSchema's column path: strict key-set equality with
  * optionals (parsers.py:256-272), recursive nested struct checks, and
  * coercion-failure detection matching the try_cast behavior
  * (parsers.py:294-369 with falsey-skip).
  */
case class JsonSchemaValid(
    child: Expression,
    schema: FieldType.TStruct,
    optionals: Set[String]) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "json_schema_valid"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && JsonSchemaValid.validate(v.toString, schema, optionals)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonSchemaValid =
    copy(child = newChild)
}

object JsonSchemaValid {
  @transient private lazy val mapper = new ObjectMapper()

  def column(c: Column, schema: FieldType.TStruct, optionals: Set[String]): Column =
    GraftColumnBridge.toColumn(
      JsonSchemaValid(GraftColumnBridge.toExpression(c), schema, optionals))

  def validate(json: String, schema: FieldType.TStruct, optionals: Set[String]): Boolean = {
    val node = try mapper.readTree(json) catch { case _: Exception => return false }
    node != null && checkStruct(node, schema, optionals)
  }

  private def checkStruct(node: JsonNode, schema: FieldType.TStruct,
      optionals: Set[String]): Boolean = {
    if (!node.isObject) return false
    val keys = node.properties().asScala.map(_.getKey).toSet
    // record keys ∪ optionals == schema keys
    if (!keys.subsetOf(schema.keys)) return false
    if (!(schema.keys -- optionals).subsetOf(keys)) return false
    schema.fields.forall { case (name, ft) =>
      val v = node.get(name)
      if (v == null) true // absent optional
      else checkField(v, ft, optionals.contains(name))
    }
  }

  /** Mirrors the column path: leaves read as their raw TEXT, falsey values
    * skipped, numeric coercion = strict integral/floating parse of the
    * text (same outcome as try_cast on the stringified leaf). */
  private def checkField(v: JsonNode, ft: FieldType, optional: Boolean): Boolean = ft match {
    case FieldType.TString | FieldType.TBoolean => true
    case FieldType.TAnyMap => true
    // column path is permissive for lists (from_json nulls a non-array);
    // matching it keeps both validity paths in agreement
    case FieldType.TList => true
    case nested: FieldType.TStruct =>
      if (v.isNull) optional else checkStruct(v, nested, Set.empty)
    case FieldType.TInteger =>
      if (v.isNull) true
      else if (v.isContainerNode) false // raw JSON text never casts
      else {
        val t = v.asText.trim
        t.isEmpty || scala.util.Try(java.lang.Long.parseLong(t)).isSuccess
      }
    case FieldType.TFloat =>
      if (v.isNull) true
      else if (v.isContainerNode) false
      else {
        val t = v.asText.trim
        // match Spark's string→double cast exactly: it additionally accepts
        // case-insensitive inf/+inf/-inf/infinity/nan, which
        // Double.parseDouble alone rejects (probed against try_cast)
        val special = t.toLowerCase.stripPrefix("+").stripPrefix("-") match {
          case "inf" | "infinity" | "nan" => true
          case _ => false
        }
        t.isEmpty || special ||
          scala.util.Try(java.lang.Double.parseDouble(t)).isSuccess
      }
  }
}
