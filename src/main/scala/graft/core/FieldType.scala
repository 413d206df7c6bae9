package graft.core

import org.apache.spark.sql.types._
import scala.collection.immutable.ListMap

/** The declared type system of the reference engine.
  *
  * Reference: streamalert/classifier/parsers.py:65-70 (`_TYPE_MAP`:
  * string/integer/float/boolean), nested dict schemas (parsers.py:274-292),
  * untyped lists (parsers.py:357-363), and `{}` open maps
  * (conf/schemas/cloudwatch.json:4, parsers.py:240-242).
  *
  * Spark mapping (SURVEY.md §1.2): StringType, LongType, DoubleType,
  * BooleanType, StructType, ArrayType(StringType), MapType(String,String).
  */
sealed trait FieldType {
  def toSpark: DataType = this match {
    case FieldType.TString     => StringType
    case FieldType.TInteger    => LongType
    case FieldType.TFloat      => DoubleType
    case FieldType.TBoolean    => BooleanType
    case FieldType.TList       => ArrayType(StringType, containsNull = true)
    case FieldType.TAnyMap     => MapType(StringType, StringType, valueContainsNull = true)
    case FieldType.TStruct(fs) =>
      StructType(fs.map { case (n, t) => StructField(n, t.toSpark, nullable = true) }.toSeq)
  }

  /** Zero value used to back-fill absent optional keys
    * (parsers.py:138-142 `default_optional_values`: str()="" int()=0 etc.). */
  def zeroLiteral: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    this match {
      case FieldType.TString  => lit("")
      case FieldType.TInteger => lit(0L)
      case FieldType.TFloat   => lit(0.0)
      case FieldType.TBoolean => lit(false)
      case FieldType.TList    => array().cast(ArrayType(StringType))
      case FieldType.TAnyMap  => map().cast(MapType(StringType, StringType))
      case s: FieldType.TStruct => lit(null).cast(s.toSpark)
    }
  }
}

object FieldType {
  case object TString extends FieldType
  case object TInteger extends FieldType
  case object TFloat extends FieldType
  case object TBoolean extends FieldType
  /** Untyped list — "we do not currently support type checking list
    * elements" (parsers.py:357-363). */
  case object TList extends FieldType
  /** `{}` in a schema = any dict, key-check skipped (parsers.py:240-242). */
  case object TAnyMap extends FieldType
  final case class TStruct(fields: ListMap[String, FieldType]) extends FieldType {
    def keys: Set[String] = fields.keySet.toSet
  }

  object TStruct {
    def of(fs: (String, FieldType)*): TStruct = TStruct(ListMap(fs: _*))
  }

  /** Parse the conf/schemas JSON type notation:
    * "string"|"integer"|"float"|"boolean", [] lists, {} open maps,
    * {k: type, ...} nested structs. */
  def fromConf(node: com.fasterxml.jackson.databind.JsonNode): FieldType = {
    import scala.jdk.CollectionConverters._
    if (node.isTextual) node.asText match {
      case "string"  => TString
      case "integer" => TInteger
      case "float"   => TFloat
      case "boolean" => TBoolean
      case other     => throw new IllegalArgumentException(s"unknown type: $other")
    }
    else if (node.isArray) TList
    else if (node.isObject) {
      if (!node.fields().hasNext) TAnyMap
      else TStruct(ListMap(node.fields().asScala.map(e => e.getKey -> fromConf(e.getValue)).toSeq: _*))
    }
    else throw new IllegalArgumentException(s"unsupported schema node: $node")
  }
}
