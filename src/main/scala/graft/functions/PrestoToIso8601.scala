package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, DateFormatClass,
  Expression, Literal, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DateType, StringType, TimestampType}

/** Presto's `to_iso8601(x)` — the output format depends on the INPUT
  * TYPE (a date renders `yyyy-MM-dd`, a timestamp
  * `yyyy-MM-dd'T'HH:mm:ss.SSS` — presto.io datetime docs, public), so
  * a parse-time alias cannot pick one formatting expression; this
  * dispatches on the resolved child type instead (the
  * [[PrestoContains]] pattern). Any other input type fails loudly at
  * analysis — Presto only accepts date/timestamp, and silently casting
  * a string would hide a pack bug. RuntimeReplaceable keeps the
  * replacement fully codegen'd. */
case class PrestoToIso8601(child: Expression)
    extends Expression with RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case DateType => Cast(child, StringType) // ISO yyyy-MM-dd already
    case TimestampType =>
      // the zone must be supplied here: ResolveTimeZone walks plan
      // children, and a RuntimeReplaceable's lazy replacement is not one
      DateFormatClass(child, Literal("yyyy-MM-dd'T'HH:mm:ss.SSS"),
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    case other => throw new IllegalArgumentException(
      s"to_iso8601 expects a date or timestamp argument, got $other")
  }

  override def prettyName: String = "to_iso8601"

  override protected def withNewChildInternal(
      newChild: Expression): PrestoToIso8601 = copy(child = newChild)
}
