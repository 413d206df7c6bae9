package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayContains, Cast, Contains, Expression, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Presto's `contains(array, x)` without shadowing Spark's own
  * `contains(str, substr)` builtin: the injected `contains` alias
  * ([[graft.plans.GraftExtensions]]) REPLACES the registry entry, so a
  * plain-name mapping to array_contains would silently break every
  * string caller on the session. This dispatches on the resolved type of
  * the first argument instead — array input gets Presto's membership
  * test (element-type coercion applied the way the analyzer would),
  * anything else falls through to Spark's string semantics. Registered
  * functions bypass the analyzer's function-resolution coercion, hence
  * the manual Cast; RuntimeReplaceable keeps the replacement fully
  * codegen'd (the optimizer swaps it in before execution). */
case class PrestoContains(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression] {

  override lazy val replacement: Expression = left.dataType match {
    case ArrayType(et, _) =>
      ArrayContains(left, if (right.dataType == et) right else Cast(right, et))
    case _ =>
      Contains(
        if (left.dataType == StringType) left else Cast(left, StringType),
        if (right.dataType == StringType) right else Cast(right, StringType))
  }

  override def prettyName: String = "contains"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrestoContains =
    copy(left = newLeft, right = newRight)
}
