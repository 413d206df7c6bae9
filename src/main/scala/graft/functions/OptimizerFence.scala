package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression that reports itself nondeterministic — an explicit
  * optimizer fence.
  *
  * Why it exists: `from_json`/`from_csv`/`to_json` are CodegenFallback, so
  * any predicate containing them is interpreted with NO subexpression
  * elimination. PushDownPredicates inlines alias definitions when pushing a
  * filter through deterministic projections, so a filter over a classified
  * column (e.g. `log_schema_type = 'x'`) gets rewritten into a scan-level
  * predicate that re-evaluates the ENTIRE parse per field reference — a
  * measured ~7× slowdown on the classify path. Wrapping the classified
  * column in a fence keeps such filters above the projection that
  * materializes the parse, preserving evaluate-once semantics. The value is
  * bit-for-bit the child's value; only the optimizer's visibility changes.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_fence"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizerFence =
    copy(child = newChild)
}

object OptimizerFence {
  def fence(c: Column): Column =
    GraftColumnBridge.toColumn(OptimizerFence(GraftColumnBridge.toExpression(c)))
}
