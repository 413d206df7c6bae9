package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing selection: the DISTINCT sliding-window minima of a gram-hash
  * array, as a codegen'd expression. Replaces the
  * `transform(sequence) + slice + array_min` formulation, which was
  * interpreted AND O(T·window) with a fresh slice allocation per window;
  * this is the classic monotone-deque O(T) pass. Comparison is
  * UTF8String byte order — identical to lexicographic order on the
  * md5-hex grams, so the selected fingerprint SET (and the d10 oracle)
  * is unchanged: ties are equal strings, and equal minima dedupe either
  * way. Windows match the original indexing: max(T−window, 0)+1 windows,
  * a short array yielding the min of the whole array. */
case class WinnowMins(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 1, s"winnow window must be >= 1: $window")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_mins"

  override def nullSafeEval(input: Any): Any =
    WinnowMins.select(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, grams =>
      s"${ev.value} = graft.functions.WinnowMins.select($grams, $window);")

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

object WinnowMins {
  /** Shared by the interpreted and generated paths. */
  def select(grams: ArrayData, window: Int): ArrayData = {
    val n = grams.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (n > 0 && n <= window) {
      var min = grams.getUTF8String(0)
      var i = 1
      while (i < n) {
        val v = grams.getUTF8String(i)
        if (v.compareTo(min) < 0) min = v
        i += 1
      }
      out.add(min)
    } else if (n > 0) {
      // monotone deque of indices, values increasing front to back
      val dq = new Array[Int](n)
      var head = 0
      var tail = 0 // exclusive
      var i = 0
      while (i < n) {
        val v = grams.getUTF8String(i)
        while (tail > head && grams.getUTF8String(dq(tail - 1)).compareTo(v) >= 0)
          tail -= 1
        dq(tail) = i
        tail += 1
        if (dq(head) <= i - window) head += 1
        if (i >= window - 1) out.add(grams.getUTF8String(dq(head)))
        i += 1
      }
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  def winnow_mins(grams: Column, window: Int): Column =
    GraftColumnBridge.toColumn(WinnowMins(
      GraftColumnBridge.toExpression(grams), window))
}
