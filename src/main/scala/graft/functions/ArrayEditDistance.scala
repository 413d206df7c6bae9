package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Levenshtein distance over TOKEN arrays (unit insert/delete/
  * substitute) as a codegen'd Catalyst expression — the WER kernel.
  * Spark's builtin `levenshtein` is CHARACTER-level on strings; word
  * error rate needs the same DP over token sequences, which no Column
  * composition can express (the [[LcsLength]] argument: the DP row has
  * a sequential dependence HOFs can't write without O(n·m²) churn).
  * Same two-row int[] DP, same cost contract (O(|a|·|b|) per row — an
  * eval metric for utterance/sentence-scale arrays), same null
  * semantics (null arrays null the result; null elements match
  * nothing, so they always cost an edit). */
case class ArrayEditDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_edit_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      val av: UTF8String =
        if (x.isNullAt(i - 1)) null else x.getUTF8String(i - 1)
      var j = 1
      while (j <= m) {
        val same = av != null && !y.isNullAt(j - 1) &&
          av.equals(y.getUTF8String(j - 1))
        val sub = prev(j - 1) + (if (same) 0 else 1)
        cur(j) = math.min(sub, math.min(prev(j) + 1, cur(j - 1) + 1))
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      val tmp = ctx.freshName("tmp")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val av = ctx.freshName("av")
      val same = ctx.freshName("same")
      val sub = ctx.freshName("sub")
      val utf8 = classOf[UTF8String].getName
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int[] $prev = new int[$m + 1];
         |int[] $cur = new int[$m + 1];
         |for (int $j = 0; $j <= $m; $j++) $prev[$j] = $j;
         |for (int $i = 1; $i <= $n; $i++) {
         |  $cur[0] = $i;
         |  final $utf8 $av =
         |    $a.isNullAt($i - 1) ? null : $a.getUTF8String($i - 1);
         |  for (int $j = 1; $j <= $m; $j++) {
         |    final boolean $same = $av != null && !$b.isNullAt($j - 1) &&
         |      $av.equals($b.getUTF8String($j - 1));
         |    final int $sub = $prev[$j - 1] + ($same ? 0 : 1);
         |    $cur[$j] = Math.min($sub,
         |      Math.min($prev[$j] + 1, $cur[$j - 1] + 1));
         |  }
         |  final int[] $tmp = $prev; $prev = $cur; $cur = $tmp;
         |}
         |${ev.value} = $prev[$m];
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayEditDistance =
    copy(left = newLeft, right = newRight)
}

object ArrayEditDistance {
  def column(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(
      ArrayEditDistance(GraftColumnBridge.toExpression(a),
        GraftColumnBridge.toExpression(b)))
}
