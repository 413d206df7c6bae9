package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence length over two token arrays as a
  * CODEGEN'D Catalyst expression — the kernel of ROUGE-L. There is no
  * Column-function composition for LCS (the DP row has a sequential
  * dependence no higher-order function can express without O(n·m²)
  * array churn), so this is the (b)-tier custom-Expression case:
  * a tight primitive int[] two-row DP, no boxing, no closures.
  *
  * Cost contract: O(|a|·|b|) time per row, O(|b|) ints of scratch —
  * ROUGE-L is a generation-eval metric, run on candidate/reference
  * texts (10²–10³ tokens), not corpus documents; for document-scale
  * overlap use the n-gram family ([[graft.pipeline.Eval.rougeN]]),
  * which is linear. Null ARRAY inputs null the result (BinaryExpression
  * default); null ELEMENTS match nothing. */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "lcs_length"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val av: UTF8String =
        if (x.isNullAt(i)) null else x.getUTF8String(i)
      var j = 0
      while (j < m) {
        if (av != null && !y.isNullAt(j) && av.equals(y.getUTF8String(j))) {
          cur(j + 1) = prev(j) + 1
        } else {
          cur(j + 1) = math.max(prev(j + 1), cur(j))
        }
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
      val utf8 = classOf[UTF8String].getName
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int[] $prev = new int[$m + 1];
         |int[] $cur = new int[$m + 1];
         |for (int $i = 0; $i < $n; $i++) {
         |  final $utf8 $av = $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($av != null && !$b.isNullAt($j) &&
         |        $av.equals($b.getUTF8String($j))) {
         |      $cur[$j + 1] = $prev[$j] + 1;
         |    } else {
         |      $cur[$j + 1] = Math.max($prev[$j + 1], $cur[$j]);
         |    }
         |  }
         |  final int[] $tmp = $prev; $prev = $cur; $cur = $tmp;
         |}
         |${ev.value} = $prev[$m];
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsLength {
  def column(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(
      LcsLength(GraftColumnBridge.toExpression(a),
        GraftColumnBridge.toExpression(b)))
}
