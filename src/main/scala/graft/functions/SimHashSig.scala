package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash from per-token base hashes as a codegen'd expression —
  * replaces the 64-wide `aggregate(zip_with(...))` majority-vote fold
  * (one interpreted zip per TOKEN per row). Semantics identical to the
  * HOF formulation: bit b votes +1 when `(h >> b) & 1 == 1` (Java `>>`
  * is exactly Spark's shiftright) else −1, and the fingerprint sets bit
  * b when its vote total is strictly positive — fingerprints are
  * bit-equal, so the d3 oracle family is unchanged. */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0L) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val fp = ctx.freshName("fp")
      s"""
         |long[] $votes = new long[64];
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += ((($h >> $b) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0L) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def simhash_sig(baseHashes: Column): Column =
    GraftColumnBridge.toColumn(SimHashSig(
      GraftColumnBridge.toExpression(baseHashes)))
}
