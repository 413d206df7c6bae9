package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature from per-shingle 64-bit base hashes, as a codegen'd
  * Catalyst expression. Replaces the `aggregate(zip_with(zip_with(...)))`
  * fold in Dedup.minhashSignatureFromHashes, which allocated three arrays
  * per SHINGLE per row in the CodegenFallback interpreter — the dominant
  * cost of the signature stage once string hashing was hoisted out.
  *
  * Permutation proxies are IDENTICAL to the HOF formulation: for
  * permutation p, value = rotl(h XOR a_p, r_p) with the same mixA/mixR
  * constants (Java `<<`/`>>>` are exactly Spark's shiftleft /
  * shiftrightunsigned for 1 <= r <= 63), min-folded per permutation —
  * min is order-insensitive, so signatures are bit-equal and every
  * minhash oracle hash is unchanged. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig"

  private def mixA(i: Int): Long = MinHashSig.mixA(i)
  private def mixR(i: Int): Int = MinHashSig.mixR(i)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var p = 0
      while (p < numHashes) {
        val x = h ^ mixA(p)
        val r = mixR(p)
        val v = (x << r) | (x >>> (64 - r))
        if (v < out(p)) out(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val as = ctx.addReferenceObj("mixAs",
      (0 until numHashes).map(mixA).toArray, "long[]")
    val rs = ctx.addReferenceObj("mixRs",
      (0 until numHashes).map(mixR).toArray, "int[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |int $n = $hs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $p = 0; $p < $numHashes; $p++) {
         |    long $x = $h ^ $as[$p];
         |    long $v = ($x << $rs[$p]) | ($x >>> (64 - $rs[$p]));
         |    if ($v < $out[$p]) $out[$p] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  // the EXACT constants Dedup's HOF formulation used
  def mixA(i: Int): Long = 0x9E3779B97F4A7C15L ^ (0xBF58476D1CE4E5B9L * (i + 1L))
  def mixR(i: Int): Int = (i * 7 % 63) + 1

  def minhash_sig(baseHashes: Column, numHashes: Int): Column =
    GraftColumnBridge.toColumn(MinHashSig(
      GraftColumnBridge.toExpression(baseHashes), numHashes))
}
