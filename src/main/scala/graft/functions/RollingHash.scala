package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Rabin-Karp style) over a string column — the
  * document-fingerprinting primitive, as a NATIVE Catalyst expression with
  * whole-stage codegen (`doGenCode`), not a UDF: no boxing, no closure
  * serialization, stays inside the generated loop.
  *
  * hash = Σ byte_i · B^i  mod P  (B=257, P=2^61−1), computed left-to-right
  * with Horner's rule. Same constants on every executor — deterministic
  * across partitions/replays.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.hash($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val B = 257L
  final val P = (1L << 61) - 1 // Mersenne prime; mod via shift-add

  /** Horner evaluation with Mersenne-prime modular reduction (branch-free,
    * no division — the hot-loop body whole-stage codegen inlines). */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // h = (h * B + byte) mod P, using 2^61-1 shift-add reduction
      val hi = Math.multiplyHigh(h, B)
      val lo = h * B
      var t = (lo & P) + ((hi << 3) | (lo >>> 61)) + (bytes(i) & 0xFFL)
      if (t >= P) t -= P
      h = t
      i += 1
    }
    h
  }

  /** Column surface. */
  def rolling_hash(c: Column): Column =
    GraftColumnBridge.toColumn(RollingHash(GraftColumnBridge.toExpression(c)))
}
