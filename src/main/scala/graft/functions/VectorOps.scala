package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ aᵢ·bᵢ over two float/double arrays as a CODEGEN'D Catalyst
  * expression — the hot kernel of every cosine verify and ANN scoring
  * path. The HOF formulation (`aggregate(zip_with(...))`) is
  * CodegenFallback: per row it allocates the zipped array and walks an
  * interpreter over closures, which dominates candidate-verify joins
  * that evaluate hundreds of thousands of pairs. This compiles to a
  * tight primitive loop.
  *
  * Null semantics MATCH the HOF chain exactly (hash-compared oracles
  * depend on it): any null element — including the padding nulls
  * zip_with adds when lengths differ — nulls the whole sum; products
  * accumulate left-to-right in doubles, so results are bit-identical. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val (tx, ty) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = tx match {
        case FloatType => x.getFloat(i).toDouble
        case _ => x.getDouble(i)
      }
      val yv = ty match {
        case FloatType => y.getFloat(i).toDouble
        case _ => y.getDouble(i)
      }
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      def get(arr: String, t: DataType): String = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $sum = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $sum += ${get(a, elemType(left))} * ${get(b, elemType(right))};
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² — the squared-L2 twin of [[DotProduct]], same codegen
  * rationale and identical-to-HOF accumulation/null semantics. The IVF /
  * PQ / k-means argmins evaluate this per row × centroid, which made the
  * interpreted `aggregate(zip_with((x−y)²))` the assignment hot spot. */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val (tx, ty) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = tx match {
        case FloatType => x.getFloat(i).toDouble
        case _ => x.getDouble(i)
      }
      val yv = ty match {
        case FloatType => y.getFloat(i).toDouble
        case _ => y.getDouble(i)
      }
      val d = xv - yv
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      val d = ctx.freshName("d")
      def get(arr: String, t: DataType): String = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $sum = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $d = ${get(a, elemType(left))} - ${get(b, elemType(right))};
         |    $sum += $d * $d;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| over two long arrays (distinct-value count, exactly
  * `size(array_intersect(a, b))` semantics) without materializing the
  * intersection ARRAY: copies both element sets into primitive long[]
  * buffers, sorts, and merge-counts — no per-row hash table, no result
  * ArrayData, no boxing. The Jaccard verify of every hashed-shingle
  * candidate join evaluates this per pair, which is why the size is the
  * only thing worth computing. Null elements follow array_intersect: a
  * null present on BOTH sides counts once. */
case class IntersectSizeLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    IntersectSizeLong.count(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectSizeLong.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSizeLong =
    copy(left = newLeft, right = newRight)
}

object IntersectSizeLong {
  /** Shared by the interpreted and generated paths (the generated code
    * calls this directly — the loop is already JIT-friendly Java). */
  def count(x: ArrayData, y: ArrayData): Int = {
    var nullX = false
    var nullY = false
    val xs = new Array[Long](x.numElements())
    var nx = 0
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) nullX = true
      else { xs(nx) = x.getLong(i); nx += 1 }
      i += 1
    }
    val ys = new Array[Long](y.numElements())
    var ny = 0
    i = 0
    while (i < y.numElements()) {
      if (y.isNullAt(i)) nullY = true
      else { ys(ny) = y.getLong(i); ny += 1 }
      i += 1
    }
    java.util.Arrays.sort(xs, 0, nx)
    java.util.Arrays.sort(ys, 0, ny)
    var (a, b, c) = (0, 0, 0)
    while (a < nx && b < ny) {
      val d = java.lang.Long.compare(xs(a), ys(b))
      if (d == 0) {
        c += 1
        val v = xs(a)
        while (a < nx && xs(a) == v) a += 1 // distinct semantics
        while (b < ny && ys(b) == v) b += 1
      } else if (d < 0) a += 1
      else b += 1
    }
    if (nullX && nullY) c + 1 else c
  }
}

object VectorOps {
  /** Column surface: codegen'd Σ aᵢ·bᵢ (arrays of float or double). */
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(DotProduct(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))

  /** Column surface: codegen'd Σ (aᵢ−bᵢ)². */
  def l2_sq(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(L2Squared(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))

  /** Column surface: codegen'd |A ∩ B| for long arrays. */
  def intersect_size(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(IntersectSizeLong(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
