package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fixed-point second-moment (Gram/covariance) aggregate over an
  * embedding column — the training statistic behind PCA / whitening /
  * OPQ rotation for embedding pipelines, as a `TypedImperativeAggregate`
  * so it PARTIAL-aggregates: each partition folds its vectors into ONE
  * fixed-size buffer `[n, Σx_i (dim), Σx_i·x_j (upper triangle)]`
  * map-side, and only dim·(dim+3)/2+1 longs cross the exchange — never a
  * dim²-per-row explode (which would put corpus × dim² rows through the
  * shuffle).
  *
  * Fixed-point: every term lifts to integer MICRO-units
  * (`floor(x·10⁶ + 0.5)` / `floor(x_i·x_j·10⁶ + 0.5)`) before summation
  * — the money-in-cents move applied to second moments, so the sums are
  * exact integers under ANY partitioning and the derived covariance is
  * one fixed-shape double expression over exact integers, bit-identical
  * across engines (how [[graft.pipeline.Similarity.covarianceMatrix]]
  * carries an exact SQL oracle). Merge is elementwise addition (the
  * moments are linear). Nulls are skipped; a vector of the wrong width
  * fails loudly.
  */
case class GramAgg(
    child: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  require(dim >= 1, s"vec_moments needs dim >= 1, got $dim")
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_moments"

  private val triLen = dim * (dim + 1) / 2

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + dim + triLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vec_moments: vector width ${arr.numElements()} != declared dim $dim")
      val x = arr.toDoubleArray()
      buf(0) += 1L
      var i = 0
      var k = 1 + dim
      while (i < dim) {
        buf(1 + i) += math.floor(x(i) * 1000000.0 + 0.5).toLong
        var j = i
        while (j < dim) {
          buf(k) += math.floor(x(i) * x(j) * 1000000.0 + 0.5).toLong
          j += 1; k += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramAgg =
    copy(child = newChild)
}

object GramAgg {
  /** Column surface: `vec_moments(vec, dim)` → the flattened
    * [n, dim sums, upper-tri products] long array. */
  def vec_moments(c: Column, dim: Int): Column =
    GraftColumnBridge.toColumn(
      GramAgg(GraftColumnBridge.toExpression(c), dim)
        .toAggregateExpression())
}
