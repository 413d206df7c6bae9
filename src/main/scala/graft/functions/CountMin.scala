package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native Catalyst
  * aggregate — the frequency-estimation face of the sketch store family
  * (Misra–Gries answers "which items are heavy"; CM answers "how often is
  * THIS item" for any item, in depth·width counters).
  *
  * `TypedImperativeAggregate`, so it partial-aggregates: each partition
  * folds its stream into a fixed depth×width counter array map-side and
  * only sketches cross the exchange. Merge is elementwise addition — CM
  * sketches are LINEAR, which is why a store of per-batch sketch rows
  * rolls up relationally to exactly the single-pass sketch
  * ([[graft.pipeline.Sketches.cmMerge]]).
  *
  * Guarantees: estimates NEVER undercount (each row's counter saw every
  * occurrence of the item plus nonneg collision mass); with width w and
  * depth d, overcount exceeds 2n/w with probability ≤ 2^−d per query.
  *
  * Hashing: row r's bucket is `xxhash64(concat(r, item)) mod width` using
  * Spark's own XXH64 with its fixed seed 42 — bit-identical to the
  * Column-side lookup [[CountMinAgg.cm_estimate]] builds from built-in
  * functions, so estimate reads are codegen'd scan-side expressions with
  * no UDF.
  *
  * Output: the flattened row-major depth×width counter array.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  require(depth >= 1 && width >= 2, s"count_min needs depth >= 1, width >= 2")
  // SQL-registered (GraftExtensions): without declared input types a
  // non-string column passes analysis and throws ClassCastException at
  // executor runtime on the UTF8String cast — declare StringType so
  // misuse fails (or implicit-casts) at analysis time
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  // row prefixes are tiny; precompute the UTF8String forms once per task
  @transient private lazy val rowPrefixes: Array[UTF8String] =
    Array.tabulate(depth)(r => UTF8String.fromString(r.toString))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var r = 0
      while (r < depth) {
        // identical bytes+seed to Column-side xxhash64(concat(lit(r), item))
        val h = XXH64.hashUTF8String(UTF8String.concat(rowPrefixes(r), s), 42L)
        buf(r * width + java.lang.Math.floorMod(h, width.toLong).toInt) += 1L
        r += 1
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {
  /** Column surface: `count_min(items, depth, width)` aggregate → the
    * flattened row-major counter array. */
  def count_min(c: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.toColumn(
      CountMinAgg(GraftColumnBridge.toExpression(c), depth, width)
        .toAggregateExpression())

  /** Point estimate from a sketch column: min over rows of the item's
    * counter. Pure built-in functions (xxhash64/pmod/element_at/least) —
    * codegen'd, broadcast-friendly, and bit-identical to the aggregate's
    * update hashing. */
  def cm_estimate(sketch: Column, item: Column, depth: Int, width: Int): Column = {
    val reads = (0 until depth).map { r =>
      element_at(sketch,
        (lit(r * width) +
          pmod(xxhash64(concat(lit(r.toString), item)), lit(width.toLong))
        ).cast("int") + 1)
    }
    if (depth == 1) reads.head else least(reads: _*)
  }
}
