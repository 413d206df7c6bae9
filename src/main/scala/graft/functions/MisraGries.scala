package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native Catalyst aggregate
  * (`TypedImperativeAggregate`, so it partial-aggregates: every partition
  * reduces its token stream to a k-entry sketch map-side and only sketches
  * cross the exchange — the whole point at 100 TB, where the exact
  * `groupBy(token)` it replaces would shuffle the full vocabulary).
  *
  * Guarantees (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): for a stream of n items summarized
  * with k counters — across ANY partitioning and merge order —
  *   - every item with true frequency > n/(k+1) is present in the output;
  *   - estimates never exceed the true count, and undercount by at most
  *     n/(k+1).
  * The summary CONTENT below the guarantee line is stream-order dependent
  * (like any MG sketch), which is why the registered query pins the
  * order-independent guarantee, not the tail.
  *
  * Merge: counters add; if more than k survive, the (k+1)-th largest
  * count is subtracted from all (the mergeable-summaries offset step) and
  * non-positive entries drop.
  *
  * Output: array<struct<item,est>> sorted by (est desc, item asc).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries needs k >= 1, got $k")
  // also SQL-registered (GraftExtensions): declare StringType so a
  // non-string column fails (or implicit-casts) at analysis time instead
  // of ClassCastException on executors
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String buffers are reused by the scan — materialize to String
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // classic MG step: a full summary and a new item decrement ALL
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreachEntry { (key, c) =>
            if (c == 1L) dead += key else buf.update(key, c - 1) }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreachEntry { (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest counter from everyone; <= k survive
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val offset = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreachEntry { (key, c) =>
        if (c - offset <= 0L) dead += key else a.update(key, c - offset) }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) => InternalRow(UTF8String.fromString(item), c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreachEntry { (key, c) =>
      val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {
  /** Column surface: `misra_gries(items, k)` aggregate. */
  def misra_gries(c: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      MisraGriesAgg(GraftColumnBridge.toExpression(c), k).toAggregateExpression())
}
