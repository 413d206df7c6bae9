package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Column surface over Spark's internal Bloom-filter expressions (the
  * pair that powers runtime row-group filtering): build a compact bloom
  * from a SMALL key set, embed it as a constant, and prune a huge scan
  * against it BEFORE anything reaches an exchange. `might_contain` is
  * sound (no false negatives), so a downstream exact join only pays for
  * true hits plus the configured false-positive trickle.
  *
  * `BloomFilterMightContain` requires its bloom input to be a constant
  * (or scalar subquery), hence the Array[Byte] parameter: callers
  * collect the one aggregated sketch row (bounded — numBits/8 bytes,
  * independent of data size) and inline it. */
object Bloom {

  /** Aggregate LONG keys into a serialized bloom filter (BinaryType). */
  def bloom_filter_agg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftColumnBridge.toColumn(new BloomFilterAggregate(
      GraftColumnBridge.toExpression(c),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Codegen'd membership probe of a LONG key against the inlined bloom. */
  def might_contain(bloomBytes: Array[Byte], value: Column): Column =
    GraftColumnBridge.toColumn(new BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), GraftColumnBridge.toExpression(value)))
}
