package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's DataFrame API lacks as primitives:
  * point-in-time (as-of) join and interval (range) join — both staples of
  * security-telemetry correlation (each event against the config/intel
  * version in force at event time; events inside maintenance/incident
  * windows). Each is expressed so Catalyst keeps the scale-critical shape:
  * the as-of join is ONE shuffle + ONE ordered window (never a per-row
  * subquery), the range join is an EQUI-join on a derived time bucket
  * (never a BroadcastNestedLoop over an inequality).
  */
object TemporalJoins {

  /** Point-in-time (as-of) join: each `fact` row picks up the payload of
    * the most recent `dim` row with `dim.ts <= fact.ts` for the same key
    * (ties at equal ts match — the state set AT the instant applies).
    * Facts before any dim version keep NULL payloads (left semantics).
    *
    * Implementation is the union trick: tag both sides, sort each key's
    * timeline once (dim rows before fact rows at equal ts), and carry the
    * latest non-null payload forward with `last(..., ignoreNulls)` over an
    * unbounded-preceding window. Equivalent to DuckDB/kdb ASOF JOIN but
    * with no per-row lookup: at 100 TB it is ONE hash exchange on the key
    * and ONE sort within each key's partition — dim versions interleave
    * with their facts, so no key's timeline ever concentrates on one
    * executor beyond its own fact mass.
    *
    * `dim` must be unique per (key, ts) — pre-aggregate if not (the
    * deterministic choice belongs to the caller). */
  def asofJoin(fact: DataFrame, dim: DataFrame, keyCols: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      outPrefix: String = "asof_"): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoin: payloadCols must be non-empty")
    val factCols = fact.columns.toSeq
    // one struct column carries the whole dim payload through the window,
    // so N payload columns still cost ONE last() state slot
    val dimTagged = dim.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(1).as("__is_dim"),
        struct(col(tsCol).as("__asof_ts") +:
          payloadCols.map(c => col(c).as(c)): _*).as("__payload")): _*)
    val factTagged = fact.select(
      factCols.map(col) ++ Seq(lit(0).as("__is_dim"),
        lit(null).cast(dimTagged.schema("__payload").dataType).as("__payload")): _*)
    val unioned = factTagged.unionByName(
      dimTagged.select(
        factCols.map(c =>
          if (keyCols.contains(c) || c == tsCol) col(c)
          else lit(null).cast(fact.schema(c).dataType).as(c)) ++
          Seq(col("__is_dim"), col("__payload")): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__is_dim").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__state", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__is_dim") === 0)
      .select(factCols.map(col) :+ col("__state.__asof_ts").as(s"${outPrefix}ts")
        :++ payloadCols.map(c => col(s"__state.$c").as(s"$outPrefix$c")): _*)
  }

  /** Interval (range) join via time bucketing: each `fact` row joins every
    * `intervals` row whose [startCol, endCol) half-open window contains
    * `fact.tsCol`. Both sides map to fixed-width time buckets — an
    * interval explodes to the buckets it covers, a fact to the single
    * bucket containing it — and meet in an EQUI-join on the bucket id,
    * with the exact containment predicate as a post-filter. This is the
    * published bucketed range-join shape (Databricks' range-join
    * optimization, Flink's interval join): the plan is a hash join, never
    * a nested-loop over an inequality, and stays linear as long as
    * `bucketSeconds` is within ~an order of magnitude of typical interval
    * length (each interval then explodes to O(1) buckets). */
  def rangeJoinBucketed(fact: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "rangeJoinBucketed: bucketSeconds must be positive")
    val usec = lit(bucketSeconds * 1000000L)
    def bucketOf(c: Column): Column = floor(unix_micros(c) / usec)
    // end is exclusive: the last covered bucket is the one holding end-1us
    val iv = intervals.withColumn("__b",
      explode(sequence(bucketOf(col(startCol)),
        bucketOf(timestamp_micros(unix_micros(col(endCol)) - 1)))))
    fact.withColumn("__b", bucketOf(col(tsCol)))
      .join(iv, Seq("__b"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__b")
  }
}
