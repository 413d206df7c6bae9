package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — the incremental distinct-count store.
  *
  * The reference recomputes distinct-entity rollups per scheduled query
  * run (athena_partitioner/handler.py re-scans the partition); at 100 TB a
  * `count(DISTINCT key)` is a full shuffle of the key column every time.
  * The store pattern instead has each ingest batch reduce to ONE
  * fixed-size HLL sketch per group (DataSketches HLL via Spark's native
  * `hll_sketch_agg`, ~2^lgConfigK bytes); any later rollup — across days,
  * sources, or the whole store — merges sketches, so bytes read and
  * shuffled are O(groups × sketch_size) regardless of how much raw data
  * the sketches summarize. HLL unions are lossless at a common lgConfigK:
  * the merged estimate is IDENTICAL to the single-pass estimate, which
  * the q25 bound row pins (plus the ±1.04/√2^lgK standard-error envelope
  * against the exact count).
  */
object Sketches {

  /** One batch's per-group sketch rows — the store row format. Append
    * these to a parquet store partitioned by batch/dt. */
  def hllSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgConfigK).as("hll"))

  /** Roll a sketch store up to per-group distinct-count estimates —
    * touches only sketch bytes, never the raw keys. */
  def hllEstimate(store: DataFrame, groupCols: Seq[String]): DataFrame =
    store.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("distinct_est"))

  /** Merge STORED Count-Min sketches relationally — CM sketches are
    * LINEAR (counters add), so a store of per-batch
    * [[graft.functions.CountMinAgg]] rows rolls up to EXACTLY the
    * single-pass sketch: posexplode each flattened counter array, sum per
    * position, reassemble in position order. Work is
    * O(groups × batches × depth·width) counter rows — never the stream. */
  def cmMerge(store: DataFrame, groupCols: Seq[String],
      sketchCol: String = "cm"): DataFrame = {
    val exploded = store
      .select(groupCols.map(col) :+
        posexplode(col(sketchCol)).as(Seq("__pos", "__v")): _*)
      .groupBy((groupCols :+ "__pos").map(col): _*)
      .agg(sum(col("__v")).as("__v"))
    exploded
      .groupBy(groupCols.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("__v")))),
        e => e.getField("__v")).as(sketchCol))
  }

  /** One batch's per-group MOMENT rows — exact sufficient statistics
    * (n, Σx, Σx²) over an integer-scaled measure (cents). Unlike a
    * probabilistic sketch these merge LOSSLESSLY: integer sums are
    * associative and order-free, so a rollup over any batch partitioning
    * is bit-identical to the single-pass aggregate — count/mean/variance
    * over a year of stored batches costs O(groups × batches) rows, never
    * a raw re-scan. (The scheduled-query analogue: the reference re-runs
    * its Athena aggregation over the full partition each time —
    * athena_partitioner re-registers, the query re-scans.)
    *
    * `centsCol` must be integer-valued (pre-scaled); Σx² of a 50-unit
    * measure at cents scale stays < 2^63 past 10^12 rows — for wide
    * measures scale down or split the store by range. */
  def momentSketches(df: DataFrame, groupCols: Seq[String],
      centsCol: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(centsCol).as("s"),
        sum(centsCol * centsCol).as("ss"))

  /** Roll a moment store up to per-group (n, s, ss) — integer sums of
    * integer sums, exactly the single-pass values. */
  def momentMerge(store: DataFrame, groupCols: Seq[String]): DataFrame =
    store.groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        sum(col("ss")).as("ss"))

  /** Derive mean / population variance from (n, s, ss) moment rows at
    * cents scale, rounded at 6 dp — one double expression over exact
    * integers with fixed nesting, so any engine reproduces it. */
  def momentStats(moments: DataFrame): DataFrame = {
    val sd = col("s").cast("double") / 100.0
    val ssd = col("ss").cast("double") / 10000.0
    moments
      .withColumn("mean", round(sd / col("n"), 6))
      .withColumn("var_pop", round((ssd - sd * sd / col("n")) / col("n"), 6))
  }

  /** Merge STORED Misra–Gries summaries relationally — the heavy-hitter
    * counterpart of [[hllEstimate]]. Each batch stages its sketch as
    * (item, est) rows ([[graft.pipeline.TextAnalysis.heavyHitters]]);
    * the mergeable-summaries rule (sum counters; if more than k survive,
    * subtract the (k+1)-th largest and drop non-positive) is exactly
    * expressible as an aggregate + rank window over the UNION OF
    * SUMMARIES — ≤ batches × k rows, never the corpus — so the merged
    * result carries the same guarantee as a single-pass sketch: total
    * undercount ≤ Σ batch errors ≤ n/(k+1) per batch. */
  def mgMerge(store: DataFrame, k: Int): DataFrame = {
    val summed = store.groupBy("item").agg(sum(col("est")).as("est"))
    val ranked = summed.withColumn("__rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("est").desc, col("item"))))
    // the offset is the (k+1)-th largest summed counter (0 if <= k rows);
    // one row, broadcast back
    val offset = ranked.where(col("__rk") === k + 1)
      .select(col("est").as("__off"))
    ranked.crossJoin(broadcast(
        offset.unionAll(offset.sparkSession.range(1)
            .select(lit(0L).as("__off")))
          .agg(max(col("__off")).as("__off"))))
      .withColumn("est", col("est") - col("__off"))
      .where(col("est") > 0 && col("__rk") <= k)
      .select("item", "est")
  }
}
