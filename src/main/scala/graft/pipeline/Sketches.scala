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

  /** One micro-batch step of the STREAMING trending-item detector — the
    * [[graft.pipeline.Dedup.minhashStoreStep]] shape for frequency
    * sketches: the arriving batch's candidate items (its Misra–Gries
    * top-k — a bounded probe set, never the vocabulary) compare their
    * in-batch rate against the historical per-batch rate read from the
    * Count-Min sketch STORE, then the batch's own sketch appends as one
    * fixed-size row. An item trends when
    * `batch_est × nBatches > spikeFactor × baseline_est` — all-integer
    * arithmetic; a never-seen item bursting in (baseline 0) trends by
    * construction, and CM's no-undercount guarantee means a trend verdict
    * is never caused by the baseline UNDER-estimating history.
    *
    * State is O(batches × depth·width) sketch bytes regardless of stream
    * volume; the emitted result materializes BEFORE the append. Pass
    * foreachBatch's `batchId` to make retries IDEMPOTENT: the batch's
    * sketch lands in its own `batch=<id>` partition with overwrite, so a
    * re-delivered batch replaces rather than double-counts itself
    * (without an id the append is at-least-once and a retry inflates
    * that batch's mass in the baseline). Returns
    * (item, batch_est, baseline_est); the first batch (empty store)
    * emits nothing and seeds the store. */
  def cmTrendStep(batch: DataFrame, storeDir: String, itemCol: String,
      depth: Int = 4, width: Int = 8192, candidateK: Int = 64,
      spikeFactor: Int = 4, batchId: Option[Long] = None): DataFrame = {
    import graft.functions.CountMinAgg.{cm_estimate, count_min}
    import graft.functions.MisraGriesAgg.misra_gries
    val spark = batch.sparkSession
    val sketchPath = s"$storeDir/cm"
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // The store's write mode (idempotent batch=<id> partitions vs plain
    // append) is decided on FIRST write and pinned in a marker file: a
    // store seeded without batchId that later receives batchId calls (or
    // vice versa) would silently change baseline semantics — the
    // columns.contains("batch") probe would stop/start excluding the
    // current batch, and append-mode retries double-count. Fail loudly.
    val modeMarker = new org.apache.hadoop.fs.Path(storeDir, "_cm_mode")
    val wantMode = if (batchId.isDefined) "batch" else "append"
    if (fs.exists(modeMarker)) {
      val in = fs.open(modeMarker)
      val seeded =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      require(seeded == wantMode,
        s"cmTrendStep: store at $storeDir was seeded in '$seeded' mode " +
          s"but this call is '$wantMode' — modes cannot mix within one store")
    } else {
      // marker absent: a store that ALREADY has sketch data predates the
      // marker scheme, so infer its seeded mode from the data itself
      // (idempotent mode writes batch=<id> partitions → a 'batch'
      // partition column) rather than trusting this call's mode — the
      // upgrade boundary is exactly where stamping the caller's mode
      // would let a mixed-mode store slip past the guard
      val seeded =
        if (fs.exists(new org.apache.hadoop.fs.Path(sketchPath))) {
          if (spark.read.parquet(sketchPath).columns.contains("batch"))
            "batch" else "append"
        } else wantMode
      require(seeded == wantMode,
        s"cmTrendStep: store at $storeDir was seeded in '$seeded' mode " +
          s"but this call is '$wantMode' — modes cannot mix within one store")
      val out = fs.create(modeMarker, false)
      try out.write(seeded.getBytes("UTF-8")) finally out.close()
    }
    val items = batch.select(col(itemCol).as("item"))
      .where(col("item").isNotNull)
    val batchSketch = items.agg(count_min(col("item"), depth, width).as("cm"))
    val trending = if (fs.exists(new org.apache.hadoop.fs.Path(sketchPath))) {
      val storeAll = spark.read.parquet(sketchPath)
      // idempotent mode: a retried batch's own earlier partition is
      // EXCLUDED from the baseline, so the re-run sees exactly what the
      // first attempt saw and emits the same verdicts
      val store = batchId match {
        case Some(id) if storeAll.columns.contains("batch") =>
          storeAll.where(col("batch") =!= id)
        case _ => storeAll
      }
      val nBatches = store.count()
      val baseline = cmMerge(store.withColumn("__g", lit(1)), Seq("__g"))
      val candidates = items
        .agg(misra_gries(col("item"), candidateK).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("item"), col("e.est").as("batch_est"))
      candidates.crossJoin(broadcast(baseline))
        .withColumn("baseline_est",
          cm_estimate(col("cm"), col("item"), depth, width))
        .where(col("batch_est") * nBatches >
          lit(spikeFactor.toLong) * col("baseline_est"))
        .select("item", "batch_est", "baseline_est")
    } else {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("item",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("batch_est",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("baseline_est",
            org.apache.spark.sql.types.LongType))))
    }
    val out = trending.localCheckpoint()
    batchId match {
      // one partition per batch, overwritten on retry — idempotent; do
      // not mix modes within one store (partition discovery differs)
      case Some(id) => batchSketch.write.mode("overwrite")
        .parquet(s"$sketchPath/batch=$id")
      case None => batchSketch.write.mode("append").parquet(sketchPath)
    }
    out
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

  /** One batch's EMBEDDING-moment row — the [[graft.functions.GramAgg]]
    * fixed-point [n, Σx, upper-tri Σxy] array as a single fixed-size
    * row: the storable sufficient statistic for covariance and
    * distribution-drift monitoring over embedding streams. Append one
    * row per micro-batch (the [[momentSketches]] pattern at vector
    * rank); any later window of batches rolls up through [[gramMerge]]
    * and reads back as exact covariance via
    * [[graft.pipeline.Similarity.covarianceFromMoments]] — vectors are
    * scanned once, at ingest, never again. */
  def gramSketch(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.agg(graft.functions.GramAgg.vec_moments(
      col(vecCol).cast("array<double>"), dim).as("m"))

  /** Lossless rollup of stored gram-moment rows — the moments are LINEAR
    * (exact integer sums), so elementwise addition over any batch
    * partitioning is bit-identical to the single-pass aggregate (the
    * [[cmMerge]] shape: explode by position, sum, reassemble in
    * position order). */
  def gramMerge(store: DataFrame, mCol: String = "m"): DataFrame =
    store.select(posexplode(col(mCol)).as(Seq("__pos", "__v")))
      .groupBy("__pos").agg(sum(col("__v")).as("__v"))
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("__v")))),
        e => e.getField("__v")).as(mCol))

  /** One batch's per-group fixed-bin HISTOGRAM rows over an integer-scaled
    * measure — the STORABLE percentile path: per-batch (group, bin, n)
    * rows merge losslessly (integer sums), unlike the GK sketch behind
    * `percentile_approx` whose binary state has no relational merge. Any
    * later rollup answers any percentile with error ≤ one bin width —
    * bounded a priori by the bin choice, not the data. Row count per
    * batch is groups × occupied bins, never the stream. */
  def histSketches(df: DataFrame, groupCols: Seq[String], centsCol: Column,
      binWidthCents: Long): DataFrame =
    df.groupBy(groupCols.map(col) :+
        floor(centsCol.cast("long") / binWidthCents).cast("long").as("bin"): _*)
      .agg(count(lit(1)).as("n"))

  /** Roll a histogram store up per group — integer sums of integer sums,
    * exactly the single-pass histogram. */
  def histMerge(store: DataFrame, groupCols: Seq[String]): DataFrame =
    store.groupBy((groupCols :+ "bin").map(col): _*)
      .agg(sum(col("n")).as("n"))

  /** Percentile-q lower bound per group from histogram rows: the smallest
    * bin whose cumulative count reaches ceil(q·n), reported as that bin's
    * lower edge — pure integer arithmetic (one bin-ordered running-sum
    * window per group, partitions are occupied-bin-cardinality), so any
    * engine reproduces it; true percentile lies within [edge, edge+width). */
  def histPercentile(hist: DataFrame, groupCols: Seq[String], q: Double,
      binWidthCents: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val qNum = math.round(q * 1000000L) // integer q in ppm: ceil(q*n) exact
    hist
      .withColumn("__cum", sum(col("n")).over(w))
      .withColumn("__tot", sum(col("n")).over(wAll))
      .where(col("__cum") * 1000000L >= col("__tot") * qNum)
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("bin")).as("__bin"))
      .withColumn(s"p_lower_cents", col("__bin") * binWidthCents)
      .drop("__bin")
  }

  /** Population stability index between two histogram snapshots — the
    * standard distribution-drift monitor (PSI = Σ_bins (pa−pb)·ln(pa/pb),
    * probabilities floored at 1e-6 so empty bins contribute finitely;
    * > 0.1 is the conventional "moderate drift" alarm). Composes
    * [[histSketches]]/[[histMerge]] rows, so drift between any two store
    * rollups — days, crawls, sources — costs O(groups × bins), never a
    * raw re-scan.
    *
    * Determinism: probabilities are ratios of exact integers, per-bin
    * contributions are identical doubles on any engine, and the cross-bin
    * sum folds in BIN ORDER (array_sort + ordered aggregate — the ADC
    * distance-table pattern), so the result is reproducible bit-for-bit.
    * Returns (groupCols…, psi, drifted). */
  def psiDrift(histA: DataFrame, histB: DataFrame, groupCols: Seq[String],
      alarm: Double = 0.1): DataFrame = {
    val gc = groupCols.map(col)
    def tot(h: DataFrame, n: String) =
      h.groupBy(gc: _*).agg(sum(col("n")).as(n))
    val a = histA.select(gc :+ col("bin") :+ col("n").as("__na"): _*)
    val b = histB.select(gc :+ col("bin") :+ col("n").as("__nb"): _*)
    val eps = 0.000001
    val joined = a.join(b, groupCols :+ "bin", "full_outer")
      .join(tot(histA, "__ta"), groupCols)
      .join(tot(histB, "__tb"), groupCols)
      .withColumn("__pa", greatest(
        coalesce(col("__na"), lit(0L)).cast("double") / col("__ta"), lit(eps)))
      .withColumn("__pb", greatest(
        coalesce(col("__nb"), lit(0L)).cast("double") / col("__tb"), lit(eps)))
      .withColumn("__c",
        (col("__pa") - col("__pb")) * log(col("__pa") / col("__pb")))
    joined
      .groupBy(gc: _*)
      .agg(array_sort(collect_list(struct(col("bin"), col("__c")))).as("__arr"))
      .withColumn("psi", round(aggregate(col("__arr"), lit(0.0),
        (acc, x) => acc + x.getField("__c")), 6))
      .withColumn("drifted", col("psi") > alarm)
      .drop("__arr")
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
