package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input-statistics-driven exchange sizing for the candidate-join family.
  *
  * The one scale knob SCALE.md's 100x matrix proved is still manual after
  * r17 is PARTITIONS: a candidate join's output cardinality is pair math
  * over its bucket histogram (sum of m²/2-ish terms), which can be 10-100x
  * its input row count — so both a fixed `spark.sql.shuffle.partitions`
  * harness and AQE under-partition it. AQE sizes a reduce stage from the
  * MAP side's output bytes; a prefix/fingerprint table that is 100 MB of
  * skinny (key, id) rows gets coalesced to a handful of partitions and the
  * join then explodes 50x INSIDE those tasks (measured: d14 at 100x was
  * 229.6 s / 32 parts vs 120.9 s / 256 parts at 4x LESS heap). The fix a
  * 1000-executor cluster turns by hand — more, smaller partitions for the
  * candidate exchange — is computed here from the join's own input
  * statistics instead: aggregate the bucket histogram (one cheap job over
  * a stage the caller already persists), estimate the pair output exactly
  * under the operator's pairing rule, and repartition the join inputs by
  * the join keys when the estimate exceeds what the session floor can
  * hold. `repartition(n, keys)` shuffles are REPARTITION_BY_NUM origin,
  * which AQE never coalesces, so the chosen width sticks; at correctness /
  * bench scale the estimate stays below the floor and the plan is
  * byte-identical to r17's (zero bench drift by construction).
  */
object AdaptiveParts {

  /** Target candidate-pair rows per partition of a pair-producing join.
    * A candidate-pair row costs far more than its 16 wire bytes: the
    * pre-dedup exchange rows carry join-side payloads and the dedup/sort
    * working state amplifies ~4x. Empirically (d14 @100x matrix,
    * SCALE.md): 256 partitions over ~9.6 GB of candidate shuffle
    * (~1.2M pair rows per task) beat both 32 and 75 partitions at every
    * heap size — so the target is ~1.2M pair rows per partition. */
  val RowsPerPartition: Long = 1200L * 1000

  /** Upper clamp — far above any local[32] shape, low enough that a
    * wild overestimate cannot drown the scheduler in empty tasks. */
  val MaxParts: Int = 4096

  /** The session's configured parallelism — the floor below which this
    * sizing never interferes (small inputs keep the r17 plan). */
  def sessionFloor(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  /** estimatedRows → partition count: never below `floor`, never above
    * [[MaxParts]], monotone in the estimate. Pure — spec-pinned. */
  def partsFor(estimatedRows: Long, floor: Int,
      rowsPerPartition: Long = RowsPerPartition): Int = {
    require(floor >= 1 && rowsPerPartition >= 1)
    val want = math.ceil(estimatedRows.toDouble / rowsPerPartition)
    math.max(floor, math.min(MaxParts.toDouble, want).toInt)
  }

  /** Exact output-pair count of the capped-star pairing rule
    * ([[Dedup.cappedPairs]]: full pairing among the first `cap` bucket
    * members, star to the head beyond) for ONE bucket of size m —
    * C(min(m,cap), 2) + max(m − cap, 0). Column form so the histogram
    * aggregate stays one distributed job. */
  def cappedBucketPairs(m: Column, cap: Int): Column = {
    val k = least(m, lit(cap.toLong))
    // k(k−1) is even, so >>1 is exact integer halving (Column `/` on
    // longs would return Double and lose exactness past 2^52)
    shiftright(k * (k - lit(1L)), 1) + greatest(m - lit(cap.toLong), lit(0L))
  }

  /** Total pair estimate for a capped bucket self-join: aggregate the
    * bucket histogram of `rows` over `keyCols` and sum the per-bucket
    * capped-star counts. One job over a (usually already persisted)
    * skinny stage; exact for [[Dedup.cappedPairs]] BEFORE its final
    * dropDuplicates (a pair sharing several buckets counts once per
    * bucket — the safe overestimate for sizing the pre-dedup exchange,
    * which is exactly the exchange that melts). */
  def cappedPairEstimate(rows: DataFrame, keyCols: Seq[String],
      cap: Int): Long =
    histogramPairSum(rows, keyCols, m => cappedBucketPairs(m, cap))

  /** Total pair estimate for an UNCAPPED bucket self-join (the PPJoin
    * prefix join: every same-token prefix pair is a candidate) —
    * sum of C(m, 2) over the bucket histogram. */
  def allPairEstimate(rows: DataFrame, keyCols: Seq[String]): Long =
    histogramPairSum(rows, keyCols, m => shiftright(m * (m - lit(1L)), 1))

  private def histogramPairSum(rows: DataFrame, keyCols: Seq[String],
      perBucket: Column => Column): Long = {
    val hist = rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__m"))
    val r = hist.agg(sum(perBucket(col("__m"))).as("__pairs")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Exact output count of a BIPARTITE capped bucket join — the
    * against-store candidate joins' pairing rule (the new batch joins the
    * first `rightCap` store members per bucket): sum over matching keys
    * of m_left · min(m_right, rightCap). The store-side histogram costs
    * one scan of the skinny store key table — the same table the
    * candidate join itself reads (r18 verdict ask #5: the store steps
    * inherited session width once the store outgrew the broadcast-prune
    * cap; now they price their own exchanges like the batch paths). */
  def bipartiteCappedEstimate(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], rightCap: Int): Long =
    bipartiteFromHists(
      left.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__ml")),
      right.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__mr")),
      keyCols, rightCap)

  /** [[bipartiteCappedEstimate]] with caller-supplied histograms —
    * `leftHist` carries keyCols + `__ml`, `rightHist` keyCols + `__mr`.
    * Lets a caller with a STAGED frequency table (the PPJoin store's
    * freq parquet bounds its prefix histogram: prefix rows per token ≤
    * doc frequency) price the join without re-exploding the store. */
  def bipartiteFromHists(leftHist: DataFrame, rightHist: DataFrame,
      keyCols: Seq[String], rightCap: Int = Int.MaxValue): Long = {
    val r = leftHist.join(rightHist, keyCols)
      .agg(sum(col("__ml") * least(col("__mr"), lit(rightCap.toLong)))
        .as("__pairs")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Repartition `df` by `keys` to `parts` when that exceeds the session
    * floor; identity otherwise (keeps the small-scale plan untouched). */
  def bySize(df: DataFrame, parts: Int, floor: Int, keys: Column*): DataFrame =
    if (parts > floor) df.repartition(parts, keys: _*) else df

  /** Rows of CPU-bound VERIFY work per task. A verify row costs an
    * array-intersect / dot-product kernel (~5-20 μs measured: p1's PPJoin
    * verify ran 0.77 s over 2 AQE-coalesced tasks), three orders of
    * magnitude more than its ~16 wire bytes — so AQE, which prices
    * partitions by bytes, collapses a verify exchange to 1-2 tasks long
    * before the compute is small (r19 verdict ask #5). ~2k rows/task keeps
    * each task in the hundreds-of-μs-to-ms range. */
  val VerifyRowsPerPartition: Long = 2000L

  /** Width for a verify exchange fed by an estimated `estimatedRows`
    * candidate pairs, when the bytes-priced sizing stayed at the session
    * floor: CPU-priced width, never ABOVE the floor (the floor is the
    * session's own parallelism — the right ceiling for a compute-bound
    * stage at bench scale; above the floor the candidate sizing `parts`
    * owns every exchange and this helper is not consulted). Identity
    * (width ≤ 1 → 0) when the estimate is too small to beat the
    * exchange's fixed cost. */
  def verifyParts(estimatedRows: Long, floor: Int): Int = {
    val want = math.ceil(estimatedRows.toDouble / VerifyRowsPerPartition)
    val w = math.min(floor.toDouble, want).toInt
    if (w > 1) w else 0
  }

  /** REPARTITION_BY_NUM `df` by `keys` to `parts` when parts > 0 —
    * the verify-exchange spread ([[verifyParts]]); identity otherwise. */
  def byVerifyCost(df: DataFrame, parts: Int, keys: Column*): DataFrame =
    if (parts > 0) df.repartition(parts, keys: _*) else df

  /** Estimated split count and total data bytes of `df`'s file-source
    * scans — `(splits, bytes)`; None when the lineage has no file source
    * (in-memory batches, checkpointed frames). Plan-only: no job runs.
    *
    * Split estimate mirrors FilePartition.getFilePartitions (r19 advice:
    * the old per-file ceil ignored small-file bin-packing): every file is
    * charged `openCostInBytes` on top of its length, the split size is
    * min(maxPartitionBytes, max(openCost, charged/minPartitionNum)), and
    * the packed partition count is ceil(charged / splitSize). With at
    * least `want` files the scan is wide under ANY packing whose openCost
    * is at its default-or-larger (each file charges ≥ openCost, so
    * charged/splitSize ≥ fileCount) — that fast path skips the per-file
    * FS stats a million-shard corpus must never pay at plan time. */
  def scanStats(df: DataFrame, want: Int): Option[(Long, Long)] = {
    val files = df.inputFiles
    if (files.isEmpty) None
    else if (files.length >= want) Some((files.length.toLong, Long.MaxValue))
    else {
      val spark = df.sparkSession
      val conf = spark.sessionState.conf
      // r19 advice (medium): the session conf exposes these as Longs —
      // hand-parsing the string form broke on legal values like "128MB"
      val maxBytes = conf.filesMaxPartitionBytes
      val openCost = conf.filesOpenCostInBytes
      val minParts = conf.filesMinPartitionNum
        .getOrElse(spark.sparkContext.defaultParallelism)
      val hconf = spark.sessionState.newHadoopConf()
      var bytes = 0L
      files.foreach { f =>
        val path = new org.apache.hadoop.fs.Path(f)
        bytes +=
          (try path.getFileSystem(hconf).getFileStatus(path).getLen
           catch { case scala.util.control.NonFatal(_) => 0L })
      }
      val charged = bytes + openCost * files.length
      val splitSize = math.max(1L,
        math.min(maxBytes, math.max(openCost, charged / math.max(1, minParts))))
      Some((math.max(1L, (charged + splitSize - 1) / splitSize), bytes))
    }
  }

  /** [[scanStats]]' split count alone (compatibility surface for specs). */
  def scanSplits(df: DataFrame, want: Int): Option[Long] =
    scanStats(df, want).map(_._1)

  /** Below this many ON-DISK scan bytes a narrow scan stays narrow: the
    * widen exchange costs ~2 fixed AQE stage-jobs plus a shuffle of the
    * full input, which r19's driver run measured LOSING on tiny inputs
    * (d1 0.35→0.64 s, d20 0.18→0.34 s — r19 verdict ask #1) while the
    * heavy-chain wins all sit on inputs well past this floor. Callers
    * whose per-row work is light (one hash over the row, no gram fold)
    * pass a HIGHER floor; the default keeps every r19 win (the smallest
    * winning input, documents.parquet at sf0.1, is ~580 KB). Scale-safe
    * by construction: a real corpus is wide and never reaches the bytes
    * test. */
  val WidenMinBytes: Long = 256L << 10

  /** Higher floor for call sites where the widen's payoff is structurally
    * smaller: chains whose per-row work is a single cheap pass (exact
    * dedup's canonicalize+md5) or whose widened stage is immediately
    * localCheckpoint'd (substring anchors — the shuffle is paid AGAIN by
    * the checkpoint write of the exploded grams). Measured on this host
    * (r20 A/B, warm means at sf0.1 with the widen off): d1 0.70→0.44 s,
    * d20 0.63→0.45 s, d21 3.20→2.23 s — while every win of the default
    * floor's sites was independently re-confirmed (o1 0.55 vs 3.54 s
    * unwidened, d14 1.63 vs 2.75, d9 2.10 vs 2.75, d10 1.35 vs 1.70).
    * Above this floor a single file still means a 1-3-task scan doing
    * ≥8 MB of per-row work — there the spread pays even twice-shuffled. */
  val WidenMinBytesEager: Long = 8L << 20

  /** Guide §2.5 "input skew — one huge unsplittable file ... otherwise
    * repartition immediately after the read": CPU-heavy per-row operators
    * (shingling, JSON classification, gram hashing) inherit the SCAN's
    * split count, which for a single small file is 1-3 tasks no matter how
    * many cores the cluster has — the whole downstream chain then runs
    * effectively single-threaded (measured r19: d14's shingle+estimate
    * stage 0.98 s on ONE task at local[32]; o1's JSON parse 5.9 s on 3).
    * When the scan provably yields fewer splits than the default
    * parallelism AND carries at least `minBytes` of data (below that the
    * exchange's fixed cost exceeds the single-task compute it spreads —
    * r19 verdict ask #1, the a7 adjudication generalized into the
    * helper), repartition by `keys` to spread the work; when the scan is
    * already wide — every real corpus — this is IDENTITY, so no exchange
    * exists at 100 TB. In-memory lineage: an already-materialized
    * checkpoint that is ALREADY wide keeps its width (r19 advice: the
    * store-step loops were paying a redundant full shuffle per batch);
    * anything else in-memory is treated as narrow — stream batches are
    * batch-sized by construction and the widening shuffle prices at batch
    * bytes, not corpus bytes. Hash repartition on the operator's id key —
    * deterministic under retry (guide §2.5's rand() caveat) and never
    * coalesced by AQE (REPARTITION_BY_NUM).
    *
    * `SPARK_GRAFT_WIDEN=0` disables every widen (dev-only A/B knob, the
    * SPARK_GRAFT_OPENCOST pattern — never set in Bench/Verify paths). */
  def widenNarrowScan(df: DataFrame, keys: Column*): DataFrame =
    widenNarrowScan(df, WidenMinBytes, keys: _*)

  def widenNarrowScan(df: DataFrame, minBytes: Long, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "widenNarrowScan needs a deterministic key")
    if (sys.env.get("SPARK_GRAFT_WIDEN").contains("0")) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    scanStats(df, want) match {
      case Some((splits, _)) if splits >= want => df // wide scan: identity
      case Some((_, bytes)) if bytes < minBytes => df // tiny: tax > win
      case Some(_) => df.repartition(want, keys: _*)
      // non-file lineage stays UNCONDITIONALLY widened: the r19 advice to
      // skip re-widening an already-wide checkpointed batch was
      // implemented and MEASURED A NET LOSS (r20 A/B: the winnowing store
      // loop fell 3104 -> 2081 docs/s with the skip) — a store-loop
      // batch's checkpoint is nominally wide but its rows are unevenly
      // spread post-dedup, and the per-batch hash widen doubles as the
      // rebalance. Batch-sized by construction, so the shuffle prices at
      // batch bytes, not corpus bytes.
      case None => df.repartition(want, keys: _*)
    }
  }
}
