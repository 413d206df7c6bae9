package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Deduplication family for training-data pipelines, each shaped for 100 TB.
  *
  * CACHING CONTRACT: the batch near-dup entry points persist their
  * signature stages (MEMORY_AND_DISK) for the duration of the call ONLY.
  * Each entry point materializes its (small) pair result eagerly via
  * `localCheckpoint` and unpersists every stage before returning, so a
  * session invoking them in a loop (per-micro-batch dedup) holds no
  * CacheManager entries between calls — no `clearCache()` hygiene is
  * required of the caller. The returned DataFrame reads the checkpointed
  * result blocks (candidate pairs — orders of magnitude smaller than the
  * corpus); the ContextCleaner frees those once the frame is unreferenced,
  * the same lifetime rule [[connectedComponents]] already uses. The
  * `*AgainstStore` incremental mode with parquet-staged stores remains the
  * intended operating shape at scale (only the new batch's signatures are
  * ever cached, and only within the call).
  *
  * Family overview:
  *
  *  - exact: one hash-groupBy shuffle on a 16-byte fingerprint (not the text)
  *  - MinHash+LSH: shingle → signature → band-bucket join; candidate pairs
  *    only ever meet inside a bucket, so the shuffle is on (band, bucket)
  *    keys and the quadratic blow-up is bounded per bucket
  *  - SimHash: 64-bit fingerprint, near-dup = small Hamming distance,
  *    bucketed by 16-bit chunks (any pair within distance 3 shares a chunk)
  *  - n-gram Jaccard: the exact verifier applied to candidate pairs
  *  - embedding cosine: random-hyperplane LSH over the embedding column
  *
  * Everything before the bucket joins is pure Column work (no UDFs).
  */
object Dedup {

  /** Run `result`'s plan NOW (one job; `localCheckpoint` truncates lineage
    * to the materialized pair blocks) and release every stage cache before
    * returning — the enforcement point of the caching contract above. The
    * stages are unpersisted even if the job fails, so an error mid-pipeline
    * can't leak cache entries either. */
  private[pipeline] def materializeAndRelease(result: DataFrame, stages: Seq[DataFrame]): DataFrame =
    try result.localCheckpoint(eager = true)
    finally stages.foreach(_.unpersist(false))

  // -------------------------------------------------------------------------
  // Exact
  // -------------------------------------------------------------------------

  /** Exact duplicate groups by normalized-text fingerprint: one row per
    * distinct document, keeping the smallest id as canonical. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    // widenNarrowScan: the whole-text canonicalize+md5 fingerprint runs
    // map-side and inherits scan width; identity on wide scans (guide §2.5).
    // EAGER floor (r20): the per-row work is ONE cheap pass, so below
    // ~8 MB the exchange costs more than the single-task compute it
    // spreads (measured: d1 0.70→0.44 s warm at sf0.1 with the widen off)
    AdaptiveParts.widenNarrowScan(df, AdaptiveParts.WidenMinBytesEager, col(idCol))
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))

  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val canon = exactGroups(df, textCol, idCol)
      .select(col("canonical_id").as(idCol))
    df.join(canon, Seq(idCol), "left_semi")
  }

  /** Span-level corpus dedup (the C4-style "discard repeated spans
    * corpus-wide, keep one copy" cleanup, applied at sub-document
    * granularity): documents chunk into non-overlapping `spanWords`-token
    * spans; every span occurring more than once across the WHOLE corpus
    * keeps only its first occurrence (ordered by id, then position);
    * surviving spans reassemble per document. A document made entirely of
    * repeated spans disappears — its content lives on in the first
    * occurrences.
    *
    * Scale shape: spans materialize once from the scan (an int-sequence
    * posexplode, like chunking); the keep-first decision is ONE window
    * shuffle partitioned by the 16-byte span fingerprint (span text rides
    * it once as payload), reassembly is one groupBy(doc). No self-join, no
    * all-pairs anything. Output: (doc_id, n_spans_kept, dedup_text).
    *
    * `withinDoc = true` scopes the keep-first rule to each document (the
    * C4 page-LOCAL cleanup: a span repeated inside one page collapses, but
    * two pages may legitimately share it) — the window partitions by
    * (doc, fingerprint) instead, so partitions shrink and no cross-doc
    * coordination happens at all. */
  def spanDedup(df: DataFrame, textCol: String, idCol: String,
      spanWords: Int = 8, withinDoc: Boolean = false): DataFrame = {
    // fenced: __toks is referenced by the span bound AND per-span slices;
    // without the fence CollapseProject re-inlines the tokenize per ref
    val toks = graft.functions.OptimizerFence.fence(
      TextAnalysis.tokens(col(textCol)))
    val lastSpan = ceil(size(col("__toks")).cast("double") / spanWords).cast("int") - 1
    val spans = df
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), greatest(lastSpan, lit(0)))).as("span_idx"))
      .select(col("doc_id"), col("span_idx"),
        array_join(slice(col("__toks"), col("span_idx") * spanWords + 1,
          lit(spanWords)), " ").as("span"))
      .where(length(col("span")) > 0)
    val partCols =
      if (withinDoc) Seq(col("doc_id"), md5(col("span")))
      else Seq(md5(col("span")))
    val w = Window.partitionBy(partCols: _*)
      .orderBy(col("doc_id").asc, col("span_idx").asc)
    spans.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("span_idx"), col("span")))),
          s => s.getField("span")), " ").as("dedup_text"))
  }

  /** Variable-length exact-substring dedup — the suffix-array tier of
    * the dedup family (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better": remove every token inside a
    * substring of >= `minLen` tokens that occurs >= 2 times corpus-wide,
    * across documents OR at two positions within one). [[spanDedup]]
    * only catches FIXED-aligned spans — a 300-token boilerplate block
    * offset by one token slips its chunk grid; this operator flags it at
    * any offset and any length >= minLen.
    *
    * Relational equivalence to the suffix-array semantics: token t of a
    * doc lies inside a >= minLen-token repeat IFF some minLen-gram
    * window containing t is globally repeated (every window of a longer
    * repeat is itself repeated; any repeated window IS a repeat). So
    * flagged tokens = union of [p, p+minLen-1] over all positions p
    * whose minLen-gram occurs >= 2 times — and maximal variable-length
    * repeats fall out of interval union for free: starts offset by one
    * token chain into one merged span, reproducing the suffix array's
    * run extension exactly.
    *
    * Scale shape: positional grams build scan-side by the
    * [[wordShingles]] shifted-zip_with fold (no per-position slice
    * allocation) and leave the scan as (doc_id, pos, 16-byte md5) —
    * text never shuffles. The global repeat test is one pre-combined
    * groupBy(hash) + one semi-join (both exchanges carry skinny hash
    * rows; AQE handles boilerplate-gram skew). Interval union is the
    * classic prev-max-end sweep: windows partition by doc_id, so
    * partitions are doc-token-bounded, never corpus-sized. Returns
    * (doc_id, n_tokens, n_dup_spans, dup_tokens, dup_spans) for EVERY
    * document — clean docs carry 0/0/null; spans are 0-based inclusive
    * token offsets "s:e;s:e" ordered by start.
    *
    * Reference tie: the reference's nearest cleanup is record-level
    * dedup in the classifier (streamalert/classifier/payload_record.py
    * dedups identical records per batch); this is the corpus-scale
    * sub-document generalization an LLM pipeline needs. */
  def repeatedSubstringSpans(df: DataFrame, textCol: String, idCol: String,
      minLen: Int): DataFrame = {
    require(minLen >= 2, "repeatedSubstringSpans needs minLen >= 2")
    val (docUniverse, positional) =
      substringAnchors(df, textCol, idCol, minLen)
    // globally repeated grams: pre-combined count, skinny semi-join side
    val repeated = positional.groupBy("__gh")
      .agg(count(lit(1)).as("__c")).where(col("__c") >= 2)
      .select("__gh")
    val covered = positional.join(repeated, Seq("__gh"), "left_semi")
      .select(col("doc_id"), col("pos"),
        (col("pos") + (minLen - 1)).as("__end"))
    substringSpansFromCovered(docUniverse, covered)
  }

  /** The positional-anchor stage shared by [[repeatedSubstringSpans]] and
    * [[repeatedSubstringStoreStep]]: (doc universe with token counts,
    * (doc_id, pos, 16-byte md5 of the minLen-gram at pos)). Text never
    * leaves this stage. */
  private def substringAnchors(df: DataFrame, textCol: String,
      idCol: String, minLen: Int): (DataFrame, DataFrame) = {
    val L = minLen
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    // positional L-grams: grams[i] = toks[i..i+L-1] joined — the shifted
    // zip_with fold; concat-with-null nulls the padded tail, slice drops it
    val grams = (1 until L).foldLeft(col("__toks")) { (acc, k) =>
      zip_with(acc, slice(col("__toks"), lit(k + 1),
        greatest(size(col("__toks")) - k, lit(1))),
        (a, b) => concat(a, lit(" "), b))
    }
    // guide §2.5: the gram+md5 chain inherits the scan's split count —
    // widen a provably narrow input so it isn't single-threaded (identity
    // once the scan is wide, i.e. any real corpus). EAGER floor (r20):
    // every consumer localCheckpoints this stage right away, so the widen
    // shuffle is paid twice (exchange + checkpoint write of the exploded
    // grams) — below ~8 MB it measured a net LOSS (d21 3.20→2.23 s,
    // d20 0.63→0.45 s warm at sf0.1 with the widen off).
    // OptimizerFence on the token array: the gram fold references __toks
    // 15 times (slice + size per zip_with level); CollapseProject would
    // inline the tokenize tree into every reference and the interpreted
    // HOF chain then re-splits the text per reference — measured r19:
    // 1.57 s -> 0.25 s per batch at sf0.1 with the fence (evaluate-once)
    val base = AdaptiveParts.widenNarrowScan(df,
        AdaptiveParts.WidenMinBytesEager, col(idCol))
      .select(col(idCol).as("doc_id"),
        graft.functions.OptimizerFence.fence(toks).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast(LongType).as("n_tokens"),
        slice(grams, lit(1), greatest(size(col("__toks")) - (L - 1), lit(0)))
          .as("__grams"))
    val docUniverse = base.select(col("doc_id"), col("n_tokens"))
    val positional = base
      .select(col("doc_id"), posexplode(col("__grams")).as(Seq("pos", "__g")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
        md5(col("__g")).as("__gh"))
    (docUniverse, positional)
  }

  /** Interval-union + per-doc report tail shared by the substring-dedup
    * pair: `covered` is (doc_id, pos, __end) repeated-window starts. */
  private def substringSpansFromCovered(docUniverse: DataFrame,
      covered: DataFrame, parts: Int = 0): DataFrame = {
    // interval union per doc: new span when start > 1 + max(prior ends)
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevMax = max(col("__end"))
      .over(wDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = widenCovered(covered, parts)
      .withColumn("__new",
        when(prevMax.isNull || col("pos") > prevMax + 1, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__new")).over(wDoc))
      .groupBy("doc_id", "__grp")
      .agg(min(col("pos")).as("__s"), max(col("__end")).as("__e"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("__e") - col("__s") + 1).as("dup_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("__s"), col("__e")))),
          s => concat(s.getField("__s").cast("string"), lit(":"),
            s.getField("__e").cast("string"))), ";").as("dup_spans"))
    docUniverse.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        col("dup_spans"))
  }

  /** The CLEANED corpus from the variable-length substring pass — cut
    * every token inside a [[repeatedSubstringSpans]] repeat span and
    * reassemble the survivors in order (the deliverable of Lee et al.
    * 2022's ExactSubstr dedup: the paper removes ALL occurrences of a
    * ≥ minLen-token repeat, which in-practice loses nothing because one
    * copy survives whenever the repeat sits inside unique context
    * shorter than minLen). Every input document comes back as
    * (doc_id, clean_text, n_tokens, n_removed) — a fully-repeated
    * document returns EMPTY text, it never silently vanishes (the
    * [[graft.pipeline.TextAnalysis.removeContaminatedSpans]] rule).
    * Tokens are whitespace-canonicalized and lowered, the same stream
    * every other text op sees.
    *
    * Scale shape: span discovery is the d20 pipeline unchanged (grams
    * leave the scan as (doc_id, pos, 16-byte md5); repeat test = one
    * pre-combined groupBy(hash) + skinny semi-join; interval union on
    * doc-bounded windows). The cut itself adds NO per-token shuffle:
    * spans collapse to one skinny (doc_id, [s,e] list) row per flagged
    * doc, and the corpus text rides exactly ONE doc-keyed exchange into
    * that join — the surgical filter runs scan-side over the token
    * array (per-token span probe is O(spans/doc), spans are few by
    * construction since they merged in the union). */
  def removeRepeatedSubstrings(df: DataFrame, textCol: String, idCol: String,
      minLen: Int): DataFrame = {
    require(minLen >= 2, "removeRepeatedSubstrings needs minLen >= 2")
    val (_, positional) = substringAnchors(df, textCol, idCol, minLen)
    val repeated = positional.groupBy("__gh")
      .agg(count(lit(1)).as("__c")).where(col("__c") >= 2)
      .select("__gh")
    val covered = positional.join(repeated, Seq("__gh"), "left_semi")
      .select(col("doc_id"), col("pos"),
        (col("pos") + (minLen - 1)).as("__end"))
    cutCoveredSpans(df, textCol, idCol, covered)
  }

  /** Width carrier for the span-algebra window exchange: the covered
    * rows are md5-keyed 24-byte triples that COMPRESS far below AQE's
    * 1 MB minimum partition size at batch scale, so the doc_id window
    * exchange coalesces to 1 task while its per-row window+agg work is
    * the store step's dominant cost (measured r19: 1.3 s single-task at
    * sf0.1). Callers that already materialized the anchors pass that
    * stage's REAL width (free off the checkpoint RDD) so the window runs
    * as wide as the anchors did; 0 = leave AQE in charge (batch paths
    * whose anchors are lazy). REPARTITION_BY_NUM, so AQE keeps it. */
  private def widenCovered(covered: DataFrame, parts: Int): DataFrame =
    if (parts > 1) covered.repartition(parts, col("doc_id")) else covered

  /** The span-cut tail shared by [[removeRepeatedSubstrings]] and
    * [[repeatedSubstringCleanStoreStep]]: interval-union `covered`
    * (doc_id, pos, __end) repeated-window starts into per-doc merged
    * [s, e] lists (skinny — one row per flagged doc), then cut the
    * token arrays SCAN-side (per-token probe is O(spans/doc)) behind
    * one doc-keyed join. */
  private def cutCoveredSpans(df: DataFrame, textCol: String,
      idCol: String, covered: DataFrame, parts: Int = 0): DataFrame = {
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevMax = max(col("__end"))
      .over(wDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = widenCovered(covered, parts)
      .withColumn("__new",
        when(prevMax.isNull || col("pos") > prevMax + 1, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__new")).over(wDoc))
      .groupBy("doc_id", "__grp")
      .agg(min(col("pos")).as("__s"), max(col("__end")).as("__e"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("__s"), col("__e"))))
        .as("__spans"))
    // fenced: the cut filter + two size() calls reference __toks — keep
    // the tokenize evaluate-once (see substringAnchors)
    val base = df.select(col(idCol).as("doc_id"),
      graft.functions.OptimizerFence.fence(
        TextAnalysis.tokens(lower(col(textCol)))).as("__toks"))
    base.join(spans, Seq("doc_id"), "left")
      .withColumn("__kept", filter(col("__toks"), (_, i) =>
        col("__spans").isNull || !exists(col("__spans"), sp =>
          i >= sp.getField("__s") && i <= sp.getField("__e"))))
      .select(col("doc_id"),
        array_join(col("__kept"), " ").as("clean_text"),
        size(col("__toks")).cast(LongType).as("n_tokens"),
        (size(col("__toks")) - size(col("__kept"))).cast(LongType)
          .as("n_removed"))
  }

  /** One micro-batch step of the STREAMING variable-length substring
    * dedup loop — the [[minhashStoreStep]] shape for the suffix-array
    * tier: the arriving batch's spans are computed against the gram
    * counts of EVERYTHING ingested so far (earlier batches + this one,
    * intra-batch repeats included), then the batch's own gram counts
    * join the store. Per the store-loop contract the report covers the
    * ARRIVING batch only — an earlier doc whose content a later batch
    * repeats is flagged at the batch where the repeat arrives, via that
    * batch's row (the id_new side of [[minhashStoreStep]], same
    * asymmetry).
    *
    * RETRY-IDEMPOTENT by construction, which append-only count stores
    * are not: each batch's partial (gh, c) counts write to their OWN
    * `batch_id=<id>` partition with overwrite, and the read side
    * excludes the current batch's partition (own counts come from the
    * in-flight frame) — a retried batch replaces its partial instead of
    * double-counting, so no gram can become spuriously "repeated" under
    * at-least-once execution. Store growth per batch = the batch's
    * DISTINCT gram count (pre-combined before the write), and the step
    * never rereads corpus text.
    *
    * BATCH-PROPORTIONAL step cost: the ≥2 verdict only matters for grams
    * PRESENT in the batch (the covered semi-join keeps batch positions
    * only), so prior counts are pruned by the batch's distinct gram set
    * BEFORE the global aggregate — a broadcast left-semi that turns the
    * store side into scan + probe with NO store-side exchange, and
    * shrinks the count aggregate from store- to batch-cardinality. The
    * broadcast hint applies only when the batch's distinct gram set is
    * provably under [[BatchStore.ProbeBroadcastCap]]; a fatter batch
    * falls back to a shuffled semi (same semantics, no broadcast
    * ceiling). The scan prunes too:
    * each batch partition ships a bloom sidecar over its gram keys
    * (`gramblooms/batch_id=N`), and the step probes prior blooms with
    * the batch's gram keys (early-exit on first hit) to skip prior
    * partitions sharing NO gram with the batch — sound because blooms
    * have no false negatives and the probe set is the batch's COMPLETE
    * distinct gram set (when it exceeds [[SubstringProbeCap]] the skip
    * is bypassed, not approximated: a batch that large overlaps
    * everything on organic text anyway, and row-level pruning still
    * holds via the broadcast semi-join). Returns the d20 report columns
    * for the batch's docs. */
  def repeatedSubstringStoreStep(batch: DataFrame, storeDir: String,
      textCol: String, idCol: String, minLen: Int, batchId: Long,
      maxStoreParts: Int = 0): DataFrame = {
    val (docUniverse, covered, anchorParts, writeStore) =
      substringStoreBatchCovered(batch, storeDir, textCol, idCol, minLen,
        batchId, maxStoreParts)
    // materialize BEFORE the store write: the exclusion read makes the
    // result immune to OWN write, but a lazily-executed plan evaluated
    // after a LATER batch's append would see that batch's counts as
    // "prior" — eager materialization pins the as-of-this-batch verdict
    val out = substringSpansFromCovered(docUniverse, covered, anchorParts)
      .localCheckpoint()
    writeStore()
    out
  }

  /** [[repeatedSubstringStoreStep]]'s CLEAN twin — the incremental tier
    * of [[removeRepeatedSubstrings]]: the arriving batch's repeat spans
    * (against everything ingested so far, the store-loop asymmetry) are
    * CUT and the surviving tokens reassembled, so the stream emits the
    * deduplicated corpus batch by batch instead of a span report.
    * Identical store contract (per-batch partition overwrite, bloom
    * sidecar, batch-proportional verdict); identical cut contract
    * (fully-repeated docs come back EMPTY, never vanish). Returns
    * (doc_id, clean_text, n_tokens, n_removed) for the batch's docs. */
  def repeatedSubstringCleanStoreStep(batch: DataFrame, storeDir: String,
      textCol: String, idCol: String, minLen: Int, batchId: Long,
      maxStoreParts: Int = 0): DataFrame = {
    val (_, covered, anchorParts, writeStore) =
      substringStoreBatchCovered(batch, storeDir, textCol, idCol, minLen,
        batchId, maxStoreParts)
    val out = cutCoveredSpans(batch, textCol, idCol, covered, anchorParts)
      .localCheckpoint()
    writeStore()
    out
  }

  /** Shared store-loop front half of the substring pair: batch anchors,
    * the batch-proportional global repeat verdict against the
    * parquet-staged gram-count store, and the covered repeated-window
    * starts — plus the deferred store write (counts partition + bloom
    * sidecar) the caller runs AFTER materializing its result. */
  private def substringStoreBatchCovered(batch: DataFrame, storeDir: String,
      textCol: String, idCol: String, minLen: Int, batchId: Long,
      maxStoreParts: Int = 0)
      : (DataFrame, DataFrame, Int, () => Unit) = {
    val spark = batch.sparkSession
    val countsPath = s"$storeDir/gramcounts"
    val bloomsPath = s"$storeDir/gramblooms"
    val (docUniverse, positional0) =
      substringAnchors(batch, textCol, idCol, minLen)
    // one materialization serves every consumer: batch counts, the
    // repeat filter, and the covered-start join all re-read these
    // anchors instead of re-running the text scan (iterative-op rule)
    val positional = positional0.localCheckpoint()
    // materialized ONCE (diamond-DAG rule): the verdict's union, its
    // probe side, and the store write all consume these counts — and the
    // >64k-gram fallback's cardinality probe becomes a trivial scan
    val batchCounts = positional.groupBy("__gh")
      .agg(count(lit(1)).as("__c")).localCheckpoint()
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // committed prior partitions only (never the current batch's — a
    // retried batch must not see its own failed partial), with
    // compaction markers applied ([[BatchStore]] reader rules)
    val priorParts: Seq[(Long, String)] = BatchStore.readableParts(
      fs, countsPath, s"$storeDir/compactions", Some(batchId))
    // ONE capped distinct-key collection serves BOTH the bloom partition
    // probe and the broadcast-cap decision of the verdict's semi prune
    // (at most SubstringProbeCap keys collected is PROOF the batch's
    // gram set fits the broadcast cap — no second counting job); a
    // founding batch (no priors) skips the collection entirely
    val batchKeys: Array[Long] =
      if (priorParts.isEmpty) Array.empty
      else positional.select(xxhash64(col("__gh")).as("__k"))
        .distinct().limit(SubstringProbeCap + 1).collect().map(_.getLong(0))
    val keptParts = prunePriorPartsByBloom(spark, fs, bloomsPath,
      batchKeys, priorParts)
    val priorCounts =
      if (keptParts.isEmpty) batchCounts.limit(0)
      else
        // explicit schema: a crashed first write that left only
        // _temporary under a partition must read as empty, not fail
        // schema inference and wedge the stream until manual cleanup
        spark.read.schema(StructType(Seq(
            StructField("__gh", StringType), StructField("__c", LongType),
            StructField("batch_id", LongType))))
          .option("basePath", countsPath)
          .parquet(keptParts.map(_._2): _*)
          .select(col("__gh"), col("__c"))
    val repeated =
      if (keptParts.isEmpty)
        // no committed prior counts: the union + semi degenerate to the
        // batch's own >=2 verdict (founding batches pay zero extra jobs)
        batchCounts.where(col("__c") >= 2).select("__gh")
      else substringRepeatVerdict(priorCounts, batchCounts,
        knownSmall = batchKeys.length <= SubstringProbeCap)
    val covered = positional.join(repeated, Seq("__gh"), "left_semi")
      .select(col("doc_id"), col("pos"),
        (col("pos") + (minLen - 1)).as("__end"))
    val writeStore = () => {
      BatchStore.writeBatchPart(batchCounts, countsPath,
        s"$storeDir/compactions", batchId)
      // bloom sidecar AFTER counts (a sidecar without data reads as
      // overlap-everything — sound); same per-partition overwrite idiom
      positional.select(xxhash64(col("__gh")).as("__k"))
        .agg(graft.functions.Bloom.bloom_filter_agg(col("__k"),
          SubstringBloomItems, SubstringBloomBits).as("bloom"))
        .write.mode("overwrite").parquet(s"$bloomsPath/batch_id=$batchId")
      // size-tiered self-maintenance: fold history once the partition
      // count (listing/footer/bloom-probe cost) outgrows maxStoreParts
      BatchStore.autoCompact(spark, countsPath, s"$storeDir/compactions",
        maxStoreParts, batchId)(
        repeatedSubstringStoreCompact(spark, storeDir, _, _))
      ()
    }
    // the anchors' materialized width — free off the checkpoint RDD —
    // carries into the span window exchange (see widenCovered)
    (docUniverse, covered, positional.rdd.getNumPartitions, writeStore)
  }

  /** The batch-proportional global repeat verdict of the store step
    * (PlanSpec-pinned): prior (gh, c) partials prune by the batch's
    * distinct gram set via a left-semi BEFORE the union + count
    * aggregate — broadcast-hinted when the batch's distinct gram set is
    * provably under [[BatchStore.ProbeBroadcastCap]] (the store side
    * reaches the verdict as scan + probe with no exchange), shuffled
    * otherwise (a fat micro-batch degrades to a sort-merge semi instead
    * of hitting Spark's broadcast ceiling and failing the stream) — and
    * the aggregate's input is batch-cardinality (prior rows surviving
    * the probe + the batch's own counts), never store-cardinality.
    * Semantics are identical to aggregating the full store: grams absent
    * from the batch cannot appear in the batch's covered positions, so
    * their verdicts are never consulted. */
  private[graft] def substringRepeatVerdict(priorCounts: DataFrame,
      batchCounts: DataFrame,
      probeCap: Long = BatchStore.ProbeBroadcastCap,
      knownSmall: Boolean = false): DataFrame = {
    // knownSmall = the caller already PROVED the batch's distinct gram
    // set is small (the bloom probe's capped collection) — broadcast
    // without a second counting job; otherwise probeSide limit-counts
    // against the cap and falls back to a shuffled semi above it
    val probe =
      if (knownSmall) broadcast(batchCounts.select("__gh"))
      else BatchStore.probeSide(batchCounts.select("__gh"), probeCap)
    priorCounts
      .join(probe, Seq("__gh"), "left_semi")
      .unionAll(batchCounts)
      .groupBy("__gh").agg(sum(col("__c")).as("__tot"))
      .where(col("__tot") >= 2).select("__gh")
  }

  /** Fold the substring gram-count store's committed batch partitions
    * (stream ids <= upToBatchId, plus earlier consolidations) into ONE
    * consolidated negative-id partition — counts sum, so the store's
    * ≥2 verdicts are byte-identical before and after; the retry
    * contract survives because only batches that can no longer retry
    * fold (call between batches with upToBatchId = lastCommitted − 1).
    * Crash-safe via the [[BatchStore]] marker protocol: a torn
    * compaction leaves inert garbage, never a double count. The
    * consolidated partition gets an 8×-sized bloom sidecar (it carries
    * many batches' gram cardinality); folded partitions' sidecars are
    * cleaned up with them. Bounds the store's partition count — and
    * with it listing, footer, and bloom-probe cost — for long-lived
    * streams. Returns the folded ids (empty = nothing to fold). */
  def repeatedSubstringStoreCompact(spark: SparkSession, storeDir: String,
      compactId: Long, upToBatchId: Long): Seq[Long] = {
    val bloomsPath = s"$storeDir/gramblooms"
    val folded = BatchStore.compact(spark, s"$storeDir/gramcounts",
      s"$storeDir/compactions",
      Some(StructType(Seq(
        StructField("__gh", StringType), StructField("__c", LongType),
        StructField("batch_id", LongType)))),
      compactId, upToBatchId,
      df => df.groupBy("__gh").agg(sum(col("__c")).as("__c")),
      sidecar = Some(consol => consol
        .select(xxhash64(col("__gh")).as("__k"))
        .agg(graft.functions.Bloom.bloom_filter_agg(col("__k"),
          SubstringBloomItems * 8, SubstringBloomBits * 8).as("bloom"))
        .write.mode("overwrite").parquet(s"$bloomsPath/batch_id=$compactId")))
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // sidecar cleanup covers every MARKER-folded id, not just this call's
    // folds: a crash between a prior compaction's marker commit and its
    // bloom delete (or a replayed trigger, whose compact() no-ops) would
    // otherwise leak sidecars forever — and every leaked sidecar inflates
    // the per-batch driver-side bloom map. Deletes intersect with ONE
    // listing of the sidecar dir (marker history grows with stream
    // lifetime; blind per-id deletes would too)
    val bloomsDir = new org.apache.hadoop.fs.Path(bloomsPath)
    val existing: Set[Long] =
      if (!fs.exists(bloomsDir)) Set.empty
      else fs.listStatus(bloomsDir).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).collect {
          case n if n.startsWith("batch_id=") =>
            n.stripPrefix("batch_id=").toLong
        }.toSet
    val allFolded = (folded ++ BatchStore.readMarkers(fs,
      s"$storeDir/compactions").values.flatten).toSet
    (allFolded intersect existing).foreach { id =>
      try fs.delete(
        new org.apache.hadoop.fs.Path(s"$bloomsPath/batch_id=$id"), true)
      catch { case _: java.io.IOException => }
    }
    folded
  }

  /** Sound probe-set size cap for the bloom partition skip: collecting
    * the batch's distinct gram keys is bounded driver memory (64k longs
    * = 512 KiB); a batch with more distinct grams skips the file-level
    * prune (row-level pruning still applies) rather than probe with an
    * incomplete — unsound — subset. */
  private val SubstringProbeCap = 1 << 16
  private val SubstringBloomItems = 1L << 17
  private val SubstringBloomBits = 1L << 20 // 128 KiB per batch partition

  /** Prior partitions that MIGHT share a gram with the batch: probe each
    * prior batch's bloom with the batch's distinct gram keys
    * (pre-collected ONCE by the caller, capped at [[SubstringProbeCap]]),
    * early-exit on the first hit (O(1) probes for overlapping batches —
    * the common case — and O(batch grams) exactly when the skip pays).
    * Partitions without a committed sidecar are always kept (sound). */
  private def prunePriorPartsByBloom(spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, bloomsPath: String,
      keysCapped: Array[Long], priorParts: Seq[(Long, String)]): Seq[(Long, String)] = {
    if (priorParts.isEmpty) return priorParts
    if (!fs.exists(new org.apache.hadoop.fs.Path(bloomsPath))) return priorParts
    if (keysCapped.length > SubstringProbeCap) return priorParts // incomplete set: no sound skip
    // ONE sidecar read for all prior batches: (batch_id, bloom) rows,
    // batch-count cardinality — bounded driver state by construction
    val blooms: Map[Long, Array[Byte]] =
      spark.read.schema(StructType(Seq(
          StructField("bloom", org.apache.spark.sql.types.BinaryType),
          StructField("batch_id", LongType))))
        .option("basePath", bloomsPath).parquet(bloomsPath)
        .collect()
        .map(r => r.getAs[Long]("batch_id") -> r.getAs[Array[Byte]]("bloom"))
        .toMap
    priorParts.filter { case (id, _) =>
      blooms.get(id) match {
        case Some(bytes) if bytes != null =>
          val bloom = org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(bytes))
          keysCapped.exists(bloom.mightContainLong)
        // counts committed but no (or null — empty batch) sidecar: keep (sound)
        case _ => true
      }
    }
  }

  /** Streaming ingestion dedup: drop redeliveries of the same document
    * within the watermark horizon. State carries ONLY the 16-byte
    * fingerprint + event time (dropDuplicatesWithinWatermark evicts state
    * as the watermark advances), so an unbounded stream holds bounded
    * state — the at-least-once source → exactly-once-ish corpus gate. */
  def streamingDropExactDuplicates(df: DataFrame, textCol: String,
      tsCol: String, watermark: String): DataFrame =
    df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  // -------------------------------------------------------------------------
  // MinHash + LSH
  // -------------------------------------------------------------------------

  /** Character k-shingles as a distinct array (Column-only sliding window). */
  def charShingles(text: Column, k: Int): Column = {
    val n = length(text)
    array_distinct(when(n >= k,
      transform(sequence(lit(1), n - k + 1), i => text.substr(i, lit(k))))
      .otherwise(array(text)))
  }

  /** Word w-shingles (token n-grams), built by iterated zip_with against
    * shifted views of the token array — no per-position slice allocation
    * (the naive transform(sequence)+slice formulation was the dominant cost
    * of the whole minhash pipeline at sf0.1). */
  def wordShingles(text: Column, w: Int): Column =
    wordShinglesFromToks(TextAnalysis.tokens(lower(text)), w)

  /** [[wordShingles]] over an ALREADY-TOKENIZED column. The shingle fold
    * references its token array ~3× per shingle word (slice + size per
    * zip_with level); callers that stage the tokens behind an
    * [[graft.functions.OptimizerFence]] projection pay the tokenize ONCE
    * per row instead of once per reference (the r19 substringAnchors
    * measurement: 6× on the anchors stage; CollapseProject otherwise
    * re-inlines the tokenize tree into every reference and the
    * interpreted HOF chain re-splits the text each time). */
  def wordShinglesFromToks(toks: Column, w: Int): Column = {
    val grams = (1 until w).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks) - k, lit(1))),
        (a, b) => concat(a, lit(" "), b))
    }
    // zip_with pads the shorter side with nulls -> concat yields trailing
    // nulls; drop them before dedup
    array_distinct(when(size(toks) >= w, array_compact(grams))
      .otherwise(array(concat_ws(" ", toks))))
  }

  /** MinHash signature: H independent permutation proxies. Strings are
    * hashed ONCE (xxhash64); the H permutations are multiply-shift mixes of
    * that base hash (a_i·h + b_i with odd a_i — universal hashing), computed
    * in a single fold so the shingle array is traversed once, not H times.
    * HOF expressions are CodegenFallback, so avoiding repeated string
    * hashing matters: ~5× on the signature stage at sf0.1. */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    minhashSignatureFromHashes(transform(shingleArr, s => xxhash64(s)), numHashes)

  /** Signature from pre-computed per-shingle 64-bit hashes (pass these as a
    * materialized column so the base hashing runs once). Each permutation
    * proxy is an XOR + bit-rotation of the base hash — a 64-bit bijection
    * with no overflow under ANSI arithmetic. Since r9 the fold is the
    * codegen'd [[graft.functions.MinHashSig]] kernel (same mixA/mixR
    * constants, same rotate, min per permutation — bit-equal signatures);
    * the triple-HOF formulation it replaced allocated three arrays per
    * shingle per row in the CodegenFallback interpreter. */
  def minhashSignatureFromHashes(baseHashes: Column, numHashes: Int): Column =
    graft.functions.MinHashSig.minhash_sig(baseHashes, numHashes)

  /** LSH banding: (band_idx, hash of the band's signature slice) pairs. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b => struct(
      lit(b).as("band"),
      xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand))).as("bucket"))): _*)

  /** Distinct candidate pairs (id_a < id_b) from bucket-ranked rows, with a
    * per-bucket pairing cap. `ranked` must carry `id`, a per-bucket
    * `rn` (row_number ordered by id), and the bucket key columns.
    *
    * Skew guard: a viral duplicate cluster of size k would otherwise emit
    * k²/2 candidates from ONE bucket. Beyond `cap`, members pair only with
    * the bucket head (rn == 1) — a star, k-1 pairs — which still links the
    * whole cluster transitively for dedup while bounding the blow-up to
    * cap²/2 + k. Both join sides read the SAME ranked plan, so with the
    * caller persisting it the bucketing stage computes once.
    *
    * Exchange sizing is adaptive ([[AdaptiveParts]]): the bucket histogram
    * prices the join's OUTPUT exactly under the capped-star rule, and when
    * that exceeds the session floor both join inputs and the pre-dedup
    * exchange repartition to pair-volume-proportional width — the
    * fixed-32-partition 100x pathology (SCALE.md r17 matrix) sized away
    * from input statistics, no env knob. Below the floor the plan is
    * byte-identical to the unsized one. */
  private[graft] def cappedPairs(ranked: DataFrame, keyCols: Seq[String],
      cap: Int,
      rowsPerPartition: Long = AdaptiveParts.RowsPerPartition): DataFrame = {
    val floor = AdaptiveParts.sessionFloor(ranked.sparkSession)
    // two-tier estimate: the capped-star rule bounds output pairs by
    // rows·cap, so a plain count (ONE cache-backed stage on the ranked
    // frame the caller persists — work the join materializes anyway)
    // proves most inputs can't exceed the floor and skips the histogram
    // job entirely; only genuinely large inputs pay the exact pricing
    val rows = ranked.count()
    val parts =
      if (rows <= floor.toLong * rowsPerPartition / math.max(1, cap)) floor
      else AdaptiveParts.partsFor(
        AdaptiveParts.cappedPairEstimate(ranked, keyCols, cap), floor,
        rowsPerPartition)
    val side = AdaptiveParts.bySize(ranked, parts, floor, keyCols.map(col): _*)
    val joinCond = keyCols.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _) &&
      col("x.id") < col("y.id") &&
      (col("y.rn") <= cap || col("x.rn") === 1)
    val pairs = side.as("x").join(side.as("y"), joinCond)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    AdaptiveParts.bySize(pairs, parts, floor, col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Candidate pairs from shared LSH buckets, verified with exact Jaccard
    * over the shingle sets. Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * `maxBucketPairing` bounds per-bucket candidate generation (see
    * cappedPairs) so duplicate mega-clusters stay linear. */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
      shingleWords: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7, maxBucketPairing: Int = 64): DataFrame = {
    val (pairs, stages) = minhashPairsPlan(df, textCol, idCol,
      shingleWords, numHashes, bands, threshold, maxBucketPairing)
    materializeAndRelease(pairs, stages)
  }

  /** The lazy pair plan + its persisted stages (exposed for plan tests;
    * callers use [[minhashNearDups]], which materializes and releases). */
  private[graft] def minhashPairsPlan(df: DataFrame, textCol: String, idCol: String,
      shingleWords: Int, numHashes: Int, bands: Int,
      threshold: Double, maxBucketPairing: Int): (DataFrame, Seq[DataFrame]) = {
    // Shingle sets are computed ONCE and kept aside; the band-bucket join
    // moves only (id, bucket) pairs — at 16 bands an id is duplicated 16×,
    // but a shingle array would be 16× its full size. Candidate pairs (rare)
    // then re-attach the two shingle sets by id for the exact-Jaccard
    // verify. At 100 TB: two narrow scans + one skinny shuffle + a verify
    // join whose build side is only the candidate ids.
    //
    // Both the shingle stage and the ranked-bucket stage are persisted:
    // the self-join and the two verify joins each reference them, and
    // without materialization every branch would recompute the dominant
    // cost (shingling + the 32-permutation signature) from a fresh corpus
    // scan — AQE's broadcast of the bucket join defeats ReuseExchange. At
    // 100 TB the equivalent is a staged write of the signature table.
    val (shingledRaw, buckets) = minhashStages(df, textCol, idCol,
      shingleWords, numHashes, bands)
    val shingled = shingledRaw.persist(StorageLevel.MEMORY_AND_DISK)
    val ranked = buckets
      .withColumn("rn", row_number().over(
        Window.partitionBy("band", "bucket").orderBy("id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = cappedPairs(ranked, Seq("band", "bucket"), maxBucketPairing)
      .join(shingled.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(shingled.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccardLongDistinct(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    (pairs, Seq(shingled, ranked))
  }

  /** The two materialization stages of the minhash pipeline:
    * (id, shingles) and the exploded (id, band, bucket) rows. At 100 TB
    * these ARE the signature store schema — write both as staged tables
    * and the corpus text is never re-shingled.
    *
    * Since r9 the staged `shingles` column holds the 64-BIT HASHES of the
    * shingles, not the strings (the d14 PPJoin rationale): shingle text
    * never persists or shuffles, the Jaccard verify intersects long
    * arrays, and the signature fold reads the same hashes — set semantics
    * preserved modulo xxhash64 collisions (P ≈ v²/2⁶⁵ over the shingle
    * vocabulary; a collision perturbs one pair's Jaccard by O(1/n)). */
  def minhashStages(df: DataFrame, textCol: String, idCol: String,
      shingleWords: Int = 3, numHashes: Int = 32, bands: Int = 8)
      : (DataFrame, DataFrame) = {
    // localCheckpoint: both returned stages consume this (the store write
    // AND the bucket derivation), and the CodegenFallback shingle chain is
    // the dominant cost — materialize once (the in-line minhashPairsPlan
    // makes the same trade with persist). Storage cost ≈ the store itself,
    // which the caller is about to land anyway.
    // widenNarrowScan: the CodegenFallback shingle chain is the dominant
    // cost and inherits scan width (1-3 tasks on a single small file) —
    // spread it; identity on wide scans (guide §2.5).
    // Fenced token stage: see wordShinglesFromToks — tokenize once per row.
    val shingled = AdaptiveParts.widenNarrowScan(df, col(idCol))
      .select(col(idCol).as("id"),
        graft.functions.OptimizerFence.fence(
          TextAnalysis.tokens(lower(col(textCol)))).as("__toks"))
      .select(col("id"),
        array_distinct(transform(
          wordShinglesFromToks(col("__toks"), shingleWords),
          s => xxhash64(s))).as("shingles"))
      .localCheckpoint()
    val buckets = shingled
      // the signature is a materialized column: the band array references
      // it bands×, and inlining would re-run the whole fold per band
      // (measured 30s+ single-threaded inside a broadcast build at sf0.1)
      .withColumn("__sig", minhashSignatureFromHashes(col("shingles"), numHashes))
      .select(col("id"),
        explode(lshBands(col("__sig"), bands, numHashes / bands)).as("b"))
      .select(col("id"), col("b.band"), col("b.bucket"))
    (shingled, buckets)
  }

  /** Incremental near-dup — the 100 TB operating mode: dedupe a NEW batch
    * against an existing corpus signature store (the minhashStages tables,
    * staged to parquet) without touching corpus text. Signatures compute
    * for the batch only; the bucket join ships (id, band, bucket) rows; the
    * verify re-attaches shingles by id from each side (the batch side from
    * cache, the store side by a join that AQE broadcasts the rare candidate
    * ids into). Returns (id_new, id_store, jaccard). */
  def minhashNearDupsAgainstStore(newDocs: DataFrame, textCol: String,
      idCol: String, storeShingles: DataFrame, storeBuckets: DataFrame,
      shingleWords: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7, maxBucketPairing: Int = 64,
      rowsPerPartition: Long = AdaptiveParts.RowsPerPartition): DataFrame = {
    val (newShingledRaw, newBuckets) = minhashStages(newDocs, textCol, idCol,
      shingleWords, numHashes, bands)
    val newShingled = newShingledRaw.persist(StorageLevel.MEMORY_AND_DISK)
    // bipartite skew cap: a batch doc sharing a bucket with a viral store
    // cluster of size k only needs the first `cap` members to decide
    // duplicate-ness — the cluster's members are interchangeable witnesses
    val cappedStore = storeBuckets
      .withColumn("__rn", row_number().over(
        Window.partitionBy("band", "bucket").orderBy("id")))
      .where(col("__rn") <= maxBucketPairing).drop("__rn")
    // exchange sizing ([[bipartiteParts]]): as the STORE grows past the
    // batch, candidate volume is bucket-histogram math a fixed session
    // width cannot see — the same r17 pathology the batch paths fixed
    val floor = AdaptiveParts.sessionFloor(newDocs.sparkSession)
    val parts = bipartiteParts(newBuckets, storeBuckets,
      Seq("band", "bucket"), maxBucketPairing, floor, rowsPerPartition)
    val candidates = AdaptiveParts.bySize(
      AdaptiveParts.bySize(newBuckets, parts, floor,
          col("band"), col("bucket")).as("n")
        .join(AdaptiveParts.bySize(cappedStore, parts, floor,
          col("band"), col("bucket")).as("s"), Seq("band", "bucket"))
        .select(col("n.id").as("id_new"), col("s.id").as("id_store"))
        .where(col("id_new") =!= col("id_store")), // store may hold the doc
      parts, floor, col("id_new"), col("id_store"))
      .dropDuplicates("id_new", "id_store")
    val pairs = AdaptiveParts.bySize(
      AdaptiveParts.bySize(candidates, parts, floor, col("id_new"))
        .join(newShingled.select(col("id").as("id_new"),
          col("shingles").as("sh_n")), "id_new"),
      parts, floor, col("id_store"))
      .join(storeShingles.select(col("id").as("id_store"), col("shingles").as("sh_s")),
        "id_store")
      .withColumn("jaccard", jaccardLongDistinct(col("sh_n"), col("sh_s")))
      .where(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_store"), round(col("jaccard"), 6).as("jaccard"))
    materializeAndRelease(pairs, Seq(newShingled))
  }

  /** Exchange width for a bipartite (batch × capped store) candidate
    * join — [[cappedPairs]]' sizing tier for the `*AgainstStore` family
    * (r18 verdict ask #5). Cheap tier first: capped pairing bounds output
    * by newRows·cap, so a batch-side count (a stage the join materializes
    * anyway) proves the common small case and skips the store histogram;
    * only a genuinely large batch pays the exact bipartite pricing — one
    * scan of the skinny store key table the candidate join reads
    * regardless. */
  private def bipartiteParts(newSide: DataFrame, storeSide: DataFrame,
      keyCols: Seq[String], cap: Int, floor: Int,
      rowsPerPartition: Long): Int = {
    val newRows = newSide.count()
    if (newRows <= floor.toLong * rowsPerPartition / math.max(1, cap)) floor
    else AdaptiveParts.partsFor(
      AdaptiveParts.bipartiteCappedEstimate(newSide, storeSide, keyCols, cap),
      floor, rowsPerPartition)
  }

  /** One micro-batch step of the STREAMING incremental near-dup loop — the
    * actual operating shape at corpus scale: the arriving batch near-dups
    * against the parquet-staged signature store FIRST (so a duplicate of any
    * earlier batch's document surfaces at the batch where it arrives,
    * [[minhashNearDupsAgainstStore]]), then the stages of the batch's
    * non-duplicate documents land in the store under keep-one semantics:
    * the store stays canonical, and a later copy of a dropped duplicate
    * still resolves to the originally-kept document. Returns the dup pairs
    * (id_new, id_store, jaccard), eagerly materialized BEFORE the store
    * write. Use from `writeStream.foreachBatch`; corpus text is never
    * re-shingled — only the new batch computes signatures, the mirror of
    * the per-batch threat-intel refresh loop.
    *
    * Since r14 the store is PER-BATCH-PARTITIONED (`batch_id=` overwrite,
    * [[BatchStore]] discovery) instead of append-only: a retried batch
    * REPLACES its partial and reads everything but its own partition, so
    * at-least-once execution can neither double-insert signatures nor
    * (the old founding hazard) dedup a retried batch against itself.
    * [[minhashStoreCompact]] folds history. */
  def minhashStoreStep(batch: DataFrame, storeDir: String, textCol: String,
      idCol: String, shingleWords: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7, maxBucketPairing: Int = 64,
      batchId: Long, maxStoreParts: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val shinglesPath = s"$storeDir/shingles"
    val bucketsPath = s"$storeDir/buckets"
    // staged empties carry the EXACT store schema (id type follows idCol)
    val (emptySh, emptyBk) =
      minhashStages(batch.limit(0), textCol, idCol, shingleWords, numHashes, bands)
    val dups = minhashNearDupsAgainstStore(batch, textCol, idCol,
      BatchStore.readStore(spark, storeDir, "shingles", emptySh, batchId),
      BatchStore.readStore(spark, storeDir, "buckets", emptyBk, batchId),
      shingleWords, numHashes, bands, threshold, maxBucketPairing)
    val kept = batch.join(dups.select(col("id_new").as(idCol)), Seq(idCol), "left_anti")
    val (sh, bk) = minhashStages(kept, textCol, idCol, shingleWords, numHashes, bands)
    BatchStore.writeBatchPart(sh, shinglesPath,
      s"$storeDir/compactions/shingles", batchId)
    BatchStore.writeBatchPart(bk, bucketsPath,
      s"$storeDir/compactions/buckets", batchId)
    BatchStore.autoCompact(spark, shinglesPath,
      s"$storeDir/compactions/shingles", maxStoreParts, batchId)(
      minhashStoreCompact(spark, storeDir, _, _))
    dups
  }

  /** Fold the minhash signature store's committed batch partitions
    * ([[BatchStore]] marker protocol; stream ids <= upToBatchId stay out
    * of the retry horizon). Signatures are per-document rows, so the
    * merge is identity — compaction only bounds partition-count growth
    * (listing/footer cost) for long-lived streams. Shingles and buckets
    * fold independently under their own markers (a crash between the
    * two partition writes of some batch leaves them individually
    * consistent). Returns the folded ids across both. */
  def minhashStoreCompact(spark: SparkSession, storeDir: String,
      compactId: Long, upToBatchId: Long): Seq[Long] =
    BatchStore.compactIdentity(spark, storeDir, Seq("shingles", "buckets"),
      compactId, upToBatchId)

  // -------------------------------------------------------------------------
  // Cluster labeling (connected components over candidate pairs)
  // -------------------------------------------------------------------------

  /** One micro-batch step of STREAMING cluster-label maintenance: the
    * batch's near-dup pairs (e.g. [[minhashStoreStep]]'s output) append
    * to the parquet-staged edge store, then labels recompute over the
    * full stored edge list. Append-then-recompute is RETRY-SAFE because
    * connected components is idempotent under duplicate edges, and
    * min-label canonicalization is MERGE-STABLE: when two clusters join,
    * the surviving label is the min of their mins, so a document's
    * canonical id only ever decreases (never flips arbitrarily) as
    * evidence accumulates.
    *
    * Recompute-over-all-edges is the honest cost model: the edge store
    * is near-dup-PAIR cardinality — tiny against the corpus — and CC is
    * O(edges · log diameter); an incremental union-find would save
    * little and lose the determinism/restart story. Returns the full
    * (id, cluster_id) labeling. */
  def ccStoreStep(newEdges: DataFrame, storeDir: String,
      srcCol: String = "id_a", dstCol: String = "id_b"): DataFrame = {
    val path = s"$storeDir/edges"
    newEdges.select(col(srcCol).as("id_a"), col(dstCol).as("id_b"))
      .write.mode("append").parquet(path)
    connectedComponents(newEdges.sparkSession.read.parquet(path))
  }

  /** Connected components over an undirected edge list (src, dst): the
    * canonicalization step after any near-dup pass — every document in a
    * duplicate cluster gets the cluster's minimum id as its label, so
    * "keep one per cluster" is a single filter.
    *
    * Min-label propagation with pointer jumping: each round every vertex
    * takes the minimum label over its neighborhood, then contracts one
    * indirection (label ← label's label — the Shiloach-Vishkin shortcut),
    * so the reached distance DOUBLES per round and a chain of length n
    * converges in O(log n) rounds, not n. `maxIter = 16` therefore covers
    * components of diameter ~2^16; if that is ever exceeded the function
    * WARNS on stderr rather than silently returning split clusters. Each
    * round is two skinny shuffles of (vertex, label) pairs — at 100 TB the
    * edge list (near-dup pairs) is tiny next to the corpus. The convergence
    * check is one count() per round on labels-that-changed.
    *
    * The result is localCheckpoint-ed (lineage truncated, stored as RDD
    * blocks that the ContextCleaner frees once unreferenced) so no
    * CacheManager entry outlives the call.
    *
    * Returns (id, cluster_id) for every vertex that appears in an edge. */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
      dstCol: String = "id_b", maxIter: Int = 16): DataFrame = {
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // every round's labels are localCheckpoint-ed: iterative plans otherwise
    // grow multiplicatively (each round embeds the previous round's tree
    // several times via the joins), which blows up optimizer/explain cost
    // long before data size matters. The checkpoint truncates lineage to a
    // LogicalRDD; block cleanup is the ContextCleaner's once unreferenced.
    var labels = und.groupBy(col("u").as("id"))
      .agg(least(min(col("v")), first(col("u"))).as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // hop 1: min over neighbours' labels, then min with own label
      val viaNeighbors = und
        .join(labels.withColumnRenamed("id", "v"), "v")
        .groupBy(col("u").as("id"))
        .agg(min(col("cluster_id")).as("n_min"))
      val hopped = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id")))
            .as("cluster_id"))
        .persist(StorageLevel.MEMORY_AND_DISK) // read by both jump sides
      // pointer jump: follow the label's own label (labels always point at
      // existing vertices, so the lookup is total)
      val next = hopped.as("a")
        .join(hopped.select(col("id").as("cluster_id"),
          col("cluster_id").as("parent")).as("b"), Seq("cluster_id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("parent"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("cluster_id", "old"), "id")
        .where(col("cluster_id") =!= col("old")).count()
      hopped.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      System.err.println(s"[graft] connectedComponents: NOT converged after " +
        s"$maxIter rounds — labels may split components of diameter > ~2^$maxIter")
    und.unpersist()
    labels
  }

  /** End-to-end duplicate clustering: documents → duplicate pair edges
    * (consecutive ids within a fingerprint group — a chain, so the label
    * propagation is genuinely exercised) → connected components. With
    * `prefixLen` > 0 the fingerprint covers only the first prefixLen
    * normalized chars (prefix-duplicate clustering — catches truncation /
    * re-crawl variants that exact hashing misses). Only documents with at
    * least one duplicate appear in the output. */
  def exactDupClusters(df: DataFrame, textCol: String, idCol: String,
      prefixLen: Int = 0): DataFrame = {
    val norm = TextAnalysis.normalizedText(col(textCol))
    val fpCol =
      if (prefixLen > 0) md5(substring(norm, 1, prefixLen))
      else TextAnalysis.fingerprint(col(textCol))
    val fp = df.select(col(idCol).as("id"), fpCol.as("fp"))
    val nxt = lead(col("id"), 1).over(
      Window.partitionBy("fp").orderBy("id"))
    val edges = fp.withColumn("id_b", nxt)
      .where(col("id_b").isNotNull)
      .select(col("id").as("id_a"), col("id_b"))
    connectedComponents(edges)
  }

  /** End-to-end near-duplicate corpus dedup — the operation a 100 TB
    * training-data pipeline actually runs: minhash-LSH near-dup pairs →
    * connected components over the pair edges → keep the min-id document
    * per cluster. Returns one row per INPUT document
    * (id, cluster_id, keep); docs with no near-dup are their own cluster
    * and kept. Cost profile inherits the stages': pair generation is the
    * skinny capped bucket join, CC runs over pair-cardinality edges only
    * (O(log diameter) rounds), and the label join-back is dup-cardinality
    * (AQE broadcasts it against the corpus id scan). */
  def dropNearDuplicates(df: DataFrame, textCol: String, idCol: String,
      shingleWords: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7, maxBucketPairing: Int = 64): DataFrame = {
    val pairs = minhashNearDups(df, textCol, idCol,
      shingleWords, numHashes, bands, threshold, maxBucketPairing)
    val labels = connectedComponents(pairs) // (id, cluster_id = min id)
    df.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .withColumn("keep", col("cluster_id") === col("id"))
  }

  /** [[dropNearDuplicates]] with canonical selection by QUALITY instead of
    * min id: within each near-dup cluster the highest-`scoreCol` member is
    * kept (id-asc tie-break) — what production pipelines actually do, since
    * the first-crawled copy is often the truncated or boilerplate-wrapped
    * one. `scoreCol` is evaluated against `df`'s columns.
    *
    * Scale shape: identical stages, plus one window that runs over the
    * DUP-CARDINALITY slice only — docs in no cluster never enter it (they
    * keep by an anti-join against the label set, which AQE broadcasts at
    * real dup rates), so the quality pass adds no corpus-wide shuffle. */
  def dropNearDuplicatesKeepBest(df: DataFrame, textCol: String, idCol: String,
      scoreCol: Column,
      shingleWords: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7, maxBucketPairing: Int = 64): DataFrame = {
    val pairs = minhashNearDups(df, textCol, idCol,
      shingleWords, numHashes, bands, threshold, maxBucketPairing)
    val labels = connectedComponents(pairs) // (id, cluster_id = min id)
    val scored = df.select(col(idCol).as("id"), scoreCol.as("__score"))
    val dupVerdicts = scored.join(labels, Seq("id")) // dup-cardinality
      .withColumn("keep", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("__score").desc, col("id").asc)) === 1)
      .select(col("id"), col("cluster_id"), col("keep"))
    val singletons = scored.join(labels, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster_id"), lit(true).as("keep"))
    dupVerdicts.unionAll(singletons)
  }

  /** Exact Jaccard over two DISTINCT long arrays (hashed shingles):
    * |∩| from the codegen'd merge-count kernel, |∪| = |a| + |b| − |∩| —
    * the same integers (and so the same doubles) the array_intersect/
    * array_union formulation produced, without materializing either
    * result array per pair. */
  def jaccardLongDistinct(a: Column, b: Column): Column = {
    val inter = graft.functions.VectorOps.intersect_size(a, b).cast(DoubleType)
    val union = size(a) + size(b) - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Exact Jaccard over two string arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val union = size(array_union(a, b)).cast(DoubleType)
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** n-gram Jaccard similarity between paired documents (the exact verifier
    * as a standalone operator). */
  def ngramJaccardPairs(pairs: DataFrame, textA: String, textB: String,
      shingleWords: Int = 2): Column =
    jaccard(wordShingles(col(textA), shingleWords),
      wordShingles(col(textB), shingleWords))

  /** ASYMMETRIC containment C(A→B) = |A ∩ B| / |A| — the
    * subset-duplication detector symmetric Jaccard structurally misses: a
    * short document fully quoted inside a long one has
    * J = |A|/|B| ≈ 0 but C(A→B) = 1 (quote mining, boilerplate-inside-
    * article, doc-inside-crawl-dump). Same shingle machinery as
    * [[jaccard]]; at corpus scale generate candidates with the prefix/
    * band joins and use this as the verify predicate — the candidate
    * plumbing is direction-blind, only the threshold algebra changes. */
  def containment(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    when(size(a) > 0, inter / size(a)).otherwise(lit(0.0))
  }

  // -------------------------------------------------------------------------
  // Exact set-similarity join (AllPairs / PPJoin prefix filtering)
  // -------------------------------------------------------------------------

  /** EXACT Jaccard similarity join via prefix filtering — AllPairs
    * (Bayardo, Ma & Srikant, WWW'07) with PPJoin's positional filter
    * (Xiao et al., VLDB'08). Returns every pair (id_a < id_b) whose
    * word-shingle Jaccard is >= `threshold`, with no recall loss — the
    * deterministic complement to the probabilistic minhash/simhash paths
    * (reference posture: rules must not silently drop matches,
    * rules_engine.py asserts full evaluation per record).
    *
    * Why this scales where the naive all-pairs join cannot:
    *  - each document's shingle set is put in ONE canonical global order,
    *    rarest-first: the sort key is (corpus_doc_freq, shingle) itself,
    *    so no vocabulary-sized rank window is ever built — just an
    *    equi-join of exploded shingles against the (pre-combined) doc-freq
    *    aggregate, then a per-document array_sort;
    *  - a pair with J >= t MUST share a shingle inside each side's first
    *    p = n - ceil(t*n) + 1 shingles, so only the short, rare prefix
    *    explodes into the candidate join — bucket sizes stay small because
    *    prefix tokens are by construction the rare ones;
    *  - candidates pass the length filter (min(n) >= t * max(n)) and
    *    PPJoin's positional filter (suffix-overlap upper bound
    *    min(n_a - pos_a, n_b - pos_b) >= ceil(t/(1+t) * (n_a + n_b)))
    *    as join-condition Column arithmetic, before anything wide moves;
    *  - ONE verify join re-attaches the two full shingle arrays for the
    *    exact Jaccard — shingle arrays travel only for surviving
    *    candidates, never for the corpus.
    *
    * A viral exact-duplicate cluster of size k legitimately yields k²/2
    * output pairs (exactness demands them); run [[dropExactDuplicates]]
    * first so only genuine near-dup structure reaches this join.
    *
    * CORPUS-SIZE CUTOFF (measured, r19): candidate volume is corpus
    * math — exactness must examine every same-prefix-token pair — and on
    * the GenScale receipts corpus it crosses the sizing budget
    * (`AdaptiveParts.MaxParts × RowsPerPartition` ≈ 4.9 B pair rows)
    * between 500 k docs (1.29 B pairs at τ=0.6 — comfortably inside;
    * completes zero-knob) and 5 M docs (12.6 B pairs at τ=0.6, 5.9 B even
    * at τ=0.8 — a ~200+ GB candidate exchange that exhausted a 76 GB
    * local spill disk). Past the budget the run emits the
    * [[warnIfExactnessOutgrown]] advisory: use [[minhashNearDups]] (the
    * banded path holds its third data decade linearly, SCALE.md) and
    * reserve exact PPJoin for corpus slices below ~1 M docs or
    * aggressively pre-deduped/high-τ inputs. */
  def similarityJoin(df: DataFrame, textCol: String, idCol: String,
      shingleWords: Int = 2, threshold: Double = 0.6): DataFrame = {
    val (verified, stages) =
      similarityJoinPlan(df, textCol, idCol, shingleWords, threshold)
    materializeAndRelease(verified, stages)
  }

  /** The PPJoin plan + its persisted stages (exposed for plan tests;
    * callers use [[similarityJoin]], which materializes and releases).
    * NOT purely lazy: with `sizeExchanges` (the default) the
    * [[AdaptiveParts]] estimate runs ONE distributed job — materializing
    * the tokenize/frequency/sort stages — at plan-CONSTRUCTION time to
    * price the candidate exchanges. Plan-only callers (explain, plan
    * specs that pin non-sizing invariants) pass `sizeExchanges = false`
    * and get the floor-width plan without executing anything. */
  private[graft] def similarityJoinPlan(df: DataFrame, textCol: String,
      idCol: String, shingleWords: Int, threshold: Double,
      rowsPerPartition: Long = AdaptiveParts.RowsPerPartition,
      sizeExchanges: Boolean = true)
      : (DataFrame, Seq[DataFrame]) = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    // Shingles are hashed to 64 bits AT THE SCAN and never travel as
    // strings: the df attachment, the canonical sort, the prefix explode,
    // and the verify arrays all carry longs. Set semantics are preserved
    // modulo xxhash64 collisions — P ≈ v²/2⁶⁵ over vocabulary v (a
    // 10¹²-shingle corpus expects ~30 colliding shingle pairs worldwide,
    // each perturbing one pair's Jaccard by O(1/n)) — while shuffle bytes
    // drop ~3× and the struct sort compares longs. Document frequency is
    // the pre-combined `groupBy(tok).count` joined back — partial
    // aggregation combines map-side and the join streams, so a hot
    // boilerplate shingle costs one combined (tok, count) row instead of
    // buffering a corpus-scale row group in one window partition (a
    // `count().over(Window.partitionBy(tok))` has no map-side combine and
    // melts on skewed tokens at 100 TB). The exploded (id, tok) rows —
    // 16 bytes each — persist ONCE so the CodegenFallback shingle HOF
    // chain is not recomputed for the frequency branch. The (df, tok_hash)
    // sort is a total order identical across documents, no global rank
    // table needed.
    val (prefix0raw, sorted, stages) =
      ppjoinPrefixStage(df, textCol, idCol, shingleWords, threshold)
    // r20: persist the prefix rows too — the estimate's histogram pass,
    // BOTH sides of the candidate self-join, and the sizing repartition
    // all consume them; without the cache each consumer re-runs the
    // posexplode+slice over `sorted`, so the estimate was a second full
    // pass over the sorted-prefix stage (r19 verdict ask #4). Skinny
    // (id, n, pos, tok) rows, ~the prefix fraction of the exploded stage.
    val prefix0 = prefix0raw.persist(StorageLevel.MEMORY_AND_DISK)
    // prefix length p = n - ceil(t*n) + 1; 0-based pos from posexplode
    //
    // Exchange sizing ([[AdaptiveParts]]): the prefix join's candidate
    // cardinality is sum-of-C(m,2) over the per-token histogram — pair
    // math a fixed partition count or AQE's map-bytes heuristic cannot
    // see (SCALE.md r17: 9.6 GB of candidates out of ~100 MB of prefix
    // rows; 256 parts beat 4x the heap). The histogram aggregate reads
    // the already-persisted `sorted` stage; length/positional filters
    // only shrink the true volume, so the estimate is a safe upper
    // bound. Below the session floor every bySize call is
    // identity and the r17 plan is unchanged.
    val floor = AdaptiveParts.sessionFloor(df.sparkSession)
    val estimate = if (sizeExchanges) {
      val e = AdaptiveParts.allPairEstimate(prefix0, Seq("tok"))
      warnIfExactnessOutgrown("similarityJoin", e, rowsPerPartition, threshold)
      e
    } else 0L
    val parts = AdaptiveParts.partsFor(estimate, floor, rowsPerPartition)
    // r20 verify spread (r19 verdict ask #5): below the floor the verify
    // exchanges carry bytes AQE coalesces to 1-2 tasks while each pair
    // costs an intersect kernel — hold them at a CPU-priced width instead
    // (never above the floor; above the floor `parts` owns the layout and
    // this is 0 = identity)
    val vp = if (parts > floor) 0
      else AdaptiveParts.verifyParts(estimate, floor)
    val prefix = AdaptiveParts.bySize(prefix0, parts, floor, col("tok"))
    val overlapNeeded =
      ceil(lit(threshold / (1 + threshold)) * (col("a.n") + col("b.n")))
    val cand = AdaptiveParts.bySize(
      prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
        least(col("a.n"), col("b.n")) >=
          ceil(lit(threshold) * greatest(col("a.n"), col("b.n"))) &&
        least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >= overlapNeeded)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")),
      parts, floor, col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    // verify computes ONLY the intersection: |union| = n_a + n_b − |∩|
    // (sets are distinct), so the second per-pair hash-set build that
    // array_union would do is replaced by two already-carried lengths —
    // the verify stage is the candidate-count-bound cost at scale. BOTH
    // verify exchanges are pair-volume-sized: the second join's input
    // additionally carries the id_a-side token arrays, so leaving it at
    // the session floor is the d14@100x bottleneck once the candidate
    // join itself is sized (measured r18: 270 s at floor vs 149 s sized)
    // verify spread applies to the SKINNY candidate side only (id_a, before
    // any token array attaches); spreading the id_b exchange — whose rows
    // already carry the id_a-side arrays — measured a net LOSS (r20: p1
    // 3.8→4.8 s, d14 1.65→2.2 s with both sides spread), so that exchange
    // keeps AQE's bytes-priced width below the floor
    val verified = AdaptiveParts.bySize(
      AdaptiveParts.byVerifyCost(
        AdaptiveParts.bySize(cand, parts, floor, col("id_a")), vp, col("id_a"))
        .join(sorted.select(col("id").as("id_a"), col("toks").as("__ta"),
          col("n").as("__na")), "id_a"),
      parts, floor, col("id_b"))
      .join(sorted.select(col("id").as("id_b"), col("toks").as("__tb"),
        col("n").as("__nb")), "id_b")
      .withColumn("__i", graft.functions.VectorOps
        .intersect_size(col("__ta"), col("__tb")).cast(DoubleType))
      .select(col("id_a"), col("id_b"),
        (col("__i") / (col("__na") + col("__nb") - col("__i"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
    (verified, stages :+ prefix0)
  }

  /** The PPJoin prefix stage shared by [[similarityJoinPlan]] and the
    * [[graft.ScaleEstimate]] receipts tool: (prefix rows, sorted stage,
    * persisted stages to release). */
  private[graft] def ppjoinPrefixStage(df: DataFrame, textCol: String,
      idCol: String, shingleWords: Int, threshold: Double)
      : (DataFrame, DataFrame, Seq[DataFrame]) = {
    val exploded = ppjoinExploded(df, textCol, idCol, shingleWords)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val freq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    val sorted = ppjoinSorted(exploded.join(freq, "tok"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    (ppjoinPrefix(sorted, threshold), sorted, Seq(exploded, sorted))
  }

  /** (id, tok) rows of 64-bit-hashed distinct shingles — the shared scan
    * stage of the PPJoin family. */
  private def ppjoinExploded(df: DataFrame, textCol: String, idCol: String,
      shingleWords: Int): DataFrame =
    // widenNarrowScan: shingling is the dominant per-row cost and inherits
    // scan width (measured r19: the whole prefix-stage materialization ran
    // on ONE task at local[32]); identity on wide scans (guide §2.5)
    // Fenced token stage: see wordShinglesFromToks — tokenize once per row.
    AdaptiveParts.widenNarrowScan(df, col(idCol))
      .select(col(idCol).cast(LongType).as("id"),
        graft.functions.OptimizerFence.fence(
          TextAnalysis.tokens(lower(col(textCol)))).as("__toks"))
      .select(col("id"),
        array_distinct(transform(
          wordShinglesFromToks(col("__toks"), shingleWords),
          s => xxhash64(s))).as("s"))
      .select(col("id"), explode(col("s")).as("tok"))

  /** Sort each document's tokens under the (df, tok) canonical order the
    * `df` column encodes; output (id, toks, n). */
  private def ppjoinSorted(explodedWithDf: DataFrame): DataFrame =
    explodedWithDf.groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("st"))
      .select(col("id"),
        transform(col("st"), x => x.getField("tok")).as("toks"),
        size(col("st")).as("n"))

  /** Prefix rows (id, n, pos, tok): the first n − ceil(t·n) + 1 tokens of
    * each sorted document — the only part that enters the candidate join. */
  private def ppjoinPrefix(sorted: DataFrame, threshold: Double): DataFrame =
    sorted.select(col("id"), col("n"),
        posexplode(slice(col("toks"), lit(1),
          (col("n") - ceil(lit(threshold) * col("n")) + lit(1)).cast("int"))))
      .toDF("id", "n", "pos", "tok")

  /** The PPJoin store stages: the token-frequency table that FREEZES the
    * canonical order, plus each document's order-sorted token-hash array.
    * Stage both to parquet; [[similarityJoinAgainstStore]] dedupes any
    * later batch against them without re-reading corpus text.
    *
    * The frozen order is a correctness-free choice: prefix filtering is
    * exact under ANY fixed total order — frequencies only make prefixes
    * rare (= fast). As the corpus drifts from the frozen frequencies the
    * join stays exact and merely prunes less; rebuild the store when
    * candidate volume creeps up. */
  def similarityStages(df: DataFrame, textCol: String, idCol: String,
      shingleWords: Int = 2): (DataFrame, DataFrame) = {
    // localCheckpoint (eager, GC-released — not the cache manager) so the
    // CodegenFallback shingle HOF chain runs ONCE for the two branches
    // (frequency + canonical sort), the same recompute the in-line
    // similarityJoinPlan avoids by persisting its explode
    val exploded = ppjoinExploded(df, textCol, idCol, shingleWords)
      .localCheckpoint()
    val freq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    val sorted = ppjoinSorted(exploded.join(freq, "tok"))
    (freq, sorted)
  }

  /** EXACT incremental similarity join: every (new, store) pair with
    * shingle-Jaccard >= threshold — [[similarityJoin]]'s bipartite twin
    * over a parquet-staged store ([[similarityStages]]). The new batch
    * sorts under the store's FROZEN canonical order (unseen tokens rank
    * rarest at df 0 — still one total order across both sides, so the
    * prefix theorem holds and the join stays exact). Only the new batch
    * is shingled; store docs contribute their staged prefix tokens and
    * arrays. */
  def similarityJoinAgainstStore(newDocs: DataFrame, textCol: String,
      idCol: String, storeFreq: DataFrame, storeSorted: DataFrame,
      shingleWords: Int = 2, threshold: Double = 0.6,
      rowsPerPartition: Long = AdaptiveParts.RowsPerPartition): DataFrame = {
    val (verified, stages) = similarityJoinAgainstStorePlan(newDocs, textCol,
      idCol, storeFreq, storeSorted, shingleWords, threshold, rowsPerPartition)
    materializeAndRelease(verified, stages)
  }

  /** The lazy against-store PPJoin plan + its persisted stages (exposed
    * for plan tests; callers use [[similarityJoinAgainstStore]]). */
  private[graft] def similarityJoinAgainstStorePlan(newDocs: DataFrame,
      textCol: String, idCol: String, storeFreq: DataFrame,
      storeSorted: DataFrame, shingleWords: Int, threshold: Double,
      rowsPerPartition: Long): (DataFrame, Seq[DataFrame]) = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val newSorted = ppjoinSorted(
        ppjoinExploded(newDocs, textCol, idCol, shingleWords)
          .join(storeFreq, Seq("tok"), "left")
          .na.fill(0L, Seq("df")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val newPrefix = ppjoinPrefix(newSorted, threshold)
    val storePrefix = ppjoinPrefix(storeSorted, threshold)
    // exchange sizing ([[AdaptiveParts]], r18 verdict ask #5): the
    // bipartite prefix join's candidate volume is per-token histogram
    // math. The store side's histogram never needs the store re-exploded:
    // its STAGED frequency table bounds it (prefix rows per token ≤ doc
    // frequency — a prefix holds at most one row per (doc, tok)), so the
    // estimate is one join of the batch's prefix histogram (off the
    // persisted newSorted stage) against the freq parquet the batch scan
    // already reads. Safe overestimate; below the floor the plan is
    // byte-identical to the unsized one.
    val floor = AdaptiveParts.sessionFloor(newDocs.sparkSession)
    val estimate = AdaptiveParts.bipartiteFromHists(
      newPrefix.groupBy("tok").agg(count(lit(1)).as("__ml")),
      storeFreq.select(col("tok"), col("df").as("__mr")), Seq("tok"))
    warnIfExactnessOutgrown("similarityJoinAgainstStore", estimate,
      rowsPerPartition, threshold)
    val parts = AdaptiveParts.partsFor(estimate, floor, rowsPerPartition)
    val overlapNeeded =
      ceil(lit(threshold / (1 + threshold)) * (col("a.n") + col("b.n")))
    val cand = AdaptiveParts.bySize(
      AdaptiveParts.bySize(newPrefix, parts, floor, col("tok")).as("a")
        .join(AdaptiveParts.bySize(storePrefix, parts, floor, col("tok")).as("b"),
        col("a.tok") === col("b.tok") &&
        col("a.id") =!= col("b.id") && // the store may already hold the doc
        least(col("a.n"), col("b.n")) >=
          ceil(lit(threshold) * greatest(col("a.n"), col("b.n"))) &&
        least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >= overlapNeeded)
      .select(col("a.id").as("id_new"), col("b.id").as("id_store")),
      parts, floor, col("id_new"), col("id_store"))
      .dropDuplicates("id_new", "id_store")
    val verified = AdaptiveParts.bySize(
      AdaptiveParts.bySize(cand, parts, floor, col("id_new"))
        .join(newSorted.select(col("id").as("id_new"), col("toks").as("__ta"),
          col("n").as("__na")), "id_new"),
      parts, floor, col("id_store"))
      .join(storeSorted.select(col("id").as("id_store"), col("toks").as("__tb"),
        col("n").as("__nb")), "id_store")
      .withColumn("__i", graft.functions.VectorOps
        .intersect_size(col("__ta"), col("__tb")).cast(DoubleType))
      .select(col("id_new"), col("id_store"),
        (col("__i") / (col("__na") + col("__nb") - col("__i"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
    (verified, Seq(newSorted))
  }

  /** One micro-batch step of the streaming EXACT-similarity dedup loop —
    * the [[minhashStoreStep]] shape for the PPJoin family: dedupe the
    * arriving batch against the staged store, then append the sorted
    * arrays of the batch's non-duplicates under the store's frozen
    * canonical order (the frequency table is written once, by the first
    * batch, and never rewritten — see [[similarityStages]] on why that
    * preserves exactness). Returns (id_new, id_store, jaccard), eagerly
    * materialized BEFORE the append. */
  def similarityStoreStep(batch: DataFrame, storeDir: String, textCol: String,
      idCol: String, shingleWords: Int = 2, threshold: Double = 0.6,
      batchId: Long, maxStoreParts: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val freqPath = s"$storeDir/freq"
    val sortedPath = s"$storeDir/sorted"
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // the canonical (df, tok) order freezes at FOUNDING: freq writes once,
    // from the first batch. Re-founding is overwrite-idempotent (the same
    // batch derives the same frequencies). Founding commits via graft's
    // OWN marker file written AFTER the parquet job succeeds — neither a
    // part-file glob (a crash mid-job-commit can surface partial parts
    // and freeze a torn (df, tok) order) nor the committer's _SUCCESS
    // (object-store configs commonly disable
    // mapreduce.fileoutputcommitter.marksuccessfuljobs, which would
    // re-found EVERY batch and silently drift the frozen order). A crash
    // between write and marker re-founds with a full overwrite; readers
    // skip the underscore file (FileIndex hidden-file rule).
    val foundedMarker = new org.apache.hadoop.fs.Path(s"$freqPath/_GRAFT_FOUNDED")
    if (!fs.exists(foundedMarker)) {
      // LEGACY MIGRATION: stores founded before the graft marker carry
      // the committer's _SUCCESS — re-founding them would freeze a NEW
      // (df, tok) order inconsistent with their already-sorted arrays
      // (silent missed dedups), so an existing commit just gets stamped
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$freqPath/_SUCCESS"))) {
        fs.create(foundedMarker, true).close()
      } else {
        val (freq, _) = similarityStages(batch, textCol, idCol, shingleWords)
        freq.write.mode("overwrite").parquet(freqPath)
        fs.create(foundedMarker, true).close()
      }
    }
    val storeFreq = spark.read.schema(StructType(Seq(
        StructField("tok", LongType), StructField("df", LongType))))
      .parquet(freqPath)
    val (_, emptySorted) = similarityStages(batch.limit(0), textCol, idCol,
      shingleWords)
    val storeSorted =
      BatchStore.readStore(spark, storeDir, "sorted", emptySorted, batchId)
    val dups = similarityJoinAgainstStore(batch, textCol, idCol,
      storeFreq, storeSorted, shingleWords, threshold)
    val kept = batch.join(dups.select(col("id_new").as(idCol)),
      Seq(idCol), "left_anti")
    // survivors land under the FROZEN order (unseen tokens fall back to
    // df 0 — the drifted-order exactness claim, spec-pinned); per-batch
    // partition overwrite makes retries replace, never double-insert
    BatchStore.writeBatchPart(
      ppjoinSorted(
        ppjoinExploded(kept, textCol, idCol, shingleWords)
          .join(storeFreq, Seq("tok"), "left")
          .na.fill(0L, Seq("df"))),
      sortedPath, s"$storeDir/compactions/sorted", batchId)
    BatchStore.autoCompact(spark, sortedPath,
      s"$storeDir/compactions/sorted", maxStoreParts, batchId)(
      similarityStoreCompact(spark, storeDir, _, _))
    dups
  }

  /** Fold the PPJoin store's committed `sorted` batch partitions
    * ([[BatchStore]] marker protocol; identity merge — rows are
    * per-document). `freq` is founding-frozen (one directory, never
    * partitioned) so only `sorted` compacts. */
  def similarityStoreCompact(spark: SparkSession, storeDir: String,
      compactId: Long, upToBatchId: Long): Seq[Long] =
    BatchStore.compact(spark, s"$storeDir/sorted",
      s"$storeDir/compactions/sorted", None, compactId, upToBatchId,
      df => df.drop("batch_id"))

  // -------------------------------------------------------------------------
  // Winnowing
  // -------------------------------------------------------------------------

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
    * the MOSS algorithm): hash every `k`-word gram, slide a `window`-wide
    * window over the hash sequence, and keep each window's minimum — the
    * selected set carries the GUARANTEE that any shared run of at least
    * `window + k − 1` words between two documents shares at least one
    * fingerprint. Unlike MinHash this is deterministic (no probabilistic
    * recall), which is why its output can be oracle-checked exactly.
    * Window minima use the md5 hex string itself — lexicographic order on
    * hex is engine-independent, so no numeric conversion is needed.
    *
    * Output: distinct (doc_id, fp). All work is scan-side Column
    * arithmetic until the final distinct; a document's fingerprint count
    * is ~`tokens / window`, so the shuffle carries ids + 32-char hashes,
    * never text. */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, window: Int = 4): DataFrame = {
    // fenced: the k-gram transform's LAMBDA slices __toks per element —
    // an inlined tokenize tree would re-split the text once per gram
    // (O(tokens × tokenize) per row); the fence keeps it evaluate-once
    val toks = graft.functions.OptimizerFence.fence(
      TextAnalysis.tokens(lower(col(textCol))))
    // widenNarrowScan: tokenize + per-gram md5 + winnow inherit scan width;
    // identity on wide scans (guide §2.5)
    AdaptiveParts.widenNarrowScan(df, col(idCol))
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .where(size(col("__toks")) >= k)
      .withColumn("__grams", transform(
        sequence(lit(0), size(col("__toks")) - k),
        i => md5(array_join(slice(col("__toks"), i + 1, lit(k)), " "))))
      .select(col("doc_id"),
        // codegen'd O(T) monotone-deque minima — same windows, same
        // lexicographic-on-hex comparison, same fingerprint set as the
        // transform+slice+array_min formulation it replaced
        explode(graft.functions.WinnowMins.winnow_mins(
          col("__grams"), window)).as("fp"))
      .dropDuplicates("doc_id", "fp")
  }

  /** Near-dup candidate pairs from shared winnowing fingerprints: the
    * deterministic alternative to the MinHash band join. Same skew story
    * as every bucket join here — a boilerplate fingerprint shared by a
    * million docs pairs via the capped star (see [[cappedPairs]]), keeping
    * per-fingerprint work linear. Shuffles ship (doc_id, 16-byte fp). */
  def winnowingCandidates(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, window: Int = 4, maxBucketPairing: Int = 64): DataFrame = {
    // persisted: the self-join references the ranked stage twice, and
    // without the cache each side re-tokenizes and re-winnows the corpus
    // (same contract as minhashPairsPlan — materialized pairs, zero cache
    // entries on return)
    val ranked = winnowFingerprints(df, textCol, idCol, k, window)
      .select(col("fp"), col("doc_id").as("id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("fp").orderBy("id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    materializeAndRelease(cappedPairs(ranked, Seq("fp"), maxBucketPairing),
      Seq(ranked))
  }

  /** Incremental winnowing — [[winnowingCandidates]] in the against-store
    * operating mode (the deterministic analogue of
    * [[minhashNearDupsAgainstStore]]): a NEW batch fingerprints itself and
    * joins a staged corpus fingerprint store ([[winnowFingerprints]] output
    * on parquet, ideally bucketed by fp) — corpus text is never
    * re-winnowed. The store side of each fingerprint is capped the same
    * bipartite way as the minhash store join: a batch doc sharing a
    * boilerplate fingerprint with a viral store cluster needs only the
    * first `maxBucketPairing` members as witnesses. Returns (id_new,
    * id_store, shared_fps) with the count of (capped) shared fingerprints
    * as the match-strength signal — deterministic end-to-end, so the store
    * path is exactly SQL-expressible, unlike minhash's. Shuffles ship
    * (fp, id) pairs only. */
  def winnowingCandidatesAgainstStore(newDocs: DataFrame, textCol: String,
      idCol: String, storeFps: DataFrame,
      k: Int = 3, window: Int = 4, maxBucketPairing: Int = 64,
      rowsPerPartition: Long = AdaptiveParts.RowsPerPartition): DataFrame = {
    val (shared, stages) = winnowingCandidatesAgainstStorePlan(newDocs,
      textCol, idCol, storeFps, k, window, maxBucketPairing, rowsPerPartition)
    materializeAndRelease(shared, stages)
  }

  /** The lazy against-store plan + its persisted stages (exposed for plan
    * tests; callers use [[winnowingCandidatesAgainstStore]]). */
  private[graft] def winnowingCandidatesAgainstStorePlan(newDocs: DataFrame,
      textCol: String, idCol: String, storeFps: DataFrame,
      k: Int, window: Int, maxBucketPairing: Int,
      rowsPerPartition: Long): (DataFrame, Seq[DataFrame]) = {
    // persisted: the sizing tier counts the batch's fingerprints and the
    // join reads them again (same contract as minhashNearDupsAgainstStore
    // — result materialized, zero cache entries on return)
    val newFps = winnowFingerprints(newDocs, textCol, idCol, k, window)
      .select(col("fp"), col("doc_id").as("id_new"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cappedStore = storeFps
      .select(col("fp"), col("doc_id").as("id_store"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("fp").orderBy("id_store")))
      .where(col("__rn") <= maxBucketPairing).drop("__rn")
    val floor = AdaptiveParts.sessionFloor(newDocs.sparkSession)
    val parts = bipartiteParts(newFps, storeFps.select("fp"), Seq("fp"),
      maxBucketPairing, floor, rowsPerPartition)
    val shared = AdaptiveParts.bySize(
      AdaptiveParts.bySize(newFps, parts, floor, col("fp"))
        .join(AdaptiveParts.bySize(cappedStore, parts, floor, col("fp")),
          Seq("fp"))
        .where(col("id_new") =!= col("id_store")), // store may hold the doc
      parts, floor, col("id_new"), col("id_store"))
      .groupBy("id_new", "id_store")
      .agg(count(lit(1)).as("shared_fps"))
    (shared, Seq(newFps))
  }

  /** One micro-batch step of the STREAMING winnowing candidate loop —
    * [[minhashStoreStep]]'s shape for the MOSS fingerprint tier, and the
    * fully DETERMINISTIC member of the store-loop family (window minima,
    * no RNG — the whole loop is SQL-expressible and hash-oracled).
    * Candidates of the arriving batch against everything ingested so
    * far; docs sharing at least `minSharedFps` fingerprints with a store
    * doc are near-dups and do NOT enter the store (keep-one semantics);
    * per-batch-overwrite partitions make retries replace, never
    * double-insert ([[BatchStore]] contract). Returns (id_new, id_store,
    * shared_fps). */
  def winnowingStoreStep(batch: DataFrame, storeDir: String, textCol: String,
      idCol: String, k: Int = 3, window: Int = 4, maxBucketPairing: Int = 64,
      minSharedFps: Int = 2, batchId: Long, maxStoreParts: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val emptyFps = winnowFingerprints(batch.limit(0), textCol, idCol, k, window)
    val storeFps =
      BatchStore.readStore(spark, storeDir, "fps", emptyFps, batchId)
    // pin the as-of-this-batch verdict before the store write
    val dups = winnowingCandidatesAgainstStore(batch, textCol, idCol,
      storeFps, k, window, maxBucketPairing)
      .where(col("shared_fps") >= minSharedFps)
      .localCheckpoint()
    val kept = batch.join(dups.select(col("id_new").as(idCol)),
      Seq(idCol), "left_anti")
    BatchStore.writeBatchPart(winnowFingerprints(kept, textCol, idCol, k, window),
      s"$storeDir/fps", s"$storeDir/compactions/fps", batchId)
    BatchStore.autoCompact(spark, s"$storeDir/fps",
      s"$storeDir/compactions/fps", maxStoreParts, batchId)(
      winnowingStoreCompact(spark, storeDir, _, _))
    dups
  }

  /** Fold the winnowing fingerprint store's committed batch partitions
    * (identity merge; [[BatchStore]] marker protocol). */
  def winnowingStoreCompact(spark: SparkSession, storeDir: String,
      compactId: Long, upToBatchId: Long): Seq[Long] =
    BatchStore.compactIdentity(spark, storeDir, Seq("fps"),
      compactId, upToBatchId)

  // -------------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------------

  /** 64-bit SimHash: per-bit majority vote over token hashes. One fold over
    * the token-hash array maintains all 64 vote counters at once (64
    * separate aggregates would re-hash every token per bit — HOFs are
    * CodegenFallback, nothing dedupes the repetition). */
  def simhash64(text: Column): Column =
    simhash64FromHashes(transform(TextAnalysis.tokens(lower(text)), t => xxhash64(t)))

  /** Since r9 the majority-vote fold is the codegen'd
    * [[graft.functions.SimHashSig]] kernel — same vote rule and strict
    * positivity threshold, bit-equal fingerprints; the 64-wide
    * zip_with-per-token HOF it replaced ran in the CodegenFallback
    * interpreter. */
  def simhash64FromHashes(hashes: Column): Column =
    graft.functions.SimHashSig.simhash_sig(hashes)

  /** Near-dups by Hamming distance ≤ maxDist, bucketed on 16-bit chunks
    * (pigeonhole: distance ≤ 3 ⇒ some chunk of 4 is identical).
    *
    * The simhash stage is persisted so the 64-bit majority-vote fold runs
    * once; the self-join and the verify both read the cache. Pairing is
    * capped per bucket (see cappedPairs). */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3, maxBucketPairing: Int = 64): DataFrame = {
    val (pairs, stages) = simhashPairsPlan(df, textCol, idCol, maxDist, maxBucketPairing)
    materializeAndRelease(pairs, stages)
  }

  private[graft] def simhashPairsPlan(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int, maxBucketPairing: Int): (DataFrame, Seq[DataFrame]) =
    fingerprintPairsPlan(simhashStages(df, textCol, idCol)._1, maxDist, maxBucketPairing)

  /** Pigeonhole 16-bit-chunk buckets for any (id, sim: 64-bit) fingerprint
    * table — any pair within hamming distance 3 shares at least one chunk. */
  private[graft] def fingerprintBuckets(withSim: DataFrame): DataFrame =
    withSim.select(col("id"),
      explode(array((0 until 4).map(c => struct(
        lit(c).as("chunk"),
        shiftright(col("sim"), c * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("b"))
      .select(col("id"), col("b.chunk").as("chunk"), col("b.key").as("key"))

  /** Pigeonhole variant of [[warnIfUnderPlaned]]: 16-bit chunk keys give a
    * FIXED 2^16 buckets, so past ~cap×65536 docs the capped join drops
    * candidates and recall saturates silently. The fix at that scale is a
    * sharded corpus (dedupe per shard/day, cross-shard via the
    * `*AgainstStore` incremental mode) or a wider fingerprint. */
  private[graft] def warnIfUnderBucketed(op: String, corpusSize: Long,
      maxBucketPairing: Int): Boolean = {
    val mean = corpusSize.toDouble / 65536.0
    val under = mean > maxBucketPairing
    if (under)
      System.err.println(f"[graft] $op: mean pigeonhole bucket occupancy " +
        f"~$mean%.0f (corpus $corpusSize over 2^16 buckets) exceeds the " +
        f"pairing cap $maxBucketPairing — candidates past the cap are " +
        "dropped and recall silently saturates; shard the corpus " +
        "(incremental *AgainstStore mode) or widen the fingerprint")
    under
  }

  /** The simhash candidate/verify machinery over an ARBITRARY 64-bit
    * fingerprint table (id, sim) — factored out so other fingerprint
    * families (perceptual hashes over media bytes, [[Multimodal]]) reuse
    * the same skew-capped pigeonhole join. */
  private[graft] def fingerprintPairsPlan(withSimRaw: DataFrame,
      maxDist: Int, maxBucketPairing: Int): (DataFrame, Seq[DataFrame]) = {
    val withSim = withSimRaw.persist(StorageLevel.MEMORY_AND_DISK)
    // one count on the (already persisted) fingerprint stage: occupancy guard
    warnIfUnderBucketed("fingerprintNearDups", withSim.count(), maxBucketPairing)
    val ranked = fingerprintBuckets(withSimRaw)
      .withColumn("rn", row_number().over(
        Window.partitionBy("chunk", "key").orderBy("id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = cappedPairs(ranked, Seq("chunk", "key"), maxBucketPairing)
      .join(withSim.select(col("id").as("id_a"), col("sim").as("sim_a")), "id_a")
      .join(withSim.select(col("id").as("id_b"), col("sim").as("sim_b")), "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
    (pairs, Seq(withSim, ranked))
  }

  /** Near-dup pairs for a prepared (id, sim) fingerprint table, eagerly
    * materialized with stage caches released (the [[materializeAndRelease]]
    * contract). */
  def fingerprintNearDups(withSim: DataFrame, maxDist: Int = 3,
      maxBucketPairing: Int = 64): DataFrame = {
    val (pairs, stages) = fingerprintPairsPlan(withSim, maxDist, maxBucketPairing)
    materializeAndRelease(pairs, stages)
  }

  /** The simhash store tables: (id, sim) fingerprints and the exploded
    * (id, chunk, key) pigeonhole buckets — stage these to parquet and new
    * batches never re-fingerprint the corpus. */
  def simhashStages(df: DataFrame, textCol: String, idCol: String)
      : (DataFrame, DataFrame) = {
    val withSim = df
      .select(col(idCol).as("id"),
        transform(TextAnalysis.tokens(lower(col(textCol))), t => xxhash64(t)).as("__th"))
      .select(col("id"), simhash64FromHashes(col("__th")).as("sim"))
    (withSim, fingerprintBuckets(withSim))
  }

  /** Incremental simhash: a new batch against the staged store — same
    * bipartite shape as [[minhashNearDupsAgainstStore]]. Returns
    * (id_new, id_store, hamming). */
  def simhashNearDupsAgainstStore(newDocs: DataFrame, textCol: String,
      idCol: String, storeSims: DataFrame, storeBuckets: DataFrame,
      maxDist: Int = 3, maxBucketPairing: Int = 64): DataFrame = {
    val (newSimsRaw, newBuckets) = simhashStages(newDocs, textCol, idCol)
    val newSims = newSimsRaw.persist(StorageLevel.MEMORY_AND_DISK)
    val cappedStore = storeBuckets
      .withColumn("__rn", row_number().over(
        Window.partitionBy("chunk", "key").orderBy("id")))
      .where(col("__rn") <= maxBucketPairing).drop("__rn")
    val pairs = newBuckets.as("n").join(cappedStore.as("s"), Seq("chunk", "key"))
      .select(col("n.id").as("id_new"), col("s.id").as("id_store"))
      .where(col("id_new") =!= col("id_store"))
      .dropDuplicates("id_new", "id_store")
      .join(newSims.select(col("id").as("id_new"), col("sim").as("sim_n")), "id_new")
      .join(storeSims.select(col("id").as("id_store"), col("sim").as("sim_s")), "id_store")
      .withColumn("hamming", bit_count(col("sim_n").bitwiseXOR(col("sim_s"))))
      .where(col("hamming") <= maxDist)
      .select("id_new", "id_store", "hamming")
    materializeAndRelease(pairs, Seq(newSims))
  }

  /** One micro-batch step of the STREAMING simhash near-dup loop —
    * [[minhashStoreStep]]'s shape for the fingerprint tier: the batch
    * dedups against the staged (id, sim) + pigeonhole-bucket store,
    * survivors land in per-batch-overwrite partitions ([[BatchStore]]
    * contract: retries replace their partial and never read it).
    * Deterministic end-to-end (simhash has no RNG), so unlike the
    * minhash loop the store path is exactly SQL-expressible. Returns
    * (id_new, id_store, hamming) for the arriving batch. */
  def simhashStoreStep(batch: DataFrame, storeDir: String, textCol: String,
      idCol: String, maxDist: Int = 3, maxBucketPairing: Int = 64,
      batchId: Long, maxStoreParts: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val (emptySims, emptyBk) = simhashStages(batch.limit(0), textCol, idCol)
    val dups = simhashNearDupsAgainstStore(batch, textCol, idCol,
      BatchStore.readStore(spark, storeDir, "sims", emptySims, batchId),
      BatchStore.readStore(spark, storeDir, "buckets", emptyBk, batchId),
      maxDist, maxBucketPairing)
    val kept = batch.join(dups.select(col("id_new").as(idCol)),
      Seq(idCol), "left_anti")
    val (sims, bk) = simhashStages(kept, textCol, idCol)
    BatchStore.writeBatchPart(sims, s"$storeDir/sims",
      s"$storeDir/compactions/sims", batchId)
    BatchStore.writeBatchPart(bk, s"$storeDir/buckets",
      s"$storeDir/compactions/buckets", batchId)
    BatchStore.autoCompact(spark, s"$storeDir/sims",
      s"$storeDir/compactions/sims", maxStoreParts, batchId)(
      simhashStoreCompact(spark, storeDir, _, _))
    dups
  }

  /** Fold the simhash store's committed batch partitions (identity
    * merge; [[BatchStore]] marker protocol). */
  def simhashStoreCompact(spark: SparkSession, storeDir: String,
      compactId: Long, upToBatchId: Long): Seq[Long] =
    BatchStore.compactIdentity(spark, storeDir, Seq("sims", "buckets"),
      compactId, upToBatchId)

  // -------------------------------------------------------------------------
  // Embedding cosine near-dup (random hyperplane LSH)
  // -------------------------------------------------------------------------

  /** Deterministic pseudo-random hyperplane component r_{p,j} in [-0.5,0.5]
    * derived from xxhash64 — no RNG state to ship to executors. */
  private def hyperplaneComponent(p: Int, j: Column): Column =
    (xxhash64(lit(p), j).cast(DoubleType) / lit(Long.MaxValue.toDouble)) / 2.0

  /** Signature width that keeps EXPECTED mean bucket occupancy
    * (corpus / 2^planes) at or under the pairing cap. Hyperplane-LSH
    * recall saturates silently once buckets overflow the cap (the capped
    * join drops candidates past it), so `planes` must grow
    * ~log2(corpus/cap) — a fixed default that is fine at sf0.1 starves at
    * 100× the corpus. Clamped to [4, 62] (signature packs into a long). */
  def recommendedPlanes(corpusSize: Long, maxBucketPairing: Int = 64): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, corpusSize.toDouble / math.max(1, maxBucketPairing)))
        / math.log(2.0)).toInt
    math.min(62, math.max(4, needed))
  }

  /** Loud stderr advisory (r18 verdict ask #1) when a corpus has OUTGROWN
    * exact PPJoin: candidate volume is corpus math — exactness must
    * examine every same-prefix-token pair, so on heavily-templated
    * corpora it grows super-linearly (measured 8.4× per data decade at
    * τ=0.6, SCALE.md) — and past `MaxParts × rowsPerPartition` the
    * adaptive sizing can no longer hold its per-partition target: the
    * join still completes (spill, wider tasks), but each further decade
    * costs ~an order of magnitude more compute. The estimate is already
    * computed for exchange sizing, so the advisory is free; it routes
    * the caller at the right operating point — the banded MinHash path
    * (`minhashNearDups`, d2) is the probabilistic 100 TB route, or raise
    * the threshold (τ≥0.7 prunes templated corpora to true structure).
    * Returns whether it fired (unit-testable). */
  private[graft] def warnIfExactnessOutgrown(op: String, estimatedPairs: Long,
      rowsPerPartition: Long, threshold: Double): Boolean = {
    val budget = AdaptiveParts.MaxParts.toLong * rowsPerPartition
    val outgrown = estimatedPairs > budget
    if (outgrown)
      System.err.println(f"[graft] $op: ~$estimatedPairs%,d candidate pairs " +
        f"estimated (τ=$threshold) exceeds the sizing budget of " +
        f"$budget%,d (${AdaptiveParts.MaxParts} partitions × " +
        f"$rowsPerPartition%,d pair rows) — this corpus has outgrown exact " +
        "PPJoin: the join will complete but cost grows super-linearly per " +
        "data decade. Use the banded MinHash path (minhashNearDups) at this " +
        "scale, or raise the threshold to prune templated shingles")
    outgrown
  }

  /** Loud stderr warning (the connectedComponents non-convergence pattern,
    * see below) when a signature is under-provisioned for the corpus:
    * mean occupancy past the cap means dropped candidates and silently
    * saturated recall. Returns whether it fired (unit-testable). */
  private[graft] def warnIfUnderPlaned(op: String, corpusSize: Long,
      planes: Int, maxBucketPairing: Int): Boolean = {
    val mean = corpusSize.toDouble / (1L << planes)
    val under = mean > maxBucketPairing
    if (under)
      System.err.println(f"[graft] $op: mean LSH bucket occupancy ~$mean%.0f " +
        f"(corpus $corpusSize, planes=$planes) exceeds the pairing cap " +
        f"$maxBucketPairing — candidates past the cap are dropped and recall " +
        f"silently saturates; use planes >= ${recommendedPlanes(corpusSize, maxBucketPairing)}")
    under
  }

  /** Sign-bit signature of `planes` random hyperplanes packed into a long.
    * `planeOffset` selects an independent hyperplane family — the banded
    * variant derives band b's planes from offset b·planesPerBand, so bands
    * share no hyperplane. */
  def hyperplaneSignature(vec: Column, planes: Int, planeOffset: Int = 0): Column =
    (0 until planes).map { p =>
      val dot = aggregate(zip_with(vec,
        transform(sequence(lit(0), size(vec) - 1), j => hyperplaneComponent(planeOffset + p, j)),
        (v, r) => v.cast(DoubleType) * r), lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }.reduce(_ + _)

  /** The exact per-component value [[hyperplaneComponent]] computes,
    * evaluated ONCE on the driver: the same catalyst XxHash64 (seed 42)
    * over the same Int literals, the same double arithmetic — bit-equal
    * to the expression path, so signatures (and the d5c/d5e/d5f oracle
    * hashes) are unchanged. */
  private def hyperplaneComponentValue(p: Int, j: Int): Double = {
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit, XxHash64}
    val h = new XxHash64(Seq(CatLit(p), CatLit(j))).eval(null).asInstanceOf[Long]
    (h.toDouble / Long.MaxValue.toDouble) / 2.0
  }

  /** [[hyperplaneSignature]] with the hyperplane matrix inlined as column
    * LITERALS for a known, fixed dimension — the HOF chain is interpreted
    * (CodegenFallback), so hashing the constant components per
    * row × plane × dim dominated the signature stage; pre-evaluating them
    * leaves one multiply-add per element, and the dot itself runs through
    * the CODEGEN'D [[graft.functions.DotProduct]] kernel (r12 — its
    * left-to-right float→double accumulation and null/length semantics
    * are bit-identical to the HOF `aggregate(zip_with(...))` it replaced,
    * so signatures and the d5c/d5e/d5f oracle hashes are unchanged).
    * Requires every vector to have exactly `dim` components (the
    * staged-index contract the PQ/IVF ops already assume). */
  private[graft] def hyperplaneSignatureLit(vec: Column, planes: Int, dim: Int,
      planeOffset: Int = 0): Column =
    (0 until planes).map { p =>
      val comps = array((0 until dim).map(j =>
        lit(hyperplaneComponentValue(planeOffset + p, j))): _*)
      val dot = graft.functions.VectorOps.dot_product(vec, comps)
      when(dot > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }.reduce(_ + _)

  /** Vector width from one row (None on an empty frame — callers fall
    * back to the dimension-agnostic expression path, which is vacuously
    * identical on zero rows). */
  private def vecDim(df: DataFrame, vecCol: String): Option[Int] =
    df.select(size(col(vecCol)).as("__d")).limit(1).collect()
      .headOption.map(_.getInt(0))

  def cosine(a: Column, b: Column): Column =
    cosineFromNorms(a, b, vecNorm(a), vecNorm(b))

  /** ‖v‖₂ via the codegen'd [[graft.functions.DotProduct]] kernel —
    * left-to-right double accumulation, bit-identical to the HOF
    * `aggregate(transform(v, x·x))` it replaced. */
  def vecNorm(v: Column): Column =
    sqrt(graft.functions.VectorOps.dot_product(v, v))

  /** Cosine with the norms PRECOMPUTED per vector: candidate-verify joins
    * evaluate one codegen'd dot product per PAIR instead of three
    * interpreted HOF aggregates — norms are per-vector quantities, so the
    * stages compute them once (2·|corpus| sqrts) rather than
    * 2·|candidates| times. Accumulation order and null semantics match
    * the original HOF chain, so values (and the d5* oracle hashes) are
    * bit-identical. */
  def cosineFromNorms(a: Column, b: Column, na: Column, nb: Column): Column = {
    val dot = graft.functions.VectorOps.dot_product(a, b)
    when(na > 0 && nb > 0, dot / (na * nb)).otherwise(lit(0.0))
  }

  /** The embedding store table: (id, v, sig) — the signature IS the bucket
    * key, so one staged table serves both candidate generation and the
    * cosine verify. */
  def embeddingStages(df: DataFrame, vecCol: String, idCol: String,
      planes: Int = 12): DataFrame = {
    val sig = vecDim(df, vecCol) match {
      case Some(d) => hyperplaneSignatureLit(col(vecCol), planes, d)
      case None => hyperplaneSignature(col(vecCol), planes)
    }
    df.select(col(idCol).as("id"), col(vecCol).as("v"),
      vecNorm(col(vecCol)).as("nrm"), sig.as("sig"))
  }

  /** Tolerate stores staged before the `nrm` column existed: attach it
    * scan-side on read (per-vector cost, same arithmetic). */
  private def withNorm(df: DataFrame): DataFrame =
    if (df.columns.contains("nrm")) df
    else df.withColumn("nrm", vecNorm(col("v")))

  /** Incremental embedding near-dup: a new batch of vectors against the
    * staged (id, v, sig) store — capped bipartite signature join, exact
    * cosine verify. `planes` must match the store's. Returns
    * (id_new, id_store, cos). */
  def embeddingNearDupsAgainstStore(newVecs: DataFrame, vecCol: String,
      idCol: String, storeSigs: DataFrame, planes: Int = 12,
      threshold: Double = 0.95, maxBucketPairing: Int = 64): DataFrame = {
    val newSigs = embeddingStages(newVecs, vecCol, idCol, planes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    warnIfUnderPlaned("embeddingNearDupsAgainstStore", newSigs.count(),
      planes, maxBucketPairing)
    val cappedStore = storeSigs
      .withColumn("__rn", row_number().over(Window.partitionBy("sig").orderBy("id")))
      .where(col("__rn") <= maxBucketPairing).drop("__rn")
    val pairs = newSigs.select(col("id").as("id_new"), col("v").as("v_n"),
        col("nrm").as("n_n"), col("sig"))
      .join(withNorm(cappedStore).select(col("id").as("id_store"),
        col("v").as("v_s"), col("nrm").as("n_s"), col("sig")), Seq("sig"))
      .where(col("id_new") =!= col("id_store"))
      .dropDuplicates("id_new", "id_store")
      .withColumn("cos",
        cosineFromNorms(col("v_n"), col("v_s"), col("n_n"), col("n_s")))
      .where(col("cos") >= threshold)
      .select(col("id_new"), col("id_store"), round(col("cos"), 6).as("cos"))
    materializeAndRelease(pairs, Seq(newSigs))
  }

  /** Embedding near-dups: bucket by hyperplane signature (all `planes` bits
    * equal ⇒ likely high cosine), verify exactly.
    *
    * The signature stage is persisted (one dot-product sweep per vector);
    * the bucket self-join moves only (id, sig, rn) and candidate pairs
    * re-attach vectors by id from the same cache for the cosine verify. */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
      planes: Int = 12, threshold: Double = 0.95,
      maxBucketPairing: Int = 64): DataFrame = {
    val (pairs, stages) = embeddingPairsPlan(df, vecCol, idCol, planes,
      threshold, maxBucketPairing)
    materializeAndRelease(pairs, stages)
  }

  private[graft] def embeddingPairsPlan(df: DataFrame, vecCol: String, idCol: String,
      planes: Int, threshold: Double, maxBucketPairing: Int): (DataFrame, Seq[DataFrame]) = {
    val sigs = embeddingStages(df, vecCol, idCol, planes)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one count on the (already persisted) signature stage: occupancy guard
    warnIfUnderPlaned("embeddingNearDups", sigs.count(), planes, maxBucketPairing)
    val ranked = sigs.select(col("id"), col("sig"))
      .withColumn("rn", row_number().over(Window.partitionBy("sig").orderBy("id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = cappedPairs(ranked, Seq("sig"), maxBucketPairing)
      .join(sigs.select(col("id").as("id_a"), col("v").as("v_a"),
        col("nrm").as("n_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("v").as("v_b"),
        col("nrm").as("n_b")), "id_b")
      .withColumn("cos",
        cosineFromNorms(col("v_a"), col("v_b"), col("n_a"), col("n_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    (pairs, Seq(sigs, ranked))
  }

  /** Banded (OR-amplified) hyperplane-LSH stages: the (id, v) vector table
    * plus exploded (id, band, sig) bucket rows — the minhash band layout
    * (AND within a band's `planesPerBand` sign bits, OR across `bands`
    * independent hyperplane families). At 100 TB both ARE the staged index
    * schema, exactly like [[minhashStages]]. */
  def embeddingStagesBanded(df: DataFrame, vecCol: String, idCol: String,
      bands: Int = 16, planesPerBand: Int = 8,
      widen: Boolean = true): (DataFrame, DataFrame) = {
    // guide §2.5 (r20): bands × planesPerBand codegen'd dot products per
    // row inherit the scan's split count — a single small vector file runs
    // the whole signature stage on 1-4 tasks (profiled: ann_lsh_planted's
    // dominant 0.9 s job had 4 tasks at local[32]). Identity on wide scans
    // (a staged index is many shards); query-side callers whose frame
    // feeds a broadcast build pass widen = false — an exchange under a
    // broadcast build only adds latency.
    val wide = if (widen) AdaptiveParts.widenNarrowScan(df, col(idCol)) else df
    val base = wide.select(col(idCol).as("id"), col(vecCol).as("v"),
      vecNorm(col(vecCol)).as("nrm"))
    val dim = vecDim(df, vecCol) // one tiny driver job, shared by all bands
    def bandSig(b: Int): Column = dim match {
      case Some(d) => hyperplaneSignatureLit(col("v"), planesPerBand, d, b * planesPerBand)
      case None => hyperplaneSignature(col("v"), planesPerBand, b * planesPerBand)
    }
    val buckets = base.select(col("id"),
      explode(array((0 until bands).map(b => struct(
        lit(b).as("band"), bandSig(b).as("sig"))): _*))
        .as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    (base, buckets)
  }

  /** Banded embedding near-dup — the RECALL face of hyperplane LSH. A
    * single `planes`-bit signature ([[embeddingNearDups]]) needs every sign
    * to agree, so pair-recall at moderate cosine collapses exponentially
    * (p^planes with p = 1 − θ/π); banding OR-amplifies it to
    * 1 − (1 − p^r)^b while keeping candidate generation a bucket equi-join.
    * Same scale shape as the minhash band join: shuffles carry
    * (id, band, sig) — never vectors — candidate pairs re-attach vectors by
    * id for the exact cosine verify, and the per-bucket star cap bounds
    * viral buckets. Deterministic seeded hyperplanes, so measured recall is
    * reproducible (d5e pins it against brute-force ground truth). */
  def embeddingNearDupsBanded(df: DataFrame, vecCol: String, idCol: String,
      bands: Int = 16, planesPerBand: Int = 8, threshold: Double = 0.95,
      maxBucketPairing: Int = 64): DataFrame = {
    val (pairs, stages) = embeddingBandedPairsPlan(df, vecCol, idCol, bands,
      planesPerBand, threshold, maxBucketPairing)
    materializeAndRelease(pairs, stages)
  }

  private[graft] def embeddingBandedPairsPlan(df: DataFrame, vecCol: String,
      idCol: String, bands: Int, planesPerBand: Int, threshold: Double,
      maxBucketPairing: Int): (DataFrame, Seq[DataFrame]) = {
    val (baseRaw, buckets) = embeddingStagesBanded(df, vecCol, idCol, bands, planesPerBand)
    val base = baseRaw.persist(StorageLevel.MEMORY_AND_DISK)
    // per-band occupancy is corpus / 2^planesPerBand — the guard reads the
    // (already persisted) vector stage once
    warnIfUnderPlaned("embeddingNearDupsBanded", base.count(), planesPerBand,
      maxBucketPairing)
    val ranked = buckets
      .withColumn("rn", row_number().over(
        Window.partitionBy("band", "sig").orderBy("id")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = cappedPairs(ranked, Seq("band", "sig"), maxBucketPairing)
      .join(base.select(col("id").as("id_a"), col("v").as("v_a"),
        col("nrm").as("n_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("v").as("v_b"),
        col("nrm").as("n_b")), "id_b")
      .withColumn("cos",
        cosineFromNorms(col("v_a"), col("v_b"), col("n_a"), col("n_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    (pairs, Seq(base, ranked))
  }

  /** Incremental banded near-dup: a new batch of vectors against the staged
    * banded index — the bipartite twin of [[embeddingNearDupsBanded]],
    * completing the `*AgainstStore` family (minhash/simhash/single-sig LSH
    * already have one). `storeBase` is the staged (id, v) vector table and
    * `storeBuckets` the staged (id, band, sig) rows, both as written by
    * [[embeddingStagesBanded]] (band/plane params must match). Only the
    * batch computes signatures; the join ships (id, band, sig) — never
    * vectors — and candidate pairs re-attach the two vectors by id for the
    * exact cosine verify. Returns (id_new, id_store, cos). */
  def embeddingNearDupsBandedAgainstStore(newVecs: DataFrame, vecCol: String,
      idCol: String, storeBase: DataFrame, storeBuckets: DataFrame,
      bands: Int = 16, planesPerBand: Int = 8, threshold: Double = 0.95,
      maxBucketPairing: Int = 64,
      rowsPerPartition: Long = AdaptiveParts.RowsPerPartition): DataFrame = {
    val (newBaseRaw, newBuckets) = embeddingStagesBanded(newVecs, vecCol, idCol,
      bands, planesPerBand)
    val newBase = newBaseRaw.persist(StorageLevel.MEMORY_AND_DISK)
    warnIfUnderPlaned("embeddingNearDupsBandedAgainstStore", newBase.count(),
      planesPerBand, maxBucketPairing)
    // bipartite skew cap: a batch vector sharing a band-bucket with a viral
    // store cluster only needs the first `cap` members as witnesses
    val cappedStore = storeBuckets
      .withColumn("__rn", row_number().over(
        Window.partitionBy("band", "sig").orderBy("id")))
      .where(col("__rn") <= maxBucketPairing).drop("__rn")
    // exchange sizing: same bipartite pricing as the minhash store join
    val floor = AdaptiveParts.sessionFloor(newVecs.sparkSession)
    val parts = bipartiteParts(newBuckets, storeBuckets, Seq("band", "sig"),
      maxBucketPairing, floor, rowsPerPartition)
    val candidates = AdaptiveParts.bySize(
      AdaptiveParts.bySize(newBuckets, parts, floor,
          col("band"), col("sig")).as("n")
        .join(AdaptiveParts.bySize(cappedStore, parts, floor,
          col("band"), col("sig")).as("s"), Seq("band", "sig"))
        .select(col("n.id").as("id_new"), col("s.id").as("id_store"))
        .where(col("id_new") =!= col("id_store")), // store may hold the vec
      parts, floor, col("id_new"), col("id_store"))
      .dropDuplicates("id_new", "id_store")
    val pairs = AdaptiveParts.bySize(
      AdaptiveParts.bySize(candidates, parts, floor, col("id_new"))
        .join(newBase.select(col("id").as("id_new"), col("v").as("v_n"),
          col("nrm").as("n_n")), "id_new"),
      parts, floor, col("id_store"))
      .join(withNorm(storeBase).select(col("id").as("id_store"),
        col("v").as("v_s"), col("nrm").as("n_s")), "id_store")
      .withColumn("cos",
        cosineFromNorms(col("v_n"), col("v_s"), col("n_n"), col("n_s")))
      .where(col("cos") >= threshold)
      .select(col("id_new"), col("id_store"), round(col("cos"), 6).as("cos"))
    materializeAndRelease(pairs, Seq(newBase))
  }

  /** One micro-batch step of the streaming banded near-dup loop — the
    * [[minhashStoreStep]] shape over embeddings: the arriving batch checks
    * against the parquet-staged banded index FIRST, then the stages of its
    * non-duplicate vectors APPEND (keep-one semantics: the store stays
    * canonical, a later copy of a dropped duplicate still resolves to the
    * originally-kept vector). Dup pairs are eagerly materialized BEFORE the
    * append (safe read-then-append ordering). Use from
    * `writeStream.foreachBatch`; corpus vectors are never re-signed — only
    * the batch computes signatures. */
  def bandedStoreStep(batch: DataFrame, storeDir: String, vecCol: String,
      idCol: String, bands: Int = 16, planesPerBand: Int = 8,
      threshold: Double = 0.95, maxBucketPairing: Int = 64,
      batchId: Long, maxStoreParts: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    // per-batch partition contract ([[BatchStore]], the minhashStoreStep
    // r14 migration): retries replace their partial and never read it
    val (emptyBase, emptyBk) =
      embeddingStagesBanded(batch.limit(0), vecCol, idCol, bands, planesPerBand)
    val dups = embeddingNearDupsBandedAgainstStore(batch, vecCol, idCol,
      BatchStore.readStore(spark, storeDir, "vectors", emptyBase, batchId),
      BatchStore.readStore(spark, storeDir, "buckets", emptyBk, batchId),
      bands, planesPerBand, threshold, maxBucketPairing)
    val kept = batch.join(dups.select(col("id_new").as(idCol)), Seq(idCol), "left_anti")
    val (base, bk) = embeddingStagesBanded(kept, vecCol, idCol, bands, planesPerBand)
    BatchStore.writeBatchPart(base, s"$storeDir/vectors",
      s"$storeDir/compactions/vectors", batchId)
    BatchStore.writeBatchPart(bk, s"$storeDir/buckets",
      s"$storeDir/compactions/buckets", batchId)
    BatchStore.autoCompact(spark, s"$storeDir/vectors",
      s"$storeDir/compactions/vectors", maxStoreParts, batchId)(
      bandedStoreCompact(spark, storeDir, _, _))
    dups
  }

  /** Fold the banded embedding store's committed batch partitions
    * (identity merge; [[BatchStore]] marker protocol — the
    * [[minhashStoreCompact]] twin for the embedding tier). */
  def bandedStoreCompact(spark: SparkSession, storeDir: String,
      compactId: Long, upToBatchId: Long): Seq[Long] =
    BatchStore.compactIdentity(spark, storeDir, Seq("vectors", "buckets"),
      compactId, upToBatchId)

  /** Corpus snapshot diff: classify every document id across two corpus
    * snapshots (crawl N vs crawl N+1, pre- vs post-filter) as
    * added / removed / changed / unchanged — the delta report an
    * incremental curation pipeline runs before reprocessing, so unchanged
    * mass (typically >95% of a recrawl) skips the expensive stages.
    *
    * Scale shape: each side reduces to (id, 16-byte md5) at the scan —
    * document text NEVER enters the join; the full-outer join shuffles
    * two skinny fingerprint tables on id. Status is a scan-side CASE
    * after the join. At 100 TB this is two column-pruned parquet scans
    * plus one hash-partitioned exchange of ~24-byte rows. */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val fa = a.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__ha"))
    val fb = b.select(col(idCol).as("doc_id"), md5(col(textCol)).as("__hb"))
    fa.join(fb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__ha").isNull, lit("added"))
          .when(col("__hb").isNull, lit("removed"))
          .when(col("__ha") === col("__hb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Embedding-space test-set decontamination — the SEMANTIC tier of
    * train/eval overlap removal (the lexical tiers are
    * [[graft.pipeline.TextAnalysis.contaminatedDocs]] and the n-gram /
    * bloom variants): a training example whose embedding lands within
    * `threshold` cosine of ANY benchmark embedding is flagged for
    * removal — paraphrased or re-formatted benchmark leakage that exact
    * and n-gram matching miss. Returns (id, max_bench_cos, keep) for
    * every training row.
    *
    * Scale shape: benchmark suites are thousands of vectors — the bench
    * side BROADCASTS (with precomputed norms), the scan-side cross pairs
    * each training vector against it, and the per-id max pre-combines
    * map-side before one skinny (id, double) exchange; the training
    * corpus is never shuffled and never pairs with itself. For benchmark
    * sets too large to broadcast, generate candidates with the banded
    * [[embeddingNearDupsBandedAgainstStore]] machinery instead — same
    * verdict algebra. */
  def semanticDecontaminate(train: DataFrame, bench: DataFrame,
      trainId: String, trainVec: String, benchVec: String,
      threshold: Double): DataFrame = {
    val b = broadcast(bench.select(col(benchVec).as("__bv"),
      vecNorm(col(benchVec)).as("__bn")))
    val agg = train.select(col(trainId), col(trainVec).as("__tv"),
        vecNorm(col(trainVec)).as("__tn"))
      .crossJoin(b)
      .select(col(trainId),
        round(cosineFromNorms(col("__tv"), col("__bv"), col("__tn"),
          col("__bn")), 6).as("__c"))
      .groupBy(trainId)
      .agg(max(col("__c")).as("max_bench_cos"))
    // left-join back onto the train id universe (the retrievalMetrics
    // pattern): an EMPTY bench frame must yield every training row with
    // keep=true / null max_bench_cos, not an empty result — callers that
    // treat absence as drop would otherwise invert the verdict
    train.select(col(trainId)).distinct()
      .join(agg, Seq(trainId), "left")
      .withColumn("keep",
        coalesce(col("max_bench_cos") < threshold, lit(true)))
  }

  // -------------------------------------------------------------------------
  // Entity resolution (blocked fuzzy record linkage)
  // -------------------------------------------------------------------------

  /** Blocked fuzzy entity matching — the record-linkage primitive
    * (Fellegi–Sunter shape, deterministic scoring): for each `dirty` row,
    * the best `clean` match under an edit-distance threshold, searched
    * ONLY within equal blocking keys. This is dedup's cross-table twin:
    * near-dup joins ask "same document?", entity matching asks "same
    * real-world entity across two tables?" (ingest reconciliation,
    * master-data joins, training-data source alignment).
    *
    * `blockKeys` maps a dirty-side expression -> clean-side expression,
    * each written against ITS OWN frame's plain column names (e.g.
    * `substring(col("d_name"), 1, 4) -> substring(col("name"), 1, 4)`) —
    * the expressions are resolved per side BEFORE the join, so callers
    * never touch join-internal aliases. All pairs are equality conjuncts
    * of the blocking join, so candidate scoring is confined to
    * block-cardinality groups — the quadratic levenshtein never sees the
    * corpus, just the block (choose keys so blocks stay bounded: name
    * prefixes, geo keys, phonetic codes). Keep-best is a per-dirty-id
    * window over candidate-cardinality partitions: (distance asc, clean
    * id asc) — fully deterministic. Returns (d_id, matched_id, dist);
    * dirty rows with no candidate under `maxDist` are absent. */
  def entityMatch(dirty: DataFrame, clean: DataFrame,
      dirtyId: String, cleanId: String,
      dirtyName: String, cleanName: String,
      blockKeys: Seq[(Column, Column)], maxDist: Int): DataFrame = {
    require(blockKeys.nonEmpty, "entityMatch needs at least one blocking key")
    // resolve each side's key expressions against its own frame, then
    // join USING the materialized key columns — an unambiguous equi-join
    val dk = dirty.select(col(dirtyId).as("d_id") +: col(dirtyName).as("__dn") +:
      blockKeys.zipWithIndex.map { case ((d, _), i) => d.as(s"__bk$i") }: _*)
    val ck = clean.select(col(cleanId).as("c_id") +: col(cleanName).as("__cn") +:
      blockKeys.zipWithIndex.map { case ((_, c), i) => c.as(s"__bk$i") }: _*)
    // r20, guide §2.5 applied to the VERIFY: at bench scale both sides are
    // one-split scans, the block join broadcasts one of them, and the
    // per-pair edit distance then runs at the probe's 1-task width
    // (profiled: p4's 1.74 s single-task job at local[32]). Widen the
    // block-pair stream by d_id BEFORE the levenshtein — the d_id hash
    // layout is exactly what the best-match window below needs, so the
    // window's own exchange moves under the verify instead of adding one;
    // identity once the scans are wide (any real reference table).
    val cand = AdaptiveParts.widenNarrowScan(
      dk.join(ck, blockKeys.indices.map(i => s"__bk$i")), col("d_id"))
    val scored = cand
      .select(col("d_id"), col("c_id"),
        levenshtein(col("__dn"), col("__cn")).cast(LongType).as("dist"))
      .where(col("dist") <= maxDist)
    scored
      .withColumn("__rn", row_number().over(Window.partitionBy("d_id")
        .orderBy(col("dist").asc, col("c_id").asc)))
      .where(col("__rn") === 1)
      .select(col("d_id"), col("c_id").as("matched_id"), col("dist"))
  }
}
