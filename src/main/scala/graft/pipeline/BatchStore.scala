package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Per-batch-partitioned parquet store lifecycle shared by the
  * incremental dedup store loops ([[Dedup.repeatedSubstringStoreStep]],
  * [[TextAnalysis.c4LineCleanStoreStep]]): discovery, and LSM-style
  * COMPACTION that folds many small `batch_id=` partitions into one
  * consolidated partition without breaking the loops' retry contract.
  *
  * Why compaction is a 100 TB requirement and not hygiene: the store
  * loops write one partition per micro-batch, so a long-lived stream
  * accumulates an unbounded partition count — directory listing, footer
  * reads, and per-partition bloom probes all scale with BATCHES, not
  * data. Folding history into a handful of consolidated partitions
  * bounds that metadata cost while leaving byte-identical semantics.
  *
  * Crash-safety protocol (single-file-rename commit):
  *  1. consolidated data writes to `batch_id=<compactId>` (compactId is
  *     NEGATIVE — stream batches are >= 0, so the id spaces never meet);
  *  2. an optional bloom sidecar writes beside it;
  *  3. the marker file `<markersDir>/<compactId>` commits atomically via
  *     write-temp + rename, listing every folded partition id;
  *  4. folded partitions delete lazily (best-effort, also retried by the
  *     next compaction's cleanup).
  * Readers apply two rules that make every crash window safe: a
  * CONSOLIDATED (negative-id) partition is readable ONLY IF its marker
  * exists (a crash between steps 1 and 3 leaves inert garbage, never a
  * double count), and any partition id listed in a committed marker is
  * EXCLUDED even if its directory still exists (a crash during step 4
  * leaves stale sources that no reader counts).
  *
  * Retry contract: callers pass `upToBatchId` — only stream partitions
  * with id <= upToBatchId fold. With foreachBatch semantics a batch can
  * only retry while it is the LATEST batch, so compacting up to
  * currentBatch − 1 is always safe: a retried batch's `batch_id=N`
  * overwrite still fully replaces its partial, because N was never
  * folded.
  */
private[graft] object BatchStore {

  /** Committed, readable (id, path) partitions of `dataPath` under the
    * reader rules above, excluding `excludeBatchId` (the in-flight
    * batch — its counts come from the live frame, and a retried batch
    * must never see its own failed partial). */
  def readableParts(fs: FileSystem, dataPath: String, markersDir: String,
      excludeBatchId: Option[Long]): Seq[(Long, String)] = {
    if (!fs.exists(new Path(dataPath))) return Seq.empty
    val markers = readMarkers(fs, markersDir)
    val folded = markers.values.flatten.toSet
    fs.listStatus(new Path(dataPath)).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .collect { case p if p.getName.startsWith("batch_id=") =>
        (p.getName.stripPrefix("batch_id=").toLong, p.toString) }
      .filter { case (id, _) =>
        !excludeBatchId.contains(id) && !folded.contains(id) &&
          (id >= 0 || markers.contains(id)) }
  }

  /** Read one per-batch-partitioned store sub-table under the EXACT
    * staged schema (`empty` — the stage function applied to a limit(0)
    * batch), excluding the in-flight batch's partition. An explicit
    * schema means a crashed write's `_temporary`-only partition reads
    * as empty instead of failing inference; no committed partitions at
    * all returns the staged empty itself. */
  def readStore(spark: SparkSession, storeDir: String, sub: String,
      empty: DataFrame, batchId: Long): DataFrame = {
    val fs = new Path(storeDir).getFileSystem(spark.sessionState.newHadoopConf())
    val parts = readableParts(fs, s"$storeDir/$sub",
      s"$storeDir/compactions/$sub", Some(batchId))
    if (parts.isEmpty) empty
    else spark.read
      .schema(StructType(empty.schema.fields :+ StructField("batch_id", LongType)))
      .option("basePath", s"$storeDir/$sub").parquet(parts.map(_._2): _*)
      .select(empty.columns.map(col): _*)
  }

  /** Write one micro-batch's partition (`batch_id=<batchId>`, overwrite —
    * the retry-replaces-partial idiom every store loop uses), REFUSING a
    * batch id already listed in a committed compaction marker. Folded ids
    * are excluded from every read forever, so letting such a write land
    * would be silent data loss — it happens only when a storeDir outlives
    * its stream checkpoint and batch ids restart at 0. A storeDir is
    * bound to ONE checkpoint lineage; recreate them together. */
  def writeBatchPart(df: DataFrame, dataPath: String, markersDir: String,
      batchId: Long): Unit = {
    val fs = new Path(dataPath)
      .getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val folded = readMarkers(fs, markersDir).values.flatten.toSet
    if (folded.contains(batchId))
      throw new IllegalStateException(
        s"batch_id=$batchId under $dataPath was already folded by a " +
        "committed compaction: this store belongs to an earlier checkpoint " +
        "lineage (batch ids restarted). Writing would be invisible to every " +
        "reader; recreate the storeDir together with the new checkpoint.")
    df.write.mode("overwrite").parquet(s"$dataPath/batch_id=$batchId")
  }

  /** Default probe-side broadcast cap for the store-prune left-semi
    * joins: 2M distinct keys (~100–200 MB of md5 hex / fingerprints)
    * stays well under Spark's broadcast ceiling; a fatter micro-batch
    * falls back to a shuffled semi-join instead of failing the stream. */
  val ProbeBroadcastCap: Long = 1L << 21

  /** The batch's distinct-key probe side for a store-prune left-semi,
    * broadcast-hinted ONLY when provably small: a `limit(cap + 1)` count
    * (early-stopping, batch-cardinality input) decides. Above the cap the
    * frame returns unhinted and the semi-join shuffles — semantics
    * identical, per-partition cost still batch-proportional, and no
    * broadcast cliff (the [[graft.pipeline.Dedup]] SubstringProbeCap
    * idiom applied to the join side). */
  def probeSide(keys: DataFrame, cap: Long = ProbeBroadcastCap): DataFrame =
    if (fitsBroadcast(keys, cap)) broadcast(keys) else keys

  /** Cheap (early-stopping limit + count) test that `keys` has at most
    * `cap` rows — the [[probeSide]] decision, exposed for steps that hint
    * several joins off one batch key set. */
  def fitsBroadcast(keys: DataFrame, cap: Long = ProbeBroadcastCap): Boolean =
    keys.limit(math.min(cap + 1, Int.MaxValue.toLong).toInt).count() <= cap

  /** Identity-merge compaction over several sub-tables of one store
    * (signature stores: rows are per-document, nothing to reduce). */
  def compactIdentity(spark: SparkSession, storeDir: String,
      subs: Seq[String], compactId: Long, upToBatchId: Long): Seq[Long] =
    subs.flatMap { sub =>
      compact(spark, s"$storeDir/$sub", s"$storeDir/compactions/$sub",
        None, compactId, upToBatchId, df => df.drop("batch_id"))
    }.distinct

  /** Size-tiered AUTO-compaction trigger — makes long-lived store loops
    * self-maintaining instead of relying on an operator calling the
    * family's compact by hand: when `dataPath`'s readable partition count
    * exceeds `maxParts`, run `runCompact(compactId, upToBatchId)` with
    * `compactId = −(batchId + 2⁴⁰)` — derived from the TRIGGERING batch,
    * so an at-least-once replay of that batch re-derives the same id and
    * lands on [[compact]]'s committed-marker no-op, and offset into its
    * OWN id namespace so it can never collide with the manual
    * `-batchId`-style convention operators use (a collision would make
    * the later manual compaction a silent no-op) — and
    * `upToBatchId = batchId − 1` (the retry horizon: only batches that
    * can no longer retry fold). Call AFTER the batch's own partition
    * commits. `maxParts <= 0` disables the trigger. Returns the folded
    * ids (empty = below threshold or replayed trigger). */
  def autoCompact(spark: SparkSession, dataPath: String, markersDir: String,
      maxParts: Int, batchId: Long)
      (runCompact: (Long, Long) => Seq[Long]): Seq[Long] = {
    if (maxParts <= 0 || batchId < 1) return Seq.empty
    val fs = new Path(dataPath).getFileSystem(spark.sessionState.newHadoopConf())
    if (readableParts(fs, dataPath, markersDir, None).size > maxParts)
      runCompact(-(batchId + (1L << 40)), batchId - 1)
    else Seq.empty
  }

  /** Committed compaction markers: consolidated id -> folded ids. */
  def readMarkers(fs: FileSystem, markersDir: String): Map[Long, Seq[Long]] = {
    val dir = new Path(markersDir)
    if (!fs.exists(dir)) return Map.empty
    fs.listStatus(dir).toSeq.filter(_.isFile).map(_.getPath)
      .filter(p => p.getName.matches("-?\\d+"))
      .map { p =>
        val in = fs.open(p)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        p.getName.toLong ->
          body.split("\n").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toLong)
      }.toMap
  }

  /** Fold every readable partition with stream id <= upToBatchId (plus
    * earlier consolidated partitions) into `batch_id=<compactId>`:
    * `merge` reduces the unioned rows (sum for count stores, distinct
    * for set stores) so the consolidated partition is byte-equivalent
    * to its sources under the store's own algebra. `sidecar`, when
    * given, writes the consolidated partition's bloom/sketch sidecar
    * BEFORE the marker commits (a sidecar-less consolidated partition
    * is still sound — probes keep it). Returns the folded ids (empty =
    * nothing worth folding; fewer than two candidates). */
  def compact(spark: SparkSession, dataPath: String, markersDir: String,
      schema: Option[StructType], compactId: Long, upToBatchId: Long,
      merge: DataFrame => DataFrame,
      sidecar: Option[DataFrame => Unit] = None): Seq[Long] = {
    require(compactId < 0,
      "compaction ids are negative to stay out of the stream's id space")
    val fs = new Path(dataPath).getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new Path(s"$markersDir/$compactId"))) {
      // an ALREADY-COMMITTED compaction id is an idempotent no-op, not an
      // error: under at-least-once foreachBatch semantics the triggering
      // batch can replay (compactId derives from the batch id), and a
      // rethrow here would wedge the stream on every restart. The marker
      // already makes the folded sources invisible; just retry their lazy
      // cleanup (a first attempt may have crashed between commit and
      // delete) and report nothing newly folded.
      readMarkers(fs, markersDir).getOrElse(compactId, Seq.empty)
        .filter(_ != compactId).foreach { id =>
          try fs.delete(new Path(s"$dataPath/batch_id=$id"), true)
          catch { case _: java.io.IOException => }
          // a folded CONSOLIDATED id's own marker is superseded (its
          // folded list was merged into this marker) — retry its prune
          if (id < 0)
            try fs.delete(new Path(s"$markersDir/$id"), false)
            catch { case _: java.io.IOException => }
        }
      return Seq.empty
    }
    val markers = readMarkers(fs, markersDir)
    val candidates = readableParts(fs, dataPath, markersDir, None)
      .filter { case (id, _) => id < 0 || id <= upToBatchId }
    if (candidates.size < 2) return Seq.empty
    val reader = schema.foldLeft(spark.read)(_ schema _)
      .option("basePath", dataPath)
    val merged = merge(reader.parquet(candidates.map(_._2): _*))
    // sort for parquet row-group stats on the key column (scan-side
    // min/max skipping once the store is mostly consolidated)
    merged.sortWithinPartitions(merged.columns.head)
      .write.mode("overwrite").parquet(s"$dataPath/batch_id=$compactId")
    sidecar.foreach(_(spark.read.parquet(s"$dataPath/batch_id=$compactId")))
    // the new marker FOLDS superseded markers: ids a folded consolidated
    // partition had itself folded merge in (so their exclusion survives
    // the superseded marker's deletion), and the superseded marker files
    // delete after commit — marker count stays bounded by the number of
    // LIVE consolidated partitions instead of growing with compaction
    // history (readMarkers opens every file on every store step)
    val superseded = candidates.map(_._1).filter(_ < 0)
    val transitive = superseded.flatMap(id => markers.getOrElse(id, Seq.empty))
    commitMarker(fs, markersDir, compactId,
      (candidates.map(_._1) ++ transitive).distinct)
    // lazy cleanup: stale sources are already invisible to readers
    candidates.foreach { case (_, p) =>
      try fs.delete(new Path(p), true) catch { case _: java.io.IOException => }
    }
    // prune superseded marker FILES — including transitively folded
    // consolidated ids, whose markers a prior crash (or swallowed
    // delete failure) may have orphaned: without the transitive sweep
    // an orphan has no partition, is never a candidate again, and
    // would be re-read by readMarkers forever
    (superseded ++ transitive.filter(_ < 0)).distinct.foreach { id =>
      try fs.delete(new Path(s"$markersDir/$id"), false)
      catch { case _: java.io.IOException => }
    }
    candidates.map(_._1)
  }

  /** Atomic marker commit: write `<id>.tmp`, rename to `<id>`. */
  private def commitMarker(fs: FileSystem, markersDir: String,
      compactId: Long, folded: Seq[Long]): Unit = {
    fs.mkdirs(new Path(markersDir))
    val tmp = new Path(s"$markersDir/$compactId.tmp")
    val out = fs.create(tmp, true)
    try out.write(folded.mkString("\n").getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(s"$markersDir/$compactId")))
      throw new java.io.IOException(
        s"compaction marker rename failed for $compactId")
  }
}
