package graft.history

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental materialized-view maintenance over a [[Snapshots]] store —
  * the scheduled-query accelerator: instead of re-scanning the full
  * history per run (the reference re-runs its Athena aggregation over the
  * whole partition each schedule), a view holds MERGEABLE partial-
  * aggregate rows (the [[graft.pipeline.Sketches]] shapes: moment rows,
  * histograms, HLL/CM sketches, MG summaries) and each refresh:
  *
  *   1. diffs the store's manifests since the last refreshed version —
  *      only the NEW data directories are read;
  *   2. folds their partial rows into the stored view with the
  *      aggregate's relational merge;
  *   3. publishes the updated view as a replace-commit to the view's own
  *      snapshot store (so view readers get atomicity + time travel for
  *      free, and a crash mid-refresh leaves the old view intact).
  *
  * If the base store saw a replace-commit (compaction rewrote history),
  * the append-delta assumption breaks and refresh falls back to a full
  * rebuild from the latest version — detected, never silent.
  *
  * Work per refresh: new-data-cardinality partials + view-cardinality
  * merge. A year of history costs what the new day costs.
  */
object Materialized {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  // The refreshed-to base version is recorded PER VIEW SNAPSHOT in
  // `base_of_v<viewVersion>`, written BEFORE that view version commits.
  // Crash-safety argument: if the writer dies between the meta write and
  // the commit, the orphan meta has no matching view snapshot and is
  // ignored — the next refresh resolves the PREVIOUS view version and
  // ITS meta, so a delta can never be merged twice (the single
  // trailing-meta-file design had exactly that double-merge window).
  private def readMeta(spark: SparkSession, viewRoot: String): Option[Long] = {
    Snapshots.versions(spark, viewRoot).lastOption.flatMap { vv =>
      val f = fs(spark, viewRoot)
      val p = new Path(s"$viewRoot/base_of_v$vv")
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
        finally in.close()
      }
    }
  }

  private def writeMeta(spark: SparkSession, viewRoot: String,
      viewVersion: Long, baseVersion: Long): Unit = {
    val f = fs(spark, viewRoot)
    val out = f.create(new Path(s"$viewRoot/base_of_v$viewVersion"), true)
    try out.write(s"$baseVersion\n".getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Data directories of version `v` in `storeRoot` (internal mirror of
    * the Snapshots manifest format). */
  private def dirsOf(spark: SparkSession, storeRoot: String, v: Long): Set[String] = {
    val f = fs(spark, storeRoot)
    val in = f.open(new Path(s"$storeRoot/manifests/v$v"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toSet
    finally in.close()
  }

  /** Bring the view up to the base store's latest version.
    *
    * @param partial base rows → mergeable partial-aggregate rows (e.g.
    *                `Sketches.momentSketches(_, groups, cents)`)
    * @param merge   union of partial rows → merged rows (e.g.
    *                `Sketches.momentMerge(_, groups)`); must be
    *                idempotent over already-merged rows
    * @return the refreshed view rows (also committed to `viewRoot`) */
  def refresh(spark: SparkSession, storeRoot: String, viewRoot: String,
      partial: DataFrame => DataFrame,
      merge: DataFrame => DataFrame): DataFrame = {
    val baseVersions = Snapshots.versions(spark, storeRoot)
    require(baseVersions.nonEmpty, s"base store $storeRoot has no snapshots")
    val target = baseVersions.last
    val last = readMeta(spark, viewRoot).filter(baseVersions.contains)
    val targetDirs = dirsOf(spark, storeRoot, target)
    val updated = last match {
      case Some(v) if v == target =>
        Snapshots.read(spark, viewRoot) // already current
      case Some(v) if dirsOf(spark, storeRoot, v).subsetOf(targetDirs) =>
        // append-only delta: fold only the new directories into the view
        val newDirs = (targetDirs -- dirsOf(spark, storeRoot, v)).toSeq.sorted
        if (newDirs.isEmpty) Snapshots.read(spark, viewRoot)
        else merge(Snapshots.read(spark, viewRoot)
          .unionByName(partial(spark.read.parquet(newDirs: _*))))
      case _ =>
        // first refresh, or history was rewritten (compaction/replace):
        // rebuild from the latest version — detected, never silent
        merge(partial(Snapshots.read(spark, storeRoot)))
    }
    val out = updated.localCheckpoint()
    // meta BEFORE commit (see readMeta's crash-safety argument); the
    // next view version is deterministic under the single-writer rule
    val nextViewVersion = Snapshots.versions(spark, viewRoot)
      .lastOption.getOrElse(0L) + 1L
    writeMeta(spark, viewRoot, nextViewVersion, target)
    val committed = Snapshots.commit(out, viewRoot, replace = true)
    require(committed == nextViewVersion,
      s"view commit raced: expected v$nextViewVersion, got v$committed")
    out
  }
}
