package graft.history

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot isolation and time travel for the historical
  * store — the commit protocol a 100 TB parquet store on object storage
  * needs and plain directory listings cannot give:
  *
  *  - **Atomic commits.** A writer lands its data directory fully, then
  *    publishes a new manifest (one small file, written once) listing
  *    every live data directory. The manifest write IS the commit point:
  *    readers resolve the latest manifest first, so a half-written data
  *    directory is invisible until published (the reference's Firehose +
  *    Athena-partition registration plays this role for its store;
  *    athena_partitioner/handler.py registers partitions after landing).
  *  - **Snapshot isolation.** A query pins the manifest version it
  *    resolved — concurrent commits cannot change its file set mid-scan.
  *  - **Time travel.** `read(root, Some(v))` reproduces any historical
  *    version — the corpus-snapshot diff (d13) and PSI drift (q37)
  *    operators get their "as of" inputs from here.
  *  - **Non-destructive compaction.** `commit(replace = true)` publishes
  *    a manifest listing ONLY the new (compacted) directory; prior
  *    versions still reference the old directories, so readers pinned to
  *    them are unaffected. Old data dirs are reclaimable once no live
  *    manifest references them (`expire`).
  *
  * Single-writer by design (the engine's batch loop / foreachBatch sink
  * is one writer); manifests are versioned files `manifests/v<N>` whose
  * body is one data-directory path per line.
  */
object Snapshots {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Live versions, ascending (empty if never committed). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val dir = new Path(s"$root/manifests")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName).filter(_.startsWith("v"))
      .map(_.drop(1).toLong).sorted
  }

  private def manifestDirs(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val f = fs(spark, root)
    val in = f.open(new Path(s"$root/manifests/v$v"))
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toList
    } finally in.close()
  }

  /** Commit a batch: land `df` as data directory `data/d<version>`, then
    * publish manifest v<version>. `replace = true` publishes ONLY the new
    * directory (compaction/rewrite semantics); otherwise the new manifest
    * is the previous file set plus the new directory. Returns the new
    * version number. */
  def commit(df: DataFrame, root: String, replace: Boolean = false): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val prev = versions(spark, root)
    val v = prev.lastOption.getOrElse(0L) + 1L
    val dataDir = s"$root/data/d$v"
    // overwrite: an UNPUBLISHED directory can only be debris from a
    // writer that crashed before its manifest landed (published dirs are
    // never re-versioned), so a retry safely replaces it
    df.write.mode("overwrite").parquet(dataDir)
    val dirs =
      if (replace || prev.isEmpty) Seq(dataDir)
      else manifestDirs(spark, root, prev.last) :+ dataDir
    val tmp = new Path(s"$root/manifests/.v$v.tmp")
    val out = f.create(tmp, false)
    try out.write((dirs.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // rename is the atomic publish on HDFS-like stores; on object stores
    // swap in a conditional-put equivalent
    require(f.rename(tmp, new Path(s"$root/manifests/v$v")),
      s"snapshot commit v$v lost a publish race — single-writer invariant violated")
    v
  }

  /** Read the store at a version (default: latest). The file set is
    * pinned at manifest-resolution time — concurrent commits don't move
    * this scan. */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no snapshots at $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"unknown snapshot v$v (have ${vs.mkString(",")})")
    val dirs = manifestDirs(spark, root, v)
    spark.read.parquet(dirs: _*)
  }

  /** Rows version `v` added over version `v − 1` — the time-travel diff
    * `read(v).exceptAll(read(v − 1))`, computed from the manifests
    * instead of a two-sided shuffle wherever possible (guide §2.4
    * "remove shuffles outright"): when v's file set is a strict superset
    * of v−1's (the append-only common case), the multiset difference is
    * EXACTLY the rows of the added directories — the prior version's
    * files are byte-identical in both manifests — so one scan of the
    * delta directories replaces two full snapshot scans plus the
    * exceptAll exchange of every column. Falls back to the real
    * exceptAll when history was rewritten (compaction/replace), where
    * no such shortcut exists. */
  def readVersionDelta(spark: SparkSession, root: String, v: Long): DataFrame = {
    require(v >= 1, s"version delta needs v >= 1, got $v")
    if (v == 1) read(spark, root, Some(1L))
    else {
      val newDirs = manifestDirs(spark, root, v)
      val oldDirs = manifestDirs(spark, root, v - 1)
      if (oldDirs.toSet.subsetOf(newDirs.toSet)) {
        val delta = newDirs.filterNot(oldDirs.toSet)
        if (delta.isEmpty) read(spark, root, Some(v)).limit(0)
        else spark.read.parquet(delta: _*)
      } else read(spark, root, Some(v))
        .exceptAll(read(spark, root, Some(v - 1)))
    }
  }

  /** Drop manifests older than `keepLast` versions and delete data
    * directories no surviving manifest references. Returns reclaimed
    * directories. */
  def expire(spark: SparkSession, root: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val f = fs(spark, root)
    val vs = versions(spark, root)
    val (dead, live) = vs.splitAt(math.max(0, vs.size - keepLast))
    val liveDirs = live.flatMap(manifestDirs(spark, root, _)).toSet
    val reclaimed = dead.flatMap(manifestDirs(spark, root, _)).distinct
      .filterNot(liveDirs)
    // Data dirs FIRST, manifests second: the dead manifests are the only
    // record of which dirs are reclaimable, so deleting them first would
    // permanently strand data if we crash between the two loops. In the
    // reverse order a crash leaves dead manifests behind — and the next
    // expire re-derives the same reclaim list and finishes the job
    // (deleting an already-deleted path is a no-op).
    reclaimed.foreach(d => f.delete(new Path(d), true))
    dead.foreach(v => f.delete(new Path(s"$root/manifests/v$v"), false))
    reclaimed
  }

  /** Delete every directory under `data/` that NO live manifest
    * references — the backstop for crash debris [[expire]] cannot see
    * (a writer that died between landing its data dir and publishing its
    * manifest, or historical strandings from a pre-ordering-fix expire).
    *
    * Safe against the one in-flight writer the store permits: the next
    * version's un-published directory is `data/d<latest+1>`, which the
    * sweep always spares (whether or not it exists yet), so a concurrent
    * commit's landed-but-unpublished data survives. Returns the swept
    * directories. */
  def sweepOrphans(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val vs = versions(spark, root)
    val dataRoot = new Path(s"$root/data")
    if (!f.exists(dataRoot)) return Seq.empty
    val referenced = vs.flatMap(manifestDirs(spark, root, _)).toSet
      .map((d: String) => new Path(d).getName)
    val inFlight = s"d${vs.lastOption.getOrElse(0L) + 1L}"
    val orphans = f.listStatus(dataRoot).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filterNot(p => referenced(p.getName) || p.getName == inFlight)
    orphans.foreach(p => f.delete(p, true))
    orphans.map(_.toString)
  }
}
