package graft.history

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 history assembly — the MERGE-style upsert a dimension table
  * in the historical store needs (the reference's Athena tables are
  * append-only event logs, `athena_partitioner/handler.py` registers
  * partitions; turning an append log of entity versions into
  * validity-interval rows is the standard warehouse move on top).
  *
  * Input: an append log of versions — the current snapshot UNIONed with
  * any number of change batches — each row carrying the entity key, an
  * integer version timestamp, and the tracked attributes. Output: one row
  * per SURVIVING version with `valid_from` / `valid_to` interval bounds
  * and an `is_current` flag; a version whose tracked attributes are
  * identical to the immediately-preceding version is a no-op and emits no
  * row (its interval folds into the predecessor's).
  *
  * Shape at 100 TB: ONE hash exchange on the entity key feeds both
  * windows (the no-op-drop lag and the interval lead re-use the same
  * partitioning, so Catalyst plans a single Exchange); partitions are
  * per-entity version chains — bounded by change frequency, never corpus
  * size. Tracked attributes ride the window as one struct payload.
  *
  * Determinism: `tsCol` must be unique per key (callers with same-instant
  * writers add a batch-sequence tie-break to the timestamp); intervals
  * are pure integer arithmetic.
  */
object Scd {

  /** One micro-batch step of the STREAMING dimension-history loop — the
    * store-step shape ([[graft.pipeline.Dedup.minhashStoreStep]]) for
    * SCD2: the parquet-staged store holds the assembled interval rows;
    * an arriving change batch touches ONLY its own keys (semi-join), the
    * touched keys' version chains rebuild from store + batch, and
    * untouched rows pass through byte-stable. (key, ts) duplicates are
    * dropped before assembly, so re-delivery of the same batch is
    * idempotent. The result materializes BEFORE the overwrite
    * (retry-safe read-then-rewrite).
    *
    * Per batch: one store-sized anti/semi-join pair + the scd2 windows
    * over batch-key version chains — never a history re-scan of
    * untouched entities. First batch seeds the store. Returns the
    * updated store rows. */
  def scd2StoreStep(batch: DataFrame, storeDir: String, keyCols: Seq[String],
      tsCol: String, trackedCols: Seq[String]): DataFrame = {
    val spark = batch.sparkSession
    val path = s"$storeDir/scd2"
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val versionCols = (keyCols :+ tsCol) ++ trackedCols
    val batchVersions = batch.select(versionCols.map(col): _*)
    val updated =
      if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
        scd2(batchVersions.dropDuplicates(keyCols :+ tsCol),
          keyCols, tsCol, trackedCols)
      } else {
        val store = spark.read.parquet(path)
        val affected = batch.select(keyCols.map(col): _*).distinct()
        val storeVersions = store.select(
          (keyCols.map(col) :+ col("valid_from").as(tsCol)) ++
            trackedCols.map(col): _*)
        val rebuilt = scd2(
          storeVersions.join(affected, keyCols)
            .unionByName(batchVersions)
            .dropDuplicates(keyCols :+ tsCol),
          keyCols, tsCol, trackedCols)
        store.join(affected, keyCols, "left_anti").unionByName(rebuilt)
      }
    val out = updated.localCheckpoint()
    out.write.mode("overwrite").parquet(path)
    out
  }

  def scd2(versions: DataFrame, keyCols: Seq[String], tsCol: String,
      trackedCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    val tracked = struct(trackedCols.map(col): _*)
    val changed = versions
      .withColumn("__prev", lag(tracked, 1).over(w))
      // first version, or any tracked attribute differs → a real version
      .where(col("__prev").isNull || col("__prev") =!= tracked)
      .drop("__prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
