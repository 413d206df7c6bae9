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
