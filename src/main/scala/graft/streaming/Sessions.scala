package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-stream gap sessionization — the streaming face of the batch
  * `q18_sessionize` row. Batch finds session breaks with a lag/running-sum
  * window over the full history; in-stream, Spark's native
  * `session_window` state merges overlapping per-event windows and emits
  * a session only once the watermark passes its close (start of the gap),
  * so state is bounded to OPEN sessions per key.
  *
  * The alert pipeline deliberately does NOT use this (the reference's
  * merge windows are anchored at first-alert arrival with a hard cap —
  * AlertMerger.scala documents why session semantics differ); this
  * operator is the general analytics surface for user/entity activity
  * sessions over the historical stream. */
object Sessions {

  /** Sessions per key with a `gap` idle timeout: one row per closed
    * session (append mode) carrying start/end/event count, plus any
    * caller-supplied extra aggregates. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, watermark: String, extraAggs: Seq[Column] = Nil): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), extraAggs: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
}
