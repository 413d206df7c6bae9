package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-stream temporal correlation — the streaming face of the batch
  * `q22_correlation` staple ("X followed by Y within T"). The reference
  * can only answer this AFTER the fact, by scheduling Athena SQL over
  * the historical store (scheduled_queries/ runs the correlation as a
  * lookback query); a Structured Streaming stream-stream interval join
  * answers it AS THE Y EVENT ARRIVES.
  *
  * State boundedness: both sides are watermarked and the time bound
  * lives INSIDE the join condition, which is exactly what lets Spark's
  * symmetric hash join evict state — an X row is dropped from the state
  * store once the Y-side watermark passes x.ts + within, so state holds
  * only the active correlation window per key, never the stream. */
object Correlation {

  /** Pairs every A-side row with each B-side row of the same key whose
    * timestamp lands in (ts_a, ts_a + within] — strictly-after, like the
    * funnel. All non-key columns are suffixed `_a` / `_b`; `within` is a
    * SQL interval string ("30 minutes").
    *
    * Works identically on batch frames (same code path minus state), so
    * batch backtests and the live stream share one definition. */
  def followedBy(a: DataFrame, b: DataFrame, keyCol: String, tsCol: String,
      within: String): DataFrame = {
    def suffix(df: DataFrame, sfx: String): DataFrame =
      df.columns.foldLeft(df) { (d, c) =>
        if (c == keyCol) d else d.withColumnRenamed(c, c + sfx)
      }
    val aw = suffix(a, "_a").withWatermark(s"${tsCol}_a", within)
    val bw = suffix(b, "_b").withColumnRenamed(keyCol, s"__${keyCol}_b")
      .withWatermark(s"${tsCol}_b", within)
    aw.join(bw,
        col(keyCol) === col(s"__${keyCol}_b") &&
        col(s"${tsCol}_b") > col(s"${tsCol}_a") &&
        col(s"${tsCol}_b") <= col(s"${tsCol}_a") + expr(s"INTERVAL $within"))
      .drop(s"__${keyCol}_b")
  }
}
