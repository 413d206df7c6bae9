package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Uniform access to the driver-generated parquet tables (see TESTDATA.md).
  *
  * All engine queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * one parquet file per table. At cluster scale the same call sites point at
  * a partitioned warehouse directory; nothing here assumes single-file input.
  *
  * Physical types are normalized at this boundary so no query depends on how
  * a given regeneration of the warehouse happened to encode a column — the
  * same defensive posture the reference's parsers take toward wire types
  * (rules/classifier coerce instead of assuming; classifier/parsers.py:294-369):
  *   - `events.ts` → session-zone [[TimestampType]], whatever the parquet
  *     carried: TIMESTAMP(NANOS) surfaced as epoch-nanos long (under
  *     spark.sql.legacy.parquet.nanosAsLong), timestamp[us] surfaced as
  *     TIMESTAMP_NTZ, or an already-zoned TIMESTAMP. Sessions run with
  *     spark.sql.session.timeZone=UTC, so the NTZ reinterpretation matches
  *     DuckDB's epoch_us() on the same naive values.
  *   - `embeddings.embedding` → array<double> (the parquet is list<float>;
  *     every consumer already widens, this just pins it).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalize(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Physical-type drift absorber (applies by column shape, not table name,
    * so a synthetic fixture table gets the same treatment as the warehouse). */
  def normalize(df: DataFrame): DataFrame = {
    val afterTs =
      if (!df.columns.contains("ts")) df
      else df.schema("ts").dataType match {
        // Raw epoch long (e.g. TIMESTAMP(NANOS) under nanosAsLong): branch on
        // the observed magnitude instead of assuming nanos — a warehouse
        // regeneration emitting epoch-micros/millis/seconds as a raw long
        // would otherwise be silently misread by 1e3-1e9. Plausible dates
        // (1971-2200) are >100x disjoint across the four scales, so one
        // sampled row pins the encoding; integer arithmetic only (no double
        // round-trip). DuckDB applies the identical truncation reading nanos.
        case LongType =>
          val sample = df.select(col("ts")).filter(col("ts").isNotNull)
            .limit(1).collect().headOption.map(r => math.abs(r.getLong(0)))
          val toMicros = sample match {
            case Some(v) if v >= 3e16.toLong => expr("ts div 1000")     // epoch-nanos
            case Some(v) if v >= 3e13.toLong => col("ts")               // epoch-micros
            case Some(v) if v >= 3e10.toLong => col("ts") * lit(1000L)  // epoch-millis
            case Some(v) if v > 0L           => col("ts") * lit(1000000L) // epoch-seconds
            // empty table: current-warehouse default (nanos) keeps behavior
            case _ => expr("ts div 1000")
          }
          df.withColumn("ts", timestamp_micros(toMicros))
        // timestamp[us] without UTC adjustment: reinterpret the wall-clock
        // in the session zone (UTC) — the instant DuckDB's epoch_us sees.
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    if (!afterTs.columns.contains("embedding")) afterTs
    else afterTs.schema("embedding").dataType match {
      case ArrayType(DoubleType, _) => afterTs
      case ArrayType(_, _) =>
        afterTs.withColumn("embedding", col("embedding").cast(ArrayType(DoubleType)))
      case _ => afterTs
    }
  }

  /** Register every table as a temp view so spark.sql(...) works over the
    * sf dir — the equivalent of the reference's Athena external tables
    * (streamalert_cli/athena/handler.py:33-34) without a partitioner Lambda:
    * Spark's catalog + parquet footer pruning replace ALTER TABLE ADD PARTITION. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
