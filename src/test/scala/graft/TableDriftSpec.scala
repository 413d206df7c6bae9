package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Pins the physical-type drift absorber at the table-load boundary
  * (Tables.normalize). The driver has regenerated /root/testdata with
  * different parquet encodings across rounds — TIMESTAMP(NANOS) (read as
  * epoch-nanos long under spark.sql.legacy.parquet.nanosAsLong) in rounds
  * 1-6, timestamp[us] (read as TIMESTAMP_NTZ) from round 7 — and the
  * engine must produce identical results from either. The reference takes
  * the same posture toward wire types: coerce defensively, never assume
  * the physical encoding (classifier/parsers.py:294-369).
  */
class TableDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // One wall-clock instant, three physical encodings.
  private val micros = Seq(
    1700000000000000L, 1700000001500000L, 1700003600000123L)

  private def dump(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("drift").resolve("events.parquet")
    df.coalesce(1).write.parquet(dir.toString)
    dir.getParent.toString
  }

  test("ts normalizes to identical epoch-micros from long-nanos, NTZ-micro and zoned-timestamp encodings") {
    // (a) the nanosAsLong face of TIMESTAMP(NANOS): a raw long column
    val nanosDir = dump(micros.map(_ * 1000L).toDF("ts"))
    // (b) timestamp[us] without UTC adjustment → TIMESTAMP_NTZ
    val ntzDir = dump(micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    // (c) an already-zoned TIMESTAMP
    val tzDir = dump(micros.toDF("us").select(timestamp_micros(col("us")).as("ts")))

    val read = Seq(nanosDir, ntzDir, tzDir).map { d =>
      val df = Tables.load(spark, d, "events")
      assert(df.schema("ts").dataType === TimestampType, s"canonical type from $d")
      df.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
    }
    assert(read(0) === micros, "long-nanos path truncates to micros")
    assert(read(1) === micros, "NTZ path reinterprets wall-clock as session UTC")
    assert(read(2) === micros, "zoned path passes through")
  }

  test("raw epoch long branches on magnitude: micros/millis/seconds regenerations read correctly") {
    // a future warehouse regeneration could emit the same instants as raw
    // epoch-micros, -millis or -seconds longs; the absorber must branch on
    // the observed magnitude, not silently assume nanos (which would shift
    // every timestamp by 1e3-1e6)
    val wholeSec = micros.map(v => v / 1000000L * 1000000L)
    val wholeMs = micros.map(v => v / 1000L * 1000L)
    def readBack(d: String): Seq[Long] =
      Tables.load(spark, d, "events")
        .select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
    assert(readBack(dump(micros.toDF("ts"))) === micros, "epoch-micros long")
    assert(readBack(dump(micros.map(_ / 1000L).toDF("ts"))) === wholeMs, "epoch-millis long")
    assert(readBack(dump(micros.map(_ / 1000000L).toDF("ts"))) === wholeSec, "epoch-seconds long")
  }

  test("q11-style hour bucketing agrees across encodings") {
    val nanosDir = dump(micros.map(_ * 1000L).toDF("ts"))
    val ntzDir = dump(micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    val buckets = Seq(nanosDir, ntzDir).map { d =>
      Tables.load(spark, d, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("w"))
        .count().orderBy("w")
        .as[(Timestamp, Long)].collect().toSeq
    }
    assert(buckets(0) === buckets(1))
    assert(buckets(0).map(_._2) === Seq(2L, 1L))
  }

  test("embedding normalizes to array<double> from a float-list encoding") {
    val dir = Files.createTempDirectory("drift").resolve("embeddings.parquet")
    Seq((1L, Array(0.5f, 1.25f)), (2L, Array(2.5f, -0.75f)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(dir.toString)
    val df = Tables.load(spark, dir.getParent.toString, "embeddings")
    assert(df.schema("embedding").dataType === ArrayType(DoubleType, containsNull = true))
    val v = df.orderBy("vec_id").select("embedding")
      .as[Seq[Double]].collect().toSeq
    assert(v === Seq(Seq(0.5d, 1.25d), Seq(2.5d, -0.75d)))
  }

  test("tables without ts/embedding columns pass through untouched") {
    val df = Seq((1L, "a")).toDF("id", "name")
    assert(Tables.normalize(df).schema === df.schema)
  }
}
