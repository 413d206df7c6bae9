package graft.history

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom sidecar index for POINT lookups on a high-cardinality
  * long key (entity id, user id) over the historical store — the
  * data-skipping complement to [[Layout]]'s Z-order min/max stats:
  * footer ranges prune range predicates, but a point probe for one
  * entity across a year of files needs membership, not bounds.
  *
  * Build: one scan groups rows by their actual data file
  * (`input_file_name`) and folds each file's keys into a fixed-size
  * bloom — the sidecar is (file, bloom) rows, file-cardinality.
  * Lookup: the sidecar resolves driver-side (bounded: numBits/8 bytes ×
  * files — size the bloom to the file count, or shard the sidecar by
  * partition), blooms are probed with the raw long key, and ONLY
  * candidate files are read. No false negatives, so the residual
  * `key = v` filter over candidates is exact; false positives just read
  * one extra file.
  */
object FileBlooms {

  /** Build the sidecar over every data file the `store` frame scans. */
  def build(store: DataFrame, keyCol: String, indexDir: String,
      expectedPerFile: Long = 100000L, numBits: Long = 1L << 20): Unit =
    store.select(input_file_name().as("file"), col(keyCol).cast("long").as("k"))
      .groupBy("file")
      .agg(graft.functions.Bloom.bloom_filter_agg(col("k"),
        expectedPerFile, numBits).as("bloom"))
      .write.mode("overwrite").parquet(indexDir)

  /** Files whose bloom admits `key` (sound: a file holding the key is
    * always returned). */
  def candidateFiles(spark: SparkSession, indexDir: String, key: Long): Seq[String] =
    spark.read.parquet(indexDir).collect().toSeq
      .filter { r =>
        BloomFilter.readFrom(new ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
          .mightContainLong(key)
      }
      .map(_.getAs[String]("file"))

  /** Point lookup reading ONLY bloom-admitted files, with the exact
    * residual filter on top. */
  def lookup(spark: SparkSession, storeDir: String, indexDir: String,
      keyCol: String, key: Long): DataFrame = {
    val files = candidateFiles(spark, indexDir, key)
    if (files.isEmpty)
      spark.read.parquet(storeDir).where(lit(false)) // schema-only, no rows
    else
      spark.read.parquet(files: _*).where(col(keyCol) === key)
  }
}
