package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-generated parquet tables (see TESTDATA.md).
  *
  * All engine queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * one parquet file per table. At cluster scale the same call sites point at
  * a partitioned warehouse directory; nothing here assumes single-file input.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so spark.sql(...) works over the
    * sf dir — the equivalent of the reference's Athena external tables
    * (streamalert_cli/athena/handler.py:33-34) without a partitioner Lambda:
    * Spark's catalog + parquet footer pruning replace ALTER TABLE ADD PARTITION. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
