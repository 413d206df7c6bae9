package graft.history

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.classify.Sanitizer

/** The historical store (SURVEY §2.1 S6-S8): classified data lands
  * partitioned by hour under `dt=YYYY-MM-DD-HH`, one directory tree per log
  * type, keys sanitized — the Firehose→S3→Athena-partitioner chain
  * (streamalert/shared/firehose.py:77-129; athena_partitioner/main.py:41-59;
  * CREATE EXTERNAL TABLE ... PARTITIONED BY (dt string),
  * streamalert_cli/athena/handler.py:33-34) collapsed into
  * `writeStream/write.partitionBy("dt").parquet(...)`.
  *
  * No partitioner Lambda exists here: Spark's catalog partition discovery
  * replaces ALTER TABLE ADD PARTITION, and `dt=` predicates prune at the
  * file-listing level (the reference's main query optimization, kept).
  *
  * Scale notes: `dt` is hour-granular so a 100 TB/day store is ~4 TB/hour
  * partitions; within a partition, files split by Spark's
  * maxPartitionBytes. Batching/retry limits of Firehose (500 rec/4 MB) are
  * sink-side concerns that vanish; key sanitization stays (plan-only). */
object HistoricalSink {

  /** Hourly partition column from a timestamp column
    * (athena_partitioner/main.py:41-59 path regex `dt=YYYY-MM-DD-HH`). */
  def dtColumn(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_format(ts, "yyyy-MM-dd-HH")

  /** Batch write a classified typed stream for one log type. */
  def write(df: DataFrame, root: String, logType: String, tsCol: String = "created"): Unit = {
    val sanitized = Sanitizer.sanitizeKeys(
      df.withColumn("dt", dtColumn(col(tsCol))))
    sanitized.write.mode("append").partitionBy("dt")
      .parquet(s"$root/${Sanitizer.sanitizeName(logType)}")
  }

  /** Streaming variant. */
  def writeStream(df: DataFrame, root: String, logType: String,
      checkpoint: String, tsCol: String = "created") = {
    val sanitized = Sanitizer.sanitizeKeys(
      df.withColumn("dt", dtColumn(col(tsCol))))
    sanitized.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .partitionBy("dt")
      .format("parquet")
      .option("path", s"$root/${Sanitizer.sanitizeName(logType)}")
  }

  /** Compact a dt partition's small files in place — the operational
    * counterpart of the streaming writer: each micro-batch appends a file
    * per task, so an hour that saw many batches accumulates hundreds of
    * KB-sized files, and at 100 TB the file-listing + per-file open cost
    * starts dominating scheduled-query scans of that hour. Rewrites the
    * partition to `ceil(bytes / targetBytes)` files (atomic-ish: new
    * files land under a temp dir, then swap via rename — crash before the
    * swap leaves the original partition untouched).
    *
    * Returns (filesBefore, filesAfter). Compact CLOSED hours only — the
    * streaming writer must no longer be appending to the partition. */
  def compactPartition(spark: SparkSession, root: String, logType: String,
      dt: String, targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val dir = s"$root/${Sanitizer.sanitizeName(logType)}/dt=$dt"
    val hadoop = spark.sessionState.newHadoopConf()
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(hadoop)
    require(fs.exists(path), s"no such partition: $dir")
    val files = fs.listStatus(path)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (files.length <= nOut) return (files.length, files.length)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir.__compacting")
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: drop originals, move compacted files in, remove the temp dir
    files.foreach(f => fs.delete(f.getPath, false))
    val moved = fs.listStatus(tmp)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    moved.foreach(f => fs.rename(f.getPath,
      new org.apache.hadoop.fs.Path(path, f.getPath.getName)))
    fs.delete(tmp, true)
    (files.length, moved.length)
  }

  /** Register the store as a SQL table (the Athena external-table analogue). */
  def registerTable(spark: SparkSession, root: String, logType: String,
      table: String): Unit =
    spark.read.parquet(s"$root/${Sanitizer.sanitizeName(logType)}")
      .createOrReplaceTempView(table)

  /** generate_firehose_name (firehose.py:305-336): delivery-stream name
    * `<prefix_>streamalert_<log>`, `\W`→`_` sanitized; when longer than the
    * 64-char Firehose limit, truncate to 56, normalize the tail to exactly
    * one trailing underscore, and append the first chars of the full name's
    * md5 up to the limit. Config-time naming — kept for store-layout parity
    * so a reference deployment's directory names carry over. */
  def firehoseStreamName(prefix: String, logStreamName: String): String = {
    val p = if (prefix.nonEmpty) prefix + "_" else ""
    val name = s"${p}streamalert_$logStreamName".replaceAll("\\W", "_")
    val maxLen = 64
    val hashLen = 8
    if (name.length <= maxLen) name
    else {
      val cut = name.substring(0, maxLen - hashLen)
      val base =
        if (cut.endsWith("_")) cut
        else if (cut.charAt(cut.length - 2) != '_') cut.dropRight(1) + "_"
        else cut.dropRight(2) + "_"
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(name.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (base + md5).take(maxLen)
    }
  }
}
