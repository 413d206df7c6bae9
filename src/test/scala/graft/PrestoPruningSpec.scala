package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.history.ScheduledQueries

/** The 100 TB property behind sq_presto_verbatim: the reference pack's
  * `dt = '{utcdatehour_minus1hour}'` predicate must PARTITION-PRUNE a
  * real dt-partitioned store through the verbatim Presto text — the
  * Athena deployment prunes on dt, and a migrated pack that silently
  * full-scanned would be a 1000x regression at scale. */
class PrestoPruningSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    graft.plans.GraftExtensions.functions.foreach { case (id, info, builder) =>
      s.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    s
  }

  test("verbatim pack's dt filter prunes a dt-partitioned store") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_presto_prune")
      .toString
    // 3 dt partitions; only 1995-06-18-11 matches the pack's param
    (0L to 299L).map { i =>
      val dt = Seq("1995-06-18-10", "1995-06-18-11", "1995-06-18-12")((i % 3).toInt)
      (i, dt)
    }.toDF("event_id", "dt")
      .withColumn("eventtime", lit("1995-06-18T11:00:00Z"))
      .withColumn("eventsource", lit("athena.amazonaws.com"))
      .withColumn("eventname", lit("StartQueryExecution"))
      .withColumn("recipientaccountid", lit("123456789012"))
      .withColumn("requestparameters", map(
        lit("queryexecutioncontext"), lit("""{"database":"db_x"}"""),
        lit("querystring"),
        concat(lit("SELECT "), col("event_id").cast("string"))))
      .withColumn("useridentity", map(
        lit("type"), lit("IAMUser"),
        lit("arn"), concat(lit("arn:u"), col("event_id").cast("string"))))
      .write.partitionBy("dt").parquet(s"$root/cloudwatch_cloudtrail")
    spark.sql("CREATE DATABASE IF NOT EXISTS athena_database_name")
    spark.sql(
      s"""CREATE OR REPLACE VIEW athena_database_name.cloudwatch_cloudtrail
         |AS SELECT * FROM parquet.`$root/cloudwatch_cloudtrail`""".stripMargin)
    val df = ScheduledQueries.runPresto(spark, Queries.prestoSampleSql,
      java.time.Instant.parse("1995-06-18T12:00:00Z"))
    assert(df.count() === 100) // exactly the matching partition's rows
    val physical = df.queryExecution.executedPlan.toString
    val scanLine = physical.split("\n").find(_.contains("FileScan")).getOrElse(
      fail(s"no FileScan in plan:\n$physical"))
    assert(scanLine.contains("PartitionFilters") &&
      physical.contains("1995-06-18-11"),
      s"dt filter did not reach the partition scan:\n$physical")
    // one partition read: the scan's partition count is 1/3 of the store
    val filesRead = df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    }
    df.collect() // populate metrics
    val partsRead = df.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
    }
    assert(partsRead.nonEmpty && partsRead.forall(_ == 1L),
      s"expected exactly 1 dt partition read, got $partsRead (files=$filesRead)")
  }
}
