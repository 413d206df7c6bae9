package graft.history

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Scheduled queries (SURVEY §3.2): user-authored SQL with `{param}` time
  * placeholders, executed against the historical store, results re-injected
  * into the stream as `streamquery:version1` records — the batch→stream loop
  * (scheduled_queries/streamalert/kinesis.py:29-84).
  *
  * The Athena round-trip (async execution + polling,
  * scheduled_queries/handlers/athena.py:29-180) becomes a synchronous
  * `spark.sql`; execution stats come from Spark's QueryExecutionListener
  * instead of `data_scanned_in_bytes` polling. */
object ScheduledQueries {

  private val dateHour = DateTimeFormatter.ofPattern("yyyy-MM-dd-HH").withZone(ZoneOffset.UTC)

  /** The 8 named time parameters
    * (scheduled_queries/query_packs/parameters.py:31-69). */
  def parameterValue(param: String, now: Instant): Option[String] = param match {
    case "utcdatehour_minus7day"  => Some(dateHour.format(now.minusSeconds(7 * 86400)))
    case "utcdatehour_minus1hour" => Some(dateHour.format(now.minusSeconds(3600)))
    case "utctimestamp_minus1hour"=> Some((now.getEpochSecond - 3600).toString)
    case "utcdatehour_minus2hour" => Some(dateHour.format(now.minusSeconds(2 * 3600)))
    case "utcdatehour_minus1day"  => Some(dateHour.format(now.minusSeconds(86400)))
    case "utcdatehour_minus2day"  => Some(dateHour.format(now.minusSeconds(2 * 86400)))
    case "utcdatehour"            => Some(dateHour.format(now))
    case "utctimestamp"           => Some(now.getEpochSecond.toString)
    case "utcisotime"             => Some(now.getEpochSecond.toString)
    case _ => None
  }

  /** Substitute `{param}` placeholders (query_packs/manager.py query_string). */
  def substitute(sql: String, now: Instant,
      extra: Map[String, String] = Map.empty): String = {
    val pattern = "\\{([A-Za-z0-9_]+)\\}".r
    pattern.replaceAllIn(sql, m => {
      val key = m.group(1)
      extra.get(key).orElse(parameterValue(key, now)).getOrElse(
        throw new IllegalArgumentException(s"unknown query parameter: $key"))
    })
  }

  /** Run one scheduled query. */
  def run(spark: SparkSession, sql: String, now: Instant,
      extra: Map[String, String] = Map.empty): DataFrame =
    spark.sql(substitute(sql, now, extra))

  /** Execution stats for one scheduled-query run — the engine-side analogue
    * of the Athena statistics block the reference surfaces per query
    * (`data_scanned_in_bytes` / `engine_execution_time_in_millis`,
    * scheduled_queries/handlers/athena.py:160-166). `dataScannedBytes` /
    * `filesRead` come from the file-scan driver metrics AFTER partition
    * pruning, so a `dt=`-filtered query over the historical store reports
    * only the pruned partitions' bytes — the stat users watch to confirm
    * their query packs prune. */
  final case class ExecutionStats(
      wallTimeMs: Long,
      dataScannedBytes: Long,
      filesRead: Long,
      rowsReturned: Long)

  /** File-scan leaves of an executed plan, descending through AQE stages
    * and subqueries (the adaptive plan hides scans behind QueryStageExec). */
  private def fileScans(plan: SparkPlan): Seq[FileSourceScanExec] = plan match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: QueryStageExec        => fileScans(q.plan)
    case s: FileSourceScanExec    => Seq(s)
    case other =>
      other.children.flatMap(fileScans) ++
        other.subqueries.flatMap(fileScans)
  }

  /** Run one scheduled query eagerly and return its rows plus execution
    * stats, captured via a one-shot `QueryExecutionListener` (the Spark
    * analogue of polling `get_query_execution` until the statistics block
    * appears, athena.py:129-166). */
  def runWithStats(spark: SparkSession, sql: String, now: Instant,
      extra: Map[String, String] = Map.empty): (Seq[Row], ExecutionStats) = {
    val df = run(spark, sql, now, extra)
    val latch = new CountDownLatch(1)
    @volatile var captured: Option[(QueryExecution, Long)] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        // collect() executes the Dataset's own QueryExecution — identity
        // match scopes the listener to this run in a shared session
        if (qe eq df.queryExecution) {
          captured = Some((qe, durationNs)); latch.countDown()
        }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit =
        if (qe eq df.queryExecution) latch.countDown()
    }
    spark.listenerManager.register(listener)
    try {
      val rows = df.collect().toSeq
      // the execution-listener bus is async; the event is already posted
      latch.await(30, TimeUnit.SECONDS)
      val (qe, durationNs) = captured.getOrElse((df.queryExecution, 0L))
      val scans = fileScans(qe.executedPlan)
      def metricSum(name: String): Long =
        scans.flatMap(_.metrics.get(name)).map(_.value).sum
      (rows, ExecutionStats(
        wallTimeMs = durationNs / 1000000L,
        dataScannedBytes = metricSum("filesSize"),
        filesRead = metricSum("numFiles"),
        rowsReturned = rows.size.toLong))
    } finally spark.listenerManager.unregister(listener)
  }

  /** Wrap query results as `streamquery:version1` records for re-injection
    * (conf/schemas/streamquery.json shape: query name + data rows), closing
    * the analytics-driven-detection loop — rules then fire on these. */
  def asStreamQueryRecords(result: DataFrame, queryName: String): DataFrame =
    result.select(
      to_json(struct(
        lit(queryName).as("streamquery_name"),
        lit("version1").as("streamquery_version"),
        to_json(struct(result.columns.map(col): _*)).as("data"))).as("value"))
}
