package graft.history

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
