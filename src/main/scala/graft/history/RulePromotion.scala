package graft.history

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rule promotion (SURVEY §3.3; rule_promotion/promoter.py + statistic.py):
  * staged rules are evaluated by counting their alerts in the historical
  * alerts store since staging began; rules past their staging period get
  * promoted (staged=false).
  *
  * The compound Athena count query
  * (statistic.py:23-27: SELECT rule_name, count(*) FROM alerts WHERE
  *  (dt >= '...' AND rule_name = '...') OR ... GROUP BY rule_name)
  * is the same SQL over the alerts table here — partition-pruned by dt. */
object RulePromotion {

  /** Per-staged-rule alert counts since each rule's staging start. */
  def stagingStatistics(alerts: DataFrame,
      stagedRules: Map[String, String] /* rule_name -> dt lower bound */): DataFrame = {
    val pred = stagedRules.map { case (rule, dtMin) =>
      col("rule_name") === rule && col("dt") >= dtMin
    }.reduceOption(_ || _).getOrElse(lit(false))
    alerts.where(pred).groupBy("rule_name").agg(count(lit(1)).as("alert_count"))
  }

  /** Most recent alerts for one rule (statistic.py:29-31 info query). */
  def recentAlerts(alerts: DataFrame, rule: String, limit: Int = 10): DataFrame =
    alerts.where(col("rule_name") === rule).orderBy(col("created").desc).limit(limit)

  /** Promote rules whose staging window elapsed: returns the updated rule
    * table (staged flag cleared) — the DynamoDB update analogue. */
  def promote(ruleTable: DataFrame, toPromote: Seq[String]): DataFrame =
    ruleTable.withColumn("staged",
      when(col("rule_name").isin(toPromote: _*), lit(false)).otherwise(col("staged")))

  private val dtHour = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd-HH").withZone(java.time.ZoneOffset.UTC)

  /** One staged rule's evaluated state (statistic.py StagingStatistic). */
  final case class StagingStat(ruleName: String,
      stagedAt: java.sql.Timestamp, stagedUntil: java.sql.Timestamp,
      alertCount: Long)

  /** One full promotion pass (promoter.py:109-142 `run`): read staged
    * rules from the rule table, count each one's alerts since its staging
    * start (the compound partition-pruned query, statistic.py:23-27),
    * promote every rule past its staging window with zero alerts
    * (promoter.py:137-142), and format the SNS digest. Returns
    * (updated rule table, promoted rule names, digest body).
    *
    * The two collects are rule-table / staged-rule cardinality (the
    * reference's DynamoDB rule-table scan and Athena result page) — never
    * stream-sized data. */
  def promotionPass(ruleTable: DataFrame, alerts: DataFrame,
      now: java.sql.Timestamp): (DataFrame, Seq[String], String) = {
    val staged = ruleTable.where(col("staged"))
      .select("rule_name", "staged_at", "staged_until").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
    val counts =
      if (staged.isEmpty) Map.empty[String, Long]
      else stagingStatistics(alerts,
        staged.map { case (n, at, _) => n -> dtHour.format(at.toInstant) }.toMap)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a staged rule with NO alert rows is the promotable case: the group-by
    // returns no row for it, so absence means zero
    val stats = staged.map { case (n, at, until) =>
      StagingStat(n, at, until, counts.getOrElse(n, 0L)) }.toSeq
    val toPromote = stats
      .filter(s => now.after(s.stagedUntil) && s.alertCount == 0L)
      .map(_.ruleName)
    (promote(ruleTable, toPromote), toPromote, formatDigest(stats, now))
  }

  /** The staging-statistics digest body (publisher.py:55-70
    * `_format_digest` + statistic.py:86-127 `__str__`): highest alert
    * count first; per rule a bullet with staged-at/until, remaining vs
    * past staging time as `Nd Nh Nm`, the alert count, and the alert-info
    * link (`n/a` here — the Athena console execution link has no engine
    * analogue). */
  def formatDigest(stats: Seq[StagingStat], now: java.sql.Timestamp): String = {
    if (stats.isEmpty) return "No currently staged rules to report on"
    stats.sortBy(s => (-s.alertCount, s.ruleName)).map { s =>
      val label =
        if (s.stagedUntil.getTime > now.getTime) "Remaining Stage Time:"
        else "Time Past Staging:\t"
      val diffMs = math.abs(now.getTime - s.stagedUntil.getTime)
      val days = diffMs / 86400000L
      val secs = (diffMs % 86400000L) / 1000L
      val delta = s"${days}d ${secs / 3600}h ${(secs / 60) % 60}m"
      s"◦ ${s.ruleName}\n" +
        s"\t- Staged At:\t\t\t\t\t${s.stagedAt} UTC\n" +
        s"\t- Staged Until:\t\t\t\t\t${s.stagedUntil} UTC\n" +
        s"\t- $label\t\t$delta\n" +
        s"\t- Alert Count:\t\t\t\t\t${s.alertCount}\n" +
        s"\t- Alert Info:\t\t\t\t\tn/a"
    }.mkString("\n\n")
  }
}
