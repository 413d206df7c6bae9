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
}
