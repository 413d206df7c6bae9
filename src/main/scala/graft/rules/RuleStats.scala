package graft.rules

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Per-rule evaluation stats (R10; streamalert/shared/stats.py:26-100: the
  * reference tracks per-rule wall time + call count in-process and prints a
  * slowest-first table).
  *
  * Spark-native shape: `observe()` metrics on the alerts stream — counts
  * per rule collected by the driver with zero extra passes (the reference's
  * timing decorator is per-record Python overhead; here rule evaluation is
  * fused into one codegen'd projection, so per-rule wall time is not
  * separable — fire counts + batch totals are the meaningful observables).
  */
object RuleStats {

  /** Attach an Observation counting fired alerts per rule. Read
    * `observation.get` after an action completes. */
  def observed(alerts: DataFrame, rules: Seq[Rule]): (DataFrame, Observation) = {
    val obs = Observation("rule_stats")
    val metrics =
      count(lit(1)).as("alerts_total") +:
        rules.map(r => count(when(col("rule_name") === r.name, 1)).as(s"alerts_${r.name}"))
    (alerts.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Slowest-first style report (stats.py:84-100), from observed metrics. */
  def report(metrics: Map[String, Any]): String = {
    val rows = metrics.toSeq.collect {
      case (k, v: Long) if k.startsWith("alerts_") && k != "alerts_total" =>
        k.stripPrefix("alerts_") -> v
    }.sortBy(-_._2)
    val total = metrics.getOrElse("alerts_total", 0L)
    (s"total alerts: $total" +: rows.map { case (r, n) => f"$r%-40s $n%10d" }).mkString("\n")
  }
}
