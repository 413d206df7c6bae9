package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule staging gate (streamalert/rules_engine/rules_engine.py:97-133,219-243;
  * shared/rule_table.py): staged rules emit alerts ONLY to the required
  * outputs until promoted. The rule-state table (DynamoDB in the reference,
  * any small DataFrame here — Delta/JSON/parquet) is broadcast-joined at
  * alert construction; its 10-minute refresh cache becomes "reload the small
  * side per micro-batch". */
object Staging {

  /** ruleTable columns: rule_name string, staged boolean. */
  def applyStaging(alerts: DataFrame, ruleTable: DataFrame,
      requiredOutputs: Seq[String] = Seq("aws-firehose:alerts")): DataFrame = {
    val rt = broadcast(ruleTable
      .select(col("rule_name").as("__rn"), col("staged").as("__staged")))
    alerts.join(rt, alerts("rule_name") === col("__rn"), "left_outer")
      .withColumn("staged", coalesce(col("__staged"), lit(false)))
      .withColumn("outputs",
        when(col("staged"), array_sort(array(requiredOutputs.map(lit): _*)))
          .otherwise(col("outputs")))
      .drop("__rn", "__staged")
  }
}
