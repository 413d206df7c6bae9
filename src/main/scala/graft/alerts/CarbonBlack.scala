package graft.alerts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CarbonBlack ban-hash output (SURVEY §2.1 S9's one declared-out
  * dialect, now engine-implemented): the reference's dispatcher
  * (alert_processor/outputs/carbonblack.py:60-109) runs a per-alert
  * state machine against the CB Response banned-hash list —
  *   - falsy alert context                  → error, dispatch fails
  *   - context.carbonblack.action != 'ban'  → "Action not supported"
  *   - hash banned & enabled                → no-op success (idempotent)
  *   - hash banned & disabled               → re-enable the BannedHash
  *   - hash not banned                      → create BannedHash
  *     (text "Banned from StreamAlert", enabled=true)
  *
  * The live cbapi socket stays out of scope (zero egress); the dataflow
  * half — deciding the action per alert against the current banned
  * table, and folding the resulting state — is a join + case + merge,
  * implemented here. At scale both sides are real tables (alerts ×
  * banned list), so this is a plain equi-join on the hash key; no
  * driver-side iteration. */
object CarbonBlack {

  val BanText = "Banned from StreamAlert"

  /** Per-alert action plan. `alerts` needs (alert_id, context) where
    * `context` is the alert's JSON context (carbonblack.py reads
    * context['carbonblack']{action,value}); `banned` is the current
    * banned-hash table (md5hash, enabled, text). Emits (alert_id,
    * md5hash, action_plan, success) with the reference's exact
    * precedence.
    *
    * Falsy context mirrors Python truthiness on the PARSED value
    * (carbonblack.py:73 `if not alert.context`): since our `context`
    * column is JSON text, the falsy set is NULL, whitespace-only /
    * empty text (any whitespace, incl. tabs/newlines), and the texts
    * whose parse is falsy in Python — `null`, `false`, any JSON zero
    * (`0`, `0.0`, `-0`, `0e5`, ...), `""`, `{}`, `[]` (the containers
    * with any interior whitespace, e.g. `{ }`). Anything else — incl.
    * `"0"`-as-a-string inside an object — is truthy. */
  def banPlan(alerts: DataFrame, banned: DataFrame): DataFrame = {
    // context collapses to a boolean BEFORE the join — the wide JSON
    // string must not ride the alerts-side exchange (skinny-shuffle rule)
    val ctxT = trim(col("context"), " \t\r\n\f")
    val falsyCtx = col("context").isNull ||
      ctxT.isin("", "null", "false", "\"\"") ||
      // any JSON number equal to zero is falsy in Python
      ctxT.rlike("^-?0(\\.0+)?([eE][+-]?[0-9]+)?$") ||
      ctxT.rlike("^\\{\\s*\\}$|^\\[\\s*\\]$")
    val cb = alerts.select(
      col("alert_id"),
      falsyCtx.as("__no_ctx"),
      get_json_object(col("context"), "$.carbonblack.action").as("__action"),
      get_json_object(col("context"), "$.carbonblack.value").as("md5hash"))
    cb.join(banned.select(col("md5hash"), col("enabled").as("__enabled")),
        Seq("md5hash"), "left")
      .withColumn("action_plan",
        when(col("__no_ctx"), "error_no_context")
          .when(col("__action").isNull || col("__action") =!= "ban",
            "error_unsupported_action")
          // cbapi's Binary lookup would raise on a missing hash value —
          // the dispatcher's caller counts that a failed send
          .when(col("md5hash").isNull, "error_no_value")
          .when(col("__enabled"), "noop_already_banned")
          .when(col("__enabled").isNotNull, "reenable")
          .otherwise("create_ban"))
      .withColumn("success", col("action_plan")
        .isin("noop_already_banned", "reenable", "create_ban"))
      .select("alert_id", "md5hash", "action_plan", "success")
  }

  /** Fold a [[banPlan]] result into the banned table: re-enables flip
    * `enabled` (text untouched — carbonblack.py:96-98 only sets
    * enabled), creates append one row per distinct hash with the
    * reference's fixed text. Idempotent under BOTH replay shapes: a
    * recomputed plan sees creates as already-banned, and a replayed
    * MATERIALIZED plan's creates anti-join away against the current
    * table — the banned list can never grow duplicate keys (which would
    * fan out every later banPlan join). */
  def applyPlan(plan: DataFrame, banned: DataFrame): DataFrame = {
    val reenabled = plan.filter(col("action_plan") === "reenable")
      .select("md5hash").distinct().withColumn("__re", lit(true))
    val created = plan.filter(col("action_plan") === "create_ban")
      .select("md5hash").distinct()
      .join(banned.select("md5hash"), Seq("md5hash"), "left_anti")
      .withColumn("enabled", lit(true))
      .withColumn("text", lit(BanText))
    banned.join(reenabled, Seq("md5hash"), "left")
      .select(col("md5hash"),
        (col("enabled") || coalesce(col("__re"), lit(false))).as("enabled"),
        col("text"))
      .unionByName(created.select("md5hash", "enabled", "text"))
  }
}
