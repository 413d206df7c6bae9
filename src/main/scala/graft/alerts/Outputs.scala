package graft.alerts

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Output dispatch (SURVEY §2.1 S9 + §2.4 A6): fan alerts out to their
  * `service:descriptor` outputs (alert_processor/main.py:76-151).
  *
  * The reference ships ~20 HTTP/queue dispatchers
  * (alert_processor/outputs/); the engine-side contract is the same three
  * local ones the test harness needs — console, file, and an HTTP-shaped
  * stub — invoked from `foreachBatch` so delivery is at-least-once with
  * idempotence via alert_id (SURVEY §2.6 delivery semantics). Per-output
  * success bookkeeping (outputs_sent, alert_processor/main.py:99-115)
  * becomes idempotent sink writes keyed by (alert_id, output). */
object Outputs {

  /** conf/outputs.json loader: service -> configured descriptors. The
    * reference validates every alert output against this registry before
    * dispatch (alert_processor resolves `service:descriptor` here); value
    * shapes vary per service (object keyed by descriptor, array of
    * descriptors, or a single string). */
  def loadOutputsJson(json: String): Map[String, Seq[String]] = {
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    root.properties().asScala.map { e =>
      val v = e.getValue
      val descriptors =
        if (v.isObject) v.properties().asScala.map(_.getKey).toSeq
        else if (v.isArray) v.elements().asScala.map(_.asText).toSeq
        else Seq(v.asText)
      e.getKey -> descriptors
    }.toMap
  }

  /** Is `service:descriptor` declared in the outputs conf? */
  def isConfigured(output: String, conf: Map[String, Seq[String]]): Boolean =
    output.split(":", 2) match {
      case Array(service, descriptor) =>
        conf.get(service).exists(_.contains(descriptor))
      case _ => false
    }

  sealed trait Dispatcher {
    /** Dispatch one micro-batch for one output descriptor; must be
      * idempotent on (alert_id, output). */
    def dispatch(batch: DataFrame, descriptor: String): Unit
  }

  /** The `outputs_sent` ledger of a sink dir (alert_processor/main.py:99-115):
    * distinct alert_ids already landed there, or None when nothing has been
    * delivered yet. Factored out of [[FileDispatcher]] so callers proving
    * redelivery idempotence can run the SAME gate against an already-read
    * sink frame instead of re-reading the dir. */
  private[graft] def sinkLedger(
      spark: org.apache.spark.sql.SparkSession, target: String): Option[DataFrame] = {
    // explicit FileSystem probe: read analysis is deferred in Spark 4.1,
    // so a Try around read.parquet would not catch a missing first-
    // delivery dir until the write executes
    val hPath = new org.apache.hadoop.fs.Path(target)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a dir can exist with NO committed parquet footers (a delivery that
    // died mid-write leaves target/_temporary only) — treating that as a
    // readable ledger would fail schema inference and wedge every retry.
    // ONLY that specific failure may downgrade to "nothing delivered
    // yet": a transient FS error must propagate, or a healthy ledger
    // would be ignored and already-sent alerts redelivered.
    if (fs.exists(hPath))
      try {
        val df = spark.read.parquet(target)
        df.schema // force analysis NOW — read resolution is deferred in 4.1
        Some(df.select("alert_id").distinct())
      } catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.toLowerCase.contains("infer schema") =>
          None // footers absent: treat as empty ledger
      }
    else None // first delivery: no ledger yet
  }

  /** The redelivery gate: alerts in `batch` not yet recorded in `ledger`.
    * Alert-cardinality broadcast anti-join, never stream-cardinality. */
  def freshAgainst(batch: DataFrame, ledger: Option[DataFrame]): DataFrame =
    ledger match {
      case Some(sent) => batch.join(broadcast(sent), Seq("alert_id"), "left_anti")
      case None => batch
    }

  /** aws-s3 / aws-firehose analogue: append files under the descriptor dir.
    *
    * The sink dir doubles as the `outputs_sent` ledger
    * (alert_processor/main.py:99-115): redelivered batches anti-join
    * against already-landed alert_ids, so retries after a partial failure
    * are idempotent on (alert_id, output). */
  final case class FileDispatcher(root: String) extends Dispatcher {
    def dispatch(batch: DataFrame, descriptor: String): Unit = {
      val target = s"$root/$descriptor"
      freshAgainst(batch, sinkLedger(batch.sparkSession, target))
        .write.mode("append").parquet(target)
    }
  }

  /** slack/pagerduty/... analogue for local runs: collect to driver log. */
  case object ConsoleDispatcher extends Dispatcher {
    def dispatch(batch: DataFrame, descriptor: String): Unit =
      batch.select(col("alert_id"), col("rule_name"), col("publication"))
        .show(20, truncate = false)
  }

  /** HTTP-shaped dispatcher: the engine-side contract of the ~20 webhook
    * outputs (slack/pagerduty/jira/...; alert_processor/outputs/ in the
    * reference). `send` receives (descriptor, publication JSON) per alert —
    * plug an HTTP client in deployment; keep it idempotent on alert_id.
    *
    * Publications stream through `toLocalIterator` — one partition on the
    * driver at a time — so a rule misfire that alerts on every record
    * cannot OOM the driver the way a whole-batch `collect()` would, while
    * `send` still runs driver-side (it is a plain closure, not required to
    * be serializable, matching alert_processor/main.py:76-92 where
    * delivery happens in one process). */
  final case class WebhookDispatcher(send: (String, String) => Unit) extends Dispatcher {
    def dispatch(batch: DataFrame, descriptor: String): Unit =
      batch.select(col("publication")).toLocalIterator()
        .forEachRemaining(r => send(descriptor, r.getString(0)))
  }

  /** Per-(alert, output) delivery attempt state — the engine analogue of
    * the reference alert table's Attempts / Dispatched / OutputsSent
    * bookkeeping (shared/alert_table.py:84-190): the merger re-dispatches
    * alerts whose outputs haven't all sent, skipping those dispatched too
    * recently, and the processor updates the sent set per try.
    *
    * Append-only parquet rows (alert_id, output, ok, attempt_ts); current
    * state = one aggregate over alert-cardinality data (attempts = row
    * count, sent = any ok, last_attempt = latest try). At 100 TB the
    * ledger stays tiny relative to the stream — it only ever holds alert
    * rows, and reads broadcast. */
  final case class AttemptLedger(path: String) {
    import org.apache.spark.sql.SparkSession

    private[graft] def read(spark: SparkSession): Option[DataFrame] = {
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hPath))
        try {
          val df = spark.read.parquet(path)
          df.schema // force analysis NOW — read resolution is deferred in 4.1
          Some(df)
        } catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getMessage.toLowerCase.contains("infer schema") =>
            None // footers absent: no attempts recorded yet
        }
      else None
    }

    private[graft] def append(rows: DataFrame): Unit =
      rows.write.mode("append").parquet(path)

    /** (alert_id, output, attempts, sent, last_attempt). */
    def state(spark: SparkSession): DataFrame = read(spark) match {
      case Some(df) => df.groupBy("alert_id", "output").agg(
        count(lit(1)).as("attempts"),
        max(col("ok")).as("sent"),
        max(col("attempt_ts")).as("last_attempt"))
      case None => spark.emptyDataFrame
        .select(lit("").as("alert_id"), lit("").as("output"),
          lit(0L).as("attempts"), lit(false).as("sent"),
          lit(null).cast("timestamp").as("last_attempt"))
    }

    /** Rows still owed a delivery: attempted but never sent (the
      * reference's `remaining_outputs`, shared/alert.py). */
    def retryable(spark: SparkSession): DataFrame =
      state(spark).where(!col("sent"))
  }

  /** Fan out with per-output attempt tracking: a throwing dispatcher
    * records a failed attempt for its (alert, output) rows and the rest of
    * the fan-out proceeds; the next invocation retries exactly the
    * not-yet-sent pairs (attempt count incremented), and already-sent
    * pairs are never re-dispatched. Returns per-output success.
    *
    * This is the engine shape of the reference's retry loop
    * (alert_merger dispatch filter + alert_table attempts bookkeeping):
    * state lives in the [[AttemptLedger]], not in the stream. */
  def fanOutTracked(batch: DataFrame, dispatchers: Map[String, Dispatcher],
      ledger: AttemptLedger,
      publishersByOutput: Map[String, Seq[String]] = Map.empty,
      clock: Option[java.sql.Timestamp] = None,
      ruleChains: Map[String, Map[String, Seq[String]]] = Map.empty): Map[String, Boolean] = {
    val spark = batch.sparkSession
    val ts = clock.map(t => lit(t).cast("timestamp"))
      .getOrElse(current_timestamp())
    val perOutput = batch
      .select(col("*"), explode(col("outputs")).as("__output"))
      .where(col("__output").contains(":"))
      .persist()
    try {
      val outputs = perOutput.select("__output").distinct()
        .collect().map(_.getString(0))
      val sent = ledger.state(spark).where(col("sent"))
        .select(col("alert_id"), col("output").as("__output"))
      outputs.flatMap { out =>
        val Array(service, descriptor) = out.split(":", 2)
        dispatchers.get(service).map { d =>
          val owed = perOutput.where(col("__output") === out)
            .join(broadcast(sent.where(col("__output") === out)
              .select("alert_id")), Seq("alert_id"), "left_anti")
            .drop("__output")
            .persist()
          try {
            val ok =
              if (owed.isEmpty) true // nothing owed: nothing to record
              else {
                val subsets = chainSubsets(owed, out,
                  publishersByOutput.getOrElse(out, Nil), ruleChains)
                val delivered =
                  try {
                    subsets.foreach { case (chain, df) =>
                      if (subsets.size == 1 || !df.isEmpty)
                        d.dispatch(Publishers.publish(df, chain), descriptor)
                    }
                    true
                  } catch { case scala.util.control.NonFatal(_) => false }
                ledger.append(owed.select(col("alert_id"),
                  lit(out).as("output"), lit(delivered).as("ok"),
                  ts.as("attempt_ts")))
                delivered
              }
            out -> ok
          } finally owed.unpersist()
        }
      }.toMap
    } finally perOutput.unpersist()
  }

  /** Split one output's alert batch by the publisher chain each alert's
    * RULE declares for that output (the per-alert assignment of
    * rules_engine.py:326-338, regrouped so every distinct chain publishes
    * as ONE column plan instead of a per-alert loop). Alerts from rules
    * with no declaration fall back to the conf-level default chain. */
  private def chainSubsets(base: DataFrame, out: String,
      defaultChain: Seq[String],
      ruleChains: Map[String, Map[String, Seq[String]]]): Seq[(Seq[String], DataFrame)] = {
    val declared = ruleChains.collect {
      case (rn, m) if m.getOrElse(out, Nil).nonEmpty => rn -> m(out)
    }
    if (declared.isEmpty) Seq(defaultChain -> base)
    else {
      val declaredRules = declared.keys.toSeq
      declared.groupBy(_._2).toSeq.map { case (chain, entries) =>
        chain -> base.where(col("rule_name").isin(entries.keys.toSeq: _*))
      } :+ (defaultChain -> base.where(!col("rule_name").isin(declaredRules: _*)))
    }
  }

  /** Fan one alert batch out to every output it carries. `outputs` is the
    * per-alert array column; dispatchers are keyed by service name;
    * `ruleChains` (rule name -> output -> chain) carries the rule-declared
    * publisher assignments from [[graft.rules.RulesEngine.publisherAssignments]]. */
  def fanOut(batch: DataFrame, dispatchers: Map[String, Dispatcher],
      publishersByOutput: Map[String, Seq[String]] = Map.empty,
      ruleChains: Map[String, Map[String, Seq[String]]] = Map.empty): Unit = {
    // one action per output PLUS the distinct scan below all read `batch` —
    // cache it so the upstream pipeline (classify -> rules) evaluates once
    // per fan-out, not once per output
    val perOutput = batch
      .select(col("*"), explode(col("outputs")).as("__output"))
      .where(col("__output").contains(":"))
      .persist()
    try {
      val outputs = perOutput.select("__output").distinct()
        .collect().map(_.getString(0))
      outputs.foreach { out =>
        val Array(service, descriptor) = out.split(":", 2)
        dispatchers.get(service).foreach { d =>
          val base = perOutput.where(col("__output") === out).drop("__output")
          val subsets = chainSubsets(base, out,
            publishersByOutput.getOrElse(out, Nil), ruleChains)
          subsets.foreach { case (chain, df) =>
            // a split leaves possibly-empty groups; only the single
            // (unsplit) subset dispatches unconditionally as before
            if (subsets.size == 1 || !df.isEmpty)
              d.dispatch(Publishers.publish(df, chain), descriptor)
          }
        }
      }
    } finally perOutput.unpersist()
  }
}
