package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import scala.jdk.CollectionConverters._
import graft.classify.{Classifier, Normalizer}
import graft.core.LogSchema
import graft.rules.{AlertContext, RulesEngine}
import graft.alerts.{AlertMerger, Outputs}
import graft.history.HistoricalSink

/** Everything a reference `conf/` directory declares, in one bundle —
  * see [[Pipeline.loadConfDir]]. */
final case class EngineConf(
    schemas: Seq[LogSchema],
    dataSources: Map[String, Map[String, Map[String, Seq[String]]]], // cluster -> service -> resource -> source prefixes
    outputs: Map[String, Seq[String]],
    lookupTables: Seq[graft.rules.LookupTables.TableConf],
    threatIntelJson: Option[String],
    scheduledQueries: Option[graft.history.ScheduledQueries.ScheduledQueryConf] = None)

object Pipeline {
  private def read(p: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")

  /** Files.list returns a Stream backed by an open DirectoryStream — it
    * must be closed, or each conf load leaks a file handle. */
  private def listDir(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Parse an existing reference `conf/` directory: the schemas JSON files
    * under conf/schemas with v1 normalized_types merged in, per-cluster
    * data_sources, the outputs registry, lookup-table and threat-intel
    * configs. The switch-over surface: point this at the conf tree a
    * streamalert deployment already maintains. */
  def loadConfDir(confDir: String): EngineConf = {
    val dir = java.nio.file.Paths.get(confDir)
    val schemaFiles = listDir(dir.resolve("schemas"))
      .filter(_.toString.endsWith(".json")).sortBy(_.getFileName.toString)
    val loaded = schemaFiles.flatMap(f => LogSchema.loadConfJson(read(f)))
    val v1File = dir.resolve("normalized_types.json")
    val schemas =
      if (java.nio.file.Files.isRegularFile(v1File))
        LogSchema.mergeV1Normalization(loaded,
          LogSchema.loadNormalizedTypesJson(read(v1File)))
      else loaded
    val clustersDir = dir.resolve("clusters")
    val clusters =
      if (java.nio.file.Files.isDirectory(clustersDir))
        listDir(clustersDir)
          .filter(_.toString.endsWith(".json")).map { f =>
            f.getFileName.toString.stripSuffix(".json") ->
              graft.core.DataSources.loadClusterJson(read(f))
          }.toMap
      else Map.empty[String, Map[String, Map[String, Seq[String]]]]
    def opt(name: String): Option[String] = {
      val p = dir.resolve(name)
      if (java.nio.file.Files.isRegularFile(p)) Some(read(p)) else None
    }
    EngineConf(
      schemas = schemas,
      dataSources = clusters,
      outputs = opt("outputs.json").map(graft.alerts.Outputs.loadOutputsJson)
        .getOrElse(Map.empty),
      lookupTables = opt("lookup_tables.json")
        .map(graft.rules.LookupTables.parseConfJson).getOrElse(Seq.empty),
      threatIntelJson = opt("threat_intel.json"),
      scheduledQueries = opt("scheduled_queries.json")
        .map(graft.history.ScheduledQueries.parseConfJson))
  }

  /** Assemble a runnable pipeline straight from a reference conf directory.
    * Rules are Scala code (the reference's are Python functions) and are
    * passed in; schemas, normalization (v1+v2), and candidate filtering all
    * come from the conf tree. When `cluster`/`service`/`resource` are given,
    * only the data_sources-declared schemas for that input compete in
    * classification (classifier.py:82-114). */
  def fromConfDir(confDir: String, rules: Seq[graft.rules.Rule],
      cluster: Option[String] = None, service: String = "",
      resource: String = ""): Pipeline = {
    val conf = loadConfDir(confDir)
    val schemas = cluster match {
      case Some(c) => graft.core.DataSources.candidates(
        conf.schemas, conf.dataSources(c), service, resource)
      case None => conf.schemas
    }
    new Pipeline(schemas, new RulesEngine(rules),
      schemas.map(s => s.name -> s.normalization).toMap)
  }
}

/** End-to-end wiring (SURVEY §3.1): the five-Lambda topology
  * (classifier ⇒ SQS ⇒ rules engine ⇒ DynamoDB ⇒ merger ⇒ processor)
  * collapsed into ONE Structured Streaming query:
  *
  *   source → classify/normalize (narrow) → rules (narrow) → alerts
  *          → [stateful merge] → foreachBatch{ historical sink + dispatch }
  *
  * The only shuffle in the pipeline is the merge groupBy (SURVEY §3.1
  * "Spark shape"); everything upstream is scan-side map work. */
final class Pipeline(
    schemas: Seq[LogSchema],
    engine: RulesEngine,
    normalization: Map[String, Map[String, Seq[graft.core.NormalizedField]]] = Map.empty) {

  private val classifier = new Classifier(schemas)

  /** Classify + normalize + evaluate one (micro-)batch of raw lines.
    * The union across log types is where the type-specific record shape
    * ends: each type's `record` struct serializes to its JSON text before
    * the union (two log types' structs are incompatible column types —
    * a struct-level `unionByName` fails the analyzer; the reference's
    * Alert likewise carries the record as a serialized dict from the rules
    * engine on, alert.py record round-trip). Everything downstream
    * ([[graft.alerts.AlertMerger.fromAlerts]], dispatch) consumes the
    * JSON form; merge-key values were already extracted column-side from
    * the typed struct inside `evaluate`. */
  def alertsFor(raw: DataFrame, valueCol: String = "value"): DataFrame = {
    val classified = classifier.classify(raw, valueCol)
    // static applicability check — no action on the (possibly streaming) DF
    val perType = schemas.filter(s => engine.rulesForLogType(s.name).nonEmpty).map { s =>
      val typed = classified.forType(s.name)
      val normConfig = normalization.getOrElse(s.name, Map.empty)
      val withNorm = typed
        .withColumn(Normalizer.NormalizationKey,
          Normalizer.normalizationCol(col("record"), normConfig, Some(s.schema)))
        .withColumn(Normalizer.RecordIdKey,
          Normalizer.recordIdCol(col(Normalizer.NormalizationKey)))
      engine.evaluate(withNorm, s.name)
        .withColumn("record", to_json(col("record")))
    }
    perType.reduceOption(_ unionByName _)
      .getOrElse(raw.sparkSession.emptyDataFrame)
  }

  /** The classified typed stream per log type (for the historical sink). */
  def classifiedFor(raw: DataFrame, logType: String, valueCol: String = "value"): DataFrame =
    classifier.classify(raw, valueCol).forType(logType)

  /** Historical + dead-letter side of the topology (S6 + O9): classified
    * data lands dt-partitioned per log type; unclassifiable records go to a
    * dead-letter directory with their raw payload for replay. One streaming
    * query per sink path, all fed from the same classified stream. */
  def startHistorical(rawStream: DataFrame, root: String, checkpointRoot: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): Seq[StreamingQuery] = {
    val classified = classifier.classify(rawStream)
    val perType = schemas.map { s =>
      val typed = classified.forType(s.name)
        .withColumn("created", current_timestamp())
      val w = HistoricalSink.writeStream(typed.drop("value"), root,
        s.name, s"$checkpointRoot/${graft.classify.Sanitizer.sanitizeName(s.name)}")
      trigger.fold(w)(w.trigger).start()
    }
    val deadLetter = {
      val w = classified.invalid
        .withColumn("dt", HistoricalSink.dtColumn(current_timestamp()))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$checkpointRoot/__dead_letter")
        .partitionBy("dt").format("parquet")
        .option("path", s"$root/__dead_letter")
      trigger.fold(w)(w.trigger).start()
    }
    perType :+ deadLetter
  }

  /** Launch the streaming pipeline over a raw stream: alerts merge in the
    * state store; merged alerts land in the alerts table and fan out.
    * `watermarkDelay` is the event-time lateness budget for the merge
    * (passed to [[AlertMerger.mergeStream]]): alerts whose `created` falls
    * behind the watermark by more than this are dropped from merging, and
    * merge windows flush once the watermark passes their anchor + window
    * + delay. "0 seconds" (default) = flush as soon as event time passes
    * the window; raise it when upstream sources deliver out of order. */
  def start(rawStream: DataFrame, alertsRoot: String, checkpoint: String,
      dispatchers: Map[String, Outputs.Dispatcher] = Map.empty,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      watermarkDelay: String = "0 seconds"): StreamingQuery = {
    // a merge-state layout bump must not silently abandon an existing
    // checkpoint's offset log — refuse to start over a legacy layout
    // (operator decides: migrate or accept the cold start deliberately)
    AlertMerger.guardLegacyCheckpoint(checkpoint,
      rawStream.sparkSession.sessionState.newHadoopConf())
    val merged = AlertMerger.mergeStream(
      AlertMerger.fromAlerts(
        alertsFor(rawStream).withColumn("staged", lit(false))),
      watermarkDelay = watermarkDelay)
    val writer0 = merged.writeStream
      // version-scoped: a merge-state layout bump cold-starts in a fresh
      // dir instead of reading an incompatible checkpoint (AlertMerger
      // StateFormatVersion) — guarded above so the relocation is never silent
      .option("checkpointLocation", AlertMerger.versionedCheckpoint(checkpoint))
      .outputMode("append")
    val writer = trigger.fold(writer0)(writer0.trigger)
    writer
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.alerts.MergedAlert], id: Long) =>
        val df = batch.toDF()
          .withColumn("dt", HistoricalSink.dtColumn(col("alert_time_first")))
        df.write.mode("append").partitionBy("dt").parquet(alertsRoot)
        if (dispatchers.nonEmpty)
          Outputs.fanOut(
            df.withColumn("alert_id",
              md5(concat_ws("|", col("rule_name"), col("merge_keys"),
                col("alert_time_first").cast("string"))))
              .withColumn("record", col("other_common_keys_json")),
            dispatchers,
            // rule-declared per-output publisher chains (the reference
            // stores this assignment on each alert; here it regroups the
            // batch per distinct chain at dispatch)
            ruleChains = engine.publisherAssignments)
        ()
      }
      .start()
  }
}
