package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.rules.{Rule, RuleOpts}
import graft.streaming.Pipeline

/** Streaming throughput harness for the hot path (SURVEY §3.1):
  * rate source → synthetic JSON → classify/normalize → rules → alerts,
  * reporting sustained records/sec from StreamingQueryProgress.
  *
  * The reference's published envelope is qualitative ("terabytes per day",
  * BASELINE.md) with a 128 MB / 60 s Lambda budget per classifier
  * invocation; this harness produces the comparable single-node number for
  * the collapsed pipeline. The rate source is set well above sustainable
  * throughput so `processedRowsPerSecond` measures engine capacity, not the
  * generator.
  *
  * Env knobs: SPARK_GRAFT_STREAM_RATE (rows per micro-batch, default 500k),
  * SPARK_GRAFT_STREAM_SECS (measure window, default 30),
  * SPARK_GRAFT_CPUS (default 4).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rate = sys.env.getOrElse("SPARK_GRAFT_STREAM_RATE", "500000").toInt
    val secs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "30").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // RocksDB state store for the merge path — the at-scale config (the
      // HDFS-backed store shells out chmod per state file on local FS)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthetic demo:json_events lines derived from the rate counter —
    // a mix of types so the rules actually filter (not constant-fold).
    // rate-micro-batch emits exactly `rate` rows per micro-batch (no
    // backlog growth), so each batch is an independent throughput sample.
    val raw = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rate)
      .option("numPartitions", cpus)
      .load()
      .select(concat(
        lit("""{"event_id":"""), col("value"),
        lit(""","event_type":""""),
        element_at(array(lit("purchase"), lit("view"), lit("error")),
          (col("value") % 3 + 1).cast("int")),
        lit("""","value":"""), (col("value") % 500).cast("string"),
        lit(""","props":"{\"k\":"""), (col("value") % 10).cast("string"),
        lit("""}\"}""")).as("value"))

    // merge_by_keys=value gives ~500 distinct merge groups per rule — the
    // "merge per entity" shape (user/host). Without merge keys the alerts
    // would take mergeStream's stateless passthrough and merge mode would
    // measure nothing stateful.
    val rules = Seq(
      Rule("any_purchase", RuleOpts(logs = Seq("demo:json_events"),
        mergeByKeys = Seq("value"), mergeWindowMins = 1),
        rec => rec.getField("event_type") === "purchase"),
      Rule("big_error", RuleOpts(logs = Seq("demo:json_events"),
        mergeByKeys = Seq("value"), mergeWindowMins = 1),
        rec => rec.getField("event_type") === "error" && rec.getField("value") > 250))

    val pipeline = new Pipeline(Seq(DemoSchemas.jsonEvents),
      new graft.rules.RulesEngine(rules),
      Map(DemoSchemas.jsonEvents.name -> Map.empty))
    val alerts = pipeline.alertsFor(raw)

    // SPARK_GRAFT_STREAM_MERGE=1 extends the measured path through the
    // stateful merge (the pipeline's only shuffle + the state store) —
    // input rows/sec then reflects the full source→merged-alert topology
    // SPARK_GRAFT_STREAM_TWS=1 swaps the GroupState engine for the
    // transformWithState (arbitrary-state v2) engine — ListState appends
    // instead of whole-buffer rewrites on the steady-state path
    // SPARK_GRAFT_STREAM_WM sets the event-time watermark delay on the
    // merge (e.g. "30 seconds"): the lateness budget end users tune when
    // sources deliver out of order — buffered windows are held open past
    // their close by the delay, so state grows with it
    val mergeMode = sys.env.get("SPARK_GRAFT_STREAM_MERGE").contains("1")
    val twsMode = sys.env.get("SPARK_GRAFT_STREAM_TWS").contains("1")
    val wmDelay = sys.env.getOrElse("SPARK_GRAFT_STREAM_WM", "0 seconds")
    val out =
      if (mergeMode || twsMode) {
        val in = graft.alerts.AlertMerger.fromAlerts(
          alerts.withColumn("staged", lit(false)))
        (if (twsMode) graft.alerts.AlertMerger.mergeStreamTws(in, wmDelay)
         else graft.alerts.AlertMerger.mergeStream(in, wmDelay)).toDF()
      } else alerts

    val q = out.writeStream.format("noop")
      .option("checkpointLocation",
        s"/tmp/graft_streambench_ckpt_${System.nanoTime()}")
      .start()

    // sample processedRowsPerSecond once per second; skip the JIT/warmup
    // third of the window, report the median of the rest
    val samples = scala.collection.mutable.ArrayBuffer[Double]()
    val deadline = System.nanoTime() + secs * 1000000000L
    var lastBatch = -1L
    while (System.nanoTime() < deadline) {
      Thread.sleep(1000)
      val p = q.lastProgress
      if (p != null && p.batchId != lastBatch && !p.processedRowsPerSecond.isNaN) {
        lastBatch = p.batchId
        samples += p.processedRowsPerSecond
      }
    }
    q.stop()
    val steady = samples.drop(samples.size / 3).sorted
    val median = if (steady.isEmpty) 0.0 else steady(steady.size / 2)
    println(s"""{"metric":"stream_records_per_sec","value":${median.round},""" +
      s""""unit":"rec/s","offered":$rate,"secs":$secs,"cpus":$cpus,""" +
      s""""merge":${mergeMode || twsMode},"tws":$twsMode,"wm":"$wmDelay",""" +
      s""""samples":${steady.size}}""")
    spark.stop()
  }
}
