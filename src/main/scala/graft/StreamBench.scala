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

  /** The synthetic demo:json_events line for rate-counter `value` —
    * factored out so StreamBenchSourceSpec can pin that these lines
    * CLASSIFY (non-zero accept rate). r17 post-mortem: a triple-quoted
    * `\"` left the props string unterminated, every record was
    * unclassifiable, and all prior rec/s silently measured the
    * classify-REJECT path; this guard retires that bug class. */
  private[graft] def syntheticEventLine(value: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = concat(
    lit("""{"event_id":"""), value,
    lit(""","event_type":""""),
    element_at(array(lit("purchase"), lit("view"), lit("error")),
      (value % 3 + 1).cast("int")),
    lit("""","value":"""), (value % 500).cast("string"),
    lit(""","props":"{\"k\":"""), (value % 10).cast("string"),
    // raw-text tail is }"} — inner brace ends the props JSON-in-a-string,
    // bare quote closes the STRING, outer brace closes the record (a
    // \" here would be a literal backslash in triple quotes, leaving
    // the string unterminated and every record unclassifiable)
    lit("""}"}"""))

  def main(args: Array[String]): Unit = {
    val rate = sys.env.getOrElse("SPARK_GRAFT_STREAM_RATE", "500000").toInt
    val secs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "30").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_STREAM_DEDUP=minhash|ppjoin|substring|simhash|winnow|
    // line|attrs|shards|chunks|web benches the incremental STORE loop
    // (foreachBatch -> *StoreStep) instead of the
    // classify->rules->alerts pipeline:
    // per-batch docs/sec + the on-disk state-size trajectory over
    // >= SPARK_GRAFT_STREAM_BATCHES batches. substring =
    // repeatedSubstringStoreStep (gram-count store; the per-batch step
    // time staying FLAT as the store grows is the receipt that the
    // broadcast-semi prune keeps the step batch-proportional); line =
    // c4LineCleanStoreStep (corpus-wide line dedup); attrs =
    // Curation.attributeStoreStep (incremental tagging); shards =
    // shardStoreStep (global-offset manifest packing); web = the FULL
    // streaming web-corpus program (WebOps.webStoreStep: canonicalize +
    // blocklist + robots -> url-dedup store -> jusText -> exact-dedup
    // attribute store -> incremental substring cut), synthetic HTML
    // pages with recurring urls/boilerplate/content so every store
    // fires.
    // SPARK_GRAFT_STREAM_AUTO_PARTS=N passes maxStoreParts=N to the step
    // (the size-tiered AUTO-compaction trigger live in-stream)
    sys.env.get("SPARK_GRAFT_STREAM_DEDUP") match {
      case Some(mode) => runDedupStoreBench(mode, cpus); return
      case None =>
    }
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
      .select(syntheticEventLine(col("value")).as("value"))

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
    // SPARK_GRAFT_STREAM_PIPELINE=1 runs the WHOLE reference topology live
    // (r16 verdict ask #5): source → classify → rules → stateful merge →
    // foreachBatch alerts parquet sink, PLUS the historical sink + dead
    // letter on the same raw stream — the operational composition receipt.
    // Reports rec/s, per-batch state-store rows/bytes, and the on-disk
    // alerts/historical row counts at stop.
    if (sys.env.get("SPARK_GRAFT_STREAM_PIPELINE").contains("1")) {
      runPipelineBench(spark, pipeline, raw, rate, secs, cpus, wmDelay)
      spark.stop(); return
    }
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

  /** End-to-end pipeline bench (the `SPARK_GRAFT_STREAM_PIPELINE` mode):
    * the five-Lambda topology as it actually runs — `Pipeline.start`
    * (classify → rules → watermarked stateful merge → alerts parquet +
    * dispatch hook) concurrently with `Pipeline.startHistorical` (S6
    * dt-partitioned landing + O9 dead letter) over one raw stream. The
    * per-batch samples record processedRowsPerSecond AND the merge
    * state store's rows/bytes (StateOperatorProgress), so the receipt
    * shows state stays group-bounded while throughput holds. */
  private def runPipelineBench(spark: SparkSession, pipeline: Pipeline,
      raw: org.apache.spark.sql.DataFrame, rate: Int, secs: Int,
      cpus: String, wmDelay: String): Unit = {
    val root = s"/tmp/graft_streambench_pipeline_${System.nanoTime()}"
    val q = pipeline.start(raw, s"$root/alerts", s"$root/ckpt",
      watermarkDelay = wmDelay)
    val hist = pipeline.startHistorical(raw, s"$root/hist", s"$root/hckpt")
    val rps = scala.collection.mutable.ArrayBuffer[Double]()
    val stateRows = scala.collection.mutable.ArrayBuffer[Long]()
    var stateMemMax = 0L
    val deadline = System.nanoTime() + secs * 1000000000L
    var lastBatch = -1L
    while (System.nanoTime() < deadline) {
      Thread.sleep(1000)
      val p = q.lastProgress
      if (p != null && p.batchId != lastBatch && !p.processedRowsPerSecond.isNaN) {
        lastBatch = p.batchId
        rps += p.processedRowsPerSecond
        p.stateOperators.foreach { so =>
          stateRows += so.numRowsTotal
          stateMemMax = math.max(stateMemMax, so.memoryUsedBytes)
        }
        System.err.println(f"[pipeline] batch ${p.batchId}%3d " +
          f"${p.processedRowsPerSecond}%.0f rec/s state_rows=" +
          p.stateOperators.map(_.numRowsTotal).sum)
      }
    }
    q.stop(); hist.foreach(_.stop())
    val steady = rps.drop(rps.size / 3).sorted
    val median = if (steady.isEmpty) 0.0 else steady(steady.size / 2)
    def count(dir: String): Long =
      if (new java.io.File(dir).exists())
        try spark.read.parquet(dir).count() catch { case _: Throwable => 0L }
      else 0L
    val alertRows = count(s"$root/alerts")
    val histRows = count(s"$root/hist/demo_json_events")
    println(s"""{"metric":"pipeline_records_per_sec","value":${median.round},""" +
      s""""unit":"rec/s","offered":$rate,"secs":$secs,"cpus":$cpus,""" +
      s""""wm":"$wmDelay","alerts_rows":$alertRows,"historical_rows":$histRows,""" +
      s""""state_rows_last":${stateRows.lastOption.getOrElse(0L)},""" +
      s""""state_rows_max":${if (stateRows.isEmpty) 0L else stateRows.max},""" +
      s""""state_mem_mb_max":${stateMemMax / 1048576},"samples":${steady.size}}""")
  }

  /** Incremental dedup store-loop bench: rate source → synthetic docs
    * (16 deterministic tokens keyed by a seed; every 10th row reuses
    * seed % 997, so later batches repeat earlier content and the
    * against-store path actually fires) → `foreachBatch` into
    * [[graft.pipeline.Dedup.minhashStoreStep]] /
    * [[graft.pipeline.Dedup.similarityStoreStep]]. Reports per-batch
    * docs/sec (median after the warmup third) and the parquet store's
    * on-disk byte trajectory — the evidence that per-batch cost and
    * state growth stay batch-proportional, not corpus-proportional. */
  private def runDedupStoreBench(mode: String, cpus: String): Unit = {
    val docsPerBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_RATE", "5000").toInt
    val targetBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "25").toInt
    // SPARK_GRAFT_STREAM_COMPACT_EVERY=N folds the active mode's store
    // partitions every N batches (upTo = id-1 keeps the latest batch
    // retryable) — the receipt that partition count stays bounded
    val compactEvery = sys.env.get("SPARK_GRAFT_STREAM_COMPACT_EVERY").map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val storeDir = s"/tmp/graft_streambench_dedup_${System.nanoTime()}"
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def storeBytes(): Long =
      if (fs.exists(new org.apache.hadoop.fs.Path(storeDir)))
        fs.getContentSummary(new org.apache.hadoop.fs.Path(storeDir)).getLength
      else 0L

    val autoParts = sys.env.getOrElse("SPARK_GRAFT_STREAM_AUTO_PARTS", "0").toInt
    val seed = org.apache.spark.sql.functions.when(col("value") % 10 === 0,
      pmod(col("value"), lit(997L))).otherwise(col("value"))
    val toks = (0 until 16).map(i =>
      concat(lit(s"w${i}_"),
        pmod(col("__seed") * 2654435761L + i * 40503, lit(1000003L))))
    // line mode reshapes the same 16 tokens into 4 lines of 4 words, with
    // every 5th doc leading with a shared boilerplate line — so the
    // cross-batch line election actually fires
    // C4's line filter keeps terminal-punctuation lines only — the
    // synthetic lines end with "." so they reach the dedup election
    def lineExpr(j: Int) =
      concat(concat_ws(" ", toks.slice(j * 4, j * 4 + 4): _*), lit("."))
    val text =
      if (mode == "line") concat_ws("\n",
        when(pmod(col("__seed"), lit(5)) === 0,
          lit("please subscribe to our newsletter today.")).otherwise(lineExpr(0)),
        lineExpr(1), lineExpr(2), lineExpr(3))
      else concat_ws(" ", toks: _*)
    // web mode: synthetic crawl pages — recurring page numbers (url
    // dedup), a blocklisted host, robots-disallowed prefixes + one live
    // wildcard rule, boilerplate every 5th page (substring cut), and
    // content reuse via the shared seed (exact dedup)
    val jtStops = Seq("the", "a", "of", "and", "to", "in")
    import spark.implicits._
    // host = site(pg%5).com, path = /p/pg — a page ending in 7 is ≡ 7
    // (mod 10) so pg%5 == 2: the live wildcard rule must sit on
    // site2.com to ever fire; the literal /p/kkk prefixes fire on pages
    // starting with kkk (k>=1 — a numeric page can never start with 0)
    val webRules = (Seq(("site2.com", false, "/p/*7$")) ++
      (1 to 4).map(k => (s"site$k.com", false, s"/p/$k$k$k")))
      .toDF("host", "allow", "path")
    val pg = when(col("value") % 10 === 0, pmod(col("value"), lit(997L)))
      .otherwise(col("value"))
    val webHost = when(col("value") % 29 === 0, lit("badsite.com"))
      .otherwise(concat(lit("site"), pmod(pg, lit(5L)), lit(".com")))
    val webUrl = concat(lit("https://www."), webHost, lit("/p/"), pg,
      when(col("value") % 3 === 0, lit("?utm_k=9")).otherwise(lit("")))
    val para = concat_ws(" ", (0 until 16).flatMap(i =>
      Seq(lit(jtStops(i % 6)), toks(i))): _*)
    val webHtml = concat(
      lit("<html><head><title>t</title></head><body>" +
        "<div><a href=\"/nav\">home nav link chrome</a></div>"),
      when(pmod(col("doc_id"), lit(5L)) === 0,
        lit("<p>please subscribe to our newsletter and share the page " +
          "with all of your friends today because it helps us out a " +
          "lot.</p>")).otherwise(lit("")),
      lit("<p>"), para, lit(".</p></body></html>"))
    val stream0 = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", docsPerBatch)
      .option("numPartitions", cpus)
      .load()
      .select(col("value").as("doc_id"), col("value"), seed.as("__seed"))
    val docs =
      if (mode == "web") stream0
        .select(col("doc_id"), webUrl.as("url"), webHtml.as("html"))
      else stream0.select(col("doc_id"), text.as("text"))
    val watchSub = mode match {
      case "ppjoin" => "sorted"
      case "substring" => "gramcounts"
      case "simhash" => "sims"
      case "winnow" => "fps"
      case "line" => "linehashes"
      case "attrs" => "fingerprints"
      case "shards" => "manifests"
      case "chunks" => "seq_manifests"
      case "web" => "urlfps"
      case _ => "shingles"
    }

    case class B(id: Long, rows: Long, dups: Long, secs: Double, bytes: Long,
      parts: Int)
    val batches = scala.collection.mutable.ArrayBuffer[B]()
    val q = docs.writeStream
      .option("checkpointLocation", s"$storeDir/_ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val bb = b.localCheckpoint() // isolate the step from source cost
        val n = bb.count()
        val t0 = System.nanoTime()
        val dups = mode match {
          case "ppjoin" => graft.pipeline.Dedup.similarityStoreStep(
            bb, storeDir, "text", "doc_id", shingleWords = 2, threshold = 0.6,
            batchId = id, maxStoreParts = autoParts)
          case "simhash" => graft.pipeline.Dedup.simhashStoreStep(
            bb, storeDir, "text", "doc_id", maxDist = 3, batchId = id,
            maxStoreParts = autoParts)
          case "winnow" => graft.pipeline.Dedup.winnowingStoreStep(
            bb, storeDir, "text", "doc_id", batchId = id,
            maxStoreParts = autoParts)
          case "substring" => graft.pipeline.Dedup.repeatedSubstringStoreStep(
            bb, storeDir, "text", "doc_id", minLen = 8, batchId = id,
            maxStoreParts = autoParts)
            .where(col("dup_tokens") > 0)
          case "line" => graft.pipeline.TextAnalysis.c4LineCleanStoreStep(
            bb, storeDir, "text", "doc_id", minWords = 3, batchId = id,
            maxStoreParts = autoParts)
            .where(col("n_drop_dup") > 0)
          case "attrs" => graft.pipeline.Curation.attributeStoreStep(
            bb, storeDir, id, "text", "doc_id",
            Seq("the", "and", "of", "to", "a"),
            Seq("en" -> Seq("the", "and", "of")),
            maxStoreParts = autoParts)
            .where(!col("is_canonical"))
          case "shards" => graft.pipeline.TextAnalysis.shardStoreStep(
            bb, storeDir, "text", "doc_id", shardTokens = 50000L,
            batchId = id, maxStoreParts = autoParts)
          case "chunks" => graft.pipeline.TextAnalysis.chunkStoreStep(
            bb, storeDir, "text", "doc_id", seqLen = 2048L,
            batchId = id, maxStoreParts = autoParts)
          case "web" => graft.pipeline.WebOps.webStoreStep(
            bb, storeDir, id, "url", "html", "doc_id", webRules,
            Seq("badsite.com"), jtStops,
            stopwordsLow = 0.04, stopwordsHigh = 0.08,
            maxStoreParts = autoParts)
            .where(col("kept"))
          case _ => graft.pipeline.Dedup.minhashStoreStep(
            bb, storeDir, "text", "doc_id", shingleWords = 3,
            numHashes = 32, bands = 8, threshold = 0.7, batchId = id,
            maxStoreParts = autoParts)
        }
        val nd = dups.count()
        val s = (System.nanoTime() - t0) / 1e9
        if (compactEvery.exists(ce => id > 0 && id % ce == 0)) {
          val t1 = System.nanoTime()
          val folded = mode match {
            case "ppjoin" => graft.pipeline.Dedup.similarityStoreCompact(
              bb.sparkSession, storeDir, -id, id - 1)
            case "substring" => graft.pipeline.Dedup.repeatedSubstringStoreCompact(
              bb.sparkSession, storeDir, -id, id - 1)
            case "simhash" => graft.pipeline.Dedup.simhashStoreCompact(
              bb.sparkSession, storeDir, -id, id - 1)
            case "winnow" => graft.pipeline.Dedup.winnowingStoreCompact(
              bb.sparkSession, storeDir, -id, id - 1)
            case "line" => graft.pipeline.TextAnalysis.c4LineStoreCompact(
              bb.sparkSession, storeDir, -id, id - 1)
            case "attrs" => graft.pipeline.Curation.attributeStoreCompact(
              bb.sparkSession, storeDir, -id, id - 1)
            case "shards" => graft.pipeline.TextAnalysis.shardStoreCompact(
              bb.sparkSession, storeDir, -id, id - 1)
            case "chunks" => graft.pipeline.TextAnalysis.chunkStoreCompact(
              bb.sparkSession, storeDir, -id, id - 1)
            case "web" => graft.pipeline.WebOps.webStoreCompact(
              bb.sparkSession, storeDir, -id, id - 1)
            case _ => graft.pipeline.Dedup.minhashStoreCompact(
              bb.sparkSession, storeDir, -id, id - 1)
          }
          val nparts = fs.listStatus(
            new org.apache.hadoop.fs.Path(s"$storeDir/$watchSub")).count(_.isDirectory)
          println(f"[dedup-store] batch=$id%2d compacted ${folded.size}%2d partitions " +
            f"in ${(System.nanoTime() - t1) / 1e9}%.2f s -> $nparts live")
        }
        val live = {
          val p = new org.apache.hadoop.fs.Path(s"$storeDir/$watchSub")
          if (fs.exists(p)) fs.listStatus(p).count(_.isDirectory) else 0
        }
        batches.synchronized { batches += B(id, n, nd, s, storeBytes(), live) }
        bb.unpersist(true): Unit
      }
      .start()
    while (batches.synchronized(batches.size) < targetBatches) Thread.sleep(500)
    q.stop()

    val bs = batches.synchronized(batches.toVector).sortBy(_.id)
      .take(targetBatches)
    bs.foreach(b => println(
      f"[dedup-store] batch=${b.id}%2d rows=${b.rows} dups=${b.dups}%4d " +
        f"step=${b.secs}%.2f s store=${b.bytes / 1048576.0}%.1f MiB " +
        f"parts=${b.parts}%2d"))
    val steady = bs.drop(bs.size / 3).map(b => b.rows / b.secs).sorted
    val median = if (steady.isEmpty) 0.0 else steady(steady.size / 2)
    val growth = bs.drop(bs.size / 3).map(_.bytes)
    val perBatchGrowth =
      if (growth.size >= 2) (growth.last - growth.head).toDouble /
        (growth.size - 1) / 1048576.0
      else 0.0
    println(s"""{"metric":"dedup_store_docs_per_sec","value":${median.round},""" +
      s""""unit":"docs/s","mode":"$mode","rowsPerBatch":$docsPerBatch,""" +
      s""""batches":${bs.size},"cpus":$cpus,""" +
      s""""dups_last":${bs.last.dups},"store_mib":${bs.last.bytes / 1048576},""" +
      s""""parts_last":${bs.last.parts},"auto_parts":$autoParts,""" +
      f""""store_growth_mib_per_batch":$perBatchGrowth%.2f}""")
    spark.stop()
  }
}
