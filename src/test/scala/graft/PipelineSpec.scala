package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.core.FieldType._
import graft.rules._
import graft.sources.Sources
import graft.history.{HistoricalSink, RulePromotion, ScheduledQueries}
import graft.alerts.{Outputs, Publishers}
import graft.streaming.Pipeline

/** End-to-end + history/scheduled-query behaviors (SURVEY §3). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = LogSchema(
    name = "demo:events", parser = ParserKind.Json,
    schema = TStruct.of("event_id" -> TInteger, "etype" -> TString, "value" -> TFloat))

  private val engine = new RulesEngine(
    Seq(Rule("big", RuleOpts(logs = Seq("demo:events"), mergeByKeys = Seq("etype"),
      mergeWindowMins = 60), rec => rec.getField("value") > 100)),
    deterministicIds = true,
    clock = Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))

  test("kinesis-style base64+gzip decode round-trips") {
    val lines = Seq("""{"event_id":1,"etype":"error","value":150.0}""")
    val encoded = lines.map { s =>
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(s.getBytes("UTF-8")); gz.close()
      java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    }
    val decoded = encoded.toDF("data")
      .select(Sources.decodeKinesisData(col("data")).as("value"))
      .collect()(0).getString(0)
    assert(decoded == lines.head)
  }

  test("sns envelope extraction") {
    val env = """{"Sns":{"Message":"{\"event_id\":2}"}}"""
    val got = Seq(env).toDF("value").select(Sources.snsMessage(col("value")))
      .collect()(0).getString(0)
    assert(got == """{"event_id":2}""")
  }

  test("object drop: whole-file JSON vs JSON-lines vs raw lines (s3.py:153-174)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_objdrop")
    // pretty-printed whole-object JSON -> ONE minified record
    java.nio.file.Files.writeString(dir.resolve("whole.json"),
      "{\n  \"a\": 1,\n  \"b\": [\n    2,\n    3\n  ]\n}\n")
    // two JSON objects on separate lines -> whole parse fails -> two records
    java.nio.file.Files.writeString(dir.resolve("lines.json"),
      "{\"a\":10}\n{\"a\":11}\n")
    // raw non-JSON lines -> passed through, blanks dropped
    java.nio.file.Files.writeString(dir.resolve("raw.log"),
      "plain line one\n\nplain line two\n")
    val got = Sources.objectDrop(spark, dir.toString)
      .select("value").as[String].collect().toSet
    assert(got.exists(v => v.replaceAll("\\s", "") == """{"a":1,"b":[2,3]}"""))
    assert(got.contains("""{"a":10}""") && got.contains("""{"a":11}"""))
    assert(got.contains("plain line one") && got.contains("plain line two"))
    assert(got.size == 5)
  }

  test("streaming pipeline: raw lines -> classified -> rules -> merged alerts on disk") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val input = MemoryStream[String]
    val pipeline = new Pipeline(Seq(schema), engine)
    input.addData(
      """{"event_id":1,"etype":"error","value":150.0}""",
      """{"event_id":2,"etype":"error","value":250.0}""",
      """{"event_id":3,"etype":"ok","value":50.0}""")
    val q = pipeline.start(input.toDF(), s"$tmp/alerts", s"$tmp/ckpt",
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    try assert(q.awaitTermination(120000), "pipeline did not finish in 120s")
    finally q.stop()
    // state flushed only on timeout; restart-free check: alerts dir may be
    // empty but the pipeline ran without error. Validate the batch path
    // instead for content:
    val alerts = pipeline.alertsFor(Seq(
      """{"event_id":9,"etype":"error","value":500.0}""").toDF("value"))
    assert(alerts.select("rule_name").as[String].collect().toSeq == Seq("big"))
  }

  test("streaming incremental near-dup: a dup of a batch-N doc is caught at batch N+1") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_neardup_stream").toString
    val input = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.Buffer[(Long, Long)]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val dups = graft.pipeline.Dedup.minhashStoreStep(batch, s"$tmp/store",
          "text", "doc_id", shingleWords = 2, numHashes = 32, bands = 8,
          threshold = 0.5, batchId = bid)
        seen.synchronized {
          seen ++= dups.select("id_new", "id_store").as[(Long, Long)].collect()
        }
        ()
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      // batch 1: two distinct docs seed the store — nothing to collide with
      input.addData((1L, "alpha beta gamma delta epsilon"),
        (2L, "one two three four five"))
      q.processAllAvailable()
      assert(seen.isEmpty, s"batch 1 must produce no dups, got $seen")
      // batch 2: doc 3 duplicates batch 1's doc 1 — caught via the staged
      // store, no corpus re-shingle; doc 4 is fresh and extends the store
      input.addData((3L, "alpha beta gamma delta epsilon"),
        (4L, "red green blue yellow purple"))
      q.processAllAvailable()
      assert(seen.toSet == Set((3L, 1L)),
        s"batch 2 must catch doc 3 against the batch-1 store, got $seen")
      // batch 3: a copy of the DROPPED duplicate still resolves to the
      // canonical store doc (keep-one store semantics)
      input.addData((5L, "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      assert(seen.toSet == Set((3L, 1L), (5L, 1L)),
        s"batch 3 must catch doc 5 against the canonical doc 1, got $seen")
    } finally q.stop()
  }

  test("streaming exact-similarity dedup: PPJoin store loop catches cross-batch dups") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ppjoin_stream").toString
    val input = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.Buffer[(Long, Long)]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val dups = graft.pipeline.Dedup.similarityStoreStep(batch, s"$tmp/store",
          "text", "doc_id", shingleWords = 2, threshold = 0.6, batchId = bid)
        seen.synchronized {
          seen ++= dups.select("id_new", "id_store").as[(Long, Long)].collect()
        }
        ()
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      // batch 1 founds the store and freezes the canonical order
      input.addData((1L, "alpha beta gamma delta epsilon"),
        (2L, "one two three four five"))
      q.processAllAvailable()
      assert(seen.isEmpty, s"batch 1 must produce no dups, got $seen")
      // batch 2: doc 3 duplicates doc 1 EXACTLY (PPJoin: guaranteed, not
      // probabilistic); doc 4 is fresh vocabulary, appended at frozen-df 0
      input.addData((3L, "alpha beta gamma delta epsilon"),
        (4L, "red green blue yellow purple"))
      q.processAllAvailable()
      assert(seen.toSet == Set((3L, 1L)),
        s"batch 2 must catch doc 3 against the batch-1 store, got $seen")
      // batch 3: dups of the dropped duplicate AND of the unseen-vocab doc
      // both resolve against the canonical store rows
      input.addData((5L, "alpha beta gamma delta epsilon"),
        (6L, "red green blue yellow purple"))
      q.processAllAvailable()
      assert(seen.toSet == Set((3L, 1L), (5L, 1L), (6L, 4L)),
        s"batch 3 must catch both canonical targets, got $seen")
    } finally q.stop()
  }

  test("streaming banded embedding near-dup: a dup of a batch-N vector is caught at batch N+1") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_banded_stream").toString
    def unit(dims: Int*): Seq[Double] =
      (0 until 8).map(i => if (dims.contains(i)) 1.0 / math.sqrt(dims.size) else 0.0)
    val input = MemoryStream[(Long, Seq[Double])]
    val seen = scala.collection.mutable.Buffer[(Long, Long)]()
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val dups = graft.pipeline.Dedup.bandedStoreStep(batch, s"$tmp/store",
          "embedding", "vec_id", bands = 16, planesPerBand = 4,
          threshold = 0.95, batchId = bid)
        seen.synchronized {
          seen ++= dups.select("id_new", "id_store").as[(Long, Long)].collect()
        }
        ()
      }
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      // batch 1: two orthogonal vectors seed the store — nothing collides
      input.addData((1L, unit(0)), (2L, unit(1)))
      q.processAllAvailable()
      assert(seen.isEmpty, s"batch 1 must produce no dups, got $seen")
      // batch 2: vec 3 duplicates batch 1's vec 1 — caught via the staged
      // banded index, no corpus re-signing; vec 4 is fresh and extends it
      input.addData((3L, unit(0)), (4L, unit(2)))
      q.processAllAvailable()
      assert(seen.toSet == Set((3L, 1L)),
        s"batch 2 must catch vec 3 against the batch-1 store, got $seen")
      // batch 3: a copy of the DROPPED duplicate still resolves to the
      // canonical store vector (keep-one store semantics)
      input.addData((5L, unit(0)))
      q.processAllAvailable()
      assert(seen.toSet == Set((3L, 1L), (5L, 1L)),
        s"batch 3 must catch vec 5 against the canonical vec 1, got $seen")
    } finally q.stop()
  }

  test("stream-stream correlation: Y within the window pairs, late/early Y does not") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val logins = MemoryStream[(Long, java.sql.Timestamp)]
    val errors = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = graft.streaming.Correlation.followedBy(
      logins.toDF().toDF("user_id", "ts"),
      errors.toDF().toDF("user_id", "ts"),
      "user_id", "ts", "30 minutes")
    val q = joined.writeStream.format("memory").queryName("corr_out")
      .outputMode("append").start()
    try {
      logins.addData((1L, ts(0)), (2L, ts(0)), (3L, ts(30)))
      errors.addData(
        (1L, ts(10)),  // within 30m after login -> pair
        (2L, ts(45)),  // 45m after login -> outside window
        (3L, ts(20)))  // BEFORE user 3's login -> strictly-after excludes
      q.processAllAvailable()
      val rows = spark.table("corr_out")
        .select("user_id", "ts_a", "ts_b").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(rows == Set((1L, ts(0), ts(10))), s"got $rows")
      // a second error for user 1 inside the window pairs with the SAME login
      errors.addData((1L, ts(25)))
      q.processAllAvailable()
      assert(spark.table("corr_out").count() == 2)
    } finally q.stop()
    // the same operator runs in batch mode (backtests share the definition)
    val batch = graft.streaming.Correlation.followedBy(
      Seq((1L, ts(0))).toDF("user_id", "ts"),
      Seq((1L, ts(10)), (1L, ts(50))).toDF("user_id", "ts"),
      "user_id", "ts", "30 minutes")
    assert(batch.count() == 1)
  }

  test("streaming sessionization: gap splits sessions, watermark closes them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(h: Int, min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = graft.streaming.Sessions.sessionize(
      input.toDF().toDF("user_id", "ts"), "user_id", "ts",
      gap = "30 minutes", watermark = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two bursts 2h apart (two sessions); user 2: one event
      input.addData((1L, ts(10, 0)), (1L, ts(10, 10)), (1L, ts(10, 20)),
        (1L, ts(12, 0)), (2L, ts(10, 5)))
      q.processAllAvailable()
      // advance the watermark far past every session close
      input.addData((9L, ts(20, 0)))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "session_start", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(rows == Set(
        (1L, ts(10, 0), 3L),   // burst 1: 3 events merged into one session
        (1L, ts(12, 0), 1L),   // burst 2 after a >30m gap: its own session
        (2L, ts(10, 5), 1L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming historical + dead-letter sinks land partitioned parquet") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_hist_stream").toString
    val input = MemoryStream[String]
    input.addData(
      """{"event_id":1,"etype":"error","value":150.0}""",
      "not even json")
    val pipeline = new Pipeline(Seq(schema), engine)
    val queries = pipeline.startHistorical(input.toDF(), s"$tmp/store", s"$tmp/ckpt",
      trigger = Some(Trigger.AvailableNow()))
    try queries.foreach(q => assert(q.awaitTermination(120000)))
    finally queries.foreach(_.stop())
    val stored = spark.read.parquet(s"$tmp/store/demo_events")
    assert(stored.count() == 1)
    assert(stored.columns.contains("dt"))
    val dead = spark.read.parquet(s"$tmp/store/__dead_letter")
    assert(dead.select("value").collect()(0).getString(0) == "not even json")
  }

  test("historical sink: dt partitioning + pruned read-back") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_hist").toString
    val alerts = engine.evaluate(
      new graft.classify.Classifier(Seq(schema))
        .classify(Seq(
          """{"event_id":1,"etype":"error","value":150.0}""",
          """{"event_id":2,"etype":"x","value":250.0}""").toDF("value"))
        .forType("demo:events"), "demo:events")
    HistoricalSink.write(alerts, tmp, "demo:events")
    val back = spark.read.parquet(s"$tmp/demo_events")
    assert(back.count() == 2)
    assert(back.where(col("dt") === "2024-01-01-00").count() == 2)
    // partition pruning visible in the plan
    val plan = back.where(col("dt") === "2024-01-01-00")
      .queryExecution.executedPlan.toString
    assert(back.schema.fieldNames.contains("dt"))
  }

  test("historical compaction: small files merge in place, rows and other partitions intact") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val rows = spark.range(2000).select(col("id"),
      (lit(java.sql.Timestamp.valueOf("2024-03-01 10:00:00")) +
        when(col("id") % 2 === 0, expr("INTERVAL 0 HOURS"))
          .otherwise(expr("INTERVAL 1 HOURS"))).as("created"))
    // 16 micro-batch-sized files per hour partition
    graft.history.HistoricalSink.write(
      rows.repartition(16), tmp, "demo:events")
    def filesIn(dt: String) = new java.io.File(s"$tmp/demo_events/dt=$dt")
      .listFiles().count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    val before10 = filesIn("2024-03-01-10")
    val before11 = filesIn("2024-03-01-11")
    assert(before10 >= 8, s"expected many small files, got $before10")
    val (was, now) = graft.history.HistoricalSink.compactPartition(
      spark, tmp, "demo:events", "2024-03-01-10")
    assert(was == before10 && now == 1, s"compacted $was -> $now")
    assert(filesIn("2024-03-01-10") == 1)
    assert(filesIn("2024-03-01-11") == before11, "untouched partition changed")
    val back = spark.read.parquet(s"$tmp/demo_events")
    assert(back.count() == 2000)
    assert(back.where(col("dt") === "2024-03-01-10")
      .agg(sum("id")).head.getLong(0) ==
      (0L until 2000L by 2).sum)
  }

  test("scheduled-query param substitution (8 named time params)") {
    val now = java.time.Instant.parse("2024-01-02T12:00:00Z")
    assert(ScheduledQueries.substitute(
      "SELECT * FROM t WHERE dt >= '{utcdatehour_minus1hour}'", now)
      == "SELECT * FROM t WHERE dt >= '2024-01-02-11'")
    assert(ScheduledQueries.substitute("{utctimestamp}", now) == "1704196800")
    assert(ScheduledQueries.substitute("{utcdatehour_minus7day}", now) == "2023-12-26-12")
    intercept[IllegalArgumentException] {
      ScheduledQueries.substitute("{bogus}", now)
    }
  }

  test("scheduled-query execution stats: bytes scanned reflect partition pruning") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_qstats").toString
    // two dt partitions in the historical store
    val rows = Seq(
      ("2024-01-01 00:10:00", "error", 1L), ("2024-01-01 00:20:00", "x", 2L),
      ("2024-01-01 01:10:00", "error", 3L), ("2024-01-01 01:30:00", "x", 4L))
      .toDF("created", "etype", "event_id")
      .withColumn("created", col("created").cast("timestamp"))
    HistoricalSink.write(rows, tmp, "demo:events")
    spark.read.parquet(s"$tmp/demo_events").createOrReplaceTempView("qstats_events")
    val now = java.time.Instant.parse("2024-01-01T01:45:00Z")

    val (fullRows, fullStats) = ScheduledQueries.runWithStats(spark,
      "SELECT event_id FROM qstats_events", now)
    val (prunedRows, prunedStats) = ScheduledQueries.runWithStats(spark,
      "SELECT event_id FROM qstats_events WHERE dt = '{utcdatehour}'", now)

    assert(fullRows.size == 4 && prunedRows.size == 2)
    assert(fullStats.rowsReturned == 4 && prunedStats.rowsReturned == 2)
    // the athena.py:160-166 analogue: non-zero scan + timing stats
    assert(fullStats.dataScannedBytes > 0 && fullStats.wallTimeMs >= 0)
    assert(fullStats.filesRead >= 2) // one file per dt partition at least
    // pruning visible in the stat users watch: fewer bytes than a full scan
    assert(prunedStats.dataScannedBytes > 0)
    assert(prunedStats.dataScannedBytes < fullStats.dataScannedBytes)
    assert(prunedStats.filesRead < fullStats.filesRead)
  }

  test("scheduled-query results above the driver cap fail loudly") {
    // query-pack results are driver-collected for re-injection; a mistyped
    // unbounded SELECT must throw, not OOM the driver
    spark.range(50).toDF("id").createOrReplaceTempView("qcap_events")
    val now = java.time.Instant.parse("2024-01-01T01:45:00Z")
    val e = intercept[IllegalStateException] {
      ScheduledQueries.runWithStats(spark,
        "SELECT id FROM qcap_events", now, maxRows = 10)
    }
    assert(e.getMessage.contains("more than 10 rows"))
    // in-bounds results are untouched by the probe
    val (rows, stats) = ScheduledQueries.runWithStats(spark,
      "SELECT id FROM qcap_events", now, maxRows = 100)
    assert(rows.size == 50 && stats.rowsReturned == 50)
  }

  test("scheduled-query executions dedup while in flight (skip-if-running)") {
    // query_packs/manager.py:137-158: start_query is a no-op when the pack
    // already has an execution id — overlapping schedules never double-run.
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val mgr = new ScheduledQueries.ExecutionManager(spark, (_, _) => {
      started.incrementAndGet()
      gate.await(30, java.util.concurrent.TimeUnit.SECONDS)
      Seq.empty
    })
    val now = java.time.Instant.parse("2024-01-01T05:00:00Z")
    val h1 = mgr.start("pack_a", "SELECT '{utcdatehour}'", now)
    val h2 = mgr.start("pack_a", "SELECT '{utcdatehour}'", now) // identical, in flight
    assert(h2.executionId == h1.executionId) // second run returns the first's handle
    // a DIFFERENT resolved-parameter window is a genuinely new execution
    val h3 = mgr.start("pack_a", "SELECT '{utcdatehour}'",
      java.time.Instant.parse("2024-01-01T06:00:00Z"))
    assert(h3.executionId != h1.executionId)
    assert(mgr.inFlightCount == 2)
    gate.countDown()
    scala.concurrent.Await.result(h1.result, 30.seconds)
    scala.concurrent.Await.result(h3.result, 30.seconds)
    // both finished and evicted: an identical re-run starts FRESH
    org.scalatest.concurrent.Eventually.eventually(
      org.scalatest.concurrent.Eventually.timeout(
        org.scalatest.time.Span(10, org.scalatest.time.Seconds))) {
      assert(mgr.inFlightCount == 0)
    }
    val h4 = mgr.start("pack_a", "SELECT '{utcdatehour}'", now)
    assert(h4.executionId != h1.executionId)
    scala.concurrent.Await.result(h4.result, 30.seconds)
    assert(started.get() == 3) // h1, h3, h4 ran; the deduped h2 never did
  }

  test("streamquery re-injection: results classify back through the pipeline") {
    val result = Seq(("error", 42L)).toDF("etype", "n")
    val wrapped = ScheduledQueries.asStreamQueryRecords(result, "hourly_errors")
    val sqSchema = LogSchema(
      name = "streamquery:version1", parser = ParserKind.Json,
      schema = TStruct.of("streamquery_name" -> TString,
        "streamquery_version" -> TString, "data" -> TString))
    val typed = new graft.classify.Classifier(Seq(sqSchema))
      .classify(wrapped, "value").forType("streamquery:version1")
    val row = typed.select(
      col("record.streamquery_name"),
      get_json_object(col("record.data"), "$.etype"),
      get_json_object(col("record.data"), "$.n").cast("long")).collect()(0)
    assert(row.getString(0) == "hourly_errors")
    assert(row.getString(1) == "error" && row.getLong(2) == 42L)
  }

  test("rule promotion statistics + promote") {
    val alerts = Seq(
      ("staged_a", "2024-01-01-05"), ("staged_a", "2024-01-01-07"),
      ("staged_b", "2024-01-01-02"), ("other", "2024-01-01-09"))
      .toDF("rule_name", "dt")
    val stats = RulePromotion.stagingStatistics(alerts,
      Map("staged_a" -> "2024-01-01-00", "staged_b" -> "2024-01-01-03"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("staged_a" -> 2L)) // staged_b's alert predates staging
    val table = Seq(("staged_a", true), ("staged_b", true)).toDF("rule_name", "staged")
    val promoted = RulePromotion.promote(table, Seq("staged_a"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(promoted == Map("staged_a" -> false, "staged_b" -> true))
  }

  test("promotion pass: quiet rule past its window promotes, noisy rule stays") {
    // promoter.py:109-142: staged + window elapsed + zero alerts => promote
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val table = Seq(
      ("quiet_done", true, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      ("noisy_done", true, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      ("quiet_early", true, ts("2024-01-04 00:00:00"), ts("2024-01-09 00:00:00")),
      ("live", false, null, null))
      .toDF("rule_name", "staged", "staged_at", "staged_until")
    val alerts = Seq(("noisy_done", "2024-01-02-05"), ("live", "2024-01-02-06"))
      .toDF("rule_name", "dt")
    val now = ts("2024-01-05 12:30:00")
    val (updated, promoted, digest) =
      RulePromotion.promotionPass(table, alerts, now)
    assert(promoted == Seq("quiet_done")) // others: noisy / window still open
    val stagedNow = updated.collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(stagedNow == Map("quiet_done" -> false, "noisy_done" -> true,
      "quiet_early" -> true, "live" -> false))
    // digest: noisy (count 1) sorts first; past/remaining labels + deltas
    val blocks = digest.split("\n\n")
    assert(blocks.length == 3)
    assert(blocks(0).startsWith("◦ noisy_done") &&
      blocks(0).contains("Alert Count:\t\t\t\t\t1") &&
      blocks(0).contains("Time Past Staging:") &&
      blocks(0).contains("2d 12h 30m"))
    assert(blocks(1).startsWith("◦ quiet_done")) // count 0, name tiebreak
    assert(blocks(2).startsWith("◦ quiet_early") &&
      blocks(2).contains("Remaining Stage Time:") &&
      blocks(2).contains("3d 11h 30m"))
    assert(RulePromotion.formatDigest(Nil, now) ==
      "No currently staged rules to report on")
  }

  test("athena partitioner: keys parse to the reference's ALTER statements") {
    import graft.history.AthenaPartitioner
    // json layout: alerts/dt=... vs [data-type]/YYYY/MM/DD/HH
    val jsonKeys = Seq(
      ("alerts-bkt", "alerts/dt=2018-08-01-01/run.json"),
      ("data-bkt", "cloudwatch_events/2018/08/01/02/file.gz"),
      ("data-bkt", "cloudwatch_events/2018/08/01/02/file2.gz"), // same partition
      ("data-bkt", "osquery_results/2018/08/01/03/file.gz"),
      ("data-bkt", "not/a/partition/key.txt"),                  // skipped
      ("unknown-bkt", "cloudwatch_events/2018/08/01/04/x.gz"))  // unconfigured
    val parts = AthenaPartitioner.partitionsFromKeys(
      jsonKeys, Set("alerts-bkt", "data-bkt"), fileFormat = "json")
    assert(parts("alerts") ==
      Map("(dt = '2018-08-01-01')" -> "'s3://alerts-bkt/alerts/dt=2018-08-01-01'"))
    assert(parts("cloudwatch_events") ==
      Map("(dt = '2018-08-01-02')" -> "'s3://data-bkt/cloudwatch_events/2018/08/01/02'"))
    val stmts = AthenaPartitioner.addPartitionStatements(parts)
    assert(stmts.contains(
      "ALTER TABLE alerts ADD IF NOT EXISTS PARTITION (dt = '2018-08-01-01') " +
        "LOCATION 's3://alerts-bkt/alerts/dt=2018-08-01-01';"))
    assert(stmts.contains(
      "ALTER TABLE osquery_results ADD IF NOT EXISTS " +
        "PARTITION (dt = '2018-08-01-03') " +
        "LOCATION 's3://data-bkt/osquery_results/2018/08/01/03';"))
    // parquet layout: parquet/[data-type]/dt=... and alerts/dt=...parquet
    val pq = AthenaPartitioner.partitionsFromKeys(Seq(
      ("data-bkt", "parquet/cloudtrail/dt=2020-01-02-03/part-0.parquet"),
      ("alerts-bkt", "alerts/dt=2020-01-02-04/part-0.parquet")),
      Set("alerts-bkt", "data-bkt"), fileFormat = "parquet")
    assert(pq("cloudtrail") ==
      Map("(dt = '2020-01-02-03')" ->
        "'s3://data-bkt/parquet/cloudtrail/dt=2020-01-02-03'"))
    assert(pq("alerts") ==
      Map("(dt = '2020-01-02-04')" -> "'s3://alerts-bkt/alerts/dt=2020-01-02-04'"))
  }

  test("firehose stream-name generation matches the reference algorithm") {
    import graft.history.HistoricalSink.firehoseStreamName
    // expected values computed with the reference's generate_firehose_name
    // (firehose.py:305-336) on these inputs
    assert(firehoseStreamName("prod", "cloudwatch:events")
      == "prod_streamalert_cloudwatch_events")
    assert(firehoseStreamName("", "osquery:differential")
      == "streamalert_osquery_differential")
    assert(firehoseStreamName("myverylongcompanyprefix",
      "carbonblack:ingress.event.procstart.extremely.long")
      == "myverylongcompanyprefix_streamalert_carbonblack_ingress_74d3b3de")
    assert(firehoseStreamName("x" * 40, "a_b")
      == "x" * 40 + "_streamalert_a_b")
  }

  test("publishers chain + file output dispatch") {
    val alerts = engine.evaluate(
      new graft.classify.Classifier(Seq(schema))
        .classify(Seq("""{"event_id":1,"etype":"error","value":150.0}""").toDF("value"))
        .forType("demo:events"), "demo:events")
      .withColumn("staged", lit(false))
    val published = Publishers.publish(alerts, Seq("strip_record", "remove_internal_fields"))
    val pubJson = published.select("publication").as[String].collect()(0)
    assert(!pubJson.contains("\"record\"")) // stripped from the publication
    assert(published.columns.contains("record")) // ...but kept for dispatch bookkeeping
    assert(pubJson.contains("\"rule_name\":\"big\""))
    assert(!pubJson.contains("\"staged\""))
    val tmp = java.nio.file.Files.createTempDirectory("graft_out").toString
    Outputs.fanOut(alerts, Map("aws-firehose" -> Outputs.FileDispatcher(tmp)))
    assert(spark.read.parquet(s"$tmp/alerts").count() == 1)
    // redelivery through the REAL dispatcher path: the sink-dir ledger
    // anti-join gates the second fan-out, count stays exactly 1
    Outputs.fanOut(alerts, Map("aws-firehose" -> Outputs.FileDispatcher(tmp)))
    assert(spark.read.parquet(s"$tmp/alerts").count() == 1)
    // webhook-shaped dispatcher receives (descriptor, publication) pairs
    val sent = scala.collection.mutable.Buffer[(String, String)]()
    Outputs.fanOut(
      alerts.withColumn("outputs", array(lit("slack:sec-chan"))),
      Map("slack" -> Outputs.WebhookDispatcher((d, p) => sent += (d -> p))))
    assert(sent.size == 1 && sent.head._1 == "sec-chan")
    assert(sent.head._2.contains("\"rule_name\":\"big\""))
  }

  test("fan-out applies each rule's declared publisher chain per output") {
    // rules_engine.py:326-408: two rules share one output but declare
    // different publisher chains — each alert's payload must be shaped by
    // ITS rule's chain, with undeclared rules falling back to the default
    val rules = Seq(
      graft.rules.Rule("stripped", graft.rules.RuleOpts(
        logs = Seq("demo:events"),
        outputs = Seq("slack:chan"),
        publishersByOutput = Map("slack" -> Seq("record_only"))),
        rec => rec.getField("event_id") === 1),
      graft.rules.Rule("fallback", graft.rules.RuleOpts(
        logs = Seq("demo:events"),
        outputs = Seq("slack:chan")),
        rec => rec.getField("event_id") === 2))
    val eng = new graft.rules.RulesEngine(rules, deterministicIds = true)
    val alerts = eng.evaluate(
      new graft.classify.Classifier(Seq(schema)).classify(Seq(
        """{"event_id":1,"etype":"error","value":1.0}""",
        """{"event_id":2,"etype":"error","value":2.0}""").toDF("value"))
        .forType("demo:events"), "demo:events")
      .withColumn("staged", lit(false))
      .withColumn("outputs", array(lit("slack:chan")))
    val sent = scala.collection.mutable.Buffer[(String, String)]()
    Outputs.fanOut(alerts,
      Map("slack" -> Outputs.WebhookDispatcher((d, p) => sent += (d -> p))),
      ruleChains = eng.publisherAssignments)
    assert(sent.size == 2)
    val byRule = sent.map(_._2).partition(_.contains("\"rule_name\":\"fallback\""))
    // the fallback rule's payload is the default full-alert publication
    assert(byRule._1.size == 1 && byRule._1.head.contains("\"rule_name\""))
    // the declared rule's payload went through record_only: bare record
    assert(byRule._2.size == 1 &&
      byRule._2.head.startsWith("{\"record\":") &&
      !byRule._2.head.contains("\"rule_name\""))
  }

  test("lookup-table TTL cache reloads only after cache_refresh_minutes") {
    // driver_s3.py:47-121: the doc is fetched once, served from cache
    // until the TTL lapses, then re-fetched — a rule sees the new value
    // only on the first batch after expiry
    var fetches = 0
    var doc = """{"k": "v1"}"""
    var nowMs = 0L
    val t = new RefreshingMapLookupTable(
      () => { fetches += 1; doc }, cacheRefreshMinutes = 10, clock = () => nowMs)
    def lookup(): String = Seq("k").toDF("key")
      .select(t.get(col("key"), lit("miss")).as("v")).as[String].collect()(0)
    assert(lookup() == "v1" && fetches == 1)
    doc = """{"k": "v2"}"""
    nowMs = 9 * 60000L
    assert(lookup() == "v1" && fetches == 1) // inside TTL: cached copy
    nowMs = 10 * 60000L
    assert(lookup() == "v2" && fetches == 2) // TTL lapsed: re-fetched
  }

  test("threat-intel refresh: IOC staged between batches matches at N+1") {
    // SURVEY §7.5's flagged risk: the reference's downloader Lambda
    // refreshes the IOC table OUT-OF-BAND while the rules engine queries
    // it live. Engine shape: RefreshingThreatIntel re-reads the staged
    // parquet per micro-batch inside foreachBatch — the same ip misses in
    // batch N and matches in batch N+1 after the table is overwritten,
    // with the stream never restarting.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_ti").toString
    val iocPath = s"$tmp/ioc"
    val outPath = s"$tmp/matches"
    // batch-N table: some other ip is malicious
    Seq(("10.9.9.9", "ip")).toDF("ioc_value", "sub_type")
      .write.mode("overwrite").parquet(iocPath)

    val ipSchema = LogSchema(
      name = "demo:json_ioc", parser = ParserKind.Json,
      schema = TStruct.of("event_id" -> TInteger, "ip" -> TString))
    val classifier = new graft.classify.Classifier(Seq(ipSchema))
    val ti = new RefreshingThreatIntel(iocPath, Map("sourceAddress" -> "ip"))
    import graft.classify.Normalizer
    def annotateBatch(batch: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val typed = classifier.classify(batch).forType("demo:json_ioc")
        .withColumn(Normalizer.NormalizationKey,
          Normalizer.normalizationCol(col("record"),
            Map("sourceAddress" -> Seq(NormalizedField(path = Seq("ip")))),
            Some(ipSchema.schema)))
        .withColumn(Normalizer.RecordIdKey,
          Normalizer.recordIdCol(col(Normalizer.NormalizationKey),
            deterministicFrom = Some(col("record.event_id"))))
      ti.annotate(typed) // <- re-reads the staged IOC table THIS batch
        .where(size(map_keys(col(ti.IocKey))) > 0)
        .select(col("record.event_id").as("event_id"), col("record.ip").as("ip"))
    }

    val input = MemoryStream[String]
    val q = input.toDF().writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        annotateBatch(batch).write.mode("append").parquet(outPath)
        ()
      }.start()
    try {
      input.addData("""{"event_id":1,"ip":"10.0.0.1"}""")
      q.processAllAvailable()
      // batch N: 10.0.0.1 not yet an IOC -> no match landed
      assert(spark.read.parquet(outPath).count() == 0)
      // downloader-equivalent refresh between batches
      Seq(("10.9.9.9", "ip"), ("10.0.0.1", "ip")).toDF("ioc_value", "sub_type")
        .write.mode("overwrite").parquet(iocPath)
      input.addData("""{"event_id":2,"ip":"10.0.0.1"}""")
      q.processAllAvailable()
      val got = spark.read.parquet(outPath)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == Seq((2L, "10.0.0.1"))) // N+1 matches, N still absent
    } finally q.stop()
  }

  test("webhook dispatch streams partitions, never whole-batch collects") {
    // A rule misfire can make EVERY record an alert; the dispatcher must
    // bound driver memory to one partition (toLocalIterator), not the
    // whole batch. 200k publications across 32 partitions — far more rows
    // than any alert batch should hold — all delivered, exactly once.
    val big = spark.range(200000).toDF("id")
      .repartition(32)
      .select(concat(lit("""{"alert_id":"""), col("id"), lit("}"))
        .as("publication"))
    var n = 0L
    var sample: String = null
    Outputs.WebhookDispatcher { (_, pub) =>
      n += 1; if (sample == null) sample = pub
    }.dispatch(big, "chan")
    assert(n == 200000L)
    assert(sample.startsWith("""{"alert_id":"""))
  }

  test("attempt ledger: transient failure leaves a retryable row, retry clears it") {
    val alerts = engine.evaluate(
      new graft.classify.Classifier(Seq(schema))
        .classify(Seq("""{"event_id":9,"etype":"error","value":200.0}""").toDF("value"))
        .forType("demo:events"), "demo:events")
      .withColumn("staged", lit(false))
      .withColumn("outputs", array(lit("slack:sec-chan")))
    val ledger = Outputs.AttemptLedger(
      java.nio.file.Files.createTempDirectory("graft_attempts").toString + "/ledger")
    val delivered = scala.collection.mutable.Buffer[String]()
    var failNext = true
    val flaky = Outputs.WebhookDispatcher { (_, pub) =>
      if (failNext) sys.error("transient 500")
      delivered += pub
    }
    val clock = Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))

    // attempt 1: dispatcher throws; fan-out survives and records the failure
    val r1 = Outputs.fanOutTracked(alerts, Map("slack" -> flaky), ledger, clock = clock)
    assert(r1 == Map("slack:sec-chan" -> false))
    val st1 = ledger.state(spark).collect()
    assert(st1.length == 1 && st1(0).getAs[Long]("attempts") == 1
      && !st1(0).getAs[Boolean]("sent"))
    assert(ledger.retryable(spark).count() == 1)

    // attempt 2: retried (attempts=2), success marks sent
    failNext = false
    val r2 = Outputs.fanOutTracked(alerts, Map("slack" -> flaky), ledger, clock = clock)
    assert(r2 == Map("slack:sec-chan" -> true))
    val st2 = ledger.state(spark).collect()
    assert(st2.length == 1 && st2(0).getAs[Long]("attempts") == 2
      && st2(0).getAs[Boolean]("sent"))
    assert(delivered.size == 1)
    assert(ledger.retryable(spark).count() == 0)

    // attempt 3: already sent — dispatcher not invoked, attempts unchanged
    failNext = true // would throw if the gate ever re-dispatched
    val r3 = Outputs.fanOutTracked(alerts, Map("slack" -> flaky), ledger, clock = clock)
    assert(r3 == Map("slack:sec-chan" -> true))
    assert(ledger.state(spark).collect()(0).getAs[Long]("attempts") == 2)
    assert(delivered.size == 1)
  }

  test("json.dumps(indent=2) renderer: nulls, empty containers, escapes") {
    // edge shapes the a5d oracle's fixed record doesn't reach
    val df = Seq((Option.empty[String], Seq.empty[String], 1L))
      .toDF("s", "xs", "n")
      .select(struct(col("s"), col("xs"), col("n")).as("v"))
    val out = df.select(Publishers.jsonDumpsIndent2(
      col("v"), df.schema("v").dataType, 0).as("j")).as[String].collect()(0)
    assert(out ==
      "{\n  \"n\": 1,\n  \"s\": null,\n  \"xs\": []\n}") // sorted keys, inline []
    val esc = Seq("a\"b\\c\nd").toDF("s").select(struct(col("s")).as("v"))
    val out2 = esc.select(Publishers.jsonDumpsIndent2(
      col("v"), esc.schema("v").dataType, 0).as("j")).as[String].collect()(0)
    assert(out2 == "{\n  \"s\": \"a\\\"b\\\\c\\nd\"\n}") // JSON escapes intact
  }

  test("rule description parser matches the reference on its documented shapes") {
    // expectations generated by running the reference's
    // RuleDescriptionParser.present on the same inputs (description.py
    // docstring examples + a preamble/maintainer/empty-field case)
    def present(desc: String): (String, String, Seq[(String, String)]) = {
      val df = Seq(desc).toDF("d")
        .select(Publishers.presentRuleDescription(col("d")).as("p"))
      val r = df.select(col("p.author"), col("p.description"), col("p.fields"))
        .collect()(0)
      (r.getString(0), r.getString(1),
        r.getSeq[org.apache.spark.sql.Row](2).map(f =>
          f.getString(0) -> f.getString(1)))
    }

    val (a1, d1, f1) = present(
      "author:  Derek\ndescription: Blah lorem ipsum\n             bacon bleu cheese\nplaybook: etc")
    assert(a1 == "Derek")
    assert(d1 == "Blah lorem ipsum bacon bleu cheese") // continuation joins with ' '
    assert(f1 == Seq("Playbook" -> "etc"))

    // long URL continuation lines smush with NO separator
    val (_, _, f2) = present(
      "author: Derek\nreference: https://this.is.a.really.really/long/url\n     ?that=does+not+fit#smushed")
    assert(f2 == Seq("Reference" ->
      "https://this.is.a.really.really/long/url?that=does+not+fit#smushed"))

    // a blank line buffers a newline as the joiner (paragraph break)
    val (_, d3, _) = present(
      "description:\n    This is paragraph 1 and remains unbroken despite having\n" +
        "    a linebreak in the middle of it.\n\n" +
        "    However, this paragraph 2 is broken from paragraph 1 because\n" +
        "    it has a double break in between.")
    assert(d3 == "This is paragraph 1 and remains unbroken despite having " +
      "a linebreak in the middle of it.\nHowever, this paragraph 2 is broken " +
      "from paragraph 1 because it has a double break in between.")

    // free preamble lands in description; maintainer aliases author; a
    // field with no lines still presents (empty value)
    val (a4, d4, f4) = present(
      "Free preamble before fields\n\nmaintainer: Ops Team\nnote:")
    assert(a4 == "Ops Team")
    assert(d4 == "Free preamble before fields")
    assert(f4 == Seq("Note" -> ""))
  }

  test("jsonPrettyText re-formats compact JSON like json.dumps(indent=2)") {
    // expectation generated by json.dumps(..., indent=2,
    // separators=(',', ': ')) on the same document; structural chars
    // inside string literals must pass through untouched
    val compact =
      """{"a":{"b":[1,2],"c":{}},"d":[],"s":"x:y{z},[w]","e":"q\"t"}"""
    val out = Seq(compact).toDF("j")
      .select(Publishers.jsonPrettyText(col("j"), 0).as("p"))
      .as[String].collect()(0)
    val expected =
      "{\n  \"a\": {\n    \"b\": [\n      1,\n      2\n    ],\n    \"c\": {}\n  }," +
        "\n  \"d\": [],\n  \"s\": \"x:y{z},[w]\",\n  \"e\": \"q\\\"t\"\n}"
    assert(out == expected)
  }

  test("elide_string_middle matches the reference on both branches") {
    // helpers.py:19-33: <= max passes through; longer keeps half_len from
    // each end around ' ... '
    val out = Seq(("short", "abcdefghijklmnopqrstuvwxyz"))
      .toDF("a", "b")
      .select(
        Publishers.elideStringMiddle(col("a"), 10).as("s"),
        Publishers.elideStringMiddle(col("b"), 10).as("l"))
      .collect()(0)
    assert(out.getString(0) == "short")
    assert(out.getString(1) == "ab ... yz") // half_len = (10-5)//2 = 2
  }

  test("slack attachment text splits exactly like the reference chunker") {
    import org.apache.spark.sql.functions._
    def split(text: String, max: Int): Seq[String] =
      Seq(text).toDF("t")
        .select(Publishers.slackSplitText(col("t"), max, maxParts = 6).as("p"))
        .as[Seq[String]].collect()(0)
    // prefers the last newline in the first max+1 chars, else last space
    assert(split("abcde fghij\nklmno pqrst", 10)
      == Seq("abcde", "fghij", "klmno", "pqrst"))
    // hard split at max when no break char exists (the reference then
    // skips one char — slack.py:98-102 faithful)
    assert(split("abcdefghijklmno", 10) == Seq("abcdefghij", "lmno"))
    // fits in one part
    assert(split("short", 10) == Seq("short"))
  }
}
