package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.alerts._

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)
  private def alert(id: String, created: String, rec: String,
      keys: String = "mk", window: Int = 60,
      outputs: Seq[String] = Seq("aws-firehose:alerts"), staged: Boolean = false) =
    MergeInputAlert(id, "r1", ts(created), rec, keys, window, outputs, staged)

  test("computeCommon matches the reference docstring example (alert.py:299-305)") {
    val a = MergeRecord.parse("""{"abc":123,"nested":{"A":1,"B":2}}""")
    val b = MergeRecord.parse("""{"abc":123,"def":456,"nested":{"A":1}}""")
    val common = MergeRecord.computeCommon(Seq(a, b))
    assert(MergeRecord.write(common) == """{"abc":123,"nested":{"A":1}}""")
  }

  test("computeDiff matches the reference docstring example (alert.py:349-355)") {
    val common = MergeRecord.parse("""{"abc":123,"nested":{"A":1}}""")
    val rec = MergeRecord.parse("""{"abc":123,"nested":{"A":1,"B":2}}""")
    assert(MergeRecord.write(MergeRecord.computeDiff(common, rec)) == """{"nested":{"B":2}}""")
  }

  test("cleanRecord strips keys at every level (alert.py:271-287)") {
    val rec = MergeRecord.parse("""{"mk":1,"keep":2,"nest":{"mk":3,"x":4}}""")
    assert(MergeRecord.write(MergeRecord.cleanRecord(rec, Set("mk")))
      == """{"keep":2,"nest":{"x":4}}""")
  }

  test("anchored window assignment + 50 cap") {
    // window anchored at oldest: alerts at t0, t0+30, t0+70 with 60-min window
    // -> [t0, t0+30], [t0+70]
    val group = Seq(
      alert("a", "2024-01-01 00:00:00", "{}"),
      alert("b", "2024-01-01 00:30:00", "{}"),
      alert("c", "2024-01-01 01:10:00", "{}"))
    val windows = AlertMerger.assignWindows(group)
    assert(windows.map(_.map(_.alert_id)) == Seq(Seq("a", "b"), Seq("c")))
    // cap: 120 same-time alerts -> 3 merged groups
    val many = (1 to 120).map(i => alert(f"x$i%03d", "2024-01-01 00:00:00", "{}"))
    assert(AlertMerger.assignWindows(many).map(_.size) == Seq(50, 50, 20))
  }

  test("mergeWindow computes the merged record surface (alert.py:382-433)") {
    val group = Seq(
      alert("a", "2024-01-01 00:00:00",
        """{"mk":"k1","user":"alice","detail":{"region":"us-east-1","n":1}}"""),
      alert("b", "2024-01-01 00:10:00",
        """{"mk":"k1","user":"alice","detail":{"region":"us-east-1","n":2}}""",
        outputs = Seq("slack:x"), staged = true))
    val m = AlertMerger.mergeWindow(group)
    assert(m.alert_count == 2)
    assert(m.alert_time_first == ts("2024-01-01 00:00:00"))
    assert(m.alert_time_last == ts("2024-01-01 00:10:00"))
    assert(m.merged_by_json == """{"mk":"k1"}""")
    // mk removed; user + detail.region common; n differs
    assert(m.other_common_keys_json == """{"user":"alice","detail":{"region":"us-east-1"}}""")
    assert(m.value_diffs_json.contains(""""detail":{"n":1}"""))
    assert(m.value_diffs_json.contains(""""detail":{"n":2}"""))
    assert(m.outputs == Seq("slack:x")) // most recent alert's outputs
    assert(m.staged)
  }

  test("batch merge groups by rule + merge-key values") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[MergeInputAlert]
    val alerts = spark.createDataset(Seq(
      alert("a", "2024-01-01 00:00:00", """{"mk":"g1","v":1}"""),
      alert("b", "2024-01-01 00:05:00", """{"mk":"g1","v":2}"""),
      alert("c", "2024-01-01 00:05:00", """{"mk":"g2","v":3}"""),
      alert("d", "2024-01-01 00:05:00", """{"v":9}""", keys = ""))) // merging disabled
    val merged = AlertMerger.mergeBatch(alerts).collect()
    assert(merged.length == 3)
    val byKey = merged.map(m => m.merge_keys -> m.alert_count).toMap
    assert(byKey("g1") == 2 && byKey("g2") == 1 && byKey("") == 1)
  }

  test("property: common symmetric; diff covers record minus common (seeded fuzz)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val scalarGen = Gen.oneOf(Gen.choose(0, 9).map(_.toString), Gen.oneOf("a", "b", "c"))
    val recGen: Gen[String] = for {
      n <- Gen.choose(1, 4)
      keys <- Gen.listOfN(n, Gen.oneOf("k1", "k2", "k3", "k4"))
      vals <- Gen.listOfN(n, scalarGen)
    } yield keys.distinct.zip(vals).map { case (k, v) => s""""$k":"$v"""" }
      .mkString("{", ",", "}")
    val params = Gen.Parameters.default
    (0 until 200).foreach { i =>
      val r1 = recGen.pureApply(params, Seed(i.toLong))
      val r2 = recGen.pureApply(params, Seed(i.toLong + 10000))
      val (n1, n2) = (MergeRecord.parse(r1), MergeRecord.parse(r2))
      // singleton identities
      assert(MergeRecord.computeCommon(Seq(n1)) == n1)
      assert(MergeRecord.computeDiff(n1, n1).size() == 0)
      val common = MergeRecord.computeCommon(Seq(n1, n2))
      assert(common == MergeRecord.computeCommon(Seq(n2, n1)))
      val d1 = MergeRecord.computeDiff(common, n1)
      import scala.jdk.CollectionConverters._
      n1.properties().asScala.foreach { e =>
        assert(common.has(e.getKey) || d1.has(e.getKey))
      }
    }
  }

  test("streaming merge via MemoryStream flushes closed windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[MergeInputAlert]
    val input = MemoryStream[MergeInputAlert]
    input.addData(
      alert("a", "2024-01-01 00:00:00", """{"mk":"g1","v":1}""", window = 1),
      alert("b", "2024-01-01 00:00:30", """{"mk":"g1","v":2}""", window = 1),
      alert("c", "2024-01-01 00:02:00", """{"mk":"g1","v":3}""", window = 1))
    // AvailableNow: process what's there, then stop — with ProcessingTime
    // timeouts the engine would otherwise keep running batches until the
    // 1-minute window timeout fires, stalling processAllAvailable
    val q = AlertMerger.mergeStream(input.toDS())
      .writeStream.format("memory").queryName("merged_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "streaming merge did not finish in 120s")
      // a+b share the anchored 1-min window; c is outside -> first window closed
      val closed = spark.sql("SELECT alert_count FROM merged_out").collect()
      assert(closed.map(_.getLong(0)).toSeq == Seq(2L))
    } finally q.stop()
  }

  test("transformWithState merge matches the GroupState engine's output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[MergeInputAlert]
    // the v2 state API requires the RocksDB provider; session-conf'd for
    // this query only, restored after (other specs use the default store)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[MergeInputAlert]
      input.addData(
        alert("a", "2024-01-01 00:00:00", """{"mk":"g1","v":1}""", window = 1),
        alert("b", "2024-01-01 00:00:30", """{"mk":"g1","v":2}""", window = 1),
        alert("c", "2024-01-01 00:02:00", """{"mk":"g1","v":3}""", window = 1),
        // merging disabled -> the stateless passthrough branch
        alert("d", "2024-01-01 00:00:10", """{"mk":"p","v":9}""", keys = "", window = 0))
      val q = AlertMerger.mergeStreamTws(input.toDS())
        .writeStream.format("memory").queryName("merged_tws_out")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try {
        assert(q.awaitTermination(120000), "tws merge did not finish in 120s")
        // a+b share the anchored 1-min window (closed by c's arrival);
        // d passes through unmerged as a singleton
        val rows = spark.sql(
          "SELECT alert_count, merge_keys FROM merged_tws_out ORDER BY alert_count")
          .collect()
        assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
        assert(rows(1).getString(1) == "g1")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState event-time timer flushes an open window with no new group data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[MergeInputAlert]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[MergeInputAlert]
      val q = AlertMerger.mergeStreamTws(input.toDS())
        .writeStream.format("memory").queryName("merged_tws_timer")
        .outputMode("append").start()
      try {
        // batch 1: one alert in a 1-min window for group g1
        input.addData(
          alert("a", "2024-01-01 00:00:00", """{"mk":"g1","v":1}""", window = 1))
        q.processAllAvailable()
        assert(spark.sql("SELECT * FROM merged_tws_timer").count() == 0,
          "window must stay open until the watermark passes its end")
        // batch 2: an alert for a DIFFERENT group far past g1's window end —
        // it advances the watermark; g1 flushes by TIMER, not by group data
        input.addData(
          alert("z", "2024-01-01 00:10:00", """{"mk":"g2","v":9}""", window = 1))
        q.processAllAvailable()
        // one more batch so the timer registered against the new watermark fires
        input.addData(
          alert("z2", "2024-01-01 00:20:00", """{"mk":"g2","v":10}""", window = 1))
        q.processAllAvailable()
        val flushed = spark.sql(
          "SELECT merge_keys, alert_count FROM merged_tws_timer WHERE merge_keys = 'g1'")
          .collect()
        assert(flushed.length == 1 && flushed(0).getLong(1) == 1L,
          "g1's singleton window must flush via the event-time timer")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("event-time merge EVICTS data later than the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[MergeInputAlert]
    val input = MemoryStream[MergeInputAlert]
    val q = AlertMerger.mergeStream(input.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("merged_evict")
      .outputMode("append").start()
    try {
      // batch 1: g1 opens its anchored 1-min window [00:00, 00:01]
      input.addData(
        alert("a", "2024-01-01 00:00:00", """{"mk":"g1","v":1}""", window = 1))
      q.processAllAvailable()
      // batch 2: a different group far ahead advances the watermark to 00:10
      input.addData(
        alert("z", "2024-01-01 00:10:00", """{"mk":"g2","v":9}""", window = 1))
      q.processAllAvailable()
      // batch 3: a LATE g1 alert (00:00:10, inside g1's window but behind
      // the 00:10 watermark) — the watermark contract evicts it BEFORE the
      // stateful operator; the same batch's watermark fires g1's timer
      input.addData(
        alert("late", "2024-01-01 00:00:10", """{"mk":"g1","v":2}""", window = 1))
      q.processAllAvailable()
      val g1 = spark.sql(
        "SELECT alert_count FROM merged_evict WHERE merge_keys = 'g1'").collect()
      assert(g1.length == 1 && g1(0).getLong(0) == 1L,
        "late alert behind the watermark must be evicted, not merged")
    } finally q.stop()
  }

  test("event-time merge KEEPS late data within the watermark delay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[MergeInputAlert]
    val input = MemoryStream[MergeInputAlert]
    // same arrival order as the eviction test, but a 15-minute allowed
    // lateness: the watermark after 00:10 is 23:55 of the PREVIOUS day, so
    // the 00:00:10 straggler is in-bounds and must join g1's open window
    val q = AlertMerger.mergeStream(input.toDS(), watermarkDelay = "15 minutes")
      .writeStream.format("memory").queryName("merged_keep_late")
      .outputMode("append").start()
    try {
      input.addData(
        alert("a", "2024-01-01 00:00:00", """{"mk":"g1","v":1}""", window = 1))
      q.processAllAvailable()
      input.addData(
        alert("z", "2024-01-01 00:10:00", """{"mk":"g2","v":9}""", window = 1))
      q.processAllAvailable()
      input.addData(
        alert("late", "2024-01-01 00:00:10", """{"mk":"g1","v":2}""", window = 1))
      q.processAllAvailable()
      // a later in-window-key alert OUTSIDE g1's anchored window closes it
      input.addData(
        alert("b", "2024-01-01 00:02:00", """{"mk":"g1","v":3}""", window = 1))
      q.processAllAvailable()
      val g1 = spark.sql(
        "SELECT alert_count FROM merged_keep_late WHERE merge_keys = 'g1'").collect()
      assert(g1.length == 1 && g1(0).getLong(0) == 2L,
        "straggler within the allowed lateness must merge into its window")
    } finally q.stop()
  }

  test("guardLegacyCheckpoint refuses to silently abandon an offset log") {
    import java.nio.file.Files
    val conf = new org.apache.hadoop.conf.Configuration()
    def mk(): String = Files.createTempDirectory("ckpt_guard").toString

    // fresh deployment: nothing anywhere -> fine
    AlertMerger.guardLegacyCheckpoint(mk(), conf)

    // legacy UNVERSIONED checkpoint at the root (pre-relocation layout):
    // starting v2 fresh would abandon its offset log -> must throw
    val legacyRoot = mk()
    Files.createDirectories(java.nio.file.Paths.get(legacyRoot, "offsets"))
    val e1 = intercept[IllegalStateException](
      AlertMerger.guardLegacyCheckpoint(legacyRoot, conf))
    assert(e1.getMessage.contains("offset log"))

    // legacy versioned dir below the current format version -> must throw
    val legacyV1 = mk()
    Files.createDirectories(
      java.nio.file.Paths.get(legacyV1, "merge-state-v1", "offsets"))
    intercept[IllegalStateException](
      AlertMerger.guardLegacyCheckpoint(legacyV1, conf))

    // migration already happened: current versioned dir has its own offset
    // log -> legacy dirs are ignored, start proceeds
    val migrated = legacyV1
    Files.createDirectories(java.nio.file.Paths.get(
      AlertMerger.versionedCheckpoint(migrated), "offsets"))
    AlertMerger.guardLegacyCheckpoint(migrated, conf)
  }
}
