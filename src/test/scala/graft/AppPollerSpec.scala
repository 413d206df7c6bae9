package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AppPollerRegistry

/** S4 app-poller connector: the MicroBatchStream's Offset is the poll
  * cursor, so restart-resume comes from the engine's offset log — the
  * Spark analogue of the reference apps' `_last_timestamp` checkpoint
  * (apps/app_base.py). */
class AppPollerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cursor offsets drain, checkpoint, and resume exactly-once") {
    val poller = new AppPollerRegistry.BufferPoller
    AppPollerRegistry.register("demo-app", poller)
    poller.append("""{"n":1}""", """{"n":2}""", """{"n":3}""")

    val ckpt = Files.createTempDirectory("apppoller_ckpt").toString
    val out = Files.createTempDirectory("apppoller_out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-app-poller")
        .option("app", "demo-app").option("partitions", "2").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "app-poller drain did not finish")
    }

    drain()
    val first = spark.read.parquet(out)
    assert(first.count() == 3)

    // the "API" accrues new events; a restart resumes from the committed
    // cursor — no replay, no gap
    poller.append("""{"n":4}""", """{"n":5}""")
    drain()
    val second = spark.read.parquet(out).collect()
    assert(second.length == 5)
    assert(second.map(_.getAs[Long]("poll_seq")).sorted.toSeq == (0L to 4L))
    assert(second.map(_.getAs[String]("value")).sorted.toSeq ==
      (1 to 5).map(n => s"""{"n":$n}""").sorted)
  }

  import graft.sources.{DuoStylePoller => DSP}
  import graft.sources.DuoStylePoller.InMemoryDuoApi

  test("duo-style poller pages through a backlog with the timestamp cursor") {
    val api = new InMemoryDuoApi(pageSize = 3)
    for (ts <- Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L))
      api.append(ts, s"""{"ts":$ts}""")
    val poller = new graft.sources.DuoStylePoller(api)
    assert(poller.latest() == 71L)
    val got = poller.fetch(0L, poller.latest()).toSeq
    assert(got == Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L).map(t => s"""{"ts":$t}"""))
    // page loop: two full pages + the final partial one
    assert(api.pageCalls.get() == 3)
    // replay after failure: the same cursor range re-fetches bit-for-bit
    assert(poller.fetch(0L, poller.latest()).toSeq == got)
    // mid-backlog advance: a crash after page one resumes from ts 31, not 0
    assert(poller.fetch(31L, poller.latest()).toSeq
      == Seq(40L, 50L, 60L, 70L).map(t => s"""{"ts":$t}"""))
  }

  test("duo-style poller reproduces the reference same-timestamp page-cut skip") {
    // duo.py:131+156: next mintime = last page item's ts + 1, so an event
    // sharing that ts but cut off by the page cap is skipped — reference
    // behavior, pinned deliberately
    val api = new InMemoryDuoApi(pageSize = 3)
    Seq(10L -> "a", 20L -> "b", 30L -> "c1", 30L -> "c2", 40L -> "d")
      .foreach { case (ts, r) => api.append(ts, r) }
    val poller = new graft.sources.DuoStylePoller(api)
    val got = poller.fetch(0L, poller.latest()).toSeq
    assert(got == Seq("a", "b", "c1", "d"), s"expected the c2 straggler skipped, got $got")
  }

  test("duo-style poller drains through the streaming source and resumes") {
    val api = new InMemoryDuoApi(pageSize = 2)
    for (ts <- 1L to 5L) api.append(ts * 100, s"""{"seq":$ts}""")
    AppPollerRegistry.register("duo-demo", new graft.sources.DuoStylePoller(api))

    val ckpt = Files.createTempDirectory("duo_ckpt").toString
    val out = Files.createTempDirectory("duo_out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-app-poller")
        .option("app", "duo-demo").option("partitions", "2").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "duo poller drain did not finish")
    }
    drain()
    assert(spark.read.parquet(out).count() == 5)
    // the API accrues more events; restart resumes from the committed
    // timestamp cursor — no replay, no gap
    for (ts <- 6L to 8L) api.append(ts * 100, s"""{"seq":$ts}""")
    drain()
    val vals = spark.read.parquet(out).collect().map(_.getAs[String]("value")).sorted
    assert(vals.toSeq == (1L to 8L).map(n => s"""{"seq":$n}""").sorted)
  }

  test("duo rate-limit schedule: every second poll sleeps 60s") {
    assert(Seq(1, 2, 3, 4).map(DSP.sleepSeconds) == Seq(0, 60, 0, 60))
  }

  import graft.sources.BoxStylePoller.InMemoryBoxApi

  test("box-style poller pages via the server-issued stream position") {
    val api = new InMemoryBoxApi(chunkLimit = 3)
    for (n <- 1 to 8) api.append(s"""{"n":$n}""")
    val poller = new graft.sources.BoxStylePoller(api)
    assert(poller.latest() == 8L)
    val got = poller.fetch(0L, 8L).toSeq
    assert(got == (1 to 8).map(n => s"""{"n":$n}"""))
    // 2 full chunks + the final partial one (more_to_poll = size >= limit)
    assert(api.pageCalls.get() == 3)
    // replay: the same offset range re-fetches bit-for-bit
    assert(poller.fetch(0L, 8L).toSeq == got)
  }

  test("box-style poller splits an offset range exactly at the boundary") {
    val api = new InMemoryBoxApi(chunkLimit = 3)
    for (n <- 1 to 8) api.append(s"""{"n":$n}""")
    val poller = new graft.sources.BoxStylePoller(api)
    // micro-batch 1 owns [0,5), batch 2 owns [5,8) — a chunk straddling
    // the boundary must be cut, no duplicate or gap across batches
    val first = poller.fetch(0L, 5L).toSeq
    val second = poller.fetch(5L, 8L).toSeq
    assert(first == (1 to 5).map(n => s"""{"n":$n}"""))
    assert(second == (6 to 8).map(n => s"""{"n":$n}"""))
  }

  test("box-style poller does not advance the cursor on an empty page") {
    // box.py:186-189 returns before next_stream_position is stored — an
    // empty response leaves the checkpoint where it was
    val api = new InMemoryBoxApi(chunkLimit = 3)
    val poller = new graft.sources.BoxStylePoller(api)
    assert(poller.fetch(0L, 5L).toSeq.isEmpty)
    assert(poller.latest() == 0L)
    api.append("""{"n":1}""")
    assert(poller.fetch(0L, poller.latest()).toSeq == Seq("""{"n":1}"""))
  }

  import graft.sources.LinkCursorPoller
  import graft.sources.LinkCursorPoller.InMemoryLinkApi

  test("link-cursor poller renumbers opaque token chains densely") {
    val api = new InMemoryLinkApi(pageSize = 2)
    for (n <- 1 to 5) api.append(s"""{"n":$n}""")
    val poller = new LinkCursorPoller(api)
    assert(poller.latest() == 5L) // 3 pages followed (2+2+1)
    assert(poller.fetch(0L, 5L).toSeq == (1 to 5).map(n => s"""{"n":$n}"""))
    // replay: same range, same records, NO token re-walk (buffer serves it)
    val calls = api.pageCalls.get()
    assert(poller.fetch(2L, 4L).toSeq == Seq("""{"n":3}""", """{"n":4}"""))
    assert(api.pageCalls.get() == calls)
    // resume after a drained chain: the last token is re-requested and
    // already-shipped records are skipped — no duplicate, no gap
    for (n <- 6 to 8) api.append(s"""{"n":$n}""")
    assert(poller.latest() == 8L)
    assert(poller.fetch(5L, 8L).toSeq == (6 to 8).map(n => s"""{"n":$n}"""))
    // prune on commit: buffered records below the offset are released
    poller.prune(6L)
    assert(poller.buffered == 2)
    assert(poller.fetch(6L, 8L).toSeq == (7 to 8).map(n => s"""{"n":$n}"""))
    intercept[IllegalArgumentException](poller.fetch(5L, 8L))
  }

  test("link-cursor poller drains through the streaming source; commit prunes") {
    val api = new InMemoryLinkApi(pageSize = 3)
    for (n <- 1 to 7) api.append(s"""{"n":$n}""")
    val poller = new LinkCursorPoller(api)
    AppPollerRegistry.register("gsuite-demo", poller)
    val ckpt = Files.createTempDirectory("link_ckpt").toString
    val out = Files.createTempDirectory("link_out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-app-poller")
        .option("app", "gsuite-demo").option("partitions", "2").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "link poller drain did not finish")
    }
    drain()
    assert(spark.read.parquet(out).count() == 7)
    // Spark invokes source.commit for batch N when the NEXT run restores
    // it from the commit log, so the first run leaves its batch buffered
    assert(poller.buffered == 7)
    for (n <- 8 to 9) api.append(s"""{"n":$n}""")
    drain()
    val vals = spark.read.parquet(out).collect().map(_.getAs[String]("value")).sorted
    assert(vals.toSeq == (1 to 9).map(n => s"""{"n":$n}""").sorted)
    // restart committed batch 0 -> the first 7 pruned; batch 1's 2 remain
    assert(poller.buffered == 2, "commit must prune the delivered backlog")
    api.append("""{"n":10}""")
    drain() // restart commits batch 1 (prunes its 2), then ships n=10
    assert(spark.read.parquet(out).count() == 10)
    assert(poller.buffered == 1,
      "steady state buffers ONE trigger's backlog, not the stream history")
  }

  test("link-cursor poller bounds a cold-start drain to maxPagesPerPoll pages") {
    // a deep PRE-EXISTING token chain (cold start / resumed-after-stall)
    // must arrive over several triggers, not one unbounded driver buffer
    val api = new InMemoryLinkApi(pageSize = 2)
    for (n <- 1 to 20) api.append(s"""{"n":$n}""") // 10-page backlog
    val poller = new LinkCursorPoller(api, maxPagesPerPoll = 3)
    assert(poller.latest() == 6L, "first poll stops at the page cap")
    assert(poller.buffered == 6, "buffer growth per trigger is cap-bounded")
    assert(poller.fetch(0L, 6L).toSeq == (1 to 6).map(n => s"""{"n":$n}"""))
    // subsequent polls resume the chain where the cap cut it — no dup, no gap
    assert(poller.latest() == 12L)
    assert(poller.latest() == 18L)
    assert(poller.latest() == 20L)
    assert(poller.fetch(6L, 20L).toSeq == (7 to 20).map(n => s"""{"n":$n}"""))
  }
}
