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
}
