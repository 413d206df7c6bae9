package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Behavior
import graft.pipeline.Eval

/** Chat-template rendering offsets and calibration-report math on
  * hand-computed fixtures. */
class ChatTemplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("renderChatTemplate: exact text, offsets, and loss-mask spans") {
    val events = Seq(
      (1L, ts(10), 1L, "user", "hi"),
      (1L, ts(20), 2L, "assistant", "yo"),
      (2L, ts(10), 3L, "user", "alone"))
      .toDF("conv_id", "ts", "event_id", "role", "content")
    val out = Behavior.renderChatTemplate(events, "conv_id", "ts",
      col("role"), col("content"), "event_id").orderBy("conv_id").collect()
    val c1 = out(0)
    // "<|user|>\nhi<|end|>\n" = 19 chars; assistant part = 24 chars
    assert(c1.getLong(1) == 2 && c1.getLong(2) == 43)
    assert(c1.getString(3) ==
      "<|user|>\nhi<|end|>\n<|assistant|>\nyo<|end|>\n")
    // assistant span: content starts 19 + len("assistant") + 5 = 33
    assert(c1.getString(4) == "33:43")
    assert(c1.getLong(5) == 10) // "yo<|end|>\n"
    val c2 = out(1)
    assert(c2.getLong(1) == 1 && c2.isNullAt(4) && c2.getLong(5) == 0)
  }

  test("renderChatTemplate: ordering by (ts, tie) and multiple spans") {
    // same ts -> tie-break by event_id; two assistant turns -> two spans
    val events = Seq(
      (1L, ts(10), 2L, "assistant", "b"),
      (1L, ts(10), 1L, "user", "a"),
      (1L, ts(20), 3L, "assistant", "c"))
      .toDF("conv_id", "ts", "event_id", "role", "content")
    val r = Behavior.renderChatTemplate(events, "conv_id", "ts",
      col("role"), col("content"), "event_id").collect()(0)
    // parts: user 18, assistant 23, assistant 23
    assert(r.getString(3) ==
      "<|user|>\na<|end|>\n<|assistant|>\nb<|end|>\n<|assistant|>\nc<|end|>\n")
    assert(r.getString(4) == "32:41;55:64")
    assert(r.getLong(5) == 18)
  }

  test("renderChatTemplate: spans slice real corpus renders exactly") {
    // over real events: every span must be in-bounds, ascending,
    // non-overlapping, and extracting [cs, en) must yield exactly an
    // assistant turn's content + end marker — the property a trainer's
    // loss mask depends on
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val out = Behavior.renderChatTemplate(events, "user_id", "ts",
      when(col("event_type").isin("purchase", "signup"), "user")
        .otherwise("assistant"),
      concat(col("event_type"), lit("#"), col("event_id").cast("string")),
      "event_id").collect()
    assert(out.nonEmpty)
    var checked = 0
    out.foreach { r =>
      val (text, spans) = (r.getString(3), r.getString(4))
      assert(text.length == r.getLong(2))
      if (!r.isNullAt(4)) {
        var prevEnd = -1L
        spans.split(";").foreach { s =>
          val Array(cs, en) = s.split(":").map(_.toLong)
          assert(cs > prevEnd && cs < en && en <= text.length,
            s"bad span $s in ${r.get(0)}")
          val sliced = text.substring(cs.toInt, en.toInt)
          assert(sliced.endsWith("<|end|>\n") && !sliced.contains("<|assistant|>"),
            s"span $s slices mid-turn: '$sliced'")
          // walking back 14 chars must land on the assistant header
          assert(text.substring(cs.toInt - 14, cs.toInt) == "<|assistant|>\n")
          prevEnd = en
          checked += 1
        }
      }
    }
    assert(checked > 10, s"only $checked spans exercised")
  }

  test("calibrationReport: bin math, clamp at 1.0, and ECE") {
    val scored = Seq(
      (0.0, 0), (0.25, 1), (0.25, 0), (1.0, 1))
      .toDF("conf", "y")
    val out = Eval.calibrationReport(scored, "conf", "y", bins = 10)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 2L, 9L)) // 1.0 clamps
    val b2 = out(1)
    assert(b2.getLong(1) == 2 && b2.getDouble(2) == 0.25 &&
      b2.getDouble(3) == 0.5 && b2.getDouble(4) == 0.25)
    // ece = (1*0 + 2*250000 + 1*0) / 4 = 125000 micro on every row
    assert(out.forall(_.getDouble(5) == 0.125))
  }

  test("calibrationReport: double quantization happens before summing") {
    // 3 identical conf values whose double sum would be inexact
    val scored = Seq((0.1, 1), (0.1, 0), (0.1, 1)).toDF("conf", "y")
    val r = Eval.calibrationReport(scored, "conf", "y", bins = 10).collect()(0)
    assert(r.getLong(0) == 1 && r.getDouble(2) == 0.1)
    assert(r.getDouble(3) == 0.666667) // floor(2e6/3 + .5)
  }
}
