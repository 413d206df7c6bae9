package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Edge classes of [[Multimodal.webmDuration]]'s EBML walk the oracled
  * fixture (mm_webm_duration) does not reach: multi-byte SIZE varints,
  * a non-default TimestampScale that rescales the same float, NaN /
  * negative Duration bits (must reject, not propagate), and a Duration
  * element of an off-spec size. */
class WebmProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def probe(hexBlobs: (Int, String)*): Map[Int, org.apache.spark.sql.Row] = {
    import spark.implicits._
    val df = hexBlobs.toSeq.toDF("id", "hx")
      .select(col("id"), unhex(col("hx")).as("blob"))
    Multimodal.webmDuration(df, "blob", "id")
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("multi-byte size varints, rescaling, NaN/negative/odd-size rejection") {
    // f64 bits of 1536.0: exp 1033, mantissa 0x8000000000000
    val f1536 = "4098000000000000"
    def seg(infoChildren: String, childBytes: Int): String = {
      val info = "1549A966" + f"${0x80 + childBytes}%02X" + infoChildren
      "18538067" + f"${0x80 + childBytes + 5}%02X" + info
    }
    val r = probe(
      // Duration carried under a TWO-BYTE size varint (0x4008 = 8):
      // the size-strip must subtract the 2-byte marker, not the 1-byte
      1 -> seg("4489" + "4008" + f1536, 12),
      // TimestampScale 2e6 ns: 1536 ticks -> 3072 ms
      2 -> seg("2AD7B1" + "83" + "1E8480" + "4489" + "88" + f1536, 18),
      // NaN (7FF8...), negative (sign bit), and a 6-byte Duration
      3 -> seg("4489" + "88" + "7FF8000000000000", 11),
      4 -> seg("4489" + "88" + "C098000000000000", 11),
      5 -> seg("4489" + "86" + "409800000000", 9))
    assert(r(1).getBoolean(1) && r(1).getLong(3) === 1536L)
    assert(r(2).getBoolean(1) && r(2).getLong(2) === 2000000L &&
      r(2).getLong(3) === 3072L)
    assert(!r(3).getBoolean(1))
    assert(!r(4).getBoolean(1))
    assert(!r(5).getBoolean(1))
  }
}
