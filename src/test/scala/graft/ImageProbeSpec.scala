package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Edge classes of the r19 [[Multimodal.imageDims]] format extension
  * the oracled fixture (mm_image_dims2) does not reach: truncated
  * GIF/BMP magics, a VP8 chunk MISSING its 9D012A start code, a VP8L
  * chunk with the wrong signature byte, an unrecognized WebP chunk
  * (ANIM), and the 14-bit scale-bit masking on VP8 dimensions. */
class ImageProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def probe(hexBlobs: (Int, String)*): Map[Int, org.apache.spark.sql.Row] = {
    import spark.implicits._
    val df = hexBlobs.toSeq.toDF("id", "hx")
      .select(col("id"), unhex(col("hx")).as("blob"))
    Multimodal.imageDims(df, "blob", "id")
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("webp guards: start code, VP8L signature, unknown chunk, scale bits") {
    val head = "52494646" + "18000000" + "57454250"
    val r = probe(
      // VP8 with a corrupted start code: format webp, valid=false
      1 -> (head + "56503820" + "10000000" + "000000" + "9D012B" +
        "4000" + "2000"),
      // VP8 with scale bits set in the u16s: 0x4064 & 0x3FFF = 100,
      // 0xC032 & 0x3FFF = 50 (the high 2 bits are scale, not size)
      2 -> (head + "56503820" + "10000000" + "000000" + "9D012A" +
        "6440" + "32C0"),
      // VP8L wrong signature byte (0x2E)
      3 -> (head + "5650384C" + "05000000" + "2E" + "63000000"),
      // ANIM chunk: a real WebP container the probe does not decode
      4 -> (head + "414E494D" + "06000000" + "000000000000"),
      // truncated magics
      5 -> "474946383961", 6 -> "424D2800", 7 -> "52494646")
    assert(r(1).getString(1) === "webp" && !r(1).getBoolean(5))
    assert(r(2).getBoolean(5) && r(2).getLong(3) === 100L &&
      r(2).getLong(4) === 50L)
    assert(r(3).getString(1) === "webp" && !r(3).getBoolean(5))
    assert(r(4).getString(1) === "webp" && !r(4).getBoolean(5))
    assert(r(5).getString(1) === "gif" && !r(5).getBoolean(5))
    assert(r(6).getString(1) === "bmp" && !r(6).getBoolean(5))
    assert(r(7).getString(1) === "unknown" && !r(7).getBoolean(5))
  }

  test("bmp top-down height reports magnitude; gif little-endian dims") {
    val bmp = "424D" + "00" * 12 + "28000000" +
      "20030000" + // width 800 LE
      "A0FDFFFF"   // height -608 LE two's complement
    val gif = "474946383761" + "0102" + "0304" + "F70000"
    val r = probe(1 -> bmp, 2 -> gif)
    assert(r(1).getBoolean(5) && r(1).getLong(3) === 800L &&
      r(1).getLong(4) === 608L)
    assert(r(2).getBoolean(5) && r(2).getLong(3) === 513L && // 0x0201
      r(2).getLong(4) === 1027L) // 0x0403
  }
}
