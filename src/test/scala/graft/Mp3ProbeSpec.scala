package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Edge classes of [[Multimodal.mp3Duration]] the oracled fixture
  * (mm_mp3_duration) does not reach: MPEG2.5 table selection, a
  * Xing block whose frames flag is UNSET (must fall back to the CBR
  * estimate, not read a missing field), free-format bitrate index 0 and
  * reserved version/layer bits (valid=false), and an ID3 tag whose
  * syncsafe size uses the multi-byte limbs. */
class Mp3ProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def probe(hexBlobs: (Int, String)*): Map[Int, org.apache.spark.sql.Row] = {
    import spark.implicits._
    val df = hexBlobs.toSeq.toDF("id", "hx")
      .select(col("id"), unhex(col("hx")).as("blob"))
    Multimodal.mp3Duration(df, "blob", "id")
      .collect().map(r => r.getInt(0) -> r).toMap
  }

  test("MPEG2.5 tables, Xing frames-flag unset, free-format, reserved bits") {
    // MPEG2.5 Layer III: FF E2 — sync 111, version 00, layer 01, prot 0;
    // bitrate idx 2 (=16 kbps), sample rate idx 2 (=8000), mono (C0);
    // 16 audio bytes after the 4-byte header -> CBR 20*8000/16000 = 10ms
    val v25 = "FFE228C0" // byte2 = 0010 10 0 0: brIdx 2, srIdx 2
    // MPEG1 stereo with a Xing block whose flags word is 0 (no frame
    // count): must use the CBR estimate over the whole audio span
    val xingNoFrames = "FFFB9000" + "00" * 32 + "58696E67" + "00000000"
    // free-format (bitrate index 0) and reserved version (01) / layer 00
    val freeFmt = "FFFB0000"
    val reservedVer = "FFEB9000" // version bits 01
    val reservedLayer = "FFF99000" // layer bits 00
    // ID3 size 0x0183 = syncsafe 00 00 03 03 -> 3*128+3 = 387 bytes
    val id3Multi = "4944330400" + "00" + "00000303" + "00" * 387 + "FFFB9000" +
      "00" * 12
    val r = probe(1 -> (v25 + "00" * 16), 2 -> xingNoFrames, 3 -> freeFmt,
      4 -> reservedVer, 5 -> reservedLayer, 6 -> id3Multi)

    assert(r(1).getBoolean(1)) // valid
    assert(r(1).getString(2) === "2.5")
    assert(r(1).getLong(3) === 16L) // MPEG2 bitrate table
    assert(r(1).getLong(4) === 8000L) // MPEG2.5 sample rates
    assert(r(1).getLong(7) === 10L) // (4+16)*8000/16000 = 10ms

    assert(r(2).getBoolean(1))
    assert(r(2).isNullAt(6)) // no frame count readable
    // CBR estimate: 44 bytes * 8000 / 128000 = 2.75 -> 3 ms
    assert(r(2).getLong(7) === 3L)
    assert(r(2).getBoolean(5)) // the Xing magic still marks VBR intent

    assert(!r(3).getBoolean(1) && r(3).isNullAt(7))
    assert(!r(4).getBoolean(1))
    assert(!r(5).getBoolean(1))

    assert(r(6).getBoolean(1)) // multi-limb syncsafe skip landed the sync
    assert(r(6).getString(2) === "1")
    assert(r(6).getLong(7) === 1L) // 16 bytes * 8000 / 128000 = 1ms
  }

  test("truncation classes never error: short ID3, header at exact end") {
    val r = probe(1 -> "494433", 2 -> "4944330400000000000A", 3 -> "FFFB90",
      4 -> "", 5 -> "FFFB9000")
    Seq(1, 2, 3, 4).foreach(i => assert(!r(i).getBoolean(1), s"id $i"))
    // a bare 4-byte header IS a valid (empty) CBR stream: 4*8000/128000
    // rounds to 0ms
    assert(r(5).getBoolean(1) && r(5).getLong(7) === 0L)
  }

  test("ogg probe: aligned-last-page selection, decoys, pre-skip guard") {
    import spark.implicits._
    val head = "4F70757348656164" + "01" + "02" + "0000" + "80BB0000" +
      "0000" + "00"
    val page0 = "4F676753" + "00" + "02" + "00" * 8 + "01000000" +
      "00000000" + "00000000" + "01" + "13" + head
    def lastPage(granuleLE: String) = "4F676753" + "00" + "04" + granuleLE +
      "01000000" + "01000000" + "00000000" + "00"
    // granule 96000 samples, pre-skip 0 -> 2000 ms
    val g = "00770100" + "00000000"
    val clean = page0 + lastPage(g)
    // a MID-BYTE OggS decoy after the real last page: bytes A4 F6 76 75
    // 30 contain the magic at an ODD hex index, which the (?:..)* stride
    // must skip (with trailing room so an unaligned match COULD capture)
    val oddDecoy = clean + "A4F6767530" + "00" * 10
    // an ALIGNED decoy in trailing bytes WINS — the documented leniency
    // of a one-scan probe (a real parser CRC-checks resync candidates);
    // its 20-char tail here yields garbage granule -> pinned as read
    val alignedDecoy = clean + "4F676753" + "00" + "00" + "FF" * 8 +
      "00" * 10
    // granule below pre-skip is pathological -> invalid
    val below = page0.replace("0000" + "80BB", "FFFF" + "80BB") // preskip 65535
    // granule 1000 < pre-skip 65535
    val df = Seq(1 -> clean, 2 -> oddDecoy, 3 -> alignedDecoy,
      4 -> (below + lastPage("E8030000" + "00000000"))).toDF("id", "hx")
      .select(col("id"), unhex(col("hx")).as("blob"))
    val r = Multimodal.oggDuration(df, "blob", "id")
      .collect().map(x => x.getInt(0) -> x).toMap
    assert(r(1).getBoolean(1) && r(1).getLong(5) === 96000L &&
      r(1).getLong(6) === 2000L && r(1).getBoolean(4))
    assert(r(2).getBoolean(1) && r(2).getLong(5) === 96000L) // decoy skipped
    assert(!r(3).getBoolean(1)) // negative (signed) garbage granule rejected
    assert(!r(4).getBoolean(1)) // granule < pre-skip
  }

  test("flac probe: is-last flag tolerated, wrong type / zero rate rejected") {
    import spark.implicits._
    val pre = "000022" + "1000" + "1000" + "000000" + "000000"
    val md5 = "00" * 16
    // 44100 stereo 16bps, 44100 samples -> exactly 1000 ms; header byte
    // 0x80 = STREAMINFO with the is-last flag SET (legal: no more blocks)
    val lastFlag = "664C6143" + "80" + pre + "0AC442F0" + "0000AC44" + md5
    // type bits 1 (PADDING first) violate the spec ordering
    val wrongType = "664C6143" + "01" + pre + "0AC442F0" + "0000AC44" + md5
    // sample rate 0 is the non-audio sentinel
    val zeroRate = "664C6143" + "00" + pre + "000002F0" + "0000AC44" + md5
    val df = Seq(1 -> lastFlag, 2 -> wrongType, 3 -> zeroRate)
      .toDF("id", "hx")
      .select(col("id"), unhex(col("hx")).as("blob"))
    val r = Multimodal.flacDuration(df, "blob", "id")
      .collect().map(x => x.getInt(0) -> x).toMap
    assert(r(1).getBoolean(1) && r(1).getLong(2) === 44100L &&
      r(1).getLong(3) === 2L && r(1).getLong(4) === 16L &&
      r(1).getLong(6) === 1000L)
    assert(!r(2).getBoolean(1))
    assert(!r(3).getBoolean(1))
  }
}
