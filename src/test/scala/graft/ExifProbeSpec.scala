package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Multimodal.exifProbe — the codec-free APP1/TIFF IFD walk: both byte
  * orders, tag absence inside a valid IFD, the unaligned FFE1+magic decoy,
  * truncation, and null blobs. Byte layouts follow TIFF 6.0 / JEITA
  * CP-3451 (public specs); the mm_exif oracle row covers the planted
  * corpus, this spec pins the corner semantics. */
class ExifProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val decoyApp0 = "FFE000124A46494600" + "0FFE100204578696600000"

  // LE TIFF: IFD0 {orientation=6, ExifIFD->50, GPSIFD->88}, sub-IFD
  // {DateTimeOriginal @68}, empty GPS IFD @88
  private val tiffLE = "49492A0008000000" + "0300" +
    "1201030001000000" + "0600" + "0000" +
    "698704000100000032000000" +
    "258804000100000058000000" + "00000000" +
    "0100" + "039002001400000044000000" + "00000000" +
    "313939353A30363A313820" + "3132" + "3A33343A3536" + "00" +
    "0000" + "00000000"
  private val jpegLE = "FFD8" + decoyApp0 + "FFE10066457869660000" + tiffLE

  // BE TIFF: IFD0 {orientation=3, ExifIFD->38}, sub-IFD {DTO @56}, no GPS
  private val tiffBE = "4D4D002A00000008" + "0002" +
    "0112" + "0003" + "00000001" + "0003" + "0000" +
    "8769" + "0004" + "00000001" + "00000026" + "00000000" +
    "0001" + "9003" + "0002" + "00000014" + "00000038" + "00000000" +
    "313939353A30363A313820" + "3132" + "3A33343A3536" + "00"
  private val jpegBE = "FFD8" + decoyApp0 + "FFE10054457869660000" + tiffBE

  // LE TIFF with ONLY a GPS pointer — orientation/DTO absent but valid
  private val tiffGpsOnly = "49492A0008000000" + "0100" +
    "2588040001000000" + "1A000000" + "00000000" +
    "0000" + "00000000"
  private val jpegGpsOnly = "FFD8FFE1002845786966 0000".replace(" ", "") +
    tiffGpsOnly

  private def probe(rows: Seq[(Long, String)]) =
    Multimodal.exifProbe(
      rows.toDF("doc_id", "hx").select(col("doc_id"),
        unhex(col("hx")).as("blob")), "blob", "doc_id")
      .orderBy("media_id")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.getString(2)), Option(r.get(3)).map(_.toString.toLong),
        Option(r.getString(4)), r.getBoolean(5)))

  test("little- and big-endian EXIF parse: orientation, DTO, GPS presence") {
    val out = probe(Seq((1L, jpegLE), (2L, jpegBE)))
    assert(out(0) === ((1L, true, Some("II"), Some(6L),
      Some("1995:06:18 12:34:56"), true)))
    assert(out(1) === ((2L, true, Some("MM"), Some(3L),
      Some("1995:06:18 12:34:56"), false)))
  }

  test("absent tags inside a valid IFD stay null; GPS pointer alone is valid") {
    val out = probe(Seq((1L, jpegGpsOnly)))
    assert(out(0) === ((1L, true, Some("II"), None, None, true)))
  }

  test("EXIF-less JPEG with the unaligned decoy, truncation, garbage, null") {
    val noExif = "FFD8" + decoyApp0 + "FFDB00430011FFD9"
    val truncated = "FFD8FFE1000C45786966000049492A00"
    val out = Multimodal.exifProbe(
      Seq((1L, Some(noExif)), (2L, Some(truncated)),
        (3L, Some("00DEADBEEF")), (4L, None))
        .toDF("doc_id", "hx").select(col("doc_id"),
          unhex(col("hx")).as("blob")), "blob", "doc_id")
      .orderBy("media_id").collect()
    out.foreach { r =>
      assert(!r.getBoolean(1), s"row ${r.getLong(0)} must be invalid")
      assert(!r.getBoolean(5), s"row ${r.getLong(0)} has_gps must be false")
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    }
  }

  test("an entry count beyond the 64-entry cap invalidates instead of walking") {
    // LE header claiming 0x4141 entries with no table behind it
    val bogus = "FFD8FFE1001245786966000049492A000800000041 41".replace(" ", "")
    val out = probe(Seq((1L, bogus)))
    assert(out(0)._2 === false)
  }
}
