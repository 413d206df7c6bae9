package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC-record framing parser — the web-corpus ingestion step
  * (CommonCrawl-style WARC members) as a native Catalyst expression
  * over a BINARY blob: records are `WARC/1.0\r\n` + header lines +
  * `\r\n\r\n` + exactly `Content-Length` BYTES of body + `\r\n\r\n`.
  * Byte-correct framing is the whole point: a body may embed the
  * `WARC/1.0` magic verbatim (adversarial branch in the p7 oracle) and
  * a delimiter-split parser would shred it — this walks lengths, never
  * searches bodies. The same whole-object-in-one-row regime as the S2
  * source (Sources.scala S3 mode): one blob row per container member,
  * parse scan-side, explode to records.
  *
  * Returns `array<struct<rec_id, rec_type, content_length, body>>`
  * (the WARC-Record-ID / WARC-Type headers; absent headers null);
  * a malformed blob yields NULL (classifier invalid-routing decides
  * downstream, o9 semantics — a throw would kill the job). Parse is
  * eval-only (CodegenFallback, the JsonSchemaValid precedent — a
  * per-blob parser, not inner-loop arithmetic). */
case class WarcSplit(child: Expression) extends UnaryExpression
    with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rec_id", StringType),
    StructField("rec_type", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("body", StringType, nullable = false))))
  override def nullable: Boolean = true
  override def prettyName: String = "warc_split"

  private val magic = "WARC/1.0\r\n".getBytes(UTF_8)
  private val crlf2 = "\r\n\r\n".getBytes(UTF_8)

  private def startsWith(b: Array[Byte], at: Int, pat: Array[Byte]): Boolean =
    at + pat.length <= b.length &&
      java.util.Arrays.equals(b, at, at + pat.length, pat, 0, pat.length)

  private def indexOf(b: Array[Byte], from: Int, pat: Array[Byte]): Int = {
    var i = from
    while (i + pat.length <= b.length) {
      if (startsWith(b, i, pat)) return i
      i += 1
    }
    -1
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = scala.collection.mutable.ArrayBuffer[InternalRow]()
    var pos = 0
    while (pos < bytes.length) {
      if (!startsWith(bytes, pos, magic)) return null
      val hdrStart = pos + magic.length
      val hdrEnd = indexOf(bytes, hdrStart, crlf2)
      if (hdrEnd < 0) return null
      val headers = new String(bytes, hdrStart, hdrEnd - hdrStart, UTF_8)
        .split("\r\n").iterator
        .map(_.split(": ", 2)).collect { case Array(k, v) => k -> v }
        .toMap
      val bodyStart = hdrEnd + crlf2.length
      // hostile headers are the expected case: a negative or oversized
      // Content-Length must yield NULL, never reach array arithmetic
      // (the subtraction below is in Long, so it cannot overflow)
      val len = headers.get("Content-Length").flatMap(_.toLongOption)
        .filter(l => l >= 0L && l <= bytes.length.toLong - bodyStart - crlf2.length)
        .getOrElse(return null)
      if (!startsWith(bytes, bodyStart + len.toInt, crlf2)) return null
      out += InternalRow(
        headers.get("WARC-Record-ID").map(UTF8String.fromString).orNull,
        headers.get("WARC-Type").map(UTF8String.fromString).orNull,
        len,
        UTF8String.fromBytes(bytes, bodyStart, len.toInt))
      pos = bodyStart + len.toInt + crlf2.length
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WarcSplit =
    copy(child = newChild)
}

object WarcSplit {
  def column(c: Column): Column =
    GraftColumnBridge.toColumn(WarcSplit(GraftColumnBridge.toExpression(c)))
}
