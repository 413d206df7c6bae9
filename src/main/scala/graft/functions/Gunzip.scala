package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Transparent gunzip of a binary column to UTF-8 text — the Kinesis
  * payload boundary decode (reference classifier/payload/kinesis.py: records
  * arrive base64'd and possibly gzip'd), as a NATIVE Catalyst expression
  * with whole-stage codegen rather than a UDF: no closure serialization, no
  * Row boxing, and the magic-byte check + passthrough path inline into the
  * generated loop. Non-gzip input passes through as UTF8String.fromBytes —
  * zero-copy onto the existing byte array. */
case class Gunzip(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "gunzip"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gunzip requires BINARY input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    Gunzip.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Gunzip.decode($c);")

  override protected def withNewChildInternal(newChild: Expression): Gunzip =
    copy(child = newChild)
}

object Gunzip {
  /** Static decode target for both interpreted and generated code paths.
    *
    * Header sniffing mirrors the reference's `zlib.decompress(record, 47)`
    * (classifier/payload/kinesis.py:55 — wbits 32+15 auto-detects gzip OR
    * zlib framing): gzip magic 0x1f8b, or a zlib header (low nibble 8 =
    * deflate, 16-bit header divisible by 31 per RFC 1950). Anything else
    * passes through as text, the reference's `except zlib.error` arm. */
  def decode(bytes: Array[Byte]): UTF8String =
    if (bytes.length > 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte) {
      // same passthrough-on-failure as the zlib arm: a record whose first
      // bytes happen to be 0x1f 0x8b with a corrupt body/header raises
      // zlib.error in the reference and falls through to text — match that,
      // don't throw (the GZIPInputStream CONSTRUCTOR reads the header, so it
      // sits inside the try as well)
      try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try UTF8String.fromBytes(in.readAllBytes()) finally in.close()
      } catch { case _: java.io.IOException => UTF8String.fromBytes(bytes) }
    } else if (bytes.length > 2 && (bytes(0) & 0x0f) == 8 &&
        (((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff)) % 31 == 0) {
      val in = new java.util.zip.InflaterInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // a text record can collide with the 2-byte header check (e.g. "x^");
      // failed inflation passes through, the reference's `except zlib.error`
      try UTF8String.fromBytes(in.readAllBytes())
      catch { case _: java.io.IOException => UTF8String.fromBytes(bytes) }
      finally in.close()
    } else UTF8String.fromBytes(bytes)

  /** Column surface. */
  def gunzip(c: Column): Column =
    GraftColumnBridge.toColumn(Gunzip(GraftColumnBridge.toExpression(c)))
}
