package graft.functions

import java.util.zip.Deflater
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Raw-DEFLATE compressed size of a string's UTF-8 bytes — the kernel
  * of the compression-ratio quality signal (Gopher/RefinedWeb-style:
  * a ratio near 0 means boilerplate/repetition, near 1 means
  * encoded-blob noise; natural prose sits in between). Level 6,
  * nowrap (no zlib header), default strategy — fixed parameters so
  * the size is deterministic for a given input (the JDK bundles zlib;
  * the planted verdict rows assert wide-margin ORDERINGS, not exact
  * sizes, so a zlib revision cannot flip them). Eval-only
  * (CodegenFallback — a per-row compressor, not inner-loop
  * arithmetic); the [[Gunzip]] counterpart on the write side. */
case class DeflateSize(child: Expression) extends UnaryExpression
    with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = new Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {
  def column(c: Column): Column =
    GraftColumnBridge.toColumn(DeflateSize(GraftColumnBridge.toExpression(c)))
}
