package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a codegen'd Catalyst
  * expression — the first text-cleanup pass of a web-corpus pipeline.
  * Un-normalized text defeats every downstream equality-based operator:
  * "é" as U+0065 U+0301 and as U+00E9 hash to different shingles,
  * different dedup buckets, different BPE words, and different
  * decontamination grams, so near-duplicate pages survive dedup and
  * contaminated eval rows slip the n-gram screen. NFC is the idempotent,
  * Unicode-stability-guaranteed fix (composition + canonical reordering
  * + singleton mappings), applied before fingerprinting anything.
  *
  * Spark-first shape: `java.text.Normalizer` (ICU-equivalent canonical
  * algorithm, stability-policy bound) behind a UnaryExpression so the
  * call stays inside whole-stage codegen — no UDF, no boxing beyond the
  * unavoidable UTF8String→String round-trip the JDK API requires. The
  * quick-check fast path inside Normalizer makes already-NFC text (the
  * overwhelming majority of a real corpus) a near-free scan.
  *
  * Cross-engine contract: Java NFC and DuckDB's utf8proc NFC agree
  * byte-for-byte (probed on composition, double-diacritic canonical
  * reordering U+0323/U+0301, the U+212B singleton, and NFC-inert
  * ligatures) — so `nfc_normalize` gives an EXACT DuckDB oracle, not a
  * bound. Null input nulls the result. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val utf8 = classOf[UTF8String].getName
      s"""
         |${ev.value} = $utf8.fromString(java.text.Normalizer.normalize(
         |  $in.toString(), java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def column(c: Column): Column =
    GraftColumnBridge.toColumn(
      NfcNormalize(GraftColumnBridge.toExpression(c)))
}
