package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge table to one word — the tokenizer
  * APPLICATION step closing the loop [[graft.pipeline.TextAnalysis.bpeLearn]]
  * opens, as a native Catalyst expression (not a UDF: stays inside
  * whole-stage codegen via a reference object, no closure boxing per row).
  *
  * Algorithm: lowest-rank-first (the priority scheme production BPE
  * encoders use): repeatedly find the adjacent symbol pair with the
  * smallest merge rank present in the word and merge ALL its occurrences
  * greedy left-to-right, until no adjacent pair is in the table. For a
  * WELL-FORMED merge table (each rule's operands are single characters or
  * products of strictly lower-rank rules — what bpeLearn emits by
  * construction) this is equivalent to applying the rules one by one in
  * rank order, and each round strictly shrinks the symbol count, so the
  * loop is O(len²) map probes per word.
  *
  * Scale shape: the rules ride along as ONE reference object (built once
  * per executor from the serialized table — merge tables are
  * human-budget-sized, ≤ ~50k rules), and the expression is meant to run
  * over the DISTINCT-WORD vocabulary, never the corpus: encode each
  * distinct word once, join token counts back by word (see
  * [[graft.pipeline.TextAnalysis.bpeTokenCounts]]). Characters are split
  * per CODE POINT — the same boundaries Spark's `split(word, "")` (Java
  * regex) produces for bpeLearn's initial symbols. */
case class BpeEncode(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val encoder = new BpeEncode.Encoder(rules)

  override def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncode.Encoder].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** Greedy left-to-right single-pass merge — the shared fold semantics
    * of bpeLearn (both paths) and encode: the freshly merged tail symbol
    * never re-matches as lhs of the same pair in the same pass. */
  def applyMerge(syms: Array[String], l: String, r: String,
      merged: String): Array[String] = {
    val acc = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (acc.nonEmpty && acc(acc.length - 1) == l && x == r)
        acc(acc.length - 1) = merged
      else acc += x
      i += 1
    }
    acc.toArray
  }

  /** Rank-indexed merge table + the encode loop; built once per executor
    * (addReferenceObj), probed per word. */
  final class Encoder(rules: Seq[(String, String)]) extends Serializable {
    // first occurrence wins if a pair repeats in the table
    private val rank: java.util.HashMap[(String, String), Integer] = {
      val m = new java.util.HashMap[(String, String), Integer]()
      rules.zipWithIndex.foreach { case (p, i) => m.putIfAbsent(p, i) }
      m
    }

    def encode(word: UTF8String): GenericArrayData = {
      var syms = codePoints(word.toString)
      var done = syms.length < 2
      while (!done) {
        var bestRank = Int.MaxValue
        var bl: String = null
        var br: String = null
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.get((syms(i), syms(i + 1)))
          if (r != null && r < bestRank) { bestRank = r; bl = syms(i); br = syms(i + 1) }
          i += 1
        }
        if (bl == null) done = true
        else {
          syms = applyMerge(syms, bl, br, bl + br)
          done = syms.length < 2
        }
      }
      new GenericArrayData(syms.map(s => UTF8String.fromString(s): Any))
    }

    private def codePoints(s: String): Array[String] = {
      val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val n = Character.charCount(cp)
        out += s.substring(i, i + n)
        i += n
      }
      out.toArray
    }
  }

  /** Column surface: `bpe_encode(word)` under a fixed learned table. */
  def bpe_encode(word: Column, rules: Seq[(String, String)]): Column =
    GraftColumnBridge.toColumn(BpeEncode(
      GraftColumnBridge.toExpression(word), rules))
}
