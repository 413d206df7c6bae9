package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a unigram piece LM — the
  * E-step kernel of the SentencePiece-style tokenizer
  * ([[graft.pipeline.TextAnalysis.unigramLmLearn]]) and its apply step,
  * as a native Catalyst expression (reference-object pattern, stays in
  * whole-stage codegen; no UDF).
  *
  * The DP is ALL-INTEGER: piece log-probs arrive as micro-units
  * (floor(ln p · 10⁶ + ½) longs), path scores are exact long sums, so
  * the argmax segmentation is deterministic across partitions, engines
  * and reruns — no float accumulation anywhere. Ties break (1) higher
  * score, (2) fewer pieces, (3) longer final piece — a total order, so
  * equal-probability vocabularies still segment reproducibly.
  *
  * Coverage: a character absent from the piece table emits itself with
  * the UNK floor score (−25·10⁶ micro ≈ ln 1.4e−11), the SentencePiece
  * byte-fallback analogue — segmentation never fails, and the floor is
  * a constant the planted oracle can reproduce.
  *
  * Cost: O(len · maxPieceLen) hash probes per word, run over the
  * DISTINCT-WORD vocabulary (join counts back by word), never the
  * corpus. */
case class UnigramSegment(child: Expression, pieces: Seq[(String, Long)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  @transient private lazy val seg = new UnigramSegment.Segmenter(pieces)

  override def nullSafeEval(input: Any): Any =
    seg.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSeg", seg,
      classOf[UnigramSegment.Segmenter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segment($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramSegment {

  /** UNK floor for uncovered single characters, in micro log-prob units. */
  val UnkFloorMicro: Long = -25000000L

  final class Segmenter(piecesIn: Seq[(String, Long)]) extends Serializable {
    private val score = new java.util.HashMap[String, java.lang.Long]()
    private val maxLen: Int = {
      var m = 1
      piecesIn.foreach { case (p, s) =>
        if (p.nonEmpty) {
          score.putIfAbsent(p, s)
          if (p.length > m) m = p.length
        }
      }
      m
    }

    def segment(word: UTF8String): GenericArrayData = {
      val s = word.toString
      val n = s.length
      if (n == 0) return new GenericArrayData(Array.empty[Any])
      // dp(i): best (score, pieces) for prefix s[0,i); back(i) = length of
      // the final piece on the best path. Ties: fewer pieces, then the
      // LONGER final piece (checked at equal score+count by preferring
      // larger l on strict improvement only — iterate l ascending and
      // accept >=-improvements so the longest tying l wins).
      val best = new Array[Long](n + 1)
      val cnt = new Array[Int](n + 1)
      val back = new Array[Int](n + 1)
      java.util.Arrays.fill(best, Long.MinValue)
      best(0) = 0L; cnt(0) = 0
      var i = 1
      while (i <= n) {
        var l = 1
        val lMax = math.min(i, maxLen)
        while (l <= lMax) {
          val start = i - l
          if (best(start) != Long.MinValue) {
            val piece = s.substring(start, i)
            val sc = score.get(piece)
            val pieceScore: java.lang.Long =
              if (sc != null) sc
              else if (l == 1) java.lang.Long.valueOf(UnkFloorMicro)
              else null
            if (pieceScore != null) {
              val cand = best(start) + pieceScore.longValue()
              val candCnt = cnt(start) + 1
              if (cand > best(i) ||
                  (cand == best(i) && (candCnt < cnt(i) ||
                    (candCnt == cnt(i) && l >= back(i))))) {
                best(i) = cand; cnt(i) = candCnt; back(i) = l
              }
            }
          }
          l += 1
        }
        i += 1
      }
      // reconstruct
      val out = new scala.collection.mutable.ArrayBuffer[Any](cnt(n))
      var j = n
      while (j > 0) {
        val l = back(j)
        out.insert(0, UTF8String.fromString(s.substring(j - l, j)))
        j -= l
      }
      new GenericArrayData(out.toArray)
    }
  }

  /** Column surface: Viterbi piece array under a fixed scored table. */
  def unigram_segment(word: Column, pieces: Seq[(String, Long)]): Column =
    GraftColumnBridge.toColumn(UnigramSegment(
      GraftColumnBridge.toExpression(word), pieces))
}
