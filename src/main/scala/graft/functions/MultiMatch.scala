package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring search (Aho–Corasick 1975) as a native
  * Catalyst expression — the kernel of the C4-style blocklist filter
  * (reference behavior: drop a page if any listed phrase occurs). The
  * naive relational spelling is P `LIKE`/`contains` probes per row —
  * P corpus re-scans' worth of work fused into one pass that still
  * costs O(P·len) per row; the automaton matches ALL patterns in ONE
  * O(len) walk regardless of P, which is the difference between usable
  * and not at blocklist sizes of 10³–10⁴ phrases.
  *
  * Returns the DISTINCT matched patterns in lexicographic (binary
  * UTF-8) order — same order DuckDB's default `list_sort` produces, so
  * the array is hash-comparable cross-engine. Matching is case- and
  * boundary-exact on code UNITS (callers lowercase column-side;
  * overlapping and nested patterns all report — the fail-link closure
  * merges outputs). The automaton rides as ONE reference object built
  * once per executor (the [[BpeEncode]] pattern), keeping the
  * expression inside whole-stage codegen with no per-row closure. */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "multi_match"

  @transient private lazy val auto = new MultiMatch.Automaton(patterns)

  override def nullSafeEval(input: Any): Any =
    auto.matches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", auto,
      classOf[MultiMatch.Automaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.matches($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatch =
    copy(child = newChild)
}

object MultiMatch {

  /** Goto/fail/output trie over UTF-16 code units; built once per
    * executor (addReferenceObj), walked once per row. Empty and
    * duplicate patterns are dropped at build. */
  final class Automaton(patternsIn: Seq[String]) extends Serializable {
    private val patterns: Array[String] =
      patternsIn.filter(_.nonEmpty).distinct.toArray
    // pre-sorted emission order: sort ONCE at build by UTF-8 bytes (what
    // both engines' binary string order is), emit by flag at match time
    private val emitOrder: Array[Int] = {
      val utf8 = patterns.map(p => UTF8String.fromString(p))
      patterns.indices
        .sortWith((a, b) => utf8(a).compareTo(utf8(b)) < 0).toArray
    }
    private val emitted: Array[UTF8String] =
      patterns.map(UTF8String.fromString)

    // trie: per-node char->node transitions; out = pattern ids ending here
    private val next = new scala.collection.mutable.ArrayBuffer[
      java.util.HashMap[Character, Integer]]()
    private val out = new scala.collection.mutable.ArrayBuffer[
      scala.collection.mutable.BitSet]()
    private val fail: Array[Int] = {
      next += new java.util.HashMap(); out += scala.collection.mutable.BitSet()
      patterns.zipWithIndex.foreach { case (p, pi) =>
        var s = 0
        var i = 0
        while (i < p.length) {
          val c = p.charAt(i)
          var t = next(s).get(c)
          if (t == null) {
            next += new java.util.HashMap()
            out += scala.collection.mutable.BitSet()
            t = next.length - 1
            next(s).put(c, t)
          }
          s = t
          i += 1
        }
        out(s) += pi
      }
      // BFS fail links; merge output closures so one node lookup emits
      // every pattern ending at this position (nested suffixes included)
      val f = new Array[Int](next.length)
      val queue = new java.util.ArrayDeque[Integer]()
      next(0).forEach((_, t) => { f(t) = 0; queue.add(t) })
      while (!queue.isEmpty) {
        val s = queue.poll()
        next(s).forEach((c, t) => {
          var r = f(s)
          while (r != 0 && !next(r).containsKey(c)) r = f(r)
          val rc = next(r).get(c)
          f(t) = if (rc != null && rc != t) rc else 0
          out(t) |= out(f(t))
          queue.add(t)
        })
      }
      f
    }
    private val nPat = patterns.length

    def matches(text: UTF8String): GenericArrayData = {
      val s = text.toString
      val hit = new Array[Boolean](nPat)
      var hits = 0
      var node = 0
      var i = 0
      while (i < s.length && hits < nPat) {
        val c = s.charAt(i)
        var t = next(node).get(c)
        while (t == null && node != 0) {
          node = fail(node)
          t = next(node).get(c)
        }
        node = if (t == null) 0 else t
        if (out(node).nonEmpty) out(node).foreach { pi =>
          if (!hit(pi)) { hit(pi) = true; hits += 1 }
        }
        i += 1
      }
      val res = new scala.collection.mutable.ArrayBuffer[Any](hits)
      emitOrder.foreach(pi => if (hit(pi)) res += emitted(pi))
      new GenericArrayData(res.toArray)
    }
  }

  /** Column surface: matched-pattern array under a fixed blocklist. */
  def multi_match(text: Column, patterns: Seq[String]): Column =
    GraftColumnBridge.toColumn(MultiMatch(
      GraftColumnBridge.toExpression(text), patterns))
}
