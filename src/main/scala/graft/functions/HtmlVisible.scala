package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML visible-text extraction (tag strip + entity decode) fused with
  * anchor-character counting as ONE native Catalyst expression — the
  * shared kernel of [[graft.pipeline.TextAnalysis.htmlExtract]] and the
  * jusText block classifier. The relational spelling is ~9 regex passes
  * per block (one tag strip, six entity-decode passes, the anchor
  * extract, plus a strip+decode per anchor body); this expression does
  * the same work in one character scan plus one decode pass, which is
  * the difference between the block pass being regex-bound and
  * scan-bound at corpus scale.
  *
  * Semantics replicate the regex chain EXACTLY (the DuckDB oracles keep
  * the regex spelling, so every divergence is a hash mismatch):
  *  - tag strip is `<[^>]*>`: from each `<`, through the NEXT `>`;
  *    a `<` with no later `>` stays literal text;
  *  - the stripped text assembles FIRST and entities decode on the
  *    assembled string (so `&am<b>p;` decodes to `&`, exactly like
  *    strip-then-decode), per-anchor bodies likewise;
  *  - entity decode is the canonical [[HtmlVisible.Entities]] table: at
  *    `&` the first matching literal wins (at most one can match),
  *    hex forms case-insensitively — position-equivalent to the six
  *    sequential alternation passes because no replacement can create
  *    a later-pass match (`&`-producing decodes are last);
  *  - anchor accounting mirrors `(?is)<a(?:\s[^>]*)?>(.*?)</a>`: an
  *    anchor opens at `<a>` / `<a␣...>` (case-insensitive, Java `\s`),
  *    its body runs lazily to the FIRST `</a>`, inner tags strip, an
  *    anchor that never closes contributes nothing, and `link_chars`
  *    counts CODE POINTS of each decoded body (Spark `length`).
  *
  * Returns struct(text — stripped + decoded, UNtrimmed — link_chars).
  */
case class HtmlVisible(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("link_chars", LongType, nullable = false)))
  override def prettyName: String = "html_visible"

  override def nullSafeEval(input: Any): Any =
    HtmlVisible.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlVisible.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlVisible =
    copy(child = newChild)
}

object HtmlVisible {

  /** The canonical entity table: (literal, replacement,
    * case-insensitive) in decode order — named / decimal / hex per
    * target character, `&`-producing decodes LAST so `&amp;lt;` yields
    * the literal `&lt;`. The regex mirror for SQL oracles derives from
    * this ([[entityRegexTable]]); the scanner matches the literals
    * directly. */
  val Entities: Array[(String, Char, Boolean)] = Array(
    ("&lt;", '<', false), ("&#60;", '<', false), ("&#x3c;", '<', true),
    ("&gt;", '>', false), ("&#62;", '>', false), ("&#x3e;", '>', true),
    ("&quot;", '"', false), ("&#34;", '"', false), ("&#x22;", '"', true),
    ("&#39;", '\'', false), ("&#x27;", '\'', true), ("&apos;", '\'', false),
    ("&nbsp;", ' ', false), ("&#160;", ' ', false), ("&#xa0;", ' ', true),
    ("&amp;", '&', false), ("&#38;", '&', false), ("&#x26;", '&', true))

  /** One alternation regex pass per target character (6 passes), the
    * java.util.regex / RE2 mirror of [[Entities]] — what
    * [[graft.pipeline.TextAnalysis.entityDecodeSql]] folds into oracle
    * SQL. */
  val entityRegexTable: Seq[(String, String)] = {
    val order = Seq('<', '>', '"', '\'', ' ', '&')
    order.map { r =>
      val pats = Entities.toSeq.collect { case (l, `r`, ci) =>
        if (ci) s"(?i:$l)" else l }
      (pats.mkString("|"), r.toString)
    }
  }

  /** Decode the entity table's references in `s` — one scan, first
    * matching literal wins at each `&`. */
  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        var hit = -1
        var k = 0
        while (hit < 0 && k < Entities.length) {
          val e = Entities(k)
          if (s.regionMatches(e._3, i, e._1, 0, e._1.length)) hit = k
          k += 1
        }
        if (hit >= 0) { sb.append(Entities(hit)._2); i += Entities(hit)._1.length }
        else { sb.append('&'); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // java.util.regex \s (the anchor-open pattern's whitespace class)
  private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Tag-strip one region of `s` by the `<[^>]*>` rule LOCAL to the
    * region (a `<` whose `>` lies beyond `end` stays literal — exactly
    * what `regexp_replace` does on an extracted substring). */
  private def stripTags(s: String, start: Int, end: Int): String = {
    val sb = new java.lang.StringBuilder(end - start)
    var i = start
    while (i < end) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close < 0 || close >= end) { sb.append(c); i += 1 }
        else i = close + 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Visible text (one strip pass + one decode pass) and anchor chars —
    * the anchor loop replicates the regex engine exactly: leftmost
    * `<a>`/`<a␣…>` open, body lazily to the FIRST literal `</a>`
    * substring (even one that tag-boundary parsing would place inside
    * another tag — regexes don't nest), scanning resumes after the
    * close, an open with no later close matches nothing, and each
    * body tag-strips LOCALLY then decodes. */
  def compute(raw: UTF8String): InternalRow = {
    val s = raw.toString
    val n = s.length
    var linkChars = 0L
    var p = 0
    var done = false
    while (!done) {
      // leftmost anchor open at or after p: `<a` then `>` or \s[^>]*>
      var oBody = -1
      var q = s.indexOf('<', p)
      while (oBody < 0 && q >= 0 && q + 1 < n) {
        val a = s.charAt(q + 1)
        val close = if (a == 'a' || a == 'A') s.indexOf('>', q + 2) else -1
        if (close == q + 2 || (close > q + 2 && isJavaWs(s.charAt(q + 2))))
          oBody = close + 1
        else q = s.indexOf('<', q + 1)
      }
      if (oBody < 0) done = true
      else {
        // first `</a>` (case-insensitive) at or after the body start
        var e = -1
        var r = s.indexOf('<', oBody)
        while (e < 0 && r >= 0 && r + 3 < n) {
          if (s.charAt(r + 1) == '/' &&
              (s.charAt(r + 2) == 'a' || s.charAt(r + 2) == 'A') &&
              s.charAt(r + 3) == '>') e = r
          else r = s.indexOf('<', r + 1)
        }
        if (e < 0) done = true // unclosed anchor: no match, nothing counts
        else {
          val d = decode(stripTags(s, oBody, e))
          linkChars += d.codePointCount(0, d.length)
          p = e + 4
        }
      }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(decode(stripTags(s, 0, n))), linkChars))
  }

  /** Column surface: struct(text, link_chars) of one raw HTML string. */
  def html_visible(raw: Column): Column =
    GraftColumnBridge.toColumn(HtmlVisible(
      GraftColumnBridge.toExpression(raw)))
}
