package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HtmlVisible

/** The native one-scan HtmlVisible expression must be byte-equivalent
  * to the regex chain it replaced (tag strip + 6-pass entity decode +
  * lazy anchor extraction) — the DuckDB oracles keep the regex
  * spelling, so any divergence is a downstream hash mismatch. */
class HtmlVisibleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dec(c: Column): Column =
    HtmlVisible.entityRegexTable.foldLeft(c) { case (a, (p, r)) =>
      regexp_replace(a, p, r)
    }

  test("one-scan extraction equals the regex chain on adversarial HTML") {
    val fixtures = Seq(
      "<p>plain text</p>",
      "", "   ", "no tags at all & none",
      // entity decode: named/decimal/hex, case rules, amp-last ordering
      "&lt;x&gt; &#60;y&#62; &#x3c;z&#X3E; &quot;q&#34; &#39;a&#x27;&apos;",
      "&amp;lt; stays literal; &LT; never decodes; &nbsp;&#160;&#xA0;",
      "&amp;#38; one-pass stops at the literal; &#38;amp; too",
      "trailing amp & alone &unknown; passes through",
      // tag strip: entity split across a removed tag must merge
      "&am<b>p; merges to an ampersand",
      // unmatched '<' stays literal; '<  b >' is a tag; '<<b>>' nests
      "a < b > c", "x<y no close", "<<b>>", "tail<",
      // anchors: basic, attrs, case, empty, nested open, unclosed
      "<a>x&amp;y</a> tail",
      "<A HREF='u'>Q</A> and <a data-x=\"1\">long link body</a>",
      "<a></a> empty body",
      "<a>x<a>y</a>z</a> first close wins",
      "<a>unclosed never counts",
      "<abbr>not an anchor</abbr><article>nor this</article>",
      "pre </a> stray close <a>ok</a>",
      // the regex-vs-tag-parse trap: a literal </a> INSIDE another
      // tag's extent terminates the lazy body (regexes don't nest)
      "<a>x<b </a>y</a>",
      "<a </a>x</a> attr eats a close",
      "<a\thref=t>tab ws</a><a\nx>nl ws</a>",
      "<a>&am<b>p;</a> entity merge inside a body",
      "<a>one</a> mid <a>two</a> <a>three</a>")
    val df = fixtures.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "h")
    val hv = HtmlVisible.html_visible(col("h"))
    val rows = df.select(col("id"), col("h"),
        hv.getField("text").as("nt"),
        hv.getField("link_chars").as("nl"),
        dec(regexp_replace(col("h"), "<[^>]*>", "")).as("rt"),
        aggregate(
          regexp_extract_all(col("h"),
            lit("(?is)<a(?:\\s[^>]*)?>(.*?)</a>"), lit(1)),
          lit(0L),
          (acc, b) => acc +
            length(dec(regexp_replace(b, "<[^>]*>", ""))).cast("long"))
          .as("rl"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[String]("nt") == r.getAs[String]("rt"),
        s"text diverged on '${r.getAs[String]("h")}': " +
          s"native='${r.getAs[String]("nt")}' regex='${r.getAs[String]("rt")}'")
      assert(r.getAs[Long]("nl") == r.getAs[Long]("rl"),
        s"link_chars diverged on '${r.getAs[String]("h")}': " +
          s"native=${r.getAs[Long]("nl")} regex=${r.getAs[Long]("rl")}")
    }
  }
}
