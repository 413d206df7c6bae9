package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.WebOps

/** robots.txt parsing/verdicts, HTML metadata, IBAN mod-97. */
class WebOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("robots: section scoping, empty disallow dropped, longest match, allow tie-break") {
    val robots = Seq(
      ("a.com",
        "# policy\n" +
          "User-agent: megabot\nDisallow: /\n\n" + // non-* section: ignored
          "User-agent: *\n" +
          "Disallow: /p/1\n" +
          "Allow: /p/12\n" +
          "Disallow:\n" + // empty path: no restriction (RFC) — dropped
          "disallow: /q/\n"), // case-folded directive
      ("b.com", "User-agent: *\nAllow: /x\nDisallow: /x\n")) // equal length
      .toDF("host", "body")
    val rules = WebOps.robotsRules(robots, "host", "body")
    assert(rules.collect().map(r =>
      (r.getString(0), r.getBoolean(1), r.getString(2))).toSet == Set(
      ("a.com", false, "/p/1"), ("a.com", true, "/p/12"),
      ("a.com", false, "/q/"), ("b.com", true, "/x"), ("b.com", false, "/x")),
      "parsed rule set")
    val urls = Seq(
      (1L, "a.com", "/p/1"),    // blocked by /p/1
      (2L, "a.com", "/p/120"),  // /p/12 (allow, len 5) beats /p/1 (len 4)
      (3L, "a.com", "/p/57"),   // host HAS rules, none match -> allowed
      (4L, "a.com", "/q/x"),    // case-folded disallow applies
      (5L, "c.com", "/p/1"),    // host with NO rules -> allowed
      (6L, "b.com", "/x/y"))    // equal-length allow vs disallow -> allow wins
      .toDF("doc_id", "host", "path")
    val v = WebOps.robotsVerdict(urls, "doc_id", "host", "path", rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(v == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false,
      5L -> true, 6L -> true), s"verdicts: $v")
  }

  test("robots: RFC 9309 wildcards (*) and end anchors ($), specificity by octets") {
    val robots = Seq(
      ("w.com",
        "User-agent: *\n" +
          "Disallow: /p/*4$\n" +  // any /p/ path ending in 4
          "Allow: /p/1*4$\n" +    // longer (8 > 7): re-allows /p/1…4
          "Disallow: /p/9$\n" +   // exactly /p/9, never /p/9X
          "Disallow: /dl/*.pdf\n" + // unanchored wildcard: prefix after *
          "Disallow: /a.b\n"))    // literal dot must not regex-match /axb
      .toDF("host", "body")
    val rules = WebOps.robotsRules(robots, "host", "body")
    val urls = Seq(
      (1L, "w.com", "/p/24"),        // *4$ matches -> blocked
      (2L, "w.com", "/p/144"),       // both match; Allow /p/1*4$ longer -> allowed
      (3L, "w.com", "/p/42"),        // ends in 2: no wildcard match -> allowed
      (4L, "w.com", "/p/9"),         // anchored literal -> blocked
      (5L, "w.com", "/p/90"),        // anchor must NOT match the prefix -> allowed
      (6L, "w.com", "/dl/x/y.pdf?v"), // unanchored *: trailing chars ok -> blocked
      (7L, "w.com", "/axb"))         // '.' stays literal -> allowed
      .toDF("doc_id", "host", "path")
    val v = WebOps.robotsVerdict(urls, "doc_id", "host", "path", rules,
        knownSmall = true)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(v == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false,
      5L -> true, 6L -> false, 7L -> true), s"wildcard verdicts: $v")
  }

  test("soft404: anchor classes gate where a pattern may match") {
    val pats = (WebOps.DefaultSoft404Patterns ++
      Seq("página no encontrada" -> "phrase")).toDF("pattern", "anchor")
    val pages = Seq(
      // '404' mid-title: start-anchored pattern must NOT fire
      (1L, "<html><title>Post 404 retrospective</title><body>fine prose</body></html>"),
      (2L, "<html><title>404 Not Found</title><body>gone</body></html>"),
      // 'forbidden' in the BODY only: word pattern is title-scoped
      (3L, "<html><title>Members area</title><body>forbidden: log in</body></html>"),
      (4L, "<html><title>Error</title><body>página no encontrada.</body></html>"),
      // '4042' is not the word '404'
      (5L, "<html><title>4042 plastics</title><body>catalog</body></html>"))
      .toDF("doc_id", "html")
    val out = WebOps.soft404(pages, "html", "doc_id", pats)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(4), r.getString(2))).toMap
    assert(out(1L)._1 == false, s"mid-title 404 must stay clean: ${out(1L)}")
    assert(out(2L) == ((true, "404,not found")), s"classic 404: ${out(2L)}")
    assert(out(3L)._1 == false, s"body 'forbidden' is not a title hit: ${out(3L)}")
    assert(out(4L) == ((true, "página no encontrada")), s"non-English pack: ${out(4L)}")
    assert(out(5L)._1 == false, s"word boundary must hold: ${out(5L)}")
  }

  test("robots: CRLF line endings and no-space-after-colon parse like LF") {
    // real robots.txt is frequently CRLF and 'User-agent:*' (no space) —
    // both must parse identically to the canonical form
    val robots = Seq(
      ("crlf.com", "User-agent:*\r\nDisallow:/a\r\nAllow: /a/b\r\n"))
      .toDF("host", "body")
    val rules = WebOps.robotsRules(robots, "host", "body")
    assert(rules.collect().map(r =>
      (r.getBoolean(1), r.getString(2))).toSet ==
      Set((false, "/a"), (true, "/a/b")), "CRLF + no-space rules")
  }

  test("htmlMeta: attribute order and case free; missing fields empty, never null") {
    val pages = Seq(
      (1L, "<html lang=\"en\"><head><title> A\n  B </title>" +
        "<meta name=\"description\" content=\"Tom's d1\">" + // apostrophe inside ""
        "<link rel=\"canonical\" href=\"https://e/p\"></head></html>"),
      (2L, "<HTML Lang='fr'><META CONTENT=\"d2\" NAME='description'>" +
        "<meta content=\"og2\" property='og:title'></HTML>"),
      (3L, "<div>no metadata</div>"),
      // empty double-quoted value must stay '' — not fall through to a
      // later single-quoted attribute on the same tag
      (4L, "<meta name=\"description\" content=\"\" data-x='leak'>"))
      .toDF("doc_id", "html")
    val m = WebOps.htmlMeta(pages, "html", "doc_id").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5)))
    assert(m(0) == ((1L, "A B", "Tom's d1", "https://e/p", "en", "")),
      s"matched-quote extraction must not truncate at the apostrophe: ${m(0)}")
    assert(m(1) == ((2L, "", "d2", "", "fr", "og2")),
      "flipped attribute order + case-folded names must extract")
    assert(m(2) == ((3L, "", "", "", "", "")), "missing fields empty")
    assert(m(3) == ((4L, "", "", "", "", "")),
      s"empty dq value must not fall through to a later sq attr: ${m(3)}")
  }

  test("packShards: greedy fill crosses boundaries correctly under bucket carry") {
    // tokens per doc: 4,4,4,4,4 with shardTokens=10 -> starts 0,4,8,12,16
    // -> shards 0,0,0,1,1 (doc 2 STARTS at 8 < 10, so it lands in shard 0
    // and overflows it to 12 tokens — the at-most-one-doc overflow rule).
    // idsPerBucket=2 forces the carry across three buckets, so the
    // decomposed prefix sum must equal the global one.
    val docs = (0L to 4L).map(i => (i, "w1 w2 w3 w4")).toDF("doc_id", "text")
    val m = graft.pipeline.TextAnalysis.packShards(docs, "text", "doc_id",
        shardTokens = 10L, idsPerBucket = 2L)
      .orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(m.toSeq == Seq((0L, 3L, 12L, 0L, 2L), (1L, 2L, 8L, 3L, 4L)),
      s"manifest: ${m.toSeq}")
  }

  test("shard store step: global offsets, retry re-derives, compaction preserves") {
    val dir = java.nio.file.Files.createTempDirectory("shardstore").toString
    def run(docs: Seq[(Long, String)], id: Long) =
      graft.pipeline.TextAnalysis.shardStoreStep(docs.toDF("doc_id", "text"),
        dir, "text", "doc_id", shardTokens = 10L, batchId = id)
        .select("shard_id", "n_docs", "n_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b0 = (0L to 3L).map(i => (i, "w1 w2 w3 w4")) // 16 tokens
    assert(run(b0, 0L) == Set((0L, 3L, 12L), (1L, 1L, 4L)))
    // batch 1 continues the HALF-FULL shard 1 from the global offset 16
    val b1 = Seq((10L, "w1 w2 w3 w4"), (11L, "w1 w2 w3 w4"))
    val r1 = run(b1, 1L)
    assert(r1 == Set((1L, 1L, 4L), (2L, 1L, 4L)), s"cross-batch fill: $r1")
    // RETRY batch 1: the offset read excludes its own partial
    assert(run(b1, 1L) == r1, "retried batch must re-derive the same offset")
    assert(run(Seq((20L, "w1 w2")), 2L) == Set((2L, 1L, 2L)))
    val folded = graft.pipeline.TextAnalysis.shardStoreCompact(
      spark, dir, compactId = -1L, upToBatchId = 1L)
    assert(folded.toSet == Set(0L, 1L), s"folded: $folded")
    assert(run(Seq((30L, "w1 w2 w3 w4")), 3L) == Set((2L, 1L, 4L)),
      "the running offset must survive compaction")
  }

  test("iban: ISO 13616 known vectors validate, single-digit corruption fails") {
    val docs = Seq(
      (1L, "pay DE89370400440532013000 now"),  // ISO example: valid
      (2L, "pay GB82WEST12345698765432 now"),  // ISO example: valid
      (3L, "pay DE88370400440532013000 now"),  // check digits off by one
      (4L, "pay DE89370400440532013001 now"),  // body digit flipped
      (5L, "no candidates here")).toDF("doc_id", "text")
    val out = WebOps.ibanScan(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false),
      s"iban verdicts: $out")
  }
}
