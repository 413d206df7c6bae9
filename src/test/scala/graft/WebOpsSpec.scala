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

  test("web store loop: latest batch verdicts byte-match the batch composite; retry idempotent") {
    // three micro-batches through webStoreStep (url-dedup store ->
    // jusText -> incremental substring cut -> attribute/exact-dedup
    // store) vs the batch composite over the union. With monotone
    // doc_ids, the LATEST batch's verdicts must match the batch twin
    // exactly (the stores hold the union's prior state); the fixture
    // keeps repeated substrings repeated WITHIN their first batch so
    // earlier batches' clean text agrees too (the d23 asymmetry never
    // fires asymmetrically).
    val jtStops = Seq("the", "a", "of", "and", "to", "in")
    val boiler = "please subscribe to our newsletter and share the page " +
      "with all of your friends today because it helps us out a lot."
    def para(seed: Long) = (1 to 4).map(r =>
      s"the alpha$seed$r and beta$seed$r of gamma$seed$r to delta$seed$r " +
        s"in epsilon$seed$r a zeta$seed$r").mkString(" ") + "."
    def page(id: Long): (Long, String, String) = {
      // ids 0,5,10,15,20,25 share page 0 (cross-batch url dups); other
      // pages are unique per doc. ids ≡ 6 (mod 7) land on the blocklisted
      // domain (incl. 20 and 27 in the last batch); page 22 is robots-
      // disallowed on site0; 21 exact-dups 11's content after the cut.
      val pg = if (id % 5 == 0) 0L else id
      val host = if (id % 7 == 6) "badsite.com" else s"site${pg % 2}.com"
      val url = (id % 3) match {
        case 0 => s"https://www.$host/p/$pg?utm_k=9"
        case 1 => s"HTTPS://$host:443/p/$pg"
        case _ => s"https://$host/p/$pg#frag"
      }
      val contentSeed = if (id == 21L) 11L else id
      val body = (if (id % 4 == 0) s"<p>$boiler</p>" else "") +
        s"<p>${para(contentSeed)}</p>"
      (id, url, "<html><head><title>t</title></head><body>" +
        "<div><a href=\"/home\">home nav link chrome</a></div>" +
        body + "</body></html>")
    }
    val batches = Seq(0L to 7L, 10L to 17L, 20L to 27L)
      .map(r => r.map(page).toDF("doc_id", "url", "html"))
    val rules = Seq(("site0.com", false, "/p/22"))
      .toDF("host", "allow", "path")
    val store = java.nio.file.Files.createTempDirectory("webstore").toString
    def step(b: org.apache.spark.sql.DataFrame, id: Long) =
      WebOps.webStoreStep(b, store, id, "url", "html", "doc_id",
        rules, Seq("badsite.com"), jtStops,
        stopwordsLow = 0.04, stopwordsHigh = 0.08)
    step(batches(0), 0L).collect()
    step(batches(1), 1L).collect()
    val last = step(batches(2), 2L)
    val lastRows = last.collect().map(_.toSeq).toSet
    // RETRY the latest batch: partitions overwrite, verdicts identical
    val retry = step(batches(2), 2L).collect().map(_.toSeq).toSet
    assert(retry == lastRows, "retried web batch must re-derive verdicts")

    // batch composite twin over the union, same algebra end to end
    val all = batches.reduce(_ unionAll _)
    val canonAll = all.select(col("doc_id"), col("html"),
      graft.pipeline.TextAnalysis.canonicalizeUrl(col("url")).as("canon"))
    val blockedV = graft.pipeline.TextAnalysis.blocklistFilter(
      canonAll, "canon", "doc_id", Seq("badsite.com"))
      .select(col("doc_id"), col("blocked"))
    val withHost = canonAll.select(col("doc_id"), col("html"), col("canon"),
      regexp_extract(col("canon"), "^[a-z0-9+.-]+://([^/?]+)", 1).as("host"),
      regexp_extract(col("canon"), "^[a-z0-9+.-]+://[^/?]+([^?]*)", 1)
        .as("__path"))
    val allowedV = WebOps.robotsVerdict(withHost, "doc_id", "host", "__path",
      rules, knownSmall = true).select(col("doc_id"), col("allowed"))
    val gated = withHost.join(blockedV, Seq("doc_id"))
      .join(allowedV, Seq("doc_id")).withColumn("__ufp", md5(col("canon")))
    val eligible = gated.where(!col("blocked") && col("allowed"))
    val elect = eligible.groupBy("__ufp").agg(min(col("doc_id")).as("__keep"))
    val urlStage = gated.join(elect, Seq("__ufp"), "left")
      .withColumn("url_first", !col("blocked") && col("allowed") &&
        col("doc_id") === col("__keep"))
    val content = graft.pipeline.TextAnalysis.justextContent(
        graft.pipeline.TextAnalysis.justextBlocks(
          urlStage.where(col("url_first")).select(col("doc_id"), col("html")),
          "html", "doc_id", jtStops, stopwordsLow = 0.04,
          stopwordsHigh = 0.08))
      .where(col("content_chars") > 0)
      .select(col("doc_id"), col("content"), col("content_chars"))
    val attrs = graft.pipeline.Curation.tagAttributes(
      content.select("doc_id", "content"), "content", "doc_id",
      Seq("the", "and", "of", "to", "a"),
      Seq("en" -> Seq("the", "and", "of")))
    val canonical = content.join(
      attrs.where(col("is_canonical")).select("doc_id"), Seq("doc_id"))
    val clean = graft.pipeline.Dedup.removeRepeatedSubstrings(
      canonical.select("doc_id", "content"), "content", "doc_id", minLen = 8)
    val cleanScored = clean.select(col("doc_id"),
      col("n_removed").as("cut_tokens"),
      graft.pipeline.TextAnalysis.tokenCount(col("clean_text"))
        .as("n_tokens"),
      graft.pipeline.TextAnalysis.qualityScore(col("clean_text"),
        Seq("the", "and", "of", "to", "a")).as("quality"))
    val twin = urlStage.select("doc_id", "canon", "blocked", "allowed",
        "url_first")
      .join(content.select("doc_id", "content_chars"), Seq("doc_id"), "left")
      .join(attrs.select("doc_id", "langid", "is_canonical"),
        Seq("doc_id"), "left")
      .join(cleanScored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("canon"), col("blocked"), col("allowed"),
        col("url_first"),
        coalesce(col("content_chars"), lit(0L)).as("content_chars"),
        coalesce(col("is_canonical"), lit(false)).as("is_canonical"),
        coalesce(col("cut_tokens"), lit(0L)).as("cut_tokens"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("quality"), lit(0.0)).as("quality"),
        coalesce(col("langid"), lit("")).as("langid"))
      .withColumn("kept", col("url_first") && col("is_canonical") &&
        col("n_tokens") >= 5L && col("quality") >= 0.0)
    val twinLast = twin.where(col("doc_id") >= 20L)
      .collect().map(_.toSeq).toSet
    assert(lastRows == twinLast,
      s"latest-batch stream verdicts must match the batch composite:\n" +
        s"stream-only: ${lastRows -- twinLast}\ntwin-only: ${twinLast -- lastRows}")
    // the funnel must be non-trivial: every stage fires somewhere
    val l = last.collect()
    assert(l.exists(_.getAs[Boolean]("blocked")), "blocklist must fire")
    assert(l.exists(!_.getAs[Boolean]("allowed")), "robots must fire")
    assert(l.exists(r => !r.getAs[Boolean]("url_first") &&
      !r.getAs[Boolean]("blocked") && r.getAs[Boolean]("allowed")),
      "cross-batch url dedup must fire")
    assert(l.exists(_.getAs[Long]("cut_tokens") > 0), "substring cut must fire")
    assert(l.exists(r => r.getAs[Boolean]("url_first") &&
      !r.getAs[Boolean]("is_canonical")), "exact content dedup must fire")
    assert(l.exists(_.getAs[Boolean]("kept")), "some docs must survive")
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

  test("resolveRedirects: truncated-walk doubling, cycle surfaces as hops=cap") {
    // a->b->c->d terminal (3 hops), x<->y 2-cycle; cap = 2^2 = 4
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x"))
      .toDF("src", "dst")
    val out = WebOps.resolveRedirects(edges, doublingRounds = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("a") === (("d", 3L, true)))  // terminal mid-doubling: exact hops
    assert(out("b") === (("d", 2L, true)))
    assert(out("c") === (("d", 1L, true)))
    // 2-cycle walked exactly cap steps lands back where it started
    assert(out("x") === (("x", 4L, false)))
    assert(out("y") === (("y", 4L, false)))
  }

  test("resolveRedirects: duplicate src edges collapse to min dst, one row per src") {
    // a recorded twice with conflicting dsts — min(dst)='b' wins; the
    // exact duplicate (b->c twice) must not fan out the walk
    val edges = Seq(("a", "z"), ("a", "b"), ("b", "c"), ("b", "c"))
      .toDF("src", "dst")
    val rows = WebOps.resolveRedirects(edges, doublingRounds = 2).collect()
    assert(rows.length === 2) // exactly one row per source
    val out = rows.map(r => r.getString(0) ->
      ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("a") === (("c", 2L, true)))
    assert(out("b") === (("c", 1L, true)))
  }

  test("redirectConflicts: flags genuinely conflicting sources, not re-fetches") {
    val edges = Seq(("a", "z"), ("a", "b"), ("b", "c"), ("b", "c"))
      .toDF("src", "dst")
    val rows = WebOps.redirectConflicts(edges).collect()
    assert(rows.length === 1) // b's exact-duplicate re-fetch is NOT a conflict
    assert(rows.head.getString(0) === "a")
    assert(rows.head.getLong(1) === 2L)
    assert(rows.head.getString(2) === "b") // the edge resolveRedirects takes
  }
}
