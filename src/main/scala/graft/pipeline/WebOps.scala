package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Web-crawl governance operators a corpus builder runs before any text
  * work: robots.txt allow/deny verdicts (the crawl-politeness gate),
  * HTML metadata extraction (title/description/canonical/lang — the
  * fields every page index and dedup-by-canonical pass needs), and
  * IBAN PII detection with the real mod-97 checksum (the financial
  * sibling of the Luhn gate in TextAnalysis.luhnScan).
  *
  * All three are scan-side column programs: parsing explodes lines or
  * extracts with RE2-compatible regexes, verdicts pre-combine per doc,
  * and nothing shuffles wider than (id, small-string) rows.
  */
object WebOps {

  // -------------------------------------------------------------------------
  // robots.txt
  // -------------------------------------------------------------------------

  /** Parse the `User-agent: *` sections of per-host robots.txt bodies
    * into (host, allow, path) prefix rules — the Robots Exclusion
    * Protocol (RFC 9309) subset every crawler applies first: group
    * lines into user-agent sections (a section = the run of lines after
    * one or more consecutive `User-agent:` lines), keep sections whose
    * agent set includes `*`, and collect their `Allow:` / `Disallow:`
    * directives. `*` wildcards and `$` end-anchors (RFC 9309 §2.2.3)
    * pass through verbatim here and are INTERPRETED by
    * [[robotsVerdict]]; empty-path `Disallow:` means "no restriction"
    * per the RFC and is dropped; directive names and agent tokens match
    * case-insensitively; `#` comments strip to end of line.
    *
    * Scale shape: one posexplode over robots lines (robots files are
    * KB-bounded), section assignment is a running count window
    * PARTITIONED BY HOST (line-count-bounded), output is the skinny
    * per-host rule table a broadcast join ships to every URL.
    */
  /** Comment-stripped, sectioned robots.txt lines: (host, idx, __dir,
    * __val, __sec) — shared front half of [[robotsRules]] and
    * [[robotsExtras]]. A new section starts at a `User-agent` line NOT
    * preceded by another (consecutive agent lines share one section). */
  private def robotsSectioned(robots: DataFrame, hostCol: String,
      bodyCol: String): DataFrame = {
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("idx", "__l0")))
      .withColumn("__l", trim(regexp_replace(col("__l0"), "#.*$", "")))
      .where(length(col("__l")) > 0)
      .withColumn("__dir", lower(trim(regexp_extract(col("__l"), "^([^:]+):", 1))))
      .withColumn("__val", trim(regexp_extract(col("__l"), "^[^:]+:(.*)$", 1)))
    val w = Window.partitionBy("host").orderBy("idx")
    lines
      .withColumn("__isUa", (col("__dir") === "user-agent").cast("int"))
      .withColumn("__prevUa", coalesce(lag(col("__isUa"), 1).over(w), lit(0)))
      .withColumn("__sec",
        sum(when(col("__isUa") === 1 && col("__prevUa") === 0, 1)
          .otherwise(0)).over(w))
  }

  /** The `User-agent: *` sections of one sectioned frame. */
  private def starSections(sectioned: DataFrame): DataFrame = sectioned
    .where(col("__dir") === "user-agent" && col("__val") === "*")
    .select(col("host"), col("__sec")).distinct()

  def robotsRules(robots: DataFrame, hostCol: String,
      bodyCol: String): DataFrame = {
    val sectioned = robotsSectioned(robots, hostCol, bodyCol)
    sectioned
      .where(col("__dir").isin("allow", "disallow") && length(col("__val")) > 0)
      .join(starSections(sectioned), Seq("host", "__sec"), "left_semi")
      .select(col("host"), (col("__dir") === "allow").as("allow"),
        col("__val").as("path"))
  }

  /** The non-path robots.txt surface a polite crawler consumes beside
    * the Allow/Disallow gate: per host, the `Crawl-delay` of the
    * `User-agent: *` sections (MINIMUM across values — the conservative
    * politeness choice; non-numeric values drop via null-safe cast;
    * null = no delay declared; other agents' sections are ignored like
    * in [[robotsRules]]) and every `Sitemap:` URL in the file (a GLOBAL
    * directive per the sitemaps protocol — section membership is
    * irrelevant), sorted and comma-joined. Same scale shape as the rule
    * parse: one posexplode over KB-bounded bodies, host-keyed windows,
    * skinny per-host output. Returns (host, crawl_delay, n_sitemaps,
    * sitemaps). */
  def robotsExtras(robots: DataFrame, hostCol: String,
      bodyCol: String): DataFrame = {
    val sectioned = robotsSectioned(robots, hostCol, bodyCol)
    val cd = sectioned
      .where(col("__dir") === "crawl-delay" && length(col("__val")) > 0)
      .join(starSections(sectioned), Seq("host", "__sec"), "left_semi")
      // try_cast, not cast: ANSI mode would fail the whole parse on one
      // malformed delay value (the DuckDB mirror is TRY_CAST)
      .groupBy("host")
      .agg(min(expr("try_cast(__val AS double)")).as("crawl_delay"))
    val sm = sectioned
      .where(col("__dir") === "sitemap" && length(col("__val")) > 0)
      .groupBy("host")
      .agg(count(lit(1)).as("n_sitemaps"),
        array_join(sort_array(collect_list(col("__val"))), ",").as("sitemaps"))
    robots.select(col(hostCol).as("host")).distinct()
      .join(cd, Seq("host"), "left")
      .join(sm, Seq("host"), "left")
      .select(col("host"), col("crawl_delay"),
        coalesce(col("n_sitemaps"), lit(0L)).as("n_sitemaps"),
        coalesce(col("sitemaps"), lit("")).as("sitemaps"))
  }

  /** True iff the rule path is a plain literal prefix — no `*`
    * wildcard, no trailing `$` anchor — and matching can stay on the
    * cheap `startsWith` path. */
  private def robotsIsLiteral(path: Column): Column =
    !path.contains("*") && !path.endsWith("$")

  /** RE2-safe anchored regex for one robots.txt path pattern (RFC 9309
    * §2.2.3): a trailing `$` anchors the end of the path, `*` matches
    * any character run, everything else is literal (regex
    * metacharacters escape). Identical construction in java.util.regex
    * and RE2, so the DuckDB oracle mirrors it byte-for-byte. A `$`
    * anywhere but the end is literal (the reference-parser convention —
    * only the FINAL character can anchor). */
  private[graft] def robotsPathRegex(path: Column): Column = {
    val anchored = path.endsWith("$")
    val core = when(anchored, path.substr(lit(1), length(path) - 1))
      .otherwise(path)
    val escaped = regexp_replace(core, "([.^$|()\\[\\]{}+?\\\\])", "\\\\$1")
    val wild = regexp_replace(escaped, "\\*", ".*")
    concat(lit("^"), wild, when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Allow/deny verdict per URL under the parsed rules —
    * MOST-SPECIFIC-MATCH-WINS (specificity = rule-path octet count, the
    * RFC 9309 §2.2.2 rule) with Allow beating Disallow on equal length,
    * and no matching rule = allowed. Rules match as path prefixes with
    * RFC 9309 §2.2.3 special characters: `*` matches any character run
    * and a trailing `$` anchors the end of the path; literal rules stay
    * on the codegen'd `startsWith` fast path and wildcard rules pay a
    * literal-prefix prefilter before the anchored regex probe.
    *
    * `urls` carries (idCol, hostCol, pathCol); the rule table broadcasts
    * when provably under [[BatchStore.ProbeBroadcastCap]] (per-host rule
    * tables are small, but a many-million-host crawl shuffles instead of
    * failing — pass `knownSmall = true` to skip the cardinality probe
    * job when the caller already bounds the table) and the verdict is
    * one pre-combined max(struct(len, allow)) per URL. */
  def robotsVerdict(urls: DataFrame, idCol: String, hostCol: String,
      pathCol: String, rules: DataFrame,
      knownSmall: Boolean = false): DataFrame = {
    // regex + literal-prefix columns build ONCE PER RULE on the small
    // side of the join, never per (url, rule) pair
    val prepped = rules.select(col("host"), col("allow"), col("path"),
      robotsIsLiteral(col("path")).as("__lit"),
      robotsPathRegex(col("path")).as("__rx"),
      regexp_extract(col("path"), "^([^*$]*)", 1).as("__pfx"))
    val side = if (knownSmall) broadcast(prepped)
      else BatchStore.probeSide(prepped)
    val hit = when(col("__lit"), col("__p").startsWith(col("path")))
      // cheap literal-prefix prefilter short-circuits the per-pair
      // regex for the common non-matching case
      .otherwise(col("__p").startsWith(col("__pfx")) &&
        regexp_like(col("__p"), col("__rx")))
    // left join keeps every URL (a host with rules but no MATCHING rule
    // must still verdict as allowed, not vanish); non-matching rule rows
    // null out under the conditional max instead of filtering. The rule
    // table broadcast is CAP-GUARDED (the r14 broadcast-cliff rule): a
    // pathological crawl with millions of hosts falls back to a shuffled
    // host-keyed join instead of failing
    val matched = urls.select(col(idCol).as("__id"), col(hostCol).as("host"),
        col(pathCol).as("__p"))
      .join(side, Seq("host"), "left")
      .groupBy("__id", "host", "__p")
      // specificity in OCTETS (RFC 9309 §2.2.2 counts octets, not
      // characters — they diverge on non-ASCII rule paths)
      .agg(max(when(col("path").isNotNull && hit,
        struct(octet_length(col("path")).as("l"), col("allow").as("a"))))
        .as("__m"))
    matched.select(col("__id").as(idCol), col("host"), col("__p").as(pathCol),
      coalesce(col("__m.a"), lit(true)).as("allowed"),
      coalesce(col("__m.l"), lit(0)).cast(LongType).as("rule_len"))
  }

  // -------------------------------------------------------------------------
  // HTML metadata
  // -------------------------------------------------------------------------

  /** Attribute value with MATCHED quotes: a double-quoted value may
    * contain apostrophes and vice versa (a mixed character class would
    * silently truncate "Tom's guide" at the apostrophe). The two
    * extracts can't be one regex (RE2/Java non-participating groups both
    * return '', indistinguishable from an empty value) — so the
    * double-quoted FORM's PRESENCE picks the branch: attr="" returns ''
    * rather than falling through to some later single-quoted attribute
    * on the same tag. */
  private def attrAfter(tag: Column, attr: String): Column = {
    val dq = regexp_extract(tag, "(?i)" + attr + "\\s*=\\s*\"([^\"]*)\"", 1)
    val sq = regexp_extract(tag, "(?i)" + attr + "\\s*=\\s*'([^']*)'", 1)
    when(tag.rlike("(?i)" + attr + "\\s*=\\s*\""), dq).otherwise(sq)
  }

  /** Page metadata every index/canonical-dedup pass wants, extracted
    * scan-side: first `<title>`, `<meta name=description>` content,
    * `<link rel=canonical>` href, `<html lang=…>`, `<meta
    * property=og:title>` content. Attribute ORDER inside a tag is free
    * (the tag is located by its identifying attribute, then the value
    * attribute extracts from the matched tag text). `decodeValues`
    * composes the canonical entity decode
    * ([[graft.functions.HtmlVisible.Entities]]) onto every extracted
    * value — OFF by default (raw metadata joins byte-faithfully against
    * other raw extractions), ON for any tier that GROUPS on these
    * fields (title dedup, canonical-URL dedup: "&amp;"-encoded values
    * must collapse with their decoded twins). Missing fields return
    * empty strings, never null, so downstream group-bys are total. */
  def htmlMeta(docs: DataFrame, htmlCol: String, idCol: String,
      decodeValues: Boolean = false): DataFrame = {
    def maybeDecode(c: Column): Column =
      if (decodeValues) TextAnalysis.decodeEntities(c) else c
    val h = col(htmlCol)
    val title = regexp_replace(
      trim(regexp_extract(h, "(?is)<title[^>]*>(.*?)</title>", 1)),
      "\\s+", " ")
    val metaDesc = attrAfter(
      regexp_extract(h,
        "(?is)(<meta\\s[^>]*name\\s*=\\s*[\"']description[\"'][^>]*>)", 1),
      "content")
    val canonical = attrAfter(
      regexp_extract(h,
        "(?is)(<link\\s[^>]*rel\\s*=\\s*[\"']canonical[\"'][^>]*>)", 1),
      "href")
    val lang = attrAfter(
      regexp_extract(h, "(?is)(<html[^>]*>)", 1), "\\slang")
    val ogTitle = attrAfter(
      regexp_extract(h,
        "(?is)(<meta\\s[^>]*property\\s*=\\s*[\"']og:title[\"'][^>]*>)", 1),
      "content")
    docs.select(col(idCol).as("doc_id"), maybeDecode(title).as("title"),
      maybeDecode(metaDesc).as("meta_description"),
      maybeDecode(canonical).as("canonical_url"),
      maybeDecode(lang).as("lang"), maybeDecode(ogTitle).as("og_title"))
  }

  /** schema.org structured-data extraction: every
    * `<script type="application/ld+json">…</script>` block becomes a row
    * (doc_id, block_idx, is_valid, jtype, name) — the entity metadata
    * (Article/Product/…) a web pipeline mines for provenance and
    * document typing. Blocks NORMALIZE first (trailing `;`/whitespace
    * stripped — the common real-page artifact), then malformed JSON
    * yields is_valid = false with null fields, never an error.
    * Validity caveat (measured, r15): every SparkSQL JSON reader —
    * get_json_object, from_json, try_parse_json — tolerates trailing
    * bytes after the first complete value, while a strict grammar
    * (DuckDB json_valid) rejects them; normalization closes the gap for
    * the artifact that actually occurs, and a multi-value block (rare,
    * malformed HTML) reads VALID here with fields from the first value —
    * lenient-by-design like the rest of Spark's JSON surface.
    * Scan-side regexp extraction + codegen'd JSON path reads. */
  def ldJson(docs: DataFrame, htmlCol: String, idCol: String): DataFrame = {
    val pat = "(?is)<script\\s[^>]*type\\s*=\\s*[\"']application/ld\\+json[\"'][^>]*>(.*?)</script>"
    docs.select(col(idCol).as("doc_id"),
        posexplode(regexp_extract_all(col(htmlCol), lit(pat), lit(1)))
          .as(Seq("block_idx", "__j0")))
      .withColumn("__j", regexp_replace(col("__j0"), "[;\\s]+$", ""))
      .select(col("doc_id"), col("block_idx").cast(LongType).as("block_idx"),
        get_json_object(col("__j"), "$").isNotNull.as("is_valid"),
        get_json_object(col("__j"), "$['@type']").as("jtype"),
        get_json_object(col("__j"), "$['name']").as("name"))
  }

  /** Publication-date extraction — the knowledge-cutoff / freshness
    * signal every dated-corpus curation needs (the htmldate/trafilatura
    * problem, deterministic core): sources probe in fixed precedence and
    * the first VALIDATED hit wins —
    *   1. `og` — `<meta property="article:published_time">` content;
    *   2. `ldjson` — the first ld+json block's `datePublished`;
    *   3. `time` — the first `<time datetime=…>`;
    *   4. `url` — a `/YYYY/MM/DD/` (day defaults to 01 for `/YYYY/MM/`)
    *      path segment, years 1990-2029.
    * Values normalize to the ISO `YYYY-MM-DD` prefix and must match it
    * structurally (month 01-12, day 01-31) or the probe falls through —
    * a malformed date never wins over a valid lower-precedence one.
    * Scan-side regex + JSON path reads, zero shuffle. Returns
    * (doc_id, pub_date, date_source) with nulls when nothing validates. */
  def pubDate(docs: DataFrame, htmlCol: String, urlCol: String,
      idCol: String): DataFrame = {
    val h = col(htmlCol)
    def isoPrefix(c: Column): Column = {
      val d = substring(c, 1, 10)
      when(d.rlike("^\\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\\d|3[01])$"), d)
    }
    val og = isoPrefix(attrAfter(regexp_extract(h,
      "(?is)(<meta\\s[^>]*property\\s*=\\s*[\"']article:published_time[\"'][^>]*>)",
      1), "content"))
    val ld = isoPrefix(get_json_object(
      regexp_replace(regexp_extract(h,
        "(?is)<script\\s[^>]*type\\s*=\\s*[\"']application/ld\\+json[\"'][^>]*>(.*?)</script>",
        1), "[;\\s]+$", ""),
      "$.datePublished"))
    val tm = isoPrefix(attrAfter(regexp_extract(h,
      "(?is)(<time\\s[^>]*datetime\\s*=\\s*[\"'][^\"']*[\"'][^>]*>)", 1),
      "datetime"))
    val um = regexp_extract(col(urlCol),
      "/((?:199\\d|20[0-2]\\d))/(0[1-9]|1[0-2])(?:/(0[1-9]|[12]\\d|3[01]))?(/|$)",
      0)
    val uy = regexp_extract(um, "/(\\d{4})/", 1)
    val umo = regexp_extract(um, "/\\d{4}/(\\d{2})", 1)
    val ud = regexp_extract(um, "/\\d{4}/\\d{2}/(\\d{2})", 1)
    val urlDate = when(uy =!= "",
      concat(uy, lit("-"), umo, lit("-"), when(ud =!= "", ud).otherwise("01")))
    docs.select(col(idCol).as("doc_id"),
      coalesce(og, ld, tm, urlDate).as("pub_date"),
      when(og.isNotNull, "og").when(ld.isNotNull, "ldjson")
        .when(tm.isNotNull, "time").when(urlDate.isNotNull, "url")
        .as("date_source"))
  }

  /** The built-in soft-404 pattern pack, as (pattern, anchor) rows —
    * the CONFIG DEFAULT a deployment extends with per-language packs.
    * Anchors (see [[soft404]]): `start` patterns must open the title as
    * a word ("404 Not Found" yes, "Post 404 review" no — the
    * false-positive surface a bare substring probe has), `word` patterns
    * match on word boundaries anywhere in the title, `phrase` patterns
    * substring-match the whole (title + lead text) probe. */
  val DefaultSoft404Patterns: Seq[(String, String)] = Seq(
    "404" -> "start", "error 404" -> "word", "access denied" -> "word",
    "forbidden" -> "word", "page not found" -> "phrase",
    "not found" -> "phrase", "error 500" -> "phrase")

  /** Soft-404 / error-page detection — crawls return thousands of
    * HTTP-200 pages whose CONTENT is an error ("page not found", login
    * walls, access denied); they poison a corpus because every quality
    * gate sees short clean prose. `patterns` is a CONFIG TABLE of
    * (pattern, anchor) rows — lowercase patterns with three anchor
    * classes: `start` = word-boundary match at the START of the lowered
    * title (the cheap "404" probe, anchored so "Post 404 review" stays
    * clean), `word` = word-boundary match anywhere in the lowered title,
    * `phrase` = substring anywhere in the lowered (title + `leadChars`
    * of visible text) probe. `<script>`/`<style>` bodies strip before
    * the probe (inline JS/CSS neither consumes the lead budget nor
    * false-positives via string literals). Remaining false-positive surface
    * (documented): a `phrase` pattern still matches prose in the lead
    * ("the file was not found" trips "not found") — keep `phrase` packs
    * to unambiguous error boilerplate and anchor everything else.
    *
    * Output is the t75 blocklist shape (matched — distinct hits, sorted
    * — n_matched, soft404) so downstream config filters compose
    * identically. Scale shape: the pack pre-aggregates to ONE row of
    * per-anchor arrays and broadcasts (plan-O(1), the domainTrust
    * 1-row-crossJoin pattern); the per-document probe is scan-side,
    * zero shuffle. Packs are config-bounded by contract; pass
    * `knownSmall = false` to cap-guard an unvetted table (packs beyond
    * the cap belong in [[TextAnalysis.blocklistFilter]]'s Aho–Corasick
    * path, not a per-pattern regex probe). */
  def soft404(docs: DataFrame, htmlCol: String, idCol: String,
      patterns: DataFrame, leadChars: Int = 200,
      knownSmall: Boolean = true): DataFrame = {
    if (!knownSmall)
      require(BatchStore.fitsBroadcast(patterns),
        "soft404 pattern pack exceeds the broadcast cap — use " +
          "blocklistFilter (Aho-Corasick) for corpus-scale phrase lists")
    // regex-escape a pattern literal (RE2-safe class, mirrored in the
    // oracle) so config text never injects regex syntax; escapes and
    // anchors build ONCE in the packed config row, never per (doc,
    // pattern) pair — anchored title patterns ride as (pattern, regex)
    // structs so the hit report keeps the raw pattern
    def esc(p: Column): Column =
      regexp_replace(p, "([.^$|()\\[\\]{}+?*\\\\])", "\\\\$1")
    def rxPair(anchor: String, prefix: String, suffix: String): Column =
      sort_array(collect_list(when(lower(col("anchor")) === anchor,
        struct(lower(col("pattern")).as("p"),
          concat(lit(prefix), esc(lower(col("pattern"))), lit(suffix))
            .as("r")))))
    val packed = patterns.agg(
      rxPair("start", "^", "\\b").as("__sp"),
      rxPair("word", "\\b", "\\b").as("__wp"),
      sort_array(collect_list(when(lower(col("anchor")) === "phrase",
        lower(col("pattern"))))).as("__pp"))
    // script/style bodies strip FIRST (the htmlExtract/justext rule):
    // inline JS/CSS must neither consume the lead-probe budget nor
    // false-positive via string literals
    val h = TextAnalysis.stripScriptStyle(col(htmlCol))
    val title = regexp_replace(
      trim(regexp_extract(h, "(?is)<title[^>]*>(.*?)</title>", 1)),
      "\\s+", " ")
    val visible = trim(regexp_replace(
      regexp_replace(h, "<[^>]*>", " "), "\\s+", " "))
    val titleL = lower(title)
    val probe = concat(titleL, lit(" | "),
      lower(substring(visible, 1, leadChars)))
    def titleHits(arr: Column): Column = transform(
      filter(arr, e => regexp_like(titleL, e.getField("r"))),
      _.getField("p"))
    val hits = sort_array(array_distinct(concat(
      titleHits(col("__sp")), titleHits(col("__wp")),
      filter(col("__pp"), p => probe.contains(p)))))
    docs.crossJoin(broadcast(packed))
      .select(col(idCol).as("doc_id"), title.as("title"),
        array_join(hits, ",").as("matched"),
        size(hits).cast(LongType).as("n_matched"),
        (size(hits) > 0).as("soft404"))
  }

  /** Sitemap XML parsing — the crawl-frontier feed [[robotsExtras]]'
    * sitemap URLs point at: every `<url>` entry of a urlset becomes one
    * (host, url_idx, loc, lastmod, priority) row. `loc` entity-decodes
    * (sitemap XML escapes `&` as `&amp;` — query-string URLs would
    * otherwise never join the fetch log); a loc-less entry keeps its
    * position with loc = '' (total, the htmlMeta rule); `lastmod` stays
    * a raw string (W3C datetime variants are downstream's parse),
    * `priority` is a null-safe double. Scan-side explode + extracts;
    * sitemap files are spec-capped at 50k entries / 50 MB so per-row
    * work is bounded. */
  def sitemapUrls(df: DataFrame, hostCol: String,
      xmlCol: String): DataFrame = {
    val entries = df.select(col(hostCol).as("host"),
      posexplode(regexp_extract_all(col(xmlCol),
        lit("(?is)<url>(.*?)</url>"), lit(1))).as(Seq("url_idx", "__e")))
    def tagOf(name: String): Column =
      trim(regexp_extract(col("__e"), s"(?is)<$name>(.*?)</$name>", 1))
    entries.select(col("host"), col("url_idx").cast(LongType).as("url_idx"),
      TextAnalysis.decodeEntities(tagOf("loc")).as("loc"),
      tagOf("lastmod").as("lastmod"),
      expr("try_cast(regexp_extract(__e, '(?is)<priority>(.*?)</priority>', 1) AS double)")
        .as("priority"))
  }

  /** Anchor-text pair mining — the (query, document) training-pair
    * extractor behind anchor-text retrieval corpora (anchor text is a
    * human-written query for the page it links to): every absolute-href
    * anchor yields (anchor_text, target), navigation boilerplate drops
    * (a configurable lowered-text blocklist plus a minimum token
    * count), and identical pairs collapse with a frequency — the mined
    * pair's weight. Anchor text is tag-stripped, entity-decoded, and
    * whitespace-collapsed; hrefs extract with a simple quoted-value
    * class (URLs with embedded quotes are out of scope — documented);
    * target canonicalization composes downstream
    * ([[TextAnalysis.canonicalizeUrl]], the t52 row). Scale shape:
    * extraction is scan-side; only the skinny (text, target) pairs
    * reach the one pre-combined groupBy. Returns (anchor_text, target,
    * n_pairs). */
  def anchorPairs(docs: DataFrame, htmlCol: String, idCol: String,
      minTokens: Int = 2,
      boilerplate: Seq[String] = Seq("click here", "read more", "more",
        "next", "previous", "home")): DataFrame = {
    val anchors = docs.select(col(idCol).as("doc_id"),
      explode(regexp_extract_all(col(htmlCol),
        lit("(?is)<a\\s[^>]*>.*?</a>"), lit(0))).as("__a"))
    val href = regexp_extract(col("__a"),
      "(?is)href\\s*=\\s*[\"']([^\"']*)[\"']", 1)
    val inner = regexp_extract(col("__a"), "(?is)^<a[^>]*>(.*)</a>$", 1)
    val text = regexp_replace(trim(TextAnalysis.decodeEntities(
      regexp_replace(inner, "<[^>]*>", ""))), "\\s+", " ")
    anchors.select(text.as("anchor_text"), href.as("target"))
      .where(col("target").rlike("^https?://") &&
        size(split(col("anchor_text"), " ")) >= minTokens &&
        !lower(col("anchor_text")).isin(boilerplate.map(_.toLowerCase): _*))
      .groupBy("anchor_text", "target")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** The HTTP head/body split rule — everything before the first blank
    * line (CRLF or LF). ONE definition shared by [[httpHead]] and
    * [[robotsMeta]] so the two can never disagree on what counts as a
    * header. */
  private val HeadSplitRegex = "(?s)^(.*?)(\\r?\\n\\r?\\n|$)"

  /** HTTP response-head parsing — the ingest triage between raw fetch
    * bytes and the HTML pipeline: status line (code + reason), media
    * type (lowered, parameters stripped), charset parameter
    * (case-insensitive, quoted or bare — the decode hint), and header
    * count. Head = everything before the first blank line (CRLF or LF);
    * a malformed status line yields null status with empty fields,
    * never an error. Scan-side regexes, zero shuffle. Returns (id,
    * status, reason, content_type, charset, n_headers). */
  def httpHead(df: DataFrame, rawCol: String, idCol: String): DataFrame = {
    val head = regexp_extract(col(rawCol), HeadSplitRegex, 1)
    val status = expr(
      s"try_cast(regexp_extract($rawCol, '^HTTP/[0-9.]+ ([0-9]{3})', 1) AS bigint)")
    val reason = trim(regexp_extract(col(rawCol),
      "^HTTP/[0-9.]+ [0-9]{3} ([^\\r\\n]*)", 1))
    val ctHeader = regexp_extract(head,
      "(?im)^content-type:\\s*([^\\r\\n]*)", 1)
    val mediaType = lower(trim(regexp_extract(ctHeader, "^([^;]*)", 1)))
    val charset = lower(regexp_extract(ctHeader,
      "(?i)charset\\s*=\\s*\"?([A-Za-z0-9_.:-]+)\"?", 1))
    val nHeaders = size(filter(split(head, "\r?\n"),
      l => l.rlike("^[A-Za-z][A-Za-z0-9-]*:")))
    df.select(col(idCol).as("doc_id"), status.as("status"),
      reason.as("reason"), mediaType.as("content_type"),
      charset.as("charset"), nHeaders.cast(LongType).as("n_headers"))
  }

  /** URL-structure bitext candidate pairing — the ParaCrawl-style
    * document-alignment prefilter: two pages whose URLs differ ONLY in a
    * language path segment ("/en/" vs "/fr/") are translation candidates
    * (the margin-based miner t34 then scores them; this stage needs no
    * embeddings at all). Extracts the first path segment matching a
    * caller-supplied language-code set, keys each page by the URL with
    * that segment removed, keeps ONE page per (key, lang) (min id —
    * recrawls collapse), and emits all cross-language pairs per key.
    * Scale shape: the join key is a skinny string (the segment-free
    * URL), per-key fan-out is bounded by |langs| BY CONSTRUCTION (one
    * survivor per lang) — never a star join. Returns (url_key, lang_a,
    * id_a, lang_b, id_b) with lang_a < lang_b. */
  def urlBitextPairs(pages: DataFrame, urlCol: String, idCol: String,
      langs: Seq[String]): DataFrame = {
    require(langs.nonEmpty && langs.forall(_.matches("[a-z]{2}")))
    val pat = "^(https?://[^/]+)/(" + langs.mkString("|") + ")(/.*|$)"
    val withLang = pages.select(col(idCol).as("id"), col(urlCol).as("url"))
      .withColumn("__lang", regexp_extract(col("url"), pat, 2))
      .where(col("__lang") =!= "")
      .withColumn("url_key", concat(
        regexp_extract(col("url"), pat, 1),
        regexp_extract(col("url"), pat, 3)))
    val canon = withLang.groupBy(col("url_key"), col("__lang"))
      .agg(min(col("id")).as("id"))
    val a = canon.select(col("url_key"), col("__lang").as("lang_a"),
      col("id").as("id_a"))
    val b = canon.select(col("url_key"), col("__lang").as("lang_b"),
      col("id").as("id_b"))
    a.join(b, Seq("url_key")).where(col("lang_a") < col("lang_b"))
      .select("url_key", "lang_a", "id_a", "lang_b", "id_b")
  }

  /** Politeness-aware fetch scheduling — turns the crawl frontier into
    * per-host fetch slots honoring each host's crawl delay (the t90b
    * crawl-delay surface): URLs rank per host by (priority DESC, url),
    * the top `frontierCap` survive (a mega-host must not monopolize the
    * fetch budget), and slot k fetches at k·delay seconds. The per-host
    * window mirrors physical reality — politeness makes a host's fetches
    * SERIAL, so window cardinality is exactly the per-host frontier cap,
    * never corpus-sized. `slot_s` keeps the delay column's numeric type
    * (no silent floor — a fractional Crawl-delay like 0.5 must not
    * collapse adjacent slots). Returns (url, host, rank, slot_s). */
  def fetchSchedule(frontier: DataFrame, urlCol: String, hostCol: String,
      delayCol: String, priorityCol: String,
      frontierCap: Int = 1000): DataFrame = {
    require(frontierCap > 0)
    val w = Window.partitionBy(col(hostCol))
      .orderBy(col(priorityCol).desc, col(urlCol))
    frontier.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= frontierCap)
      .select(col(urlCol).as("url"), col(hostCol).as("host"), col("rank"),
        ((col("rank") - 1) * col(delayCol)).as("slot_s"))
  }

  /** Redirect-chain resolution — the crawl canonicalization step between
    * fetch and URL dedup: every 3xx source resolves to its final landing
    * URL so duplicates/authority transfer to the target (composes with
    * the t52 canonicalizer and the urlfps store). POINTER DOUBLING, not
    * a linear walk: round k composes the current mapping with itself, so
    * a hop cap of 2^r needs r skinny self-joins (8 hops = 3 rounds) —
    * the log-round scale shape; each round `localCheckpoint`s (the
    * iterative-operator rule). Exact semantics: the walk truncates at
    * the first terminal (no outgoing edge) or at 2^rounds hops — a
    * cycle never terminates, so it surfaces as hops = cap with
    * `resolved` = false (final URL still has an outgoing edge). Returns
    * one row per redirect SOURCE: (src, final_url, hops, resolved).
    * The edge set is made functional up front — duplicate rows for one
    * src collapse to the lexicographically smallest dst (a real fetch
    * log can record the same 3xx twice; without the collapse every
    * self-join round would fan the duplicates out multiplicatively and
    * break the one-row-per-source contract). A source recorded with
    * GENUINELY different targets (a flapping redirect) therefore
    * resolves along the min-dst edge deterministically — audit those
    * sources with [[redirectConflicts]] before trusting their final
    * URLs. */
  def resolveRedirects(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", doublingRounds: Int = 3): DataFrame = {
    require(doublingRounds >= 1 && doublingRounds <= 16)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .groupBy("src").agg(min("dst").as("dst"))
      .localCheckpoint()
    var st = e.select(col("src"), col("dst").as("cur"), lit(1L).as("hops"))
    for (_ <- 1 to doublingRounds) {
      val jump = st.select(col("src").as("__jsrc"), col("cur").as("__jcur"),
        col("hops").as("__jh"))
      st = st.join(jump, st("cur") === jump("__jsrc"), "left")
        .select(col("src"), coalesce(col("__jcur"), col("cur")).as("cur"),
          (col("hops") + coalesce(col("__jh"), lit(0L))).as("hops"))
        .localCheckpoint()
    }
    st.join(e.select(col("src").as("__t")).distinct()
        .withColumn("__has", lit(true)), st("cur") === col("__t"), "left")
      .select(col("src"), col("cur").as("final_url"), col("hops"),
        coalesce(col("__has"), lit(false)).as("__has"))
      .withColumn("resolved", !col("__has")).drop("__has")
  }

  /** Sources whose fetch log records CONFLICTING redirect targets — the
    * audit surface for [[resolveRedirects]]'s deterministic min-dst
    * collapse (exact-duplicate re-fetches of the same 3xx are not
    * conflicts). Returns (src, n_dsts, min_dst) with n_dsts >= 2; one
    * distinct + one groupBy over the skinny edge list. */
  def redirectConflicts(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame =
    edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .groupBy("src")
      .agg(count(lit(1)).as("n_dsts"), min("dst").as("min_dst"))
      .where(col("n_dsts") >= 2)

  /** Hex-space structural UTF-8 validator: each alternative consumes one
    * complete sequence (ASCII / 2- / 3- / 4-byte with the spec's
    * continuation ranges, surrogate range ED A0-BF and >U+10FFFF
    * excluded). Alternatives are disjoint on their first hex chars, so
    * java.util.regex matches without backtracking and RE2 is linear —
    * the same string works in both engines. */
  val Utf8ValidHex: String =
    "(?:[0-7].|(?:C[2-9A-F]|D.)[89AB].|E0[AB].[89AB].|ED[89].[89AB].|" +
      "E[1-9A-CEF].[89AB].[89AB].|F0[9AB].[89AB].[89AB].|" +
      "F[1-3][89AB].[89AB].[89AB].|F48.[89AB].[89AB].)*"

  /** Charset sniffing over opaque fetched bytes — the deterministic core
    * of the WARC-ingest encoding-detect stage (the mojibake audit t84 is
    * the post-hoc complement): BOM detection (UTF-32BE/LE before their
    * UTF-16 prefixes, then UTF-8), pure-ASCII probe, and full structural
    * UTF-8 validation — all regex over the hex encoding (the
    * mm_image_dims byte-plumbing precedent), so no engine ever attempts
    * a decode that can throw. Undetected non-UTF-8 bytes classify
    * `other-8bit` (the re-encode-from-legacy queue), never an error.
    * Returns (doc_id, charset, has_bom, is_ascii, utf8_valid, n_bytes).
    * Scan-side, zero shuffle. */
  def charsetSniff(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val hx = upper(hex(col(binCol)))
    val asciiOnly = hx.rlike("^(?:[0-7].)*$")
    val utf8Ok = hx.rlike("^" + Utf8ValidHex + "$")
    val charset = when(hx.startsWith("0000FEFF"), "utf-32be")
      .when(hx.startsWith("FFFE0000"), "utf-32le")
      .when(hx.startsWith("FFFE"), "utf-16le")
      .when(hx.startsWith("FEFF"), "utf-16be")
      .when(hx.startsWith("EFBBBF"), "utf-8")
      .when(asciiOnly, "ascii")
      .when(utf8Ok, "utf-8")
      .otherwise("other-8bit")
    val hasBom = hx.startsWith("0000FEFF") || hx.startsWith("FFFE") ||
      hx.startsWith("FEFF") || hx.startsWith("EFBBBF")
    df.select(col(idCol).as("doc_id"), charset.as("charset"),
      hasBom.as("has_bom"), asciiOnly.as("is_ascii"),
      utf8Ok.as("utf8_valid"),
      (length(hx) / 2).cast(LongType).as("n_bytes"))
  }

  /** Per-page robots directives — the indexability gate completing the
    * crawl-policy surface beside the robots.txt verdicts (t90), soft-404
    * probe (t101) and response-head triage (t105): every
    * `<meta name=robots content=…>` tag in the page (a page may carry
    * several) merges with every `X-Robots-Tag` response header (the
    * REP's meta/header convention) into one lowercased, comma-split,
    * trimmed, distinct, sorted directive list. Verdict columns follow
    * the spec: `none` expands to noindex+nofollow (but stays verbatim in
    * the lists); `noindex` from EITHER source kills indexability.
    * Scope pinned: user-agent-scoped X-Robots-Tag values
    * ("googlebot: noindex") pass through verbatim as a single token and
    * do NOT count as global directives (conservative — a UA-scoped
    * directive is not ours to apply). Scan-side regex only, zero
    * shuffle. Returns (doc_id, meta_directives, header_directives,
    * noindex, nofollow, indexable). */
  def robotsMeta(df: DataFrame, htmlCol: String, rawCol: String,
      idCol: String): DataFrame = {
    val head = regexp_extract(col(rawCol), HeadSplitRegex, 1)
    val metaTags = regexp_extract_all(col(htmlCol),
      lit("(?is)(<meta\\s[^>]*name\\s*=\\s*[\"']robots[\"'][^>]*>)"), lit(1))
    val metaContents = transform(metaTags, t =>
      when(t.rlike("(?i)content\\s*=\\s*\""),
        regexp_extract(t, "(?i)content\\s*=\\s*\"([^\"]*)\"", 1))
        .otherwise(regexp_extract(t, "(?i)content\\s*=\\s*'([^']*)'", 1)))
    val hdrVals = regexp_extract_all(head,
      lit("(?im)^x-robots-tag:\\s*([^\\r\\n]*)"), lit(1))
    def norm(vals: Column): Column = array_sort(array_distinct(
      filter(transform(flatten(transform(vals, v => split(lower(v), ","))),
        x => trim(x)), x => x =!= "")))
    val metaDirs = norm(metaContents)
    val hdrDirs = norm(hdrVals)
    val all = array_union(metaDirs, hdrDirs)
    val noindex = array_contains(all, "noindex") || array_contains(all, "none")
    val nofollow = array_contains(all, "nofollow") || array_contains(all, "none")
    df.select(col(idCol).as("doc_id"),
      array_join(metaDirs, ",").as("meta_directives"),
      array_join(hdrDirs, ",").as("header_directives"),
      noindex.as("noindex"), nofollow.as("nofollow"),
      (!noindex).as("indexable"))
  }

  // -------------------------------------------------------------------------
  // Streaming web-corpus program (the p12 composite as a store loop)
  // -------------------------------------------------------------------------

  /** One micro-batch of the STREAMING web-corpus program — the
    * operational face of the p12 batch composite, run under the
    * [[BatchStore]] contract:
    *
    *  1. canonicalize URL (t52 algebra) + domain blocklist (t75);
    *  2. robots.txt gate (t90 algebra; `rules` is the caller's
    *     pre-parsed config-scale table, broadcast);
    *  3. URL dedup ACROSS batches — first fetch of a canonical URL wins
    *     (url-fingerprint store, sub `urlfps`);
    *  4. jusText content extraction (t88 algebra) — chrome-only pages
    *     drop;
    *  5. attribute tagging + cross-batch exact-content dedup
    *     ([[Curation.attributeStoreStep]], sub `fingerprints`) — the
    *     p12 order: exact dedup BEFORE the substring cut, so a verbatim
    *     re-fetch never reaches the gram store (where its own grams
    *     would read as corpus repeats and cut both copies to nothing);
    *  6. corpus-wide exact-substring cut over the canonical survivors,
    *     incremental (the d23 machinery: `gramcounts` + blooms), with
    *     token/quality keep gates scored on the CUT text.
    *
    * Stream/batch contract: with doc_ids monotone across batches, a doc
    * arriving in the LATEST batch verdicts byte-identically to the batch
    * composite over the union (the stores hold exactly the union's prior
    * state) — pinned in WebOpsSpec. Earlier batches differ only where a
    * stream cannot rewrite history (content that only LATER becomes
    * corpus-repeated is cut from later arrivals, not retroactively —
    * the d21/d23 asymmetry).
    *
    * Retry contract: every sub-store excludes the in-flight batch id and
    * overwrites its own `batch_id=` partition; verdicts pin
    * (localCheckpoint) before their store writes, so an at-least-once
    * replay re-derives identical output. Returns one verdict row per
    * batch doc: (doc_id, canon, blocked, allowed, url_first,
    * content_chars, is_canonical, cut_tokens, n_tokens, quality,
    * langid, kept). */
  def webStoreStep(batch: DataFrame, storeDir: String, batchId: Long,
      urlCol: String, htmlCol: String, idCol: String,
      rules: DataFrame, blockedDomains: Seq[String],
      justextStopwords: Seq[String],
      stopwordsLow: Double = 0.30, stopwordsHigh: Double = 0.32,
      minSubstringLen: Int = 8,
      attrStopwords: Seq[String] = Seq("the", "and", "of", "to", "a"),
      langs: Seq[(String, Seq[String])] =
        Seq("en" -> Seq("the", "and", "of")),
      minTokens: Long = 5, minQuality: Double = 0.0,
      maxStoreParts: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val canon = batch.select(col(idCol).as("doc_id"),
      col(htmlCol).as("__html"),
      TextAnalysis.canonicalizeUrl(col(urlCol)).as("canon"))
    val blockedV = TextAnalysis.blocklistFilter(canon, "canon", "doc_id",
      blockedDomains).select(col("doc_id"), col("blocked"))
    val withHost = canon.select(col("doc_id"), col("__html"), col("canon"),
      regexp_extract(col("canon"), "^[a-z0-9+.-]+://([^/?]+)", 1).as("host"),
      regexp_extract(col("canon"), "^[a-z0-9+.-]+://[^/?]+([^?]*)", 1)
        .as("__path"))
    val allowedV = robotsVerdict(withHost, "doc_id", "host", "__path",
      rules, knownSmall = true).select(col("doc_id"), col("allowed"))
    val gated = withHost
      .join(blockedV, Seq("doc_id")).join(allowedV, Seq("doc_id"))
      .withColumn("__ufp", md5(col("canon")))
    val eligible = gated.where(!col("blocked") && col("allowed"))
    val batchUfps = eligible.select("__ufp").distinct().localCheckpoint()
    val emptyU = batch.limit(0).select(md5(col(urlCol)).as("__ufp"))
    // prior url fingerprints pruned to the batch's own set (cap-guarded
    // broadcast semi — the attribute-store idiom)
    val priorU = BatchStore.readStore(spark, storeDir, "urlfps", emptyU,
        batchId)
      .join(BatchStore.probeSide(batchUfps), Seq("__ufp"), "left_semi")
      .distinct()
    val electU = eligible.groupBy("__ufp").agg(min(col("doc_id")).as("__keep"))
    // verdicts for EVERY batch doc (blocked/disallowed rows keep their
    // flags; url_first is false for them)
    val urlStage = gated
      .join(electU, Seq("__ufp"), "left")
      .join(priorU.withColumn("__seen", lit(true)), Seq("__ufp"), "left")
      .select(col("doc_id"), col("__html"), col("canon"), col("blocked"),
        col("allowed"),
        (!col("blocked") && col("allowed") && col("doc_id") === col("__keep")
          && col("__seen").isNull).as("url_first"))
      .localCheckpoint() // pin before this batch's urlfps partition lands
    val survivors = urlStage.where(col("url_first"))
      .select(col("doc_id"), col("__html"))
    val content = TextAnalysis.justextContent(
        TextAnalysis.justextBlocks(survivors, "__html", "doc_id",
          justextStopwords, stopwordsLow = stopwordsLow,
          stopwordsHigh = stopwordsHigh))
      .where(col("content_chars") > 0)
      .select(col("doc_id"), col("content"), col("content_chars"))
      .localCheckpoint() // feeds the substring store AND the output join
    // exact dedup FIRST (the p12 order): attrs0 tags the justext content
    // and elects the cross-batch canonical copy per content fingerprint
    val attrs0 = Curation.attributeStoreStep(
      content.select("doc_id", "content"), storeDir, batchId,
      "content", "doc_id", attrStopwords, langs,
      maxStoreParts = maxStoreParts)
    val canonical = content
      .join(attrs0.where(col("is_canonical")).select("doc_id"), Seq("doc_id"))
    // substring cut over canonical survivors only; keep gates score the
    // CUT text scan-side (the Gopher-on-clean-text convention)
    val clean = Dedup.repeatedSubstringCleanStoreStep(
      canonical.select("doc_id", "content"), storeDir, "content", "doc_id",
      minSubstringLen, batchId, maxStoreParts)
    val cleanScored = clean.select(col("doc_id"),
      col("n_removed").as("cut_tokens"),
      TextAnalysis.tokenCount(col("clean_text")).as("n_tokens"),
      TextAnalysis.qualityScore(col("clean_text"), attrStopwords)
        .as("quality"))
    BatchStore.writeBatchPart(batchUfps, s"$storeDir/urlfps",
      s"$storeDir/compactions/urlfps", batchId)
    BatchStore.autoCompact(spark, s"$storeDir/urlfps",
      s"$storeDir/compactions/urlfps", maxStoreParts, batchId)(
      webUrlStoreCompact(spark, storeDir, _, _))
    urlStage.drop("__html")
      .join(content.select(col("doc_id"), col("content_chars")),
        Seq("doc_id"), "left")
      .join(attrs0.select(col("doc_id"), col("langid"),
        col("is_canonical")), Seq("doc_id"), "left")
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
        col("n_tokens") >= minTokens && col("quality") >= minQuality)
  }

  /** Fold committed url-fingerprint partitions (set store: distinct). */
  def webUrlStoreCompact(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, compactId: Long, upToBatchId: Long): Seq[Long] =
    BatchStore.compact(spark, s"$storeDir/urlfps",
      s"$storeDir/compactions/urlfps", None, compactId, upToBatchId,
      df => df.drop("batch_id").distinct())

  /** Compact every sub-store the web loop writes (urlfps + gramcounts +
    * content fingerprints) under one compaction id. */
  def webStoreCompact(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, compactId: Long, upToBatchId: Long): Seq[Long] =
    (webUrlStoreCompact(spark, storeDir, compactId, upToBatchId) ++
      Dedup.repeatedSubstringStoreCompact(spark, storeDir, compactId,
        upToBatchId) ++
      Curation.attributeStoreCompact(spark, storeDir, compactId,
        upToBatchId)).distinct

  // -------------------------------------------------------------------------
  // Domain trust scores
  // -------------------------------------------------------------------------

  /** Per-domain quality with BAYESIAN SHRINKAGE toward the corpus mean —
    * the domain-level filter tier of a web pipeline (a domain with 3
    * sampled pages must not out-rank one with 3,000 on raw mean):
    * shrunk = (sum_q + alpha * global_mean) / (n + alpha), all in exact
    * integer micro-units (per-doc quality floors to micro BEFORE the
    * order-free integer sums, the cross-engine determinism rule), so the
    * scores hash-match. `keep` = shrunk mean >= threshold.
    *
    * Scale shape: one pre-combined groupBy(domain) over (domain,
    * micro-quality) rows; the global mean is a 1-row aggregate broadcast
    * back — document text never reaches either exchange. */
  def domainTrust(docs: DataFrame, domainCol: String, qualityCol: String,
      alpha: Long = 10L, keepAtLeast: Double = 0.5): DataFrame = {
    require(alpha >= 0)
    val q = docs.select(col(domainCol).as("domain"),
      floor(col(qualityCol) * 1000000.0 + 0.5).cast(LongType).as("__qm"))
    val perDomain = q.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("__qm")).as("__sum"))
    val globalMean = q.agg(
      floor(sum(col("__qm")).cast("double") / count(lit(1)) + 0.5)
        .cast(LongType).as("__gm"))
    perDomain.crossJoin(broadcast(globalMean))
      .select(col("domain"), col("n_docs"),
        (floor(col("__sum").cast("double") / col("n_docs") + 0.5)
          .cast(LongType) / 1000000.0).as("mean_quality"),
        (floor((col("__sum") + lit(alpha) * col("__gm")).cast("double") /
          (col("n_docs") + alpha) + 0.5).cast(LongType) / 1000000.0)
          .as("shrunk_quality"),
        (col("__gm") / 1000000.0).as("global_mean"))
      .withColumn("keep", col("shrunk_quality") >= keepAtLeast)
  }

  // -------------------------------------------------------------------------
  // IBAN PII (ISO 13616 mod-97)
  // -------------------------------------------------------------------------

  /** mod-97 of the IBAN digit expansion of `s` (letters → 10..35, two
    * digits each), as one LEFT-TO-RIGHT integer fold — the fixed-order
    * fold both engines execute identically (`aggregate` here,
    * `list_reduce` in DuckDB; the pass@k / Luhn precedent). The
    * accumulator stays < 97·100 + 35 so Long never overflows. */
  def ibanMod97(s: Column): Column =
    aggregate(split(s, ""), lit(0L), (acc, ch) =>
      when(ch >= "0" && ch <= "9", (acc * 10 + (ascii(ch) - 48)) % 97)
        .otherwise((acc * 100 + (ascii(ch) - 55)) % 97))

  /** IBAN candidates per document with the REAL ISO 13616 verdict:
    * candidates match `[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}` on word
    * boundaries, each validates by moving the first four chars to the
    * end, expanding letters to two digits, and checking mod 97 == 1.
    * (Country-specific length tables are out of scope — documented; the
    * checksum alone rejects 96/97 of random candidates.) Output is one
    * row per candidate: (doc_id, iban, valid) — the PII audit shape of
    * TextAnalysis.luhnScan, scan-side end to end. */
  def ibanScan(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val cands = docs.select(col(idCol).as("doc_id"),
        explode(regexp_extract_all(col(textCol),
          lit("\\b([A-Z]{2}[0-9]{2}[A-Z0-9]{11,30})\\b"), lit(1))).as("iban"))
    cands.select(col("doc_id"), col("iban"),
      (ibanMod97(concat(substring(col("iban"), 5, 1000000),
        substring(col("iban"), 1, 4))) === 1).as("valid"))
  }
}
