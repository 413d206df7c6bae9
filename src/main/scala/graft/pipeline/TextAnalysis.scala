package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Text analysis for large-scale training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Column expressions (codegen'd, no UDFs) — at 100 TB these run scan-side
  * with zero shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: alpha runs, digit runs, and single punctuation
    * marks each count as one token (the usual pre-tokenizer shape). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0))).cast(DoubleType)
        / length(text).cast(DoubleType))
      .otherwise(lit(0.0))

  /** Fraction of tokens that are in the stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(lower(text))
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(stopwords: _*))).cast(DoubleType)
        / size(toks).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  def meanWordLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast(LongType))
        .cast(DoubleType) / size(toks).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length saturation + stopword evidence
    * − punctuation noise. Deterministic arithmetic, rounded for comparison. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast(DoubleType) / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 3.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    round(greatest(lit(0.0),
      lenScore * 0.4 + stopScore * 0.4 + (lit(1.0) - punctPenalty) * 0.2), 6)
  }

  /** Fraction of repeated word n-grams — the Gopher/RefinedWeb-style
    * repetition signal (1 − |distinct n-grams| / |n-grams|); high values
    * flag boilerplate/spam for quality filtering. Pure Column, zero
    * shuffle. (Dedup.wordShingles is the distinct variant of the same
    * n-gram builder.) */
  def repetitionFraction(text: Column, n: Int = 2): Column = {
    val toks = tokens(lower(text))
    val grams = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks) - k, lit(1))),
        (a, b) => concat(a, lit(" "), b))
    }
    val g = array_compact(grams) // zip_with pads the short side with nulls
    when(size(toks) >= n,
      round(lit(1.0) -
        size(array_distinct(g)).cast(DoubleType) / size(g).cast(DoubleType), 6))
      .otherwise(lit(0.0))
  }

  // ---------------------------------------------------------------------------
  // Gopher-style rule filter (published surface-statistic thresholds)
  // ---------------------------------------------------------------------------

  /** Non-empty lines of a document — trailing/interior blank lines dropped
    * so a trailing newline cannot shift the line-based ratios. */
  private def nonEmptyLines(text: Column): Column =
    filter(split(text, "\n"), l => trim(l) =!= "")

  /** Fraction of non-empty lines whose first non-blank character is a
    * bullet marker (`-`, `*`, `•`). */
  def bulletLineRatio(text: Column): Column = {
    val ls = nonEmptyLines(text)
    when(size(ls) > 0,
      size(filter(ls, l => substring(ltrim(l), 1, 1).isin("-", "*", "•")))
        .cast(DoubleType) / size(ls).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** Fraction of non-empty lines ending in an ellipsis (`...` or `…`). */
  def ellipsisLineRatio(text: Column): Column = {
    val ls = nonEmptyLines(text)
    when(size(ls) > 0,
      size(filter(ls, l =>
        rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
        .cast(DoubleType) / size(ls).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** Symbol-to-word ratio: `#` and `...` occurrences per whitespace word. */
  def symbolToWordRatio(text: Column): Column =
    (size(regexp_extract_all(text, lit("#"), lit(0))) +
      size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0))))
      .cast(DoubleType) / greatest(tokenCount(text), lit(1)).cast(DoubleType)

  /** Fraction of words containing at least one alphabetic character. */
  def alphaWordFraction(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast(DoubleType)
        / size(toks).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** The rule filter's required-word list (the published 8-word English
    * function-word set); a document must contain at least two distinct. */
  val requiredStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def requiredStopWordHits(text: Column): Column =
    size(array_intersect(array_distinct(tokens(lower(text))),
      array(requiredStopWords.map(lit): _*)))

  /** Gopher-style document-quality rule report — the rule-based filter
    * standard for web-scale pretraining corpora (Rae et al. 2021, appendix
    * A1.1 thresholds): per-document surface statistics, one boolean per
    * published rule, and the composite keep verdict. Pure Column
    * arithmetic, scan-side, zero shuffle; every ratio is a division of
    * exact integer counts so the report hash-matches across engines. */
  def gopherRuleReport(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id",
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val text = col(textCol)
    docs.select(col(idCol),
        tokenCount(text).cast(LongType).as("n_words"),
        round(meanWordLength(text), 6).as("mean_word_len"),
        round(symbolToWordRatio(text), 6).as("symbol_ratio"),
        round(bulletLineRatio(text), 6).as("bullet_ratio"),
        round(ellipsisLineRatio(text), 6).as("ellipsis_ratio"),
        round(alphaWordFraction(text), 6).as("alpha_frac"),
        requiredStopWordHits(text).cast(LongType).as("stop_hits"))
      .withColumn("ok_words", col("n_words").between(minWords, maxWords))
      .withColumn("ok_word_len", col("mean_word_len").between(3.0, 10.0))
      .withColumn("ok_symbols", col("symbol_ratio") < 0.1)
      .withColumn("ok_bullets", col("bullet_ratio") < 0.9)
      .withColumn("ok_ellipsis", col("ellipsis_ratio") < 0.3)
      .withColumn("ok_alpha", col("alpha_frac") >= 0.8)
      .withColumn("ok_stops", col("stop_hits") >= 2)
      .withColumn("keep",
        col("ok_words") && col("ok_word_len") && col("ok_symbols") &&
          col("ok_bullets") && col("ok_ellipsis") && col("ok_alpha") &&
          col("ok_stops"))
  }

  /** Language-ID by stopword-hit counting (n-gram heuristic): score each
    * language by distinct stopword hits, argmax with first-wins tie-break. */
  def langScores(text: Column, stopwordsByLang: Seq[(String, Seq[String])]): Seq[(String, Column)] = {
    val toks = array_distinct(tokens(lower(text)))
    stopwordsByLang.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
  }

  def langId(text: Column, stopwordsByLang: Seq[(String, Seq[String])]): Column = {
    val scores = langScores(text, stopwordsByLang)
    // first language whose score is >= all later ones (stable argmax)
    scores.zipWithIndex.foldRight(lit(scores.last._1): Column) {
      case (((lang, score), idx), acc) =>
        val laterScores = scores.drop(idx + 1).map(_._2)
        val isMax = laterScores.foldLeft(lit(true))((c, s) => c && score >= s)
        when(isMax, lit(lang)).otherwise(acc)
    }
  }

  /** Dedup normalization: lowercase, non-alphanumerics stripped. The ONE
    * definition shared by exact fingerprinting and prefix clustering so the
    * two can never silently diverge. */
  def normalizedText(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9]", "")

  /** Document fingerprint: md5 over the normalized text — the exact-dedup
    * key. For a codegen'd polynomial rolling hash see
    * [[graft.functions.RollingHash]]. */
  def fingerprint(text: Column): Column =
    md5(normalizedText(text))

  // ---------------------------------------------------------------------------
  // PII redaction
  // ---------------------------------------------------------------------------

  /** PII patterns kept RE2-compatible (no lookarounds/backrefs) so the same
    * pattern strings run in Spark (java.util.regex) and any RE2-based
    * verifier. Ordered: longest/most-specific first so e.g. an email is
    * redacted as EMAIL, not as a digit run inside it. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "IPV4"  -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "NUMID" -> "\\b\\d{7,}\\b")

  /** Scrub PII spans, replacing each with `<TYPE>`. Pure codegen'd
    * regexp_replace chain — scan-side, zero shuffle at any scale. */
  def piiRedact(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (tag, pat)) =>
      regexp_replace(acc, pat, s"<$tag>")
    }

  /** Count of PII spans per type (for corpus audit dashboards). */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    // count on the progressively-redacted text so overlapping patterns are
    // attributed once, matching piiRedact's first-wins ordering
    val redactedBefore = piiPatterns.indices.map { i =>
      piiPatterns.take(i).foldLeft(text) { case (acc, (tag, pat)) =>
        regexp_replace(acc, pat, s"<$tag>")
      }
    }
    piiPatterns.zip(redactedBefore).map { case ((tag, pat), base) =>
      tag -> size(regexp_extract_all(base, lit(pat), lit(0)))
    }
  }

  /** WordPiece-style tokenization fertility audit: greedy longest-match
    * segmentation of each word against a piece vocabulary (single
    * characters are the implicit fallback, so segmentation always
    * terminates), reported per document as pieces-per-word — THE
    * tokenizer-choice metric for a pretraining corpus (high fertility =
    * the tokenizer fragments this text; compare across sources/languages
    * before committing a vocab).
    *
    * The greedy match runs as a codegen'd `aggregate` fold over character
    * positions: each step consumes the longest vocabulary piece at the
    * cursor (per-length map literals, so a short tail can never
    * mis-match a longer piece) or one character. Segmentation is computed
    * once per DISTINCT word (vocabulary-cardinality work — the surprisal
    * shape) and joins back to pre-combined per-doc word counts; no UDF,
    * no shuffle wider than (doc, word, count).
    *
    * Returns (idCol, n_words, n_pieces, fertility). */
  def wordpieceFertility(docs: DataFrame, textCol: String, idCol: String,
      vocab: Seq[String]): DataFrame = {
    require(vocab.forall(_.length >= 2), "vocab pieces must be multi-char")
    val pieceLens = vocab.map(_.length).distinct.sorted.reverse
    val mapsByLen: Map[Int, Column] = pieceLens.map { l =>
      l -> typedlit(vocab.filter(_.length == l).map(_ -> true).toMap)
    }.toMap
    def pieceCount(w: Column): Column = {
      val init = struct(lit(1).as("pos"), lit(0).as("cnt"))
      val folded = aggregate(sequence(lit(1), length(w)), init, (st, _) => {
        val pos = st.getField("pos")
        val matchLen = coalesce(pieceLens.map { l =>
          when(element_at(mapsByLen(l), w.substr(pos, lit(l))).isNotNull, lit(l))
        } :+ lit(1): _*)
        when(pos > length(w), st).otherwise(
          struct((pos + matchLen).as("pos"),
            (st.getField("cnt") + 1).as("cnt")))
      })
      folded.getField("cnt")
    }
    val wordCounts = docs
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__c"))
    val pieces = wordCounts.select(col("__w")).distinct()
      .withColumn("__p", pieceCount(col("__w")))
    wordCounts.join(pieces, "__w")
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_words"),
        sum(col("__c") * col("__p")).as("n_pieces"))
      .withColumn("fertility",
        round(col("n_pieces").cast("double") / col("n_words"), 6))
  }

  /** k-anonymity audit over quasi-identifier columns (Sweeney 2002): a
    * record whose QI combination is shared by fewer than k records is
    * re-identifiable and must be suppressed (or generalized) before the
    * data enters a training corpus — the structured-data counterpart of
    * [[piiRedact]].
    *
    * Returns one row per QI equivalence class: the QI columns, `n`, and
    * `suppress` (n < k). Join back on the QI columns (class-cardinality,
    * AQE broadcasts it) to filter records; ONE pre-combined agg shuffle
    * keyed by the QI tuple — never wider than the class table. */
  def kAnonymityClasses(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("suppress", col("n") < k)

  // ---------------------------------------------------------------------------
  // Deterministic sampling
  // ---------------------------------------------------------------------------

  /** Hex threshold for a sampling rate: the first 8 md5 hex chars are a
    * uniform 32-bit draw, and lowercase-hex strings compare lexically in
    * numeric order — so the keep test is a plain string `<`, identical in
    * any engine with md5 (no hex→int conversion needed). rate ≥ 1 maps to
    * "g", lexically above every hex digit. */
  private def hexThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1, "rate must be in [0,1]")
    if (rate >= 1.0) "g" else f"${(rate * 4294967296.0).toLong}%08x"
  }

  /** Deterministic keep-predicate sampling at `rate` via the md5 of the key:
    * reproducible across runs, engines, and cluster sizes (no RNG state,
    * no partition sensitivity — the properties `sample()` lacks for
    * training-data lineage). */
  def hashSampleKeep(key: Column, rate: Double): Column =
    substring(md5(key.cast("string")), 1, 8) < lit(hexThreshold(rate))

  /** Stratified deterministic sampling: per-stratum rates, unlisted strata
    * dropped. One scan-side filter — no shuffle, no driver involvement. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double]): DataFrame = {
    val thr = rates.foldLeft(lit("00000000")) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(hexThreshold(r))).otherwise(acc)
    }
    df.where(substring(md5(col(keyCol).cast("string")), 1, 8) < thr)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * algorithm A-ES): each row draws an exponential key
    * `-ln(u) / w` from a deterministic md5-derived uniform
    * u = (hash52 + 0.5) / 2⁵², and the k SMALLEST keys form the sample —
    * equivalent to sequential draws with probability w_i/Σw_remaining,
    * but embarrassingly parallel and reproducible across engines, runs,
    * and cluster sizes (the same md5-uniform family the split/sample ops
    * use; 13 hex chars = 52 bits, exact in a double).
    *
    * Rows with non-positive or null weight are excluded (an infinite /
    * undefined key has zero selection probability anyway).
    *
    * Scale shape: scan-side key arithmetic + distributed top-k
    * (TakeOrderedAndProject: per-partition heads, one k-row merge) — no
    * global sort, no full shuffle, no driver-side weighing. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, k: Int,
      seed: String): DataFrame = {
    val hex = substring(md5(concat(col(idCol).cast("string"), lit(seed))), 1, 13)
    val u = (conv(hex, 16, 10).cast(DoubleType) + lit(0.5)) /
      lit(4503599627370496.0) // 2^52
    df.where(weight.isNotNull && weight > 0)
      .withColumn("__ekey", -log(u) / weight)
      .orderBy("__ekey")
      .limit(k)
      .drop("__ekey")
  }

  /** Per-group A-ES: k-per-stratum weighted sampling without replacement —
    * [[weightedSample]]'s key arithmetic with the top-k as a rank window
    * per group instead of a global TakeOrdered. Window partitions are
    * stratum-sized; the shuffle carries (group, id, key) only. */
  def weightedSamplePerGroup(df: DataFrame, idCol: String, groupCol: String,
      weight: Column, k: Int, seed: String): DataFrame = {
    val hex = substring(md5(concat(col(idCol).cast("string"), lit(seed))), 1, 13)
    val u = (conv(hex, 16, 10).cast(DoubleType) + lit(0.5)) /
      lit(4503599627370496.0)
    df.where(weight.isNotNull && weight > 0)
      .withColumn("__ekey", -log(u) / weight)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(groupCol).orderBy("__ekey")))
      .where(col("__rn") <= k)
      .drop("__ekey", "__rn")
  }

  /** Deterministic train/val/test split assignment: partition [0,1) into
    * cumulative-weight intervals and place each document by where the
    * first 8 md5 hex chars of its id fall — the leakage-proof split rule
    * (a document's split never depends on corpus size, partitioning, or
    * iteration order, and re-runs/re-shards cannot move a test doc into
    * train). Weights must sum to 1; every doc gets exactly one split.
    *
    * Scale shape: pure scan-side CASE over the hash prefix — no shuffle,
    * no driver state, composable with any downstream per-split write. */
  def splitAssign(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "splitAssign: weights must be positive and sum to 1")
    val hexCol = substring(md5(col(idCol).cast("string")), 1, 8)
    val cums = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    // all but the last interval test `hex < threshold(cum)`; the last is
    // the otherwise-branch so float error at cum=1.0 can't drop a doc
    val assigned = splits.init.zip(cums.init)
      .foldRight(lit(splits.last._1): Column) { case (((name, _), cum), acc) =>
        when(hexCol < lit(hexThreshold(cum)), lit(name)).otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  // ---------------------------------------------------------------------------
  // Sequence packing (pretraining batch prep)
  // ---------------------------------------------------------------------------

  /** Offset-based sequence packing: lay the documents of each `byCol`
    * stratum end-to-end in `idCol` order and assign every document to the
    * training sequence its START offset falls in — the standard
    * approximate packing (a document may overflow its sequence by up to
    * its own length; none is split). Output: (id, stratum, n_tokens,
    * seq_idx, seq_offset), all integer arithmetic — deterministic across
    * engines and cluster sizes.
    *
    * Scale shape: ONE running-sum window per stratum — cardinality and
    * skew are bounded by the largest stratum, so at 100 TB the stratum
    * key should be (source, shard) with shard = a hash of the id range,
    * which keeps each window partition executor-sized while preserving
    * in-shard packing density (the assignment is embarrassingly parallel
    * across strata; no global order exists or is needed). */
  def packSequences(docs: DataFrame, seqTokens: Int,
      textCol: String = "text", idCol: String = "doc_id",
      byCol: String = "source"): DataFrame = {
    require(seqTokens > 0, "packSequences: seqTokens must be positive")
    val w = Window.partitionBy(col(byCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(byCol),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col(byCol), col("n_tokens"),
        floor(col("__start") / seqTokens).cast("long").as("seq_idx"),
        (col("__start") % seqTokens).as("seq_offset"))
  }

  // ---------------------------------------------------------------------------
  // Training-order shuffle and corpus mixing
  // ---------------------------------------------------------------------------

  /** Deterministic global training-order shuffle: every pretraining epoch
    * needs the corpus in a pseudorandom order that is reproducible,
    * independent of partition layout, and writable as N shard files in
    * parallel. Order by md5(seed:id): the first `shardHexDigits` hex chars
    * pick the shard (16^d shards), the in-shard position is the rank of
    * the full hash — the standard sort-by-hash shuffle a corpus goes
    * through before shard writes. Changing `seed` reshuffles the next
    * epoch with zero extra state.
    *
    * Scale shape: ONE hash-partitioned rank window — shards are
    * hash-uniform (no skew by construction), and `shardHexDigits` sizes a
    * shard's (id, hash) pairs to executor memory: 100 TB of ids at d=4 is
    * ~65k shards of a few MB of keys each. The document bytes themselves
    * never enter the shuffle — join them back by id at shard-write time. */
  def trainingShuffle(docs: DataFrame, seed: String,
      shardHexDigits: Int = 1, idCol: String = "doc_id"): DataFrame = {
    require(shardHexDigits >= 1 && shardHexDigits <= 8,
      "trainingShuffle: shardHexDigits must be in [1, 8]")
    docs.select(col(idCol),
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))).as("__h"))
      .withColumn("shard",
        conv(substring(col("__h"), 1, shardHexDigits), 16, 10).cast(LongType))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol)))
        .cast(LongType))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Rebalance a multi-source corpus toward target mixture weights — the
    * data-mixing step of curation ("web 60 / books 30 / code 10"): compute
    * per-source keep rates that hit the target composition at the maximum
    * achievable total size (the binding source keeps everything,
    * over-represented sources down-sample), then keep rows by the same
    * engine-independent md5-threshold rule as [[hashSampleKeep]]. Sources
    * absent from `weights` are dropped (weight 0).
    *
    * Rates derive from per-source counts: K = min_s(n_s / w_s) is the
    * largest total consistent with the weights; rate_s = w_s·K / n_s. The
    * count aggregation is source-cardinality (tiny), rides back on a
    * broadcast join, and the keep decision is scan-side — the corpus is
    * read twice but never shuffled. Output: kept rows' (id, source) plus
    * the applied rate. */
  def targetMixSample(docs: DataFrame, weights: Map[String, Double],
      idCol: String = "doc_id", sourceCol: String = "source"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "targetMixSample: weights must be non-empty and positive")
    val wCol = weights.foldLeft(lit(null).cast(DoubleType)) {
      case (acc, (s, w)) => when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", wCol).where(col("__w").isNotNull)
      .withColumn("__k", col("__n").cast(DoubleType) / col("__w"))
    val kMin = counts.agg(min(col("__k")).as("__kmin"))
    val rates = counts.crossJoin(broadcast(kMin))
      .select(col(sourceCol),
        least(lit(1.0),
          col("__w") * col("__kmin") / col("__n").cast(DoubleType)).as("rate"))
    // rate -> 8-hex md5 threshold; lpad TRUNCATES a 9-digit 2^32 to 8, so
    // rate >= 1 must short-circuit to an always-true compare
    val thr = when(col("rate") >= 1.0, lit("zzzzzzzz"))
      .otherwise(lower(lpad(hex(
        floor(col("rate") * 4294967296.0).cast(LongType)), 8, "0")))
    docs.join(broadcast(rates), sourceCol)
      .where(substring(md5(col(idCol).cast("string")), 1, 8) < thr)
      .select(col(idCol), col(sourceCol), round(col("rate"), 6).as("rate"))
  }

  /** Per-source quality calibration: keep each source's top `keepFraction`
    * of documents by [[qualityScore]] — the curation step "keep the best
    * 30% of web, books uncut". The cutoff is an exact per-source order
    * statistic, but computed over the per-source SCORE HISTOGRAM, never a
    * corpus-cardinality window: scores round to 6 dp and group to
    * (source, score, count) rows, the cumulative count runs in a window
    * over those histogram rows (cardinality = distinct scores per source,
    * ≤ 10^6 regardless of corpus size), and the keep decision joins the
    * source-cardinality cutoff table back broadcast. Documents TIED at the
    * cutoff score are all kept (deterministic, may over-keep by the tie
    * count — the honest semantics of a score threshold). At 100 TB: one
    * pre-combined histogram shuffle + a broadcast join; the corpus is
    * scanned twice and shuffled never. */
  def qualityCalibration(docs: DataFrame, keepFraction: Double,
      textCol: String = "text", idCol: String = "doc_id",
      sourceCol: String = "source",
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      "qualityCalibration: keepFraction must be in (0, 1]")
    val scored = docs.select(col(idCol), col(sourceCol),
      round(qualityScore(col(textCol), stopwords), 6).as("quality"))
    val hist = scored.groupBy(col(sourceCol), col("quality"))
      .agg(count(lit(1)).as("__n"))
    val cum = hist.withColumn("__cum",
      sum(col("__n")).over(
        Window.partitionBy(sourceCol).orderBy(col("quality").desc)))
    val totals = hist.groupBy(col(sourceCol)).agg(sum(col("__n")).as("__total"))
    // walking the histogram from the best score down, the cutoff is the
    // first (largest) score whose cumulative count reaches the target —
    // i.e. the max score among rows at-or-past the target
    val cutoffs = cum.join(totals, sourceCol)
      .where(col("__cum") >= ceil(col("__total") * lit(keepFraction)))
      .groupBy(col(sourceCol)).agg(max(col("quality")).as("__cutoff"))
    scored.join(broadcast(cutoffs), sourceCol)
      .where(col("quality") >= col("__cutoff"))
      .select(col(idCol), col(sourceCol), col("quality"))
  }

  /** Assemble a token-budgeted subset per source — the final-pass step of
    * data mixing ("exactly 50 B web tokens, 10 B code tokens"): documents
    * are taken in deterministic md5(id) hash order (= a reproducible
    * uniform shuffle, the [[hashSampleKeep]] ordering) until the source's
    * token budget is exhausted; a document is kept iff the running token
    * sum INCLUDING it still fits. Sources absent from `budgets` drop.
    *
    * The running sum is exact but never corpus-cardinality in one window:
    * a two-level prefix sum shards each source into 256 hash-prefix
    * shards, cumulates per-shard token SUBTOTALS in a shard-cardinality
    * window, keeps interior shards wholesale by their interval, and only
    * the single boundary shard (budget crossing) runs a per-document
    * running sum over its own 1/256 slice — the distributed take-while.
    * At 100 TB: one pre-combined shard aggregation + one 256-row window +
    * one shard-sized window; shuffles carry (id, hash, token-count), never
    * text. [[targetMixSample]] is the rate-based sibling when an
    * approximate fraction is enough. */
  def tokenBudgetAssemble(docs: DataFrame, budgets: Map[String, Long],
      textCol: String = "text", idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0),
      "tokenBudgetAssemble: budgets must be non-empty and positive")
    val bCol = budgets.foldLeft(lit(null).cast(LongType)) {
      case (acc, (s, b)) => when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    val base = docs.select(col(idCol), col(sourceCol),
        md5(col(idCol).cast("string")).as("__h"),
        tokenCount(col(textCol)).cast(LongType).as("tokens"))
      .withColumn("__budget", bCol).where(col("__budget").isNotNull)
      .withColumn("__shard", substring(col("__h"), 1, 2))
    val shardSums = base.groupBy(col(sourceCol), col("__shard"))
      .agg(sum(col("tokens")).as("__st"))
    val shardCum = shardSums.withColumn("__before",
      coalesce(sum(col("__st")).over(
        Window.partitionBy(sourceCol).orderBy(col("__shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val withShard = base.join(shardCum, Seq(sourceCol, "__shard"))
    // interior shards fit entirely inside the budget — no per-doc work
    val whole = withShard
      .where(col("__before") + col("__st") <= col("__budget"))
    // the one shard straddling the budget runs the per-document take-while
    val boundary = withShard
      .where(col("__before") < col("__budget") &&
        col("__before") + col("__st") > col("__budget"))
      .withColumn("__doccum",
        sum(col("tokens")).over(
          Window.partitionBy(col(sourceCol), col("__shard")).orderBy(col("__h"))))
      .where(col("__before") + col("__doccum") <= col("__budget"))
    whole.select(col(idCol), col(sourceCol), col("tokens"))
      .unionAll(boundary.select(col(idCol), col(sourceCol), col("tokens")))
  }

  /** Corpus-level boilerplate detection: an n-gram occurring in many
    * DOCUMENTS (high document frequency) is boilerplate — nav bars,
    * license headers, templated snippets. Flags each document by the
    * fraction of its distinct n-grams whose corpus document frequency
    * exceeds `dfCutoff` — the cross-document complement of the intra-doc
    * [[repetitionFraction]].
    *
    * Scale shape: distinct grams ship as (doc_id, md5(gram)) 16-byte
    * keys; the DF table is one pre-combined aggregation over the same
    * keys; the join back is the decontamination equi-join; the final agg
    * is doc-cardinality. The gram stage feeds both the DF build and the
    * join back, so it is persisted for the run and released once the
    * (doc-cardinality) result materializes — the
    * [[Dedup.materializeAndRelease]] contract the minhash stages use
    * (re-tokenizing and re-hashing the corpus twice measured ~2× the
    * operator's cost at sf0.1). */
  def boilerplateNgrams(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, dfCutoff: Long = 2, frac: Double = 0.5): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
        explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("g"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dfTable = grams.groupBy("g").agg(count(lit(1)).as("__df"))
    val result = grams.join(dfTable, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_grams"),
        sum(when(col("__df") > dfCutoff, 1L).otherwise(0L)).as("n_common"))
      .withColumn("common_frac", round(
        col("n_common").cast(DoubleType) / col("n_grams").cast(DoubleType), 6))
      .withColumn("boilerplate", col("common_frac") > frac)
    Dedup.materializeAndRelease(result, Seq(grams))
  }

  // ---------------------------------------------------------------------------
  // URL / domain extraction
  // ---------------------------------------------------------------------------

  /** One host class shared by the URL and domain matchers so they cannot
    * drift; all RE2-compatible. */
  private val hostPattern = "[A-Za-z0-9.-]+"
  val urlPattern = s"https?://$hostPattern(/[^\\s]*)?"
  private val domainPattern = s"https?://($hostPattern)"

  /** All URLs in a document (scan-side; the input to domain filtering). */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(0))

  /** Canonical URL for dedup keys — the normalization every web-corpus
    * pipeline applies before URL-level dedup/frontier accounting, as one
    * scan-side Column expression (regex + array ops; RE2-compatible
    * patterns, so a SQL oracle reproduces it):
    *   1. fragment dropped;  2. scheme and host lowered;
    *   3. leading `www.` stripped;  4. the scheme's default port
    *   stripped (http:80 / https:443);  5. tracking params removed
    *   (utm_*, gclid, fbclid);  6. surviving query params SORTED (byte
    *   order);  7. trailing path slash stripped (root kept as-is).
    * Non-URL input (no scheme://authority) passes through unchanged —
    * canonicalization is total, never destructive on garbage. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://.*$", 1))
    val auth0 = lower(regexp_extract(noFrag, "^[^:]+://([^/?]*).*", 1))
    val auth1 = regexp_replace(auth0, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(auth1, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth1, ":443$", ""))
      .otherwise(auth1)
    val rest = regexp_extract(noFrag, "^[^:]+://[^/?]*(.*)", 1)
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(length(path0) > 1, regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid)(=|$)")))
    val joined = array_join(params, "&")
    when(scheme === "", u).otherwise(
      concat(scheme, lit("://"), host, path,
        when(length(joined) > 0, concat(lit("?"), joined)).otherwise(lit(""))))
  }

  /** Per-domain reference counts across the corpus — the blocklist /
    * source-mix audit table of a web-scrape pipeline. One pre-aggregated
    * shuffle, same shape as [[vocabularyTopK]]. */
  def domainCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(
        regexp_extract_all(lower(col(textCol)), lit(domainPattern), lit(1)))
        .as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n"))

  // ---------------------------------------------------------------------------
  // Corpus vocabulary statistics
  // ---------------------------------------------------------------------------

  /** Top-k corpus vocabulary by token frequency — the corpus-statistics
    * shape (vocab building, stopword discovery, Zipf audits). One shuffle:
    * hash aggregation with map-side partial combine, which is also why no
    * salting is needed — a skewed token ("the") is pre-summed to one row
    * per map task before the exchange. The (count desc, token asc) order
    * makes the top-k cut deterministic under ties. */
  def vocabularyTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(k)

  /** Dataset card — the one-row corpus summary a curated release ships
    * with: sizes, vocabulary, mean quality, exact-duplicate rate, and
    * blocklist exposure. Two scans total: ONE per-doc projection feeds a
    * single pre-combined aggregate (counts/sums/distinct-hash/blocklist
    * verdict all ride it), and the vocabulary count is its own
    * explode+distinct pass; both collapse to 1-row frames joined by a
    * trivial cross. Quality micro-floors per doc before the integer sum;
    * the three ratios are single double divisions, micro-floored.
    * Returns (n_docs, n_tokens, n_chars, vocab, mean_quality, dup_rate,
    * blocked_frac). */
  def datasetCard(docs: DataFrame, textCol: String, stopwords: Seq[String],
      blocklist: Seq[String]): DataFrame = {
    val perDoc = docs.select(
      length(col(textCol)).cast("long").as("nc"),
      size(tokens(lower(col(textCol)))).cast("long").as("nt"),
      floor(qualityScore(col(textCol), stopwords) * 1000000.0 + 0.5)
        .cast("long").as("qm"),
      md5(col(textCol)).as("h"),
      when(size(graft.functions.MultiMatch.multi_match(lower(col(textCol)),
        blocklist.map(_.toLowerCase))) > 0, 1L).otherwise(0L).as("bl"))
    val a = perDoc.agg(count(lit(1)).as("n"), sum(col("nt")).as("ntok"),
      sum(col("nc")).as("nch"), sum(col("qm")).as("q"),
      countDistinct(col("h")).as("dh"), sum(col("bl")).as("bln"))
    val v = docs.select(explode(tokens(lower(col(textCol)))).as("tok"))
      .agg(countDistinct(col("tok")).as("vocab"))
    a.crossJoin(v).select(
      col("n").as("n_docs"), col("ntok").as("n_tokens"),
      col("nch").as("n_chars"), col("vocab"),
      (floor(col("q").cast("double") / col("n") + 0.5) / 1000000.0)
        .as("mean_quality"),
      (floor((col("n") - col("dh")).cast("double") * 1000000.0 / col("n")
        + 0.5) / 1000000.0).as("dup_rate"),
      (floor(col("bln").cast("double") * 1000000.0 / col("n") + 0.5)
        / 1000000.0).as("blocked_frac"))
  }

  /** Zipf power-law fit — OLS of ln(freq) on ln(rank) over the top-R
    * vocabulary ranks: the corpus-statistics check that natural language
    * obeys (slope ≈ −1); a flat slope flags templated/machine noise, a
    * cliff flags boilerplate domination — the distributional cousin of
    * [[vocabCoverage]]'s rank-1 share. R is a human analysis budget
    * (default 200), never data-sized.
    *
    * Exactness: ln(rank)/ln(count) micro-floor scan-side, the five OLS
    * moments are exact integer sums (bounds: |x| ≤ ln R·10⁶, |y| ≤
    * ln N·10⁶ keep every product under 2⁶³ for any real corpus at
    * R ≤ 200), and slope/intercept are single double divisions over
    * exact integers, micro-floored. Ranking shuffles the
    * vocab-cardinality count table, never the corpus; ties break
    * (count desc, token asc). Returns one row (r, slope, intercept). */
  def zipfFit(docs: DataFrame, textCol: String, topR: Int = 200): DataFrame = {
    val counts = docs.select(explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    // top-R via distributed TakeOrdered (the t46 cut); the global
    // row_number window then sees only R rows
    val top = counts.orderBy(col("n").desc, col("tok").asc).limit(topR)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("tok").asc)
    val ranked = top.withColumn("rank", row_number().over(w))
    val xm = floor(log(col("rank").cast("double")) * 1000000.0 + 0.5)
      .cast("long")
    val ym = floor(log(col("n").cast("double")) * 1000000.0 + 0.5)
      .cast("long")
    val m = ranked.select(xm.as("x"), ym.as("y"))
      .agg(count(lit(1)).as("r"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
    val num = (col("r") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("r") * col("sxx") - col("sx") * col("sx")).cast("double")
    m.select(col("r"),
      (floor((num / den) * 1000000.0 + 0.5) / 1000000.0).as("slope"),
      (floor((col("sy").cast("double") - (num / den) *
        col("sx").cast("double")) / col("r").cast("double") + 0.5) /
        1000000.0).as("intercept"))
  }

  /** Luhn checksum validity of a digit-string Column — the checksum
    * that separates real card numbers from arbitrary digit runs, so a
    * PII scrubber redacts actual cards instead of order ids (a large
    * false-positive cut in practice). Pure HOF arithmetic (double every
    * second digit from the right, −9 overflow fold, mod 10) — no UDF,
    * exactly replicable in the oracle's list algebra. */
  def luhnValid(digits: Column): Column = {
    val n = length(digits)
    val terms = transform(sequence(lit(1), n), i => {
      val d = digits.substr(i, lit(1)).cast("int")
      val doubled = d * 2
      when((n - i) % 2 === 1,
        when(doubled > 9, doubled - 9).otherwise(doubled)).otherwise(d)
    })
    aggregate(terms, lit(0), (acc, t) => acc + t) % 10 === 0
  }

  /** The check digit that makes `base || digit` Luhn-valid — used by
    * the planted oracle to mint valid card numbers in BOTH engines. */
  def luhnCheckDigit(base: Column): Column = {
    val n = length(base)
    val terms = transform(sequence(lit(1), n), i => {
      val d = base.substr(i, lit(1)).cast("int")
      val doubled = d * 2
      when((n + 1 - i) % 2 === 1,
        when(doubled > 9, doubled - 9).otherwise(doubled)).otherwise(d)
    })
    (lit(10) - aggregate(terms, lit(0), (acc, t) => acc + t) % 10) % 10
  }

  /** Card-number detection with Luhn validation: extract 13–19-digit
    * runs, validate each scan-side. Returns (doc_id, n_candidates,
    * n_valid) — a pure projection, no shuffle. */
  def luhnCards(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit("[0-9]{13,19}"), lit(0))
    docs.select(col(idCol).as("doc_id"),
      size(cands).cast("long").as("n_candidates"),
      size(filter(cands, c => luhnValid(c))).cast("long").as("n_valid"))
  }

  /** Heaps' law fit — OLS of ln(vocab) on ln(tokens) over ingestion
    * checkpoints: vocabulary grows as V ≈ K·Tᵝ with β ≈ 0.4–0.6 for
    * natural language; β near 0 means a closed vocabulary (templated/
    * synthetic text), β near 1 means unbounded novelty (noise, ids,
    * encoded blobs). The growth-curve cousin of [[zipfFit]]'s static
    * rank check, and the statistic that sizes vocabulary budgets as a
    * corpus scales 100×.
    *
    * Shape: one corpus scan yields per-doc token counts AND the
    * (token → first doc) table (both pre-combined); each of the C
    * checkpoints (ingestion prefixes by doc-id order) is a skinny
    * aggregate over those two vocab/doc-cardinality tables — C is a
    * human budget. The OLS is [[zipfFit]]'s exact micro machinery.
    * Checkpoints with zero tokens drop. Returns one row
    * (c, beta, ln_k). */
  def heapsFit(docs: DataFrame, textCol: String, idCol: String,
      checkpoints: Int = 10): DataFrame = {
    require(checkpoints >= 2, s"heapsFit needs >= 2 checkpoints")
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(tokens(lower(col(textCol)))).as("tok"))
    val firstSeen = toks.groupBy("tok").agg(min(col("id")).as("fd"))
      .localCheckpoint()
    val perDoc = toks.groupBy("id").agg(count(lit(1)).as("nt"))
      .localCheckpoint()
    val maxId = perDoc.agg(max(col("id"))).collect()(0).getLong(0)
    // C evenly-spaced doc-id prefixes (last one = the whole corpus)
    val cuts = (1 to checkpoints)
      .map(i => maxId * i / checkpoints).distinct
    val cutDf = broadcast(docs.sparkSession
      .createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(
          cuts.map(c => org.apache.spark.sql.Row(c))).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cut",
            org.apache.spark.sql.types.LongType)))))
    val v = cutDf.join(firstSeen, col("fd") <= col("cut"))
      .groupBy("cut").agg(count(lit(1)).as("vv"))
    val tt = cutDf.join(perDoc, col("id") <= col("cut"))
      .groupBy("cut").agg(sum(col("nt")).as("tn"))
    val pts = v.join(tt, "cut").where(col("tn") > 0)
      .select(
        floor(log(col("tn").cast("double")) * 1000000.0 + 0.5).cast("long")
          .as("x"),
        floor(log(col("vv").cast("double")) * 1000000.0 + 0.5).cast("long")
          .as("y"))
    val m = pts.agg(count(lit(1)).as("r"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    val num = (col("r") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("r") * col("sxx") - col("sx") * col("sx")).cast("double")
    m.select(col("r").as("c"),
      (floor((num / den) * 1000000.0 + 0.5) / 1000000.0).as("beta"),
      (floor((col("sy").cast("double") - (num / den) *
        col("sx").cast("double")) / col("r").cast("double") + 0.5) /
        1000000.0).as("ln_k"))
  }

  /** Vocabulary coverage curve — for each candidate vocabulary size N,
    * the fraction of all corpus TOKEN OCCURRENCES covered by the N most
    * frequent words: the statistic that sizes a tokenizer's vocabulary
    * (where the curve flattens, extra vocab buys nothing) and flags
    * unnatural corpora (natural language covers ~90% in a few thousand
    * words; machine noise doesn't). Also reports the Zipf check: the
    * rank-1 share. Deterministic: ranks break ties (count desc, token
    * asc); coverage is exact-integer token mass over exact total, one
    * double division, 6 dp.
    *
    * Scale shape: ONE pre-combined token count (the [[vocabularyTopK]]
    * shuffle — skew-proof via map-side combine), a DISTRIBUTED top-k cut
    * (orderBy + limit → TakeOrdered, never a global rank window over the
    * full vocabulary), rank/cumulative windows only over the ≤ max(sizes)
    * surviving rows (a human-chosen constant), and a one-row total
    * broadcast. Returns (n_vocab, covered_tokens, total_tokens,
    * coverage). */
  def vocabCoverage(df: DataFrame, textCol: String,
      sizes: Seq[Int]): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1), "vocabCoverage: sizes >= 1")
    val counts = df.select(explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total_tokens"))
    val ranked = counts
      .orderBy(col("n").desc, col("tok").asc).limit(sizes.max)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n").desc, col("tok").asc)))
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("rnk")).rowsBetween(Window.unboundedPreceding, 0)))
    val spark = df.sparkSession
    import spark.implicits._
    val sizeDf = sizes.sorted.toDF("n_vocab")
    // per requested size: the largest rank <= N that exists (a corpus
    // with fewer distinct words than N covers everything it has)
    sizeDf.join(ranked, col("rnk") <= col("n_vocab"))
      .groupBy("n_vocab")
      .agg(max(col("cum")).as("covered_tokens"))
      .crossJoin(broadcast(total))
      .select(col("n_vocab").cast("long").as("n_vocab"),
        col("covered_tokens"), col("total_tokens"),
        round(col("covered_tokens").cast("double") / col("total_tokens"), 6)
          .as("coverage"))
  }

  /** Heavy-hitter tokens via the Misra–Gries sketch aggregate
    * ([[graft.functions.MisraGriesAgg]]): every partition reduces its
    * token stream to a k-entry summary map-side, so only k-sized sketches
    * cross the exchange — the scale replacement for an exact
    * `groupBy(token)` when only the head of the distribution matters.
    * Deterministic guarantee regardless of partitioning: contains every
    * token with frequency > n/(k+1); estimates undercount by at most
    * n/(k+1) and never overcount. */
  def heavyHitters(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(tokens(lower(col(textCol)))).as("tok"))
      .agg(graft.functions.MisraGriesAgg.misra_gries(col("tok"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))

  /** First-iteration BPE merge candidates: corpus-weighted counts of
    * adjacent character pairs, the statistic a byte-pair-encoding trainer
    * maximizes at each merge step (Sennrich et al. 2016). Pairs count once
    * per occurrence IN a word, weighted by the word's corpus frequency —
    * exactly the trainer's objective, so the top row IS the first merge.
    *
    * Scale shape: the corpus-cardinality work is ONE pre-combined word
    * count (the vocabularyTopK shuffle); pairs then explode from the
    * VOCABULARY (not the corpus) and collapse to at most alphabet² rows,
    * so the ranking window is trivially small. Iterating merges re-runs
    * only the vocab-side stages — the corpus is never re-read. */
  def bpePairCounts(docs: DataFrame, textCol: String, k: Int = 50): DataFrame = {
    val words = docs.select(explode(tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("__wc"))
    // sequence(1, 0) would run DESCENDING in Spark — guard short words
    val pairsOf = when(length(col("word")) >= 2,
      transform(sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2))))
      .otherwise(array().cast("array<string>"))
    val counts = words.select(col("__wc"), explode(pairsOf).as("pair"))
      .groupBy("pair").agg(sum(col("__wc")).cast(LongType).as("n"))
    counts
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("pair").asc)).cast(LongType))
      .where(col("rank") <= k)
      .select(col("rank"), col("pair"), col("n"))
  }

  /** Learn `merges` BPE merge rules over the corpus (Sennrich et al. 2016;
    * the tokenizer-induction loop, one model step past [[bpePairCounts]]'
    * single pair table). Classic BPE on the word-count vocabulary:
    * symbols start as characters, each round (1) counts adjacent symbol
    * pairs weighted by word frequency, (2) picks the most frequent pair
    * (ties: lexicographically smallest (lhs, rhs) in UTF-8 byte order —
    * deterministic across engines and partitionings), (3) rewrites every
    * word with the pair merged left-to-right greedily. Returns
    * (rank, lhs, rhs, n): the ordered merge table a tokenizer ships.
    *
    * Scale shape: the corpus is scanned ONCE (one pre-combined word
    * count — the only corpus-cardinality work regardless of `merges`).
    * The resulting (syms, wc) vocabulary is BOUNDED (distinct words, not
    * corpus rows), so when it fits under `driverVocabLimit` entries the
    * merge loop runs ON THE DRIVER with incremental pair-count updates
    * (only words containing the merged pair are touched, argmax via an
    * ordered set) — a shipped tokenizer's ~30k merge rounds cost zero
    * Spark jobs after the scan instead of 30k of them. Vocabularies past
    * the limit fall back to the distributed loop: per round one
    * vocabulary-cardinality pre-combined pair aggregation, a 1-row argmax
    * collect, and a scan-side `aggregate` HOF fold that applies the merge
    * (no UDF, no shuffle), `localCheckpoint` per round. Both paths
    * implement the IDENTICAL greedy fold (a freshly merged symbol cannot
    * re-match as the lhs of the same pair in the same pass) and the
    * identical (n desc, lhs, rhs) UTF-8 tie-break, so the merge table is
    * byte-equal whichever path runs (BpeSpec pins this). */
  def bpeLearn(docs: DataFrame, textCol: String, merges: Int,
      driverVocabLimit: Long = 2000000L): DataFrame = {
    require(merges >= 1, s"bpeLearn needs merges >= 1, got $merges")
    val spark = docs.sparkSession
    val vocab = docs
      .select(explode(tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .select(split(col("word"), "").as("syms"), col("wc"))
      .localCheckpoint()
    if (vocab.count() <= driverVocabLimit) bpeLearnLocal(spark, vocab, merges)
    else bpeLearnDistributed(spark, vocab, merges)
  }

  /** Spark's UTF8String binary comparison, reproduced on the driver so the
    * local path's tie-breaks match the distributed `orderBy` byte-for-byte
    * (UTF-16 String.compareTo differs for supplementary characters). */
  private def utf8Compare(a: String, b: String): Int = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(ab.length, bb.length)
    while (i < n) {
      val c = (ab(i) & 0xff) - (bb(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    ab.length - bb.length
  }

  /** (n, lhs, rhs) argmax order: n desc, then lhs/rhs ascending UTF-8 —
    * the TreeSet head IS the next merge rule. */
  private val bpePairOrdering: Ordering[(Long, String, String)] =
    new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val byN = java.lang.Long.compare(y._1, x._1)
        if (byN != 0) byN
        else {
          val byL = utf8Compare(x._2, y._2)
          if (byL != 0) byL else utf8Compare(x._3, y._3)
        }
      }
    }

  /** The greedy left-to-right merge fold, driver-side — semantics
    * identical to the distributed `aggregate` HOF (compare the tail of
    * the accumulator, so a freshly merged symbol never re-matches as lhs
    * in the same pass). Shared with the encode expression so train and
    * apply can never drift. */
  private def bpeApplyMerge(syms: Array[String], l: String, r: String,
      merged: String): Array[String] =
    graft.functions.BpeEncode.applyMerge(syms, l, r, merged)

  /** Driver-local merge loop over the collected (syms, wc) vocabulary:
    * incremental pair counts (a merge touches only the words that contain
    * the pair — indexed, not scanned) with an ordered-set argmax, so each
    * round is O(affected-words · word-length + log |pairs|). This is what
    * makes merges≈30k practical: the whole loop is sub-second once the
    * corpus scan has produced the vocabulary. */
  private def bpeLearnLocal(spark: org.apache.spark.sql.SparkSession,
      vocab: DataFrame, merges: Int): DataFrame = {
    val collected = vocab.collect()
    val words = collected.map(_.getSeq[String](0).toArray)
    val wcs = collected.map(_.getLong(1))
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val occ = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    val tree = scala.collection.mutable.TreeSet.empty(bpePairOrdering)
    def pairsOf(syms: Array[String]): Iterator[(String, String)] =
      (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))
    def bump(p: (String, String), delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) tree.remove((old, p._1, p._2))
      val nw = old + delta
      if (nw != 0L) { counts(p) = nw; tree.add((nw, p._1, p._2)) }
      else counts.remove(p)
    }
    for (wi <- words.indices; p <- pairsOf(words(wi))) {
      bump(p, wcs(wi))
      occ.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
    }
    val rules = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    var r = 1
    while (r <= merges && tree.nonEmpty) {
      val (n, l, rr) = tree.head
      rules += ((r.toLong, l, rr, n))
      val merged = l + rr
      val affected = occ.getOrElse((l, rr), scala.collection.mutable.Set.empty)
        .toArray.sorted
      for (wi <- affected) {
        val oldSyms = words(wi)
        for (p <- pairsOf(oldSyms)) { bump(p, -wcs(wi)); occ(p) -= wi }
        val newSyms = bpeApplyMerge(oldSyms, l, rr, merged)
        words(wi) = newSyms
        for (p <- pairsOf(newSyms)) {
          bump(p, wcs(wi))
          occ.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wi
        }
      }
      r += 1
    }
    import spark.implicits._
    rules.toSeq.toDF("rank", "lhs", "rhs", "n")
  }

  /** The distributed merge loop — vocabulary-cardinality rounds for
    * vocabularies too large to collect. Kept semantically in lockstep
    * with [[bpeLearnLocal]] (BpeSpec asserts path equality). */
  private def bpeLearnDistributed(spark: org.apache.spark.sql.SparkSession,
      vocab0: DataFrame, merges: Int): DataFrame = {
    var vocab = vocab0
    val rules = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (r <- 1 to merges if !exhausted) {
      val pairs = vocab
        .select(col("wc"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("wc")).as("n"))
      val top = pairs
        .orderBy(col("n").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += ((r.toLong, l, rr, n))
        val merged = l + rr
        // greedy left-to-right merge: fold each word, collapsing a tail
        // symbol == lhs followed by rhs into the merged symbol. On an
        // empty accumulator try_element_at(-1) is null (plain element_at
        // throws under ANSI), the comparison is null, and `when` falls
        // through to append — no extra guard needed.
        vocab = vocab.select(
            aggregate(col("syms"),
              array().cast("array<string>"),
              (acc, x) => when(
                try_element_at(acc, lit(-1)) === lit(l) && x === lit(rr),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
                .otherwise(concat(acc, array(x)))).as("syms"),
            col("wc"))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    rules.toSeq.toDF("rank", "lhs", "rhs", "n")
  }

  /** Tokenizer APPLICATION — per-document BPE token counts under a
    * learned merge table ([[bpeLearn]]'s output or any (rank, lhs, rhs)
    * table): the statistic every token-budget / mix-planning /
    * fertility-audit stage needs once a tokenizer is fixed. Returns
    * (doc_id, n_words, n_tokens).
    *
    * Scale shape — encode the VOCABULARY, never the corpus: the corpus
    * scan pre-combines to per-(doc, word) counts; the
    * [[graft.functions.BpeEncode]] expression (native, codegen'd, rules
    * as one per-executor reference object) runs once per DISTINCT word
    * on a vocabulary-cardinality scan; token counts join back by word
    * (AQE broadcasts the vocab side at real-world vocabulary sizes) and
    * the per-doc rollup is one pre-combined agg. The merge table is
    * human-budget-sized (30k rules ≈ 1 MB) — collected once, shipped
    * once per executor. */
  def bpeTokenCounts(docs: DataFrame, textCol: String, idCol: String,
      rules: DataFrame): DataFrame = {
    val ruleSeq = rules.orderBy("rank").select("lhs", "rhs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val words = docs
      .select(col(idCol).as("doc_id"), explode(tokens(lower(col(textCol)))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("__c"))
    val vocab = words.select("word").distinct()
      .withColumn("__nt",
        size(graft.functions.BpeEncode.bpe_encode(col("word"), ruleSeq)))
    words.join(vocab, "word")
      .groupBy("doc_id")
      .agg(sum(col("__c")).as("n_words"),
        sum(col("__c") * col("__nt")).as("n_tokens"))
  }

  /** Token counting under a LEARNED unigram-LM table — the apply step
    * closing the loop [[unigramLmLearn]] opens, mirroring
    * [[bpeTokenCounts]]: Viterbi-segment each DISTINCT word once (the
    * all-integer [[graft.functions.UnigramSegment]] expression over the
    * vocabulary, never the corpus), join piece counts back by word,
    * pre-combined per-doc rollup. `pieces` is (piece → micro-ln score)
    * as [[unigramLmLearn]] emits. Returns (doc_id, n_words,
    * n_pieces). */
  def unigramTokenCounts(docs: DataFrame, textCol: String, idCol: String,
      pieces: Seq[(String, Long)]): DataFrame = {
    val words = docs
      .select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("__c"))
    val vocab = words.select("word").distinct()
      .withColumn("__nt", size(
        graft.functions.UnigramSegment.unigram_segment(col("word"), pieces)))
    words.join(vocab, "word")
      .groupBy("doc_id")
      .agg(sum(col("__c")).as("n_words"),
        sum(col("__c") * col("__nt")).as("n_pieces"))
  }

  // ---------------------------------------------------------------------------
  // Benchmark decontamination
  // ---------------------------------------------------------------------------

  /** Test-set decontamination: count, per document, the benchmark snippets
    * it contains as an exact substring (the first filtering tier of
    * train/test-overlap removal). The snippet set is small — benchmark
    * suites are thousands of strings — so it broadcasts and the containment
    * check runs scan-side as a broadcast nested-loop join: no corpus
    * shuffle, one aggregation over matches only. For pattern sets too big
    * to O(|doc|·|patterns|)-scan, the upgrade is a shingle equi-join (the
    * MinHash candidate machinery in [[Dedup]]) — same output contract. */
  def contaminatedDocs(docs: DataFrame, textCol: String, idCol: String,
      snippets: DataFrame, snippetCol: String): DataFrame =
    docs.join(broadcast(snippets), col(textCol).contains(col(snippetCol)))
      .groupBy(col(idCol).as("doc_id"))
      .agg(count(lit(1)).as("n_matches"))

  /** Unigram-LM surprisal per document — the perplexity-proxy quality
    * filter (the role a kenlm model plays in CCNet-style pipelines), as
    * pure relational ops: train token frequencies over a reference corpus
    * (one pre-combined aggregation), score each document by the
    * count-weighted mean of `-ln p(token)`. Low = fluent/common text,
    * high = gibberish or vocabulary far from the reference.
    *
    * Scale shape: per-doc token COUNTS aggregate before the frequency
    * join (the join input shrinks by each doc's repetition factor); the
    * frequency table joins by AQE's choice — broadcast for real-world
    * vocab sizes. Out-of-vocabulary tokens score with a floor probability
    * of `oovFloorOver / total` instead of dropping. Output: (doc_id,
    * n_tokens, avg_surprisal rounded to 6). */
  def unigramSurprisal(docs: DataFrame, textCol: String, idCol: String,
      refCorpus: Option[DataFrame] = None, refTextCol: String = "text",
      oovFloorOver: Double = 0.5): DataFrame = {
    def toksOf(df: DataFrame, tc: String, extra: Column*): DataFrame =
      df.select(extra :+ explode(tokens(lower(col(tc)))).as("tok"): _*)
    val ref = toksOf(refCorpus.getOrElse(docs),
      refCorpus.map(_ => refTextCol).getOrElse(textCol))
    val freqs = ref.groupBy("tok").agg(count(lit(1)).as("__n"))
    val total = broadcast(freqs.agg(sum(col("__n")).as("__total")))
    val docToks = toksOf(docs, textCol, col(idCol).as("doc_id"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("__c"))
    docToks.join(freqs, Seq("tok"), "left").crossJoin(total)
      .withColumn("__s",
        -log(coalesce(col("__n").cast("double"), lit(oovFloorOver)) / col("__total")))
      .groupBy("doc_id")
      .agg(
        sum(col("__c")).as("n_tokens"),
        round(sum(col("__c") * col("__s")) / sum(col("__c")), 6).as("avg_surprisal"))
  }

  /** Bigram-LM surprisal with stupid backoff: docs scored by mean
    * −ln P(w2|w1), one model order up from [[unigramSurprisal]] — the
    * relational form of the CCNet-style LM quality filter. P(w2|w1) is
    * the MLE `c(w1,w2) / c(w1,·)`; a bigram unseen in the training slice
    * backs off to `alpha · p_unigram(w2)` (the "stupid backoff" of
    * Brants et al. 2007, designed precisely for MapReduce-scale LMs —
    * no normalization pass, so it stays a pure join), and an unseen
    * unigram floors at `oovFloorOver / total` as everywhere else.
    *
    * Scale shape: each corpus is scanned once per frequency table it
    * feeds; every table pre-combines map-side (bigram counts, their
    * per-context sums — derived from the ALREADY-AGGREGATED bigram
    * table, not a corpus re-scan — and unigram counts); per-doc bigram
    * COUNTS aggregate before any join, so join inputs shrink by each
    * doc's repetition factor; the unigram total rides one broadcast row.
    * AQE broadcasts the LM tables at real vocabulary sizes. */
  def bigramSurprisal(docs: DataFrame, textCol: String, idCol: String,
      refCorpus: Option[DataFrame] = None, refTextCol: String = "text",
      backoffAlpha: Double = 0.4, oovFloorOver: Double = 0.5): DataFrame = {
    def bigramsOf(toks: Column): Column = explode(zip_with(
      slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2"))))
    def withToks(df: DataFrame, tc: String, widen: Boolean,
        extra: Column*): DataFrame = {
      // guide §2.5 (r20): tokenize + bigram explode inherit scan width —
      // widen a provably narrow scan (text column as the deterministic
      // key; identity on wide corpora) for the SINGLE-consumer docs side
      // only. The ref side feeds 2-3 model tables, each of which would
      // re-execute the widen exchange (the tokenized ref is deliberately
      // never materialized), and widening it measured a net LOSS
      // (t102 2.8 -> 3.4+ s at sf0.1 with both sides widened).
      val base = if (widen)
        graft.pipeline.AdaptiveParts.widenNarrowScan(df, col(tc)) else df
      base
        .select(extra :+ graft.functions.OptimizerFence.fence(tokens(lower(col(tc)))).as("__toks"): _*)
        .where(size(col("__toks")) >= 2)
    }

    val refT = withToks(refCorpus.getOrElse(docs),
      refCorpus.map(_ => refTextCol).getOrElse(textCol), widen = false)
    val refBg = refT.select(bigramsOf(col("__toks")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("__nb"))
    val ctx = refBg.groupBy("w1")
      .agg(sum(col("__nb")).cast(DoubleType).as("__nc"))
    val uni = refT.select(explode(col("__toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__nu"))
    val tot = broadcast(uni.agg(sum(col("__nu")).cast(DoubleType).as("__total")))

    val docBg = withToks(docs, textCol, widen = true, col(idCol).as("doc_id"))
      .select(col("doc_id"), bigramsOf(col("__toks")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("__c"))

    docBg.join(refBg, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(uni, col("w2") === col("tok"), "left").drop("tok")
      .crossJoin(tot)
      .withColumn("__s", when(col("__nb").isNotNull,
          -log(col("__nb").cast(DoubleType) / col("__nc")))
        .otherwise(-log(lit(backoffAlpha) *
          coalesce(col("__nu").cast(DoubleType), lit(oovFloorOver)) /
          col("__total"))))
      .groupBy("doc_id")
      .agg(
        sum(col("__c")).as("n_bigrams"),
        round(sum(col("__c") * col("__s")) / sum(col("__c")), 6)
          .as("avg_surprisal"))
  }

  /** Interpolated Kneser–Ney bigram surprisal (Chen & Goodman 1999) —
    * the canonical LM smoothing, one rung above [[bigramSurprisal]]'s
    * stupid backoff: absolute discount D on seen bigrams, with the
    * discounted mass re-spent on the CONTINUATION probability
    * `P_cont(w2) = |{w1 : c(w1,w2) > 0}| / |distinct bigrams|` — "how
    * many contexts does w2 complete" rather than "how often does w2
    * occur", which is what makes KN rank `francisco` low even though
    * `san francisco` is frequent. Per bigram:
    * `P(w2|w1) = max(c12−D, 0)/c1 + (D·N1+(w1·)/c1)·P_cont(w2)`;
    * an unseen context backs off to `P_cont(w2)` directly, and a word
    * never seen ending a bigram floors at `oovFloorOver / |bigrams|`.
    *
    * Cross-engine exactness: the probability is ONE fixed-shape double
    * expression over exact integer counts (parenthesized identically in
    * the oracle), `-ln` is correctly rounded in both engines, and the
    * per-bigram-TYPE surprisal micro-floors BEFORE the per-doc
    * occurrence-weighted integer sum — no order-dependent double
    * accumulation anywhere.
    *
    * Scale shape mirrors [[bigramSurprisal]]: every model table
    * pre-combines map-side and is derived from the already-aggregated
    * bigram table (never a corpus re-scan); N1+(w1·) rides the same
    * groupBy as c1; per-doc bigram counts aggregate before any join;
    * the distinct-bigram total is one broadcast row; AQE broadcasts the
    * model tables at real vocabulary sizes. Output: (doc_id, n_bigrams,
    * avg_surprisal) in nats; docs with < 2 tokens drop. */
  def knSurprisal(docs: DataFrame, textCol: String, idCol: String,
      refCorpus: Option[DataFrame] = None, refTextCol: String = "text",
      discount: Double = 0.75, oovFloorOver: Double = 0.5): DataFrame = {
    require(discount > 0 && discount < 1, "KN discount must be in (0, 1)")
    def bigramsOf(toks: Column): Column = explode(zip_with(
      slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2"))))
    def withToks(df: DataFrame, tc: String, widen: Boolean,
        extra: Column*): DataFrame = {
      // guide §2.5 (r20): tokenize + bigram explode inherit scan width —
      // widen a provably narrow scan (text column as the deterministic
      // key; identity on wide corpora) for the SINGLE-consumer docs side
      // only. The ref side feeds 2-3 model tables, each of which would
      // re-execute the widen exchange (the tokenized ref is deliberately
      // never materialized), and widening it measured a net LOSS
      // (t102 2.8 -> 3.4+ s at sf0.1 with both sides widened).
      val base = if (widen)
        graft.pipeline.AdaptiveParts.widenNarrowScan(df, col(tc)) else df
      base
        .select(extra :+ graft.functions.OptimizerFence.fence(tokens(lower(col(tc)))).as("__toks"): _*)
        .where(size(col("__toks")) >= 2)
    }

    val refT = withToks(refCorpus.getOrElse(docs),
      refCorpus.map(_ => refTextCol).getOrElse(textCol), widen = false)
    val refBg = refT.select(bigramsOf(col("__toks")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("__nb"))
    // context totals AND follower-type counts in one pass over the
    // (already bigram-type-cardinality) model table
    val ctx = refBg.groupBy("w1")
      .agg(sum(col("__nb")).as("__nc"), count(lit(1)).as("__n1"))
    val cont = refBg.groupBy("w2").agg(count(lit(1)).as("__nw"))
      .withColumnRenamed("w2", "__cw2")
    val nbb = broadcast(refBg.agg(count(lit(1)).as("__nbb")))

    val docBg = withToks(docs, textCol, widen = true, col(idCol).as("doc_id"))
      .select(col("doc_id"), bigramsOf(col("__toks")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("__c"))

    // ONE fixed-shape double expression, parenthesized exactly as in
    // the DuckDB oracle; every input is an exact integer
    val pc = coalesce(col("__nw").cast("double"), lit(oovFloorOver)) /
      col("__nbb")
    val prob = when(col("__nc").isNotNull,
        (when(col("__nb").isNotNull, col("__nb").cast("double") - discount)
          .otherwise(lit(0.0)) +
          ((lit(discount) * col("__n1")) * pc)) / col("__nc"))
      .otherwise(pc)
    docBg.join(refBg, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, col("w2") === col("__cw2"), "left").drop("__cw2")
      .crossJoin(nbb)
      .withColumn("__s",
        floor(-log(prob) * 1000000.0 + 0.5).cast("long"))
      .groupBy("doc_id")
      .agg(
        sum(col("__c")).as("n_bigrams"),
        (floor(sum(col("__c") * col("__s")).cast("double") /
          sum(col("__c")) + 0.5) / 1000000.0).as("avg_surprisal"))
  }

  /** Full-batch logistic-regression trainer — the discriminative
    * quality-classifier paradigm (fastText-style linear scorer) beside
    * [[naiveBayesClassify]]'s generative one. Full-batch gradient
    * descent, NOT SGD: the gradient is an order-free SUM over the
    * corpus, which is what makes distributed training deterministic —
    * each round is ONE scan producing (|features|+1) pre-combined
    * integer sums; the weight vector lives driver-side as a handful of
    * longs (the kmeansLloyd collect-the-centroids pattern) and re-enters
    * the next round's plan as literals.
    *
    * Exactness contract: features arrive micro-quantized (1e-6 longs),
    * weights live in nano units (1e-9 longs), the margin z and sigmoid
    * are fixed-shape double expressions over those exact integers,
    * per-doc gradient terms nano-floor BEFORE the integer sum, and the
    * driver's update arithmetic is the same IEEE ops an unrolled SQL
    * replica performs — so the whole K-round trajectory hash-matches
    * (the dawidSkene unrolled-EM precedent). Returns ONE row:
    * (n, w_bias, w_<feature>..., accuracy) with weights as doubles.
    * `rounds` is a human training budget, never data-sized. */
  def logregTrain(feats: DataFrame, featureCols: Seq[String],
      labelCol: String, rounds: Int = 3, lr: Double = 0.5): DataFrame = {
    require(rounds >= 1, s"logregTrain: rounds must be >= 1, got $rounds")
    require(featureCols.nonEmpty, "logregTrain: no feature columns")
    val spark = feats.sparkSession
    val f = feats.select((labelCol +: featureCols).map(col): _*).localCheckpoint()
    val n = f.count()
    require(n > 0, "logregTrain: empty input")
    val yd = col(labelCol).cast("double")
    def fj(c: String): Column = col(c).cast("double") / 1000000.0
    val w = Array.fill(featureCols.length + 1)(0L)
    // (((w0 + w1·f1) + w2·f2) + …) — left-associated, spelled exactly so
    // in the oracle; each literal is the exact nano/1e9 double
    def zExpr: Column =
      featureCols.zipWithIndex.foldLeft(lit(w(0).toDouble / 1e9): Column) {
        case (z, (c, i)) => z + (lit(w(i + 1).toDouble / 1e9) * fj(c))
      }
    for (_ <- 1 to rounds) {
      val sig = lit(1.0) / (lit(1.0) + exp(-zExpr))
      val g0 = sum(floor((yd - sig) * 1000000000.0 + 0.5).cast("long"))
      val gs = featureCols.map(c =>
        sum(floor(((yd - sig) * fj(c)) * 1000000000.0 + 0.5).cast("long")))
      val row = f.agg(g0, gs: _*).collect()(0)
      for (j <- w.indices)
        w(j) += math.floor((lr * row.getLong(j).toDouble) / n + 0.5).toLong
    }
    val hits = f.agg(sum(when((zExpr >= 0.0) === (col(labelCol) === 1), 1L)
      .otherwise(0L))).collect()(0).getLong(0)
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType) +:
      (("w_bias" +: featureCols.map("w_" + _)) :+ "accuracy").map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.DoubleType)))
    val vals: Seq[Any] = n +: w.toSeq.map(_.toDouble / 1e9) :+
      (math.floor((hits.toDouble * 1000000.0) / n + 0.5) / 1000000.0)
    spark.createDataFrame(
      java.util.Collections.singletonList(
        org.apache.spark.sql.Row(vals: _*)), schema)
  }

  /** Unigram-LM tokenizer training (SentencePiece-style, Kudo 2018) —
    * the third tokenizer family beside [[bpeLearn]] and the WordPiece
    * fertility audit: seed a candidate vocabulary from frequent word
    * substrings, then hard-EM — E: Viterbi-segment every DISTINCT word
    * under current piece scores (the all-integer
    * [[graft.functions.UnigramSegment]] expression — reference-object,
    * no UDF, deterministic tie-breaks); M: re-estimate piece log-probs
    * from segmentation counts; prune multi-char pieces that won zero
    * mass (they cannot revive under hard-EM). Uncovered single chars
    * stay at the UNK floor, the byte-fallback analogue.
    *
    * Scale shape: ONE corpus scan builds the distinct-word frequency
    * table; everything after is vocabulary-cardinality — substring
    * seeding explodes the WORD table (bounded by maxPieceLen · word
    * length), the seed cut is a distributed TakeOrdered, and each EM
    * round is one vocab-table scan whose piece counts collect
    * driver-side (bounded by seedSize + alphabet — the kmeans pattern)
    * and re-enter the next round as expression literals. `seedSize`,
    * `maxPieceLen`, `rounds` are human budgets, never data-sized.
    *
    * Exactness: seed/EM scores are micro-floored ln(count/total) longs
    * (driver math.log == engine ln, both correctly rounded), the DP is
    * exact-integer, and the M-step normalizes over positive-count
    * pieces only — the planted twin's oracle reproduces counts AND
    * log-probs analytically. Returns (piece, count, logprob) sorted by
    * piece. */
  def unigramLmLearn(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
      seedSize: Int = 40, rounds: Int = 2): DataFrame = {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(seedSize >= 1 && rounds >= 1, "seedSize and rounds must be >= 1")
    val spark = docs.sparkSession
    val words = docs.select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc")).localCheckpoint()

    // candidate substrings weighted by word frequency (every occurrence
    // inside a word counts once per corpus occurrence of the word)
    val subs = words.select(col("wc"), explode(flatten(
        transform(sequence(lit(1), least(length(col("w")), lit(maxPieceLen))),
          l => transform(sequence(lit(1), length(col("w")) - l + 1),
            st => col("w").substr(st, l))))).as("p"))
      .groupBy("p").agg(sum(col("wc")).as("f"))
    val chars = subs.where(length(col("p")) === 1)
    val multi = subs.where(length(col("p")) >= 2)
      .orderBy(col("f").desc, col("p").asc).limit(seedSize)
    val seedRows = chars.unionAll(multi).collect()
    val seedTotal = seedRows.map(_.getLong(1)).sum
    var pieces: Seq[(String, Long)] = seedRows.map { r =>
      r.getString(0) -> math.floor(
        math.log(r.getLong(1).toDouble / seedTotal.toDouble) * 1000000.0
          + 0.5).toLong
    }.toSeq
    var counts: Map[String, Long] = Map.empty

    for (_ <- 1 to rounds) {
      val seg = graft.functions.UnigramSegment
        .unigram_segment(col("w"), pieces)
      val cRows = words.select(col("wc"), explode(seg).as("p"))
        .groupBy("p").agg(sum(col("wc")).as("c")).collect()
      counts = cRows.map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = counts.values.sum
      val kept = pieces.map(_._1).filter(p =>
        p.length == 1 || counts.getOrElse(p, 0L) > 0L)
      pieces = kept.sorted.map { p =>
        val c = counts.getOrElse(p, 0L)
        p -> (if (c > 0)
          math.floor(math.log(c.toDouble / total.toDouble) * 1000000.0
            + 0.5).toLong
        else graft.functions.UnigramSegment.UnkFloorMicro)
      }
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("piece",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("count",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("logprob",
        org.apache.spark.sql.types.DoubleType)))
    val out = pieces.map { case (p, micro) =>
      org.apache.spark.sql.Row(p, counts.getOrElse(p, 0L), micro / 1000000.0)
    }
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava, schema)
  }

  /** DSIR importance weights (Xie et al. 2023): score each raw document by
    * `log p_target(x) − log p_raw(x)` under unigram bag-of-words LMs — the
    * data-selection step that resamples a web corpus toward a target
    * domain. The target LM trains on a (small) target-domain sample, the
    * raw LM on the corpus being scored; high weight = target-like. OOV
    * tokens floor at `oovFloorOver / total` on each side, mirroring
    * [[unigramSurprisal]]. Output: (doc_id, n_tokens, log_weight rounded
    * to 6) — feed `log_weight` through a softmax/Gumbel resample or a
    * threshold cut downstream.
    *
    * Scale shape: two pre-combined frequency aggregations (raw side is
    * the corpus-cardinality one), per-doc token COUNTS aggregate before
    * the frequency joins (inputs shrink by each doc's repetition factor),
    * the two totals ride one broadcast row, and AQE broadcasts the
    * frequency tables at real vocab sizes. */
  def dsirWeights(docs: DataFrame, textCol: String, idCol: String,
      target: DataFrame, targetTextCol: String = "text",
      oovFloorOver: Double = 0.5): DataFrame = {
    def toksOf(df: DataFrame, tc: String, extra: Column*): DataFrame =
      df.select(extra :+ explode(tokens(lower(col(tc)))).as("tok"): _*)
    val rawFreq = toksOf(docs, textCol).groupBy("tok")
      .agg(count(lit(1)).as("__nr"))
    val tgtFreq = toksOf(target, targetTextCol).groupBy("tok")
      .agg(count(lit(1)).as("__nt"))
    val totals = broadcast(rawFreq.agg(sum(col("__nr")).as("__totr"))
      .crossJoin(tgtFreq.agg(sum(col("__nt")).as("__tott"))))
    val docToks = toksOf(docs, textCol, col(idCol).as("doc_id"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("__c"))
    docToks
      .join(rawFreq, Seq("tok"), "left")
      .join(tgtFreq, Seq("tok"), "left")
      .crossJoin(totals)
      .withColumn("__lw",
        log(coalesce(col("__nt").cast("double"), lit(oovFloorOver)) / col("__tott")) -
          log(coalesce(col("__nr").cast("double"), lit(oovFloorOver)) / col("__totr")))
      .groupBy("doc_id")
      .agg(
        sum(col("__c")).as("n_tokens"),
        round(sum(col("__c") * col("__lw")), 6).as("log_weight"))
  }

  /** Sketch-percentile harness: per-group `percentile_approx` (Spark's
    * Greenwald-Khanna variant — THE length/latency percentile at 100 TB,
    * one fixed-size sketch per partition, merged) hash-pinned by a
    * rank-error bound. percentile_approx(acc) guarantees the returned
    * value's rank is within n/acc of the target; this report checks the
    * sketch value sits between the EXACT order statistics at ranks
    * (q ± margin/acc)·n and emits the claim as a boolean next to the
    * exact interpolated percentile (integer inputs interpolate
    * bit-identically across engines — the q20 trick).
    *
    * The exact side is the VERIFY harness, not the scale path: one
    * rank window per group. The operator a cluster runs is the sketch
    * agg alone. */
  def lengthQuantileSketchBound(docs: DataFrame, textCol: String,
      groupCol: String, q: Double = 0.5, accuracy: Int = 100,
      margin: Double = 2.0): DataFrame = {
    val base = docs.select(col(groupCol),
      tokenCount(col(textCol)).cast(LongType).as("__len"))
    val eps = margin / accuracy
    val stats = base.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      percentile_approx(col("__len"), lit(q), lit(accuracy)).as("__approx"),
      round(percentile(col("__len"), lit(q)), 6).as(s"exact_p${(q * 100).toInt}"))
    val ranked = base.withColumn("__rn",
      row_number().over(Window.partitionBy(groupCol).orderBy(col("__len"))))
    val bounds = ranked.join(stats.select(col(groupCol), col("n")), Seq(groupCol))
      .where(col("__rn") === greatest(lit(1L), floor(lit(q - eps) * col("n"))) ||
        col("__rn") === least(col("n"), ceil(lit(q + eps) * col("n"))))
      .groupBy(groupCol)
      .agg(min(col("__len")).as("__lo"), max(col("__len")).as("__hi"))
    stats.join(bounds, Seq(groupCol))
      .select(col(groupCol), col("n"), col(s"exact_p${(q * 100).toInt}"),
        (col("__approx") >= col("__lo") && col("__approx") <= col("__hi"))
          .as("approx_within_eps"))
  }

  /** Multinomial Naive Bayes classifier, trained AND applied relationally
    * — the fasttext-style shallow classifier that curation pipelines use
    * for language ID and quality gating (e.g. the GPT-3/LLaMA "looks like
    * WebText/Wikipedia" filters), here with no model artifact at all: the
    * model IS three aggregate tables. Add-one (Laplace) smoothing; a token
    * unseen for a class scores `ln(smoothing / (N_c + smoothing·V))`;
    * prediction is the per-doc argmax of
    * `ln P(class) + Σ_w c(w,doc)·ln P(w|class)`.
    *
    * Determinism: scores round to 6 dp AFTER the per-(doc,class) sum (the
    * t12/t22 pattern), and the argmax tie-breaks on the label string, so
    * the report hash-matches across engines. Docs with zero tokens have no
    * likelihood rows and drop out on both sides.
    *
    * Scale shape: the model tables are vocabulary-cardinality (token-class
    * counts pre-combine map-side); per-doc token COUNTS aggregate before
    * any join, so the scoring join input shrinks by each doc's repetition
    * factor; class stats (priors, totals, |V|) ride one small broadcast;
    * the likelihood join keys on (tok, class) — AQE broadcasts the model
    * at real vocabulary sizes. The argmax is a doc-partitioned window. */
  def naiveBayesClassify(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, smoothing: Double = 1.0): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      col(labelCol).as("__lbl"), explode(tokens(lower(col(textCol)))).as("tok"))
    val tokClass = toks.groupBy("__lbl", "tok").agg(count(lit(1)).as("__nwc"))
    val classTotals = tokClass.groupBy("__lbl")
      .agg(sum(col("__nwc")).cast(DoubleType).as("__nc"))
    val vocab = tokClass.select("tok").distinct()
      .agg(count(lit(1)).cast(DoubleType).as("__v"))
    val priors = docs.groupBy(col(labelCol).as("__lbl"))
      .agg(count(lit(1)).as("__docs"))
    val totDocs = docs.agg(count(lit(1)).cast(DoubleType).as("__totdocs"))
    val classStats = broadcast(priors.join(classTotals, "__lbl")
      .crossJoin(vocab).crossJoin(totDocs)
      .select(col("__lbl"), col("__nc"), col("__v"),
        log(col("__docs").cast(DoubleType) / col("__totdocs")).as("__prior")))
    val docToks = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("__c"))
    val scored = docToks.crossJoin(classStats)
      .join(tokClass, Seq("tok", "__lbl"), "left")
      .withColumn("__lp", log(
        (coalesce(col("__nwc").cast(DoubleType), lit(0.0)) + lit(smoothing)) /
          (col("__nc") + lit(smoothing) * col("__v"))))
      .groupBy("doc_id", "__lbl", "__prior")
      .agg(round(col("__prior") + sum(col("__c") * col("__lp")), 6).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("__lbl").asc)
    scored.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .join(docs.select(col(idCol).as("doc_id"), col(labelCol).as("__actual")),
        Seq("doc_id"))
      .select(col("doc_id"), col("__lbl").as("predicted"), col("score"),
        (col("__lbl") === col("__actual")).as("correct"))
  }

  /** Collocation mining by pointwise mutual information (Church & Hanks
    * 1990): the top-k adjacent word pairs whose co-occurrence beats the
    * independence assumption, with a min-count floor to kill the
    * low-frequency PMI explosion. The tokenizer-curriculum/phrase-vocab
    * audit ("which multi-word units does this corpus treat as one
    * symbol"). `pmi = ln( (c_xy/N_pairs) / ((c_x/N_toks)·(c_y/N_toks)) )`,
    * computed with the identical expression shape on both engines; every
    * output value is per-pair arithmetic — no cross-pair float sums — so
    * the report hash-matches.
    *
    * Scale shape: unigram and bigram tables each come from ONE
    * pre-combined agg over a single corpus scan; both totals ride one
    * broadcast row; the count-floored bigram table joins the (skinny)
    * unigram table twice on token equality — AQE broadcasts it at real
    * vocab sizes; top-k is orderBy+limit (TakeOrdered). */
  def pmiCollocations(docs: DataFrame, textCol: String, k: Int = 30,
      minCount: Long = 5L): DataFrame = {
    val withToks = docs.select(graft.functions.OptimizerFence.fence(
      tokens(lower(col(textCol)))).as("__toks"))
    val uni = withToks.select(explode(col("__toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__n"))
    val bigrams = withToks.where(size(col("__toks")) >= 2)
      .select(explode(zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("pair_count"))
    val totals = broadcast(
      uni.agg(sum(col("__n")).cast(DoubleType).as("__nt"))
        .crossJoin(bigrams.agg(sum(col("pair_count")).cast(DoubleType).as("__np"))))
    bigrams.where(col("pair_count") >= minCount)
      .join(uni.select(col("tok").as("w1"), col("__n").as("__n1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("__n").as("__n2")), Seq("w2"))
      .crossJoin(totals)
      .select(col("w1"), col("w2"), col("pair_count"),
        round(log((col("pair_count").cast(DoubleType) / col("__np")) /
          ((col("__n1").cast(DoubleType) / col("__nt")) *
            (col("__n2").cast(DoubleType) / col("__nt")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Vocabulary drift between two corpus slices (crawl snapshots, source
    * cohorts): the top-k tokens by pointwise KL contribution
    * p_a·ln(p_a/p_b) — "which tokens drove the distribution shift", the
    * audit run before/after a recrawl or filter change. Tokens absent
    * from `b` floor at `oovFloorOver / total_b` (the drift spike a truly
    * new token deserves). Every output value is per-term arithmetic — no
    * cross-term float sums — so the report hash-matches across engines.
    *
    * Scale shape: two pre-combined frequency aggs; totals ride one
    * broadcast row; the top-k is an orderBy+limit (TakeOrdered — no
    * single-partition sort even at 100M-term vocabularies). */
  def vocabDriftTopK(a: DataFrame, b: DataFrame, textCol: String,
      k: Int = 30, oovFloorOver: Double = 0.5): DataFrame = {
    def freqs(df: DataFrame) = df
      .select(explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy("tok")
    val fa = freqs(a).agg(count(lit(1)).as("n_a"))
    val fb = freqs(b).agg(count(lit(1)).as("n_b"))
    val tot = broadcast(fa.agg(sum(col("n_a")).as("__ta"))
      .crossJoin(fb.agg(sum(col("n_b")).as("__tb"))))
    fa.join(fb, Seq("tok"), "left").crossJoin(tot)
      .withColumn("__pa", col("n_a").cast(DoubleType) / col("__ta"))
      .withColumn("__pb",
        coalesce(col("n_b").cast(DoubleType), lit(oovFloorOver)) / col("__tb"))
      .select(col("tok"), col("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        round(col("__pa") * log(col("__pa") / col("__pb")), 9).as("kl_contrib"))
      .orderBy(col("kl_contrib").desc, col("tok").asc)
      .limit(k)
  }

  /** Distinct word n-grams from an ALREADY-MATERIALIZED tokens column
    * (empty below n words — decontamination can't match a sub-n-gram
    * snippet). Two perf lessons baked in (both measured): `toksCol` must
    * be a plain column reference, not an inline `split(...)` captured in
    * a lambda (re-evaluates per element — O(n²) tokenization), and grams
    * build by iterated zip_with against shifted views, not
    * transform(sequence)+slice (per-position slice allocation dominated
    * the minhash pipeline the same way — see Dedup.wordShingles). */
  private def wordNgrams(toksCol: Column, n: Int): Column = {
    val grams = (1 until n).foldLeft(toksCol) { (acc, k) =>
      zip_with(acc, slice(toksCol, lit(k + 1), greatest(size(toksCol) - k, lit(1))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(toksCol) >= n, array_distinct(array_compact(grams)))
      .otherwise(array().cast("array<string>"))
  }

  /** N-gram-overlap decontamination — the standard contamination check
    * (N-consecutive-token collision between a training document and any
    * benchmark snippet), the scale path beyond [[contaminatedDocs]]'s
    * broadcast substring scan: both sides explode to distinct n-grams and
    * meet in an EQUI-JOIN, so a million-snippet benchmark suite works where
    * an O(|doc|·|snippets|) containment scan cannot.
    *
    * Scale shape: the corpus side of the shuffle ships (doc_id, md5(gram))
    * — 16-byte keys, never the text; snippet grams are distinct'd (small)
    * and broadcast by AQE when they fit. Output: one row per contaminated
    * doc with its distinct colliding-gram count. */
  def ngramContamination(docs: DataFrame, textCol: String, idCol: String,
      snippets: DataFrame, snippetCol: String, n: Int = 5): DataFrame = {
    val docGrams = docs
      .select(col(idCol).as("doc_id"), graft.functions.OptimizerFence.fence(tokens(lower(col(textCol)))).as("__toks"))
      .select(col("doc_id"), explode(wordNgrams(col("__toks"), n)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gram_key"))
    val snipGrams = snippets
      .select(graft.functions.OptimizerFence.fence(tokens(lower(col(snippetCol)))).as("__toks"))
      .select(explode(wordNgrams(col("__toks"), n)).as("gram"))
      .select(md5(col("gram")).as("gram_key")).distinct()
    docGrams.join(snipGrams, "gram_key")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_gram_hits"))
  }

  /** Bloom-pruned n-gram decontamination — [[ngramContamination]] with the
    * corpus side of the shuffle cut to (suspected) hits only. The snippet
    * grams build ONE bloom filter (bounded: numBits/8 bytes, collected
    * driver-side and inlined as a constant — the centroid/codebook
    * pattern); the corpus gram explosion then probes the bloom in the
    * SCAN-SIDE filter, so only grams that might match (true hits + the
    * ~1% false-positive trickle) ever reach the exchange. The exact
    * md5-key equi-join stays as the verifier, so false positives cannot
    * reach the output and the result is identical to the unpruned path.
    *
    * At 100 TB this is the difference between shuffling every corpus
    * 5-gram key (~20 bytes × grams) and shuffling ~nothing: bloom probes
    * are codegen'd hash arithmetic against a broadcast-once constant. */
  def ngramContaminationBloom(docs: DataFrame, textCol: String, idCol: String,
      snippets: DataFrame, snippetCol: String, n: Int = 5): DataFrame = {
    import graft.functions.Bloom
    val snipGrams = snippets
      .select(graft.functions.OptimizerFence.fence(tokens(lower(col(snippetCol)))).as("__toks"))
      .select(explode(wordNgrams(col("__toks"), n)).as("gram"))
      .select(md5(col("gram")).as("gram_key"), xxhash64(col("gram")).as("__h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val items = snipGrams.count()
    if (items == 0) {
      snipGrams.unpersist(false)
      // no snippets -> no contamination; keep the output schema
      docs.select(col(idCol).as("doc_id"), lit(0L).as("n_gram_hits"))
        .where(lit(false))
    } else {
      // ~10 bits/item ≈ 1% false positives — FPs only cost verify-join
      // traffic, never correctness
      val numBits = math.max(items * 10L, 64L)
      val bloomBytes = snipGrams
        .agg(Bloom.bloom_filter_agg(col("__h"), items, numBits).as("bf"))
        .collect()(0).getAs[Array[Byte]](0)
      val docGrams = docs
        .select(col(idCol).as("doc_id"), graft.functions.OptimizerFence.fence(tokens(lower(col(textCol)))).as("__toks"))
        .select(col("doc_id"), explode(wordNgrams(col("__toks"), n)).as("gram"))
        .where(Bloom.might_contain(bloomBytes, xxhash64(col("gram"))))
        .select(col("doc_id"), md5(col("gram")).as("gram_key"))
      val out = docGrams.join(snipGrams.select("gram_key"), "gram_key")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_gram_hits"))
      Dedup.materializeAndRelease(out, Seq(snipGrams))
    }
  }

  /** Compression-ratio quality signal — `deflate_bytes / utf8_bytes`
    * per document (the Gopher/RefinedWeb repetition-and-noise detector
    * [[charEntropy]]'s model-based sibling: DEFLATE sees LONG-RANGE
    * repetition inside its 32 KB window that a unigram entropy cannot).
    * Ratio near 0 = boilerplate/templated text; near/above the content
    * entropy = encoded-blob noise; prose sits in a stable mid band.
    * Runs on the eval-only [[graft.functions.DeflateSize]] expression —
    * a scan-side projection, no shuffle; the ratio micro-floors. Null
    * ratio for empty documents. Returns (doc_id, n_bytes,
    * deflate_bytes, ratio). */
  def compressionRatio(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      octet_length(col(textCol)).cast("long").as("n_bytes"),
      graft.functions.DeflateSize.column(col(textCol)).cast("long")
        .as("deflate_bytes"))
      .withColumn("ratio", when(col("n_bytes") > 0,
        floor(col("deflate_bytes").cast("double") * 1000000.0 /
          col("n_bytes") + 0.5) / 1000000.0))

  /** Unicode NFC normalization pass — the cleanup that makes every
    * downstream equality-based operator (shingle dedup, BPE words,
    * decontamination grams) see one canonical byte form per grapheme;
    * see [[graft.functions.NfcNormalize]] for why. A scan-side
    * projection on the codegen'd expression — no shuffle, no UDF;
    * `changed` marks the rows a real pipeline would audit. Null text
    * nulls the row's text/lengths but keeps the id (o9-style routing
    * stays possible). Returns (doc_id, raw_chars, nfc_chars, changed,
    * text_nfc). */
  def unicodeNormalize(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val nfc = graft.functions.NfcNormalize.column(col(textCol))
    docs.select(col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("raw_chars"),
      length(nfc).cast("long").as("nfc_chars"),
      (nfc =!= col(textCol)).as("changed"),
      nfc.as("text_nfc"))
  }

  /** C4-style blocklist filter — drop a page if any listed phrase
    * occurs — on the [[graft.functions.MultiMatch]] Aho–Corasick
    * expression: every pattern is matched in ONE O(len) walk per
    * document instead of P `contains` probes, which is what makes a
    * 10³–10⁴-phrase blocklist affordable at corpus scale. Substring
    * semantics (phrases may cross token boundaries); matching is on the
    * lowercased text. A pure scan-side projection. Returns (doc_id,
    * matched — the distinct hits, sorted, comma-joined — n_matched,
    * blocked). */
  def blocklistFilter(docs: DataFrame, textCol: String, idCol: String,
      patterns: Seq[String]): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.MultiMatch.multi_match(lower(col(textCol)),
        patterns.map(_.toLowerCase)).as("__m"))
      .select(col("doc_id"),
        concat_ws(",", col("__m")).as("matched"),
        size(col("__m")).cast("long").as("n_matched"),
        (size(col("__m")) > 0).as("blocked"))

  /** Per-document character-level Shannon entropy (nats) — the
    * gibberish / encoded-blob / repeated-filler detector that rounds out
    * the quality family (low entropy = repetitive filler, high ≈ uniform
    * entropy = base64/compressed junk; natural text sits in a stable
    * band). Characters are UTF-16 code units of the lowered text
    * (`split(text, "")` semantics), whitespace included — a
    * supplementary-plane character counts as its two surrogate halves.
    * DuckDB splits by CODE POINT, so oracle parity holds for BMP text
    * only (the test corpora are BMP/ASCII); for non-BMP corpora the
    * two engines diverge by design of their string models — count code
    * points (or [[unicodeNormalize]] first) if that matters.
    *
    * Determinism (the money-in-cents move on − p·ln p): each character
    * class's term `floor(p·ln(p)·10⁹ + 0.5)` is one fixed double
    * expression over exact integer counts, and the per-document SUM is
    * an INTEGER sum — order-free under any partitioning and any engine,
    * so the row hash-matches (ln parity with DuckDB is already proven by
    * the surprisal rows). Scale shape: one char explode into a
    * pre-combined (doc, char) count, a skinny per-doc total join, one
    * pre-combined integer agg; empty documents return entropy 0, never
    * vanish. Returns (doc_id, n_chars, distinct_chars, entropy_nats). */
  def charEntropy(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val counts = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "")).as("ch"))
      .where(col("ch") =!= "")
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val tot = counts.groupBy("doc_id")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("k"))
    val p = col("c").cast("double") / col("n")
    val scored = counts.join(tot, "doc_id")
      .select(col("doc_id"), col("n"), col("k"),
        floor(p * log(p) * 1000000000.0 + 0.5).cast("long").as("u"))
      .groupBy("doc_id")
      .agg(max(col("n")).as("n_chars"), max(col("k")).as("distinct_chars"),
        round(-sum(col("u")).cast("double") / 1000000000.0, 6)
          .as("entropy_nats"))
    docs.select(col(idCol).as("doc_id")).distinct()
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("distinct_chars"), lit(0L)).as("distinct_chars"),
        coalesce(col("entropy_nats"), lit(0.0)).as("entropy_nats"))
  }

  /** Unicode script profile + homoglyph-spoofing signal — the
    * cross-lingual corpus hygiene pass beside [[langId]]: per-document
    * counts of Latin / Cyrillic / Greek / Han letters plus the number of
    * MIXED-SCRIPT tokens (a token carrying Latin AND Cyrillic-or-Greek
    * letters — the confusable-substitution shape of spoofed domains,
    * poisoned entities, and OCR noise; pure single-script text never
    * trips it). `suspicious` flags any doc with a mixed token — route to
    * quarantine or NFKC-confusable normalization downstream.
    *
    * A pure scan-side projection (regexp counts + one token filter, all
    * codegen'd) — zero shuffle at any corpus size. Script classes are
    * Java `\p{IsX}` here and RE2 `\p{X}` in the oracle — same Unicode
    * script property either way. Returns (doc_id, latin_chars,
    * cyrillic_chars, greek_chars, han_chars, mixed_tokens,
    * suspicious). */
  def scriptProfile(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    def cnt(cls: String) =
      size(regexp_extract_all(col(textCol), lit(s"[\\p{Is$cls}]"), lit(0)))
        .cast(LongType)
    val mixed = size(filter(tokens(col(textCol)), t =>
      t.rlike("\\p{IsLatin}") &&
        t.rlike("[\\p{IsCyrillic}\\p{IsGreek}]"))).cast(LongType)
    docs.select(col(idCol).as("doc_id"),
      cnt("Latin").as("latin_chars"),
      cnt("Cyrillic").as("cyrillic_chars"),
      cnt("Greek").as("greek_chars"),
      cnt("Han").as("han_chars"),
      mixed.as("mixed_tokens"))
      .withColumn("suspicious", col("mixed_tokens") > 0)
  }

  /** HTML boilerplate extraction with the jusText/boilerpipe link-density
    * signal — the post-WARC step between [[graft.functions.WarcSplit]]
    * framing and the text-quality family: strip tags, decode the five
    * basic entities, and measure how much of the visible text sits
    * inside anchors. High link density = navigation/footer chrome; low =
    * content. `text_chars` counts the stripped visible text, `link_chars`
    * the visible text inside `<a ...>...</a>` pairs,
    * `link_density = link_chars / text_chars` (null for empty pages),
    * `tag_count` the raw tag count.
    *
    * A pure scan-side projection (regexp passes + entity replaces,
    * codegen'd, RE2-compatible lazy quantifiers) — zero shuffle; run it
    * in the ingest scan right after WARC framing. `<script>`/`<style>`
    * bodies are stripped BEFORE counting visible text (their contents
    * are code, not prose), and the anchor pattern requires a tag-name
    * boundary (`<a>` or `<a␣...>`, case-insensitive) so `<abbr>`,
    * `<article>`, `<aside>`, `<audio>` never read as anchors. Returns
    * (doc_id, text_chars, link_chars, tag_count, link_density, text). */
  def htmlExtract(docs: DataFrame, htmlCol: String,
      idCol: String): DataFrame = {
    // strip + decode + anchor count fused into the one-scan native
    // expression (graft.functions.HtmlVisible) — replaces ~9 regex
    // passes per page; the oracle keeps the equivalent regex spelling
    val hv = graft.functions.HtmlVisible.html_visible(
      stripScriptStyle(col(htmlCol)))
    docs.select(col(idCol).as("doc_id"),
      hv.getField("text").as("text"),
      hv.getField("link_chars").as("link_chars"),
      size(regexp_extract_all(col(htmlCol), lit("<[^>]+>"), lit(0)))
        .cast(LongType).as("tag_count"))
      .select(col("doc_id"),
        length(col("text")).cast(LongType).as("text_chars"),
        col("link_chars"), col("tag_count"),
        when(length(col("text")) > 0,
          floor(col("link_chars").cast(DoubleType) * 1000000.0 /
            length(col("text")) + 0.5) / 1000000.0).as("link_density"),
        col("text"))
  }

  /** Mojibake / encoding-artifact profile — the double-encoding detector
    * (ftfy's bread and butter) that belongs beside [[scriptProfile]] in
    * corpus hygiene: UTF-8 bytes decoded as Windows-1252/Latin-1 leave
    * unmistakable signatures — `Ã` followed by a Latin-1 high character
    * (é→Ã©, ü→Ã¼ — the accented-Latin family), the `â€` prefix (curly
    * quotes/dashes ’ “ ” – — all corrupt to â€-led runs), stray `Â`
    * (non-breaking spaces), and the replacement character U+FFFD from
    * lossy decodes. Counts each family plus a per-code-point ratio;
    * `suspect` flags any document carrying an artifact. All counts are
    * exact integers and both engines measure length in CODE POINTS, so
    * the row hash-matches.
    *
    * A pure scan-side regexp projection, zero shuffle at any corpus
    * size. Returns (doc_id, latin1_runs, quote_runs, nbsp_runs,
    * replacement_chars, mojibake_ratio, suspect). */
  def mojibakeProfile(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    def cnt(pat: String) =
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast(LongType)
    val latin1 = cnt("Ã[\\x{80}-\\x{ff}]")
    val quotes = cnt("â€")
    val nbsp = cnt("Â")
    val repl = cnt("�")
    docs.select(col(idCol).as("doc_id"),
      latin1.as("latin1_runs"), quotes.as("quote_runs"),
      nbsp.as("nbsp_runs"), repl.as("replacement_chars"),
      when(length(col(textCol)) > 0,
        floor((latin1 + quotes + nbsp + repl).cast(DoubleType) * 1000000.0 /
          length(col(textCol)).cast(DoubleType) + 0.5) / 1000000.0)
        .otherwise(lit(0.0)).as("mojibake_ratio"))
      .withColumn("suspect",
        col("latin1_runs") + col("quote_runs") + col("nbsp_runs") +
          col("replacement_chars") > 0)
  }

  /** The basic HTML entities plus their COMMON numeric/hex character
    * references, decoded in a fixed order — the `&`-producing decodes
    * (`&amp;`, `&#38;`, `&#x26;`) run LAST so `&amp;lt;` yields the
    * literal `&lt;`, not `<`. Hex references are case-insensitive per
    * the HTML spec (`(?i)` works identically in java.util.regex and
    * RE2, so the oracle chain matches byte-for-byte). `&nbsp;`/`&#160;`
    * decode to a PLAIN space: neither engine's `\s` matches U+00A0, so
    * a real NBSP would silently glue tokens through every downstream
    * tokenizer — documented divergence from a byte-faithful decode.
    * Truly general `&#NNNN;` decoding needs per-codepoint char
    * construction that has no common SQL surface; references outside
    * this table pass through verbatim (and count as visible chars).
    *
    * One alternation PASS per target character (6 passes, not 18 — the
    * decode chain runs per block AND per anchor in the jusText path, so
    * pass count is the hot-path constant): within a pass the named /
    * decimal / hex forms can't create each other, so the fold is
    * behavior-identical to sequential passes — except the double-decode
    * a sequential chain had ("&amp;#38;" decoded clear to "&"; one pass
    * correctly stops at the literal "&#38;" the HTML means). Hex forms
    * keep their case-insensitivity via an inline `(?i:...)` group
    * (identical in java.util.regex and RE2). The single source of truth
    * is [[graft.functions.HtmlVisible.Entities]] — the native scanner
    * and this regex mirror decode identically by construction. */
  private val entityTable: Seq[(String, String)] =
    graft.functions.HtmlVisible.entityRegexTable

  private[pipeline] def decodeEntities(c: Column): Column =
    entityTable.foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }

  /** The identical decode chain as DuckDB SQL (regexp_replace with the
    * same patterns, global flag), for oracles that mirror
    * [[decodeEntities]]. */
  def entityDecodeSql(expr: String): String =
    entityTable.foldLeft(expr) { case (acc, (e, r)) =>
      s"regexp_replace($acc, '${e.replace("'", "''")}', '${r.replace("'", "''")}', 'g')"
    }

  /** Drop `<script>`/`<style>` bodies — two passes, one tag each: RE2
    * (the oracle engine) has no backreferences, so `</(script|style)>`
    * cross-matching is avoided by construction rather than by a backref. */
  private[pipeline] def stripScriptStyle(c: Column): Column =
    Seq("script", "style").foldLeft(c) { (acc, tag) =>
      regexp_replace(acc, s"(?is)<$tag(\\s[^>]*)?>.*?</$tag>", "")
    }

  /** Block-level HTML tags (open, close, or self-closing) — the segment
    * boundaries of [[justextBlocks]]. */
  private val blockTagPattern: String =
    "(?i)</?(p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|" +
      "blockquote|pre|section|article|header|footer|nav|aside|form|" +
      "fieldset|br|hr)(\\s[^>]*)?/?>"

  /** jusText-style block-level boilerplate classification (Pomikálek
    * 2011) — the context-sensitive upgrade of [[htmlExtract]]'s
    * page-level link-density signal: pages segment into blocks at
    * block-level tags, each block scores link density + stopword
    * density + length, and undecided blocks inherit from their
    * neighbors (boilerplate clusters at page edges; content runs in
    * the middle).
    *
    * Context-free classes: `bad` (link density > `maxLinkDensity`, or
    * stopword density below `stopwordsLow`), `short` (under
    * `lengthLow` visible chars), `good` (stopword density ≥
    * `stopwordsHigh` and over `lengthHigh` chars), `near_good`
    * (stopword-dense but short of `good`). Context pass, per document
    * in block order (page edge = bad on both sides) is the paper's
    * TWO-STAGE revision: stage 1 resolves each `short` block from its
    * nearest context-free good/bad neighbors SKIPPING short/near_good
    * blocks ({good,good} → good, {bad,bad} → bad, mixed → good only
    * when the bad side's nearest non-short neighbor is a near_good
    * shield); stage 2 resolves each `near_good` block against the
    * UPDATED classes (context-free good/bad plus the stage-1 shorts):
    * bad on both sides → bad, otherwise good. (The paper's
    * heading-promotion refinement, max_heading_distance, is out of
    * scope.) Defaults are the paper's English parameters; callers
    * with a small demo stoplist should scale the stopword thresholds
    * down accordingly.
    *
    * Scale shape: segmentation, per-block metrics, and context-free
    * classes are all scan-side (posexplode of a regexp split — no
    * join, no UDF); the context pass and re-indexing are windows
    * PARTITIONED BY doc_id ONLY (blocks-per-page bounded), sharing
    * one doc_id hash exchange. Returns (doc_id, block_idx, n_chars,
    * link_density, stop_density, cf_class, block_class, text). */
  def justextBlocks(docs: DataFrame, htmlCol: String, idCol: String,
      stopwords: Seq[String], maxLinkDensity: Double = 0.2,
      lengthLow: Int = 70, lengthHigh: Int = 200,
      stopwordsLow: Double = 0.30, stopwordsHigh: Double = 0.32): DataFrame = {
    val segmented =
      regexp_replace(stripScriptStyle(col(htmlCol)), blockTagPattern, "\n")
    // NOT widened (r20 receipt): spreading the input before the segment +
    // HtmlVisible extraction measured a clear LOSS at sf0.1 (t88
    // 0.45→0.92 s, p12 4.7→6.1 s) — the chain's two doc_id window passes
    // re-exchange right above it and the extra shuffle of raw HTML beats
    // any spread of the extraction, the same class as the rejected
    // justext fence (r19).
    val raw = docs.select(col(idCol).as("doc_id"),
      posexplode(split(segmented, "\n")).as(Seq("__pos", "__raw")))
    // strip + decode + anchor count fused into the one-scan native
    // expression (graft.functions.HtmlVisible); the oracle keeps the
    // equivalent regex spelling
    val hv = graft.functions.HtmlVisible.html_visible(col("__raw"))
    // stop density computed ONCE below the non-deterministic filter (r20,
    // the deferred justext 2x-tokenize item): the outer select references
    // it 3x (the __sd column and twice inside cf), and the tokenize +
    // isin-filter HOF is CodegenFallback — no codegen CSE — so inlining
    // re-tokenized every block per reference. The nondet filter below
    // already blocks CollapseProject from merging the two selects, which
    // is what the rejected fence bought at a higher price (r19 probe).
    val innerText = trim(hv.getField("text"))
    val innerToks = tokens(lower(innerText))
    val sdOnce =
      size(filter(innerToks, t => t.isin(stopwords: _*))).cast(DoubleType) /
        greatest(size(innerToks), lit(1)).cast(DoubleType)
    val scored0 = raw
      // cheap NECESSARY pre-filter (visible text nonempty implies the raw
      // segment is non-whitespace): drops the many empty splits block-tag
      // segmentation produces BEFORE any extraction work
      .where(length(trim(col("__raw"))) > 0)
      .select(col("doc_id"), col("__pos"),
        innerText.as("text"),
        hv.getField("link_chars").as("__lc"),
        sdOnce.as("__sd0"))
      // the `|| spark_partition_id() < 0` arm is always false: it makes
      // the exact predicate non-deterministic so Catalyst can NOT push it
      // below the projection — pushdown would alias-substitute `text` and
      // re-run the extraction per surviving block in the Filter
      .where(length(col("text")) > 0 || spark_partition_id() < 0)
    val nChars = length(col("text")).cast(LongType)
    // exact integer/integer divisions — identical IEEE doubles in both
    // engines, so the threshold compares match without rounding
    val linkDensity = col("__lc").cast(DoubleType) / nChars.cast(DoubleType)
    val stopDensity = col("__sd0")
    val cf = when(linkDensity > maxLinkDensity, "bad")
      .when(nChars < lengthLow, "short")
      .when(stopDensity >= stopwordsHigh,
        when(nChars > lengthHigh, lit("good")).otherwise(lit("near_good")))
      .when(stopDensity >= stopwordsLow, "near_good")
      .otherwise("bad")
    val scored = scored0.select(col("doc_id"), col("__pos"), col("text"),
      nChars.as("n_chars"), linkDensity.as("__ld"), stopDensity.as("__sd"),
      cf.as("cf_class"))
    val w = Window.partitionBy("doc_id").orderBy("__pos")
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val after = w.rowsBetween(1, Window.unboundedFollowing)
    // the paper's TWO-STAGE context resolution (justext
    // revise_paragraph_classification): stage 1 resolves SHORT blocks
    // from the nearest good/bad neighbors SKIPPING short/near_good
    // (page edge = bad) — {good,good} -> good, {bad,bad} -> bad, mixed
    // -> good only when the bad side is shielded by an adjacent-ward
    // near_good; stage 2 then resolves NEAR_GOOD blocks against the
    // UPDATED classes (cf good/bad + stage-1 shorts): bad on both
    // sides -> bad, any good neighbor -> good
    val gbCf = when(col("cf_class").isin("good", "bad"), col("cf_class"))
    val rawCf = when(col("cf_class") =!= "short", col("cf_class"))
    val prevCf = coalesce(last(gbCf, ignoreNulls = true).over(before), lit("bad"))
    val nextCf = coalesce(first(gbCf, ignoreNulls = true).over(after), lit("bad"))
    val prevRaw = coalesce(last(rawCf, ignoreNulls = true).over(before), lit("bad"))
    val nextRaw = coalesce(first(rawCf, ignoreNulls = true).over(after), lit("bad"))
    val shortClass = when(prevCf === "good" && nextCf === "good", "good")
      .when(prevCf === "bad" && nextCf === "bad", "bad")
      .when((prevCf === "bad" && prevRaw === "near_good") ||
        (nextCf === "bad" && nextRaw === "near_good"), "good")
      .otherwise("bad")
    val stage1 = scored.withColumn("__upd",
      when(col("cf_class").isin("good", "bad"), col("cf_class"))
        .when(col("cf_class") === "short", shortClass))
    val prevU = coalesce(last(col("__upd"), ignoreNulls = true).over(before),
      lit("bad"))
    val nextU = coalesce(first(col("__upd"), ignoreNulls = true).over(after),
      lit("bad"))
    val finalClass = when(col("__upd").isNotNull, col("__upd"))
      .otherwise(when(prevU === "bad" && nextU === "bad", "bad")
        .otherwise("good"))
    stage1.select(col("doc_id"),
      (row_number().over(w) - 1).cast(LongType).as("block_idx"),
      col("n_chars"),
      (floor(col("__ld") * 1000000.0 + 0.5) / 1000000.0).as("link_density"),
      (floor(col("__sd") * 1000000.0 + 0.5) / 1000000.0).as("stop_density"),
      col("cf_class"), finalClass.as("block_class"), col("text"))
  }

  /** Assemble [[justextBlocks]] output into per-document extracted
    * content: `good` blocks joined in block order (newline-separated).
    * A page with no good blocks returns empty content, never vanishes
    * (the c4LineClean rule). One groupBy(doc_id) that REUSES the block
    * window's partitioning — no second exchange. */
  def justextContent(blocks: DataFrame): DataFrame =
    blocks.groupBy("doc_id").agg(
      count(lit(1)).as("n_blocks"),
      sum(when(col("block_class") === "good", 1L).otherwise(0L)).as("n_good"),
      // when() without otherwise → null for non-good → collect_list drops
      array_join(transform(array_sort(collect_list(
        when(col("block_class") === "good",
          struct(col("block_idx"), col("text"))))),
        _.getField("text")), "\n").as("content"))
      .withColumn("content_chars", length(col("content")).cast(LongType))

  /** Site-template fingerprint — structural near-dup detection for web
    * corpora: pages generated from one CMS template share their TAG
    * SEQUENCE even when text and attribute values differ entirely, so
    * md5 over the ordered lowercased tag names clusters a crawl by
    * template. Template-dominant corpora (one template = thousands of
    * pages) are chrome-heavy; per-template keep caps or the
    * [[justextBlocks]] pass then apply per cluster, not per page.
    *
    * Scale shape: the fingerprint is a scan-side projection (the html
    * never shuffles); clustering is one pre-combined groupBy on the
    * 16-byte hash plus a hash-keyed join back of the skinny
    * (hash, template_id, size) table. Returns (doc_id, tpl_hash,
    * template_id = min doc_id of the cluster, template_size, n_tags). */
  def templateFingerprint(docs: DataFrame, htmlCol: String,
      idCol: String): DataFrame = {
    val names = regexp_extract_all(col(htmlCol),
      lit("</?([A-Za-z][A-Za-z0-9]*)"), lit(1))
    val tagged = docs.select(col(idCol).as("doc_id"),
      md5(array_join(transform(names, t => lower(t)), ",")).as("tpl_hash"),
      size(names).cast(LongType).as("n_tags"))
    val clusters = tagged.groupBy("tpl_hash").agg(
      min(col("doc_id")).as("template_id"),
      count(lit(1)).as("template_size"))
    tagged.join(clusters, Seq("tpl_hash"))
      .select("doc_id", "tpl_hash", "template_id", "template_size", "n_tags")
  }

  /** C4-style line cleaning with CORPUS-WIDE exact line dedup — the
    * web-corpus cleanup pass that precedes document-level dedup: C4
    * (Raffel et al. 2020) keeps only lines that end in terminal
    * punctuation and carry enough words, and CCNet/FineWeb dedup
    * repeated lines/paragraphs ACROSS the whole corpus (navigation
    * chrome, cookie banners, boilerplate headers appear on thousands
    * of pages — document-level dedup never sees them). Line filters
    * apply first (terminal `.`/`!`/`?` with an optional closing quote,
    * ≥ `minWords` whitespace words); filter-surviving lines then dedup
    * corpus-wide on the md5 of their trimmed text, keeping the FIRST
    * occurrence in (doc_id, line_idx) order. The doc verdict is C4's
    * page rule: ≥ 3 kept lines, no "lorem ipsum", no `{` in the raw
    * text. Every input document returns (doc_id, clean_text, n_lines,
    * n_kept, n_drop_filter, n_drop_dup, keep_doc) — a fully-dropped
    * page comes back with empty text, never silently vanishes.
    *
    * Scale shape: the line filter is scan-side; only filter-surviving
    * lines enter the dedup as skinny (doc_id, idx, 16-byte md5) rows
    * (line TEXT never shuffles). First-occurrence election is one
    * pre-combined groupBy(hash) min(struct) — no window over the
    * skewed hash key — and losers collapse to one per-doc dropped-idx
    * list, so the corpus text rides exactly ONE doc-keyed exchange
    * into the reassembly join; the cut runs scan-side over the split
    * array. */
  def c4LineClean(docs: DataFrame, textCol: String, idCol: String,
      minWords: Int = 3): DataFrame = {
    val (base, occ) = c4LineBase(docs, textCol, idCol, minWords)
    val winners = occ.groupBy("__lh")
      .agg(min(struct(col("doc_id"), col("idx"))).as("__w"))
    val dupDropped = occ.join(winners, Seq("__lh"))
      .where(struct(col("doc_id"), col("idx")) =!= col("__w"))
      .select(col("doc_id"), col("idx"))
    c4Reassemble(base, dupDropped, minWords)
  }

  /** C4 line-pass predicate: trimmed line ends in terminal punctuation
    * (optionally followed by a closing quote) and carries ≥ minWords
    * whitespace words. */
  private def c4LinePass(l: Column, minWords: Int): Column = {
    val t = trim(l)
    t.rlike("[.!?][\"']?$") && size(tokens(t)) >= minWords
  }

  /** Shared front half of the line-clean pair: `base` keeps the raw text
    * + split lines per doc; `occ` is the filter-SURVIVING line
    * occurrences as skinny (doc_id, idx, 16-byte md5) rows — line text
    * never leaves the scan. */
  private def c4LineBase(docs: DataFrame, textCol: String, idCol: String,
      minWords: Int): (DataFrame, DataFrame) = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__raw"),
      split(col(textCol), "\n").as("__lines"))
    val occ = base
      .select(col("doc_id"), posexplode(col("__lines")).as(Seq("idx", "__l")))
      .where(c4LinePass(col("__l"), minWords))
      .select(col("doc_id"), col("idx").cast(LongType).as("idx"),
        md5(trim(col("__l"))).as("__lh"))
    (base, occ)
  }

  /** Shared reassembly tail: `dupDropped` is the (doc_id, idx) set of
    * dedup-losing line occurrences; they collapse to one per-doc index
    * list, the corpus rides ONE doc-keyed join, and the cut + page
    * verdict run scan-side over the split array. */
  private def c4Reassemble(base: DataFrame, dupDropped: DataFrame,
      minWords: Int): DataFrame = {
    val dupIdx = dupDropped
      .groupBy("doc_id").agg(collect_list(col("idx")).as("__dup_idx"))
    base.join(dupIdx, Seq("doc_id"), "left")
      .withColumn("__dup_idx",
        coalesce(col("__dup_idx"), array().cast("array<long>")))
      .withColumn("__kept", filter(col("__lines"), (l, i) =>
        c4LinePass(l, minWords) &&
          !array_contains(col("__dup_idx"), i.cast(LongType))))
      .withColumn("__n_pass",
        size(filter(col("__lines"), l => c4LinePass(l, minWords)))
          .cast(LongType))
      .select(col("doc_id"),
        array_join(transform(col("__kept"), l => trim(l)), "\n")
          .as("clean_text"),
        size(col("__lines")).cast(LongType).as("n_lines"),
        size(col("__kept")).cast(LongType).as("n_kept"),
        (size(col("__lines")) - col("__n_pass")).cast(LongType)
          .as("n_drop_filter"),
        (col("__n_pass") - size(col("__kept"))).cast(LongType)
          .as("n_drop_dup"),
        (size(col("__kept")) >= 3 &&
          !lower(col("__raw")).contains("lorem ipsum") &&
          !col("__raw").contains("{")).as("keep_doc"))
  }

  /** One micro-batch step of STREAMING corpus-wide line dedup — the
    * [[graft.pipeline.Dedup.repeatedSubstringStoreStep]] contract at
    * line granularity: the arriving batch's lines are cleaned against
    * every line hash ingested so far (earlier batches win the
    * first-occurrence election; within the batch, (doc_id, idx) order
    * wins), then the batch's distinct line hashes join the store.
    * RETRY-IDEMPOTENT: hashes write to their OWN `batch_id=` partition
    * with overwrite and the read excludes the current batch's partition
    * (a line-hash store is a SET, so even a duplicate write would be
    * harmless — the partition idiom keeps the store's per-batch growth
    * accounting exact). Batch-proportional: prior hashes prune by the
    * batch's distinct line set via broadcast left-semi (scan + probe,
    * no store-side exchange), so only hashes the batch actually carries
    * ever reach a join. Returns the [[c4LineClean]] report columns for
    * the batch's docs. */
  def c4LineCleanStoreStep(batch: DataFrame, storeDir: String,
      textCol: String, idCol: String, minWords: Int = 3,
      batchId: Long,
      probeCap: Long = BatchStore.ProbeBroadcastCap,
      maxStoreParts: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val path = s"$storeDir/linehashes"
    val (base, occ0) = c4LineBase(batch, textCol, idCol, minWords)
    val occ = occ0.localCheckpoint()
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val priorParts = BatchStore.readableParts(
      fs, path, s"$storeDir/compactions", Some(batchId)).map(_._2)
    val batchHashes = occ.select("__lh").distinct()
    // one cardinality probe hints BOTH semi joins below: priorHit is a
    // subset of the batch's hash set, so the same bound covers it. A fat
    // batch drops the hint and the semis shuffle (still batch-
    // proportional) instead of hitting the broadcast ceiling
    val hinted: DataFrame => DataFrame =
      if (BatchStore.fitsBroadcast(batchHashes, probeCap))
        org.apache.spark.sql.functions.broadcast
      else identity
    val priorHit =
      if (priorParts.isEmpty) batchHashes.limit(0)
      else
        // explicit schema: a crashed write's _temporary-only partition
        // reads as empty instead of failing inference (the substring
        // store-step rule)
        spark.read.schema(StructType(Seq(
            StructField("__lh", StringType), StructField("batch_id", LongType))))
          .option("basePath", path).parquet(priorParts: _*)
          .select("__lh")
          .join(hinted(batchHashes), Seq("__lh"), "left_semi")
          .distinct()
    val winners = occ.groupBy("__lh")
      .agg(min(struct(col("doc_id"), col("idx"))).as("__w"))
    // dropped = prior-seen occurrences ∪ in-batch election losers
    val dropped = occ.join(hinted(priorHit), Seq("__lh"), "left_semi")
      .select(col("doc_id"), col("idx"))
      .unionAll(occ.join(winners, Seq("__lh"))
        .where(struct(col("doc_id"), col("idx")) =!= col("__w"))
        .select(col("doc_id"), col("idx")))
      .distinct()
    // pin the as-of-this-batch verdict before the store write (the
    // substring store-step materialization rule)
    val out = c4Reassemble(base, dropped, minWords).localCheckpoint()
    BatchStore.writeBatchPart(batchHashes, path,
      s"$storeDir/compactions", batchId)
    BatchStore.autoCompact(spark, path, s"$storeDir/compactions",
      maxStoreParts, batchId)(c4LineStoreCompact(spark, storeDir, _, _))
    out
  }

  /** Fold the line-hash store's committed batch partitions into one
    * consolidated negative-id partition (set semantics: distinct union),
    * bounding partition-count growth for long-lived streams — the
    * [[graft.pipeline.Dedup.repeatedSubstringStoreCompact]] lifecycle
    * at line granularity, same [[BatchStore]] marker protocol and retry
    * rules. Returns the folded ids. */
  def c4LineStoreCompact(spark: SparkSession, storeDir: String,
      compactId: Long, upToBatchId: Long): Seq[Long] =
    BatchStore.compact(spark, s"$storeDir/linehashes",
      s"$storeDir/compactions",
      Some(StructType(Seq(
        StructField("__lh", StringType), StructField("batch_id", LongType)))),
      compactId, upToBatchId,
      df => df.select("__lh").distinct())

  /** SURGICAL span decontamination — remove the n-gram-matching SPANS and
    * keep the rest of the document, instead of dropping whole documents
    * ([[ngramContamination]] counts; this cleans): the standard upgrade
    * when a long document merely QUOTES a benchmark item. Every token
    * covered by any n-gram that appears in the snippet set is cut; the
    * survivors reassemble in order (whitespace-canonicalized, lowered —
    * the same token stream every other text op sees). Returns every
    * input document as (doc_id, clean_text, n_tokens, n_removed) — a
    * fully-contaminated document comes back with empty text, never
    * silently vanishes.
    *
    * Scale shape: positional grams explode once per document (the
    * chunking/contamination gram shuffle, md5 keys — gram text never
    * shuffles past the hash); the snippet gram set is benchmark-sized
    * and its join prunes to matched starts; covered positions and the
    * keep anti-join ship skinny (doc_id, int) pairs; reassembly is one
    * per-doc pre-combined collect over kept tokens only. */
  def removeContaminatedSpans(docs: DataFrame, textCol: String, idCol: String,
      snippets: DataFrame, snippetCol: String, n: Int = 5): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      graft.functions.OptimizerFence.fence(tokens(lower(col(textCol)))).as("__toks"))
    // positional n-grams: index s (0-based) covers tokens s .. s+n-1
    val starts = base.select(col("doc_id"),
      posexplode(
        when(size(col("__toks")) >= n,
          transform(sequence(lit(0), size(col("__toks")) - n),
            s => concat_ws(" ", slice(col("__toks"), s + 1, lit(n)))))
          .otherwise(array().cast("array<string>"))).as(Seq("s", "gram")))
      .select(col("doc_id"), col("s"), md5(col("gram")).as("gram_key"))
    val snipGrams = snippets
      .select(graft.functions.OptimizerFence.fence(tokens(lower(col(snippetCol)))).as("__toks"))
      .select(explode(wordNgrams(col("__toks"), n)).as("gram"))
      .select(md5(col("gram")).as("gram_key")).distinct()
    val covered = starts.join(snipGrams, "gram_key")
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + (n - 1))).as("pos"))
      .distinct()
    val docToks = base.select(col("doc_id"),
      posexplode(col("__toks")).as(Seq("pos", "tok")))
    val kept = docToks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok"))).as("__clean"),
        count(lit(1)).as("__n_kept"))
    base.select(col("doc_id"), size(col("__toks")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__clean"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"))
  }

  /** Token-bounded chunking with overlap — the context-window prep op for
    * training pipelines. Chunk i covers words [i*step, i*step+chunkWords),
    * step = chunkWords − overlapWords; the last chunk is the first one whose
    * start reaches past (nWords − overlapWords), so every word is covered
    * and no chunk is a pure suffix of its predecessor.
    *
    * Scale shape: tokens materialize ONCE per doc (the generator input is a
    * cheap int sequence, not the token array — SCALE.md lesson 3), one
    * posexplode per doc, zero shuffle; output rows carry (doc_id, chunk_idx,
    * chunk_text, chunk_words). */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
      chunkWords: Int = 64, overlapWords: Int = 16): DataFrame = {
    require(chunkWords > overlapWords && overlapWords >= 0,
      "chunkWords must exceed overlapWords")
    val step = chunkWords - overlapWords
    val lastChunk = floor(
      greatest(size(col("__toks")) - overlapWords - 1, lit(0))
        .cast(DoubleType) / step).cast("int")
    df.select(col(idCol).as("doc_id"), graft.functions.OptimizerFence.fence(tokens(col(textCol))).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), lastChunk)).as("chunk_idx"))
      .select(
        col("doc_id"), col("chunk_idx"),
        array_join(slice(col("__toks"), col("chunk_idx") * step + 1, lit(chunkWords)),
          " ").as("chunk_text"),
        least(size(col("__toks")) - col("chunk_idx") * step, lit(chunkWords))
          .as("chunk_words"))
  }

  /** Per-line language segmentation — the multilingual-document triage a
    * corpus language filter needs (a page-level langid mislabels half of
    * a half-and-half page): split into lines, language-id each non-blank
    * line by the stopword-hit argmax (the [[langId]] heuristic), then
    * group CONTIGUOUS same-language lines into segments
    * (gaps-and-islands: a new segment starts where the line's language
    * differs from the previous line's). Output per segment:
    * (doc_id, seg_idx, lang, n_lines, first_line, last_line) with
    * seg_idx 0-based in line order.
    *
    * Scale shape: line langid is scan-side column work on the exploded
    * lines; run grouping is a lag + running-sum window pair PARTITIONED
    * BY doc_id (line-count bounded) sharing one exchange, and the
    * per-segment rollup pre-combines on (doc_id, seg_idx). */
  def langSegments(docs: DataFrame, textCol: String, idCol: String,
      langs: Seq[(String, Seq[String])]): DataFrame = {
    val lines = docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("idx", "__l")))
      .where(length(trim(col("__l"))) > 0)
      .withColumn("lang", langId(col("__l"), langs))
    val w = Window.partitionBy("doc_id").orderBy("idx")
    lines
      .withColumn("__prev", lag(col("lang"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("__prev") =!= col("lang"), 1)
          .otherwise(0))
      .withColumn("seg_idx", (sum(col("__new")).over(w) - 1).cast(LongType))
      .groupBy("doc_id", "seg_idx")
      .agg(min(col("lang")).as("lang"), // constant within a segment
        count(lit(1)).as("n_lines"),
        min(col("idx")).cast(LongType).as("first_line"),
        max(col("idx")).cast(LongType).as("last_line"))
  }

  /** Flesch readability report: sentences split on `[.!?]+` (non-blank
    * segments, floor 1), words = [[tokens]] of the lowered text, and a
    * SYLLABLE HEURISTIC both engines mirror exactly — vowel-group count
    * per word (`[aeiouy]+` matches), floor 1 per word. Scores are exact
    * integer micro-units (the floor(x·1e6 + 0.5) rule on each ratio
    * term) so Flesch Reading Ease and Flesch–Kincaid grade hash-match:
    * FRE = 206.835 − 1.015·(W/S) − 84.6·(Syl/W);
    * FKG = 0.39·(W/S) + 11.8·(Syl/W) − 15.59.
    * The heuristic under-counts silent-e words and over-counts some
    * diphthongs — fine for corpus-level FILTERING (the use case),
    * documented for anyone expecting dictionary syllables. Scan-side,
    * zero shuffle. */
  def readabilityReport(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val text = col(textCol)
    val sents = greatest(
      size(filter(split(text, "[.!?]+"), s => length(trim(s)) > 0)), lit(1))
    val toks = tokens(lower(text))
    val words = greatest(size(toks), lit(1))
    val sylls = aggregate(toks, lit(0L), (acc, w) =>
      acc + greatest(
        size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))), lit(1)))
    docs.select(col(idCol).as("doc_id"),
      sents.cast(LongType).as("n_sentences"),
      size(toks).cast(LongType).as("n_words"),
      sylls.as("n_syllables"),
      ((lit(206835000L) - floor(lit(1015000.0) * words / sents + 0.5)
        - floor(lit(84600000.0) * sylls / words + 0.5)) / 1000000.0)
        .as("fre"),
      ((floor(lit(390000.0) * words / sents + 0.5)
        + floor(lit(11800000.0) * sylls / words + 0.5) - lit(15590000L))
        / 1000000.0).as("fk_grade"))
  }

  /** Deterministic output-shard packing + manifest — the last mile of a
    * corpus build: docs fill shards GREEDILY in id order by token budget
    * (a doc lands in the shard where its FIRST token falls, so shards
    * overflow by at most one document — the standard trainer-shard
    * contract), and the manifest carries per-shard integrity facts
    * (n_docs, n_tokens, first/last doc, md5 over the ordered id list)
    * that a consumer can re-verify after transport.
    *
    * Scale shape (the q46/t15 shard-with-carry rule): the global
    * token-prefix sum NEVER runs as one unpartitioned window over the
    * corpus — docs bucket by id range, per-bucket token sums pre-combine
    * to a bucket-cardinality table whose offsets broadcast back, and the
    * in-bucket running sum windows partition by bucket (id-range
    * bounded). Manifest rollup pre-combines per shard; per-shard id
    * lists are budget-bounded by construction. */
  def packShards(docs: DataFrame, textCol: String, idCol: String,
      shardTokens: Long, idsPerBucket: Long = 4096,
      startOffset: Long = 0L): DataFrame = {
    require(shardTokens > 0 && idsPerBucket > 0 && startOffset >= 0)
    tokenSpans(docs, textCol, idCol, idsPerBucket, startOffset)
      .withColumn("shard_id", floor(col("__start") / shardTokens).cast(LongType))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        md5(array_join(transform(array_sort(collect_list(col("doc_id"))),
          _.cast("string")), ",")).as("ids_md5"))
  }

  /** (doc_id, n_tokens, __start) with __start the doc's first position in
    * the doc_id-ordered global token stream — the shared prefix-sum core
    * of [[packShards]]/[[chunkSequences]], decomposed shard-with-carry
    * (bucket offsets broadcast + in-bucket windows; never one
    * unpartitioned corpus window). */
  private def tokenSpans(docs: DataFrame, textCol: String, idCol: String,
      idsPerBucket: Long, startOffset: Long): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast(LongType).as("n_tokens"),
      floor(col(idCol) / idsPerBucket).cast(LongType).as("__b"))
    val offsets = base.groupBy("__b").agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__off", coalesce(
        sum(col("__bt")).over(Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__off")
    val wb = Window.partitionBy("__b").orderBy("doc_id")
    base.join(broadcast(offsets), Seq("__b"))
      .withColumn("__start", lit(startOffset) + col("__off") + coalesce(
        sum(col("n_tokens")).over(wb.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
  }

  /** Exact-cut sequence chunking — the concat-and-chunk pretraining
    * layout (GPT/Megatron style): the doc_id-ordered corpus token stream
    * is cut into fixed `seqLen`-token training sequences, and a doc whose
    * span crosses a cut contributes to BOTH sequences. Complements
    * [[packSequences]] (t15's offset-based approximate packing: a doc
    * joins the sequence its start falls in, none is split) and differs
    * from [[packShards]] (whole docs, variable fill): sequences here are
    * exactly `seqLen` tokens (final remainder aside) and docs SPLIT —
    * `n_continued` is the cross-boundary contamination count that packing
    * studies report (and attention-mask resets must handle). Per-sequence
    * manifest: (seq_id, n_tokens, n_docs, n_starts, n_continued) where
    * n_starts counts docs whose first token lands here and n_continued
    * docs cut by this sequence's right edge. Zero-token docs occupy no
    * stream positions and drop (they vanish at tokenization). Scale
    * shape: the [[tokenSpans]] carry decomposition plus a per-doc explode
    * bounded by n_tokens/seqLen + 1 rows — no corpus-cardinality window,
    * text never shuffles (spans are 3 longs). */
  def chunkSequences(docs: DataFrame, textCol: String, idCol: String,
      seqLen: Long, idsPerBucket: Long = 4096,
      startOffset: Long = 0L): DataFrame = {
    require(seqLen > 0 && idsPerBucket > 0 && startOffset >= 0)
    tokenSpans(docs, textCol, idCol, idsPerBucket, startOffset)
      .filter(col("n_tokens") > 0)
      .withColumn("__end", col("__start") + col("n_tokens"))
      .withColumn("seq_id", explode(sequence(
        floor(col("__start") / seqLen).cast(LongType),
        floor((col("__end") - 1) / seqLen).cast(LongType))))
      .groupBy("seq_id")
      .agg(
        sum(least(col("__end"), (col("seq_id") + 1) * seqLen) -
          greatest(col("__start"), col("seq_id") * seqLen)).as("n_tokens"),
        count(lit(1)).as("n_docs"),
        sum(when(col("__start") >= col("seq_id") * seqLen, 1L)
          .otherwise(0L)).as("n_starts"),
        sum(when(col("__end") > (col("seq_id") + 1) * seqLen, 1L)
          .otherwise(0L)).as("n_continued"))
  }

  /** STREAMING tier of [[packShards]] under the [[BatchStore]] contract —
    * shard ids stay GLOBAL across the stream: each batch packs from the
    * running token total of every committed prior batch (one 1-row
    * aggregate over the skinny manifest store), so a shard left partly
    * filled by batch N keeps filling in batch N+1 (the two batches each
    * emit a PARTIAL manifest row for that shard: counts and id ranges
    * merge by summing/min/max; ids_md5 stays per-partial — per-batch
    * integrity, the property a consumer re-verifies per delivery).
    * Retry-idempotent: the manifest partition writes per-batch with
    * overwrite AFTER the result materializes, and the prior read
    * excludes the in-flight batch, so a retried batch re-derives the
    * SAME offset and replaces its partial. `maxStoreParts` enables the
    * size-tiered auto-compaction (identity merge — manifest rows are
    * per-(batch, shard)). Returns the batch's partial manifest rows. */
  def shardStoreStep(batch: DataFrame, storeDir: String, textCol: String,
      idCol: String, shardTokens: Long, batchId: Long,
      idsPerBucket: Long = 4096, maxStoreParts: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val empty = packShards(batch.limit(0), textCol, idCol, shardTokens,
      idsPerBucket)
    val prior = BatchStore.readStore(spark, storeDir, "manifests", empty,
      batchId)
    val offset = prior.agg(coalesce(sum(col("n_tokens")), lit(0L)))
      .collect()(0).getLong(0) // 1-row aggregate: bounded driver state
    val out = packShards(batch, textCol, idCol, shardTokens, idsPerBucket,
      startOffset = offset).localCheckpoint()
    BatchStore.writeBatchPart(out, s"$storeDir/manifests",
      s"$storeDir/compactions/manifests", batchId)
    BatchStore.autoCompact(spark, s"$storeDir/manifests",
      s"$storeDir/compactions/manifests", maxStoreParts, batchId)(
      shardStoreCompact(spark, storeDir, _, _))
    out
  }

  /** Fold committed manifest partitions (identity merge — rows are
    * per-(batch, shard) partials; [[BatchStore]] marker protocol). */
  def shardStoreCompact(spark: SparkSession, storeDir: String,
      compactId: Long, upToBatchId: Long): Seq[Long] =
    BatchStore.compactIdentity(spark, storeDir, Seq("manifests"),
      compactId, upToBatchId)

  /** STREAMING tier of [[chunkSequences]] under the [[BatchStore]]
    * contract — sequence ids stay GLOBAL across the stream: each batch
    * chunks from the running token total of every committed prior batch
    * (one 1-row aggregate over the skinny manifest store), so a sequence
    * left partly filled by batch N keeps filling in batch N+1 (both
    * batches emit a PARTIAL manifest row for that seq; n_tokens/n_docs/
    * n_starts/n_continued all merge by SUM — n_continued counts cuts at
    * the seq's right edge, which only the batch owning those tokens can
    * see). Retry-idempotent exactly like [[shardStoreStep]]: the prior
    * read excludes the in-flight batch, the partition overwrites after
    * materialization, so a retried batch re-derives the SAME offset.
    * Returns the batch's partial manifest rows. */
  def chunkStoreStep(batch: DataFrame, storeDir: String, textCol: String,
      idCol: String, seqLen: Long, batchId: Long,
      idsPerBucket: Long = 4096, maxStoreParts: Int = 0): DataFrame = {
    val spark = batch.sparkSession
    val empty = chunkSequences(batch.limit(0), textCol, idCol, seqLen,
      idsPerBucket)
    val prior = BatchStore.readStore(spark, storeDir, "seq_manifests", empty,
      batchId)
    val offset = prior.agg(coalesce(sum(col("n_tokens")), lit(0L)))
      .collect()(0).getLong(0) // 1-row aggregate: bounded driver state
    val out = chunkSequences(batch, textCol, idCol, seqLen, idsPerBucket,
      startOffset = offset).localCheckpoint()
    BatchStore.writeBatchPart(out, s"$storeDir/seq_manifests",
      s"$storeDir/compactions/seq_manifests", batchId)
    BatchStore.autoCompact(spark, s"$storeDir/seq_manifests",
      s"$storeDir/compactions/seq_manifests", maxStoreParts, batchId)(
      chunkStoreCompact(spark, storeDir, _, _))
    out
  }

  /** Fold committed sequence-manifest partitions (identity merge —
    * rows are per-(batch, seq) partials). */
  def chunkStoreCompact(spark: SparkSession, storeDir: String,
      compactId: Long, upToBatchId: Long): Seq[Long] =
    BatchStore.compactIdentity(spark, storeDir, Seq("seq_manifests"),
      compactId, upToBatchId)

  /** Markdown code-fence extraction — the code-corpus miner: every
    * ```lang\n…``` block becomes a row (doc_id, fence_idx, lang,
    * n_lines, n_chars, code), with `lang` the info string ('' when
    * unspecified). Lazy body match stops at the FIRST closing fence; an
    * unterminated ``` (or one whose info string isn't a single token
    * before the newline) matches nothing — identical leftmost-first
    * semantics in java.util.regex and RE2, so the oracle mirrors
    * byte-for-byte. Scan-side: two regexp_extract_all passes zip
    * positionally and posexplode; nothing shuffles but the output. */
  def codeFences(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val pat = "(?s)```([A-Za-z0-9_+-]*)\\n(.*?)```"
    docs.select(col(idCol).as("doc_id"),
        posexplode(arrays_zip(
          regexp_extract_all(col(textCol), lit(pat), lit(1)),
          regexp_extract_all(col(textCol), lit(pat), lit(2))))
          .as(Seq("fence_idx", "__z")))
      .select(col("doc_id"), col("fence_idx").cast(LongType).as("fence_idx"),
        col("__z.0").as("lang"),
        size(split(col("__z.1"), "\n")).cast(LongType).as("n_lines"),
        length(col("__z.1")).cast(LongType).as("n_chars"),
        col("__z.1").as("code"))
  }

  /** Script-aware token counting — whitespace tokenization under-counts
    * no-space scripts (a 40-character Chinese sentence is ONE whitespace
    * token), which silently breaks every token-budget decision (shard
    * packing, source mixing, sequence packing) on multilingual corpora.
    * Model (documented, oracle-mirrored): CJK code points (Han,
    * Hiragana, Katakana, Hangul) count ONE token each; the non-CJK
    * remainder counts whitespace tokens after CJK chars are replaced by
    * spaces (so Latin glued to CJK still splits). Returns (doc_id,
    * ws_tokens, cjk_chars, effective_tokens); scan-side, zero shuffle. */
  def scriptAwareTokens(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    // Java spells Unicode scripts \p{IsHan}; RE2 spells them \p{Han} —
    // same classes, so the oracle mirror stays value-identical (the t82
    // scriptProfile precedent)
    val cjk = "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]"
    val text = col(textCol)
    val cjkChars = size(regexp_extract_all(text, lit(cjk), lit(0)))
      .cast(LongType)
    docs.select(col(idCol).as("doc_id"),
      tokenCount(text).cast(LongType).as("ws_tokens"),
      cjkChars.as("cjk_chars"),
      (tokenCount(regexp_replace(text, cjk, " ")).cast(LongType) + cjkChars)
        .as("effective_tokens"))
  }

  /** HTML table extraction — the table-corpus miner of a web pipeline
    * (tables feed QA/structured-training corpora and are MANGLED by
    * plain text extraction, which collapses cells into word soup):
    * every `<table>` becomes rows of (doc_id, table_idx, row_idx,
    * col_idx, is_header, cell) with cell text tag-stripped, entity-
    * decoded, and whitespace-collapsed. Header flags come from the tag
    * NAME (`<th>` vs `<td>`), captured by a second positionally-zipped
    * extract (the t97 fence-miner pattern — RE2 has one group per
    * extract_all). Documented leniency (regex, not a tree parser):
    * bodies are lazy-first-close, so a NESTED table truncates its outer
    * table at the inner `</table>`, and a `<td>` closed by `</th>`
    * still matches (`</t[dh]>` — RE2-safe, no backreference). Scan-side
    * explode chain; only (ids, cell) rows shuffle for the output sort. */
  def htmlTables(docs: DataFrame, htmlCol: String,
      idCol: String): DataFrame = {
    val tables = docs.select(col(idCol).as("doc_id"),
      posexplode(regexp_extract_all(col(htmlCol),
        lit("(?is)<table[^>]*>(.*?)</table>"), lit(1)))
        .as(Seq("table_idx", "__t")))
    val rows = tables.select(col("doc_id"), col("table_idx"),
      posexplode(regexp_extract_all(col("__t"),
        lit("(?is)<tr[^>]*>(.*?)</tr>"), lit(1))).as(Seq("row_idx", "__r")))
    val cellPat = "(?is)<t([dh])[^>]*>.*?</t[dh]>"
    val bodyPat = "(?is)<t[dh][^>]*>(.*?)</t[dh]>"
    rows.select(col("doc_id"), col("table_idx"), col("row_idx"),
        posexplode(zip_with(
          regexp_extract_all(col("__r"), lit(cellPat), lit(1)),
          regexp_extract_all(col("__r"), lit(bodyPat), lit(1)),
          (t, b) => struct(t.as("tag"), b.as("body"))))
          .as(Seq("col_idx", "__c")))
      .select(col("doc_id"),
        col("table_idx").cast(LongType).as("table_idx"),
        col("row_idx").cast(LongType).as("row_idx"),
        col("col_idx").cast(LongType).as("col_idx"),
        (lower(col("__c.tag")) === "h").as("is_header"),
        regexp_replace(trim(decodeEntities(
          regexp_replace(col("__c.body"), "<[^>]*>", ""))), "\\s+", " ")
          .as("cell"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020) — the
    * LM-quality tier of a web-corpus build: score every document with
    * the interpolated Kneser–Ney bigram LM ([[knSurprisal]], trained on
    * `refCorpus` — CCNet trains on Wikipedia), then bucket per LANGUAGE
    * into head/middle/tail perplexity TERTILES (CCNet's split; `keep` =
    * not tail, its default filter). Cutoffs are order statistics over
    * the per-language score HISTOGRAM (distinct micro-rounded scores) —
    * the t26 calibration pattern, never a corpus-cardinality window;
    * ties at a cutoff land in the lower bucket in both engines.
    * Documents under 2 tokens carry no bigram and are not scored
    * (inherited from [[knSurprisal]]). Returns (doc_id, lang,
    * n_bigrams, avg_surprisal, bucket, keep). */
  def perplexityBuckets(docs: DataFrame, textCol: String, idCol: String,
      langCol: String, refCorpus: Option[DataFrame] = None,
      refTextCol: String = "text"): DataFrame = {
    val scored = knSurprisal(docs, textCol, idCol, refCorpus, refTextCol)
    // the lang lookup is a second read of `docs`, but column pruning
    // reaches the scan: a parquet source reads only (id, lang) here —
    // no second pass over the text bytes
    val lg = scored.join(
      docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")),
      Seq("doc_id"))
    val hist = lg.groupBy("lang", "avg_surprisal").agg(count(lit(1)).as("n"))
    val cum = hist.withColumn("cum", sum(col("n")).over(
      Window.partitionBy("lang").orderBy("avg_surprisal")))
    val tot = hist.groupBy("lang").agg(sum(col("n")).as("total"))
    def cutAt(frac: Column, name: String) = cum.join(tot, Seq("lang"))
      .where(col("cum") >= ceil(frac))
      .groupBy("lang").agg(min(col("avg_surprisal")).as(name))
    val c1 = cutAt(col("total") / 3.0, "cut1")
    val c2 = cutAt(col("total") * 2.0 / 3.0, "cut2")
    lg.join(c1, Seq("lang")).join(c2, Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("avg_surprisal"),
        when(col("avg_surprisal") <= col("cut1"), "head")
          .when(col("avg_surprisal") <= col("cut2"), "middle")
          .otherwise("tail").as("bucket"),
        (col("avg_surprisal") <= col("cut2")).as("keep"))
  }

  /** StarCoder-style code quality gates over a code column — the filter
    * pass of a code-corpus build: per snippet, non-blank line count,
    * max/avg line length (minified/data blobs), comment-line ratio
    * (`#`/`//`/`--` after ltrim), alphanumeric character fraction
    * (binary-ish blobs), and an auto-generated marker flag; `keep` =
    * max ≤ 1000 ∧ avg ≤ 100 ∧ alnum ≥ 0.25 ∧ ¬autogen (the published
    * thresholds). Ratios floor to integer micro-units (the determinism
    * rule). Pure scan-side column work appended to the input frame. */
  def codeQuality(df: DataFrame, codeCol: String): DataFrame = {
    val nonempty = filter(split(col(codeCol), "\n"),
      l => length(trim(l)) > 0)
    val lens = transform(nonempty, l => length(l).cast(LongType))
    val nl = greatest(size(nonempty), lit(1))
    val totalLen = aggregate(lens, lit(0L), _ + _)
    val comments = filter(nonempty, l => {
      val t = ltrim(l)
      t.startsWith("#") || t.startsWith("//") || t.startsWith("--")
    })
    val nAl = length(regexp_replace(col(codeCol), "[^A-Za-z0-9]", ""))
    val nCh = greatest(length(col(codeCol)), lit(1))
    df.withColumn("n_code_lines", size(nonempty).cast(LongType))
      .withColumn("max_line_len", coalesce(array_max(lens), lit(0L)))
      .withColumn("avg_line_len",
        floor(totalLen.cast(DoubleType) * 1000000.0 / nl + 0.5)
          .cast(LongType) / 1000000.0)
      .withColumn("comment_ratio",
        floor(size(comments).cast(DoubleType) * 1000000.0 / nl + 0.5)
          .cast(LongType) / 1000000.0)
      .withColumn("alnum_frac",
        floor(nAl.cast(DoubleType) * 1000000.0 / nCh + 0.5)
          .cast(LongType) / 1000000.0)
      .withColumn("autogen",
        lower(col(codeCol)).contains("auto-generated") ||
          lower(col(codeCol)).contains("do not edit"))
      .withColumn("keep",
        col("max_line_len") <= 1000 && col("avg_line_len") <= 100.0 &&
          col("alnum_frac") >= 0.25 && !col("autogen"))
  }
}
