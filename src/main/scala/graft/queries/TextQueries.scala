package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.core.LogSchema
import graft.core.{NormCondition, NormalizedField}
import graft.core.FieldType._
import graft.classify.Classifier
import graft.classify.{ArtifactExtractor, Normalizer, Sanitizer}
import graft.rules._
import graft.alerts.{AlertMerger, MergeInputAlert, Publishers}
import graft.sources.Sources
import graft.history.{HistoricalSink, RulePromotion, ScheduledQueries}
import graft.pipeline.{Dedup, Eval, Multimodal, Preference, Similarity, Sketches, TextAnalysis, WebOps}

/** Text analysis and tokenizers: token counts, quality, langid,
  * fingerprints, n-gram stats, BPE/wordpiece/unigram-LM training,
  * sampling, decontamination, PII. */
private[graft] trait TextQueries extends RegistryBase {


  // Span-corruption transform (Raffel et al. 2020, T5): two id-derived
  // word spans are replaced by sentinels in the input and emitted as the
  // target sequence — the denoising-objective prep, RNG-free like t40 so
  // epochs reproduce across runs/engines. Token-array slicing is pure
  // scan-side arithmetic; spans are disjoint by construction (first span
  // in the first half, second in the second half).
  register(
    "t41_span_corruption",
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS toks
      |  FROM documents),
      |cut AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |         1 + (doc_id * 13) % greatest(len(toks) // 2 - 2, 1) AS s1,
      |         len(toks) // 2 + 1 +
      |           (doc_id * 29 + 7) % greatest((len(toks) + 1) // 2 - 2, 1) AS s2
      |  FROM w WHERE len(toks) >= 8)
      |SELECT doc_id,
      |       coalesce(array_to_string(toks[1:s1-1], ' '), '') || ' <X> ' ||
      |       coalesce(array_to_string(toks[s1+2:s2-1], ' '), '') || ' <Y> ' ||
      |       coalesce(array_to_string(toks[s2+2:n], ' '), '') AS corrupted,
      |       '<X> ' || array_to_string(toks[s1:s1+1], ' ') ||
      |       ' <Y> ' || array_to_string(toks[s2:s2+1], ' ') || ' <Z>'
      |         AS target
      |FROM cut ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val toks = graft.pipeline.TextAnalysis.tokens(lower(col("text")))
    t(s, dir, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= 8)
      .withColumn("n", size(col("toks")))
      .withColumn("s1", lit(1) +
        (col("doc_id") * 13) % greatest(expr("n div 2") - 2, lit(1)))
      .withColumn("s2", expr("n div 2") + 1 +
        (col("doc_id") * 29 + 7) % greatest(expr("(n + 1) div 2") - 2, lit(1)))
      .select(col("doc_id"),
        concat(
          array_join(expr("slice(toks, 1, cast(s1 - 1 as int))"), " "),
          lit(" <X> "),
          array_join(expr("slice(toks, cast(s1 + 2 as int), cast(s2 - s1 - 2 as int))"), " "),
          lit(" <Y> "),
          array_join(expr("slice(toks, cast(s2 + 2 as int), cast(n - s2 - 1 as int))"), " "))
          .as("corrupted"),
        concat(
          lit("<X> "), array_join(expr("slice(toks, cast(s1 as int), 2)"), " "),
          lit(" <Y> "), array_join(expr("slice(toks, cast(s2 as int), 2)"), " "),
          lit(" <Z>")).as("target"))
      .orderBy("doc_id")
  }


  // Fill-in-middle transform (Bavarian et al. 2022): each document is
  // deterministically cut into (prefix, middle, suffix) at two
  // id-derived character offsets and re-emitted in PSM order with
  // sentinels — the pretraining transform that teaches infilling. Pure
  // integer cut-point arithmetic + substring, scan-side, zero shuffle;
  // the id-derived offsets make the transform reproducible across runs
  // and engines (no RNG), which is what makes the epoch deterministic.
  register(
    "t40_fim_transform",
    """SELECT doc_id,
      |       '<PRE>' || substr(text, 1, a) ||
      |       '<SUF>' || substr(text, b + 1) ||
      |       '<MID>' || substr(text, a + 1, b - a) AS fim
      |FROM (
      |  SELECT doc_id, text,
      |         least(lo, hi) AS a, greatest(lo, hi) AS b
      |  FROM (
      |    SELECT doc_id, text,
      |           1 + (doc_id * 37) % greatest(len(text) - 2, 1) AS lo,
      |           1 + (doc_id * 61 + 13) % greatest(len(text) - 2, 1) AS hi
      |    FROM documents WHERE len(text) >= 3))
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .where(length(col("text")) >= 3)
      .withColumn("__m", greatest(length(col("text")) - 2, lit(1)))
      .withColumn("lo", lit(1) + (col("doc_id") * 37) % col("__m"))
      .withColumn("hi", lit(1) + (col("doc_id") * 61 + 13) % col("__m"))
      .withColumn("a", least(col("lo"), col("hi")))
      .withColumn("b", greatest(col("lo"), col("hi")))
      .select(col("doc_id"), concat(
        lit("<PRE>"), expr("substring(text, 1, cast(a as int))"),
        lit("<SUF>"), expr("substring(text, cast(b as int) + 1)"),
        lit("<MID>"), expr("substring(text, cast(a as int) + 1, cast(b - a as int))"))
        .as("fim"))
      .orderBy("doc_id")
  }


  // Classifier-accuracy audit against labeled data: the t3 language-ID
  // heuristic scored per DECLARED label. Measured: en 1.0, everything
  // else 0.0 — the synthetic non-English docs don't contain the es/de
  // stopword lists, so the tiny heuristic defaults to 'en'. That HONEST
  // confusion readout is the point: this is the eval-loop shape every
  // curation classifier needs (predictions join ground truth, one
  // pre-combined agg, exact integer rates) and it correctly reports that
  // this classifier must not gate non-English sources.
  register(
    "t42_langid_accuracy",
    """WITH toks AS (
      |  SELECT doc_id, lang, list_distinct(list_filter(
      |    string_split_regex(lower(text), '\s+'), x -> x != '')) AS t
      |  FROM documents),
      |scores AS (
      |  SELECT doc_id, lang,
      |    len(list_intersect(t, ['the','a','and','scan','join'])) AS s_en,
      |    len(list_intersect(t, ['el','la','que','datos'])) AS s_es,
      |    len(list_intersect(t, ['der','die','und','das'])) AS s_de
      |  FROM toks),
      |pred AS (
      |  SELECT doc_id, lang, CASE
      |    WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
      |    WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS langid
      |  FROM scores)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN langid = lang THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_match,
      |       round(CAST(sum(CASE WHEN langid = lang THEN 1 ELSE 0 END)
      |             AS DOUBLE) / count(*), 6) AS accuracy
      |FROM pred GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("lang"),
        (TextAnalysis.langId(col("text"), Seq(
          "en" -> Seq("the", "a", "and", "scan", "join"),
          "es" -> Seq("el", "la", "que", "datos"),
          "de" -> Seq("der", "die", "und", "das"))) === col("lang"))
          .cast("long").as("__m"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("__m")).as("n_match"),
        round(sum(col("__m")).cast("double") / count(lit(1)), 6).as("accuracy"))
      .orderBy("lang")
  }


  // Okapi BM25 top-k retrieval: the corpus-audit probe search ("which
  // documents answer this query"). Postings carry (doc_id, term, tf, dl)
  // from one scan-side explode+pre-combined agg; probe terms, their df, and
  // the corpus stats all broadcast, so scoring touches only matched
  // postings. Double arithmetic written identically on both sides, scores
  // rounded to 6 BEFORE ranking, ties by doc_id — fully hash-matched.
  register(
    "t13_bm25_topk",
    """WITH q AS (SELECT * FROM (VALUES ('q1', 'table scan'),
      |    ('q2', 'merge join batch'), ('q3', 'vector data stream'))
      |    AS q(q_id, q_text)),
      |post AS (
      |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (
      |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM (
      |      SELECT doc_id,
      |             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
      |               AS toks
      |      FROM documents))
      |  GROUP BY doc_id, dl, term),
      |qt AS (
      |  SELECT q_id, unnest(list_distinct(
      |    list_filter(string_split_regex(lower(q_text), '\s+'), x -> x != ''))) AS term
      |  FROM q),
      |stats AS (
      |  SELECT count(*)::DOUBLE AS n,
      |         avg(len(list_filter(string_split_regex(lower(text), '\s+'),
      |             x -> x != ''))::DOUBLE) AS avgdl
      |  FROM documents),
      |dft AS (
      |  SELECT term, count(*)::DOUBLE AS df
      |  FROM post JOIN (SELECT DISTINCT term FROM qt) v USING (term)
      |  GROUP BY term),
      |scored AS (
      |  SELECT qt.q_id, post.doc_id,
      |         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
      |           tf * (1.2 + 1.0) /
      |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
      |  FROM post JOIN qt USING (term) JOIN dft USING (term) CROSS JOIN stats
      |  GROUP BY qt.q_id, post.doc_id)
      |SELECT q_id, doc_id, score, rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY score DESC, doc_id ASC) AS rank FROM scored)
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val session = s
    import session.implicits._
    val probes = Seq(("q1", "table scan"), ("q2", "merge join batch"),
      ("q3", "vector data stream")).toDF("q_id", "q_text")
    graft.pipeline.Retrieval.bm25TopK(t(s, dir, "documents"), probes, k = 5)
      .orderBy("q_id", "rank")
  }


  // Lexical diversity per source: distinct-trigram ratio (the distinct-n
  // diversity audit — low ratios flag templated/boilerplate sources that
  // would teach a model to repeat itself). Exact integer counts from one
  // explode + pre-combined aggs; ratio at 6 dp.
  register(
    "t39_ngram_diversity",
    """WITH g AS (
      |  SELECT source, t.gram FROM (
      |    SELECT source, list_filter(string_split_regex(lower(text), '\s+'),
      |                               x -> x != '') AS toks
      |    FROM documents) d,
      |  LATERAL (SELECT unnest(list_transform(
      |    generate_series(1, len(d.toks) - 2),
      |    i -> d.toks[i] || ' ' || d.toks[i+1] || ' ' || d.toks[i+2])) AS gram) t)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS total_trigrams,
      |       CAST(count(DISTINCT gram) AS BIGINT) AS distinct_trigrams,
      |       round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6)
      |         AS diversity
      |FROM g GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val toks = TextAnalysis.tokens(lower(col("text")))
    t(s, dir, "documents")
      .select(col("source"), toks.as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("source"), explode(transform(
        sequence(lit(0), size(col("toks")) - 3),
        i => concat_ws(" ", element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))))
        .as("gram"))
      .groupBy("source")
      .agg(count(lit(1)).as("total_trigrams"),
        count_distinct(col("gram")).as("distinct_trigrams"),
        round(count_distinct(col("gram")).cast("double") / count(lit(1)), 6)
          .as("diversity"))
      .orderBy("source")
  }


  // WordPiece-style tokenization fertility (pieces per word): greedy
  // longest-match segmentation against a fixed piece vocabulary, run as
  // a codegen'd aggregate fold over character positions on the Spark
  // side and as 10 unrolled greedy CTE steps in the oracle — the
  // tokenizer-choice metric for a pretraining corpus. Segmentation is
  // vocabulary-cardinality work (distinct words), joined back to
  // pre-combined per-doc word counts; all-integer until the final 6 dp
  // division.
  register(
    "t38_wordpiece_fertility",
    s"""WITH wc AS (
      |  SELECT doc_id, tok, count(*) AS c FROM (
      |    SELECT doc_id, unnest(list_filter(
      |      string_split_regex(lower(text), '\\s+'), x -> x != '')) AS tok
      |    FROM documents) GROUP BY doc_id, tok),
      |dw AS (SELECT DISTINCT tok FROM wc),
      |v(piece) AS (SELECT * FROM (VALUES
      |  ${WpVocab.map(p => s"('$p')").mkString(", ")}) t(piece)),
      |s0 AS (SELECT tok, 1 AS pos, 0 AS cnt FROM dw),
      |${(1 to 10).map(wpStepSql).mkString(",\n")}
      |SELECT wc.doc_id,
      |       CAST(sum(wc.c) AS BIGINT) AS n_words,
      |       CAST(sum(wc.c * s10.cnt) AS BIGINT) AS n_pieces,
      |       round(CAST(sum(wc.c * s10.cnt) AS DOUBLE) / sum(wc.c), 6)
      |         AS fertility
      |FROM wc JOIN s10 USING (tok)
      |GROUP BY wc.doc_id ORDER BY wc.doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.wordpieceFertility(t(s, dir, "documents"), "text", "doc_id",
        WpVocab)
      .orderBy("doc_id")
  }


  // Sketch-guided EXACT top-k — the two-pass pattern that makes "exact
  // top 10 tokens" affordable at corpus scale: pass 1 summarizes each
  // partition with a Misra-Gries sketch (no vocabulary shuffle), pass 2
  // recounts ONLY the <= 64 candidates (broadcast semi-join at the scan)
  // and ranks exactly. The MG theorem guarantees the true top-10 survive
  // pass 1 whenever the 10th frequency exceeds n/65 (it does here: 30+
  // tokens clear that bar, pinned by t31), so the result equals the
  // full exact top-10 the oracle computes.
  register(
    "t37_exact_topk_twopass",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                x -> x != '')) AS tok
      |  FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
      |SELECT tok, CAST(cnt AS BIGINT) AS cnt, rank FROM (
      |  SELECT *, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rank
      |  FROM c)
      |WHERE rank <= 10 ORDER BY rank""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
    val cand = toks
      .agg(graft.functions.MisraGriesAgg.misra_gries(col("tok"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("tok"))
    val exact = toks.join(broadcast(cand), "tok")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    exact
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok").asc)))
      .where(col("rank") <= 10)
      .orderBy("rank")
  }


  // k-anonymity audit (Sweeney 2002): equivalence classes over the
  // quasi-identifier tuple (event_type, epoch-day, value decile); classes
  // smaller than k=5 are re-identifiable and flagged for suppression —
  // the structured-data counterpart of PII redaction before a corpus
  // ships. One pre-combined agg keyed by the QI tuple.
  register(
    "t36_k_anonymity",
    """SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |       CAST(floor(value / 10.0) AS BIGINT) AS value_bucket,
      |       CAST(count(*) AS BIGINT) AS n,
      |       count(*) < 5 AS suppress
      |FROM events GROUP BY 1, 2, 3
      |ORDER BY event_type, day, value_bucket""".stripMargin) { (s, dir) =>
    val qi = t(s, dir, "events").select(
      col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      floor(col("value") / 10.0).cast("long").as("value_bucket"))
    graft.pipeline.TextAnalysis.kAnonymityClasses(qi,
        Seq("event_type", "day", "value_bucket"), k = 5)
      .orderBy("event_type", "day", "value_bucket")
  }


  // Reciprocal-rank fusion of lexical BM25 and dense cosine rankings —
  // the hybrid-retrieval merge (Cormack et al. 2009): score =
  // Σ 1/(60+rank), missing entries contribute 0, no cross-system score
  // calibration. Probes q1-q3 pair their BM25 text with embedding
  // vectors 1-3 as the dense queries (synthetic 1:1 id spaces). Two-term
  // IEEE addition is exactly commutative, so the fused doubles are
  // engine-identical; ranks tie-break on doc_id.
  register(
    "t35_rrf_fusion",
    """WITH q AS (SELECT * FROM (VALUES ('q1', 'table scan'),
      |    ('q2', 'merge join batch'), ('q3', 'vector data stream'))
      |    AS q(q_id, q_text)),
      |post AS (
      |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (
      |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM (
      |      SELECT doc_id,
      |             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
      |               AS toks
      |      FROM documents))
      |  GROUP BY doc_id, dl, term),
      |qt AS (
      |  SELECT q_id, unnest(list_distinct(
      |    list_filter(string_split_regex(lower(q_text), '\s+'), x -> x != ''))) AS term
      |  FROM q),
      |stats AS (
      |  SELECT count(*)::DOUBLE AS n,
      |         avg(len(list_filter(string_split_regex(lower(text), '\s+'),
      |             x -> x != ''))::DOUBLE) AS avgdl
      |  FROM documents),
      |dft AS (
      |  SELECT term, count(*)::DOUBLE AS df
      |  FROM post JOIN (SELECT DISTINCT term FROM qt) v USING (term)
      |  GROUP BY term),
      |scored AS (
      |  SELECT qt.q_id, post.doc_id,
      |         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
      |           tf * (1.2 + 1.0) /
      |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
      |  FROM post JOIN qt USING (term) JOIN dft USING (term) CROSS JOIN stats
      |  GROUP BY qt.q_id, post.doc_id),
      |lex10 AS (
      |  SELECT q_id, doc_id, rank FROM (
      |    SELECT *, row_number() OVER (PARTITION BY q_id
      |      ORDER BY score DESC, doc_id ASC) AS rank FROM scored)
      |  WHERE rank <= 10),
      |dq AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (1, 2, 3)),
      |dense10 AS (
      |  SELECT q_id, doc_id, rank FROM (
      |    SELECT 'q' || dq.vec_id AS q_id, c.vec_id AS doc_id,
      |           row_number() OVER (PARTITION BY dq.vec_id ORDER BY
      |             round(list_cosine_similarity(c.embedding::DOUBLE[],
      |               dq.embedding::DOUBLE[]), 6) DESC, c.vec_id ASC) AS rank
      |    FROM embeddings c CROSS JOIN dq WHERE c.vec_id != dq.vec_id)
      |  WHERE rank <= 10),
      |fused AS (
      |  SELECT coalesce(l.q_id, d.q_id) AS q_id,
      |         coalesce(l.doc_id, d.doc_id) AS doc_id,
      |         round(coalesce(1.0 / (60 + l.rank), 0) +
      |               coalesce(1.0 / (60 + d.rank), 0), 6) AS rrf_score
      |  FROM lex10 l FULL OUTER JOIN dense10 d
      |    ON l.q_id = d.q_id AND l.doc_id = d.doc_id)
      |SELECT q_id, doc_id, rrf_score, rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY rrf_score DESC, doc_id ASC) AS rank FROM fused)
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val session = s
    import session.implicits._
    val probes = Seq(("q1", "table scan"), ("q2", "merge join batch"),
      ("q3", "vector data stream")).toDF("q_id", "q_text")
    val lex = graft.pipeline.Retrieval
      .bm25TopK(t(s, dir, "documents"), probes, k = 10)
      .select(col("q_id"), col("doc_id"), col("rank"))
    val e = t(s, dir, "embeddings")
    val dq = e.where(col("vec_id").isin(1, 2, 3))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val dense = Similarity.bruteForceTopK(e, dq, k = 10)
      .select(concat(lit("q"), col("q_id")).as("q_id"),
        col("neighbor_id").as("doc_id"), col("rank"))
    graft.pipeline.Retrieval.rrfFuse(Seq(lex, dense), k = 5)
      .orderBy("q_id", "rank")
  }


  // BM25 against a staged postings store — the build-once/probe-many
  // serving loop (the retrieval analogue of d2b's signature store): corpus
  // stats are derived from the store's distinct (doc, dl) pairs, raw text
  // never rescanned. Hash-matched with the stats written store-side in the
  // oracle too, so the serving path's equivalence is proven, not assumed.
  register(
    "t13b_bm25_store",
    """WITH q AS (SELECT * FROM (VALUES ('q1', 'table scan'),
      |    ('q2', 'merge join batch'), ('q3', 'vector data stream'))
      |    AS q(q_id, q_text)),
      |post AS (
      |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (
      |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM (
      |      SELECT doc_id,
      |             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
      |               AS toks
      |      FROM documents))
      |  GROUP BY doc_id, dl, term),
      |qt AS (
      |  SELECT q_id, unnest(list_distinct(
      |    list_filter(string_split_regex(lower(q_text), '\s+'), x -> x != ''))) AS term
      |  FROM q),
      |stats AS (
      |  SELECT count(*)::DOUBLE AS n, avg(dl::DOUBLE) AS avgdl
      |  FROM (SELECT DISTINCT doc_id, dl FROM post)),
      |dft AS (
      |  SELECT term, count(*)::DOUBLE AS df
      |  FROM post JOIN (SELECT DISTINCT term FROM qt) v USING (term)
      |  GROUP BY term),
      |scored AS (
      |  SELECT qt.q_id, post.doc_id,
      |         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
      |           tf * (1.2 + 1.0) /
      |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
      |  FROM post JOIN qt USING (term) JOIN dft USING (term) CROSS JOIN stats
      |  GROUP BY qt.q_id, post.doc_id)
      |SELECT q_id, doc_id, score, rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY score DESC, doc_id ASC) AS rank FROM scored)
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val session = s
    import session.implicits._
    val probes = Seq(("q1", "table scan"), ("q2", "merge join batch"),
      ("q3", "vector data stream")).toDF("q_id", "q_text")
    val store = graft.pipeline.Retrieval.postings(t(s, dir, "documents"))
    graft.pipeline.Retrieval.bm25TopKAgainstStore(store, probes, k = 5)
      .orderBy("q_id", "rank")
  }


  // BM25 hard-negative mining (the DPR recipe): per (query, positive) pair,
  // the k best-scoring docs that are NOT the positive. Positives here are
  // the BM25 top-1 per probe — deterministic on both engines — so the
  // negatives are exactly ranks 2..k+1 renumbered, and the whole
  // candidates→exclude→re-rank path is hash-proven.
  register(
    "t13c_bm25_hard_negatives",
    """WITH q AS (SELECT * FROM (VALUES ('q1', 'table scan'),
      |    ('q2', 'merge join batch'), ('q3', 'vector data stream'))
      |    AS q(q_id, q_text)),
      |post AS (
      |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (
      |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM (
      |      SELECT doc_id,
      |             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
      |               AS toks
      |      FROM documents))
      |  GROUP BY doc_id, dl, term),
      |qt AS (
      |  SELECT q_id, unnest(list_distinct(
      |    list_filter(string_split_regex(lower(q_text), '\s+'), x -> x != ''))) AS term
      |  FROM q),
      |stats AS (
      |  SELECT count(*)::DOUBLE AS n,
      |         avg(len(list_filter(string_split_regex(lower(text), '\s+'),
      |             x -> x != ''))::DOUBLE) AS avgdl
      |  FROM documents),
      |dft AS (
      |  SELECT term, count(*)::DOUBLE AS df
      |  FROM post JOIN (SELECT DISTINCT term FROM qt) v USING (term)
      |  GROUP BY term),
      |scored AS (
      |  SELECT qt.q_id, post.doc_id,
      |         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
      |           tf * (1.2 + 1.0) /
      |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
      |  FROM post JOIN qt USING (term) JOIN dft USING (term) CROSS JOIN stats
      |  GROUP BY qt.q_id, post.doc_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY score DESC, doc_id ASC) AS rank FROM scored),
      |pos AS (SELECT q_id, doc_id AS pos_id FROM ranked WHERE rank = 1)
      |SELECT r.q_id, pos_id, doc_id, score, rank - 1 AS neg_rank
      |FROM ranked r JOIN pos USING (q_id)
      |WHERE rank BETWEEN 2 AND 6
      |ORDER BY q_id, neg_rank""".stripMargin) { (s, dir) =>
    val session = s
    import session.implicits._
    val probes = Seq(("q1", "table scan"), ("q2", "merge join batch"),
      ("q3", "vector data stream")).toDF("q_id", "q_text")
    val docs = t(s, dir, "documents")
    val top1 = graft.pipeline.Retrieval.bm25TopK(docs, probes, k = 1)
      .select(col("q_id"), col("doc_id").as("pos_id"))
    val posPairs = probes.join(top1, Seq("q_id"))
    graft.pipeline.Retrieval.hardNegatives(docs, posPairs, k = 5)
      .orderBy("q_id", "neg_rank")
  }


  // TF-IDF salient terms per document ("what is this document about") —
  // full-vocabulary document frequencies from one skinny pre-combined agg,
  // per-doc top-3 window over (doc_id, term, score) triples.
  register(
    "t14_tfidf_top_terms",
    """WITH post AS (
      |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (
      |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM (
      |      SELECT doc_id,
      |             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
      |               AS toks
      |      FROM documents))
      |  GROUP BY doc_id, dl, term),
      |stats AS (SELECT count(*)::DOUBLE AS n FROM documents),
      |dft AS (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY term),
      |scored AS (
      |  SELECT doc_id, term, round(tf / dl * ln(n / df), 6) AS tfidf
      |  FROM post JOIN dft USING (term) CROSS JOIN stats)
      |SELECT doc_id, term, tfidf, rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY tfidf DESC, term ASC) AS rank FROM scored)
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, dir) =>
    graft.pipeline.Retrieval.tfidfTopTerms(t(s, dir, "documents"), k = 3)
      .orderBy("doc_id", "rank")
  }


  // Offset-based sequence packing (pretraining batch prep): documents of
  // each source laid end-to-end in id order; a doc joins the sequence its
  // start offset falls in. Pure integer arithmetic over one running-sum
  // window per source — deterministic, hash-matched.
  register(
    "t15_sequence_pack",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
      |           ::BIGINT AS n_tokens
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, source, n_tokens,
      |         coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      |  FROM t)
      |SELECT doc_id, source, n_tokens,
      |       CAST(start // 256 AS BIGINT) AS seq_idx,
      |       CAST(start % 256 AS BIGINT) AS seq_offset
      |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.packSequences(t(s, dir, "documents"), seqTokens = 256)
      .orderBy("doc_id")
  }


  // Per-source corpus mix report — the source-composition audit a corpus
  // curator runs before weighting: doc/token mass and mean quality per
  // source. One pre-combined agg; every input column is an already-oracled
  // operator (t1/t2).
  register(
    "t16_source_mix",
    """SELECT source,
      |       count(*) AS n_docs,
      |       CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
      |         x -> x != ''))) AS BIGINT) AS sum_tokens,
      |       round(avg(round(greatest(0.0,
      |         least(length(text) / 500.0, 1.0) * 0.4 +
      |         least((len(list_filter(string_split_regex(lower(text), '\s+'),
      |                 x -> x IN ('the','a','of','and','to','in'))) ::DOUBLE /
      |                greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
      |                 x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |         (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |                      greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6)), 6)
      |         AS avg_quality
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("sum_tokens"),
        round(avg(TextAnalysis.qualityScore(col("text"),
          Seq("the", "a", "of", "and", "to", "in"))), 6).as("avg_quality"))
      .orderBy("source")
  }


  // Gopher-style rule filter (published surface-statistic thresholds):
  // per-document stats, one boolean per rule, composite keep. All ratios
  // are divisions of exact integer counts — hash-matched across engines.
  register(
    "t17_gopher_rules",
    """WITH toks AS (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(text, '\s+'), x -> x != '') AS tk,
      |         list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS ls
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |         len(tk)::BIGINT AS n_words,
      |         round(CASE WHEN len(tk) > 0
      |           THEN list_sum(list_transform(tk, x -> length(x)))::DOUBLE / len(tk)
      |           ELSE 0.0 END, 6) AS mean_word_len,
      |         round((len(regexp_extract_all(text, '#')) +
      |                len(regexp_extract_all(text, '\.\.\.')))::DOUBLE /
      |               greatest(len(tk), 1), 6) AS symbol_ratio,
      |         round(CASE WHEN len(ls) > 0
      |           THEN len(list_filter(ls, l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•')))::DOUBLE / len(ls)
      |           ELSE 0.0 END, 6) AS bullet_ratio,
      |         round(CASE WHEN len(ls) > 0
      |           THEN len(list_filter(ls, l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))::DOUBLE / len(ls)
      |           ELSE 0.0 END, 6) AS ellipsis_ratio,
      |         round(CASE WHEN len(tk) > 0
      |           THEN len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(tk)
      |           ELSE 0.0 END, 6) AS alpha_frac,
      |         len(list_intersect(
      |           list_distinct(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')),
      |           ['the','be','to','of','and','that','have','with']))::BIGINT AS stop_hits
      |  FROM toks)
      |SELECT *,
      |       n_words BETWEEN 50 AND 100000 AS ok_words,
      |       mean_word_len BETWEEN 3.0 AND 10.0 AS ok_word_len,
      |       symbol_ratio < 0.1 AS ok_symbols,
      |       bullet_ratio < 0.9 AS ok_bullets,
      |       ellipsis_ratio < 0.3 AS ok_ellipsis,
      |       alpha_frac >= 0.8 AS ok_alpha,
      |       stop_hits >= 2 AS ok_stops,
      |       (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
      |         AND symbol_ratio < 0.1 AND bullet_ratio < 0.9 AND ellipsis_ratio < 0.3
      |         AND alpha_frac >= 0.8 AND stop_hits >= 2 AS keep
      |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.gopherRuleReport(t(s, dir, "documents")).orderBy("doc_id")
  }


  // Deterministic global training-order shuffle: sort-by-md5(seed:id),
  // shard by the first hex digit, in-shard rank = epoch position. Pure
  // hash arithmetic — reproducible across engines and partition layouts.
  register(
    "t18_training_shuffle",
    """WITH h AS (
      |  SELECT doc_id, md5('ep1:' || CAST(doc_id AS VARCHAR)) AS hh FROM documents)
      |SELECT doc_id,
      |       ('0x' || substr(hh, 1, 1))::BIGINT AS shard,
      |       CAST(row_number() OVER (PARTITION BY substr(hh, 1, 1)
      |         ORDER BY hh, doc_id) AS BIGINT) AS pos
      |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.trainingShuffle(t(s, dir, "documents"), seed = "ep1")
      .orderBy("doc_id")
  }


  // Corpus mixing toward target source weights: per-source keep rates
  // derived from counts (K = min n_s/w_s; rate_s = w_s*K/n_s), applied by
  // the deterministic md5 threshold. Four sources weighted 4/2/1/1, the
  // rest dropped — the binding source (largest n/w deficit) keeps all.
  register(
    "t19_target_mix",
    """WITH w AS (SELECT * FROM (VALUES ('src0', 4.0), ('src1', 2.0),
      |                                 ('src2', 1.0), ('src3', 1.0)) AS w(source, wt)),
      |c AS (SELECT source, count(*)::DOUBLE AS n FROM documents GROUP BY source),
      |j AS (SELECT c.source, n, wt, n / wt AS k FROM c JOIN w USING (source)),
      |r AS (SELECT source, least(1.0, wt * (SELECT min(k) FROM j) / n) AS rate FROM j)
      |SELECT d.doc_id, d.source, round(r.rate, 6) AS rate
      |FROM documents d JOIN r USING (source)
      |WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
      |      CASE WHEN r.rate >= 1.0 THEN 'zzzzzzzz'
      |           ELSE lower(lpad(hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT)), 8, '0')) END
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.targetMixSample(t(s, dir, "documents"),
      Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0, "src3" -> 1.0))
      .orderBy("doc_id")
  }


  // Corpus-level boilerplate: fraction of a doc's distinct trigrams whose
  // corpus document-frequency exceeds 2 (the cross-document complement of
  // t9's intra-doc repetition signal).
  register(
    "t20_boilerplate_ngrams",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 3
      |    THEN list_distinct(list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks),
      |g AS (SELECT doc_id, unnest(s) AS gram FROM sh),
      |df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
      |per AS (
      |  SELECT g.doc_id, count(*) AS n_grams,
      |         sum(CASE WHEN df.df > 2 THEN 1 ELSE 0 END) AS n_common
      |  FROM g JOIN df USING (gram) GROUP BY g.doc_id)
      |SELECT doc_id, n_grams::BIGINT AS n_grams, n_common::BIGINT AS n_common,
      |       round(n_common::DOUBLE / n_grams, 6) AS common_frac,
      |       round(n_common::DOUBLE / n_grams, 6) > 0.5 AS boilerplate
      |FROM per ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.boilerplateNgrams(t(s, dir, "documents"), "text", "doc_id",
      n = 3, dfCutoff = 2, frac = 0.5)
      .orderBy("doc_id")
  }


  // BPE first-merge candidates: corpus-weighted adjacent-char-pair counts,
  // exploded from the VOCABULARY (one corpus-cardinality word-count agg),
  // top-50 with (count desc, pair asc) tie-break.
  register(
    "t21_bpe_pairs",
    """WITH words AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS word
      |  FROM documents),
      |wc AS (SELECT word, count(*) AS wc FROM words GROUP BY word),
      |pairs AS (
      |  SELECT wc, unnest(list_transform(range(1, len(word)),
      |           i -> substr(word, CAST(i AS INT), 2))) AS pair
      |  FROM wc WHERE len(word) >= 2),
      |pc AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM pairs GROUP BY pair),
      |r AS (SELECT pair, n,
      |             row_number() OVER (ORDER BY n DESC, pair) AS rank FROM pc)
      |SELECT CAST(rank AS BIGINT) AS rank, pair, n
      |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin) { (s, dir) =>
    TextAnalysis.bpePairCounts(t(s, dir, "documents"), "text", k = 50)
      .orderBy("rank")
  }


  // Full BPE merge-rule learning (the tokenizer-induction loop): 8
  // rounds of pair-count → argmax → greedy merge over the word-count
  // vocabulary — here via the driver-local incremental loop (the vocab
  // is far under driverVocabLimit; the distributed fallback is
  // byte-identical, BpeSpec pins the equality). No SQL oracle — the
  // merge table depends on the loop, which t44b proves end-to-end on a
  // planted corpus with an ANALYTIC merge sequence (the d2c
  // planted-twin pattern); BpeSpec pins the classic low/lower/newest
  // hand example and the greedy-fold semantics ('aaaa' -> 'aa aa',
  // never 'aaa a').
  registerNoOracle("t44_bpe_learn") { (s, dir) =>
    TextAnalysis.bpeLearn(t(s, dir, "documents"), "text", merges = 8)
      .orderBy("rank")
  }


  // BPE planted twin: every document collapses to one of three words
  // (abab/abc/bc by doc_id % 3), so the merge sequence is analytic:
  // round 1 is always ('a','b') with count 2*n0+n1 (it dominates (b,a)=n0
  // and (b,c)=n1+n2 whenever 2*n0 > n2 — any near-balanced id split),
  // and round 2's candidates are exactly ('ab','ab')=n0, ('ab','c')=n1,
  // ('b','c')=n2, which the oracle argmaxes under the operator's own
  // (count desc, lhs, rhs) tie-break.
  register(
    "t44b_bpe_learn_planted",
    """WITH n AS (
      |  SELECT count(*) FILTER (WHERE doc_id % 3 = 0) AS n0,
      |         count(*) FILTER (WHERE doc_id % 3 = 1) AS n1,
      |         count(*) FILTER (WHERE doc_id % 3 = 2) AS n2
      |  FROM documents),
      |cand AS (
      |  SELECT 'ab' AS lhs, 'ab' AS rhs, n0 AS n FROM n
      |  UNION ALL SELECT 'ab', 'c', n1 FROM n
      |  UNION ALL SELECT 'b', 'c', n2 FROM n),
      |w2 AS (SELECT lhs, rhs, CAST(n AS BIGINT) AS n,
      |              row_number() OVER (ORDER BY n DESC, lhs, rhs) AS rn
      |       FROM cand)
      |SELECT CAST(1 AS BIGINT) AS rank, 'a' AS lhs, 'b' AS rhs,
      |       CAST(2*n0+n1 AS BIGINT) AS n FROM n
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), lhs, rhs, n FROM w2 WHERE rn = 1
      |ORDER BY rank""".stripMargin) { (s, dir) =>
    val planted = t(s, dir, "documents").select(
      when(col("doc_id") % 3 === 0, "abab")
        .when(col("doc_id") % 3 === 1, "abc")
        .otherwise("bc").as("text"))
    TextAnalysis.bpeLearn(planted, "text", merges = 2).orderBy("rank")
  }


  // Vocabulary coverage curve: fraction of corpus token occurrences the
  // top-N words cover, for tokenizer vocab sizing — distributed top-k
  // cut, windows only over the bounded survivors, one-row total
  // broadcast. Exact integer token mass -> hash oracle.
  register(
    "t46_vocab_coverage",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents),
      |c AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_tokens FROM c),
      |r AS (SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rnk
      |      FROM c),
      |cum AS (SELECT rnk, CAST(sum(n) OVER (ORDER BY rnk) AS BIGINT) AS cum
      |        FROM r WHERE rnk <= 1000),
      |sizes AS (SELECT unnest([10, 100, 1000]) AS n_vocab)
      |SELECT CAST(n_vocab AS BIGINT) AS n_vocab,
      |       CAST(max(cum) AS BIGINT) AS covered_tokens,
      |       CAST(tot.total_tokens AS BIGINT) AS total_tokens,
      |       round(CAST(max(cum) AS DOUBLE) / tot.total_tokens, 6) AS coverage
      |FROM sizes JOIN cum ON cum.rnk <= sizes.n_vocab CROSS JOIN tot
      |GROUP BY n_vocab, tot.total_tokens
      |ORDER BY n_vocab""".stripMargin) { (s, dir) =>
    TextAnalysis.vocabCoverage(t(s, dir, "documents"), "text",
      sizes = Seq(10, 100, 1000))
      .orderBy("n_vocab")
  }


  // Dialogue-format validation (instruction-data QA): events per user
  // read as a conversation, event types mapped to roles; a transcript is
  // training-grade only if roles strictly alternate, the user opens and
  // the assistant closes. On this synthetic stream most conversations
  // honestly FAIL (random role sequences repeat) — the gate's job is
  // exactly that filtering. One conversation-key exchange serves all
  // three windows; exact integers + total turn order -> hash oracle.
  register(
    "t53_dialogue_validate",
    """WITH r AS (
      |  SELECT user_id AS conv_id,
      |         CASE WHEN event_type IN ('purchase', 'signup') THEN 'user'
      |              ELSE 'assistant' END AS role,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts), event_id) AS rn,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts) DESC, event_id DESC)
      |           AS rnd,
      |         lag(CASE WHEN event_type IN ('purchase', 'signup') THEN 'user'
      |                  ELSE 'assistant' END)
      |           OVER (PARTITION BY user_id
      |                 ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events)
      |SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
      |       CAST(sum(CASE WHEN prev = role THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_repeats,
      |       max(CASE WHEN rn = 1 THEN role END) = 'user' AS starts_user,
      |       max(CASE WHEN rnd = 1 THEN role END) = 'assistant'
      |         AS ends_assistant,
      |       (sum(CASE WHEN prev = role THEN 1 ELSE 0 END) = 0
      |        AND max(CASE WHEN rn = 1 THEN role END) = 'user'
      |        AND max(CASE WHEN rnd = 1 THEN role END) = 'assistant') AS valid
      |FROM r GROUP BY conv_id ORDER BY conv_id""".stripMargin) { (s, dir) =>
    graft.operators.Behavior.validateDialogues(t(s, dir, "events"),
        "user_id", "ts",
        when(col("event_type").isin("purchase", "signup"), "user")
          .otherwise("assistant"),
        "event_id")
      .orderBy("conv_id")
  }


  // Compression-ratio quality signal, proven by WIDE-MARGIN planted
  // verdicts (the recall-bound oracle-constant pattern — no SQL engine
  // can deflate, but the orderings are entropy-forced): 20-char-unit
  // boilerplate deflates below 0.1, pseudorandom hex cannot deflate
  // below its ~0.5 entropy so sits above 0.4, 2000-char prose lands in
  // the (0.2, 0.9) band, and prose repeated 4x (within DEFLATE's 32 KB
  // window) compresses strictly better than prose itself.
  register(
    "t72_compression_ratio",
    """SELECT * FROM (VALUES ('boiler_low', true), ('degenerate_low', true),
      |  ('hex_high', true), ('prose_mid', true),
      |  ('rep4_beats_prose', true)) AS v(probe, pass)
      |ORDER BY probe""".stripMargin) { (s, dir) =>
    val d1 = t(s, dir, "documents").where(col("doc_id") === 1)
      .select(substring(col("text"), 1, 2000).as("prose"))
    val probes = d1.select(
      col("prose").as("prose"),
      repeat(substring(col("prose"), 1, 20), 100).as("boiler"),
      repeat(lit("a"), 2000).as("degenerate"),
      array_join(transform(sequence(lit(1), lit(32)),
        i => md5(concat(lit("entropy-probe-"), i))), "").as("hexblob"),
      repeat(col("prose"), 4).as("rep4"))
    def ratio(c: Column): Column =
      floor(graft.functions.DeflateSize.column(c).cast("double") * 1000000.0 /
        octet_length(c) + 0.5) / 1000000.0
    val r = probes.select(ratio(col("prose")).as("rp"),
      ratio(col("boiler")).as("rb"), ratio(col("degenerate")).as("rd"),
      ratio(col("hexblob")).as("rh"), ratio(col("rep4")).as("r4"))
    r.select(explode(array(
      struct(lit("boiler_low").as("probe"), (col("rb") < 0.1).as("pass")),
      struct(lit("degenerate_low").as("probe"), (col("rd") < 0.05).as("pass")),
      struct(lit("hex_high").as("probe"), (col("rh") > 0.4).as("pass")),
      struct(lit("prose_mid").as("probe"),
        (col("rp") > 0.2 && col("rp") < 0.9).as("pass")),
      struct(lit("rep4_beats_prose").as("probe"),
        (col("r4") < col("rp")).as("pass")))).as("v"))
      .select(col("v.probe").as("probe"), col("v.pass").as("pass"))
      .orderBy("probe")
  }


  // Unicode NFC normalization — EXACT cross-engine oracle (Java
  // Normalizer and DuckDB's utf8proc implement the same
  // stability-guaranteed canonical algorithm; agreement probed on every
  // branch below). The corpus is ASCII, so the un-normalized input is
  // planted deterministically in BOTH engines: combining acute after
  // every 'e' (composes to U+00E9), dot-below + acute after every 'o'
  // (composition + canonical reordering -> U+1ECD U+0301), and on the
  // %5 branch the U+212B angstrom singleton (-> U+00C5) plus the
  // NFC-inert fi ligature; %11 rows carry NULL text (nulls propagate,
  // ids survive). The hash pins the full normalized strings, so any
  // divergence in composition, reordering, or singleton mapping breaks
  // the row.
  register(
    "t73_unicode_normalize",
    """WITH d AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 11 = 0 THEN NULL
      |              ELSE replace(replace(substr(text, 1, 120),
      |                     'e', 'e' || chr(769)),
      |                     'o', 'o' || chr(803) || chr(769))
      |                   || CASE WHEN doc_id % 5 = 0
      |                           THEN ' ' || chr(8491) || chr(64257)
      |                           ELSE '' END
      |         END AS dirty
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(length(dirty) AS BIGINT) AS raw_chars,
      |       CAST(length(nfc_normalize(dirty)) AS BIGINT) AS nfc_chars,
      |       nfc_normalize(dirty) != dirty AS changed,
      |       nfc_normalize(dirty) AS text_nfc
      |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val dirty = when(col("doc_id") % 11 === 0, lit(null).cast("string"))
      .otherwise(concat(
        regexp_replace(regexp_replace(substring(col("text"), 1, 120),
          "e", "e\u0301"), "o", "o\u0323\u0301"),
        when(col("doc_id") % 5 === 0, lit(" \u212B\uFB01"))
          .otherwise(lit(""))))
    TextAnalysis.unicodeNormalize(
      t(s, dir, "documents").select(col("doc_id"), dirty.as("dirty")),
      "dirty", "doc_id").orderBy("doc_id")
  }


  // C4-style blocklist filter on the native Aho-Corasick expression.
  // The pattern set exercises the automaton's structure for real:
  // 'slo' nests inside 'slow' (fail-link output closure must emit
  // both), 'join order' crosses a token boundary (substring semantics),
  // 'zzzz' never occurs. EXACT oracle: DuckDB re-derives the matches
  // with per-pattern contains() — P probes, the very shape the
  // automaton exists to avoid, which is fine for a 5-phrase oracle.
  register(
    "t75_blocklist_filter",
    """WITH m AS (
      |  SELECT doc_id,
      |         list_sort(list_filter(['dup', 'join order', 'slo', 'slow',
      |                                'zzzz'],
      |           p -> contains(lower(text), p))) AS hits
      |  FROM documents)
      |SELECT doc_id, coalesce(array_to_string(hits, ','), '') AS matched,
      |       CAST(len(hits) AS BIGINT) AS n_matched,
      |       len(hits) > 0 AS blocked
      |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.blocklistFilter(t(s, dir, "documents"), "text", "doc_id",
      Seq("dup", "join order", "slo", "slow", "zzzz"))
      .orderBy("doc_id")
  }


  // Full-batch logistic-regression quality classifier, 3 GD rounds
  // unrolled in the oracle (the dawidSkene precedent): features are the
  // t2 quality components micro-quantized scan-side, weights live in
  // integer nanos, the margin/sigmoid/update arithmetic is the same
  // fixed-shape IEEE expression in both engines, and per-doc gradient
  // terms nano-floor before the order-free integer sum — the whole
  // training trajectory plus final accuracy hash-matches.
  register(
    "t76_logreg_quality",
    """WITH f AS (
      |  SELECT CASE WHEN source IN ('src0', 'src1', 'src2')
      |              THEN 1 ELSE 0 END AS y,
      |         CAST(floor(least(length(text) / 500.0, 1.0) * 1000000.0
      |           + 0.5) AS BIGINT) AS lm,
      |         CAST(floor((CASE WHEN len(toks) > 0 THEN
      |             len(list_filter(toks, x -> x IN ('the','a','of','and',
      |               'to','in')))::DOUBLE / len(toks)
      |           ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT) AS sm,
      |         CAST(floor((CASE WHEN length(text) > 0 THEN
      |             len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |               length(text)
      |           ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT) AS pm
      |  FROM (SELECT source, text,
      |          list_filter(string_split_regex(lower(text), '\s+'),
      |                      x -> x != '') AS toks
      |        FROM documents)),
      |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
      |w0 AS (SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS l,
      |              CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS p),
      |g1 AS (
      |  SELECT
      |    CAST(sum(CAST(floor((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gb,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(lm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gl,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(sm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gs,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(pm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gp
      |  FROM f, w0 w),
      |w1 AS (SELECT
      |    w.b + CAST(floor((0.5 * CAST(g.gb AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS b,
      |    w.l + CAST(floor((0.5 * CAST(g.gl AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS l,
      |    w.s + CAST(floor((0.5 * CAST(g.gs AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS s,
      |    w.p + CAST(floor((0.5 * CAST(g.gp AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS p
      |  FROM w0 w, g1 g, nt),
      |g2 AS (
      |  SELECT
      |    CAST(sum(CAST(floor((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gb,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(lm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gl,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(sm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gs,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(pm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gp
      |  FROM f, w1 w),
      |w2 AS (SELECT
      |    w.b + CAST(floor((0.5 * CAST(g.gb AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS b,
      |    w.l + CAST(floor((0.5 * CAST(g.gl AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS l,
      |    w.s + CAST(floor((0.5 * CAST(g.gs AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS s,
      |    w.p + CAST(floor((0.5 * CAST(g.gp AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS p
      |  FROM w1 w, g2 g, nt),
      |g3 AS (
      |  SELECT
      |    CAST(sum(CAST(floor((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gb,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(lm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gl,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(sm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gs,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(pm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gp
      |  FROM f, w2 w),
      |w3 AS (SELECT
      |    w.b + CAST(floor((0.5 * CAST(g.gb AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS b,
      |    w.l + CAST(floor((0.5 * CAST(g.gl AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS l,
      |    w.s + CAST(floor((0.5 * CAST(g.gs AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS s,
      |    w.p + CAST(floor((0.5 * CAST(g.gp AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS p
      |  FROM w2 w, g3 g, nt),
      |acc AS (
      |  SELECT CAST(sum(CASE WHEN (((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))) >= 0.0) = (y = 1)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM f, w3 w)
      |SELECT nt.n,
      |       CAST(w3.b AS DOUBLE) / 1000000000.0 AS w_bias,
      |       CAST(w3.l AS DOUBLE) / 1000000000.0 AS w_f_len,
      |       CAST(w3.s AS DOUBLE) / 1000000000.0 AS w_f_stop,
      |       CAST(w3.p AS DOUBLE) / 1000000000.0 AS w_f_punct,
      |       floor((CAST(acc.c AS DOUBLE) * 1000000.0) / nt.n + 0.5)
      |         / 1000000.0 AS accuracy
      |FROM nt, w3, acc""".stripMargin) { (s, dir) =>
    val stop = Seq("the", "a", "of", "and", "to", "in")
    val feats = t(s, dir, "documents").select(
      when(col("source").isin("src0", "src1", "src2"), 1).otherwise(0).as("y"),
      floor(least(length(col("text")).cast("double") / 500.0, lit(1.0)) *
        1000000.0 + 0.5).cast("long").as("f_len"),
      floor(TextAnalysis.stopwordRatio(col("text"), stop) * 1000000.0 + 0.5)
        .cast("long").as("f_stop"),
      floor(TextAnalysis.punctRatio(col("text")) * 1000000.0 + 0.5)
        .cast("long").as("f_punct"))
    TextAnalysis.logregTrain(feats, Seq("f_len", "f_stop", "f_punct"), "y",
      rounds = 3, lr = 0.5)
  }


  // Zipf power-law fit over the top-200 vocabulary ranks: micro-floored
  // log moments, exact-integer OLS sums, one double division per
  // coefficient — hash-matched.
  register(
    "t77_zipf_fit",
    """WITH c AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text),
      |          '\s+'), x -> x != '')) AS tok FROM documents)
      |  GROUP BY tok),
      |t AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rank
      |      FROM c ORDER BY n DESC, tok ASC LIMIT 200),
      |mm AS (SELECT
      |    CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
      |  FROM t),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS r,
      |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * x) AS BIGINT) AS sxx,
      |             CAST(sum(x * y) AS BIGINT) AS sxy FROM mm)
      |SELECT r,
      |  floor((CAST(r * sxy - sx * sy AS DOUBLE) /
      |         CAST(r * sxx - sx * sx AS DOUBLE)) * 1000000.0 + 0.5)
      |    / 1000000.0 AS slope,
      |  floor((CAST(sy AS DOUBLE) - (CAST(r * sxy - sx * sy AS DOUBLE) /
      |         CAST(r * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) /
      |         CAST(r AS DOUBLE) + 0.5) / 1000000.0 AS intercept
      |FROM m""".stripMargin) { (s, dir) =>
    TextAnalysis.zipfFit(t(s, dir, "documents"), "text", topR = 200)
  }


  // Unigram-LM (SentencePiece-style) tokenizer training — realistic run
  // (rows-only: the Viterbi E-step is not SQL-expressible; the planted
  // twin below hash-proves the full mechanism, the t44 BPE precedent).
  registerNoOracle("t78_unigram_lm") { (s, dir) =>
    TextAnalysis.unigramLmLearn(t(s, dir, "documents"), "text",
      maxPieceLen = 3, seedSize = 30, rounds = 2).orderBy("piece")
  }


  // Planted twin with PROVABLE segmentations: words are pure repetitions
  // of the disjoint-alphabet pieces 'ab' and 'cd' (lengths driven by
  // doc_id arithmetic), maxPieceLen = 2. Under the seed scores
  // p(ab) = p(a) = p(b) (every 'a' occurs inside an 'ab'), so the
  // 2-piece path beats any char/straddle path strictly:
  // p(ab)² > p(a)·p(ba)·p(b) because p(ba) < 1 — Viterbi MUST emit
  // k × [ab] for 'ab'^k in every round. Piece counts are therefore
  // analytic (sum of the doc_id arithmetic), straddle pieces 'ba'/'dc'
  // win zero mass and are pruned, chars sit at the -25.0 UNK floor, and
  // the M-step log-probs are ln(count/total) micro-floored — all
  // SQL-reproducible, hash-matched.
  register(
    "t78b_unigram_lm_planted",
    """WITH k AS (SELECT CAST(sum(doc_id % 3 + 1) AS BIGINT) AS nab,
      |                  CAST(sum(doc_id % 5 + 1) AS BIGINT) AS ncd
      |           FROM documents)
      |SELECT piece, count, logprob FROM (
      |  SELECT 'ab' AS piece, nab AS count,
      |         floor(ln(CAST(nab AS DOUBLE) / CAST(nab + ncd AS DOUBLE))
      |           * 1000000.0 + 0.5) / 1000000.0 AS logprob FROM k
      |  UNION ALL
      |  SELECT 'cd', ncd,
      |         floor(ln(CAST(ncd AS DOUBLE) / CAST(nab + ncd AS DOUBLE))
      |           * 1000000.0 + 0.5) / 1000000.0 FROM k
      |  UNION ALL SELECT 'a', CAST(0 AS BIGINT), -25.0 FROM k
      |  UNION ALL SELECT 'b', CAST(0 AS BIGINT), -25.0 FROM k
      |  UNION ALL SELECT 'c', CAST(0 AS BIGINT), -25.0 FROM k
      |  UNION ALL SELECT 'd', CAST(0 AS BIGINT), -25.0 FROM k)
      |ORDER BY piece""".stripMargin) { (s, dir) =>
    val planted = t(s, dir, "documents").select(concat(
      expr("repeat('ab', CAST(doc_id % 3 + 1 AS INT))"), lit(" "),
      expr("repeat('cd', CAST(doc_id % 5 + 1 AS INT))")).as("text"))
    TextAnalysis.unigramLmLearn(planted, "text", maxPieceLen = 2,
      seedSize = 10, rounds = 2).orderBy("piece")
  }


  // Unigram-LM tokenizer APPLICATION on the t78b planted corpus: the
  // learned table (trained in-query — full train->apply composition)
  // must segment 'ab'^k1 'cd'^k2 into exactly k1 + k2 pieces, so the
  // per-doc counts are pure doc_id arithmetic — hash-matched.
  register(
    "t78c_unigram_counts_planted",
    """SELECT doc_id, CAST(2 AS BIGINT) AS n_words,
      |       CAST((doc_id % 3 + 1) + (doc_id % 5 + 1) AS BIGINT) AS n_pieces
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val planted = t(s, dir, "documents").select(col("doc_id"), concat(
      expr("repeat('ab', CAST(doc_id % 3 + 1 AS INT))"), lit(" "),
      expr("repeat('cd', CAST(doc_id % 5 + 1 AS INT))")).as("text"))
    val learned = TextAnalysis.unigramLmLearn(planted, "text",
      maxPieceLen = 2, seedSize = 10, rounds = 2)
      .collect().map(r => r.getString(0) ->
        math.floor(r.getDouble(2) * 1000000.0 + 0.5).toLong).toSeq
    TextAnalysis.unigramTokenCounts(planted, "text", "doc_id", learned)
      .orderBy("doc_id")
  }


  // Heaps' law fit over 10 ingestion checkpoints — the vocabulary-growth
  // exponent beside t77's static Zipf check; micro-floored log points,
  // exact-integer OLS — hash-matched.
  register(
    "t80_heaps_fit",
    """WITH tk AS (
      |  SELECT doc_id AS id,
      |         unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                x -> x != '')) AS tok
      |  FROM documents),
      |fs AS (SELECT tok, CAST(min(id) AS BIGINT) AS fd FROM tk GROUP BY tok),
      |pd AS (SELECT id, CAST(count(*) AS BIGINT) AS nt FROM tk GROUP BY id),
      |mx AS (SELECT CAST(max(id) AS BIGINT) AS m FROM pd),
      |cuts AS (SELECT DISTINCT CAST((m * i) // 10 AS BIGINT) AS cut
      |         FROM mx, range(1, 11) r(i)),
      |v AS (SELECT cut, CAST(count(*) AS BIGINT) AS vv
      |      FROM cuts, fs WHERE fd <= cut GROUP BY cut),
      |tt AS (SELECT cut, CAST(sum(nt) AS BIGINT) AS tn
      |       FROM cuts, pd WHERE id <= cut GROUP BY cut),
      |pts AS (SELECT
      |    CAST(floor(ln(CAST(tn AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(vv AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
      |  FROM v JOIN tt USING (cut) WHERE tn > 0),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS r,
      |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * x) AS BIGINT) AS sxx,
      |             CAST(sum(x * y) AS BIGINT) AS sxy FROM pts)
      |SELECT r AS c,
      |  floor((CAST(r * sxy - sx * sy AS DOUBLE) /
      |         CAST(r * sxx - sx * sx AS DOUBLE)) * 1000000.0 + 0.5)
      |    / 1000000.0 AS beta,
      |  floor((CAST(sy AS DOUBLE) - (CAST(r * sxy - sx * sy AS DOUBLE) /
      |         CAST(r * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) /
      |         CAST(r AS DOUBLE) + 0.5) / 1000000.0 AS ln_k
      |FROM m""".stripMargin) { (s, dir) =>
    TextAnalysis.heapsFit(t(s, dir, "documents"), "text", "doc_id",
      checkpoints = 10)
  }


  // Luhn-validated card detection: every doc gets a planted 16-digit
  // number whose check digit is COMPUTED by the same Luhn fold in both
  // engines — even docs get the valid digit, odd docs get it shifted
  // by 5 (never equal mod 10, so provably invalid). The validator then
  // splits the corpus exactly in half — hash-matched.
  register(
    "t81_luhn_pii",
    """WITH b AS (
      |  SELECT doc_id,
      |         lpad(CAST(doc_id * 7919 AS VARCHAR), 15, '0') AS base
      |  FROM documents),
      |ck AS (
      |  SELECT doc_id, base,
      |    CAST((10 - CAST(list_sum(list_transform(
      |        range(1, length(base) + 1),
      |        i -> CASE WHEN (length(base) + 1 - i) % 2 = 1 THEN
      |               CASE WHEN CAST(base[i] AS INTEGER) * 2 > 9
      |                    THEN CAST(base[i] AS INTEGER) * 2 - 9
      |                    ELSE CAST(base[i] AS INTEGER) * 2 END
      |             ELSE CAST(base[i] AS INTEGER) END)) AS BIGINT) % 10)
      |      % 10 AS BIGINT) AS cd
      |  FROM b),
      |t AS (
      |  SELECT doc_id,
      |         'card ' || base ||
      |           CAST((cd + CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 5 END) % 10
      |                AS VARCHAR) || ' end' AS text81
      |  FROM ck),
      |e AS (
      |  SELECT doc_id, regexp_extract_all(text81, '[0-9]{13,19}') AS cands
      |  FROM t)
      |SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_candidates,
      |  CAST(len(list_filter(cands, c ->
      |    CAST(list_sum(list_transform(range(1, length(c) + 1),
      |      i -> CASE WHEN (length(c) - i) % 2 = 1 THEN
      |             CASE WHEN CAST(c[i] AS INTEGER) * 2 > 9
      |                  THEN CAST(c[i] AS INTEGER) * 2 - 9
      |                  ELSE CAST(c[i] AS INTEGER) * 2 END
      |           ELSE CAST(c[i] AS INTEGER) END)) AS BIGINT) % 10 = 0))
      |    AS BIGINT) AS n_valid
      |FROM e ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val base = lpad((col("doc_id") * 7919).cast("string"), 15, "0")
    val cd = TextAnalysis.luhnCheckDigit(base)
    val planted = t(s, dir, "documents").select(col("doc_id"), concat(
      lit("card "), base,
      ((cd + when(col("doc_id") % 2 === 0, 0).otherwise(5)) % 10)
        .cast("string"), lit(" end")).as("text81"))
    TextAnalysis.luhnCards(planted, "text81", "doc_id").orderBy("doc_id")
  }


  // URL canonicalization — the dedup-key normalizer of web-corpus
  // pipelines. One synthetic URL per doc cycles through the adversarial
  // branches (default port + www + tracking params + unsorted query +
  // fragment + trailing slash; http:80; a kept non-default port;
  // non-URL passthrough), and both engines apply the IDENTICAL
  // RE2-compatible regex/list pipeline — hash oracle on the canonical
  // strings themselves.
  register(
    "t52_url_canonicalize",
    """WITH raw AS (
      |  SELECT doc_id, CASE CAST(doc_id % 4 AS INT)
      |    WHEN 0 THEN 'HTTPS://WWW.Example' || (doc_id % 7) || '.com:443/Path'
      |                || (doc_id % 5) || '/?utm_source=x&b=2&a=1&fbclid=z#frag'
      |    WHEN 1 THEN 'http://Site' || (doc_id % 7) || '.org:80/a'
      |    WHEN 2 THEN 'http://site' || (doc_id % 7) || '.org:8080/a?z=1&y=2'
      |    ELSE 'not a url ' || doc_id END AS url
      |  FROM documents),
      |s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag
      |       FROM raw),
      |s2 AS (SELECT *,
      |         lower(regexp_extract(nofrag,
      |           '^([a-zA-Z][a-zA-Z0-9+.-]*)://.*$', 1)) AS scheme,
      |         lower(regexp_extract(nofrag, '^[^:]+://([^/?]*).*', 1)) AS auth0,
      |         regexp_extract(nofrag, '^[^:]+://[^/?]*(.*)', 1) AS rest
      |       FROM s1),
      |s3 AS (SELECT *, regexp_replace(auth0, '^www\.', '') AS auth1 FROM s2),
      |s4 AS (SELECT *,
      |         CASE WHEN scheme = 'http' THEN regexp_replace(auth1, ':80$', '')
      |              WHEN scheme = 'https' THEN regexp_replace(auth1, ':443$', '')
      |              ELSE auth1 END AS host,
      |         regexp_extract(rest, '^([^?]*)', 1) AS path0,
      |         regexp_extract(rest, '\?(.*)$', 1) AS query
      |       FROM s3),
      |s5 AS (SELECT *,
      |         CASE WHEN len(path0) > 1 THEN regexp_replace(path0, '/$', '')
      |              ELSE path0 END AS path,
      |         array_to_string(list_sort(list_filter(string_split(query, '&'),
      |           p -> p != '' AND NOT regexp_matches(p,
      |             '^(utm_[^=]*|gclid|fbclid)(=|$)'))), '&') AS joined
      |       FROM s4)
      |SELECT doc_id, url,
      |       CASE WHEN scheme = '' THEN url
      |            ELSE scheme || '://' || host || path ||
      |                 CASE WHEN len(joined) > 0 THEN '?' || joined
      |                      ELSE '' END END AS canon
      |FROM s5 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val raw = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(lit("HTTPS://WWW.Example"), col("doc_id") % 7,
          lit(".com:443/Path"), col("doc_id") % 5,
          lit("/?utm_source=x&b=2&a=1&fbclid=z#frag")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("http://Site"), col("doc_id") % 7, lit(".org:80/a")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("http://site"), col("doc_id") % 7,
            lit(".org:8080/a?z=1&y=2")))
        .otherwise(concat(lit("not a url "), col("doc_id"))).as("url"))
    raw.select(col("doc_id"), col("url"),
        TextAnalysis.canonicalizeUrl(col("url")).as("canon"))
      .orderBy("doc_id")
  }


  // Character-entropy quality signal: gibberish and encoded blobs sit
  // outside natural text's entropy band. Order-free fixed-point term
  // summation (floor(p·ln p·1e9 + 0.5) integer sums) makes the value
  // partitioning- and engine-exact — hash oracle.
  register(
    "t51_char_entropy",
    """WITH ch AS (
      |  SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
      |  FROM documents),
      |c AS (SELECT doc_id, ch, count(*) AS c FROM ch
      |      WHERE ch != '' GROUP BY doc_id, ch),
      |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
      |               CAST(count(*) AS BIGINT) AS k
      |        FROM c GROUP BY doc_id),
      |u AS (SELECT c.doc_id, tot.n, tot.k,
      |             CAST(floor((CAST(c.c AS DOUBLE) / tot.n) *
      |                        ln(CAST(c.c AS DOUBLE) / tot.n) *
      |                        1000000000.0 + 0.5) AS BIGINT) AS u
      |      FROM c JOIN tot USING (doc_id)),
      |s AS (SELECT doc_id, max(n) AS n_chars, max(k) AS distinct_chars,
      |             round(-CAST(sum(u) AS DOUBLE) / 1000000000.0, 6)
      |               AS entropy_nats
      |      FROM u GROUP BY doc_id)
      |SELECT d.doc_id,
      |       coalesce(s.n_chars, 0) AS n_chars,
      |       coalesce(s.distinct_chars, 0) AS distinct_chars,
      |       coalesce(s.entropy_nats, 0.0) AS entropy_nats
      |FROM (SELECT DISTINCT doc_id FROM documents) d
      |LEFT JOIN s USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.charEntropy(t(s, dir, "documents"), "text", "doc_id")
      .orderBy("doc_id")
  }


  // Surgical span decontamination: benchmark snippets = the first five
  // tokens of every doc_id % 97 == 0 document, so hits exist by
  // construction (those docs lose their opening span; any other doc
  // sharing a 5-gram is cleaned too) while most of the corpus passes
  // untouched. Exact set logic over positional grams -> hash oracle,
  // including the reassembled clean_text bytes.
  register(
    "t49_surgical_decontaminate",
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS toks
      |  FROM documents),
      |sg AS (
      |  SELECT DISTINCT md5(array_to_string(toks[1 : 5], ' ')) AS gram_key
      |  FROM t WHERE doc_id % 97 = 0 AND len(toks) >= 5),
      |d AS (
      |  SELECT doc_id, toks,
      |         CASE WHEN len(toks) >= 5 THEN
      |           list_transform(range(1, len(toks) - 5 + 2),
      |                          s -> md5(array_to_string(toks[s : s + 4], ' ')))
      |         ELSE [] END AS gkeys
      |  FROM t),
      |starts AS (
      |  SELECT doc_id, generate_subscripts(gkeys, 1) AS s,
      |         unnest(gkeys) AS gram_key
      |  FROM d),
      |covered AS (
      |  SELECT DISTINCT starts.doc_id, starts.s + o.off AS pos
      |  FROM starts JOIN sg USING (gram_key)
      |  CROSS JOIN (SELECT unnest(range(0, 5)) AS off) o),
      |dt AS (SELECT doc_id, unnest(toks) AS tok,
      |              generate_subscripts(toks, 1) AS pos
      |       FROM t),
      |kept AS (
      |  SELECT dt.doc_id, dt.tok, dt.pos FROM dt
      |  ANTI JOIN covered ON covered.doc_id = dt.doc_id
      |                   AND covered.pos = dt.pos),
      |agg AS (
      |  SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS clean_text,
      |         count(*) AS n_kept
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, coalesce(agg.clean_text, '') AS clean_text,
      |       CAST(len(t.toks) AS BIGINT) AS n_tokens,
      |       CAST(len(t.toks) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
      |FROM t LEFT JOIN agg USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val snippets = docs.where(col("doc_id") % 97 === 0)
      .select(concat_ws(" ",
        slice(TextAnalysis.tokens(lower(col("text"))), 1, 5)).as("snip"))
    TextAnalysis.removeContaminatedSpans(docs, "text", "doc_id",
        snippets, "snip", n = 5)
      .orderBy("doc_id")
  }


  // Temperature-scaled source sampling (the multilingual "sampling
  // temperature": p_s ∝ n_s^alpha flattens the source distribution so
  // low-resource sources are not drowned; alpha = 0.5 here — sqrt is
  // correctly-rounded IEEE, so unlike pow() it is bit-identical across
  // engines). Weights lift to integer micro-units before the normalizing
  // sum (exact under any partitioning), making the probabilities and the
  // per-source token allocation for a 1M-token epoch one fixed double
  // expression over exact integers — hash oracle.
  register(
    "t47_temperature_mix",
    """WITH c AS (
      |  SELECT source,
      |         CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'),
      |                                  x -> x != ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (SELECT source, n_tokens,
      |             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5)
      |               AS BIGINT) AS wu
      |      FROM c),
      |tot AS (SELECT CAST(sum(wu) AS BIGINT) AS wt FROM w)
      |SELECT source, n_tokens,
      |       round(CAST(wu AS DOUBLE) / wt, 6) AS p_temp,
      |       CAST(floor(CAST(wu AS DOUBLE) / wt * 1000000 + 0.5) AS BIGINT)
      |         AS epoch_tokens
      |FROM w CROSS JOIN tot ORDER BY source""".stripMargin) { (s, dir) =>
    val counts = t(s, dir, "documents")
      .groupBy("source")
      .agg(sum(size(TextAnalysis.tokens(lower(col("text")))))
        .cast("long").as("n_tokens"))
      .withColumn("wu",
        floor(sqrt(col("n_tokens").cast("double")) * 1000000 + 0.5).cast("long"))
    counts.crossJoin(broadcast(counts.agg(sum(col("wu")).cast("long").as("wt"))))
      .select(col("source"), col("n_tokens"),
        round(col("wu").cast("double") / col("wt"), 6).as("p_temp"),
        floor(col("wu").cast("double") / col("wt") * 1000000 + 0.5)
          .cast("long").as("epoch_tokens"))
      .orderBy("source")
  }


  // Padding-waste audit for length-bucketed batching: each document
  // rounds up to the smallest bucket that holds it (cap-truncated at the
  // top bucket), and the per-bucket padded-token overhead is what the
  // batching scheme wastes — the statistic that picks bucket boundaries.
  // Exact integer token counts -> hash oracle.
  register(
    "t48_padding_waste",
    """WITH d AS (
      |  SELECT doc_id,
      |         len(list_filter(string_split_regex(lower(text), '\s+'),
      |                         x -> x != '')) AS n
      |  FROM documents),
      |b AS (SELECT doc_id, least(n, 1024) AS eff,
      |             CASE WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
      |                  WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
      |                  ELSE 1024 END AS bucket
      |      FROM d)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(eff) AS BIGINT) AS real_tokens,
      |       CAST(sum(bucket - eff) AS BIGINT) AS pad_tokens,
      |       round(CAST(sum(bucket - eff) AS DOUBLE) /
      |             (CAST(count(*) AS BIGINT) * bucket), 6) AS waste_ratio
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(lower(col("text")))).as("n"))
    val b = d.select(col("doc_id"), least(col("n"), lit(1024)).as("eff"),
      when(col("n") <= 64, 64).when(col("n") <= 128, 128)
        .when(col("n") <= 256, 256).when(col("n") <= 512, 512)
        .otherwise(1024).as("bucket"))
    b.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("eff")).cast("long").as("real_tokens"),
        sum(col("bucket") - col("eff")).cast("long").as("pad_tokens"))
      .select(col("bucket").cast("long").as("bucket"), col("n_docs"),
        col("real_tokens"), col("pad_tokens"),
        round(col("pad_tokens").cast("double") /
          (col("n_docs") * col("bucket")), 6).as("waste_ratio"))
      .orderBy("bucket")
  }


  // Tokenizer APPLICATION over the realistic corpus: learn 8 merges, then
  // count per-document BPE tokens under the learned table — the
  // token-budget statistic (learn → encode is the full tokenizer loop).
  // No SQL oracle (the table comes from the iterative loop); t45b is the
  // planted hash twin, BpeSpec pins the encode algebra.
  registerNoOracle("t45_bpe_encode") { (s, dir) =>
    val docs = t(s, dir, "documents")
    val rules = TextAnalysis.bpeLearn(docs, "text", merges = 8)
    TextAnalysis.bpeTokenCounts(docs, "text", "doc_id", rules)
      .orderBy("doc_id")
  }


  // Encode planted twin: the t44b corpus (abab/abc/bc by doc_id % 3)
  // under the FIXED table [(a,b), (ab,ab)] has an analytic encoding —
  // abab -> [abab] (both rules fire), abc -> [ab, c], bc -> [b, c] — so
  // the vocabulary-encode + join-back + per-doc rollup machinery gets an
  // exact hash oracle.
  register(
    "t45b_bpe_encode_planted",
    """SELECT doc_id, CAST(1 AS BIGINT) AS n_words,
      |       CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS BIGINT)
      |         AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val planted = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0, "abab")
        .when(col("doc_id") % 3 === 1, "abc")
        .otherwise("bc").as("text"))
    val spark = s
    import spark.implicits._
    val rules = Seq((1L, "a", "b"), (2L, "ab", "ab"))
      .toDF("rank", "lhs", "rhs")
    TextAnalysis.bpeTokenCounts(planted, "text", "doc_id", rules)
      .orderBy("doc_id")
  }


  // DSIR importance weights: log p_target − log p_raw under unigram LMs;
  // target LM = the src0/src1 slice, raw LM = the whole corpus.
  register(
    "t22_dsir_weights",
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                                    x -> x != '')) AS tok
      |  FROM documents),
      |ttoks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents WHERE source IN ('src0', 'src1')),
      |rf AS (SELECT tok, count(*) AS nr FROM toks GROUP BY tok),
      |tf AS (SELECT tok, count(*) AS nt FROM ttoks GROUP BY tok),
      |tot AS (SELECT (SELECT CAST(sum(nr) AS DOUBLE) FROM rf) AS totr,
      |               (SELECT CAST(sum(nt) AS DOUBLE) FROM tf) AS tott),
      |dc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
      |SELECT dc.doc_id, CAST(sum(dc.c) AS BIGINT) AS n_tokens,
      |       round(sum(dc.c * (ln(coalesce(CAST(tf.nt AS DOUBLE), 0.5) / tot.tott)
      |                       - ln(coalesce(CAST(rf.nr AS DOUBLE), 0.5) / tot.totr))),
      |             6) AS log_weight
      |FROM dc LEFT JOIN rf USING (tok) LEFT JOIN tf USING (tok), tot
      |GROUP BY dc.doc_id ORDER BY dc.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    TextAnalysis.dsirWeights(docs, "text", "doc_id",
      target = docs.where(col("source").isin("src0", "src1")))
      .orderBy("doc_id")
  }


  // Vocabulary drift audit: top-30 tokens by pointwise KL contribution
  // between two source cohorts — every value per-term arithmetic, so the
  // report hash-matches (no cross-term float sums).
  register(
    "t24_vocab_drift",
    """WITH ta AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents WHERE source IN ('src0','src1','src2','src3','src4')),
      |tb AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents
      |  WHERE source NOT IN ('src0','src1','src2','src3','src4')),
      |fa AS (SELECT tok, count(*) AS n_a FROM ta GROUP BY tok),
      |fb AS (SELECT tok, count(*) AS n_b FROM tb GROUP BY tok),
      |tot AS (SELECT (SELECT CAST(sum(n_a) AS DOUBLE) FROM fa) AS tta,
      |               (SELECT CAST(sum(n_b) AS DOUBLE) FROM fb) AS ttb)
      |SELECT fa.tok, fa.n_a, coalesce(fb.n_b, 0) AS n_b,
      |       round((fa.n_a / tot.tta) * ln((fa.n_a / tot.tta) /
      |             (coalesce(CAST(fb.n_b AS DOUBLE), 0.5) / tot.ttb)), 9)
      |         AS kl_contrib
      |FROM fa LEFT JOIN fb USING (tok), tot
      |ORDER BY kl_contrib DESC, tok ASC LIMIT 30""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val aSrc = Seq("src0", "src1", "src2", "src3", "src4")
    TextAnalysis.vocabDriftTopK(
      docs.where(col("source").isin(aSrc: _*)),
      docs.where(!col("source").isin(aSrc: _*)),
      "text", k = 30)
  }


  // Bigram-LM surprisal with stupid backoff: LM trained on the src0 slice
  // only, scoring the whole corpus — cross-source bigrams genuinely miss,
  // so the backoff leg (0.4 · p_unigram, OOV-floored) is exercised for
  // real, not just reachable.
  register(
    "t25_bigram_surprisal",
    """WITH w AS (
      |  SELECT doc_id, source,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |refw AS (SELECT toks FROM w WHERE source = 'src0' AND len(toks) >= 2),
      |refbg AS (
      |  SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS nb FROM (
      |    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
      |    FROM refw) GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(sum(nb) AS DOUBLE) AS nc FROM refbg GROUP BY w1),
      |uni AS (SELECT tok, count(*) AS nu
      |        FROM (SELECT unnest(toks) AS tok FROM refw) GROUP BY tok),
      |tot AS (SELECT CAST(sum(nu) AS DOUBLE) AS total FROM uni),
      |docbg AS (
      |  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2, count(*) AS c FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
      |    FROM w WHERE len(toks) >= 2) GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT d.doc_id, d.c,
      |         CASE WHEN refbg.nb IS NOT NULL THEN -ln(refbg.nb / ctx.nc)
      |              ELSE -ln(0.4 * coalesce(CAST(uni.nu AS DOUBLE), 0.5) /
      |                       tot.total) END AS s
      |  FROM docbg d
      |  LEFT JOIN refbg ON d.w1 = refbg.w1 AND d.w2 = refbg.w2
      |  LEFT JOIN ctx ON d.w1 = ctx.w1
      |  LEFT JOIN uni ON d.w2 = uni.tok, tot)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |       round(sum(c * s) / sum(c), 6) AS avg_surprisal
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    TextAnalysis.bigramSurprisal(docs, "text", "doc_id",
      refCorpus = Some(docs.where(col("source") === "src0")))
      .orderBy("doc_id")
  }


  // Interpolated Kneser-Ney bigram surprisal: the LM trains on the EVEN
  // doc_ids and scores the whole corpus, so odd docs genuinely exercise
  // every smoothing leg — discounted seen bigrams, unseen-bigram
  // continuation interpolation, unseen contexts backing off to P_cont,
  // and never-seen continuation words on the OOV floor. The probability
  // is one fixed-shape double expression over exact integer counts
  // (parenthesized identically here and in TextAnalysis.knSurprisal);
  // per-bigram-type surprisal micro-floors before the per-doc
  // occurrence-weighted integer sum.
  /** The interpolated-KN per-doc scoring chain as DuckDB CTEs ending in
    * `knscored(doc_id, n_bigrams, avg_surprisal)` — shared verbatim by
    * t74 and the t102 perplexity-bucket composite (hoisted-chain rule:
    * composite and part cannot silently diverge). */
  private[graft] val knChainSql: String =
    """w AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |refw AS (SELECT toks FROM w WHERE doc_id % 2 = 0 AND len(toks) >= 2),
      |refbg AS (
      |  SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS nb FROM (
      |    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
      |    FROM refw) GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(sum(nb) AS BIGINT) AS nc,
      |               CAST(count(*) AS BIGINT) AS n1 FROM refbg GROUP BY w1),
      |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS nw FROM refbg GROUP BY w2),
      |nbbt AS (SELECT CAST(count(*) AS BIGINT) AS nbb FROM refbg),
      |docbg AS (
      |  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2, count(*) AS c FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
      |    FROM w WHERE len(toks) >= 2) GROUP BY 1, 2, 3),
      |knsc AS (
      |  SELECT d.doc_id, d.c,
      |    CAST(floor(-ln(
      |      CASE WHEN ctx.nc IS NOT NULL THEN
      |        ((CASE WHEN refbg.nb IS NOT NULL
      |               THEN CAST(refbg.nb AS DOUBLE) - 0.75 ELSE 0.0 END)
      |         + ((0.75 * ctx.n1) *
      |            (coalesce(CAST(cont.nw AS DOUBLE), 0.5) / nbbt.nbb)))
      |        / ctx.nc
      |      ELSE coalesce(CAST(cont.nw AS DOUBLE), 0.5) / nbbt.nbb END
      |    ) * 1000000.0 + 0.5) AS BIGINT) AS s
      |  FROM docbg d
      |  LEFT JOIN refbg ON d.w1 = refbg.w1 AND d.w2 = refbg.w2
      |  LEFT JOIN ctx ON d.w1 = ctx.w1
      |  LEFT JOIN cont ON d.w2 = cont.w2, nbbt),
      |knscored AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |         floor(CAST(sum(c * s) AS DOUBLE) / sum(c) + 0.5) / 1000000.0
      |           AS avg_surprisal
      |  FROM knsc GROUP BY doc_id)""".stripMargin

  register(
    "t74_kneser_ney",
    "WITH " + knChainSql + """
      |SELECT doc_id, n_bigrams, avg_surprisal
      |FROM knscored ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    TextAnalysis.knSurprisal(docs, "text", "doc_id",
      refCorpus = Some(docs.where(col("doc_id") % 2 === 0)))
      .orderBy("doc_id")
  }

  // CCNet perplexity buckets (Wenzek et al. 2020) — the LM-quality tier
  // of a web-corpus build: every doc scores under the t74 KN bigram LM
  // (hoisted chain, shared verbatim), then buckets per LANGUAGE into
  // head/middle/tail perplexity tertiles; keep = not tail (CCNet's
  // default). Cutoffs are order statistics over the per-lang score
  // histogram (t26 pattern — no corpus-cardinality window); ties land
  // in the lower bucket identically in both engines.
  register(
    "t102_ccnet_perplexity",
    "WITH " + knChainSql + """,
      |lg AS (SELECT k.doc_id, d.lang, k.n_bigrams, k.avg_surprisal
      |       FROM knscored k JOIN documents d USING (doc_id)),
      |hist AS (SELECT lang, avg_surprisal AS sc, count(*) AS n
      |         FROM lg GROUP BY 1, 2),
      |cum AS (SELECT lang, sc,
      |          sum(n) OVER (PARTITION BY lang ORDER BY sc) AS cum
      |        FROM hist),
      |tot AS (SELECT lang, sum(n) AS total FROM hist GROUP BY 1),
      |c1 AS (SELECT c.lang, min(c.sc) AS cut1
      |       FROM cum c JOIN tot t USING (lang)
      |       WHERE c.cum >= ceil(t.total / 3.0) GROUP BY 1),
      |c2 AS (SELECT c.lang, min(c.sc) AS cut2
      |       FROM cum c JOIN tot t USING (lang)
      |       WHERE c.cum >= ceil(t.total * 2.0 / 3.0) GROUP BY 1)
      |SELECT lg.doc_id, lg.lang, lg.n_bigrams, lg.avg_surprisal,
      |       CASE WHEN lg.avg_surprisal <= c1.cut1 THEN 'head'
      |            WHEN lg.avg_surprisal <= c2.cut2 THEN 'middle'
      |            ELSE 'tail' END AS bucket,
      |       lg.avg_surprisal <= c2.cut2 AS keep
      |FROM lg JOIN c1 USING (lang) JOIN c2 USING (lang)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    TextAnalysis.perplexityBuckets(docs, "text", "doc_id", "lang",
      refCorpus = Some(docs.where(col("doc_id") % 2 === 0)))
      .orderBy("doc_id")
  }


  // Per-source quality calibration: keep each source's exact top-30% by
  // quality score. The cutoff is an order statistic computed over the
  // per-source score HISTOGRAM (distinct rounded scores), never a
  // corpus-cardinality window — ties at the cutoff all kept.
  register(
    "t26_quality_calibration",
    """WITH scored AS (
      |  SELECT doc_id, source, round(
      |    greatest(0.0,
      |      least(length(text) / 500.0, 1.0) * 0.4 +
      |      least((len(list_filter(string_split_regex(lower(text), '\s+'),
      |              x -> x IN ('the','a','of','and','to','in'))) ::DOUBLE /
      |             greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
      |              x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |      (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |                   greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6) AS quality
      |  FROM documents),
      |hist AS (SELECT source, quality, count(*) AS n FROM scored GROUP BY 1, 2),
      |cum AS (SELECT source, quality,
      |        sum(n) OVER (PARTITION BY source ORDER BY quality DESC) AS cum FROM hist),
      |tot AS (SELECT source, sum(n) AS total FROM hist GROUP BY 1),
      |cut AS (SELECT c.source, max(c.quality) AS cutoff
      |        FROM cum c JOIN tot t ON c.source = t.source
      |        WHERE c.cum >= ceil(t.total * 0.3) GROUP BY 1)
      |SELECT s.doc_id, s.source, s.quality
      |FROM scored s JOIN cut ON s.source = cut.source
      |WHERE s.quality >= cut.cutoff ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.qualityCalibration(t(s, dir, "documents"), keepFraction = 0.3)
      .orderBy("doc_id")
  }


  // Token-budget corpus assembly: per-source budgets consumed in
  // deterministic md5(id) order — kept iff the running token sum including
  // the doc still fits. The Spark side is the two-level (shard-prefix)
  // exact prefix sum; the oracle's single running sum is the same order
  // because the shard key is a PREFIX of the hash.
  register(
    "t27_token_budget_mix",
    """WITH base AS (
      |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
      |         CAST(len(list_filter(string_split_regex(text, '\s+'),
      |              x -> x != '')) AS BIGINT) AS tokens,
      |         CASE source WHEN 'src0' THEN 800 WHEN 'src3' THEN 900
      |                     WHEN 'src7' THEN 500 END AS b
      |  FROM documents),
      |runs AS (
      |  SELECT doc_id, source, tokens, b,
      |         sum(tokens) OVER (PARTITION BY source ORDER BY h) AS cum
      |  FROM base WHERE b IS NOT NULL)
      |SELECT doc_id, source, tokens FROM runs WHERE cum <= b
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.tokenBudgetAssemble(t(s, dir, "documents"),
      budgets = Map("src0" -> 800L, "src3" -> 900L, "src7" -> 500L))
      .orderBy("doc_id")
  }


  // Multinomial Naive Bayes classifier (fasttext-style curation gate):
  // self-supervised on the documents table with `lang` as the class —
  // the model is three aggregate tables, prediction a per-doc argmax.
  // Scores round to 6 dp after the per-(doc,class) sum (t12 pattern);
  // argmax tie-breaks on the label so both engines agree.
  register(
    "t28_nb_classifier",
    """WITH toks AS (
      |  SELECT doc_id, lang AS lbl,
      |         unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents),
      |tc AS (SELECT lbl, tok, count(*) AS nwc FROM toks GROUP BY lbl, tok),
      |ct AS (SELECT lbl, CAST(sum(nwc) AS DOUBLE) AS nc FROM tc GROUP BY lbl),
      |v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM tc),
      |pri AS (SELECT lang AS lbl, count(*) AS docs FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS DOUBLE) AS totdocs FROM documents),
      |cs AS (SELECT pri.lbl, ct.nc, v.v,
      |              ln(CAST(pri.docs AS DOUBLE) / tot.totdocs) AS prior
      |       FROM pri JOIN ct USING (lbl) CROSS JOIN v CROSS JOIN tot),
      |dt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
      |scored AS (
      |  SELECT dt.doc_id, cs.lbl,
      |         round(cs.prior + sum(dt.c *
      |           ln((coalesce(CAST(tc.nwc AS DOUBLE), 0.0) + 1.0) /
      |              (cs.nc + 1.0 * cs.v))), 6) AS score
      |  FROM dt CROSS JOIN cs
      |       LEFT JOIN tc ON tc.tok = dt.tok AND tc.lbl = cs.lbl
      |  GROUP BY dt.doc_id, cs.lbl, cs.prior),
      |ranked AS (
      |  SELECT doc_id, lbl, score,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY score DESC, lbl) AS rn
      |  FROM scored)
      |SELECT r.doc_id, r.lbl AS predicted, r.score,
      |       (r.lbl = d.lang) AS correct
      |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
      |WHERE rn = 1 ORDER BY r.doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.naiveBayesClassify(t(s, dir, "documents"), "text", "doc_id",
      "lang")
      .orderBy("doc_id")
  }


  // Sketch percentiles with a hash-pinned rank-error bound (the q16b
  // construction for order statistics): per-source GK-sketch median of
  // token counts, claimed within ±2/accuracy rank error of the exact
  // order statistics; the oracle computes the exact interpolated median
  // (bit-identical on integers) and folds the claim constant-TRUE.
  register(
    "t30_approx_quantile_bound",
    """SELECT source, count(*) AS n,
      |  round(quantile_cont(CAST(len(list_filter(
      |    string_split_regex(text, '\s+'), x -> x != '')) AS BIGINT),
      |    0.5), 6) AS exact_p50,
      |  TRUE AS approx_within_eps
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    TextAnalysis.lengthQuantileSketchBound(t(s, dir, "documents"), "text",
      "source", q = 0.5, accuracy = 100, margin = 2.0)
      .orderBy("source")
  }


  // Misra–Gries heavy hitters with the sketch guarantee hash-pinned
  // (the q16b construction): the custom TypedImperativeAggregate
  // summarizes the token stream with k=64 counters (partial-aggregated —
  // only k-entry sketches cross the exchange, never the vocabulary), and
  // the row claims the MG theorem held on this corpus: every token with
  // exact frequency > n/65 is present in the sketch, no estimate
  // overcounts, and no estimate undercounts by more than n/65. The
  // sketch's tail below the guarantee line is stream-order dependent, so
  // the pinned row is the order-independent guarantee plus the exact
  // heavy-hitter count, which DuckDB recomputes exactly.
  register(
    "t31_heavy_hitters_bound",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                x -> x != '')) AS tok
      |  FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks)
      |SELECT CAST((SELECT count(*) FROM c, n
      |             WHERE CAST(cnt AS DOUBLE) > n / 65.0) AS BIGINT) AS heavy_count,
      |       TRUE AS bound_met""".stripMargin) { (s, dir) =>
    val k = 64
    val toks = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
    val sketch = toks.agg(
      graft.functions.MisraGriesAgg.misra_gries(col("tok"), k).as("hh"))
    val tot = toks.agg(count(lit(1)).cast("double").as("n"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    exact.crossJoin(broadcast(tot))
      .where(col("cnt").cast("double") > col("n") / (k + 1))
      .crossJoin(broadcast(sketch))
      .withColumn("__m",
        filter(col("hh"), x => x.getField("item") === col("tok")))
      .withColumn("__est",
        when(size(col("__m")) === 1, element_at(col("__m"), 1).getField("est")))
      .agg(
        count(lit(1)).cast("long").as("heavy_count"),
        // empty heavy set → vacuous-true on both engines (ADVICE r8)
        coalesce(bool_and(col("__est").isNotNull &&
          col("__est") <= col("cnt") &&
          (col("cnt") - col("__est")).cast("double") <= col("n") / (k + 1)),
          lit(true)).as("bound_met"))
  }


  // Count-Min sketch with the guarantee hash-pinned (the t31
  // construction): the custom TypedImperativeAggregate folds the token
  // stream into a 4×8192 counter array (linear — partial-aggregated
  // map-side, only sketches cross the exchange), the Column-side
  // cm_estimate reads it back with pure built-in functions, and the row
  // claims the CM theorem held on this corpus for every token with exact
  // count >= 50: estimates never undercount, and overcount stays under
  // the measured envelope (see floor comment). DuckDB recomputes the
  // exact queried-token count and constant-folds the claims TRUE.
  register(
    "t34_count_min_bound",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                x -> x != '')) AS tok
      |  FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
      |SELECT CAST((SELECT count(*) FROM c WHERE cnt >= 50) AS BIGINT)
      |         AS n_queried,
      |       TRUE AS never_undercounts, TRUE AS within_bound""".stripMargin) { (s, dir) =>
    val depth = 4; val width = 8192
    val toks = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
    val sketch = toks.agg(
      graft.functions.CountMinAgg.count_min(col("tok"), depth, width).as("cm"))
    val tot = toks.agg(count(lit(1)).cast("double").as("n"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 50)
    exact.crossJoin(broadcast(sketch)).crossJoin(broadcast(tot))
      .withColumn("__est", graft.functions.CountMinAgg
        .cm_estimate(col("cm"), col("tok"), depth, width))
      .agg(
        count(lit(1)).cast("long").as("n_queried"),
        coalesce(bool_and(col("__est") >= col("cnt")), lit(true))
          .as("never_undercounts"),
        // measured max overcount is 0 at sf0.01 AND sf0.1 (few hundred
        // distinct tokens vs width 8192 — min-over-4-rows kills the rare
        // collisions); pin the textbook ε = 2n/w envelope, which leaves
        // the full theorem margin against data drift
        coalesce(bool_and((col("__est") - col("cnt")).cast("double") <=
          lit(2.0) * col("n") / width), lit(true)).as("within_bound"))
  }


  // PMI collocation mining (Church & Hanks 1990): top-30 adjacent pairs
  // by pointwise mutual information, pair count >= 5. Per-pair arithmetic
  // only (no cross-pair float sums), identical expression nesting both
  // engines, ties broken on (w1, w2).
  register(
    "t29_pmi_collocations",
    """WITH w AS (
      |  SELECT list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |uni AS (SELECT tok, count(*) AS n
      |        FROM (SELECT unnest(toks) AS tok FROM w) GROUP BY tok),
      |bg AS (
      |  SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS pair_count FROM (
      |    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS b
      |    FROM w WHERE len(toks) >= 2) GROUP BY 1, 2),
      |tot AS (SELECT (SELECT CAST(sum(n) AS DOUBLE) FROM uni) AS nt,
      |               (SELECT CAST(sum(pair_count) AS DOUBLE) FROM bg) AS np)
      |SELECT bg.w1, bg.w2, pair_count,
      |       round(ln((CAST(pair_count AS DOUBLE) / np) /
      |                ((CAST(u1.n AS DOUBLE) / nt) *
      |                 (CAST(u2.n AS DOUBLE) / nt))), 6) AS pmi
      |FROM bg JOIN uni u1 ON u1.tok = bg.w1
      |        JOIN uni u2 ON u2.tok = bg.w2, tot
      |WHERE pair_count >= 5
      |ORDER BY pmi DESC, bg.w1, bg.w2 LIMIT 30""".stripMargin) { (s, dir) =>
    TextAnalysis.pmiCollocations(t(s, dir, "documents"), "text", k = 30,
      minCount = 5L)
  }


  // Deterministic train/val/test split: md5-interval assignment
  // (0.8/0.1/0.1) — reproducible across engines, runs, and cluster sizes.
  register(
    "t23_split_assign",
    """SELECT doc_id,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
      |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.splitAssign(t(s, dir, "documents"), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split")
      .orderBy("doc_id")
  }


  // Token-bounded chunking with overlap (context-window prep): chunk i
  // covers words [i*48, i*48+64), every word covered, zero shuffle.
  register(
    "t5_chunking",
    """WITH w AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(text, '\s+'), x -> x != '') AS words
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, words,
      |         unnest(generate_series(0, greatest(len(words) - 17, 0) // 48)) AS chunk_idx
      |  FROM w)
      |SELECT doc_id, chunk_idx,
      |       array_to_string(list_slice(words, chunk_idx*48 + 1, chunk_idx*48 + 64), ' ')
      |         AS chunk_text,
      |       least(len(words) - chunk_idx*48, 64) AS chunk_words
      |FROM c""".stripMargin) { (s, dir) =>
    TextAnalysis.chunkDocuments(t(s, dir, "documents"), "text", "doc_id",
      chunkWords = 64, overlapWords = 16)
  }


  // Text analysis: token counts (whitespace + BPE-ish), punctuation ratio.
  register(
    "t1_token_counts",
    """SELECT doc_id,
      |  len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS n_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"))
      .orderBy("doc_id")
  }


  // Quality scoring: length/stopword/punctuation composite.
  register(
    "t2_quality_score",
    """SELECT doc_id, round(
      |  greatest(0.0,
      |    least(length(text) / 500.0, 1.0) * 0.4 +
      |    least((len(list_filter(string_split_regex(lower(text), '\s+'),
      |            x -> x IN ('the','a','of','and','to','in'))) ::DOUBLE /
      |           greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
      |            x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |    (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |                 greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.qualityScore(col("text"),
        Seq("the", "a", "of", "and", "to", "in")).as("quality"))
      .orderBy("doc_id")
  }


  // Language ID: stopword-hit argmax (leftmost wins).
  register(
    "t3_langid",
    """WITH toks AS (
      |  SELECT doc_id, list_distinct(list_filter(
      |    string_split_regex(lower(text), '\s+'), x -> x != '')) AS t
      |  FROM documents),
      |scores AS (
      |  SELECT doc_id,
      |    len(list_intersect(t, ['the','a','and','scan','join'])) AS s_en,
      |    len(list_intersect(t, ['el','la','que','datos'])) AS s_es,
      |    len(list_intersect(t, ['der','die','und','das'])) AS s_de
      |  FROM toks)
      |SELECT doc_id, CASE
      |  WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
      |  WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS langid
      |FROM scores ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.langId(col("text"), Seq(
        "en" -> Seq("the", "a", "and", "scan", "join"),
        "es" -> Seq("el", "la", "que", "datos"),
        "de" -> Seq("der", "die", "und", "das"))).as("langid"))
      .orderBy("doc_id")
  }


  // Document fingerprinting (md5 oracle path; the codegen'd polynomial
  // rolling hash is covered by PipelineOpsSpec).
  register(
    "t4_fingerprint",
    """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
  }


  // Domain extraction: per-domain reference counts (the blocklist /
  // source-mix audit). URLs are synthesized onto the corpus text so every
  // row exercises the extractor, mirroring the t6 augmentation pattern.
  register(
    "t11_url_domains",
    """WITH aug AS (
      |  SELECT 'see https://site' || CAST(doc_id % 20 AS VARCHAR) ||
      |         '.example.com/p/' || CAST(doc_id AS VARCHAR) || ' ' || text AS t
      |  FROM documents),
      |d AS (
      |  SELECT unnest(regexp_extract_all(lower(t), 'https?://([a-z0-9.-]+)', 1))
      |    AS domain
      |  FROM aug)
      |SELECT domain, count(*) AS n
      |FROM d GROUP BY domain ORDER BY domain""".stripMargin) { (s, dir) =>
    val aug = concat(lit("see https://site"), (col("doc_id") % 20).cast("string"),
      lit(".example.com/p/"), col("doc_id").cast("string"), lit(" "), col("text"))
    TextAnalysis.domainCounts(
      t(s, dir, "documents").select(aug.as("t")), "t")
      .orderBy("domain")
  }


  // Corpus vocabulary: token-frequency top-k (one pre-aggregated shuffle).
  register(
    "t10_vocab_topk",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents)
      |SELECT tok, count(*) AS n FROM toks
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 100""".stripMargin) { (s, dir) =>
    TextAnalysis.vocabularyTopK(t(s, dir, "documents"), "text", 100)
  }


  // Repetition signal: repeated-bigram fraction for quality filtering.
  register(
    "t9_repetition",
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS words
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, CASE WHEN len(words) >= 2
      |    THEN list_transform(generate_series(1, len(words) - 1),
      |                        i -> words[i] || ' ' || words[i + 1])
      |    ELSE [] END AS grams
      |  FROM w)
      |SELECT doc_id, CASE WHEN len(grams) > 0
      |  THEN round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 6)
      |  ELSE 0.0 END AS rep_frac
      |FROM g ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.repetitionFraction(col("text"), 2).as("rep_frac"))
      .orderBy("doc_id")
  }


  // PII redaction: regexp_replace chain over RE2-compatible patterns. The
  // corpus text is augmented with synthesized contact strings so every row
  // exercises all three pattern classes; counts are attributed on the
  // progressively-redacted text exactly as TextAnalysis.piiCounts does.
  register(
    "t6_pii_redact",
    """WITH aug AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |    '@example.com from 10.' || CAST(doc_id % 200 AS VARCHAR) ||
      |    '.0.1 ref ' || CAST(1234567 + doc_id AS VARCHAR) AS t
      |  FROM documents),
      |r1 AS (SELECT doc_id, t,
      |  regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
      |    '<EMAIL>', 'g') AS te FROM aug),
      |r2 AS (SELECT doc_id, t, te,
      |  regexp_replace(te, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
      |    '<IPV4>', 'g') AS ti FROM r1)
      |SELECT doc_id,
      |  regexp_replace(ti, '\b\d{7,}\b', '<NUMID>', 'g') AS redacted,
      |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
      |  len(regexp_extract_all(te, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
      |  len(regexp_extract_all(ti, '\b\d{7,}\b')) AS n_numid
      |FROM r2 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val aug = concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com from 10."), (col("doc_id") % 200).cast("string"),
      lit(".0.1 ref "), (lit(1234567) + col("doc_id")).cast("string"))
    val counts = TextAnalysis.piiCounts(aug)
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.piiRedact(aug).as("redacted"),
      counts(0)._2.as("n_email"),
      counts(1)._2.as("n_ipv4"),
      counts(2)._2.as("n_numid"))
      .orderBy("doc_id")
  }


  // Deterministic stratified sampling: md5-hex keep-threshold per stratum —
  // reproducible across engines/cluster sizes, verified bit-for-bit by the
  // oracle running the same arithmetic.
  register(
    "t7_stratified_sample",
    """SELECT doc_id, lang FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      |  CASE lang WHEN 'en' THEN '40000000' WHEN 'es' THEN '80000000'
      |            WHEN 'fr' THEN '33333333' ELSE '00000000' END
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.stratifiedHashSample(t(s, dir, "documents"), "doc_id", "lang",
      Map("en" -> 0.25, "es" -> 0.5, "fr" -> 0.2))
      .select("doc_id", "lang").orderBy("doc_id")
  }


  // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
  // k smallest deterministic exponential keys -ln(u)/w with u from the
  // md5-uniform family (13 hex chars = 52 bits, exact in a double) —
  // the oracle runs the IDENTICAL key arithmetic, so the selected id
  // set hash-compares exactly. Weight = n_chars: longer docs
  // proportionally likelier, the usual curation-mix primitive.
  register(
    "t32_weighted_sample",
    """SELECT doc_id, n_chars FROM (
      |  SELECT doc_id, n_chars,
      |    -ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'es1'),
      |                                  1, 13)) AS BIGINT) + 0.5)
      |        / 4503599627370496.0) / n_chars AS ekey
      |  FROM documents WHERE n_chars > 0
      |  ORDER BY ekey LIMIT 25)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.weightedSample(t(s, dir, "documents"), "doc_id",
        col("n_chars"), k = 25, seed = "es1")
      .select("doc_id", "n_chars").orderBy("doc_id")
  }


  // Stratified A-ES: 10 docs per language, weighted by n_chars — the
  // per-stratum window variant of t32 (rank over the same deterministic
  // exponential keys).
  register(
    "t32b_weighted_sample_per_group",
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY
      |    -ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'es2'),
      |                                  1, 13)) AS BIGINT) + 0.5)
      |        / 4503599627370496.0) / n_chars) AS rn
      |  FROM documents WHERE n_chars > 0)
      |WHERE rn <= 10 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.weightedSamplePerGroup(t(s, dir, "documents"), "doc_id",
        "lang", col("n_chars"), k = 10, seed = "es2")
      .select("doc_id", "lang").orderBy("doc_id")
  }


  // Benchmark decontamination: exact-substring containment of a broadcast
  // snippet set (the first tier of train/test-overlap filtering).
  register(
    "t8_decontaminate",
    """WITH s AS (
      |  SELECT DISTINCT substr(text, 1, 60) AS snip FROM documents
      |  WHERE doc_id % 50 = 0 AND length(text) >= 60)
      |SELECT d.doc_id, count(*) AS n_matches
      |FROM documents d JOIN s ON contains(d.text, s.snip)
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val snips = docs.where(col("doc_id") % 50 === 0 && length(col("text")) >= 60)
      .select(substring(col("text"), 1, 60).as("snip")).distinct()
    TextAnalysis.contaminatedDocs(docs, "text", "doc_id", snips, "snip")
      .orderBy("doc_id")
  }


  // N-gram-overlap decontamination: the scale path beyond t8's broadcast
  // substring scan — both sides explode to distinct 5-grams and meet in an
  // equi-join (corpus ships (doc_id, md5(gram)) only).
  register(
    "t8b_ngram_decontaminate",
    """WITH grams AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(words) >= 5
      |      THEN list_transform(generate_series(1, len(words) - 4),
      |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] ||
      |                  ' ' || words[i+3] || ' ' || words[i+4])
      |      ELSE [] END)) AS gram
      |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                                   x -> x != '') AS words
      |        FROM documents)),
      |snips AS (
      |  SELECT DISTINCT substr(text, 1, 120) AS snip FROM documents
      |  WHERE doc_id % 37 = 0 AND length(text) >= 120),
      |sgrams AS (
      |  SELECT DISTINCT unnest(list_distinct(
      |    CASE WHEN len(words) >= 5
      |      THEN list_transform(generate_series(1, len(words) - 4),
      |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] ||
      |                  ' ' || words[i+3] || ' ' || words[i+4])
      |      ELSE [] END)) AS gram
      |  FROM (SELECT list_filter(string_split_regex(lower(snip), '\s+'),
      |                           x -> x != '') AS words
      |        FROM snips))
      |SELECT g.doc_id, count(*) AS n_gram_hits
      |FROM grams g JOIN sgrams s USING (gram)
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val snips = docs.where(col("doc_id") % 37 === 0 && length(col("text")) >= 120)
      .select(substring(col("text"), 1, 120).as("snip")).distinct()
    TextAnalysis.ngramContamination(docs, "text", "doc_id", snips, "snip", n = 5)
      .orderBy("doc_id")
  }


  // Bloom-pruned n-gram decontamination: identical semantics to t8b but
  // the corpus grams probe a constant bloom (built from the snippet
  // grams, ~10 bits/item) in the scan-side filter, so only suspected
  // hits reach the exchange; the exact md5 equi-join then kills the
  // false positives. The oracle is the SAME exact ground truth — the
  // bloom is a pruning layer, not an approximation, so the row must
  // hash-match the unpruned semantics bit-for-bit.
  register(
    "t33_bloom_decontaminate",
    """WITH grams AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(words) >= 5
      |      THEN list_transform(generate_series(1, len(words) - 4),
      |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] ||
      |                  ' ' || words[i+3] || ' ' || words[i+4])
      |      ELSE [] END)) AS gram
      |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                                   x -> x != '') AS words
      |        FROM documents)),
      |snips AS (
      |  SELECT DISTINCT substr(text, 1, 100) AS snip FROM documents
      |  WHERE doc_id % 41 = 0 AND length(text) >= 100),
      |sgrams AS (
      |  SELECT DISTINCT unnest(list_distinct(
      |    CASE WHEN len(words) >= 5
      |      THEN list_transform(generate_series(1, len(words) - 4),
      |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] ||
      |                  ' ' || words[i+3] || ' ' || words[i+4])
      |      ELSE [] END)) AS gram
      |  FROM (SELECT list_filter(string_split_regex(lower(snip), '\s+'),
      |                           x -> x != '') AS words
      |        FROM snips))
      |SELECT g.doc_id, count(*) AS n_gram_hits
      |FROM grams g JOIN sgrams s USING (gram)
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val snips = docs.where(col("doc_id") % 41 === 0 && length(col("text")) >= 100)
      .select(substring(col("text"), 1, 100).as("snip")).distinct()
    TextAnalysis.ngramContaminationBloom(docs, "text", "doc_id", snips, "snip",
        n = 5)
      .orderBy("doc_id")
  }


  // Unigram-LM surprisal (perplexity-proxy quality filter): frequencies
  // trained on the corpus itself, docs scored by mean -ln p(token).
  register(
    "t12_unigram_surprisal",
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                                    x -> x != '')) AS tok
      |  FROM documents),
      |dc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
      |freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM freq)
      |SELECT dc.doc_id, CAST(sum(dc.c) AS BIGINT) AS n_tokens,
      |       round(sum(dc.c * -ln(freq.n / tot.total)) / sum(dc.c), 6)
      |         AS avg_surprisal
      |FROM dc JOIN freq USING (tok), tot
      |GROUP BY dc.doc_id ORDER BY dc.doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.unigramSurprisal(t(s, dir, "documents"), "text", "doc_id")
      .orderBy("doc_id")
  }

  // Unicode script profile + homoglyph detection. The corpus is ASCII, so
  // the construction plants the signals deterministically in BOTH engines:
  // doc_id % 5 = 0 swaps every 'a' for Cyrillic U+0430 (the confusable-
  // substitution attack — every such token goes MIXED-script), 1 swaps
  // 'o' for Greek omicron, 2 appends a Han run, 3 appends pure-Cyrillic
  // TOKENS (single-script — the negative control: suspicious stays
  // false), else untouched. Script classes are Java \p{IsX} on the
  // engine and RE2 \p{X} in the oracle — the same Unicode property.
  register(
    "t82_script_mix",
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 5 AS INT)
      |      WHEN 0 THEN regexp_replace(text, 'a', 'а', 'g')
      |      WHEN 1 THEN regexp_replace(text, 'o', 'ο', 'g')
      |      WHEN 2 THEN text || ' 中文段落'
      |      WHEN 3 THEN text || ' привет мир'
      |      ELSE text END AS tx
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(tx, '\p{Latin}')) AS BIGINT) AS latin_chars,
      |  CAST(len(regexp_extract_all(tx, '\p{Cyrillic}')) AS BIGINT) AS cyrillic_chars,
      |  CAST(len(regexp_extract_all(tx, '\p{Greek}')) AS BIGINT) AS greek_chars,
      |  CAST(len(regexp_extract_all(tx, '\p{Han}')) AS BIGINT) AS han_chars,
      |  CAST(len(list_filter(list_filter(string_split_regex(tx, '\s+'), x -> x != ''),
      |    t -> regexp_matches(t, '\p{Latin}')
      |         AND regexp_matches(t, '[\p{Cyrillic}\p{Greek}]'))) AS BIGINT)
      |    AS mixed_tokens,
      |  len(list_filter(list_filter(string_split_regex(tx, '\s+'), x -> x != ''),
      |    t -> regexp_matches(t, '\p{Latin}')
      |         AND regexp_matches(t, '[\p{Cyrillic}\p{Greek}]'))) > 0
      |    AS suspicious
      |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val planted = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        regexp_replace(col("text"), "a", "а"))
        .when(col("doc_id") % 5 === 1,
          regexp_replace(col("text"), "o", "ο"))
        .when(col("doc_id") % 5 === 2,
          concat(col("text"), lit(" 中文段落")))
        .when(col("doc_id") % 5 === 3,
          concat(col("text"),
            lit(" привет мир")))
        .otherwise(col("text")).as("text"))
    TextAnalysis.scriptProfile(planted, "text", "doc_id").orderBy("doc_id")
  }

  // HTML boilerplate extraction + link density (jusText/boilerpipe
  // signal). The construction wraps each doc in one of three page shapes
  // — content page (one small anchor), nav-heavy chrome (5 repeated link
  // items — high density), entity-laden page (decode path) — identically
  // in both engines; strip/decode/density then hash-compare end to end.
  register(
    "t83_link_density",
    s"""WITH h AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN '<html><body><p>' || text || '</p><a href="/next">next page</a></body></html>'
      |      WHEN 1 THEN '<ul>' || repeat('<li><a href="/x">section link text here</a></li>', 5) || '</ul><p>' || text || '</p>'
      |      ELSE '<p>A &amp; B &lt;tagless&gt; &quot;q&quot;</p><a href="#">&#39;tick&#39; anchor</a><p>' || text || '</p>' END AS html
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(html,
      |      '(?is)<script(\\s[^>]*)?>.*?</script>', '', 'g'),
      |      '(?is)<style(\\s[^>]*)?>.*?</style>', '', 'g') AS content,
      |    html
      |  FROM h),
      |x AS (
      |  SELECT doc_id,
      |    ${TextAnalysis.entityDecodeSql("regexp_replace(content, '<[^>]*>', '', 'g')")} AS text,
      |    coalesce(list_sum(list_transform(
      |      regexp_extract_all(content, '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1),
      |      b -> length(${TextAnalysis.entityDecodeSql("regexp_replace(b, '<[^>]*>', '', 'g')")}))), 0) AS link_chars,
      |    CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS tag_count
      |  FROM c)
      |SELECT doc_id, CAST(length(text) AS BIGINT) AS text_chars,
      |       CAST(link_chars AS BIGINT) AS link_chars, tag_count,
      |       CASE WHEN length(text) > 0
      |            THEN floor(CAST(link_chars AS DOUBLE) * 1000000.0 /
      |                       length(text) + 0.5) / 1000000.0 END AS link_density,
      |       text
      |FROM x ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val html = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(lit("<html><body><p>"), col("text"),
          lit("</p><a href=\"/next\">next page</a></body></html>")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("<ul>"),
            repeat(lit("<li><a href=\"/x\">section link text here</a></li>"), 5),
            lit("</ul><p>"), col("text"), lit("</p>")))
        .otherwise(
          concat(lit("<p>A &amp; B &lt;tagless&gt; &quot;q&quot;</p>" +
            "<a href=\"#\">&#39;tick&#39; anchor</a><p>"), col("text"),
            lit("</p>"))).as("html"))
    TextAnalysis.htmlExtract(html, "html", "doc_id").orderBy("doc_id")
  }

  // ---- jusText block classification (t88/t88b) -------------------------
  // Planted paragraph constants for the context-promotion branches:
  // GOOD is 201 chars at stop density 0.405 (> lengthHigh and >=
  // stopwordsHigh -> context-free good); NEAR is 122 chars at 0.056
  // (in [stopwordsLow, stopwordsHigh) -> near_good) — so residue-3
  // pages ALWAYS exercise near_good-next-to-good promotion, and the
  // short <h4> after them exercises the short rule with a good
  // preceding neighbor. Residue 2 puts a short header between two
  // copies of the body, so short->good fires whenever the body
  // classifies good. Thresholds (0.04/0.08) are the paper's structure
  // scaled to the 6-word demo stoplist (corpus stop density averages
  // 0.066 against it; the paper's 0.30/0.32 assume a full stoplist).
  private[graft] val justextGoodPara: String =
    "the quick brown fox jumps over the lazy dog and runs to a shaded " +
      "hollow in the woods while the wind keeps a steady measure of time " +
      "and the river bends to a quiet pool of light in the late afternoon sun"
  private[graft] val justextNearPara: String =
    "compilers emit scans filters joins windows buffers spill partitions " +
      "shuffle hash probe build rows columns the vector batch"

  /** Four page shapes: nav-heavy chrome, header+code page, short header
    * between two content paragraphs, planted good/near-good run.
    * `bodyIn` is the raw body column (t88 wraps the documents text; p12
    * wraps the WARC-round-tripped bodies). Shared with the p12 composite
    * so both engines provably build the same pages. */
  private[graft] def justextPages(docs: DataFrame,
      bodyIn: Column = col("text")): DataFrame = {
    val body = regexp_replace(bodyIn, "\\s+", " ")
    docs.select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(lit("<div><ul>"),
          repeat(lit("<li><a href=\"/s\">links and links</a></li>"), 4),
          lit("</ul></div><h2>Docs</h2><p>"), body,
          lit("</p><div><a href=\"/f\">footer terms</a> - " +
            "<a href=\"/p\">privacy notice</a></div>")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("<h1>Guide page</h1><p>"), body,
            lit("</p><pre>0x1f 0x2e cfg z9 q7 w3 r4 v8 k2 m6</pre>")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("<p>"), body,
            lit("</p><h3>A &amp; B &lt;x&gt; &#39;q&#x27; r&nbsp;s &#60;t&#62;</h3><p>"),
            body, lit("</p>")))
        .otherwise(concat(
          lit(s"<p>$justextGoodPara</p><p>$justextNearPara</p><h4>Notes</h4><p>"),
          body, lit("</p>"))).as("html"))
  }

  /** The page-shape CTE over a relation `rel(doc_id, <bodyExpr>)` —
    * emits `h(doc_id, html)`. */
  private[graft] def justextPagesSql(rel: String = "documents",
      bodyExpr: String = "text"): String =
    s"""h AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN '<div><ul>' || repeat('<li><a href="/s">links and links</a></li>', 4)
      |        || '</ul></div><h2>Docs</h2><p>' || regexp_replace($bodyExpr, '\\s+', ' ', 'g')
      |        || '</p><div><a href="/f">footer terms</a> - <a href="/p">privacy notice</a></div>'
      |      WHEN 1 THEN '<h1>Guide page</h1><p>' || regexp_replace($bodyExpr, '\\s+', ' ', 'g')
      |        || '</p><pre>0x1f 0x2e cfg z9 q7 w3 r4 v8 k2 m6</pre>'
      |      WHEN 2 THEN '<p>' || regexp_replace($bodyExpr, '\\s+', ' ', 'g')
      |        || '</p><h3>A &amp; B &lt;x&gt; &#39;q&#x27; r&nbsp;s &#60;t&#62;</h3><p>' || regexp_replace($bodyExpr, '\\s+', ' ', 'g') || '</p>'
      |      ELSE '<p>$justextGoodPara</p>'
      |        || '<p>$justextNearPara</p>'
      |        || '<h4>Notes</h4><p>' || regexp_replace($bodyExpr, '\\s+', ' ', 'g') || '</p>' END AS html
      |  FROM $rel)""".stripMargin

  /** Segment -> per-block metrics -> context-free class -> the paper's
    * two-stage context pass, the identical algebra to
    * TextAnalysis.justextBlocks (entity decode chain shared via
    * [[graft.pipeline.TextAnalysis.entityDecodeSql]]). */
  private[graft] val justextBlocksSql: String =
    s"""seg AS (
      |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(html,
      |    '(?is)<script(\\s[^>]*)?>.*?</script>', '', 'g'),
      |    '(?is)<style(\\s[^>]*)?>.*?</style>', '', 'g'),
      |    '(?i)</?(p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|blockquote|pre|section|article|header|footer|nav|aside|form|fieldset|br|hr)(\\s[^>]*)?/?>', chr(10), 'g') AS segd
      |  FROM h),
      |blk AS (SELECT doc_id, unnest(string_split(segd, chr(10))) AS rawb,
      |               CAST(generate_subscripts(string_split(segd, chr(10)), 1) AS BIGINT) - 1 AS pos
      |        FROM seg),
      |vis AS (SELECT doc_id, pos,
      |  trim(${TextAnalysis.entityDecodeSql("regexp_replace(rawb, '<[^>]*>', '', 'g')")}) AS text,
      |  coalesce(list_sum(list_transform(
      |    regexp_extract_all(rawb, '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1),
      |    x -> length(${TextAnalysis.entityDecodeSql("regexp_replace(x, '<[^>]*>', '', 'g')")}))), 0) AS lc
      |  FROM blk),
      |sc AS (SELECT doc_id, pos, text, CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(lc AS DOUBLE) / length(text) AS ld,
      |  len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != ''),
      |      t -> t IN ('the','a','of','and','to','in')))::DOUBLE /
      |    greatest(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')), 1) AS sd
      |  FROM vis WHERE length(text) > 0),
      |cf AS (SELECT *, CASE WHEN ld > 0.2 THEN 'bad'
      |    WHEN n_chars < 70 THEN 'short'
      |    WHEN sd >= 0.08 THEN CASE WHEN n_chars > 200 THEN 'good' ELSE 'near_good' END
      |    WHEN sd >= 0.04 THEN 'near_good'
      |    ELSE 'bad' END AS cf_class FROM sc),
      |ctx AS (SELECT *,
      |  coalesce(last_value(CASE WHEN cf_class IN ('good','bad') THEN cf_class END IGNORE NULLS)
      |    OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'bad') AS prev_cf,
      |  coalesce(first_value(CASE WHEN cf_class IN ('good','bad') THEN cf_class END IGNORE NULLS)
      |    OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 'bad') AS next_cf,
      |  coalesce(last_value(CASE WHEN cf_class <> 'short' THEN cf_class END IGNORE NULLS)
      |    OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'bad') AS prev_raw,
      |  coalesce(first_value(CASE WHEN cf_class <> 'short' THEN cf_class END IGNORE NULLS)
      |    OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 'bad') AS next_raw,
      |  row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS block_idx
      |  FROM cf),
      |upd AS (SELECT *,
      |  CASE WHEN cf_class IN ('good','bad') THEN cf_class
      |       WHEN cf_class = 'short' THEN
      |         CASE WHEN prev_cf = 'good' AND next_cf = 'good' THEN 'good'
      |              WHEN prev_cf = 'bad' AND next_cf = 'bad' THEN 'bad'
      |              WHEN (prev_cf = 'bad' AND prev_raw = 'near_good')
      |                OR (next_cf = 'bad' AND next_raw = 'near_good') THEN 'good'
      |              ELSE 'bad' END
      |       END AS updc
      |  FROM ctx),
      |fin AS (SELECT doc_id, CAST(block_idx AS BIGINT) AS block_idx, n_chars,
      |  floor(ld * 1000000.0 + 0.5) / 1000000.0 AS link_density,
      |  floor(sd * 1000000.0 + 0.5) / 1000000.0 AS stop_density,
      |  cf_class,
      |  CASE WHEN updc IS NOT NULL THEN updc
      |       WHEN coalesce(last_value(updc IGNORE NULLS)
      |              OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'bad') = 'bad'
      |        AND coalesce(first_value(updc IGNORE NULLS)
      |              OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 'bad') = 'bad'
      |       THEN 'bad' ELSE 'good' END AS block_class,
      |  text
      |  FROM upd)""".stripMargin

  // jusText block-level boilerplate classification (Pomikálek 2011):
  // segment at block tags, score link/stopword density + length per
  // block, then the paper's TWO-STAGE context revision (r15: shorts
  // resolve first against good/bad neighbors skipping undecided blocks,
  // with the near_good-shielded mixed case promoting; near_goods then
  // resolve against the UPDATED classes). The four page shapes +
  // planted paragraph constants keep every (cf_class -> block_class)
  // transition organically covered. Hash-proven per-block down to the
  // visible text bytes, numeric character references included.
  register(
    "t88_justext_blocks",
    // plain concatenation: a second stripMargin would eat the leading
    // pipe of the inner SQL's '||' continuation lines
    "WITH " + justextPagesSql() + ",\n" + justextBlocksSql +
      "\nSELECT * FROM fin ORDER BY doc_id, block_idx") { (s, dir) =>
    TextAnalysis.justextBlocks(justextPages(t(s, dir, "documents")),
        "html", "doc_id", Seq("the", "a", "of", "and", "to", "in"),
        stopwordsLow = 0.04, stopwordsHigh = 0.08)
      .orderBy("doc_id", "block_idx")
  }

  // The extracted-content deliverable: good blocks reassembled in block
  // order per page; chrome-only pages come back with empty content
  // rather than vanishing. Same block algebra, one doc-keyed aggregate.
  register(
    "t88b_justext_content",
    "WITH " + justextPagesSql() + ",\n" + justextBlocksSql + "\n" +
      """SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
        |       CAST(coalesce(count(*) FILTER (WHERE block_class = 'good'), 0) AS BIGINT) AS n_good,
        |       coalesce(string_agg(text, chr(10) ORDER BY block_idx)
        |                  FILTER (WHERE block_class = 'good'), '') AS content,
        |       CAST(length(coalesce(string_agg(text, chr(10) ORDER BY block_idx)
        |                  FILTER (WHERE block_class = 'good'), '')) AS BIGINT) AS content_chars
        |FROM fin GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.justextContent(
      TextAnalysis.justextBlocks(justextPages(t(s, dir, "documents")),
        "html", "doc_id", Seq("the", "a", "of", "and", "to", "in"),
        stopwordsLow = 0.04, stopwordsHigh = 0.08))
      .orderBy("doc_id")
  }

  // Site-template fingerprint: md5 over the ordered lowercased tag-name
  // sequence clusters a crawl by CMS template. Three planted behaviors:
  // residue 0 varies attributes AND text per doc yet lands in ONE
  // cluster (structure invariance); residue 1 varies the <li> repeat
  // count by doc_id % 4 -> four structure-distinct clusters; residue 2
  // is byte-constant chrome -> one cluster. template_id = min doc_id.
  register(
    "t89_template_fingerprint",
    """WITH h AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN '<html><head><title>T</title></head><body><div class="x'
      |        || CAST(doc_id AS VARCHAR) || '"><p>'
      |        || regexp_replace(text, '\s+', ' ', 'g') || '</p></div></body></html>'
      |      WHEN 1 THEN '<body><ul>'
      |        || repeat('<li><a href="/a">x</a></li>', 1 + CAST(doc_id % 4 AS INT))
      |        || '</ul><p>' || regexp_replace(text, '\s+', ' ', 'g') || '</p></body>'
      |      ELSE '<article><h1>t</h1><p>s</p><p>s</p></article>' END AS html
      |  FROM documents),
      |tg AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_transform(
      |      regexp_extract_all(html, '</?([A-Za-z][A-Za-z0-9]*)', 1),
      |      t -> lower(t)), ',')) AS tpl_hash,
      |    CAST(len(regexp_extract_all(html, '</?([A-Za-z][A-Za-z0-9]*)', 1)) AS BIGINT) AS n_tags
      |  FROM h),
      |cl AS (SELECT tpl_hash, min(doc_id) AS template_id,
      |              CAST(count(*) AS BIGINT) AS template_size
      |       FROM tg GROUP BY 1)
      |SELECT tg.doc_id, tg.tpl_hash, cl.template_id, cl.template_size, tg.n_tags
      |FROM tg JOIN cl USING (tpl_hash) ORDER BY tg.doc_id""".stripMargin) { (s, dir) =>
    val body = regexp_replace(col("text"), "\\s+", " ")
    val pages = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(lit("<html><head><title>T</title></head><body><div class=\"x"),
          col("doc_id").cast("string"), lit("\"><p>"), body,
          lit("</p></div></body></html>")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("<body><ul>"),
            array_join(array_repeat(lit("<li><a href=\"/a\">x</a></li>"),
              (lit(1) + (col("doc_id") % 4)).cast("int")), ""),
            lit("</ul><p>"), body, lit("</p></body>")))
        .otherwise(lit("<article><h1>t</h1><p>s</p><p>s</p></article>"))
        .as("html"))
    TextAnalysis.templateFingerprint(pages, "html", "doc_id")
      .orderBy("doc_id")
  }


  // C4 line filters + CCNet/FineWeb corpus-wide line dedup. The planted
  // page shape gives every branch a worked case: a content line (first 8
  // tokens + terminal punct — dedups only when docs share an opening), a
  // boilerplate line shared by all even docs (exactly ONE survivor
  // corpus-wide), two filter-failing lines (too short / no terminal
  // punct), a per-doc unique line (always kept), and lorem-ipsum /
  // brace lines tripping the page verdict. Exact set logic over line
  // hashes, first-occurrence election by (doc_id, idx) — hash-proven
  // down to the reassembled clean_text bytes.
  register(
    "t85_c4_line_clean",
    """WITH raw AS (
      |  SELECT doc_id,
      |    array_to_string(list_filter(string_split_regex(text, '\s+'),
      |                                x -> x != '')[1:8], ' ') || ' end.'
      |    || CASE WHEN doc_id % 2 = 0
      |            THEN chr(10) || 'subscribe to our newsletter today.' ELSE '' END
      |    || chr(10) || 'read more'
      |    || chr(10) || 'no terminal punctuation here'
      |    || chr(10) || 'document ' || doc_id || ' summary ends here.'
      |    || CASE WHEN doc_id % 97 = 0
      |            THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
      |    || CASE WHEN doc_id % 89 = 0
      |            THEN chr(10) || 'config { tuned }.' ELSE '' END AS text
      |  FROM documents),
      |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
      |             CAST(generate_subscripts(string_split(text, chr(10)), 1)
      |               AS BIGINT) - 1 AS idx
      |      FROM raw),
      |p AS (SELECT doc_id, idx, trim(line) AS tl,
      |             regexp_matches(trim(line), '[.!?]["'']?$') AND
      |               len(list_filter(string_split_regex(trim(line), '\s+'),
      |                               x -> x != '')) >= 3 AS pass
      |      FROM l),
      |occ AS (SELECT doc_id, idx, tl, md5(tl) AS lh FROM p WHERE pass),
      |k AS (SELECT doc_id, idx, tl,
      |        row_number() OVER (PARTITION BY lh ORDER BY doc_id, idx) AS rn
      |      FROM occ),
      |kept AS (SELECT doc_id, idx, tl FROM k WHERE rn = 1),
      |agg AS (SELECT doc_id,
      |          array_to_string(list(tl ORDER BY idx), chr(10)) AS clean_text,
      |          count(*) AS n_kept
      |        FROM kept GROUP BY doc_id),
      |stats AS (SELECT doc_id, count(*) AS n_lines,
      |            sum(CASE WHEN pass THEN 1 ELSE 0 END) AS n_pass
      |          FROM p GROUP BY doc_id)
      |SELECT r.doc_id,
      |       coalesce(a.clean_text, '') AS clean_text,
      |       CAST(s.n_lines AS BIGINT) AS n_lines,
      |       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
      |       CAST(s.n_lines - s.n_pass AS BIGINT) AS n_drop_filter,
      |       CAST(s.n_pass - coalesce(a.n_kept, 0) AS BIGINT) AS n_drop_dup,
      |       (coalesce(a.n_kept, 0) >= 3
      |          AND NOT contains(lower(r.text), 'lorem ipsum')
      |          AND NOT contains(r.text, '{')) AS keep_doc
      |FROM raw r JOIN stats s USING (doc_id) LEFT JOIN agg a USING (doc_id)
      |ORDER BY r.doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.c4LineClean(c4Pages(t(s, dir, "documents")), "text", "doc_id")
      .orderBy("doc_id")
  }

  /** The t85/t86 planted multi-line page construction (mirrored verbatim
    * in both oracles' `raw` CTE). */
  private def c4Pages(d: org.apache.spark.sql.DataFrame) =
    d.select(col("doc_id"), concat(
      concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 8)),
      lit(" end."),
      when(col("doc_id") % 2 === 0,
        concat(lit("\nsubscribe to our newsletter today."))).otherwise(lit("")),
      lit("\nread more"),
      lit("\nno terminal punctuation here"),
      concat(lit("\ndocument "), col("doc_id"), lit(" summary ends here.")),
      when(col("doc_id") % 97 === 0,
        lit("\nlorem ipsum dolor sit amet.")).otherwise(lit("")),
      when(col("doc_id") % 89 === 0,
        lit("\nconfig { tuned }.")).otherwise(lit(""))).as("text"))


  // The incremental tier of the line-clean pass: two batches through the
  // parquet-staged line-hash store (c4LineCleanStoreStep). The store-loop
  // asymmetry at line granularity: batch-0 docs elect among batch-0 lines
  // only; batch-1 lines lose to ANY batch-0 occurrence (the boilerplate
  // line survives once, in batch 0) and otherwise elect within batch 1.
  // Same planted page shape as t85 — hash-proven to the clean_text bytes.
  register(
    "t86_line_clean_incremental",
    """WITH raw AS (
      |  SELECT doc_id,
      |    array_to_string(list_filter(string_split_regex(text, '\s+'),
      |                                x -> x != '')[1:8], ' ') || ' end.'
      |    || CASE WHEN doc_id % 2 = 0
      |            THEN chr(10) || 'subscribe to our newsletter today.' ELSE '' END
      |    || chr(10) || 'read more'
      |    || chr(10) || 'no terminal punctuation here'
      |    || chr(10) || 'document ' || doc_id || ' summary ends here.'
      |    || CASE WHEN doc_id % 97 = 0
      |            THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
      |    || CASE WHEN doc_id % 89 = 0
      |            THEN chr(10) || 'config { tuned }.' ELSE '' END AS text
      |  FROM documents WHERE doc_id < 500),
      |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
      |             CAST(generate_subscripts(string_split(text, chr(10)), 1)
      |               AS BIGINT) - 1 AS idx
      |      FROM raw),
      |p AS (SELECT doc_id, idx, trim(line) AS tl,
      |             regexp_matches(trim(line), '[.!?]["'']?$') AND
      |               len(list_filter(string_split_regex(trim(line), '\s+'),
      |                               x -> x != '')) >= 3 AS pass
      |      FROM l),
      |occ AS (SELECT doc_id, idx, tl, md5(tl) AS lh FROM p WHERE pass),
      |k0 AS (SELECT doc_id, idx, tl,
      |         row_number() OVER (PARTITION BY lh ORDER BY doc_id, idx) AS rn
      |       FROM occ WHERE doc_id < 250),
      |b0set AS (SELECT DISTINCT lh FROM occ WHERE doc_id < 250),
      |k1 AS (SELECT o.doc_id, o.idx, o.tl,
      |         row_number() OVER (PARTITION BY o.lh ORDER BY o.doc_id, o.idx) AS rn
      |       FROM occ o ANTI JOIN b0set USING (lh)
      |       WHERE o.doc_id >= 250),
      |kept AS (SELECT doc_id, idx, tl FROM k0 WHERE rn = 1
      |         UNION ALL SELECT doc_id, idx, tl FROM k1 WHERE rn = 1),
      |agg AS (SELECT doc_id,
      |          array_to_string(list(tl ORDER BY idx), chr(10)) AS clean_text,
      |          count(*) AS n_kept
      |        FROM kept GROUP BY doc_id),
      |stats AS (SELECT doc_id, count(*) AS n_lines,
      |            sum(CASE WHEN pass THEN 1 ELSE 0 END) AS n_pass
      |          FROM p GROUP BY doc_id)
      |SELECT r.doc_id,
      |       coalesce(a.clean_text, '') AS clean_text,
      |       CAST(s.n_lines AS BIGINT) AS n_lines,
      |       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
      |       CAST(s.n_lines - s.n_pass AS BIGINT) AS n_drop_filter,
      |       CAST(s.n_pass - coalesce(a.n_kept, 0) AS BIGINT) AS n_drop_dup,
      |       (coalesce(a.n_kept, 0) >= 3
      |          AND NOT contains(lower(r.text), 'lorem ipsum')
      |          AND NOT contains(r.text, '{')) AS keep_doc
      |FROM raw r JOIN stats s USING (doc_id) LEFT JOIN agg a USING (doc_id)
      |ORDER BY r.doc_id""".stripMargin) { (s, dir) =>
    val store = scratchDir("t86_store")
    val pages = c4Pages(t(s, dir, "documents").where(col("doc_id") < 500))
    val b0 = TextAnalysis.c4LineCleanStoreStep(
      pages.where(col("doc_id") < 250), store, "text", "doc_id",
      minWords = 3, batchId = 0L)
    val b1 = TextAnalysis.c4LineCleanStoreStep(
      pages.where(col("doc_id") >= 250), store, "text", "doc_id",
      minWords = 3, batchId = 1L)
    b0.unionAll(b1).orderBy("doc_id")
  }


  // Mojibake / double-encoding artifact profile. Planted corruption by
  // id residue exercises each artifact family (accented-Latin Ã-runs,
  // curly-quote â€-runs, stray Â non-breaking spaces, U+FFFD), with the
  // clean remainder as the negative control. Exact integer counts over
  // code-point lengths in both engines — hash oracle.
  register(
    "t87_mojibake",
    """WITH c AS (
      |  SELECT doc_id, text
      |    || CASE WHEN doc_id % 5 = 0 THEN ' caffÃ© crÃ¨me' ELSE '' END
      |    || CASE WHEN doc_id % 7 = 0 THEN ' â€œquoted dash â€“ here' ELSE '' END
      |    || CASE WHEN doc_id % 11 = 0 THEN ' brokenÂ space and �' ELSE '' END
      |    AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, 'Ã[\x{80}-\x{ff}]')) AS BIGINT)
      |    AS latin1_runs,
      |  CAST(len(regexp_extract_all(text, 'â€')) AS BIGINT) AS quote_runs,
      |  CAST(len(regexp_extract_all(text, 'Â')) AS BIGINT) AS nbsp_runs,
      |  CAST(len(regexp_extract_all(text, '�')) AS BIGINT)
      |    AS replacement_chars,
      |  CASE WHEN length(text) > 0 THEN
      |    floor((len(regexp_extract_all(text, 'Ã[\x{80}-\x{ff}]'))
      |         + len(regexp_extract_all(text, 'â€'))
      |         + len(regexp_extract_all(text, 'Â'))
      |         + len(regexp_extract_all(text, '�'))) * 1000000.0
      |      / length(text) + 0.5) / 1000000.0
      |    ELSE 0.0 END AS mojibake_ratio,
      |  (len(regexp_extract_all(text, 'Ã[\x{80}-\x{ff}]'))
      |   + len(regexp_extract_all(text, 'â€'))
      |   + len(regexp_extract_all(text, 'Â'))
      |   + len(regexp_extract_all(text, '�'))) > 0 AS suspect
      |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val corrupted = t(s, dir, "documents").select(col("doc_id"), concat(
      col("text"),
      when(col("doc_id") % 5 === 0, lit(" caffÃ© crÃ¨me")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        lit(" â€œquoted dash â€“ here")).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        lit(" brokenÂ space and �")).otherwise(lit(""))).as("text"))
    TextAnalysis.mojibakeProfile(corrupted, "text", "doc_id")
      .orderBy("doc_id")
  }

  // robots.txt allow/deny verdicts (RFC 9309 longest-match, Allow wins
  // ties) — the crawl-politeness gate a corpus builder applies before
  // any fetch enters the pipeline. The fixture plants per-host policies
  // where the host digit is derived FROM the page number, so every url
  // organically exercises: prefix block (/p/<k>), longer-Allow override
  // (/p/<k>2 re-allows a subset of the blocked prefix), an empty
  // Disallow (dropped per the RFC), a case-folded directive, a comment
  // line, a non-* section that must be ignored, and the RFC 9309 §2.2.3
  // special characters: a wildcard block (/p/*4$ — any page ending in
  // 4), a LONGER wildcard Allow override (/p/1*4$ re-allows /p/1?4),
  // and an end-anchored literal (/p/9$ blocks exactly /p/9, never
  // /p/9X). Specificity = rule-path octet count, mirrored regex
  // construction in the oracle. Hash oracle over (doc_id, host, path,
  // allowed, rule_len).
  /** robots.txt parsing chain over a CTE `rb(host, body)` — emits
    * `rules(host, allow, rpath)` (the `User-agent: *` sections' non-empty
    * Allow/Disallow directives). Shared by t90 and the p12 composite. */
  private[graft] val robotsRulesSql: String =
    """ln0 AS (SELECT host, unnest(string_split(body, chr(10))) AS l0,
      |          CAST(generate_subscripts(string_split(body, chr(10)), 1) AS BIGINT) AS idx
      |        FROM rb),
      |lx AS (SELECT host, idx,
      |         lower(trim(regexp_extract(l, '^([^:]+):', 1))) AS dir,
      |         trim(regexp_extract(l, '^[^:]+:(.*)$', 1)) AS val
      |       FROM (SELECT host, idx, trim(regexp_replace(l0, '#.*$', '')) AS l
      |             FROM ln0)
      |       WHERE length(l) > 0),
      |lp AS (SELECT *,
      |         coalesce(lag(CASE WHEN dir = 'user-agent' THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY host ORDER BY idx), 0) AS prev_ua
      |       FROM lx),
      |sec AS (SELECT *,
      |          sum(CASE WHEN dir = 'user-agent' AND prev_ua = 0
      |              THEN 1 ELSE 0 END)
      |            OVER (PARTITION BY host ORDER BY idx) AS s
      |        FROM lp),
      |star AS (SELECT DISTINCT host, s FROM sec
      |         WHERE dir = 'user-agent' AND val = '*'),
      |rules AS (SELECT sec.host, sec.dir = 'allow' AS allow, sec.val AS rpath
      |          FROM sec JOIN star USING (host, s)
      |          WHERE sec.dir IN ('allow', 'disallow') AND length(sec.val) > 0)""".stripMargin

  /** RFC 9309 §2.2.3 rule-path match as DuckDB SQL — the exact algebra
    * of WebOps.robotsVerdict's predicate: literal rules (no `*`, no
    * trailing `$`) stay on `starts_with`; wildcard/anchored rules build
    * the same RE2 regex (escape metacharacters except `*`, `*` → `.*`,
    * trailing `$` → end anchor) and probe with regexp_matches. */
  private[graft] def robotsMatchSql(pathExpr: String,
      ruleExpr: String): String =
    s"""CASE WHEN $ruleExpr NOT LIKE '%*%' AND $ruleExpr NOT LIKE '%$$'
       |  THEN starts_with($pathExpr, $ruleExpr)
       |  ELSE regexp_matches($pathExpr,
       |    '^' ||
       |    regexp_replace(
       |      regexp_replace(
       |        CASE WHEN $ruleExpr LIKE '%$$'
       |             THEN substr($ruleExpr, 1, length($ruleExpr) - 1)
       |             ELSE $ruleExpr END,
       |        '([.^$$|()\\[\\]{}+?\\\\])', '\\\\\\1', 'g'),
       |      '\\*', '.*', 'g') ||
       |    CASE WHEN $ruleExpr LIKE '%$$' THEN '$$' ELSE '' END)
       |END""".stripMargin

  register(
    "t90_robots_filter",
    """WITH u AS (
      |  SELECT doc_id,
      |    'site' || ((doc_id % 150) % 7) || '.com' AS host,
      |    '/p/' || (doc_id % 150) AS path
      |  FROM documents),
      |hosts AS (SELECT DISTINCT host,
      |            CAST(regexp_extract(host, 'site([0-9]+)', 1) AS BIGINT) AS kk
      |          FROM u),
      |rb AS (SELECT host,
      |    '# crawl policy' || chr(10) ||
      |    'User-agent: megabot' || chr(10) || 'Disallow: /' || chr(10) || chr(10) ||
      |    'User-agent: *' || chr(10) ||
      |    'Disallow: /p/' || kk || chr(10) ||
      |    'Allow: /p/' || kk || '2' || chr(10) ||
      |    'Disallow:' || chr(10) ||
      |    'disallow: /q/' || chr(10) ||
      |    'Disallow: /p/*4$' || chr(10) ||
      |    'Allow: /p/1*4$' || chr(10) ||
      |    'Disallow: /p/9$' AS body
      |  FROM hosts),
      |""".stripMargin + robotsRulesSql + """,
      |cand AS (SELECT u.doc_id, u.host, u.path, r.allow, strlen(r.rpath) AS rl
      |         FROM u LEFT JOIN rules r
      |           ON r.host = u.host AND
      |""".stripMargin + robotsMatchSql("u.path", "r.rpath") + """),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |         ORDER BY rl DESC NULLS LAST, allow DESC NULLS LAST) AS rn
      |       FROM cand)
      |SELECT doc_id, host, path, coalesce(allow, TRUE) AS allowed,
      |       CAST(coalesce(rl, 0) AS BIGINT) AS rule_len
      |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val u = t(s, dir, "documents").select(col("doc_id"),
      concat(lit("site"), (col("doc_id") % 150) % 7, lit(".com")).as("host"),
      concat(lit("/p/"), col("doc_id") % 150).as("path"))
    val hosts = u.select(col("host"),
        regexp_extract(col("host"), "site([0-9]+)", 1).cast("long").as("kk"))
      .distinct()
    val body = concat(
      lit("# crawl policy\nUser-agent: megabot\nDisallow: /\n\n" +
        "User-agent: *\nDisallow: /p/"),
      col("kk"), lit("\nAllow: /p/"), col("kk"),
      lit("2\nDisallow:\ndisallow: /q/\nDisallow: /p/*4$\n" +
        "Allow: /p/1*4$\nDisallow: /p/9$"))
    val rules = WebOps.robotsRules(
      hosts.select(col("host"), body.as("body")), "host", "body")
    WebOps.robotsVerdict(u, "doc_id", "host", "path", rules,
      knownSmall = true).orderBy("doc_id")
  }

  // robots.txt non-path surface — per-host Crawl-delay (star sections
  // only, minimum across values, non-numeric dropped via null-safe
  // cast, other agents' delays ignored) and Sitemap URLs (GLOBAL per
  // the sitemaps protocol — collected from anywhere in the file,
  // sorted). Even hosts declare a fractional delay; odd hosts only the
  // unparseable one (-> null); a root sitemap sits BEFORE any section
  // and a second one inside the star section.
  register(
    "t90b_robots_extras",
    """WITH u AS (
      |  SELECT doc_id,
      |    'site' || ((doc_id % 150) % 7) || '.com' AS host,
      |    '/p/' || (doc_id % 150) AS path
      |  FROM documents),
      |hosts AS (SELECT DISTINCT host,
      |            CAST(regexp_extract(host, 'site([0-9]+)', 1) AS BIGINT) AS kk
      |          FROM u),
      |rb AS (SELECT host,
      |    '# policy' || chr(10) ||
      |    'Sitemap: https://' || host || '/sm-root.xml' || chr(10) ||
      |    'User-agent: megabot' || chr(10) ||
      |    'Crawl-delay: 99' || chr(10) || chr(10) ||
      |    'User-agent: *' || chr(10) ||
      |    'Disallow: /p/' || kk ||
      |    CASE WHEN kk % 2 = 0
      |         THEN chr(10) || 'Crawl-delay: ' || kk || '.5' ELSE '' END ||
      |    chr(10) || 'Crawl-delay: abc' || chr(10) ||
      |    'Sitemap: https://' || host || '/sm-' || kk || '.xml' AS body
      |  FROM hosts),
      |""".stripMargin + robotsRulesSql + """,
      |cd AS (SELECT sec.host, min(TRY_CAST(sec.val AS DOUBLE)) AS crawl_delay
      |       FROM sec JOIN star USING (host, s)
      |       WHERE sec.dir = 'crawl-delay' AND length(sec.val) > 0
      |       GROUP BY 1),
      |sm AS (SELECT host, count(*) AS n,
      |         array_to_string(list_sort(list(val)), ',') AS sitemaps
      |       FROM lx WHERE dir = 'sitemap' AND length(val) > 0 GROUP BY 1)
      |SELECT h.host, cd.crawl_delay,
      |       CAST(coalesce(sm.n, 0) AS BIGINT) AS n_sitemaps,
      |       coalesce(sm.sitemaps, '') AS sitemaps
      |FROM hosts h LEFT JOIN cd USING (host) LEFT JOIN sm USING (host)
      |ORDER BY host""".stripMargin) { (s, dir) =>
    val u = t(s, dir, "documents").select(
      concat(lit("site"), (col("doc_id") % 150) % 7, lit(".com")).as("host"))
    val hosts = u.select(col("host"),
        regexp_extract(col("host"), "site([0-9]+)", 1).cast("long").as("kk"))
      .distinct()
    val body = concat(
      lit("# policy\nSitemap: https://"), col("host"),
      lit("/sm-root.xml\nUser-agent: megabot\nCrawl-delay: 99\n\n" +
        "User-agent: *\nDisallow: /p/"), col("kk"),
      when(col("kk") % 2 === 0,
        concat(lit("\nCrawl-delay: "), col("kk"), lit(".5")))
        .otherwise(lit("")),
      lit("\nCrawl-delay: abc\nSitemap: https://"), col("host"),
      lit("/sm-"), col("kk"), lit(".xml"))
    WebOps.robotsExtras(hosts.select(col("host"), body.as("body")),
      "host", "body").orderBy("host")
  }

  // Sitemap XML parsing — the crawl-frontier feed t90b's sitemap URLs
  // point at: every <url> entry becomes (host, url_idx, loc, lastmod,
  // priority); loc entity-decodes (sitemap XML escapes & as &amp; —
  // residue-planted query-string locs must round-trip), loc-less
  // entries keep their position with loc = '', priority is a null-safe
  // double. Hash-proven per entry.
  register(
    "t104_sitemap_urls",
    s"""WITH sm AS (
      |  SELECT 'site' || doc_id || '.com' AS host,
      |    '<?xml version="1.0"?><urlset>'
      |    || '<url><loc>https://site' || doc_id || '.com/p/' || (doc_id % 150)
      |    || '?a=1&amp;b=2</loc><lastmod>2025-0' || (doc_id % 9 + 1)
      |    || '-01</lastmod><priority>0.' || (doc_id % 10) || '</priority></url>'
      |    || '<url><loc>https://site' || doc_id || '.com/about</loc></url>'
      |    || CASE WHEN doc_id % 4 = 0
      |            THEN '<url><lastmod>2024-01-01</lastmod></url>' ELSE '' END
      |    || '</urlset>' AS xml
      |  FROM documents),
      |e AS (SELECT host,
      |        CAST(generate_subscripts(regexp_extract_all(xml, '(?is)<url>(.*?)</url>', 1), 1) - 1 AS BIGINT) AS url_idx,
      |        unnest(regexp_extract_all(xml, '(?is)<url>(.*?)</url>', 1)) AS en
      |      FROM sm)
      |SELECT host, url_idx,
      |  ${TextAnalysis.entityDecodeSql("trim(regexp_extract(en, '(?is)<loc>(.*?)</loc>', 1))")} AS loc,
      |  trim(regexp_extract(en, '(?is)<lastmod>(.*?)</lastmod>', 1)) AS lastmod,
      |  TRY_CAST(regexp_extract(en, '(?is)<priority>(.*?)</priority>', 1) AS DOUBLE) AS priority
      |FROM e ORDER BY host, url_idx""".stripMargin) { (s, dir) =>
    val xml = concat(
      lit("<?xml version=\"1.0\"?><urlset><url><loc>https://site"),
      col("doc_id"), lit(".com/p/"), col("doc_id") % 150,
      lit("?a=1&amp;b=2</loc><lastmod>2025-0"), col("doc_id") % 9 + 1,
      lit("-01</lastmod><priority>0."), col("doc_id") % 10,
      lit("</priority></url><url><loc>https://site"), col("doc_id"),
      lit(".com/about</loc></url>"),
      when(col("doc_id") % 4 === 0,
        lit("<url><lastmod>2024-01-01</lastmod></url>")).otherwise(lit("")),
      lit("</urlset>"))
    val sm = t(s, dir, "documents").select(
      concat(lit("site"), col("doc_id"), lit(".com")).as("host"),
      xml.as("xml"))
    WebOps.sitemapUrls(sm, "host", "xml").orderBy("host", "url_idx")
  }

  // HTTP response-head parsing — ingest triage between fetch bytes and
  // the HTML pipeline: status code/reason, lowered media type, the
  // charset decode hint (case-insensitive, quoted or bare), header
  // count. Residues: CRLF 200 html+charset, 404 plain without charset,
  // LF-only 301 with an uppercase type and a QUOTED charset, and a
  // status-less garbage response (null status, empty fields — never an
  // error). Hash-proven.
  register(
    "t105_http_headers",
    """WITH rs AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN 'HTTP/1.1 200 OK' || chr(13) || chr(10)
      |        || 'Server: demo' || chr(13) || chr(10)
      |        || 'Content-Type: text/html; charset=UTF-8' || chr(13) || chr(10)
      |        || 'Content-Length: 123' || chr(13) || chr(10) || chr(13) || chr(10)
      |        || '<html>' || text
      |      WHEN 1 THEN 'HTTP/1.0 404 Not Found' || chr(13) || chr(10)
      |        || 'Content-Type: text/plain' || chr(13) || chr(10)
      |        || chr(13) || chr(10) || 'missing'
      |      WHEN 2 THEN 'HTTP/2 301 Moved Permanently' || chr(10)
      |        || 'Location: https://x.example/' || chr(10)
      |        || 'Content-Type: TEXT/HTML;charset="iso-8859-1"' || chr(10)
      |        || chr(10) || 'body'
      |      ELSE 'garbage response ' || text END AS raw
      |  FROM documents),
      |h AS (SELECT doc_id, raw,
      |        regexp_extract(raw, '(?s)^(.*?)(\r?\n\r?\n|$)', 1) AS head
      |      FROM rs),
      |c AS (SELECT doc_id, raw, head,
      |        regexp_extract(head, '(?im)^content-type:\s*([^\r\n]*)', 1) AS ct
      |      FROM h)
      |SELECT doc_id,
      |  TRY_CAST(regexp_extract(raw, '^HTTP/[0-9.]+ ([0-9]{3})', 1) AS BIGINT) AS status,
      |  trim(regexp_extract(raw, '^HTTP/[0-9.]+ [0-9]{3} ([^\r\n]*)', 1)) AS reason,
      |  lower(trim(regexp_extract(ct, '^([^;]*)', 1))) AS content_type,
      |  lower(regexp_extract(ct, '(?i)charset\s*=\s*"?([A-Za-z0-9_.:-]+)"?', 1)) AS charset,
      |  CAST(len(list_filter(string_split_regex(head, '\r?\n'),
      |    l -> regexp_matches(l, '^[A-Za-z][A-Za-z0-9-]*:'))) AS BIGINT) AS n_headers
      |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val raw = when(col("doc_id") % 4 === 0, concat(
      lit("HTTP/1.1 200 OK\r\nServer: demo\r\n" +
        "Content-Type: text/html; charset=UTF-8\r\n" +
        "Content-Length: 123\r\n\r\n<html>"), col("text")))
      .when(col("doc_id") % 4 === 1, lit(
        "HTTP/1.0 404 Not Found\r\nContent-Type: text/plain\r\n\r\nmissing"))
      .when(col("doc_id") % 4 === 2, lit(
        "HTTP/2 301 Moved Permanently\nLocation: https://x.example/\n" +
          "Content-Type: TEXT/HTML;charset=\"iso-8859-1\"\n\nbody"))
      .otherwise(concat(lit("garbage response "), col("text")))
    val rs = t(s, dir, "documents").select(col("doc_id"), raw.as("raw"))
    WebOps.httpHead(rs, "raw", "doc_id").orderBy("doc_id")
  }


  // Per-page robots directives (REP meta/header convention) — merges all
  // <meta name=robots> tags with every X-Robots-Tag response header into
  // one sorted directive list + indexability verdict ('none' expands to
  // noindex+nofollow; UA-scoped header values pass through verbatim and
  // stay non-global, pinned in-code). Completes the crawl-policy surface
  // beside t90/t101/t105. Scan-side regex in both engines.
  register(
    "t108_robots_meta",
    """WITH rs AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 6 AS INT)
      |      WHEN 1 THEN 'HTTP/1.1 200 OK' || chr(13) || chr(10)
      |        || 'X-Robots-Tag: noarchive' || chr(13) || chr(10)
      |        || chr(13) || chr(10) || 'body'
      |      WHEN 3 THEN 'HTTP/1.1 200 OK' || chr(13) || chr(10)
      |        || 'X-Robots-Tag: noindex' || chr(13) || chr(10)
      |        || 'X-Robots-Tag: nosnippet' || chr(13) || chr(10)
      |        || chr(13) || chr(10) || 'body'
      |      WHEN 4 THEN 'HTTP/1.1 200 OK' || chr(13) || chr(10)
      |        || 'X-Robots-Tag: googlebot: noindex' || chr(13) || chr(10)
      |        || chr(13) || chr(10) || 'body'
      |      ELSE 'HTTP/1.1 200 OK' || chr(13) || chr(10)
      |        || 'Content-Type: text/html' || chr(13) || chr(10)
      |        || chr(13) || chr(10) || 'body' END AS raw,
      |    CASE CAST(doc_id % 6 AS INT)
      |      WHEN 0 THEN '<html><head><meta name="robots" content="noindex, nofollow"><title>a</title></head><body>' || text
      |      WHEN 2 THEN '<html><head><META NAME=''ROBOTS'' CONTENT=''NONE''></head><body>' || text
      |      WHEN 4 THEN '<html><head><meta name="robots" content="nofollow"></head><body>' || text
      |      ELSE '<html><body>' || text END AS html
      |  FROM documents),
      |ex AS (
      |  SELECT doc_id,
      |    list_transform(regexp_extract_all(html,
      |      '(?is)(<meta\s[^>]*name\s*=\s*["'']robots["''][^>]*>)', 1),
      |      t -> CASE WHEN regexp_matches(t, '(?i)content\s*=\s*"')
      |             THEN regexp_extract(t, '(?i)content\s*=\s*"([^"]*)"', 1)
      |             ELSE regexp_extract(t, '(?i)content\s*=\s*''([^'']*)''', 1)
      |           END) AS metacs,
      |    regexp_extract_all(regexp_extract(raw, '(?s)^(.*?)(\r?\n\r?\n|$)', 1),
      |      '(?im)^x-robots-tag:\s*([^\r\n]*)', 1) AS hdrcs
      |  FROM rs),
      |nm AS (
      |  SELECT doc_id,
      |    list_sort(list_distinct(list_filter(list_transform(
      |      flatten(list_transform(metacs, c -> string_split(lower(c), ','))),
      |      x -> trim(x)), x -> x != ''))) AS md,
      |    list_sort(list_distinct(list_filter(list_transform(
      |      flatten(list_transform(hdrcs, c -> string_split(lower(c), ','))),
      |      x -> trim(x)), x -> x != ''))) AS hd
      |  FROM ex),
      |v AS (
      |  SELECT doc_id, md, hd, list_concat(md, hd) AS al FROM nm)
      |SELECT doc_id,
      |  coalesce(array_to_string(md, ','), '') AS meta_directives,
      |  coalesce(array_to_string(hd, ','), '') AS header_directives,
      |  (list_contains(al, 'noindex') OR list_contains(al, 'none')) AS noindex,
      |  (list_contains(al, 'nofollow') OR list_contains(al, 'none')) AS nofollow,
      |  NOT (list_contains(al, 'noindex') OR list_contains(al, 'none'))
      |    AS indexable
      |FROM v ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val hdrs = when(col("doc_id") % 6 === 1, lit(
      "HTTP/1.1 200 OK\r\nX-Robots-Tag: noarchive\r\n\r\nbody"))
      .when(col("doc_id") % 6 === 3, lit(
        "HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex\r\n" +
          "X-Robots-Tag: nosnippet\r\n\r\nbody"))
      .when(col("doc_id") % 6 === 4, lit(
        "HTTP/1.1 200 OK\r\nX-Robots-Tag: googlebot: noindex\r\n\r\nbody"))
      .otherwise(lit(
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nbody"))
    val html = when(col("doc_id") % 6 === 0, concat(lit(
      "<html><head><meta name=\"robots\" content=\"noindex, nofollow\">" +
        "<title>a</title></head><body>"), col("text")))
      .when(col("doc_id") % 6 === 2, concat(lit(
        "<html><head><META NAME='ROBOTS' CONTENT='NONE'></head><body>"),
        col("text")))
      .when(col("doc_id") % 6 === 4, concat(lit(
        "<html><head><meta name=\"robots\" content=\"nofollow\"></head><body>"),
        col("text")))
      .otherwise(concat(lit("<html><body>"), col("text")))
    val rs2 = t(s, dir, "documents")
      .select(col("doc_id"), hdrs.as("raw"), html.as("html"))
    WebOps.robotsMeta(rs2, "html", "raw", "doc_id").orderBy("doc_id")
  }


  // Charset sniffing over fetched bytes — BOM detection (UTF-32 before
  // its UTF-16 prefix), pure-ASCII probe, full structural UTF-8
  // validation; all regex over the hex encoding so neither engine ever
  // attempts a throwing decode. Fixture cycles 8 byte shapes incl. a
  // broken continuation and a truncated-free euro sign. Undetected
  // non-UTF-8 classifies 'other-8bit', never errors.
  register(
    "t109_charset_sniff",
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 8 AS INT)
      |      WHEN 0 THEN hex('doc ' || doc_id)
      |      WHEN 1 THEN 'EFBBBF66C3B6C3B6'
      |      WHEN 2 THEN 'FFFE68006900'
      |      WHEN 3 THEN '66C328FF'
      |      WHEN 4 THEN '66C3B6E282AC'
      |      WHEN 5 THEN 'FEFF00680069'
      |      WHEN 6 THEN 'FFFE000068000000'
      |      ELSE '0000FEFF00000068' END AS hx
      |  FROM documents),
      |v AS (
      |  SELECT doc_id, hx,
      |    regexp_matches(hx, '^(?:[0-7].)*$') AS is_ascii,
      |    regexp_matches(hx, '^(?:[0-7].|(?:C[2-9A-F]|D.)[89AB].|E0[AB].[89AB].|ED[89].[89AB].|E[1-9A-CEF].[89AB].[89AB].|F0[9AB].[89AB].[89AB].|F[1-3][89AB].[89AB].[89AB].|F48.[89AB].[89AB].)*$')
      |      AS utf8_valid
      |  FROM b)
      |SELECT doc_id,
      |  CASE WHEN starts_with(hx, '0000FEFF') THEN 'utf-32be'
      |       WHEN starts_with(hx, 'FFFE0000') THEN 'utf-32le'
      |       WHEN starts_with(hx, 'FFFE') THEN 'utf-16le'
      |       WHEN starts_with(hx, 'FEFF') THEN 'utf-16be'
      |       WHEN starts_with(hx, 'EFBBBF') THEN 'utf-8'
      |       WHEN is_ascii THEN 'ascii'
      |       WHEN utf8_valid THEN 'utf-8'
      |       ELSE 'other-8bit' END AS charset,
      |  (starts_with(hx, '0000FEFF') OR starts_with(hx, 'FFFE')
      |    OR starts_with(hx, 'FEFF') OR starts_with(hx, 'EFBBBF')) AS has_bom,
      |  is_ascii, utf8_valid,
      |  CAST(length(hx) // 2 AS BIGINT) AS n_bytes
      |FROM v ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val hxFix = when(col("doc_id") % 8 === 0,
      upper(hex(concat(lit("doc "), col("doc_id").cast("string"))
        .cast("binary"))))
      .when(col("doc_id") % 8 === 1, lit("EFBBBF66C3B6C3B6"))
      .when(col("doc_id") % 8 === 2, lit("FFFE68006900"))
      .when(col("doc_id") % 8 === 3, lit("66C328FF"))
      .when(col("doc_id") % 8 === 4, lit("66C3B6E282AC"))
      .when(col("doc_id") % 8 === 5, lit("FEFF00680069"))
      .when(col("doc_id") % 8 === 6, lit("FFFE000068000000"))
      .otherwise(lit("0000FEFF00000068"))
    val blobs = t(s, dir, "documents")
      .select(col("doc_id"), unhex(hxFix).as("bytes"))
    WebOps.charsetSniff(blobs, "bytes", "doc_id").orderBy("doc_id")
  }


  // Redirect-chain resolution by pointer doubling (3 rounds = 8-hop cap):
  // chains of up to 7 hops inside each 8-block of doc ids (terminal at
  // the block end) plus a planted 3-cycle that must surface as hops=cap,
  // resolved=false. The oracle walks the SAME cap linearly with a
  // recursive CTE; the Spark side composes the mapping with itself
  // log-many times — value-identical truncated-walk semantics.
  register(
    "t110_redirect_chains",
    """WITH ed AS (
      |  SELECT 'u' || doc_id AS src, 'u' || (doc_id + 1) AS dst
      |  FROM documents WHERE doc_id % 8 <> 7 AND doc_id < 400
      |  UNION ALL SELECT 'c0', 'c1' UNION ALL SELECT 'c1', 'c2'
      |  UNION ALL SELECT 'c2', 'c0'),
      |walk AS (
      |  WITH RECURSIVE w(src, cur, hops) AS (
      |    SELECT src, dst, 1 FROM ed
      |    UNION ALL
      |    SELECT w.src, e.dst, w.hops + 1 FROM w JOIN ed e ON w.cur = e.src
      |    WHERE w.hops < 8)
      |  SELECT * FROM w),
      |fin AS (
      |  SELECT src, cur AS final_url, hops FROM (
      |    SELECT *, row_number() OVER (PARTITION BY src ORDER BY hops DESC)
      |      AS rn FROM walk) WHERE rn = 1)
      |SELECT src, final_url, CAST(hops AS BIGINT) AS hops,
      |  final_url NOT IN (SELECT src FROM ed) AS resolved
      |FROM fin ORDER BY src""".stripMargin) { (s, dir) =>
    val session = s
    import session.implicits._
    val base = t(s, dir, "documents")
      .where(col("doc_id") % 8 =!= 7 && col("doc_id") < 400)
      .select(concat(lit("u"), col("doc_id")).as("src"),
        concat(lit("u"), col("doc_id") + 1).as("dst"))
    val cyc = Seq(("c0", "c1"), ("c1", "c2"), ("c2", "c0")).toDF("src", "dst")
    WebOps.resolveRedirects(base.unionAll(cyc), "src", "dst",
        doublingRounds = 3)
      .orderBy("src")
  }


  // t110's audit surface (r18): sources whose fetch log records
  // CONFLICTING redirect targets — the ones resolveRedirects collapses to
  // min-dst deterministically. Exact-duplicate re-fetches (the % 5 class)
  // must NOT flag; only the genuinely flapping % 9 class does.
  register(
    "t110b_redirect_conflicts",
    """WITH e AS (
      |  SELECT 'u' || doc_id AS src, 'u' || (doc_id + 1) AS dst
      |  FROM documents WHERE doc_id < 400
      |  UNION ALL
      |  SELECT 'u' || doc_id, 'u' || (doc_id + 1)
      |  FROM documents WHERE doc_id < 400 AND doc_id % 5 = 0
      |  UNION ALL
      |  SELECT 'u' || doc_id, 'z' || doc_id
      |  FROM documents WHERE doc_id < 400 AND doc_id % 9 = 0),
      |d AS (SELECT DISTINCT src, dst FROM e)
      |SELECT src, CAST(count(*) AS BIGINT) AS n_dsts, min(dst) AS min_dst
      |FROM d GROUP BY src HAVING count(*) >= 2
      |ORDER BY src""".stripMargin) { (s, dir) =>
    val base = t(s, dir, "documents").where(col("doc_id") < 400)
      .select(concat(lit("u"), col("doc_id")).as("src"),
        concat(lit("u"), col("doc_id") + 1).as("dst"))
    val refetch = base.where(substring(col("src"), 2, 100).cast("long") % 5 === 0)
    val flap = t(s, dir, "documents")
      .where(col("doc_id") < 400 && col("doc_id") % 9 === 0)
      .select(concat(lit("u"), col("doc_id")).as("src"),
        concat(lit("z"), col("doc_id")).as("dst"))
    WebOps.redirectConflicts(base.unionAll(refetch).unionAll(flap))
      .orderBy("src")
  }


  // URL-structure bitext candidate pairing (the ParaCrawl prefilter):
  // pages whose URLs differ only in a language path segment pair up as
  // translation candidates — one survivor per (key, lang) so per-key
  // fan-out is bounded by |langs| by construction. Fixture spreads 3
  // langs over coprime moduli so real multi-lang keys exist.
  register(
    "t111_url_bitext",
    """WITH p AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'en' WHEN 1 THEN 'fr'
      |      WHEN 2 THEN 'de' ELSE '' END AS lang,
      |    doc_id % 199 AS g
      |  FROM documents),
      |wl AS (
      |  SELECT doc_id AS id, lang,
      |         'https://site.com/p/' || g || '/' AS url_key
      |  FROM p WHERE lang != ''),
      |cn AS (SELECT url_key, lang, min(id) AS id FROM wl
      |       GROUP BY url_key, lang)
      |SELECT a.url_key AS url_key, a.lang AS lang_a,
      |       CAST(a.id AS BIGINT) AS id_a,
      |       b.lang AS lang_b, CAST(b.id AS BIGINT) AS id_b
      |FROM cn a JOIN cn b ON a.url_key = b.url_key
      |WHERE a.lang < b.lang
      |ORDER BY a.url_key, lang_a, lang_b""".stripMargin) { (s, dir) =>
    val lang = when(col("doc_id") % 5 === 0, "en")
      .when(col("doc_id") % 5 === 1, "fr")
      .when(col("doc_id") % 5 === 2, "de").otherwise("")
    val pages = t(s, dir, "documents").select(col("doc_id"),
      when(lang =!= "", concat(lit("https://site.com/"), lang, lit("/p/"),
        col("doc_id") % 199, lit("/")))
        .otherwise(concat(lit("https://site.com/p/"), col("doc_id") % 199,
          lit("/"))).as("url"))
    WebOps.urlBitextPairs(pages, "url", "doc_id", Seq("en", "fr", "de"))
      .orderBy("url_key", "lang_a", "lang_b")
  }


  // Politeness-aware fetch scheduling: the frontier ranks per host by
  // priority, the top-K survive (mega-hosts can't monopolize the fetch
  // budget), slot k fetches at k*crawl_delay seconds. The per-host
  // window is exactly frontier-cap-bounded — politeness makes a host's
  // fetches serial, so this window IS the physical schedule.
  register(
    "t112_fetch_schedule",
    """WITH fr AS (
      |  SELECT 'https://site' || (doc_id % 7) || '.com/p/' || doc_id AS url,
      |         'site' || (doc_id % 7) || '.com' AS host,
      |         1 + (doc_id % 7) % 3 AS delay, doc_id % 13 AS prio
      |  FROM documents),
      |r AS (SELECT url, host, delay,
      |        row_number() OVER (PARTITION BY host
      |          ORDER BY prio DESC, url) AS rank
      |      FROM fr)
      |SELECT url, host, CAST(rank AS BIGINT) AS rank,
      |       CAST((rank - 1) * delay AS BIGINT) AS slot_s
      |FROM r WHERE rank <= 50 ORDER BY host, rank""".stripMargin) { (s, dir) =>
    val frontier = t(s, dir, "documents").select(
      concat(lit("https://site"), col("doc_id") % 7, lit(".com/p/"),
        col("doc_id")).as("url"),
      concat(lit("site"), col("doc_id") % 7, lit(".com")).as("host"),
      (lit(1) + (col("doc_id") % 7) % 3).as("delay"),
      (col("doc_id") % 13).as("prio"))
    WebOps.fetchSchedule(frontier, "url", "host", "delay", "prio",
        frontierCap = 50)
      .orderBy("host", "rank")
  }


  // Publication-date extraction (knowledge-cutoff / freshness signal):
  // og:published_time -> ld+json datePublished -> <time datetime> ->
  // /YYYY/MM/DD/ URL segment, first VALIDATED hit wins — a malformed
  // higher-precedence value falls through (case 4 pins that). ISO
  // prefix normalization + structural validation in both engines.
  register(
    "t114_pub_date",
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 6 AS INT)
      |      WHEN 0 THEN '<html><head><meta property="article:published_time" content="2023-05-12T10:00:00Z"><time datetime="2001-01-01">x</time></head><body>a'
      |      WHEN 1 THEN '<html><head><script type="application/ld+json">{"@type":"Article","datePublished":"2021-11-03"}</script></head><body>b'
      |      WHEN 2 THEN '<html><body><time datetime="2019-07-30T08:00">then</time>'
      |      WHEN 3 THEN '<html><body>dated by url'
      |      WHEN 4 THEN '<html><head><meta property="article:published_time" content="not-a-date"><time datetime="2018-03-09">y</time></head>'
      |      ELSE '<html><body>undated ' || text END AS html,
      |    CASE WHEN doc_id % 6 = 3
      |      THEN 'https://site.com/2020/02/29/post.html'
      |      ELSE 'https://site.com/p/x' END AS url
      |  FROM documents),
      |x0 AS (
      |  SELECT doc_id,
      |    regexp_extract(html, '(?is)(<meta\s[^>]*property\s*=\s*["'']article:published_time["''][^>]*>)', 1) AS ogt,
      |    NULLIF(regexp_replace(regexp_extract(html,
      |      '(?is)<script\s[^>]*type\s*=\s*["'']application/ld\+json["''][^>]*>(.*?)</script>', 1),
      |      '[;\s]+$', ''), '') AS ldj,
      |    regexp_extract(html, '(?is)(<time\s[^>]*datetime\s*=\s*["''][^"'']*["''][^>]*>)', 1) AS tmt,
      |    regexp_extract(url, '/((?:199\d|20[0-2]\d))/(0[1-9]|1[0-2])(?:/(0[1-9]|[12]\d|3[01]))?(/|$)', 1) AS uy,
      |    regexp_extract(url, '/((?:199\d|20[0-2]\d))/(0[1-9]|1[0-2])(?:/(0[1-9]|[12]\d|3[01]))?(/|$)', 2) AS um,
      |    regexp_extract(url, '/((?:199\d|20[0-2]\d))/(0[1-9]|1[0-2])(?:/(0[1-9]|[12]\d|3[01]))?(/|$)', 3) AS ud
      |  FROM f),
      |x AS (
      |  SELECT doc_id,
      |    substr(CASE WHEN regexp_matches(ogt, '(?i)content\s*=\s*"')
      |        THEN regexp_extract(ogt, '(?i)content\s*=\s*"([^"]*)"', 1)
      |        ELSE regexp_extract(ogt, '(?i)content\s*=\s*''([^'']*)''', 1)
      |      END, 1, 10) AS og0,
      |    substr(CASE WHEN ldj IS NOT NULL AND json_valid(ldj)
      |        THEN json_extract_string(ldj, '$.datePublished') END, 1, 10) AS ld0,
      |    substr(CASE WHEN regexp_matches(tmt, '(?i)datetime\s*=\s*"')
      |        THEN regexp_extract(tmt, '(?i)datetime\s*=\s*"([^"]*)"', 1)
      |        ELSE regexp_extract(tmt, '(?i)datetime\s*=\s*''([^'']*)''', 1)
      |      END, 1, 10) AS tm0,
      |    uy, um, ud
      |  FROM x0),
      |v AS (
      |  SELECT doc_id,
      |    CASE WHEN regexp_matches(og0, '^\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$') THEN og0 END AS og,
      |    CASE WHEN regexp_matches(ld0, '^\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$') THEN ld0 END AS ld,
      |    CASE WHEN regexp_matches(tm0, '^\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$') THEN tm0 END AS tm,
      |    CASE WHEN uy != '' THEN uy || '-' || um || '-' ||
      |      (CASE WHEN ud != '' THEN ud ELSE '01' END) END AS ur
      |  FROM x)
      |SELECT doc_id, coalesce(og, ld, tm, ur) AS pub_date,
      |  CASE WHEN og IS NOT NULL THEN 'og'
      |       WHEN ld IS NOT NULL THEN 'ldjson'
      |       WHEN tm IS NOT NULL THEN 'time'
      |       WHEN ur IS NOT NULL THEN 'url' END AS date_source
      |FROM v ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val m6 = col("doc_id") % 6
    val html = when(m6 === 0, lit("<html><head><meta property=\"article:" +
      "published_time\" content=\"2023-05-12T10:00:00Z\">" +
      "<time datetime=\"2001-01-01\">x</time></head><body>a"))
      .when(m6 === 1, lit("<html><head><script type=\"application/ld+json\">" +
        "{\"@type\":\"Article\",\"datePublished\":\"2021-11-03\"}" +
        "</script></head><body>b"))
      .when(m6 === 2, lit("<html><body><time datetime=\"2019-07-30T08:00\">" +
        "then</time>"))
      .when(m6 === 3, lit("<html><body>dated by url"))
      .when(m6 === 4, lit("<html><head><meta property=\"article:" +
        "published_time\" content=\"not-a-date\">" +
        "<time datetime=\"2018-03-09\">y</time></head>"))
      .otherwise(concat(lit("<html><body>undated "), col("text")))
    val url = when(m6 === 3, lit("https://site.com/2020/02/29/post.html"))
      .otherwise(lit("https://site.com/p/x"))
    val pages = t(s, dir, "documents").select(col("doc_id"),
      html.as("html"), url.as("url"))
    WebOps.pubDate(pages, "html", "url", "doc_id").orderBy("doc_id")
  }

  // Anchor-text pair mining — (query, document) training pairs from
  // link anchor text: absolute-href anchors yield (anchor_text, target)
  // with tag-stripped entity-decoded collapsed text, navigation
  // boilerplate and sub-2-token anchors drop, identical pairs collapse
  // with a frequency. Residues: a relative link (dropped), a shared
  // guide link (docs 350 apart repeat the exact pair — counts > 1), a
  // 'click here' boilerplate anchor, a one-token 'Next', and an
  // entity+inline-tag anchor text. Hash-proven per pair.
  register(
    "t106_anchor_pairs",
    s"""WITH pg AS (
      |  SELECT doc_id,
      |    '<div><a href="/local">home page link</a>'
      |    || '<a href="https://site' || (doc_id % 7) || '.com/guide/' || (doc_id % 50)
      |    || '">Spark tuning guide ' || (doc_id % 50) || '</a>'
      |    || '<a href="https://site0.com/">click here</a>'
      |    || '<a href="https://site1.com/x">Next</a>'
      |    || CASE WHEN doc_id % 3 = 0
      |         THEN '<a href="https://site2.com/e">R&amp;D <b>notes</b> ' || doc_id || '</a>'
      |         ELSE '' END
      |    || '</div>' AS html
      |  FROM documents),
      |an AS (SELECT doc_id,
      |         unnest(regexp_extract_all(html, '(?is)<a\\s[^>]*>.*?</a>')) AS a
      |       FROM pg),
      |x AS (SELECT
      |        regexp_replace(trim(${TextAnalysis.entityDecodeSql(
        "regexp_replace(regexp_extract(a, '(?is)^<a[^>]*>(.*)</a>$', 1), '<[^>]*>', '', 'g')")}), '\\s+', ' ', 'g') AS anchor_text,
      |        regexp_extract(a, '(?is)href\\s*=\\s*["'']([^"'']*)["'']', 1) AS target
      |      FROM an)
      |SELECT anchor_text, target, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM x
      |WHERE regexp_matches(target, '^https?://')
      |  AND len(string_split(anchor_text, ' ')) >= 2
      |  AND lower(anchor_text) NOT IN
      |    ('click here', 'read more', 'more', 'next', 'previous', 'home')
      |GROUP BY 1, 2 ORDER BY anchor_text, target""".stripMargin) { (s, dir) =>
    val pages = t(s, dir, "documents").select(col("doc_id"), concat(
      lit("<div><a href=\"/local\">home page link</a>" +
        "<a href=\"https://site"), col("doc_id") % 7,
      lit(".com/guide/"), col("doc_id") % 50,
      lit("\">Spark tuning guide "), col("doc_id") % 50,
      lit("</a><a href=\"https://site0.com/\">click here</a>" +
        "<a href=\"https://site1.com/x\">Next</a>"),
      when(col("doc_id") % 3 === 0, concat(
        lit("<a href=\"https://site2.com/e\">R&amp;D <b>notes</b> "),
        col("doc_id"), lit("</a>"))).otherwise(lit("")),
      lit("</div>")).as("html"))
    WebOps.anchorPairs(pages, "html", "doc_id")
      .orderBy("anchor_text", "target")
  }

  // HTML metadata extraction — title / meta description / canonical URL
  // / html lang / og:title, the fields a page index and a
  // canonical-URL dedup tier key on. Fixture residues exercise:
  // whitespace-collapsed multi-line title with an UNDECODED entity
  // (metadata compares raw), flipped attribute order + single quotes +
  // case-folded tag/attr names, and a metadata-free page (all fields
  // empty string, never null). Hash-proven byte-for-byte.
  /** Matched-quote attribute extraction as DuckDB SQL — the exact
    * algebra of WebOps.htmlMeta's attrAfter: the double-quoted FORM's
    * PRESENCE picks the branch (an empty attr="" stays '', never falls
    * through to a later single-quoted attribute). */
  private def attrAfterSql(tagExpr: String, attr: String): String = {
    val dq = s"""regexp_extract($tagExpr, '(?i)$attr\\s*=\\s*"([^"]*)"', 1)"""
    val sq = s"""regexp_extract($tagExpr, '(?i)$attr\\s*=\\s*''([^'']*)''', 1)"""
    s"""CASE WHEN regexp_matches($tagExpr, '(?i)$attr\\s*=\\s*"') THEN $dq ELSE $sq END"""
  }

  register(
    "t91_html_meta",
    s"""WITH h AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN '<html lang="en"><head><title>  Page ' || doc_id || chr(10)
      |        || ' &amp; notes  </title>'
      |        || '<meta name="description" content="page ' || doc_id || '''s summary">'
      |        || '<link rel="canonical" href="https://site.example/p/' || (doc_id % 150) || '">'
      |        || '</head><body><p>' || text || '</p></body></html>'
      |      WHEN 1 THEN '<HTML Lang=''fr''><head>'
      |        || '<meta content="og title ' || doc_id || '" property=''og:title''>'
      |        || '<META CONTENT="flipped desc ' || doc_id || '" NAME=''description''>'
      |        || '</head><body>' || text || '</body></HTML>'
      |      ELSE '<div><p>' || text || '</p></div>' END AS html
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_replace(trim(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1)), '\\s+', ' ', 'g') AS title,
      |  ${attrAfterSql("regexp_extract(html, '(?is)(<meta\\s[^>]*name\\s*=\\s*[\"'']description[\"''][^>]*>)', 1)", "content")} AS meta_description,
      |  ${attrAfterSql("regexp_extract(html, '(?is)(<link\\s[^>]*rel\\s*=\\s*[\"'']canonical[\"''][^>]*>)', 1)", "href")} AS canonical_url,
      |  ${attrAfterSql("regexp_extract(html, '(?is)(<html[^>]*>)', 1)", "\\slang")} AS lang,
      |  ${attrAfterSql("regexp_extract(html, '(?is)(<meta\\s[^>]*property\\s*=\\s*[\"'']og:title[\"''][^>]*>)', 1)", "content")} AS og_title
      |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val pages = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(
        lit("<html lang=\"en\"><head><title>  Page "), col("doc_id"),
        lit("\n &amp; notes  </title>" +
          "<meta name=\"description\" content=\"page "),
        col("doc_id"),
        lit("'s summary\"><link rel=\"canonical\" href=\"https://site.example/p/"),
        col("doc_id") % 150,
        lit("\"></head><body><p>"), col("text"), lit("</p></body></html>")))
        .when(col("doc_id") % 3 === 1, concat(
          lit("<HTML Lang='fr'><head><meta content=\"og title "),
          col("doc_id"),
          lit("\" property='og:title'><META CONTENT=\"flipped desc "),
          col("doc_id"),
          lit("\" NAME='description'></head><body>"), col("text"),
          lit("</body></HTML>")))
        .otherwise(concat(lit("<div><p>"), col("text"), lit("</p></div>")))
        .as("html"))
    WebOps.htmlMeta(pages, "html", "doc_id").orderBy("doc_id")
  }

  // t91's decode composition: the same extraction with decodeValues = on,
  // so entity-encoded metadata collapses with its decoded twins before
  // any title-dedup / canonical-URL grouping tier (the r15 verdict ask).
  // Residues plant every entity family across the five fields — named,
  // decimal, hex (mixed case), nbsp, and an &amp;-encoded query string in
  // the canonical URL; the oracle wraps each extraction in the identical
  // 6-pass decode chain. Hash-proven byte-for-byte.
  register(
    "t91b_html_meta_decoded",
    s"""WITH h AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0
      |      THEN '<html lang="en"><head><title> A &amp; B &lt;C&gt; '
      |        || doc_id || ' </title>'
      |        || '<meta name="description" content="say &quot;hi&quot; &#39;now&#x27;">'
      |        || '<link rel="canonical" href="https://site.example/p/' || (doc_id % 150) || '?a=1&amp;b=2">'
      |        || '</head><body>' || text || '</body></html>'
      |      ELSE '<HTML lang=''fr''><head>'
      |        || '<meta content=''R&nbsp;S &#38; T ' || doc_id || ''' property="og:title">'
      |        || '</head><body>' || text || '</body></HTML>' END AS html
      |  FROM documents)
      |SELECT doc_id,
      |  ${TextAnalysis.entityDecodeSql("regexp_replace(trim(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1)), '\\s+', ' ', 'g')")} AS title,
      |  ${TextAnalysis.entityDecodeSql(attrAfterSql("regexp_extract(html, '(?is)(<meta\\s[^>]*name\\s*=\\s*[\"'']description[\"''][^>]*>)', 1)", "content"))} AS meta_description,
      |  ${TextAnalysis.entityDecodeSql(attrAfterSql("regexp_extract(html, '(?is)(<link\\s[^>]*rel\\s*=\\s*[\"'']canonical[\"''][^>]*>)', 1)", "href"))} AS canonical_url,
      |  ${TextAnalysis.entityDecodeSql(attrAfterSql("regexp_extract(html, '(?is)(<html[^>]*>)', 1)", "\\slang"))} AS lang,
      |  ${TextAnalysis.entityDecodeSql(attrAfterSql("regexp_extract(html, '(?is)(<meta\\s[^>]*property\\s*=\\s*[\"'']og:title[\"''][^>]*>)', 1)", "content"))} AS og_title
      |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val pages = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 2 === 0, concat(
        lit("<html lang=\"en\"><head><title> A &amp; B &lt;C&gt; "),
        col("doc_id"),
        lit(" </title><meta name=\"description\" content=\"say " +
          "&quot;hi&quot; &#39;now&#x27;\">" +
          "<link rel=\"canonical\" href=\"https://site.example/p/"),
        col("doc_id") % 150,
        lit("?a=1&amp;b=2\"></head><body>"), col("text"),
        lit("</body></html>")))
        .otherwise(concat(
          lit("<HTML lang='fr'><head><meta content='R&nbsp;S &#38; T "),
          col("doc_id"),
          lit("' property=\"og:title\"></head><body>"), col("text"),
          lit("</body></HTML>"))).as("html"))
    WebOps.htmlMeta(pages, "html", "doc_id", decodeValues = true)
      .orderBy("doc_id")
  }

  // IBAN PII detection with the REAL ISO 13616 mod-97 checksum — the
  // financial sibling of t81's Luhn gate. Check digits are MINTED by
  // the same left-to-right fold in both engines (the planted-oracle
  // rule: the oracle computes the invariant, never asserts a constant):
  // residue-7 docs corrupt the check by +1 (always invalid — check
  // digits are unique mod 97), residue-11 docs add a well-formed but
  // checksum-failing candidate. Exploded (doc_id, iban, valid) rows,
  // hash-proven.
  register(
    "t92_iban_pii",
    """WITH b AS (
      |  SELECT doc_id,
      |    '370' || lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0') || '0532013000' AS bban
      |  FROM documents),
      |ck AS (
      |  SELECT doc_id, bban,
      |    98 - list_reduce(
      |      list_concat([CAST(0 AS BIGINT)],
      |        list_transform(range(1, length(bban || 'DE00') + 1),
      |          i -> CASE WHEN (bban || 'DE00')[i] BETWEEN '0' AND '9'
      |                 THEN CAST(10000 + ascii((bban || 'DE00')[i]) - 48 AS BIGINT)
      |                 ELSE CAST(100000 + ascii((bban || 'DE00')[i]) - 55 AS BIGINT) END)),
      |      (acc, x) -> (acc * (x // 1000) + (x % 1000)) % 97) AS cd
      |  FROM b),
      |txt AS (
      |  SELECT doc_id,
      |    'invoice DE' ||
      |      lpad(CAST(cd + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS VARCHAR), 2, '0') ||
      |      bban ||
      |      CASE WHEN doc_id % 11 = 0 THEN ' ref XX00ABCDEFGHIJKLM' ELSE '' END ||
      |      ' end' AS t92
      |  FROM ck),
      |cand AS (
      |  SELECT doc_id,
      |    unnest(regexp_extract_all(t92, '\b([A-Z]{2}[0-9]{2}[A-Z0-9]{11,30})\b', 1)) AS iban
      |  FROM txt)
      |SELECT doc_id, iban,
      |  list_reduce(
      |    list_concat([CAST(0 AS BIGINT)],
      |      list_transform(range(1, length(substr(iban, 5) || substr(iban, 1, 4)) + 1),
      |        i -> CASE WHEN (substr(iban, 5) || substr(iban, 1, 4))[i] BETWEEN '0' AND '9'
      |               THEN CAST(10000 + ascii((substr(iban, 5) || substr(iban, 1, 4))[i]) - 48 AS BIGINT)
      |               ELSE CAST(100000 + ascii((substr(iban, 5) || substr(iban, 1, 4))[i]) - 55 AS BIGINT) END)),
      |    (acc, x) -> (acc * (x // 1000) + (x % 1000)) % 97) = 1 AS valid
      |FROM cand ORDER BY doc_id, iban""".stripMargin) { (s, dir) =>
    val bban = concat(lit("370"),
      lpad((col("doc_id") % 100000).cast("string"), 5, "0"),
      lit("0532013000"))
    val cd = lit(98) - WebOps.ibanMod97(concat(bban, lit("DE00")))
    val planted = t(s, dir, "documents").select(col("doc_id"), concat(
      lit("invoice DE"),
      lpad((cd + when(col("doc_id") % 7 === 0, 1).otherwise(0)).cast("string"),
        2, "0"),
      bban,
      when(col("doc_id") % 11 === 0, lit(" ref XX00ABCDEFGHIJKLM"))
        .otherwise(lit("")),
      lit(" end")).as("t92"))
    WebOps.ibanScan(planted, "t92", "doc_id").orderBy("doc_id", "iban")
  }

  // Per-line language segmentation — the multilingual-page triage a
  // corpus language filter needs. Fixture residues build 5/3/4-line
  // pages from three disjoint-stopword languages, so the segmentation
  // exercises single-run, alternating, and sandwich shapes; the oracle
  // recomputes the SAME stopword-argmax per line and the same
  // gaps-and-islands run grouping. Hash-matched per segment.
  register(
    "t93_lang_segments",
    """WITH pages AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN 'the quick scan and join runs' || chr(10) ||
      |        'the table and the join scan' || chr(10) ||
      |        'el que la datos tabla' || chr(10) ||
      |        'el la que datos' || chr(10) ||
      |        'the scan and join again'
      |      WHEN 1 THEN 'der und die das system' || chr(10) ||
      |        'die das und der' || chr(10) || chr(10) ||
      |        'der das und die wieder'
      |      ELSE 'the scan and join' || chr(10) ||
      |        'el que la datos' || chr(10) ||
      |        'der und die das' || chr(10) ||
      |        'el la que datos otra' END AS page
      |  FROM documents),
      |ln0 AS (SELECT doc_id, unnest(string_split(page, chr(10))) AS l,
      |          CAST(generate_subscripts(string_split(page, chr(10)), 1) AS BIGINT) - 1 AS idx
      |        FROM pages),
      |ln AS (SELECT * FROM ln0 WHERE length(trim(l)) > 0),
      |sc AS (SELECT doc_id, idx,
      |         len(list_intersect(list_distinct(list_filter(
      |           string_split_regex(lower(l), '\s+'), x -> x != '')),
      |           ['the','and','scan','join'])) AS s_en,
      |         len(list_intersect(list_distinct(list_filter(
      |           string_split_regex(lower(l), '\s+'), x -> x != '')),
      |           ['el','la','que','datos'])) AS s_es,
      |         len(list_intersect(list_distinct(list_filter(
      |           string_split_regex(lower(l), '\s+'), x -> x != '')),
      |           ['der','die','und','das'])) AS s_de
      |       FROM ln),
      |lng AS (SELECT doc_id, idx, CASE
      |          WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
      |          WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS lang
      |        FROM sc),
      |pv AS (SELECT *, lag(lang) OVER (PARTITION BY doc_id ORDER BY idx) AS prev
      |       FROM lng),
      |nw AS (SELECT *, CASE WHEN prev IS NULL OR prev != lang THEN 1 ELSE 0 END AS isnew
      |       FROM pv),
      |seg AS (SELECT *, sum(isnew) OVER (PARTITION BY doc_id ORDER BY idx) - 1 AS seg_idx
      |        FROM nw)
      |SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx, min(lang) AS lang,
      |       CAST(count(*) AS BIGINT) AS n_lines,
      |       CAST(min(idx) AS BIGINT) AS first_line,
      |       CAST(max(idx) AS BIGINT) AS last_line
      |FROM seg GROUP BY doc_id, seg_idx
      |ORDER BY doc_id, seg_idx""".stripMargin) { (s, dir) =>
    val pages = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0, lit(
        "the quick scan and join runs\nthe table and the join scan\n" +
          "el que la datos tabla\nel la que datos\nthe scan and join again"))
        .when(col("doc_id") % 3 === 1, lit(
          "der und die das system\ndie das und der\n\nder das und die wieder"))
        .otherwise(lit(
          "the scan and join\nel que la datos\nder und die das\n" +
            "el la que datos otra")).as("page"))
    TextAnalysis.langSegments(pages, "page", "doc_id", Seq(
        "en" -> Seq("the", "and", "scan", "join"),
        "es" -> Seq("el", "la", "que", "datos"),
        "de" -> Seq("der", "die", "und", "das")))
      .orderBy("doc_id", "seg_idx")
  }

  // Flesch readability over the organic corpus text — sentence split,
  // word tokens, and the vowel-group syllable heuristic mirrored exactly;
  // FRE/FK-grade in exact integer micro-units (floor(x*1e6 + 0.5) per
  // ratio term), so the scores hash-match.
  register(
    "t94_readability",
    """WITH m AS (
      |  SELECT doc_id,
      |    greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
      |      s -> trim(s) != '')), 1) AS s_n,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS tk
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, s_n,
      |    CAST(len(tk) AS BIGINT) AS n_words,
      |    greatest(len(tk), 1) AS w_n,
      |    CAST(list_sum(list_concat([0], list_transform(tk,
      |      w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))))
      |      AS BIGINT) AS syl
      |  FROM m)
      |SELECT doc_id, CAST(s_n AS BIGINT) AS n_sentences, n_words,
      |  syl AS n_syllables,
      |  (206835000 - CAST(floor(1015000.0 * w_n / s_n + 0.5) AS BIGINT)
      |    - CAST(floor(84600000.0 * syl / w_n + 0.5) AS BIGINT)) / 1000000.0 AS fre,
      |  (CAST(floor(390000.0 * w_n / s_n + 0.5) AS BIGINT)
      |    + CAST(floor(11800000.0 * syl / w_n + 0.5) AS BIGINT)
      |    - 15590000) / 1000000.0 AS fk_grade
      |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.readabilityReport(t(s, dir, "documents"), "text", "doc_id")
      .orderBy("doc_id")
  }

  // Output-shard packing + integrity manifest — the corpus build's last
  // mile: greedy token-budget fill in doc order (a doc lands where its
  // first token falls), manifest rows carry per-shard doc/token counts,
  // id range, and an md5 over the ordered id list a consumer re-verifies
  // after transport. The oracle computes the SAME start offsets with one
  // global prefix sum; the Spark side decomposes it shard-with-carry
  // (bucket offsets broadcast + in-bucket windows) — value-identical by
  // construction, hash-matched.
  register(
    "t95_shard_manifest",
    """WITH tks AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, n_tokens,
      |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
      |  FROM tks)
      |SELECT CAST(strt // 2000 AS BIGINT) AS shard_id,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(min(doc_id) AS BIGINT) AS first_doc,
      |       CAST(max(doc_id) AS BIGINT) AS last_doc,
      |       md5(array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',')) AS ids_md5
      |FROM st GROUP BY 1 ORDER BY shard_id""".stripMargin) { (s, dir) =>
    TextAnalysis.packShards(t(s, dir, "documents"), "text", "doc_id",
        shardTokens = 2000L)
      .orderBy("shard_id")
  }

  // Exact-cut sequence chunking (concat-and-chunk, the GPT/Megatron
  // pretraining layout): the doc-ordered token stream cut into exact
  // 1024-token training sequences; docs crossing a cut contribute to
  // both sides (n_continued = the split-doc contamination count).
  // Distinct from t15 (offset-based, never splits) and t95 (whole-doc
  // shards, variable fill). The oracle runs ONE global
  // prefix sum + generate_series explode; the Spark side decomposes
  // shard-with-carry (bucket offsets broadcast) — value-identical.
  register(
    "t107_chunk_pack",
    """WITH tks AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
      |      AS BIGINT) AS n_tokens
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, n_tokens,
      |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
      |  FROM tks),
      |sp AS (SELECT doc_id, strt, strt + n_tokens AS e FROM st WHERE n_tokens > 0),
      |ex AS (
      |  SELECT doc_id, strt, e,
      |    unnest(generate_series(CAST(strt // 1024 AS BIGINT),
      |                           CAST((e - 1) // 1024 AS BIGINT))) AS seq_id
      |  FROM sp)
      |SELECT CAST(seq_id AS BIGINT) AS seq_id,
      |       CAST(sum(least(e, (seq_id + 1) * 1024)
      |             - greatest(strt, seq_id * 1024)) AS BIGINT) AS n_tokens,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN strt >= seq_id * 1024 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_starts,
      |       CAST(sum(CASE WHEN e > (seq_id + 1) * 1024 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_continued
      |FROM ex GROUP BY seq_id ORDER BY seq_id""".stripMargin) { (s, dir) =>
    TextAnalysis.chunkSequences(t(s, dir, "documents"), "text", "doc_id",
        seqLen = 1024L)
      .orderBy("seq_id")
  }

  // Incremental exact-cut chunking under the BatchStore contract —
  // sequence ids stay GLOBAL across the stream (each batch chunks from
  // the committed prior token total); a sequence spanning the batch
  // boundary emits one PARTIAL row per batch (all four counts merge by
  // sum). Two id-split batches mirror the stream order; the oracle runs
  // the same packing with ONE global prefix sum grouped by (seq, batch).
  register(
    "t107b_chunk_incremental",
    """WITH tks AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
      |      AS BIGINT) AS n_tokens,
      |    CASE WHEN doc_id < 250 THEN 0 ELSE 1 END AS batch_id
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, n_tokens, batch_id,
      |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
      |  FROM tks),
      |sp AS (SELECT doc_id, batch_id, strt, strt + n_tokens AS e
      |       FROM st WHERE n_tokens > 0),
      |ex AS (
      |  SELECT doc_id, batch_id, strt, e,
      |    unnest(generate_series(CAST(strt // 1024 AS BIGINT),
      |                           CAST((e - 1) // 1024 AS BIGINT))) AS seq_id
      |  FROM sp)
      |SELECT CAST(seq_id AS BIGINT) AS seq_id,
      |       CAST(sum(least(e, (seq_id + 1) * 1024)
      |             - greatest(strt, seq_id * 1024)) AS BIGINT) AS n_tokens,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN strt >= seq_id * 1024 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_starts,
      |       CAST(sum(CASE WHEN e > (seq_id + 1) * 1024 THEN 1 ELSE 0 END)
      |         AS BIGINT) AS n_continued,
      |       CAST(batch_id AS BIGINT) AS batch_id
      |FROM ex GROUP BY seq_id, batch_id
      |ORDER BY seq_id, batch_id""".stripMargin) { (s, dir) =>
    val store = scratchDir("t107b_store") // shutdown-hook cleaned
    val docs = t(s, dir, "documents")
    val m0 = TextAnalysis.chunkStoreStep(docs.where(col("doc_id") < 250),
      store, "text", "doc_id", seqLen = 1024L, batchId = 0L)
    val m1 = TextAnalysis.chunkStoreStep(docs.where(col("doc_id") >= 250),
      store, "text", "doc_id", seqLen = 1024L, batchId = 1L)
    m0.withColumn("batch_id", lit(0L))
      .unionAll(m1.withColumn("batch_id", lit(1L)))
      .orderBy("seq_id", "batch_id")
  }

  // Incremental shard packing under the BatchStore contract — shard ids
  // stay GLOBAL across the stream (each batch packs from the committed
  // prior batches' running token total), and a shard spanning a batch
  // boundary emits one PARTIAL manifest row per batch (counts/ranges
  // merge; ids_md5 stays per-delivery). Two id-split batches mirror the
  // stream order; the oracle computes the same packing with ONE global
  // prefix sum grouped by (shard, batch). Deterministic end-to-end, so
  // the whole store loop hash-matches (the d24 rule).
  register(
    "t95b_shard_incremental",
    """WITH tks AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
      |      AS BIGINT) AS n_tokens,
      |    CASE WHEN doc_id < 250 THEN 0 ELSE 1 END AS batch_id
      |  FROM documents),
      |st AS (
      |  SELECT doc_id, n_tokens, batch_id,
      |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
      |  FROM tks)
      |SELECT CAST(strt // 2000 AS BIGINT) AS shard_id,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(min(doc_id) AS BIGINT) AS first_doc,
      |       CAST(max(doc_id) AS BIGINT) AS last_doc,
      |       md5(array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',')) AS ids_md5,
      |       CAST(batch_id AS BIGINT) AS batch_id
      |FROM st GROUP BY strt // 2000, batch_id
      |ORDER BY shard_id, batch_id""".stripMargin) { (s, dir) =>
    val store = scratchDir("t95b_store") // shutdown-hook cleaned
    val docs = t(s, dir, "documents")
    val m0 = TextAnalysis.shardStoreStep(docs.where(col("doc_id") < 250),
      store, "text", "doc_id", shardTokens = 2000L, batchId = 0L)
    val m1 = TextAnalysis.shardStoreStep(docs.where(col("doc_id") >= 250),
      store, "text", "doc_id", shardTokens = 2000L, batchId = 1L)
    m0.withColumn("batch_id", lit(0L))
      .unionAll(m1.withColumn("batch_id", lit(1L)))
      .orderBy("shard_id", "batch_id")
  }

  // Domain trust scores with Bayesian shrinkage toward the corpus mean —
  // the domain-level filter tier (a 5-page domain must not out-rank a
  // 500-page one on raw mean). Fixture mixes 7 large domains with three
  // RARE ones (~5 docs each) so the shrinkage visibly pulls small-n
  // domains toward the global mean; per-doc quality (the oracled t2
  // score) floors to integer micro-units BEFORE the order-free sums, so
  // every score hash-matches.
  register(
    "t96_domain_trust",
    """WITH d AS (
      |  SELECT CASE WHEN doc_id % 97 = 0 THEN 'rare' || (doc_id % 3) || '.net'
      |              ELSE 'site' || ((doc_id % 150) % 7) || '.com' END AS domain,
      |    CAST(floor(round(greatest(0.0,
      |      least(length(text) / 500.0, 1.0) * 0.4 +
      |      least((len(list_filter(string_split_regex(lower(text), '\s+'),
      |              x -> x IN ('the','a','of','and','to','in'))) ::DOUBLE /
      |             greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
      |              x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |      (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |                   greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6)
      |      * 1000000.0 + 0.5) AS BIGINT) AS qm
      |  FROM documents),
      |pd AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
      |              CAST(sum(qm) AS BIGINT) AS s
      |       FROM d GROUP BY domain),
      |g AS (SELECT CAST(floor(CAST(sum(qm) AS DOUBLE) / count(*) + 0.5)
      |        AS BIGINT) AS gm FROM d)
      |SELECT domain, n_docs,
      |  CAST(floor(CAST(s AS DOUBLE) / n_docs + 0.5) AS BIGINT) / 1000000.0
      |    AS mean_quality,
      |  CAST(floor(CAST(s + 10 * g.gm AS DOUBLE) / (n_docs + 10) + 0.5)
      |    AS BIGINT) / 1000000.0 AS shrunk_quality,
      |  g.gm / 1000000.0 AS global_mean,
      |  CAST(floor(CAST(s + 10 * g.gm AS DOUBLE) / (n_docs + 10) + 0.5)
      |    AS BIGINT) / 1000000.0 >= 0.5 AS keep
      |FROM pd, g ORDER BY domain""".stripMargin) { (s, dir) =>
    val tagged = t(s, dir, "documents").select(
      when(col("doc_id") % 97 === 0,
        concat(lit("rare"), col("doc_id") % 3, lit(".net")))
        .otherwise(concat(lit("site"), (col("doc_id") % 150) % 7,
          lit(".com"))).as("domain"),
      TextAnalysis.qualityScore(col("text"),
        Seq("the", "a", "of", "and", "to", "in")).as("q"))
    WebOps.domainTrust(tagged, "domain", "q", alpha = 10L, keepAtLeast = 0.5)
      .orderBy("domain")
  }

  // Markdown code-fence extraction (the code-corpus miner). Fixture
  // residues plant: a python fence + an UNTERMINATED ``` run that must
  // match nothing, a bare fence ('' info string) followed by a sql
  // fence (multi-fence ordering), and a fence-free page (absent from
  // output). Lazy first-close semantics identical in both regex
  // engines; hash-matched down to the code bytes.
  register(
    "t97_code_fences",
    """WITH pg AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN 'Intro text' || chr(10) || '```python' || chr(10)
      |        || 'x = ' || doc_id || chr(10) || 'print(x)' || chr(10)
      |        || '```' || chr(10) || 'tail ```not a fence'
      |      WHEN 1 THEN '```' || chr(10) || 'plain block ' || doc_id || chr(10)
      |        || '```' || chr(10) || 'between' || chr(10)
      |        || '```sql' || chr(10) || 'SELECT ' || doc_id || ';' || chr(10) || '```'
      |      ELSE 'no fences here ' || text END AS page
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    regexp_extract_all(page, '(?s)```([A-Za-z0-9_+-]*)\n(.*?)```', 1) AS ls,
      |    regexp_extract_all(page, '(?s)```([A-Za-z0-9_+-]*)\n(.*?)```', 2) AS cs
      |  FROM pg),
      |e AS (
      |  SELECT doc_id,
      |    CAST(generate_subscripts(cs, 1) AS BIGINT) - 1 AS fence_idx,
      |    unnest(ls) AS lang, unnest(cs) AS code
      |  FROM f)
      |SELECT doc_id, fence_idx, lang,
      |       CAST(len(string_split(code, chr(10))) AS BIGINT) AS n_lines,
      |       CAST(length(code) AS BIGINT) AS n_chars, code
      |FROM e ORDER BY doc_id, fence_idx""".stripMargin) { (s, dir) =>
    val pages = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(
        lit("Intro text\n```python\nx = "), col("doc_id"),
        lit("\nprint(x)\n```\ntail ```not a fence")))
        .when(col("doc_id") % 3 === 1, concat(
          lit("```\nplain block "), col("doc_id"),
          lit("\n```\nbetween\n```sql\nSELECT "), col("doc_id"),
          lit(";\n```")))
        .otherwise(concat(lit("no fences here "), col("text"))).as("page"))
    TextAnalysis.codeFences(pages, "page", "doc_id")
      .orderBy("doc_id", "fence_idx")
  }

  // StarCoder-style code quality gates composed onto the fence miner:
  // residues plant a clean keeper, an auto-generated reject, and a
  // minified single-line reject (1200-char line). Every metric in exact
  // integer micro-units; hash-matched including the keep verdicts.
  register(
    "t98_code_quality",
    """WITH pg AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN '```python' || chr(10) || '# setup' || chr(10)
      |        || 'x = ' || doc_id || chr(10) || 'print(x)' || chr(10) || '```'
      |      WHEN 1 THEN '```js' || chr(10) || '// auto-generated do not edit'
      |        || chr(10) || 'var x = ' || doc_id || ';' || chr(10) || '```'
      |      ELSE '```' || chr(10) || repeat('m', 1200) || chr(10) || '```' END AS page
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    regexp_extract_all(page, '(?s)```([A-Za-z0-9_+-]*)\n(.*?)```', 1) AS ls,
      |    regexp_extract_all(page, '(?s)```([A-Za-z0-9_+-]*)\n(.*?)```', 2) AS cs
      |  FROM pg),
      |e AS (
      |  SELECT doc_id,
      |    CAST(generate_subscripts(cs, 1) AS BIGINT) - 1 AS fence_idx,
      |    unnest(ls) AS lang, unnest(cs) AS code
      |  FROM f),
      |m AS (
      |  SELECT doc_id, fence_idx, lang, code,
      |    list_filter(string_split(code, chr(10)), l -> trim(l) != '') AS ne
      |  FROM e),
      |q AS (
      |  SELECT doc_id, fence_idx, lang,
      |    CAST(len(ne) AS BIGINT) AS n_code_lines,
      |    CAST(coalesce(list_max(list_transform(ne, l -> length(l))), 0) AS BIGINT)
      |      AS max_line_len,
      |    CAST(floor(CAST(coalesce(list_sum(list_transform(ne, l -> length(l))), 0)
      |      AS DOUBLE) * 1000000.0 / greatest(len(ne), 1) + 0.5) AS BIGINT)
      |      / 1000000.0 AS avg_line_len,
      |    CAST(floor(CAST(len(list_filter(ne, l ->
      |        starts_with(ltrim(l), '#') OR starts_with(ltrim(l), '//')
      |        OR starts_with(ltrim(l), '--'))) AS DOUBLE) * 1000000.0 /
      |      greatest(len(ne), 1) + 0.5) AS BIGINT) / 1000000.0 AS comment_ratio,
      |    CAST(floor(CAST(length(regexp_replace(code, '[^A-Za-z0-9]', '', 'g'))
      |      AS DOUBLE) * 1000000.0 / greatest(length(code), 1) + 0.5) AS BIGINT)
      |      / 1000000.0 AS alnum_frac,
      |    (contains(lower(code), 'auto-generated')
      |      OR contains(lower(code), 'do not edit')) AS autogen,
      |    code
      |  FROM m)
      |SELECT doc_id, fence_idx, lang, code,
      |       n_code_lines, max_line_len, avg_line_len, comment_ratio,
      |       alnum_frac, autogen,
      |       (max_line_len <= 1000 AND avg_line_len <= 100.0
      |        AND alnum_frac >= 0.25 AND NOT autogen) AS keep
      |FROM q ORDER BY doc_id, fence_idx""".stripMargin) { (s, dir) =>
    val pages = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(
        lit("```python\n# setup\nx = "), col("doc_id"), lit("\nprint(x)\n```")))
        .when(col("doc_id") % 3 === 1, concat(
          lit("```js\n// auto-generated do not edit\nvar x = "),
          col("doc_id"), lit(";\n```")))
        .otherwise(concat(lit("```\n"), lit("m" * 1200), lit("\n```")))
        .as("page"))
    TextAnalysis.codeQuality(
        TextAnalysis.codeFences(pages, "page", "doc_id")
          .select("doc_id", "fence_idx", "lang", "code"),
        "code")
      .orderBy("doc_id", "fence_idx")
  }

  // schema.org ld+json extraction — entity metadata mining for document
  // typing/provenance. Fixture residues plant an Article block with a
  // TRAILING SEMICOLON (the common real-page artifact — normalization
  // must strip it in both engines), a page with TWO blocks (Product + a
  // TRUNCATED one that must yield is_valid=false with null fields, not
  // an error), and a block-free page. Both engines probe the NORMALIZED
  // block (Spark's lenient-on-trailing-bytes readers vs DuckDB's strict
  // json_valid agree on this surface — divergence measured and
  // documented at WebOps.ldJson); hash-matched per block.
  register(
    "t99_ldjson",
    """WITH pg AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN '<html><head><script type="application/ld+json">'
      |        || '{"@type":"Article","name":"Post ' || doc_id || '"}; '
      |        || '</script></head><body>' || text || '</body></html>'
      |      WHEN 1 THEN '<script type=''application/ld+json''>'
      |        || '{"@type":"Product","name":"Widget ' || doc_id || '"}'
      |        || '</script><p>x</p><script type="application/ld+json">'
      |        || '{"@type":"Broken","name":' || '</script>'
      |      ELSE '<div>' || text || '</div>' END AS html
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    CAST(generate_subscripts(js, 1) AS BIGINT) - 1 AS block_idx,
      |    regexp_replace(unnest(js), '[;\s]+$', '') AS j
      |  FROM (SELECT doc_id, regexp_extract_all(html,
      |          '(?is)<script\s[^>]*type\s*=\s*["'']application/ld\+json["''][^>]*>(.*?)</script>',
      |          1) AS js FROM pg))
      |SELECT doc_id, block_idx,
      |       json_valid(j) AS is_valid,
      |       CASE WHEN json_valid(j)
      |            THEN json_extract_string(j, '$."@type"') END AS jtype,
      |       CASE WHEN json_valid(j)
      |            THEN json_extract_string(j, '$.name') END AS name
      |FROM b ORDER BY doc_id, block_idx""".stripMargin) { (s, dir) =>
    val pages = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(
        lit("<html><head><script type=\"application/ld+json\">" +
          "{\"@type\":\"Article\",\"name\":\"Post "), col("doc_id"),
        lit("\"}; </script></head><body>"), col("text"), lit("</body></html>")))
        .when(col("doc_id") % 3 === 1, concat(
          lit("<script type='application/ld+json'>" +
            "{\"@type\":\"Product\",\"name\":\"Widget "), col("doc_id"),
          lit("\"}</script><p>x</p><script type=\"application/ld+json\">" +
            "{\"@type\":\"Broken\",\"name\":</script>")))
        .otherwise(concat(lit("<div>"), col("text"), lit("</div>")))
        .as("html"))
    WebOps.ldJson(pages, "html", "doc_id").orderBy("doc_id", "block_idx")
  }

  // Script-aware token counting — the token-budget fix for no-space
  // scripts (a 40-char Chinese sentence is ONE whitespace token): CJK
  // code points count one token each, the non-CJK remainder counts
  // whitespace tokens after CJK chars become spaces (glued Latin still
  // splits). Residues plant glued Han, mixed-kana, Hangul-prefixed, and
  // pure-Latin shapes; hash-matched.
  register(
    "t100_script_aware_tokens",
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN text || ' 中文字符串很长'
      |      WHEN 1 THEN text || ' 日本語のテキストtext'
      |      WHEN 2 THEN '한국어텍스트 ' || text
      |      ELSE text END AS tx
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(list_filter(string_split_regex(tx, '\s+'), x -> x != ''))
      |    AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(tx,
      |    '[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}]')) AS BIGINT) AS cjk_chars,
      |  CAST(len(list_filter(string_split_regex(
      |      regexp_replace(tx, '[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}]', ' ', 'g'),
      |      '\s+'), x -> x != '')) AS BIGINT)
      |    + CAST(len(regexp_extract_all(tx,
      |        '[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}]')) AS BIGINT)
      |    AS effective_tokens
      |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val planted = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 0, concat(col("text"), lit(" 中文字符串很长")))
        .when(col("doc_id") % 4 === 1,
          concat(col("text"), lit(" 日本語のテキストtext")))
        .when(col("doc_id") % 4 === 2, concat(lit("한국어텍스트 "), col("text")))
        .otherwise(col("text")).as("tx"))
    TextAnalysis.scriptAwareTokens(planted, "tx", "doc_id")
      .orderBy("doc_id")
  }

  // HTML table extraction — the table-corpus miner (plain text
  // extraction collapses tables into word soup): every <table> explodes
  // into (doc_id, table_idx, row_idx, col_idx, is_header, cell) with
  // tag-stripped entity-decoded whitespace-collapsed cell text; header
  // flags from the tag name via the positionally-zipped second extract
  // (t97 pattern). Residues: header+data table with entities and inline
  // tags, a two-table page, the nested-table lazy-truncation edge
  // (documented regex semantics, identical in RE2), and a table-free
  // page that emits nothing. Hash-proven per cell.
  register(
    "t103_html_tables",
    s"""WITH pg AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN '<p>intro</p><table class="x"><tr><th>Name</th><th>Qty &amp; Price</th></tr>'
      |        || '<tr><td>item ' || doc_id || '</td><td><b>5</b> x 3</td></tr></table>'
      |      WHEN 1 THEN '<table><tr><td>a ' || doc_id || '</td><td>b</td></tr></table>'
      |        || '<p>between</p><table><tr><td>c</td></tr></table>'
      |      WHEN 2 THEN '<table><tr><td>outer<table><tr><td>inner</td></tr></table></td></tr></table>'
      |      ELSE '<p>no tables here ' || doc_id || '</p>' END AS html
      |  FROM documents),
      |tb AS (SELECT doc_id,
      |         CAST(generate_subscripts(regexp_extract_all(html, '(?is)<table[^>]*>(.*?)</table>', 1), 1) - 1 AS BIGINT) AS table_idx,
      |         unnest(regexp_extract_all(html, '(?is)<table[^>]*>(.*?)</table>', 1)) AS t
      |       FROM pg),
      |rw AS (SELECT doc_id, table_idx,
      |         CAST(generate_subscripts(regexp_extract_all(t, '(?is)<tr[^>]*>(.*?)</tr>', 1), 1) - 1 AS BIGINT) AS row_idx,
      |         unnest(regexp_extract_all(t, '(?is)<tr[^>]*>(.*?)</tr>', 1)) AS r
      |       FROM tb),
      |cl AS (SELECT doc_id, table_idx, row_idx,
      |         CAST(generate_subscripts(regexp_extract_all(r, '(?is)<t([dh])[^>]*>.*?</t[dh]>', 1), 1) - 1 AS BIGINT) AS col_idx,
      |         unnest(regexp_extract_all(r, '(?is)<t([dh])[^>]*>.*?</t[dh]>', 1)) AS tag,
      |         unnest(regexp_extract_all(r, '(?is)<t[dh][^>]*>(.*?)</t[dh]>', 1)) AS body
      |       FROM rw)
      |SELECT doc_id, table_idx, row_idx, col_idx,
      |       lower(tag) = 'h' AS is_header,
      |       regexp_replace(trim(${TextAnalysis.entityDecodeSql("regexp_replace(body, '<[^>]*>', '', 'g')")}), '\\s+', ' ', 'g') AS cell
      |FROM cl ORDER BY doc_id, table_idx, row_idx, col_idx""".stripMargin) {
    (s, dir) =>
    val pages = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 0, concat(
        lit("<p>intro</p><table class=\"x\"><tr><th>Name</th>" +
          "<th>Qty &amp; Price</th></tr><tr><td>item "), col("doc_id"),
        lit("</td><td><b>5</b> x 3</td></tr></table>")))
        .when(col("doc_id") % 4 === 1, concat(
          lit("<table><tr><td>a "), col("doc_id"),
          lit("</td><td>b</td></tr></table><p>between</p>" +
            "<table><tr><td>c</td></tr></table>")))
        .when(col("doc_id") % 4 === 2, lit(
          "<table><tr><td>outer<table><tr><td>inner</td></tr>" +
            "</table></td></tr></table>"))
        .otherwise(concat(lit("<p>no tables here "), col("doc_id"),
          lit("</p>"))).as("html"))
    TextAnalysis.htmlTables(pages, "html", "doc_id")
      .orderBy("doc_id", "table_idx", "row_idx", "col_idx")
  }

  // Soft-404 detection — HTTP-200 error pages (not-found, access-denied,
  // login walls) poison a corpus because every quality gate sees short
  // clean prose. Patterns come from a CONFIG TABLE (the default pack +
  // a non-English extension) with three anchor classes: `start` =
  // word-boundary at title start (so a healthy "Post N 404
  // retrospective" review stays clean — the false-positive the bare
  // substring probe had), `word` = word-boundary in the title, `phrase`
  // = substring in the (title + lead) probe. Residues plant the
  // 404-as-word healthy page (whose inline <script> literal says "page
  // not found" — script bodies strip before the probe, so it must stay
  // clean), a classic 404 title, an access-denied
  // page (body 'forbidden' must NOT hit the title-anchored pattern), a
  // Spanish error page (the non-English pack), and a title-less
  // body-only error; t75 blocklist shape, hash-proven.
  register(
    "t101_soft404",
    """WITH pg AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 5 AS INT)
      |      WHEN 0 THEN '<html><head><title>Post ' || doc_id || ' 404 retrospective</title></head><body>'
      |        || '<script>var e="page not found";</script><p>'
      |        || text || '</p></body></html>'
      |      WHEN 1 THEN '<html><head><title>404 Page Not Found</title></head>'
      |        || '<body>The page you requested was not found.</body></html>'
      |      WHEN 2 THEN '<html><title>Access Denied</title><body>forbidden: '
      |        || doc_id || '</body></html>'
      |      WHEN 3 THEN '<html><title>Error de página</title>'
      |        || '<body>página no encontrada.</body></html>'
      |      ELSE '<div>error 500: page not found while loading ' || doc_id || '</div>' END AS html
      |  FROM documents),
      |pats AS (SELECT * FROM (VALUES
      |    ('404','start'),('error 404','word'),('access denied','word'),
      |    ('forbidden','word'),('page not found','phrase'),
      |    ('not found','phrase'),('error 500','phrase'),
      |    ('página no encontrada','phrase'),
      |    ('seite nicht gefunden','phrase')) p(pattern, anchor)),
      |x AS (
      |  SELECT doc_id,
      |    regexp_replace(trim(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1)), '\s+', ' ', 'g') AS title,
      |    lower(regexp_replace(trim(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1)), '\s+', ' ', 'g')
      |      || ' | '
      |      || substr(trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')), 1, 200)) AS probe
      |  FROM (SELECT doc_id,
      |          regexp_replace(regexp_replace(pg.html,
      |            '(?is)<script(\s[^>]*)?>.*?</script>', '', 'g'),
      |            '(?is)<style(\s[^>]*)?>.*?</style>', '', 'g') AS html
      |        FROM pg)),
      |m AS (
      |  SELECT x.doc_id, p.pattern
      |  FROM x JOIN pats p ON
      |    CASE p.anchor
      |      WHEN 'start' THEN regexp_matches(lower(x.title),
      |        '^' || regexp_replace(p.pattern, '([.^$|()\[\]{}+?*\\])', '\\\1', 'g') || '\b')
      |      WHEN 'word' THEN regexp_matches(lower(x.title),
      |        '\b' || regexp_replace(p.pattern, '([.^$|()\[\]{}+?*\\])', '\\\1', 'g') || '\b')
      |      ELSE contains(x.probe, p.pattern) END),
      |g AS (SELECT doc_id, list_sort(list_distinct(list(pattern))) AS hits
      |      FROM m GROUP BY doc_id)
      |SELECT x.doc_id, x.title,
      |       coalesce(array_to_string(g.hits, ','), '') AS matched,
      |       CAST(coalesce(len(g.hits), 0) AS BIGINT) AS n_matched,
      |       coalesce(len(g.hits), 0) > 0 AS soft404
      |FROM x LEFT JOIN g USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val pats = (WebOps.DefaultSoft404Patterns ++ Seq(
      "página no encontrada" -> "phrase",
      "seite nicht gefunden" -> "phrase")).toDF("pattern", "anchor")
    val pages = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(
        lit("<html><head><title>Post "), col("doc_id"),
        lit(" 404 retrospective</title></head><body>" +
          "<script>var e=\"page not found\";</script><p>"), col("text"),
        lit("</p></body></html>")))
        .when(col("doc_id") % 5 === 1, lit(
          "<html><head><title>404 Page Not Found</title></head>" +
            "<body>The page you requested was not found.</body></html>"))
        .when(col("doc_id") % 5 === 2, concat(
          lit("<html><title>Access Denied</title><body>forbidden: "),
          col("doc_id"), lit("</body></html>")))
        .when(col("doc_id") % 5 === 3, lit(
          "<html><title>Error de página</title>" +
            "<body>página no encontrada.</body></html>"))
        .otherwise(concat(
          lit("<div>error 500: page not found while loading "),
          col("doc_id"), lit("</div>"))).as("html"))
    WebOps.soft404(pages, "html", "doc_id", pats).orderBy("doc_id")
  }
}
