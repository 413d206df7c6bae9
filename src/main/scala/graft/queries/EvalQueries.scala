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
import graft.pipeline.{Dedup, Eval, Multimodal, Preference, Similarity, Sketches, TextAnalysis}

/** Eval metrics and preference/label QA: ROUGE/BLEU/chrF/WER, ROC-AUC,
  * calibration, pass@k, agreement coefficients, Dawid-Skene,
  * Bradley-Terry, MBR selection. */
private[graft] trait EvalQueries extends RegistryBase {


  // Preference-pair format audit (RLHF data QA): chosen/rejected pairs
  // built from doc pairs, with adversarial branches — every 17th pair
  // identical (vacuous label), every 23rd an empty chosen side. The
  // audit is a pure scan-side projection (no shuffle); token counts are
  // the t1 whitespace definition, the length ratio micro-floors before
  // the 6 dp emit. Hash oracle over the full audit row.
  register(
    "t54_preference_audit",
    """WITH pairs AS (
      |  SELECT a.doc_id AS pair_id,
      |         CASE WHEN a.doc_id % 17 = 0 THEN b.text
      |              WHEN a.doc_id % 23 = 0 THEN '' ELSE a.text END AS chosen,
      |         b.text AS rejected
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 25),
      |tok AS (
      |  SELECT pair_id, chosen, rejected,
      |         len(list_filter(string_split_regex(chosen, '\s+'),
      |             x -> x != '')) AS ct,
      |         len(list_filter(string_split_regex(rejected, '\s+'),
      |             x -> x != '')) AS rt
      |  FROM pairs)
      |SELECT pair_id,
      |       CAST(ct AS BIGINT) AS chosen_toks,
      |       CAST(rt AS BIGINT) AS rejected_toks,
      |       chosen = rejected AS identical,
      |       (trim(chosen) = '' OR trim(rejected) = '') AS empty_side,
      |       ct > rt AS chosen_longer,
      |       CASE WHEN rt > 0
      |            THEN floor(ct * 1000000.0 / rt + 0.5) / 1000000.0
      |       END AS len_ratio,
      |       (NOT chosen = rejected
      |        AND NOT (trim(chosen) = '' OR trim(rejected) = '')) AS valid
      |FROM tok ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val pairs = d.as("a").join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 25)
      .select(col("a.doc_id").as("pair_id"),
        when(col("a.doc_id") % 17 === 0, col("b.text"))
          .when(col("a.doc_id") % 23 === 0, lit(""))
          .otherwise(col("a.text")).as("chosen"),
        col("b.text").as("rejected"))
    Preference.pairAudit(pairs, "pair_id", "chosen", "rejected")
      .orderBy("pair_id")
  }


  // Length-bias audit (reward-hacking pre-check on preference data):
  // pairs (a, a+25) with a PLANTED 2/3 bias — two of three pairs pick
  // the longer doc as chosen, every third picks the shorter — so
  // longer_win_rate must land near 2/3 and effect_size positive. All
  // cross-row state is integer sums (Σd, Σd²); the mean/sd/sqrt tail is
  // one identically-spelled double expression in both engines.
  register(
    "t84_length_bias",
    """WITH p AS (
      |  SELECT a.doc_id AS pid, a.text AS ta, b.text AS tb,
      |         len(list_filter(string_split_regex(a.text, '\s+'), x -> x != '')) AS na,
      |         len(list_filter(string_split_regex(b.text, '\s+'), x -> x != '')) AS nb
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 25),
      |pr AS (
      |  SELECT CASE WHEN (pid % 3 = 0) = (na >= nb) THEN tb ELSE ta END AS chosen,
      |         CASE WHEN (pid % 3 = 0) = (na >= nb) THEN ta ELSE tb END AS rejected
      |  FROM p),
      |t AS (
      |  SELECT len(list_filter(string_split_regex(chosen, '\s+'), x -> x != '')) -
      |         len(list_filter(string_split_regex(rejected, '\s+'), x -> x != '')) AS d
      |  FROM pr),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |         CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ties,
      |         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS longer_wins,
      |         CAST(sum(d) AS BIGINT) AS sd, CAST(sum(d * d) AS BIGINT) AS sd2
      |  FROM t)
      |SELECT n_pairs, n_ties, longer_wins,
      |  CASE WHEN n_pairs - n_ties > 0
      |       THEN floor(CAST(longer_wins AS DOUBLE) * 1000000.0 /
      |                  CAST(n_pairs - n_ties AS DOUBLE) + 0.5) / 1000000.0
      |  END AS longer_win_rate,
      |  CASE WHEN n_pairs > 0
      |       THEN floor(CAST(sd AS DOUBLE) / CAST(n_pairs AS DOUBLE) *
      |                  1000000.0 + 0.5) / 1000000.0
      |  END AS mean_len_delta,
      |  CASE WHEN n_pairs > 1 AND
      |            (CAST(sd2 AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) /
      |             CAST(n_pairs AS DOUBLE)) / (CAST(n_pairs AS DOUBLE) - 1.0) > 0
      |       THEN floor(CAST(sd AS DOUBLE) / CAST(n_pairs AS DOUBLE) /
      |                  sqrt((CAST(sd2 AS DOUBLE) -
      |                        CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) /
      |                        CAST(n_pairs AS DOUBLE)) /
      |                       (CAST(n_pairs AS DOUBLE) - 1.0)) *
      |                  1000000.0 + 0.5) / 1000000.0
      |  END AS effect_size
      |FROM a""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"),
      size(TextAnalysis.tokens(col("text"))).as("__n"))
    val p = d.as("a").join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 25)
      .select(col("a.doc_id").as("pid"), col("a.text").as("ta"),
        col("b.text").as("tb"), col("a.__n").as("na"), col("b.__n").as("nb"))
    val flip = (col("pid") % 3 === 0) === (col("na") >= col("nb"))
    val pairs = p.select(
      when(flip, col("tb")).otherwise(col("ta")).as("chosen"),
      when(flip, col("ta")).otherwise(col("tb")).as("rejected"))
    Preference.lengthBias(pairs, "chosen", "rejected")
  }

  // Fleiss' kappa (inter-rater agreement): three synthetic raters label
  // each doc's language, each rater disagreeing on a deterministic 2/5
  // of (doc, rater) slots (defaulting to 'en') — the labeling-batch
  // acceptance gate. Every fraction micro-floors BEFORE any cross-row
  // sum, so the single output row hash-matches exactly.
  register(
    "t55_fleiss_kappa",
    """WITH ratings AS (
      |  SELECT doc_id AS item,
      |         CASE WHEN (doc_id * 3 + r) % 5 < 3 THEN lang
      |              ELSE 'en' END AS label
      |  FROM documents, (SELECT unnest([0, 1, 2]) AS r)),
      |counts AS (
      |  SELECT item, label, count(*) AS c FROM ratings GROUP BY 1, 2),
      |per_item AS (
      |  SELECT item, CAST(sum(c) AS BIGINT) AS n,
      |         CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM counts GROUP BY 1 HAVING sum(c) >= 2),
      |items_agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_items,
      |         CAST(sum(n) AS BIGINT) AS n_ratings,
      |         CAST(sum(CAST(floor(CAST(s2 - n AS DOUBLE) * 1000000.0 /
      |           (n * (n - 1)) + 0.5) AS BIGINT)) AS BIGINT) AS po_sum
      |  FROM per_item),
      |cat AS (
      |  SELECT label, CAST(sum(c) AS BIGINT) AS tc FROM counts
      |  WHERE item IN (SELECT item FROM per_item) GROUP BY 1),
      |cat_agg AS (
      |  SELECT CAST(sum(CAST(floor((CAST(tc AS DOUBLE) / t.n_ratings) *
      |           (CAST(tc AS DOUBLE) / t.n_ratings) * 1000000.0 + 0.5)
      |           AS BIGINT)) AS BIGINT) AS pe_sum
      |  FROM cat, items_agg t)
      |SELECT n_items, n_ratings,
      |       CAST(floor(CAST(po_sum AS DOUBLE) / n_items + 0.5) AS BIGINT)
      |         / 1000000.0 AS po,
      |       pe_sum / 1000000.0 AS pe,
      |       CASE WHEN pe_sum < 1000000 THEN
      |         floor(CAST(CAST(floor(CAST(po_sum AS DOUBLE) / n_items + 0.5)
      |           AS BIGINT) - pe_sum AS DOUBLE) * 1000000.0 /
      |           (1000000 - pe_sum) + 0.5) / 1000000.0
      |       END AS kappa
      |FROM items_agg, cat_agg""".stripMargin) { (s, dir) =>
    val ratings = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0), lit(2))).as("r"))
      .select(col("doc_id"),
        when((col("doc_id") * 3 + col("r")) % 5 < 3, col("lang"))
          .otherwise(lit("en")).as("label"))
    Preference.fleissKappa(ratings, "doc_id", "label")
  }


  // Unbiased pass@k (HumanEval estimator) over synthetic per-sample
  // outcomes: ~n/200 samples per problem, 30% pass rate. The
  // combinatorial C(n-c,k)/C(n,k) runs as the SAME left-to-right k-term
  // product fold in both engines (each term a rational of exact
  // integers), so the trajectory is engine-exact; n<k problems null,
  // n-c<k problems score exactly 1 — hash oracle.
  register(
    "t66_pass_at_k",
    """WITH s AS (
      |  SELECT doc_id % 200 AS problem_id,
      |         CASE WHEN (doc_id * 7) % 10 < 3 THEN 1 ELSE 0 END AS p
      |  FROM documents),
      |g AS (
      |  SELECT problem_id, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(p) AS BIGINT) AS c
      |  FROM s GROUP BY 1)
      |SELECT problem_id, n, c,
      |  CASE WHEN n < 1 THEN NULL WHEN n - c < 1 THEN 1.0
      |       ELSE round(1.0 - list_reduce(list_transform(
      |         generate_series(0, 0),
      |         i -> CAST(n - c - i AS DOUBLE) / (n - i)),
      |         (a, b) -> a * b), 6) END AS pass_at_1,
      |  CASE WHEN n < 3 THEN NULL WHEN n - c < 3 THEN 1.0
      |       ELSE round(1.0 - list_reduce(list_transform(
      |         generate_series(0, 2),
      |         i -> CAST(n - c - i AS DOUBLE) / (n - i)),
      |         (a, b) -> a * b), 6) END AS pass_at_3
      |FROM g ORDER BY problem_id""".stripMargin) { (s, dir) =>
    val samples = t(s, dir, "documents").select(
      (col("doc_id") % 200).as("problem_id"),
      when((col("doc_id") * 7) % 10 < 3, 1).otherwise(0).as("p"))
    Eval.passAtK(samples, "problem_id", "p", ks = Seq(1, 3))
      .orderBy("problem_id")
  }


  // Per-class precision/recall/F1 + macro row for the t3/t42 language-ID
  // classifier against gold labels — the confusion-matrix report that
  // accuracy (t42) flattens away. One pre-combined (truth, pred) count;
  // per-class ratios micro-floor; the macro row averages truth-present
  // classes with an explicit Σ/n (avg()'s accumulation is
  // engine-specific). Hash oracle over class rows + macro.
  register(
    "t67_classification_report",
    """WITH toks AS (
      |  SELECT doc_id, lang, list_distinct(list_filter(
      |    string_split_regex(lower(text), '\s+'), x -> x != '')) AS tk
      |  FROM documents),
      |pred AS (
      |  SELECT lang AS t, CASE
      |    WHEN len(list_intersect(tk, ['the','a','and','scan','join'])) >=
      |         len(list_intersect(tk, ['el','la','que','datos']))
      |     AND len(list_intersect(tk, ['the','a','and','scan','join'])) >=
      |         len(list_intersect(tk, ['der','die','und','das'])) THEN 'en'
      |    WHEN len(list_intersect(tk, ['el','la','que','datos'])) >=
      |         len(list_intersect(tk, ['der','die','und','das'])) THEN 'es'
      |    ELSE 'de' END AS p
      |  FROM toks),
      |cells AS (SELECT t, p, CAST(count(*) AS BIGINT) AS n
      |          FROM pred GROUP BY 1, 2),
      |truth AS (SELECT t AS label, CAST(sum(n) AS BIGINT) AS n_true
      |          FROM cells GROUP BY 1),
      |pr AS (SELECT p AS label, CAST(sum(n) AS BIGINT) AS n_pred
      |       FROM cells GROUP BY 1),
      |tp AS (SELECT t AS label, n AS tp FROM cells WHERE t = p),
      |pc AS (
      |  SELECT coalesce(truth.label, pr.label) AS label,
      |         coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred,
      |         coalesce(tp.tp, 0) AS tp
      |  FROM truth FULL JOIN pr ON pr.label = truth.label
      |             LEFT JOIN tp ON tp.label = coalesce(truth.label, pr.label)),
      |m AS (
      |  SELECT label, n_true, n_pred, tp,
      |    CASE WHEN n_pred > 0 THEN CAST(floor(CAST(tp AS DOUBLE) *
      |      1000000.0 / n_pred + 0.5) AS BIGINT) END AS pm,
      |    CASE WHEN n_true > 0 THEN CAST(floor(CAST(tp AS DOUBLE) *
      |      1000000.0 / n_true + 0.5) AS BIGINT) END AS rm
      |  FROM pc),
      |m2 AS (
      |  SELECT label, n_true, n_pred, tp, pm, rm,
      |    CASE WHEN pm IS NOT NULL AND rm IS NOT NULL THEN
      |      CASE WHEN pm + rm > 0 THEN CAST(floor(CAST(pm * rm * 2 AS
      |        DOUBLE) / (pm + rm) + 0.5) AS BIGINT) ELSE 0 END END AS fm
      |  FROM m),
      |mac AS (
      |  SELECT '__macro__' AS label,
      |    CAST(sum(n_true) AS BIGINT) AS n_true,
      |    CAST(sum(n_pred) AS BIGINT) AS n_pred,
      |    CAST(sum(tp) AS BIGINT) AS tp,
      |    CAST(floor(CAST(sum(coalesce(pm, 0)) AS DOUBLE) / count(*) + 0.5)
      |      AS BIGINT) AS pm,
      |    CAST(floor(CAST(sum(coalesce(rm, 0)) AS DOUBLE) / count(*) + 0.5)
      |      AS BIGINT) AS rm,
      |    CAST(floor(CAST(sum(coalesce(fm, 0)) AS DOUBLE) / count(*) + 0.5)
      |      AS BIGINT) AS fm
      |  FROM m2 WHERE n_true > 0)
      |SELECT label, n_true, n_pred, tp, pm / 1000000.0 AS precision,
      |       rm / 1000000.0 AS recall, fm / 1000000.0 AS f1
      |FROM (SELECT * FROM m2 UNION ALL SELECT * FROM mac)
      |ORDER BY label""".stripMargin) { (s, dir) =>
    val scored = t(s, dir, "documents").select(col("lang").as("truth"),
      TextAnalysis.langId(col("text"), Seq(
        "en" -> Seq("the", "a", "and", "scan", "join"),
        "es" -> Seq("el", "la", "que", "datos"),
        "de" -> Seq("der", "die", "und", "das"))).as("pred"))
    Eval.classificationReport(scored, "truth", "pred").orderBy("label")
  }


  // chrF2 over character-corrupted candidates: every 3rd doc's candidate
  // has e->3 substitutions (the tokenization-free metric still scores
  // partial char overlap where word-gram BLEU collapses), every 31st is
  // empty. Whitespace-stripped char grams of orders 1-6 ride one
  // side-tagged explode; all six orders' P/R micro-floor before the
  // 5PR/(4P+R) harmonic — hash oracle.
  register(
    "t65_chrf",
    """WITH w AS (
      |  SELECT doc_id AS pair_id, substring(text, 1, 120) AS ref0
      |  FROM documents),
      |p AS (
      |  SELECT pair_id,
      |         CASE WHEN pair_id % 31 = 0 THEN ''
      |              WHEN pair_id % 3 = 0 THEN replace(ref0, 'e', '3')
      |              ELSE ref0 END AS cand0, ref0
      |  FROM w),
      |s AS (
      |  SELECT pair_id,
      |         regexp_replace(lower(cand0), '\s+', '', 'g') AS cs,
      |         regexp_replace(lower(ref0), '\s+', '', 'g') AS rs
      |  FROM p),
      |n6 AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n),
      |cg AS (
      |  SELECT pair_id, n, g, count(*) AS cc FROM (
      |    SELECT pair_id, n, unnest(list_transform(
      |      generate_series(1, greatest(length(cs) - n + 1, 0)),
      |      i -> substring(cs, i, n))) AS g FROM s, n6) GROUP BY 1, 2, 3),
      |rg AS (
      |  SELECT pair_id, n, g, count(*) AS rc FROM (
      |    SELECT pair_id, n, unnest(list_transform(
      |      generate_series(1, greatest(length(rs) - n + 1, 0)),
      |      i -> substring(rs, i, n))) AS g FROM s, n6) GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT c.pair_id, c.n, CAST(sum(least(c.cc, r.rc)) AS BIGINT) AS mg
      |  FROM cg c JOIN rg r ON r.pair_id = c.pair_id AND r.n = c.n
      |                     AND r.g = c.g
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT pair_id, n,
      |         CAST(greatest(length(cs) - n + 1, 0) AS BIGINT) AS cn,
      |         CAST(greatest(length(rs) - n + 1, 0) AS BIGINT) AS rn
      |  FROM s, n6),
      |pn AS (
      |  SELECT t.pair_id, t.n,
      |    CASE WHEN t.cn > 0 THEN CAST(floor(CAST(coalesce(m.mg, 0) AS
      |      DOUBLE) * 1000000.0 / t.cn + 0.5) AS BIGINT) ELSE 0 END AS pm,
      |    CASE WHEN t.rn > 0 THEN CAST(floor(CAST(coalesce(m.mg, 0) AS
      |      DOUBLE) * 1000000.0 / t.rn + 0.5) AS BIGINT) ELSE 0 END AS rm
      |  FROM tot t LEFT JOIN m ON m.pair_id = t.pair_id AND m.n = t.n),
      |pp AS (
      |  SELECT pair_id,
      |         CAST(floor(CAST(sum(pm) AS DOUBLE) / 6 + 0.5) AS BIGINT)
      |           AS pmm,
      |         CAST(floor(CAST(sum(rm) AS DOUBLE) / 6 + 0.5) AS BIGINT)
      |           AS rmm
      |  FROM pn GROUP BY 1)
      |SELECT s.pair_id, CAST(length(cs) AS BIGINT) AS cand_chars,
      |       CAST(length(rs) AS BIGINT) AS ref_chars,
      |       pmm / 1000000.0 AS chr_p, rmm / 1000000.0 AS chr_r,
      |       CASE WHEN pmm * 4 + rmm > 0 THEN
      |         floor(CAST(pmm * rmm * 5 AS DOUBLE) / (pmm * 4 + rmm) + 0.5)
      |           / 1000000.0
      |       ELSE 0.0 END AS chrf2
      |FROM s JOIN pp ON pp.pair_id = s.pair_id
      |ORDER BY s.pair_id""".stripMargin) { (s, dir) =>
    val ref0 = substring(col("text"), 1, 120)
    val p = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), ref0.as("ref0"))
      .select(col("pair_id"),
        when(col("pair_id") % 31 === 0, lit(""))
          .when(col("pair_id") % 3 === 0,
            regexp_replace(col("ref0"), "e", "3"))
          .otherwise(col("ref0")).as("cand"),
        col("ref0").as("ref"))
    Eval.chrF(p, "pair_id", "cand", "ref").orderBy("pair_id")
  }


  // Exact tie-aware ROC-AUC over the SAME synthetic overconfident
  // classifier as t60 — calibration (t60) and discrimination (this row)
  // are the two halves of a corpus-filter QA report. The Mann–Whitney
  // midrank algebra runs entirely on integers (2·rank sums), so the
  // one-row result hash-matches exactly.
  register(
    "t64_roc_auc",
    """WITH sc AS (
      |  SELECT CAST((doc_id * 37) % 101 AS DOUBLE) / 100.0 AS conf,
      |         CASE WHEN (doc_id * 53) % 100 <
      |                   ((doc_id * 37) % 101) * 0.8
      |              THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |m AS (SELECT CAST(floor(conf * 1000000.0 + 0.5) AS BIGINT) AS s, y
      |      FROM sc),
      |g AS (SELECT s, CAST(count(*) AS BIGINT) AS tied,
      |             CAST(sum(y) AS BIGINT) AS tied_pos
      |      FROM m GROUP BY 1),
      |w AS (SELECT s, tied, tied_pos,
      |             CAST(coalesce(sum(tied) OVER (ORDER BY s ROWS BETWEEN
      |               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |               AS below
      |      FROM g),
      |a AS (SELECT CAST(sum(tied_pos) AS BIGINT) AS n_pos,
      |             CAST(sum(tied - tied_pos) AS BIGINT) AS n_neg,
      |             CAST(sum(tied_pos * (below * 2 + tied + 1)) AS BIGINT)
      |               AS r2
      |      FROM w)
      |SELECT n_pos, n_neg,
      |       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |         floor(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) * 1000000.0
      |           / (n_pos * n_neg * 2) + 0.5) / 1000000.0 END AS auc
      |FROM a""".stripMargin) { (s, dir) =>
    val scored = t(s, dir, "documents").select(
      (((col("doc_id") * 37) % 101).cast("double") / 100.0).as("conf"),
      when((col("doc_id") * 53) % 100 <
        ((col("doc_id") * 37) % 101) * 0.8, 1).otherwise(0).as("y"))
    Eval.rocAuc(scored, "conf", "y")
  }


  // Wilson-interval win rates per language matchup — the arena-style
  // reporting table beside t56's Bradley–Terry strengths, on the SAME
  // match construction. The Wilson algebra is one fixed-shape double
  // expression over exact (wins, n) integers, spelled IDENTICALLY here
  // and in the oracle (z² always written 1.96*1.96 — a 3.8416 literal
  // would parse to different bits), rounded at 6 dp.
  register(
    "t63_win_rate_wilson",
    """WITH m AS (
      |  SELECT a.lang AS a, b.lang AS b,
      |         CASE WHEN a.n_chars >= b.n_chars THEN a.lang
      |              ELSE b.lang END AS winner
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.lang <> b.lang),
      |pc AS (
      |  SELECT least(a, b) AS item_i, greatest(a, b) AS item_j,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN winner = least(a, b) THEN 1 ELSE 0 END)
      |           AS BIGINT) AS wins
      |  FROM m GROUP BY 1, 2)
      |SELECT item_i, item_j, n, wins,
      |       floor(CAST(wins AS DOUBLE) * 1000000.0 / n + 0.5) / 1000000.0
      |         AS win_rate,
      |       round((CAST(wins AS DOUBLE) / n + (1.96*1.96) / (n * 2) -
      |         1.96 * sqrt((CAST(wins AS DOUBLE) / n *
      |           (1.0 - CAST(wins AS DOUBLE) / n) + (1.96*1.96) / (n * 4))
      |           / n)) / (1.0 + (1.96*1.96) / n), 6) AS wilson_lo,
      |       round((CAST(wins AS DOUBLE) / n + (1.96*1.96) / (n * 2) +
      |         1.96 * sqrt((CAST(wins AS DOUBLE) / n *
      |           (1.0 - CAST(wins AS DOUBLE) / n) + (1.96*1.96) / (n * 4))
      |           / n)) / (1.0 + (1.96*1.96) / n), 6) AS wilson_hi
      |FROM pc ORDER BY item_i, item_j""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val m = d.as("a").join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1)
      .where(col("a.lang") =!= col("b.lang"))
      .select(col("a.lang").as("a"), col("b.lang").as("b"),
        when(col("a.n_chars") >= col("b.n_chars"), col("a.lang"))
          .otherwise(col("b.lang")).as("winner"))
    Preference.winRateIntervals(m, "a", "b", "winner")
      .orderBy("item_i", "item_j")
  }


  // Krippendorff's alpha with MISSING rating slots — the regime Fleiss'
  // kappa (t55) can't handle: every (doc, rater) slot where
  // (doc_id + r) % 7 = 0 is absent, so units carry 2 or 3 pairable
  // ratings and sub-2 units drop. Per-unit disagreement terms
  // micro-floor before the one cross-row sum; hash oracle on the
  // single (n_items, n_ratings, d_obs, d_exp, alpha) row.
  register(
    "t62_krippendorff_alpha",
    """WITH ratings AS (
      |  SELECT doc_id AS item,
      |         CASE WHEN (doc_id * 3 + r) % 5 < 3 THEN lang
      |              ELSE 'en' END AS label
      |  FROM documents, (SELECT unnest([0, 1, 2]) AS r)
      |  WHERE (doc_id + r) % 7 != 0),
      |counts AS (
      |  SELECT item, label, count(*) AS c FROM ratings GROUP BY 1, 2),
      |per_item AS (
      |  SELECT item, CAST(sum(c) AS BIGINT) AS n
      |  FROM counts GROUP BY 1 HAVING sum(c) >= 2),
      |withn AS (
      |  SELECT c.item, c.label, c.c, p.n
      |  FROM counts c JOIN per_item p ON p.item = c.item),
      |items_agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_items,
      |         CAST(sum(n) AS BIGINT) AS n_ratings FROM per_item),
      |do_agg AS (
      |  SELECT CAST(sum(CAST(floor(CAST(c * (n - c) AS DOUBLE) * 1000000.0
      |    / (n - 1) + 0.5) AS BIGINT)) AS BIGINT) AS do_sum FROM withn),
      |cat AS (
      |  SELECT label, CAST(sum(c) AS BIGINT) AS nc FROM withn GROUP BY 1),
      |de_agg AS (
      |  SELECT CAST(sum(nc * (t.n_ratings - nc)) AS BIGINT) AS de_sum
      |  FROM cat, items_agg t),
      |micro AS (
      |  SELECT n_items, n_ratings,
      |         CAST(floor(CAST(do_sum AS DOUBLE) / n_ratings + 0.5)
      |           AS BIGINT) AS dom,
      |         CAST(floor(CAST(de_sum AS DOUBLE) * 1000000.0 /
      |           (n_ratings * (n_ratings - 1)) + 0.5) AS BIGINT) AS dem
      |  FROM items_agg, do_agg, de_agg)
      |SELECT n_items, n_ratings,
      |       dom / 1000000.0 AS d_obs, dem / 1000000.0 AS d_exp,
      |       CASE WHEN dem > 0 THEN floor(CAST(dem - dom AS DOUBLE) *
      |         1000000.0 / dem + 0.5) / 1000000.0 END AS alpha
      |FROM micro""".stripMargin) { (s, dir) =>
    val ratings = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0), lit(2))).as("r"))
      .where((col("doc_id") + col("r")) % 7 =!= 0)
      .select(col("doc_id"),
        when((col("doc_id") * 3 + col("r")) % 5 < 3, col("lang"))
          .otherwise(lit("en")).as("label"))
    Preference.krippendorffAlpha(ratings, "doc_id", "label")
  }


  // Grouped-jackknife confidence interval on the corpus mean quality
  // score — the deterministic error bar (no RNG, so it fits the
  // exactness contract where bootstrap cannot): 20 doc_id-modulo
  // buckets, leave-one-out means, Efron-Stein variance. One corpus
  // scan collapses to 20 (count, sum) rows; all else is B-row integer
  // math with one IEEE-exact sqrt — hash oracle on the single row.
  register(
    "t70_jackknife_ci",
    """WITH q AS (
      |  SELECT doc_id % 20 AS b,
      |    CAST(floor(round(
      |      greatest(0.0,
      |        least(length(text) / 500.0, 1.0) * 0.4 +
      |        least((len(list_filter(string_split_regex(lower(text), '\s+'),
      |                x -> x IN ('the','a','of','and','to','in'))) ::DOUBLE /
      |               greatest(len(list_filter(string_split_regex(lower(text),
      |                '\s+'), x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |        (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |                     greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6)
      |      * 1000000.0 + 0.5) AS BIGINT) AS v
      |  FROM documents),
      |pb AS (SELECT b, CAST(count(*) AS BIGINT) AS bn,
      |              CAST(sum(v) AS BIGINT) AS bs FROM q GROUP BY 1),
      |tot AS (SELECT CAST(sum(bn) AS BIGINT) AS n,
      |               CAST(sum(bs) AS BIGINT) AS s,
      |               CAST(count(*) AS BIGINT) AS nb FROM pb),
      |loo AS (
      |  SELECT t.n, t.s, t.nb,
      |         CASE WHEN t.n > pb.bn THEN CAST(floor(CAST(t.s - pb.bs AS
      |           DOUBLE) / (t.n - pb.bn) + 0.5) AS BIGINT) END AS theta
      |  FROM pb, tot t),
      |tm AS (SELECT CAST(floor(CAST(sum(theta) AS DOUBLE) / count(theta)
      |         + 0.5) AS BIGINT) AS tm FROM loo),
      |ssx AS (SELECT max(l.n) AS n, max(l.s) AS s, max(l.nb) AS nb,
      |               CAST(sum((l.theta - t.tm) * (l.theta - t.tm))
      |                 AS BIGINT) AS ss
      |        FROM loo l, tm t),
      |fin AS (SELECT n, nb,
      |          CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS meanm,
      |          CASE WHEN nb > 1 AND ss IS NOT NULL THEN
      |            CAST(floor(sqrt(CAST(nb - 1 AS DOUBLE) * ss / nb) + 0.5)
      |              AS BIGINT) END AS sem
      |        FROM ssx)
      |SELECT n, nb AS n_buckets, meanm / 1000000.0 AS mean,
      |       sem / 1000000.0 AS se,
      |       (meanm - CAST(floor(CAST(sem AS DOUBLE) * 1.96 + 0.5)
      |         AS BIGINT)) / 1000000.0 AS lo,
      |       (meanm + CAST(floor(CAST(sem AS DOUBLE) * 1.96 + 0.5)
      |         AS BIGINT)) / 1000000.0 AS hi
      |FROM fin""".stripMargin) { (s, dir) =>
    val scored = t(s, dir, "documents").select(
      (col("doc_id") % 20).as("bucket"),
      TextAnalysis.qualityScore(col("text"),
        Seq("the", "a", "of", "and", "to", "in")).as("quality"))
    Eval.jackknifeCI(scored, "quality", "bucket")
  }


  // Minimum-Bayes-risk candidate selection: 5 "samples" per problem
  // (doc_id % 100 buckets), winner = max mean pairwise ROUGE-2 F1.
  // EXACT oracle — the pairwise clipped-gram algebra is fully
  // SQL-expressible, so unlike ROUGE-L rows no planting is needed.
  register(
    "t79_mbr_select",
    """WITH c AS (
      |  SELECT doc_id % 100 AS problem, doc_id AS cand_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |tk AS (SELECT problem, cand_id,
      |         CASE WHEN len(toks) >= 2 THEN
      |           list_transform(generate_series(1, len(toks) - 1),
      |             i -> md5(toks[i] || ' ' || toks[i+1]))
      |         ELSE [] END AS gs FROM c),
      |g AS (SELECT problem, cand_id, gk, CAST(count(*) AS BIGINT) AS c
      |      FROM (SELECT problem, cand_id, unnest(gs) AS gk FROM tk)
      |      GROUP BY 1, 2, 3),
      |tot AS (SELECT problem, cand_id, CAST(sum(c) AS BIGINT) AS ng
      |        FROM g GROUP BY 1, 2),
      |ids AS (SELECT t.problem, t.cand_id, coalesce(tot.ng, 0) AS ng
      |        FROM (SELECT problem, cand_id FROM c) t
      |        LEFT JOIN tot USING (problem, cand_id)),
      |pr AS (SELECT a.problem, a.cand_id AS ida, b.cand_id AS idb,
      |              a.ng AS na, b.ng AS nb
      |       FROM ids a JOIN ids b
      |         ON a.problem = b.problem AND a.cand_id != b.cand_id),
      |mt AS (SELECT x.problem, x.cand_id AS ida, y.cand_id AS idb,
      |              CAST(sum(least(x.c, y.c)) AS BIGINT) AS m
      |       FROM g x JOIN g y ON x.problem = y.problem AND x.gk = y.gk
      |         AND x.cand_id != y.cand_id
      |       GROUP BY 1, 2, 3),
      |f AS (SELECT problem, ida, pm, rm FROM (
      |        SELECT pr.problem, pr.ida,
      |          CASE WHEN na > 0 THEN CAST(floor(CAST(coalesce(mt.m, 0)
      |            AS DOUBLE) * 1000000.0 / na + 0.5) AS BIGINT) END AS pm,
      |          CASE WHEN nb > 0 THEN CAST(floor(CAST(coalesce(mt.m, 0)
      |            AS DOUBLE) * 1000000.0 / nb + 0.5) AS BIGINT) END AS rm
      |        FROM pr LEFT JOIN mt ON pr.problem = mt.problem
      |          AND pr.ida = mt.ida AND pr.idb = mt.idb)),
      |f1 AS (SELECT problem, ida,
      |         CASE WHEN pm IS NOT NULL AND rm IS NOT NULL THEN
      |           CASE WHEN pm + rm > 0 THEN
      |             CAST(floor(CAST(pm * rm * 2 AS DOUBLE) / (pm + rm) + 0.5)
      |               AS BIGINT)
      |           ELSE CAST(0 AS BIGINT) END
      |         ELSE CAST(0 AS BIGINT) END AS f1m FROM f),
      |pc AS (SELECT problem, ida, CAST(sum(f1m) AS BIGINT) AS sf,
      |              CAST(count(*) AS BIGINT) AS np FROM f1 GROUP BY 1, 2),
      |kt AS (SELECT problem, CAST(count(*) AS BIGINT) AS k
      |       FROM ids GROUP BY 1),
      |al AS (SELECT ids.problem, ids.cand_id AS ida, pc.sf, pc.np, kt.k
      |       FROM ids LEFT JOIN pc ON ids.problem = pc.problem
      |         AND ids.cand_id = pc.ida
      |       JOIN kt ON ids.problem = kt.problem),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY problem ORDER BY
      |         (CASE WHEN np IS NOT NULL THEN
      |            floor(CAST(sf AS DOUBLE) / np + 0.5) END) DESC,
      |         ida ASC) AS rnk FROM al)
      |SELECT problem, ida AS winner_id,
      |       CASE WHEN np IS NOT NULL THEN
      |         floor(CAST(sf AS DOUBLE) / np + 0.5) / 1000000.0 END
      |         AS mbr_score, k
      |FROM rk WHERE rnk = 1 ORDER BY problem""".stripMargin) { (s, dir) =>
    Eval.mbrSelect(
      t(s, dir, "documents").select((col("doc_id") % 100).as("problem"),
        col("doc_id").as("cand_id"), col("text")),
      "problem", "cand_id", "text", n = 2).orderBy("problem")
  }


  // Word error rate via the codegen'd token-level edit distance, on a
  // planted construction with ANALYTIC distances: empty hypothesis
  // (edits = ref_len), identical (0), kept-subsequence — a
  // deletions-only ASR-style hypothesis (edits = dropped count exactly:
  // insertions-only is both achievable and the ref-LCS lower bound) —
  // and prefix-30 (edits = tail length). Hash oracle over the analytic
  // values; EvalSpec proves the DP against a reference implementation
  // and the builtin char levenshtein. (A first cut planted noise
  // tokens in the subsequence and assumed 2 substitutions were always
  // available — the DP refuted it: fixed noise POSITIONS cannot always
  // align to a dropped token, so the analytic claim held only
  // gap-structure-dependently. Planted oracles must be provable under
  // alignment constraints, not just edit-count arithmetic.)
  register(
    "t71_wer_planted",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |b AS (SELECT pair_id, list_slice(toks, 1, 40) AS rt FROM w),
      |k AS (SELECT pair_id, rt,
      |             list_filter(rt, (x, i) -> i % 3 != 0) AS kept FROM b),
      |a AS (
      |  SELECT pair_id, CAST(len(rt) AS BIGINT) AS ref_len,
      |         CASE WHEN pair_id % 19 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 13 = 0 THEN CAST(len(rt) AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN CAST(len(kept) AS BIGINT)
      |              ELSE CAST(least(len(rt), 30) AS BIGINT) END AS hyp_len,
      |         CASE WHEN pair_id % 19 = 0 THEN CAST(len(rt) AS BIGINT)
      |              WHEN pair_id % 13 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN
      |                CAST(len(rt) - len(kept) AS BIGINT)
      |              ELSE CAST(len(rt) - least(len(rt), 30) AS BIGINT)
      |         END AS edits
      |  FROM k)
      |SELECT pair_id, hyp_len, ref_len, edits,
      |       CASE WHEN ref_len > 0 THEN floor(CAST(edits AS DOUBLE) *
      |         1000000.0 / ref_len + 0.5) / 1000000.0 END AS wer
      |FROM a ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val kdf = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), slice(toksCol, 1, 40).as("rt"))
      .select(col("pair_id"), col("rt"),
        filter(col("rt"), (_, i) => (i + 1) % 3 =!= 0).as("kept"))
    val hypArr = when(col("pair_id") % 19 === 0,
        array().cast("array<string>"))
      .when(col("pair_id") % 13 === 0, col("rt"))
      .when(col("pair_id") % 5 === 0, col("kept"))
      .otherwise(slice(col("rt"), 1, 30))
    val p = kdf.select(col("pair_id"), array_join(hypArr, " ").as("hyp"),
      array_join(col("rt"), " ").as("ref"))
    Eval.wer(p, "pair_id", "hyp", "ref").orderBy("pair_id")
  }


  // Retrieval eval at k=10 — recall/MRR/nDCG per query over synthetic
  // ranked runs (rank = deterministic 13x%97 scramble within each
  // query's candidate group) against graded judgments (rel 2/1/0 by an
  // 11x%5 cycle). DCG terms micro-floor per (hit, rank) before the
  // per-query sums; nDCG divides the two micro sums — hash oracle.
  register(
    "t69_retrieval_metrics",
    """WITH base AS (
      |  SELECT doc_id, 'q' || CAST(doc_id % 20 AS VARCHAR) AS q_id
      |  FROM documents),
      |runs AS (
      |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
      |    ORDER BY (doc_id * 13) % 97, doc_id) AS BIGINT) AS rnk
      |  FROM base),
      |runk AS (SELECT * FROM runs WHERE rnk <= 10),
      |rel AS (
      |  SELECT * FROM (
      |    SELECT q_id, doc_id,
      |           CASE CAST((doc_id * 11) % 5 AS INT)
      |                WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END AS rel
      |    FROM base) WHERE rel > 0),
      |j AS (
      |  SELECT r.q_id, r.rnk,
      |         CAST(floor((power(2, e.rel) - 1.0) * 1000000.0 /
      |           log2(r.rnk + 1) + 0.5) AS BIGINT) AS term
      |  FROM runk r JOIN rel e ON e.q_id = r.q_id AND e.doc_id = r.doc_id),
      |perq AS (
      |  SELECT q_id, CAST(count(*) AS BIGINT) AS hits,
      |         CAST(min(rnk) AS BIGINT) AS minrnk,
      |         CAST(sum(term) AS BIGINT) AS dcg
      |  FROM j GROUP BY 1),
      |ideal AS (
      |  SELECT q_id, CAST(sum(CAST(floor((power(2, rel) - 1.0) * 1000000.0
      |    / log2(irnk + 1) + 0.5) AS BIGINT)) AS BIGINT) AS idcg FROM (
      |      SELECT q_id, rel, row_number() OVER (PARTITION BY q_id
      |        ORDER BY rel DESC, doc_id ASC) AS irnk FROM rel)
      |  WHERE irnk <= 10 GROUP BY 1),
      |ra AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_rel
      |       FROM rel GROUP BY 1),
      |qs AS (SELECT DISTINCT q_id FROM runs)
      |SELECT qs.q_id, coalesce(n_rel, 0) AS n_rel, coalesce(hits, 0) AS hits,
      |  CASE WHEN coalesce(n_rel, 0) > 0 THEN
      |    floor(CAST(coalesce(hits, 0) AS DOUBLE) * 1000000.0 / n_rel + 0.5)
      |      / 1000000.0 END AS recall_at_k,
      |  coalesce(CASE WHEN minrnk IS NOT NULL THEN
      |    floor(1000000.0 / minrnk + 0.5) / 1000000.0 END, 0.0) AS mrr_at_k,
      |  CASE WHEN idcg > 0 THEN
      |    floor(CAST(coalesce(dcg, 0) AS DOUBLE) * 1000000.0 / idcg + 0.5)
      |      / 1000000.0 END AS ndcg_at_k
      |FROM qs LEFT JOIN ra USING (q_id) LEFT JOIN perq USING (q_id)
      |        LEFT JOIN ideal USING (q_id)
      |ORDER BY q_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val base = t(s, dir, "documents").select(col("doc_id"),
      concat(lit("q"), (col("doc_id") % 20).cast("string")).as("q_id"))
    val runs = base.withColumn("rank", row_number().over(
      Window.partitionBy("q_id")
        .orderBy((col("doc_id") * 13) % 97, col("doc_id"))))
    val qrels = base.select(col("q_id"), col("doc_id"),
      when((col("doc_id") * 11) % 5 === 0, 2)
        .when((col("doc_id") * 11) % 5 === 1, 1).otherwise(0).as("rel"))
    Eval.retrievalMetrics(runs, qrels, "q_id", "doc_id", "rank", "rel",
        k = 10)
      .orderBy("q_id")
  }


  // Dawid–Skene label aggregation (one hard-EM round, fully unrolled in
  // the oracle): the t62 rating construction (3 raters, missing slots,
  // 'en'-biased noise) aggregated beyond majority vote — worker
  // confusion matrices learned from the majority init re-weight every
  // vote. Log terms micro-floor before the only cross-row sums; ties
  // break to the smallest label at both argmax sites. Hash oracle over
  // (item, label, n_votes, n_agree).
  register(
    "t68_dawid_skene",
    """WITH ratings AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS item,
      |         'w' || CAST(r AS VARCHAR) AS worker,
      |         CASE WHEN (doc_id * 3 + r) % 5 < 3 THEN lang
      |              ELSE 'en' END AS vote
      |  FROM documents, (SELECT unnest([0, 1, 2]) AS r)
      |  WHERE (doc_id + r) % 7 != 0),
      |kk AS (SELECT CAST(count(DISTINCT vote) AS BIGINT) AS k FROM ratings),
      |nn AS (SELECT CAST(count(DISTINCT item) AS BIGINT) AS n FROM ratings),
      |labels AS (SELECT DISTINCT vote AS cand FROM ratings),
      |mj AS (SELECT item, vote, count(*) AS c FROM ratings GROUP BY 1, 2),
      |init AS (SELECT item, vote AS t FROM (
      |    SELECT item, vote, row_number() OVER (PARTITION BY item
      |      ORDER BY c DESC, vote ASC) AS rn FROM mj) WHERE rn = 1),
      |assigned AS (
      |  SELECT r.item, r.worker, r.vote, i.t
      |  FROM ratings r JOIN init i ON i.item = r.item),
      |cwtv AS (SELECT worker, t, vote, CAST(count(*) AS BIGINT) AS cnt
      |         FROM assigned GROUP BY 1, 2, 3),
      |cwt AS (SELECT worker, t, CAST(sum(cnt) AS BIGINT) AS tot
      |        FROM cwtv GROUP BY 1, 2),
      |prior AS (SELECT t AS cand, CAST(count(*) AS BIGINT) AS nt
      |          FROM init GROUP BY 1),
      |escore AS (
      |  SELECT r.item, l.cand,
      |    CAST(sum(CAST(floor(ln(CAST(coalesce(cv.cnt, 0) + 1 AS DOUBLE) /
      |      (coalesce(ct.tot, 0) + kk.k)) * 1000000.0 + 0.5) AS BIGINT))
      |      AS BIGINT) AS s
      |  FROM ratings r
      |  CROSS JOIN labels l CROSS JOIN kk
      |  LEFT JOIN cwtv cv ON cv.worker = r.worker AND cv.t = l.cand
      |                   AND cv.vote = r.vote
      |  LEFT JOIN cwt ct ON ct.worker = r.worker AND ct.t = l.cand
      |  GROUP BY 1, 2),
      |wprior AS (
      |  SELECT e.item, e.cand,
      |    e.s + CAST(floor(ln(CAST(coalesce(p.nt, 0) + 1 AS DOUBLE) /
      |      (nn.n + kk.k)) * 1000000.0 + 0.5) AS BIGINT) AS s
      |  FROM escore e LEFT JOIN prior p ON p.cand = e.cand, nn, kk),
      |assign1 AS (SELECT item, cand AS t FROM (
      |    SELECT item, cand, row_number() OVER (PARTITION BY item
      |      ORDER BY s DESC, cand ASC) AS rn FROM wprior) WHERE rn = 1)
      |SELECT r.item, a.t AS label, CAST(count(*) AS BIGINT) AS n_votes,
      |       CAST(sum(CASE WHEN r.vote = a.t THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_agree
      |FROM ratings r JOIN assign1 a ON a.item = r.item
      |GROUP BY 1, 2 ORDER BY CAST(r.item AS BIGINT)""".stripMargin) { (s, dir) =>
    val ratings = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0), lit(2))).as("r"))
      .where((col("doc_id") + col("r")) % 7 =!= 0)
      .select(col("doc_id").cast("string").as("item"),
        concat(lit("w"), col("r").cast("string")).as("worker"),
        when((col("doc_id") * 3 + col("r")) % 5 < 3, col("lang"))
          .otherwise(lit("en")).as("vote"))
    Preference.dawidSkene(ratings, "item", "worker", "vote", iters = 1)
      .orderBy(col("item").cast("long"))
  }


  // Bradley–Terry strength ranking from pairwise outcomes: adjacent docs
  // of different languages "play a match" won by the longer doc, and 3
  // MM rounds turn the win/match counts into per-language strengths —
  // the preference-aggregation shape of arena-style policy evals. The
  // corpus-sized work is one count pass; the k² MM solve runs on micro
  // longs with per-term floors, unrolled identically in the oracle.
  register(
    "t56_bt_rank",
    """WITH m AS (
      |  SELECT a.lang AS a, b.lang AS b,
      |         CASE WHEN a.n_chars >= b.n_chars THEN a.lang
      |              ELSE b.lang END AS winner
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.lang <> b.lang),
      |pc AS (SELECT least(a, b) AS i, greatest(a, b) AS j,
      |              CAST(count(*) AS BIGINT) AS nij
      |       FROM m GROUP BY 1, 2),
      |sym AS (SELECT i AS it, j AS opp, nij FROM pc
      |        UNION ALL SELECT j, i, nij FROM pc),
      |wins AS (SELECT winner AS item, CAST(count(*) AS BIGINT) AS wi
      |         FROM m GROUP BY 1),
      |items AS (SELECT DISTINCT it AS item FROM sym),
      |k AS (SELECT CAST(count(*) AS BIGINT) AS n FROM items),
      |w0 AS (SELECT item, CAST(1000000 AS BIGINT) AS wm FROM items),
      |d1 AS (SELECT s.it AS item,
      |         CAST(sum(CAST(floor(CAST(s.nij AS DOUBLE) * 1000000000000.0 /
      |           (wa.wm + wb.wm) + 0.5) AS BIGINT)) AS BIGINT) AS dm
      |       FROM sym s JOIN w0 wa ON wa.item = s.it
      |                  JOIN w0 wb ON wb.item = s.opp GROUP BY 1),
      |u1 AS (SELECT d1.item,
      |         CAST(floor(CAST(coalesce(w.wi, 0) AS DOUBLE) *
      |           1000000000000.0 / d1.dm + 0.5) AS BIGINT) AS wm
      |       FROM d1 LEFT JOIN wins w ON w.item = d1.item),
      |w1 AS (SELECT item, CAST(floor(CAST(wm AS DOUBLE) * (SELECT n FROM k)
      |         * 1000000.0 / (SELECT sum(wm) FROM u1) + 0.5) AS BIGINT) AS wm
      |       FROM u1),
      |d2 AS (SELECT s.it AS item,
      |         CAST(sum(CAST(floor(CAST(s.nij AS DOUBLE) * 1000000000000.0 /
      |           (wa.wm + wb.wm) + 0.5) AS BIGINT)) AS BIGINT) AS dm
      |       FROM sym s JOIN w1 wa ON wa.item = s.it
      |                  JOIN w1 wb ON wb.item = s.opp GROUP BY 1),
      |u2 AS (SELECT d2.item,
      |         CAST(floor(CAST(coalesce(w.wi, 0) AS DOUBLE) *
      |           1000000000000.0 / d2.dm + 0.5) AS BIGINT) AS wm
      |       FROM d2 LEFT JOIN wins w ON w.item = d2.item),
      |w2 AS (SELECT item, CAST(floor(CAST(wm AS DOUBLE) * (SELECT n FROM k)
      |         * 1000000.0 / (SELECT sum(wm) FROM u2) + 0.5) AS BIGINT) AS wm
      |       FROM u2),
      |d3 AS (SELECT s.it AS item,
      |         CAST(sum(CAST(floor(CAST(s.nij AS DOUBLE) * 1000000000000.0 /
      |           (wa.wm + wb.wm) + 0.5) AS BIGINT)) AS BIGINT) AS dm
      |       FROM sym s JOIN w2 wa ON wa.item = s.it
      |                  JOIN w2 wb ON wb.item = s.opp GROUP BY 1),
      |u3 AS (SELECT d3.item,
      |         CAST(floor(CAST(coalesce(w.wi, 0) AS DOUBLE) *
      |           1000000000000.0 / d3.dm + 0.5) AS BIGINT) AS wm
      |       FROM d3 LEFT JOIN wins w ON w.item = d3.item),
      |w3 AS (SELECT item, CAST(floor(CAST(wm AS DOUBLE) * (SELECT n FROM k)
      |         * 1000000.0 / (SELECT sum(wm) FROM u3) + 0.5) AS BIGINT) AS wm
      |       FROM u3)
      |SELECT item, wm / 1000000.0 AS w,
      |       CAST(row_number() OVER (ORDER BY wm DESC, item) AS BIGINT) AS rnk
      |FROM w3 ORDER BY rnk""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val m = d.as("a").join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1)
      .where(col("a.lang") =!= col("b.lang"))
      .select(col("a.lang").as("a"), col("b.lang").as("b"),
        when(col("a.n_chars") >= col("b.n_chars"), col("a.lang"))
          .otherwise(col("b.lang")).as("winner"))
    Preference.btRank(m, "a", "b", "winner", iters = 3)
      .orderBy("rnk")
  }


  // ROUGE-2 over lead-extract summaries: candidate = first-25-token
  // extract (the lead baseline of summarization eval), reference = the
  // full document; every 13th doc's extract is token-reversed (kills
  // bigram overlap, keeps unigrams) and every 19th is empty (null-metric
  // path). Clipped-count P/R/F1 as micro-floored rationals — hash
  // oracle over the full metric row.
  register(
    "t57_rouge2",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |p AS (
      |  SELECT pair_id,
      |         CASE WHEN pair_id % 19 = 0 THEN []::VARCHAR[]
      |              WHEN pair_id % 13 = 0 THEN list_reverse(list_slice(toks, 1, 25))
      |              ELSE list_slice(toks, 1, 25) END AS ct,
      |         toks AS rt
      |  FROM w),
      |cg AS (
      |  SELECT pair_id, g, count(*) AS cc FROM (
      |    SELECT pair_id, unnest(list_transform(
      |      generate_series(1, greatest(len(ct) - 1, 0)),
      |      i -> ct[i] || ' ' || ct[i+1])) AS g FROM p) GROUP BY 1, 2),
      |rg AS (
      |  SELECT pair_id, g, count(*) AS rc FROM (
      |    SELECT pair_id, unnest(list_transform(
      |      generate_series(1, greatest(len(rt) - 1, 0)),
      |      i -> rt[i] || ' ' || rt[i+1])) AS g FROM p) GROUP BY 1, 2),
      |m AS (
      |  SELECT c.pair_id, CAST(sum(least(c.cc, r.rc)) AS BIGINT) AS mg
      |  FROM cg c JOIN rg r ON r.pair_id = c.pair_id AND r.g = c.g
      |  GROUP BY 1),
      |agg AS (
      |  SELECT p.pair_id,
      |         CAST(greatest(len(ct) - 1, 0) AS BIGINT) AS cand_grams,
      |         CAST(greatest(len(rt) - 1, 0) AS BIGINT) AS ref_grams,
      |         coalesce(m.mg, 0) AS match_grams
      |  FROM p LEFT JOIN m ON m.pair_id = p.pair_id),
      |micro AS (
      |  SELECT pair_id, cand_grams, ref_grams, match_grams,
      |         CASE WHEN cand_grams > 0 THEN CAST(floor(CAST(match_grams AS
      |           DOUBLE) * 1000000.0 / cand_grams + 0.5) AS BIGINT) END AS pm,
      |         CASE WHEN ref_grams > 0 THEN CAST(floor(CAST(match_grams AS
      |           DOUBLE) * 1000000.0 / ref_grams + 0.5) AS BIGINT) END AS rm
      |  FROM agg)
      |SELECT pair_id, cand_grams, ref_grams, match_grams,
      |       pm / 1000000.0 AS rouge_p, rm / 1000000.0 AS rouge_r,
      |       CASE WHEN pm IS NOT NULL AND rm IS NOT NULL THEN
      |         CASE WHEN pm + rm > 0 THEN
      |           floor(CAST(pm * rm * 2 AS DOUBLE) / (pm + rm) + 0.5)
      |             / 1000000.0
      |         ELSE 0.0 END END AS rouge_f1
      |FROM micro ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val p = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), toksCol.as("toks"))
      .select(col("pair_id"),
        array_join(
          when(col("pair_id") % 19 === 0, array().cast("array<string>"))
            .when(col("pair_id") % 13 === 0, reverse(slice(col("toks"), 1, 25)))
            .otherwise(slice(col("toks"), 1, 25)), " ").as("cand"),
        array_join(col("toks"), " ").as("ref"))
    Eval.rougeN(p, "pair_id", "cand", "ref", n = 2)
      .orderBy("pair_id")
  }


  // BLEU-4 with brevity penalty: candidate = first 30 tokens (reversed
  // for every 11th doc — order destroyed, unigram precision kept),
  // reference = first 40 tokens, so BP = exp(1 - 40/30) is active on
  // every full-length pair. "+1" smoothing on orders 2-4; the geometric
  // mean runs on IEEE-exact sqrt over micro longs in BOTH engines; bp
  // and bleu are the two round-6 columns (ln/exp precedent of t12/t25).
  register(
    "t58_bleu",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |p AS (
      |  SELECT pair_id,
      |         CASE WHEN pair_id % 11 = 0
      |              THEN list_reverse(list_slice(toks, 1, 30))
      |              ELSE list_slice(toks, 1, 30) END AS ct,
      |         list_slice(toks, 1, 40) AS rt
      |  FROM w),
      |n4 AS (SELECT unnest([1, 2, 3, 4]) AS n),
      |cg AS (
      |  SELECT pair_id, n, g, count(*) AS cc FROM (
      |    SELECT pair_id, n, unnest(list_transform(
      |      generate_series(1, greatest(len(ct) - n + 1, 0)),
      |      i -> array_to_string(list_slice(ct, i, i + n - 1), ' '))) AS g
      |    FROM p, n4) GROUP BY 1, 2, 3),
      |rg AS (
      |  SELECT pair_id, n, g, count(*) AS rc FROM (
      |    SELECT pair_id, n, unnest(list_transform(
      |      generate_series(1, greatest(len(rt) - n + 1, 0)),
      |      i -> array_to_string(list_slice(rt, i, i + n - 1), ' '))) AS g
      |    FROM p, n4) GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT c.pair_id, c.n, CAST(sum(least(c.cc, r.rc)) AS BIGINT) AS mg
      |  FROM cg c JOIN rg r ON r.pair_id = c.pair_id AND r.n = c.n
      |                     AND r.g = c.g
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT pair_id, n,
      |         CAST(greatest(len(ct) - n + 1, 0) AS BIGINT) AS cn,
      |         CAST(greatest(len(rt) - n + 1, 0) AS BIGINT) AS rn
      |  FROM p, n4),
      |pn AS (
      |  SELECT t.pair_id, t.n, t.cn, t.rn, coalesce(m.mg, 0) AS mg
      |  FROM tot t LEFT JOIN m ON m.pair_id = t.pair_id AND m.n = t.n),
      |pm AS (
      |  SELECT pair_id,
      |    max(CASE WHEN n = 1 THEN cn END) AS c1,
      |    max(CASE WHEN n = 1 THEN rn END) AS r1,
      |    max(CASE WHEN n = 1 THEN CASE WHEN cn > 0 THEN
      |      CAST(floor(CAST(mg AS DOUBLE) * 1000000.0 / cn + 0.5) AS BIGINT)
      |      ELSE 0 END END) AS p1m,
      |    max(CASE WHEN n = 2 THEN CAST(floor(CAST(mg + 1 AS DOUBLE)
      |      * 1000000.0 / (cn + 1) + 0.5) AS BIGINT) END) AS p2m,
      |    max(CASE WHEN n = 3 THEN CAST(floor(CAST(mg + 1 AS DOUBLE)
      |      * 1000000.0 / (cn + 1) + 0.5) AS BIGINT) END) AS p3m,
      |    max(CASE WHEN n = 4 THEN CAST(floor(CAST(mg + 1 AS DOUBLE)
      |      * 1000000.0 / (cn + 1) + 0.5) AS BIGINT) END) AS p4m
      |  FROM pn GROUP BY 1)
      |SELECT pair_id, c1 AS cand_len, r1 AS ref_len,
      |       p1m / 1000000.0 AS p1, p2m / 1000000.0 AS p2,
      |       p3m / 1000000.0 AS p3, p4m / 1000000.0 AS p4,
      |       round(CASE WHEN c1 = 0 THEN 0.0 WHEN c1 >= r1 THEN 1.0
      |             ELSE exp(1.0 - CAST(r1 AS DOUBLE) / c1) END, 6) AS bp,
      |       CASE WHEN c1 > 0 THEN round(
      |         (CASE WHEN c1 = 0 THEN 0.0 WHEN c1 >= r1 THEN 1.0
      |               ELSE exp(1.0 - CAST(r1 AS DOUBLE) / c1) END) *
      |         sqrt(sqrt(CAST(p1m * p2m AS DOUBLE)) *
      |              sqrt(CAST(p3m * p4m AS DOUBLE))) / 1000000.0, 6)
      |       ELSE 0.0 END AS bleu
      |FROM pm ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val p = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), toksCol.as("toks"))
      .select(col("pair_id"),
        array_join(
          when(col("pair_id") % 11 === 0, reverse(slice(col("toks"), 1, 30)))
            .otherwise(slice(col("toks"), 1, 30)), " ").as("cand"),
        array_join(slice(col("toks"), 1, 40), " ").as("ref"))
    Eval.bleu(p, "pair_id", "cand", "ref")
      .orderBy("pair_id")
  }


  // ROUGE-L via the codegen'd LCS expression, on a PLANTED construction
  // whose LCS is analytic (the d2c planted-twin pattern): the candidate
  // is a kept-subsequence of the reference interleaved with md5 noise
  // tokens (proven absent from the corpus vocabulary — no token matches
  // ^[0-9a-f]{32}$ at any SF), so LCS = |kept| exactly; the doubled
  // branch gives LCS = |ref|, the empty branch 0. The oracle computes
  // the analytic values; EvalSpec proves the DP against a reference
  // implementation on randomized inputs.
  register(
    "t61_rouge_l_planted",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |b AS (SELECT pair_id, list_slice(toks, 1, 40) AS rt FROM w),
      |k AS (SELECT pair_id, rt,
      |             list_filter(rt, (x, i) -> i % 3 != 0) AS kept FROM b),
      |a AS (
      |  SELECT pair_id, CAST(len(rt) AS BIGINT) AS ref_len,
      |         CASE WHEN pair_id % 7 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN CAST(2 * len(rt) AS BIGINT)
      |              ELSE CAST(len(kept) + 2 AS BIGINT) END AS cand_len,
      |         CASE WHEN pair_id % 7 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN CAST(len(rt) AS BIGINT)
      |              ELSE CAST(len(kept) AS BIGINT) END AS lcs
      |  FROM k),
      |micro AS (
      |  SELECT pair_id, cand_len, ref_len, lcs,
      |         CASE WHEN cand_len > 0 THEN CAST(floor(CAST(lcs AS DOUBLE)
      |           * 1000000.0 / cand_len + 0.5) AS BIGINT) END AS pm,
      |         CASE WHEN ref_len > 0 THEN CAST(floor(CAST(lcs AS DOUBLE)
      |           * 1000000.0 / ref_len + 0.5) AS BIGINT) END AS rm
      |  FROM a)
      |SELECT pair_id, cand_len, ref_len, lcs,
      |       pm / 1000000.0 AS rouge_p, rm / 1000000.0 AS rouge_r,
      |       CASE WHEN pm IS NOT NULL AND rm IS NOT NULL THEN
      |         CASE WHEN pm + rm > 0 THEN
      |           floor(CAST(pm * rm * 2 AS DOUBLE) / (pm + rm) + 0.5)
      |             / 1000000.0
      |         ELSE 0.0 END END AS rouge_f1
      |FROM micro ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val k = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), slice(toksCol, 1, 40).as("rt"))
      .select(col("pair_id"), col("rt"),
        filter(col("rt"), (_, i) => (i + 1) % 3 =!= 0).as("kept"))
    val noise = md5(col("pair_id").cast("string"))
    val candArr = when(col("pair_id") % 7 === 0,
        array().cast("array<string>"))
      .when(col("pair_id") % 5 === 0, concat(col("rt"), col("rt")))
      .otherwise(concat(array(noise), slice(col("kept"), 1, 10),
        array(noise),
        slice(col("kept"), lit(11), greatest(size(col("kept")) - 10, lit(0)))))
    val p = k.select(col("pair_id"), array_join(candArr, " ").as("cand"),
      array_join(col("rt"), " ").as("ref"))
    Eval.rougeL(p, "pair_id", "cand", "ref").orderBy("pair_id")
  }


  // Chat-template rendering with loss-mask spans: events become ordered
  // conversation turns (the t53 role assignment), each rendered as
  // <|role|>\ncontent<|end|>\n; assistant spans emit as 0-based
  // "start:end;…" char offsets (null when a conversation has no
  // assistant turn). Hash oracle over the FULL rendered text and the
  // span string — any off-by-one in the offsets breaks the hash.
  register(
    "t59_chat_template",
    """WITH r AS (
      |  SELECT user_id AS conv_id,
      |         CASE WHEN event_type IN ('purchase', 'signup') THEN 'user'
      |              ELSE 'assistant' END AS role,
      |         event_type || '#' || CAST(event_id AS VARCHAR) AS content,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events),
      |p AS (
      |  SELECT conv_id, rn, role,
      |         '<|' || role || '|>' || chr(10) || content || '<|end|>' ||
      |           chr(10) AS part
      |  FROM r),
      |o AS (
      |  SELECT conv_id, rn, role, part,
      |         CAST(coalesce(sum(len(part)) OVER (PARTITION BY conv_id
      |           ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND 1
      |           PRECEDING), 0) AS BIGINT) AS st
      |  FROM p)
      |SELECT conv_id,
      |       CAST(count(*) AS BIGINT) AS n_turns,
      |       CAST(sum(len(part)) AS BIGINT) AS n_chars,
      |       string_agg(part, '' ORDER BY rn) AS text,
      |       string_agg(CASE WHEN role = 'assistant' THEN
      |         CAST(st + len(role) + 5 AS VARCHAR) || ':' ||
      |         CAST(st + len(part) AS VARCHAR) END, ';' ORDER BY rn)
      |         AS assistant_spans,
      |       CAST(coalesce(sum(CASE WHEN role = 'assistant'
      |         THEN len(part) - len(role) - 5 END), 0) AS BIGINT)
      |         AS assistant_chars
      |FROM o GROUP BY conv_id ORDER BY conv_id""".stripMargin) { (s, dir) =>
    graft.operators.Behavior.renderChatTemplate(t(s, dir, "events"),
        "user_id", "ts",
        when(col("event_type").isin("purchase", "signup"), "user")
          .otherwise("assistant"),
        concat(col("event_type"), lit("#"), col("event_id").cast("string")),
        "event_id")
      .orderBy("conv_id")
  }


  // Reliability diagram + ECE over a synthetic miscalibrated classifier:
  // conf cycles 0.00-1.00, outcomes land at ~0.8x the stated confidence
  // (systematic overconfidence), so every bin carries a real gap and the
  // ECE is material. Confidences micro-quantize scan-side before any
  // sum, so the whole report is exact integer arithmetic — hash oracle.
  register(
    "t60_calibration_ece",
    """WITH s AS (
      |  SELECT CAST((doc_id * 37) % 101 AS DOUBLE) / 100.0 AS conf,
      |         CASE WHEN (doc_id * 53) % 100 <
      |                   ((doc_id * 37) % 101) * 0.8
      |              THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |m AS (SELECT CAST(floor(conf * 1000000.0 + 0.5) AS BIGINT) AS cm, y
      |      FROM s),
      |b AS (SELECT least(CAST(floor(CAST(cm * 10 AS DOUBLE) / 1000000.0)
      |        AS BIGINT), 9) AS bin, cm, y FROM m),
      |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(cm) AS BIGINT) AS cs,
      |             CAST(sum(y) AS BIGINT) AS ys
      |      FROM b GROUP BY 1),
      |mm AS (SELECT bin, n,
      |         CAST(floor(CAST(cs AS DOUBLE) / n + 0.5) AS BIGINT)
      |           AS confm,
      |         CAST(floor(CAST(ys AS DOUBLE) * 1000000.0 / n + 0.5)
      |           AS BIGINT) AS accm
      |       FROM g),
      |gg AS (SELECT bin, n, confm, accm, abs(accm - confm) AS gap FROM mm),
      |e AS (SELECT CAST(floor(CAST(sum(n * gap) AS DOUBLE) / sum(n) + 0.5)
      |        AS BIGINT) AS ecem FROM gg)
      |SELECT bin, n, confm / 1000000.0 AS avg_conf,
      |       accm / 1000000.0 AS accuracy, gap / 1000000.0 AS gap,
      |       ecem / 1000000.0 AS ece
      |FROM gg, e ORDER BY bin""".stripMargin) { (s, dir) =>
    val scored = t(s, dir, "documents").select(
      (((col("doc_id") * 37) % 101).cast("double") / 100.0).as("conf"),
      when((col("doc_id") * 53) % 100 <
        ((col("doc_id") * 37) % 101) * 0.8, 1).otherwise(0).as("y"))
    Eval.calibrationReport(scored, "conf", "y", bins = 10)
      .orderBy("bin")
  }


  // Exact per-source Spearman rank correlation between two quality
  // signals (char length vs token count) — the metric-agreement audit.
  // Average-tie ranks come from a VALUE histogram (pre-combined agg +
  // value-cardinality cumulative window, never a row-ranking sort),
  // doubled to stay integral (Pearson is affine-invariant); the six
  // sums convert to DOUBLE before any product in BOTH engines, so the
  // IEEE arithmetic is identical — rho hash-matches at 6dp.
  register(
    "t113_spearman",
    """WITH s AS (
      |  SELECT source, length(text) AS x,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t != ''))
      |      AS BIGINT) AS y
      |  FROM documents),
      |hx AS (
      |  SELECT source, x, count(*) AS c,
      |    coalesce(sum(count(*)) OVER (PARTITION BY source ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sm
      |  FROM s GROUP BY source, x),
      |hy AS (
      |  SELECT source, y, count(*) AS c,
      |    coalesce(sum(count(*)) OVER (PARTITION BY source ORDER BY y
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sm
      |  FROM s GROUP BY source, y),
      |r AS (
      |  SELECT s.source,
      |    CAST(2 * hx.sm + hx.c + 1 AS BIGINT) AS rx,
      |    CAST(2 * hy.sm + hy.c + 1 AS BIGINT) AS ry
      |  FROM s JOIN hx ON s.source = hx.source AND s.x = hx.x
      |         JOIN hy ON s.source = hy.source AND s.y = hy.y),
      |a AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
      |    CAST(sum(rx * rx) AS BIGINT) AS sxx,
      |    CAST(sum(ry * ry) AS BIGINT) AS syy,
      |    CAST(sum(rx * ry) AS BIGINT) AS sxy
      |  FROM r GROUP BY source)
      |SELECT source, n_docs,
      |  CASE WHEN (CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |          * (CAST(n_docs AS DOUBLE) * CAST(syy AS DOUBLE)
      |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
      |    THEN round((CAST(n_docs AS DOUBLE) * CAST(sxy AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / sqrt((CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |           * (CAST(n_docs AS DOUBLE) * CAST(syy AS DOUBLE)
      |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |  END AS rho
      |FROM a ORDER BY source""".stripMargin) { (s, dir) =>
    val sig = t(s, dir, "documents").select(col("source"),
      length(col("text")).cast("long").as("x"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("y"))
    Eval.spearman(sig, "x", "y", "source").orderBy("source")
  }
}
