package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generation-evaluation metrics at corpus scale — clipped n-gram
  * overlap (ROUGE-N) and BLEU-4, the scoring pass a model-output QA
  * pipeline runs over millions of (candidate, reference) pairs. The
  * reference's engine applies per-record scoring expressions and
  * aggregates verdicts relationally (streamalert/rules_engine.py:175
  * record gates; shared/stats.py aggregation); these operators apply
  * the same shape to text-overlap metrics.
  *
  * Determinism contract (shared with [[Preference]]): every ratio is
  * lifted to integer micro-units with `floor(x·10⁶ + 0.5)` before any
  * derived arithmetic; the only non-rational steps are IEEE-exact
  * (`sqrt` is correctly rounded per IEEE 754 in both the JVM and
  * DuckDB's libm) or 6-dp-rounded (`exp` in the brevity penalty — the
  * [[TextAnalysis.unigramSurprisal]] `ln`/round-6 precedent).
  *
  * Scale shape: ONE scan of the pair table — candidate and reference
  * grams explode side-tagged from the same row, so per-(pair, gram)
  * counts for both sides come out of a single pre-combined aggregation;
  * the shuffle carries (pair_id, md5(gram), side) and partial counts,
  * never text. The per-pair re-agg shuffles already-collapsed
  * (pair, gram) count rows (bounded by distinct grams per pair), and
  * the id-universe join ships ids only.
  */
object Eval {

  /** Word n-grams as a MULTISET (duplicates kept — clipped counts need
    * them), built by iterated zip_with against shifted views (the
    * [[TextAnalysis]] wordNgrams idiom minus its `array_distinct`);
    * trailing null-padded entries drop via array_compact. */
  private def gramArr(toks: Column, n: Int): Column = {
    val grams = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks) - k, lit(1))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) >= n, array_compact(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** Side-tagged (gram, side) structs for one (cand, ref) row. */
  private def taggedGrams(ct: Column, rt: Column, n: Int): Column = concat(
    transform(gramArr(ct, n), g => struct(g.as("g"), lit(1).as("side"))),
    transform(gramArr(rt, n), g => struct(g.as("g"), lit(2).as("side"))))

  private def microRatio(num: Column, den: Column): Column =
    floor(num.cast("double") * 1000000.0 / den + 0.5).cast("long")

  /** ROUGE-N over (pair_id, candidate, reference) rows: clipped n-gram
    * precision / recall / F1 (Lin 2004). `match_grams` is
    * `Σ_g min(count_cand(g), count_ref(g))`; precision divides by the
    * candidate gram count, recall by the reference gram count; a side
    * with zero grams (shorter than n tokens) yields null for the
    * metrics that divide by it, and F1 is 0 when both sides have grams
    * but nothing overlaps. Tokens are lowercased whitespace words (the
    * t1 definition); metrics are 6-dp micro-floored rationals. */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"rougeN needs n >= 1, got $n")
    val base = pairs.select(col(idCol).as("pair_id"),
      graft.functions.OptimizerFence.fence(TextAnalysis.tokens(lower(col(candCol)))).as("__ct"),
      graft.functions.OptimizerFence.fence(TextAnalysis.tokens(lower(col(refCol)))).as("__rt"))
    val counts = base
      .select(col("pair_id"),
        explode(taggedGrams(col("__ct"), col("__rt"), n)).as("t"))
      .select(col("pair_id"), md5(col("t.g")).as("gram_key"), col("t.side"))
      .groupBy("pair_id", "gram_key")
      .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("cc"),
        sum(when(col("side") === 2, 1L).otherwise(0L)).as("rc"))
    val perPair = counts.groupBy("pair_id")
      .agg(sum(col("cc")).as("cand_grams"), sum(col("rc")).as("ref_grams"),
        sum(least(col("cc"), col("rc"))).as("match_grams"))
    val pm = when(col("cand_grams") > 0,
      microRatio(col("match_grams"), col("cand_grams")))
    val rm = when(col("ref_grams") > 0,
      microRatio(col("match_grams"), col("ref_grams")))
    pairs.select(col(idCol).as("pair_id"))
      .join(perPair, Seq("pair_id"), "left")
      .na.fill(0L, Seq("cand_grams", "ref_grams", "match_grams"))
      .select(col("pair_id"), col("cand_grams"), col("ref_grams"),
        col("match_grams"),
        (pm.cast("double") / 1000000.0).as("rouge_p"),
        (rm.cast("double") / 1000000.0).as("rouge_r"),
        when(pm.isNotNull && rm.isNotNull,
          when(pm + rm > 0,
            floor((pm * rm * 2L).cast("double") / (pm + rm) + 0.5) / 1000000.0)
            .otherwise(0.0)).as("rouge_f1"))
  }

  /** ROUGE-L over (pair_id, candidate, reference) rows: LCS-based
    * precision / recall / F1 (Lin 2004 §3.2, summary-level with a single
    * reference). The LCS kernel is the codegen'd
    * [[graft.functions.LcsLength]] expression — O(|c|·|r|) per row,
    * which is the metric's intrinsic cost; use [[rougeN]] for
    * document-scale inputs. Division semantics mirror [[rougeN]]: a
    * side with zero tokens nulls the metrics dividing by it, F1 is 0
    * when both sides are nonempty but share no subsequence.
    *
    * Scale shape: a pure scan-side projection — no shuffle, no join;
    * the DP runs inside whole-stage codegen. */
  def rougeL(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame = {
    val base = pairs.select(col(idCol).as("pair_id"),
      graft.functions.OptimizerFence.fence(TextAnalysis.tokens(lower(col(candCol)))).as("__ct"),
      graft.functions.OptimizerFence.fence(TextAnalysis.tokens(lower(col(refCol)))).as("__rt"))
    val withLcs = base.select(col("pair_id"),
      size(col("__ct")).cast("long").as("cand_len"),
      size(col("__rt")).cast("long").as("ref_len"),
      graft.functions.LcsLength.column(col("__ct"), col("__rt"))
        .cast("long").as("lcs"))
    val pm = when(col("cand_len") > 0, microRatio(col("lcs"), col("cand_len")))
    val rm = when(col("ref_len") > 0, microRatio(col("lcs"), col("ref_len")))
    withLcs.select(col("pair_id"), col("cand_len"), col("ref_len"),
      col("lcs"),
      (pm.cast("double") / 1000000.0).as("rouge_p"),
      (rm.cast("double") / 1000000.0).as("rouge_r"),
      when(pm.isNotNull && rm.isNotNull,
        when(pm + rm > 0,
          floor((pm * rm * 2L).cast("double") / (pm + rm) + 0.5) / 1000000.0)
          .otherwise(0.0)).as("rouge_f1"))
  }

  /** Word error rate — token-level Levenshtein distance (unit
    * insert/delete/substitute) over hypothesis/reference pairs, the
    * ASR/translation counterpart of [[rougeL]]. The kernel is the
    * codegen'd [[graft.functions.ArrayEditDistance]] (Spark's builtin
    * `levenshtein` is character-level); `wer = edits / ref_len`
    * micro-floored (can exceed 1 — standard WER semantics), null for
    * an empty reference. A shuffle-free scan-side projection. */
  def wer(pairs: DataFrame, idCol: String, hypCol: String,
      refCol: String): DataFrame = {
    val base = pairs.select(col(idCol).as("pair_id"),
      graft.functions.OptimizerFence.fence(TextAnalysis.tokens(lower(col(hypCol)))).as("__ht"),
      graft.functions.OptimizerFence.fence(TextAnalysis.tokens(lower(col(refCol)))).as("__rt"))
    base.select(col("pair_id"),
      size(col("__ht")).cast("long").as("hyp_len"),
      size(col("__rt")).cast("long").as("ref_len"),
      graft.functions.ArrayEditDistance.column(col("__ht"), col("__rt"))
        .cast("long").as("edits"))
      .withColumn("wer", when(col("ref_len") > 0,
        floor(col("edits").cast("double") * 1000000.0 / col("ref_len") + 0.5)
          / 1000000.0))
  }

  /** Reliability diagram + expected calibration error (ECE) for a
    * [0, 1]-confidence classifier against boolean/0-1 outcomes — the QA
    * gate on the quality/toxicity classifiers that decide what enters a
    * training corpus (an overconfident filter silently skews the mix).
    * Equal-width binning: bin i covers [i/bins, (i+1)/bins), conf = 1
    * clamps into the last bin; `gap = |accuracy − avg_conf|` per bin and
    * `ece = Σ_b n_b·gap_b / N` (Naeini 2015 / Guo 2017), stamped on
    * every row for one-query consumption.
    *
    * Determinism: confidences quantize to micro longs scan-side BEFORE
    * any sum (double summation is order-dependent; integer sums are
    * not), so bin means, accuracies, and the ECE are exact integer
    * arithmetic with one micro-floored division each.
    *
    * Scale shape: one pre-combined groupBy over at most `bins` keys;
    * the ECE total rides a one-row broadcast back onto the bin rows.
    * Returns (bin, n, avg_conf, accuracy, gap, ece), 6 dp. */
  def calibrationReport(scored: DataFrame, confCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"calibrationReport needs bins >= 2, got $bins")
    val cm = floor(col(confCol) * 1000000.0 + 0.5).cast("long")
    val bin = least(floor((cm * bins).cast("double") / 1000000.0).cast("long"),
      lit(bins - 1L))
    val perBin = scored
      .select(bin.as("bin"), cm.as("__cm"),
        col(labelCol).cast("long").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__cm")).as("__cs"),
        sum(col("__y")).as("__ys"))
      .select(col("bin"), col("n"),
        floor(col("__cs").cast("double") / col("n") + 0.5).cast("long")
          .as("__confm"),
        floor(col("__ys").cast("double") * 1000000.0 / col("n") + 0.5)
          .cast("long").as("__accm"))
      .withColumn("__gap", abs(col("__accm") - col("__confm")))
    val ece = perBin.agg(
      floor(sum(col("n") * col("__gap")).cast("double") / sum(col("n")) + 0.5)
        .cast("long").as("__ecem"))
    perBin.crossJoin(broadcast(ece)).select(
      col("bin"), col("n"),
      (col("__confm").cast("double") / 1000000.0).as("avg_conf"),
      (col("__accm").cast("double") / 1000000.0).as("accuracy"),
      (col("__gap").cast("double") / 1000000.0).as("gap"),
      (col("__ecem").cast("double") / 1000000.0).as("ece"))
  }

  /** Delete-one-bucket jackknife confidence interval for a corpus-level
    * mean — the deterministic error bar on any per-document metric
    * (mean quality, dedup rate, pass rate): resampling without an RNG,
    * so it fits the engine's exactness contract where bootstrap cannot.
    * With B disjoint buckets, leave-one-out means
    * `θ̂_i = (S − s_i)/(N − n_i)` give
    * `se = sqrt((B−1)/B · Σ(θ̂_i − θ̄)²)` (Efron & Stein 1981; grouped
    * jackknife), and the interval centers on the full-sample mean with
    * a z = 1.96 multiplier. Values micro-quantize scan-side before any
    * sum; the one sqrt is IEEE-exact; the oracle spells the identical
    * arrangement.
    *
    * Scale shape: ONE corpus scan pre-combines into B (count, sum)
    * rows (materialized — B is tiny and referenced by the totals AND
    * the leave-one-out pass); everything after is B-row math. Returns
    * one row (n, n_buckets, mean, se, lo, hi), 6 dp; a single-bucket
    * input yields null se/lo/hi. */
  def jackknifeCI(df: DataFrame, valueCol: String,
      bucketCol: String): DataFrame = {
    val vm = floor(col(valueCol) * 1000000.0 + 0.5).cast("long")
    val perBucket = df.select(col(bucketCol).as("b"), vm.as("v"))
      .groupBy("b").agg(count(lit(1)).as("bn"), sum(col("v")).as("bs"))
      .localCheckpoint()
    val tot = perBucket.agg(sum(col("bn")).as("n"), sum(col("bs")).as("s"),
      count(lit(1)).as("nb"))
    val loo = perBucket.crossJoin(broadcast(tot))
      .select(col("n"), col("s"), col("nb"),
        when(col("n") > col("bn"),
          floor((col("s") - col("bs")).cast("double") /
            (col("n") - col("bn")) + 0.5).cast("long")).as("theta"))
    val thetaMean = loo.agg(
      floor(sum(col("theta")).cast("double") / count(col("theta")) + 0.5)
        .cast("long").as("tm"))
    val ss = loo.crossJoin(broadcast(thetaMean))
      .agg(max(col("n")).as("n"), max(col("s")).as("s"),
        max(col("nb")).as("nb"), max(col("tm")).as("tm"),
        sum((col("theta") - col("tm")) * (col("theta") - col("tm")))
          .as("ss"))
    val meanM = floor(col("s").cast("double") / col("n") + 0.5).cast("long")
    val seM = when(col("nb") > 1 && col("ss").isNotNull,
      floor(sqrt((col("nb") - 1).cast("double") * col("ss") / col("nb"))
        + 0.5).cast("long"))
    val deltaM = floor(seM.cast("double") * 1.96 + 0.5).cast("long")
    ss.select(col("n"), col("nb").as("n_buckets"),
      (meanM.cast("double") / 1000000.0).as("mean"),
      (seM.cast("double") / 1000000.0).as("se"),
      ((meanM - deltaM).cast("double") / 1000000.0).as("lo"),
      ((meanM + deltaM).cast("double") / 1000000.0).as("hi"))
  }

  /** Retrieval evaluation at k — recall@k, MRR@k, and nDCG@k per query
    * from a ranked run table against graded relevance judgments (the
    * missing half of the [[Retrieval]] family: BM25/RRF produce ranked
    * lists; this scores them). Gains are the standard `2^rel − 1`;
    * discounts `1/log2(rank+1)`; the ideal ranking sorts each query's
    * judgments by (rel desc, doc asc). Every DCG term micro-floors
    * BEFORE its per-query sum, MRR is the exact rational 1/first-hit
    * rank, and nDCG divides the two micro sums — so the rows
    * hash-match a SQL oracle (log2 rides the t12 ln/round precedent).
    * Queries with no positive judgments yield null recall/nDCG.
    *
    * Scale shape: equi-joins on (query, doc) skinny keys; the ideal
    * ranking window partitions per query over judgment-list-bounded
    * rows; everything pre-combines. Expects the SAME `qCol`/`docCol`
    * names in both inputs. Returns (q_id, n_rel, hits, recall_at_k,
    * mrr_at_k, ndcg_at_k). */
  def retrievalMetrics(runs: DataFrame, qrels: DataFrame, qCol: String,
      docCol: String, rankCol: String, relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"retrievalMetrics needs k >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val run = runs.select(col(qCol).as("q_id"), col(docCol).as("doc_id"),
      col(rankCol).cast("long").as("rnk")).where(col("rnk") <= k)
    val rel = qrels.select(col(qCol).as("q_id"), col(docCol).as("doc_id"),
      col(relCol).cast("long").as("rel")).where(col("rel") > 0)
    def dcgTerm(relC: Column, rankC: Column): Column =
      floor((pow(lit(2.0), relC) - 1.0) * 1000000.0 / log2(rankC + 1) + 0.5)
        .cast("long")
    val perQ = run.join(rel, Seq("q_id", "doc_id"))
      .select(col("q_id"), col("rnk"), dcgTerm(col("rel"), col("rnk"))
        .as("__term"))
      .groupBy("q_id")
      .agg(count(lit(1)).as("hits"), min(col("rnk")).as("__minrnk"),
        sum(col("__term")).as("__dcg"))
    val ideal = rel
      .withColumn("__irnk", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("rel").desc, col("doc_id").asc)))
      .where(col("__irnk") <= k)
      .select(col("q_id"), dcgTerm(col("rel"), col("__irnk")).as("__it"))
      .groupBy("q_id").agg(sum(col("__it")).as("__idcg"))
    val relAgg = rel.groupBy("q_id").agg(count(lit(1)).as("n_rel"))
    runs.select(col(qCol).as("q_id")).distinct()
      .join(relAgg, Seq("q_id"), "left")
      .join(perQ, Seq("q_id"), "left")
      .join(ideal, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_rel", "hits", "__dcg"))
      .select(col("q_id"), col("n_rel"), col("hits"),
        when(col("n_rel") > 0,
          floor(col("hits").cast("double") * 1000000.0 / col("n_rel") + 0.5)
            / 1000000.0).as("recall_at_k"),
        coalesce(when(col("__minrnk").isNotNull,
          floor(lit(1000000.0) / col("__minrnk") + 0.5) / 1000000.0),
          lit(0.0)).as("mrr_at_k"),
        when(col("__idcg") > 0,
          floor(col("__dcg").cast("double") * 1000000.0 / col("__idcg") + 0.5)
            / 1000000.0).as("ndcg_at_k"))
  }

  /** Unbiased pass@k estimator (Chen et al. 2021, HumanEval §2.1) over
    * per-sample outcome rows: for each problem with n samples and c
    * passes, `pass@k = 1 − C(n−c, k)/C(n, k)`, computed as the exact
    * left-to-right product `Π_{i<k} (n−c−i)/(n−i)` — each term is a
    * rational of exact integers and the fold order is fixed, so the
    * double trajectory is engine-exact (the oracle spells the same
    * fold); 6-dp rounded. Problems with n − c < k (fewer failures than
    * k draws) score 1 exactly; problems with n < k yield null (the
    * estimator is undefined — not enough samples).
    *
    * Scale shape: one pre-combined (problem → n, c) count; the k-term
    * fold is a scan-side expression over those two integers. Returns
    * (problem_id, n, c, pass_at_<k>…) sorted columns per requested k. */
  def passAtK(samples: DataFrame, problemCol: String, passCol: String,
      ks: Seq[Int] = Seq(1, 10)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"passAtK needs ks >= 1, got $ks")
    val perProblem = samples
      .select(col(problemCol).as("problem_id"),
        col(passCol).cast("long").as("__p"))
      .groupBy("problem_id")
      .agg(count(lit(1)).as("n"), sum(col("__p")).as("c"))
    val cols = ks.map { k =>
      val prod = aggregate(sequence(lit(0), lit(k - 1)), lit(1.0),
        (acc, i) => acc * ((col("n") - col("c") - i).cast("double") /
          (col("n") - i)))
      when(col("n") < k, lit(null).cast("double"))
        .when(col("n") - col("c") < k, 1.0)
        .otherwise(round(lit(1.0) - prod, 6))
        .as(s"pass_at_$k")
    }
    perProblem.select(col("problem_id") +: col("n") +: col("c") +: cols: _*)
  }

  /** Per-class precision/recall/F1 + macro averages from (truth,
    * prediction) rows — the confusion-matrix report for the classifiers
    * that gate a corpus (language-ID routing, quality/toxicity filters).
    * Per class: tp / (tp + fp), tp / (tp + fn), harmonic on micro longs;
    * a class never predicted has null precision, never occurring has
    * null recall, F1 null when either side is. The `__macro__` row
    * carries the unweighted means over classes appearing in the truth
    * column (the standard macro convention) plus micro accuracy.
    *
    * Scale shape: ONE pre-combined (truth, pred) count collapses the
    * corpus to confusion-cardinality rows; marginals and the macro fold
    * all derive from that tiny table. Returns (label, n_true, n_pred,
    * tp, precision, recall, f1) — one row per class plus `__macro__`. */
  def classificationReport(scored: DataFrame, trueCol: String,
      predCol: String): DataFrame = {
    // materialize the confusion table: it is confusion-cardinality tiny
    // and referenced by the truth/pred/tp marginals AND the macro fold —
    // without this the corpus scan (often an expensive classifier
    // expression) re-runs once per reference
    val cells = scored
      .groupBy(col(trueCol).cast("string").as("t"),
        col(predCol).cast("string").as("p"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val truth = cells.groupBy(col("t").as("label"))
      .agg(sum(col("n")).as("n_true"))
    val pred = cells.groupBy(col("p").as("label"))
      .agg(sum(col("n")).as("n_pred"))
    val tp = cells.where(col("t") === col("p"))
      .select(col("t").as("label"), col("n").as("tp"))
    val perClass = truth.join(pred, Seq("label"), "full")
      .join(tp, Seq("label"), "left")
      .na.fill(0L, Seq("n_true", "n_pred", "tp"))
    val pm = when(col("n_pred") > 0, microRatio(col("tp"), col("n_pred")))
    val rm = when(col("n_true") > 0, microRatio(col("tp"), col("n_true")))
    val f1m = when(pm.isNotNull && rm.isNotNull,
      when(pm + rm > 0,
        floor((pm * rm * 2L).cast("double") / (pm + rm) + 0.5).cast("long"))
        .otherwise(0L))
    val classRows = perClass.select(col("label"), col("n_true"),
      col("n_pred"), col("tp"), pm.as("__pm"), rm.as("__rm"),
      f1m.as("__fm"))
    // macro over truth-present classes; micro accuracy = Σtp / Σn_true
    // explicit Σ/n (not avg(): its accumulation strategy is
    // engine-specific; an exact long sum over one division is not)
    def meanMicro(c: Column): Column =
      floor(sum(coalesce(c, lit(0L))).cast("double") / count(lit(1)) + 0.5)
        .cast("long")
    val macroRow = classRows.where(col("n_true") > 0)
      .agg(sum(col("n_true")).as("n_true"), sum(col("n_pred")).as("n_pred"),
        sum(col("tp")).as("tp"),
        meanMicro(col("__pm")).as("__pm"),
        meanMicro(col("__rm")).as("__rm"),
        meanMicro(col("__fm")).as("__fm"))
      .select(lit("__macro__").as("label"), col("n_true"), col("n_pred"),
        col("tp"), col("__pm"), col("__rm"), col("__fm"))
    classRows.unionByName(macroRow).select(
      col("label"), col("n_true"), col("n_pred"), col("tp"),
      (col("__pm").cast("double") / 1000000.0).as("precision"),
      (col("__rm").cast("double") / 1000000.0).as("recall"),
      (col("__fm").cast("double") / 1000000.0).as("f1"))
  }

  /** Character n-grams as a MULTISET (per-position substr — chars have
    * no array to zip_with over); empty when the string is shorter than
    * n. */
  private def charGrams(s: Column, n: Int): Column =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - n + 1),
        i => s.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** chrF2 (Popović 2015): character n-gram F-score with β = 2, orders
    * 1–6 over whitespace-stripped lowercased text — the tokenization-free
    * MT/generation metric that complements the word-gram family
    * ([[rougeN]], [[bleu]]). Per order: clipped char-gram precision and
    * recall (0 when that side has no grams of the order — the fixed
    * convention micro-determinism requires); P and R average the six
    * orders; chrF2 = 5·P·R / (4·P + R) on micro longs (0 when both are
    * 0). Returns (pair_id, cand_chars, ref_chars, chr_p, chr_r, chrf2),
    * 6 dp.
    *
    * Scale shape: identical to [[bleu]] — all six orders ride ONE
    * side-tagged explode keyed (pair, n, md5(gram)); counts pre-combine;
    * text never crosses the exchange. */
  def chrF(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame = {
    val maxN = 6
    def strip(c: Column): Column = regexp_replace(lower(c), "\\s+", "")
    val base = pairs.select(col(idCol).as("pair_id"),
      strip(col(candCol)).as("__cs"), strip(col(refCol)).as("__rs"))
    val allN = (1 to maxN).map { n =>
      concat(
        transform(charGrams(col("__cs"), n),
          g => struct(lit(n).as("n"), g.as("g"), lit(1).as("side"))),
        transform(charGrams(col("__rs"), n),
          g => struct(lit(n).as("n"), g.as("g"), lit(2).as("side"))))
    }
    val counts = base
      .select(col("pair_id"), explode(concat(allN: _*)).as("t"))
      .select(col("pair_id"), col("t.n").as("n"),
        md5(col("t.g")).as("gram_key"), col("t.side"))
      .groupBy("pair_id", "n", "gram_key")
      .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("cc"),
        sum(when(col("side") === 2, 1L).otherwise(0L)).as("rc"))
    val perN = counts.groupBy("pair_id", "n")
      .agg(sum(col("cc")).as("cn"), sum(col("rc")).as("rn"),
        sum(least(col("cc"), col("rc"))).as("mg"))
      .select(col("pair_id"),
        when(col("cn") > 0, microRatio(col("mg"), col("cn")))
          .otherwise(0L).as("pm"),
        when(col("rn") > 0, microRatio(col("mg"), col("rn")))
          .otherwise(0L).as("rm"))
    val perPair = perN.groupBy("pair_id")
      .agg(sum(col("pm")).as("pm_sum"), sum(col("rm")).as("rm_sum"))
      .select(col("pair_id"),
        floor(col("pm_sum").cast("double") / maxN + 0.5).cast("long")
          .as("__pm"),
        floor(col("rm_sum").cast("double") / maxN + 0.5).cast("long")
          .as("__rm"))
    pairs.select(col(idCol).as("pair_id"),
        length(strip(col(candCol))).cast("long").as("cand_chars"),
        length(strip(col(refCol))).cast("long").as("ref_chars"))
      .join(perPair, Seq("pair_id"), "left")
      .na.fill(0L, Seq("__pm", "__rm"))
      .select(col("pair_id"), col("cand_chars"), col("ref_chars"),
        (col("__pm").cast("double") / 1000000.0).as("chr_p"),
        (col("__rm").cast("double") / 1000000.0).as("chr_r"),
        when(col("__pm") * 4 + col("__rm") > 0,
          floor((col("__pm") * col("__rm") * 5L).cast("double") /
            (col("__pm") * 4 + col("__rm")) + 0.5) / 1000000.0)
          .otherwise(0.0).as("chrf2"))
  }

  /** Exact ROC-AUC with midrank tie handling — the discrimination
    * counterpart of [[calibrationReport]]'s calibration for corpus-gate
    * classifiers. Uses the Mann–Whitney identity
    * `AUC = (Σ_{pos} rank − n⁺(n⁺+1)/2) / (n⁺·n⁻)` with average ranks
    * on ties, folded into ALL-INTEGER algebra: scores quantize to micro
    * longs scan-side, and per distinct score `2·Σ_{pos} rank =
    * Σ_s tiedPos_s·(2·below_s + tied_s + 1)` — so the AUC numerator is
    * exact and the single division micro-floors at 6 dp.
    *
    * Scale shape: one pre-combined (score → pos/total counts) groupBy
    * collapses the corpus to score-cardinality rows (≤ 10⁶ + 1 levels
    * by quantization — the t26 histogram precedent: resolution-bounded,
    * never corpus-cardinality); the cumulative window runs over those
    * bounded rows; one exact-integer global fold returns ONE row
    * (n_pos, n_neg, auc). Degenerate single-class inputs yield null. */
  def rocAuc(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sm = floor(col(scoreCol) * 1000000.0 + 0.5).cast("long")
    val perScore = scored
      .select(sm.as("s"), col(labelCol).cast("long").as("__y"))
      .groupBy("s")
      .agg(count(lit(1)).as("tied"), sum(col("__y")).as("tied_pos"))
    // below_s = ranks preceding this score level (score-cardinality rows)
    val w = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val withBelow = perScore
      .withColumn("below", coalesce(sum(col("tied")).over(w), lit(0L)))
    val agg = withBelow.agg(
      sum(col("tied_pos")).as("n_pos"),
      sum(col("tied") - col("tied_pos")).as("n_neg"),
      sum(col("tied_pos") * (col("below") * 2 + col("tied") + 1))
        .as("rank2_sum"))
    agg.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        floor((col("rank2_sum") - col("n_pos") * (col("n_pos") + 1))
          .cast("double") * 1000000.0 / (col("n_pos") * col("n_neg") * 2)
          + 0.5) / 1000000.0).as("auc"))
  }

  /** BLEU-4 over (pair_id, candidate, reference) rows (Papineni 2002,
    * single reference) with "+1" smoothing on orders 2–4 (Lin & Och
    * 2004: p_n = (m_n + 1)/(c_n + 1), so a zero higher-order match
    * doesn't zero the geometric mean). The geometric mean runs as
    * `sqrt(sqrt(p1·p2)·sqrt(p3·p4))` over micro longs — every product
    * is < 2⁵³ (exact in double) and sqrt is IEEE-correctly-rounded, so
    * the value is engine-exact; the brevity-penalty `exp(1 − r/c)` is
    * the one 6-dp-rounded step. A candidate with zero tokens scores
    * bleu = 0. Output: (pair_id, cand_len, ref_len, p1..p4, bp, bleu). */
  def bleu(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame = {
    val maxN = 4
    val base = pairs.select(col(idCol).as("pair_id"),
      graft.functions.OptimizerFence.fence(TextAnalysis.tokens(lower(col(candCol)))).as("__ct"),
      graft.functions.OptimizerFence.fence(TextAnalysis.tokens(lower(col(refCol)))).as("__rt"))
    // one explode for all 4 orders: (n, gram, side)
    val allN = (1 to maxN).map { n =>
      transform(taggedGrams(col("__ct"), col("__rt"), n),
        t => struct(lit(n).as("n"), t.getField("g").as("g"),
          t.getField("side").as("side")))
    }
    val counts = base
      .select(col("pair_id"), explode(concat(allN: _*)).as("t"))
      .select(col("pair_id"), col("t.n").as("n"),
        md5(col("t.g")).as("gram_key"), col("t.side"))
      .groupBy("pair_id", "n", "gram_key")
      .agg(sum(when(col("side") === 1, 1L).otherwise(0L)).as("cc"),
        sum(when(col("side") === 2, 1L).otherwise(0L)).as("rc"))
    val perN = counts.groupBy("pair_id", "n")
      .agg(sum(col("cc")).as("cn"), sum(col("rc")).as("rn"),
        sum(least(col("cc"), col("rc"))).as("mg"))
    def at(n: Int, c: Column): Column = max(when(col("n") === n, c))
    val perPair = perN.groupBy("pair_id").agg(
      coalesce(at(1, col("cn")), lit(0L)).as("c1"),
      coalesce(at(1, col("rn")), lit(0L)).as("r1"),
      coalesce(at(1, when(col("cn") > 0, microRatio(col("mg"), col("cn")))
        .otherwise(0L)), lit(0L)).as("p1m"),
      coalesce(at(2, microRatio(col("mg") + 1, col("cn") + 1)), lit(1000000L))
        .as("p2m"),
      coalesce(at(3, microRatio(col("mg") + 1, col("cn") + 1)), lit(1000000L))
        .as("p3m"),
      coalesce(at(4, microRatio(col("mg") + 1, col("cn") + 1)), lit(1000000L))
        .as("p4m"))
    val bpRaw = when(col("c1") === 0, 0.0)
      .when(col("c1") >= col("r1"), 1.0)
      .otherwise(exp(lit(1.0) - col("r1").cast("double") / col("c1")))
    val gm = sqrt(sqrt((col("p1m") * col("p2m")).cast("double")) *
      sqrt((col("p3m") * col("p4m")).cast("double")))
    pairs.select(col(idCol).as("pair_id"))
      .join(perPair, Seq("pair_id"), "left")
      .na.fill(0L, Seq("c1", "r1", "p1m"))
      .na.fill(1000000L, Seq("p2m", "p3m", "p4m"))
      .select(col("pair_id"), col("c1").as("cand_len"), col("r1").as("ref_len"),
        (col("p1m").cast("double") / 1000000.0).as("p1"),
        (col("p2m").cast("double") / 1000000.0).as("p2"),
        (col("p3m").cast("double") / 1000000.0).as("p3"),
        (col("p4m").cast("double") / 1000000.0).as("p4"),
        round(bpRaw, 6).as("bp"),
        when(col("c1") > 0, round(bpRaw * gm / 1000000.0, 6))
          .otherwise(0.0).as("bleu"))
  }

  /** Minimum-Bayes-risk candidate selection (self-consistency for
    * generation pipelines): per problem, pick the candidate maximizing
    * mean pairwise ROUGE-n F1 against its k−1 siblings — the "most
    * central sample wins" rule that beats plain majority vote on
    * free-form outputs. Ties break on candidate id; a single-candidate
    * problem wins trivially with a null score.
    *
    * Scale shape: GRAMS-FIRST — each candidate explodes once to
    * (problem, cand, md5-gram, count) and the k² pairwise clipped
    * matches come from a gram-keyed equi-join WITHIN the problem, so
    * candidate text never enters the self-join and the shuffle carries
    * (problem, hash, id, count) only; per-pair F1 is the t57 micro
    * algebra; the winner is a candidate-cardinality window. k is the
    * per-problem sample budget (human-sized), so k² stays trivial.
    * Returns (problem, winner_id, mbr_score, k). */
  def mbrSelect(cands: DataFrame, problemCol: String, idCol: String,
      textCol: String, n: Int = 2): DataFrame = {
    require(n >= 1, s"mbrSelect needs n >= 1, got $n")
    // widenNarrowScan + fence: the gram fold is the dominant per-row cost
    // (guide §2.5 / the substringAnchors measurement)
    val base = graft.pipeline.AdaptiveParts
      .widenNarrowScan(cands, col(problemCol), col(idCol))
      .select(col(problemCol).as("problem"),
        col(idCol).as("cand_id"),
        graft.functions.OptimizerFence.fence(TextAnalysis.tokens(lower(col(textCol)))).as("__t"))
    val grams = base.select(col("problem"), col("cand_id"),
        explode(gramArr(col("__t"), n)).as("g"))
      .select(col("problem"), col("cand_id"), md5(col("g")).as("gk"))
      .groupBy("problem", "cand_id", "gk").agg(count(lit(1)).as("c"))
      .localCheckpoint() // both sides of the match join consume it
    val totals = grams.groupBy("problem", "cand_id").agg(sum(col("c")).as("ng"))
    val ids = base.select(col("problem"), col("cand_id"))
      .join(totals, Seq("problem", "cand_id"), "left")
      .na.fill(0L, Seq("ng"))
    val pairs = ids.as("a").join(ids.as("b"),
        col("a.problem") === col("b.problem") &&
          col("a.cand_id") =!= col("b.cand_id"))
      .select(col("a.problem").as("problem"), col("a.cand_id").as("ida"),
        col("b.cand_id").as("idb"), col("a.ng").as("na"), col("b.ng").as("nb"))
    val matches = grams.as("x").join(grams.as("y"),
        col("x.problem") === col("y.problem") && col("x.gk") === col("y.gk") &&
          col("x.cand_id") =!= col("y.cand_id"))
      .select(col("x.problem").as("problem"), col("x.cand_id").as("ida"),
        col("y.cand_id").as("idb"), least(col("x.c"), col("y.c")).as("m0"))
      .groupBy("problem", "ida", "idb").agg(sum(col("m0")).as("m"))
    val withM = pairs.join(matches, Seq("problem", "ida", "idb"), "left")
      .na.fill(0L, Seq("m"))
    val pm = when(col("na") > 0, microRatio(col("m"), col("na")))
    val rm = when(col("nb") > 0, microRatio(col("m"), col("nb")))
    val f1m = when(pm.isNotNull && rm.isNotNull,
      when(pm + rm > 0,
        floor((pm * rm * 2L).cast("double") / (pm + rm) + 0.5).cast("long"))
        .otherwise(0L)).otherwise(0L)
    val perCand = withM.select(col("problem"), col("ida"), f1m.as("f1m"))
      .groupBy("problem", "ida")
      .agg(sum(col("f1m")).as("sf"), count(lit(1)).as("np"))
    val kTab = ids.groupBy("problem").agg(count(lit(1)).as("k"))
    val all = ids.select(col("problem"), col("cand_id").as("ida"))
      .join(perCand, Seq("problem", "ida"), "left")
      .join(kTab, "problem")
    val scoreMicro = when(col("np").isNotNull,
      floor(col("sf").cast("double") / col("np") + 0.5))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("problem"))
      .orderBy(scoreMicro.desc, col("ida").asc)
    all.withColumn("__rnk", row_number().over(w)).where(col("__rnk") === 1)
      .select(col("problem"), col("ida").as("winner_id"),
        (scoreMicro / 1000000.0).as("mbr_score"), col("k"))
  }

  /** Exact Spearman rank correlation between two integer signal columns,
    * grouped — the metric-agreement audit between quality signals (or
    * two judge models' scores). Average-tie ranks derive from a VALUE
    * HISTOGRAM per group (pre-combined agg + a value-cardinality
    * cumulative window — never a row-cardinality ranking sort): a value
    * with count c and S smaller rows gives every row the DOUBLED average
    * rank 2S + c + 1, kept integral (Pearson is affine-invariant, so
    * rho is unchanged). rho folds from six per-group integer sums in one
    * agg; sums convert to double BEFORE any product (the n·Σr² product
    * overflows int64 past ~40k rows; the integer sums themselves stay
    * exact below 2^53, i.e. groups to ~130k rows — beyond that, lift to
    * the gramSketch decimal path). Rounded 6dp. Returns
    * (byCol, n_docs, rho). */
  def spearman(df: DataFrame, xCol: String, yCol: String,
      byCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dranks(c: String, rName: String): DataFrame =
      df.select(col(byCol).as("__g"), col(c).cast("long").as("__v"))
        .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
        .withColumn("__s", coalesce(
          sum(col("__c")).over(Window.partitionBy("__g").orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("__g"), col("__v"),
          (lit(2L) * col("__s") + col("__c") + 1L).as(rName))
    val rx = dranks(xCol, "__rx")
    val ry = dranks(yCol, "__ry")
    val rows = df.select(col(byCol).as("__g"),
        col(xCol).cast("long").as("__vx"), col(yCol).cast("long").as("__vy"))
      .join(rx.withColumnRenamed("__v", "__vx"), Seq("__g", "__vx"))
      .join(ry.withColumnRenamed("__v", "__vy"), Seq("__g", "__vy"))
    val agg = rows.groupBy(col("__g").as(byCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__rx")).as("__sx"), sum(col("__ry")).as("__sy"),
      sum(col("__rx") * col("__rx")).as("__sxx"),
      sum(col("__ry") * col("__ry")).as("__syy"),
      sum(col("__rx") * col("__ry")).as("__sxy"))
    val nd = col("n_docs").cast("double")
    def d(c: String) = col(c).cast("double")
    // a constant signal makes its variance term exactly 0 — rho is
    // undefined there, emitted as null (never NaN/Inf, which would also
    // render differently across engines)
    val denom = (nd * d("__sxx") - d("__sx") * d("__sx")) *
      (nd * d("__syy") - d("__sy") * d("__sy"))
    agg.select(col(byCol), col("n_docs"),
      when(denom > 0.0,
        round((nd * d("__sxy") - d("__sx") * d("__sy")) / sqrt(denom), 6))
        .as("rho"))
  }
}
