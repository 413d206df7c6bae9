package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference / human-label QA — the RLHF-side counterpart of the
  * document-quality gates: preference-pair format auditing, inter-rater
  * agreement (Fleiss' kappa), and Bradley–Terry strength aggregation
  * from pairwise outcomes. The reference's engine surfaces record-level
  * validation and scheduled aggregation (streamalert/shared/stats.py
  * aggregates rule verdicts; rules_engine.py:175 gates records on
  * predicate verdicts); these operators apply the same gate/aggregate
  * shapes to labeled training data.
  *
  * Determinism: every fraction is lifted to integer micro-units with
  * `floor(x·10⁶ + 0.5)` (the money-in-cents move — identical IEEE ops
  * in any engine) BEFORE any cross-row sum, so the only aggregations
  * are exact integer sums and the results hash-match a SQL oracle
  * under any partitioning.
  */
object Preference {

  /** Per-pair preference-data audit — the format gate a (prompt, chosen,
    * rejected) pair must clear before it ships to reward-model training,
    * plus the length fields the corpus-level length-bias audit (verbosity
    * bias: "chosen is just longer") aggregates.
    *
    *  - `identical`: chosen and rejected are byte-equal (the label is
    *    vacuous); `empty_side`: either side is whitespace-only.
    *  - `chosen_toks`/`rejected_toks`: whitespace token counts (the
    *    [[TextAnalysis.tokenCount]] definition, shared with t1).
    *  - `len_ratio`: chosen/rejected token ratio at 6 dp (micro-floored;
    *    null when rejected is empty) — `avg(chosen_longer)` over valid
    *    pairs is the standard verbosity-bias statistic.
    *
    * Scale shape: a pure scan-side projection — no join, no shuffle, no
    * UDF; at 100 TB this is one codegen'd pass. */
  def pairAudit(pairs: DataFrame, pairId: String, chosenCol: String,
      rejectedCol: String): DataFrame = {
    val ct = TextAnalysis.tokenCount(col(chosenCol))
    val rt = TextAnalysis.tokenCount(col(rejectedCol))
    pairs.select(
      col(pairId).as("pair_id"),
      ct.cast("long").as("chosen_toks"),
      rt.cast("long").as("rejected_toks"),
      (col(chosenCol) === col(rejectedCol)).as("identical"),
      (trim(col(chosenCol)) === "" || trim(col(rejectedCol)) === "")
        .as("empty_side"),
      (ct > rt).as("chosen_longer"),
      when(rt > 0, floor(ct.cast("double") * 1000000.0 / rt + 0.5)
        / 1000000.0).as("len_ratio"))
      .withColumn("valid", !col("identical") && !col("empty_side"))
  }

  /** Fleiss' kappa — chance-corrected inter-rater agreement over a
    * (item, label) ratings table, the acceptance gate for a human
    * labeling batch (kappa below threshold → re-adjudicate before the
    * labels train anything). Items with fewer than 2 ratings carry no
    * agreement signal and are excluded (their ratings also leave the
    * category marginals, per the standard formulation).
    *
    * Math: per item, `P_i = (Σ_c c_ic² − n_i) / (n_i (n_i − 1))`
    * micro-floored; `P̄_o` = mean of the per-item micro values;
    * `P̄_e = Σ_c (total_c / total)²` with each category's square
    * micro-floored; `kappa = (P̄_o − P̄_e) / (1 − P̄_e)` as one
    * fixed-shape expression over the micro longs (null when P̄_e = 1 —
    * a single-category table has undefined kappa).
    *
    * Scale shape: one (item, label) pre-combined count, one item-level
    * re-agg, one label-cardinality agg — shuffles carry counts only,
    * and the label-marginal side is category-cardinality (human label
    * sets are small by nature). Returns ONE row
    * (n_items, n_ratings, po, pe, kappa), 6 dp. */
  /** Length-bias audit over preference pairs — the reward-hacking
    * pre-check on RLHF data: if annotators (or a judge model)
    * systematically prefer the LONGER response, a reward model trained
    * on the pairs learns length, not quality. One row out:
    * `longer_win_rate` = share of length-decided pairs where the chosen
    * side is longer (0.5 = unbiased), `mean_len_delta` = mean
    * (chosen − rejected) token delta, `effect_size` = that mean over
    * the delta's sample standard deviation (the one-sample Cohen's d a
    * data card reports; null when n < 2 or the deltas are constant).
    *
    * Scale shape: token counts are scan-side, everything folds into ONE
    * pre-combined aggregation of integer sums (Σd, Σd² — order-free
    * under any partitioning); the mean/sd division and sqrt are one
    * fixed double expression over those integer sums, micro-floored —
    * engine-exact (the q44/t70 sqrt precedent). Zero windows, zero
    * joins. Returns (n_pairs, n_ties, longer_wins, longer_win_rate,
    * mean_len_delta, effect_size). */
  def lengthBias(pairs: DataFrame, chosenCol: String,
      rejectedCol: String): DataFrame = {
    val ct = size(TextAnalysis.tokens(col(chosenCol))).cast("long")
    val rt = size(TextAnalysis.tokens(col(rejectedCol))).cast("long")
    val agg = pairs.select((ct - rt).as("__d"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__d") === 0, 1L).otherwise(0L)).as("n_ties"),
        sum(when(col("__d") > 0, 1L).otherwise(0L)).as("longer_wins"),
        sum(col("__d")).as("__sd"),
        sum(col("__d") * col("__d")).as("__sd2"))
    val nD = col("n_pairs").cast("double")
    val decided = (col("n_pairs") - col("n_ties")).cast("double")
    val sdD = col("__sd").cast("double")
    val sd2D = col("__sd2").cast("double")
    val meanD = sdD / nD
    val variance = (sd2D - sdD * sdD / nD) / (nD - 1.0)
    agg.select(col("n_pairs"), col("n_ties"), col("longer_wins"),
      when(decided > 0,
        floor(col("longer_wins").cast("double") * 1000000.0 / decided + 0.5)
          / 1000000.0).as("longer_win_rate"),
      when(col("n_pairs") > 0,
        floor(meanD * 1000000.0 + 0.5) / 1000000.0).as("mean_len_delta"),
      when(col("n_pairs") > 1 && variance > 0,
        floor(meanD / sqrt(variance) * 1000000.0 + 0.5) / 1000000.0)
        .as("effect_size"))
  }

  def fleissKappa(ratings: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val counts = ratings
      .groupBy(col(itemCol).as("item"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("c"))
    val perItem = counts.groupBy("item")
      .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("s2"))
      .where(col("n") >= 2)
    val itemsAgg = perItem
      .select(col("n"),
        floor((col("s2") - col("n")).cast("double") * 1000000.0 /
          (col("n") * (col("n") - 1)) + 0.5).cast("long").as("pim"))
      .agg(count(lit(1)).as("n_items"), sum(col("n")).as("n_ratings"),
        sum(col("pim")).as("po_sum"))
    // category marginals over qualifying items only (item-cardinality
    // broadcast semi-join; `counts` is already pre-combined)
    val catAgg = counts.join(broadcast(perItem.select("item")), Seq("item"),
        "left_semi")
      .groupBy("label").agg(sum(col("c")).as("tc"))
      .crossJoin(broadcast(itemsAgg.select(col("n_ratings").as("__tot"))))
      .select(floor((col("tc").cast("double") / col("__tot")) *
        (col("tc").cast("double") / col("__tot")) * 1000000.0 + 0.5)
        .cast("long").as("pem"))
      .agg(sum(col("pem")).as("pe_sum"))
    val pom = floor(col("po_sum").cast("double") / col("n_items") + 0.5)
      .cast("long")
    itemsAgg.crossJoin(catAgg).select(
      col("n_items"), col("n_ratings"),
      (pom.cast("double") / 1000000.0).as("po"),
      (col("pe_sum").cast("double") / 1000000.0).as("pe"),
      when(col("pe_sum") < 1000000L,
        floor((pom - col("pe_sum")).cast("double") * 1000000.0 /
          (lit(1000000L) - col("pe_sum")) + 0.5) / 1000000.0).as("kappa"))
  }

  /** Per-matchup win rates with Wilson score intervals — the arena
    * reporting table next to [[btRank]]'s global strengths: for every
    * unordered contestant pair, the lexicographically smaller side's
    * win rate over the larger with a z-confidence interval (Wilson
    * 1927; the interval of choice at small n where the normal
    * approximation misbehaves). Same-contestant rows are ignored.
    *
    * Determinism: wins/matches aggregate as exact integers; the Wilson
    * algebra is ONE fixed-shape double expression over (w, n) — every
    * step (mul/div/add and IEEE-correctly-rounded sqrt) is
    * deterministic given the same operand order, and the oracle spells
    * the identical arrangement — then rounds at 6 dp.
    *
    * Scale shape: one pre-combined (i, j) groupBy; output is
    * matchup-cardinality. Returns (item_i, item_j, n, wins, win_rate,
    * wilson_lo, wilson_hi). */
  def winRateIntervals(matches: DataFrame, aCol: String, bCol: String,
      winnerCol: String, z: Double = 1.96): DataFrame = {
    val m = matches
      .select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"),
        col(winnerCol).cast("string").as("winner"))
      .where(col("a") =!= col("b"))
    val pc = m
      .groupBy(least(col("a"), col("b")).as("item_i"),
        greatest(col("a"), col("b")).as("item_j"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("winner") === least(col("a"), col("b")), 1L)
          .otherwise(0L)).as("wins"))
    winRateIntervalsFromCounts(pc, z)
  }

  /** The Wilson projection over ALREADY-AGGREGATED matchup counts
    * (item_i, item_j, n, wins) — the stored/streaming seam: match
    * counts are LINEAR, so per-batch count rows roll up by summing
    * (the moment-store pattern) and feed this without rescanning
    * matches; [[winRateIntervals]] is this over a one-shot count. */
  def winRateIntervalsFromCounts(pc: DataFrame,
      z: Double = 1.96): DataFrame = {
    val ph = col("wins").cast("double") / col("n")
    val z2 = lit(z) * lit(z)
    val half = lit(z) * sqrt((ph * (lit(1.0) - ph) + z2 / (col("n") * 4)) /
      col("n"))
    val denom = lit(1.0) + z2 / col("n")
    pc.select(col("item_i"), col("item_j"), col("n"), col("wins"),
      (floor(col("wins").cast("double") * 1000000.0 / col("n") + 0.5) /
        1000000.0).as("win_rate"),
      round((ph + z2 / (col("n") * 2) - half) / denom, 6).as("wilson_lo"),
      round((ph + z2 / (col("n") * 2) + half) / denom, 6).as("wilson_hi"))
  }

  /** Krippendorff's alpha (nominal metric) — the agreement coefficient
    * for labeling batches where raters differ per item and slots are
    * missing (the regime Fleiss' kappa can't handle; Krippendorff 2004
    * §11.3). Items with fewer than 2 ratings drop entirely (no pairable
    * values). Using per-unit value counts n_uc, unit totals n_u,
    * marginals n_c over qualifying items, and n = Σ n_u:
    *
    *   D_o = (1/n) Σ_u Σ_c n_uc·(n_u − n_uc)/(n_u − 1)
    *   D_e = Σ_c n_c·(n − n_c) / (n·(n − 1))
    *   alpha = 1 − D_o/D_e          (null when D_e = 0: one category)
    *
    * Each per-unit term micro-floors BEFORE the cross-row sum (the
    * [[fleissKappa]] determinism contract), so the one output row
    * hash-matches a SQL oracle under any partitioning.
    *
    * Scale shape: one (item, label) pre-combined count, the unit totals
    * re-agg derives from it (never a corpus re-scan), marginals are
    * label-cardinality, and the three assembly rows cross-join as
    * broadcast singles. Returns (n_items, n_ratings, d_obs, d_exp,
    * alpha), 6 dp. */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val counts = ratings
      .groupBy(col(itemCol).as("item"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("c"))
    val perItem = counts.groupBy("item").agg(sum(col("c")).as("n"))
      .where(col("n") >= 2)
    val withN = counts.join(perItem, Seq("item"))
    val doAgg = withN
      .select(col("n"),
        floor((col("c") * (col("n") - col("c"))).cast("double") * 1000000.0 /
          (col("n") - 1) + 0.5).cast("long").as("term"))
      .agg(sum(col("term")).as("do_sum"))
    val itemsAgg = perItem.agg(count(lit(1)).as("n_items"),
      sum(col("n")).as("n_ratings"))
    val catAgg = withN.groupBy("label").agg(sum(col("c")).as("nc"))
      .crossJoin(broadcast(itemsAgg.select(col("n_ratings").as("__tot"))))
      .agg(sum(col("nc") * (col("__tot") - col("nc"))).as("de_sum"))
    val dom = floor(col("do_sum").cast("double") / col("n_ratings") + 0.5)
      .cast("long")
    val dem = floor(col("de_sum").cast("double") * 1000000.0 /
      (col("n_ratings") * (col("n_ratings") - 1)) + 0.5).cast("long")
    itemsAgg.crossJoin(doAgg).crossJoin(catAgg).select(
      col("n_items"), col("n_ratings"),
      (dom.cast("double") / 1000000.0).as("d_obs"),
      (dem.cast("double") / 1000000.0).as("d_exp"),
      when(dem > 0,
        floor((dem - dom).cast("double") * 1000000.0 / dem + 0.5) / 1000000.0)
        .as("alpha"))
  }

  /** Dawid–Skene label aggregation (hard-EM variant; Dawid & Skene
    * 1979) — THE crowd-label step beyond majority vote: workers get a
    * learned confusion matrix, so an accurate rater outvotes a spammer
    * even 1-vs-1. Init = per-item majority (ties to the smallest
    * label); each round then (M) counts worker confusion
    * `p(vote|true, w) = (c + 1)/(tot + K)` and class priors
    * `(n_t + 1)/(N + K)` (add-1 smoothing — all-integer counts), and
    * (E) re-assigns each item to the label maximizing
    * `Σ log-terms`, with every log term floor-lifted to micro longs
    * BEFORE the cross-row sum (exact integer sums; the t12 ln/round-6
    * determinism precedent), ties to the smallest label.
    *
    * Scale shape: per round, confusion/prior tables are
    * worker×K²-cardinality; the E-step joins each vote against the K
    * candidate labels (a broadcast of the K-row label set) and
    * pre-combines the (item, candidate) log-sums; `localCheckpoint`
    * per round keeps the iterative lineage flat. Returns one row per
    * item: (item, label, n_votes, n_agree) where n_agree counts votes
    * matching the final label. */
  def dawidSkene(ratings: DataFrame, itemCol: String, workerCol: String,
      labelCol: String, iters: Int = 2): DataFrame = {
    require(iters >= 1, s"dawidSkene needs iters >= 1, got $iters")
    val votes = ratings.select(col(itemCol).cast("string").as("item"),
      col(workerCol).cast("string").as("worker"),
      col(labelCol).cast("string").as("vote")).localCheckpoint()
    val labels = votes.select(col("vote").as("cand")).distinct()
    val k = labels.count()
    val nItems = broadcast(votes.select(col("item")).distinct()
      .agg(count(lit(1)).as("__n")))
    import org.apache.spark.sql.expressions.Window
    def lm(c: Column): Column = floor(log(c) * 1000000.0 + 0.5).cast("long")
    val wIn = Window.partitionBy("item")
    var assign = votes.groupBy("item", "vote").agg(count(lit(1)).as("__c"))
      .withColumn("__rn", row_number().over(
        wIn.orderBy(col("__c").desc, col("vote").asc)))
      .where(col("__rn") === 1)
      .select(col("item"), col("vote").as("t"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = votes.join(assign, "item")
      val cwtv = assigned.groupBy("worker", "t", "vote")
        .agg(count(lit(1)).as("__cnt"))
      val cwt = cwtv.groupBy("worker", "t").agg(sum(col("__cnt")).as("__tot"))
      val prior = assign.groupBy(col("t").as("cand"))
        .agg(count(lit(1)).as("__nt"))
      val cand = votes.crossJoin(broadcast(labels))
        .join(cwtv.withColumnRenamed("t", "cand"),
          Seq("worker", "cand", "vote"), "left")
        .join(cwt.withColumnRenamed("t", "cand"),
          Seq("worker", "cand"), "left")
        .select(col("item"), col("cand"),
          lm((coalesce(col("__cnt"), lit(0L)) + 1).cast("double") /
            (coalesce(col("__tot"), lit(0L)) + k)).as("__lm"))
        .groupBy("item", "cand").agg(sum(col("__lm")).as("__score"))
      assign = cand
        .join(broadcast(prior), Seq("cand"), "left")
        .crossJoin(nItems)
        .withColumn("__score", col("__score") +
          lm((coalesce(col("__nt"), lit(0L)) + 1).cast("double") /
            (col("__n") + k)))
        .withColumn("__rn", row_number().over(
          wIn.orderBy(col("__score").desc, col("cand").asc)))
        .where(col("__rn") === 1)
        .select(col("item"), col("cand").as("t"))
        .localCheckpoint()
    }
    votes.join(assign, "item")
      .groupBy(col("item"), col("t").as("label"))
      .agg(count(lit(1)).as("n_votes"),
        sum(when(col("vote") === col("t"), 1L).otherwise(0L)).as("n_agree"))
  }

  /** Bradley–Terry strength estimation from pairwise outcomes — the
    * preference-aggregation step that turns A-vs-B human verdicts into a
    * per-contestant strength/ranking (policy comparisons, arena-style
    * evals, annotator-calibration sets). `matches` rows are
    * (aCol, bCol, winnerCol) with winner ∈ {a, b}; same-contestant rows
    * are ignored.
    *
    * Algorithm: `iters` rounds of the MM update (Hunter, Annals of
    * Statistics 2004) `w_i ← W_i / Σ_j n_ij/(w_i + w_j)`, renormalized
    * to mean 1 each round. Weights live as micro-unit longs; each
    * round's per-opponent terms micro-floor BEFORE summing, so every
    * cross-row sum is an exact integer sum and the trajectory is
    * engine-exact (a SQL oracle unrolls the rounds).
    *
    * Scale shape: the corpus-sized work is ONE pass — the (i, j) match
    * count and per-contestant win count aggregations (pre-combined,
    * count-only shuffles). The contestant set is human-scale by contract
    * (ranked systems/policies — the reference's per-rule stats table is
    * the same rule-cardinality shape, rules_engine.py stats), so the MM
    * solve folds the collected k² counts driver-side, k² longs — the
    * [[Similarity.kmeansLloyd]] collect-the-centroids pattern. Returns
    * (item, w, rnk): strength at 6 dp, rank 1 = strongest (ties on
    * micro-weight break by item). */
  def btRank(matches: DataFrame, aCol: String, bCol: String,
      winnerCol: String, iters: Int = 3): DataFrame = {
    val m = matches
      .select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"),
        col(winnerCol).cast("string").as("winner"))
      .where(col("a") =!= col("b"))
    btRankFromCounts(
      m.groupBy(least(col("a"), col("b")).as("i"),
        greatest(col("a"), col("b")).as("j"))
        .agg(count(lit(1)).as("nij")),
      m.groupBy(col("winner").as("item")).agg(count(lit(1)).as("wi")),
      iters)
  }

  /** The MM solve over ALREADY-AGGREGATED (i, j, nij) match counts and
    * (item, wi) win counts — the stored/streaming seam mirroring
    * [[winRateIntervalsFromCounts]]: both tables are linear in the
    * match stream, so per-batch rows roll up by summing and re-rank
    * without rescanning matches; [[btRank]] is this over a one-shot
    * count pass. */
  def btRankFromCounts(pairCountsDf: DataFrame, winsDf: DataFrame,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"btRank needs iters >= 1, got $iters")
    val pairCounts = pairCountsDf
      .select(col("i").cast("string"), col("j").cast("string"),
        col("nij").cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val wins = winsDf
      .select(col("item").cast("string"), col("wi").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(pairCounts.nonEmpty, "btRank: no valid matches")

    val items = pairCounts.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val nItems = items.length
    // symmetric opponent view: (it, opp, nij)
    val sym = pairCounts.flatMap { case (i, j, n) =>
      Seq((i, j, n), (j, i, n)) }
    var wm: Map[String, Long] = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      // denom per item: micro-floored terms, exact long sum (order-free)
      val denom = sym.groupBy(_._1).map { case (it, opps) =>
        it -> opps.map { case (_, opp, nij) =>
          math.floor(nij.toDouble * 1.0E12 / (wm(it) + wm(opp)) + 0.5).toLong
        }.sum
      }
      val updated = items.map { it =>
        it -> math.floor(wins.getOrElse(it, 0L).toDouble * 1.0E12 /
          denom(it) + 0.5).toLong
      }
      val s = updated.map(_._2).sum
      wm = updated.map { case (it, w) =>
        it -> math.floor(w.toDouble * nItems * 1000000.0 / s + 0.5).toLong
      }.toMap
    }
    val spark = pairCountsDf.sparkSession
    import spark.implicits._
    val ranked = items.map(it => (it, wm(it)))
      .sortBy { case (it, w) => (-w, it) }
      .zipWithIndex
      .map { case ((it, w), idx) => (it, w / 1000000.0, (idx + 1).toLong) }
    ranked.toSeq.toDF("item", "w", "rnk")
  }
}
