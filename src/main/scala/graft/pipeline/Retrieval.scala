package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sparse lexical retrieval over the document corpus: the postings/tf stage,
  * Okapi BM25 top-k search, and TF-IDF salient-term extraction — the
  * retrieval-side operators a training-data pipeline needs next to the
  * dedup family (corpus audits: "which documents answer this probe",
  * "what is each document about").
  *
  * Not in the reference (it has no free-text search surface); built
  * Spark-first per the §2.7 charter.
  *
  * 100 TB shape: the ONLY corpus-cardinality structure is the (doc_id,
  * term, tf, dl) postings relation, produced scan-side by one
  * explode+groupBy whose partial aggregation pre-combines repeated terms
  * per task. Everything query-sized (the probe terms, their document
  * frequencies, the corpus N/avgdl stats) is broadcast — scoring therefore
  * touches only postings that match a probe term (broadcast semi-join at
  * the scan), never the full vocabulary, and the final per-(query, doc)
  * sum + per-query top-k window shuffle only the matched slice.
  */
object Retrieval {

  /** The postings relation: one row per (doc, term) with the term count and
    * the document length riding along from the same scan (no separate
    * doc-length join later). Tokenization matches [[TextAnalysis.tokens]]
    * (lowercased, whitespace-split, empties dropped) so retrieval and the
    * text-analysis operators agree on what a token is. */
  def postings(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    // dl is computed on a PRE-explode projection: written inline next to the
    // explode, the analyzer would place size(tokenize(text)) in the project
    // ABOVE the Generate and re-tokenize the document once per exploded
    // row — a |tokens|× regex blowup (measured 9× on the bench corpus)
    // guide §2.5 (r20): tokenize + explode inherit scan width — a single
    // small corpus file runs the postings build on 1-3 tasks; identity on
    // wide scans (a real corpus is many shards)
    AdaptiveParts.widenNarrowScan(docs, col(idCol))
      .select(col(idCol), size(toks).as("dl"), toks.as("__toks"))
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** One-row corpus statistics (N, avgdl) as a broadcastable DataFrame. */
  private def corpusStats(docs: DataFrame, textCol: String): DataFrame =
    broadcast(docs.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(TextAnalysis.tokenCount(col(textCol)).cast("double")).as("__avgdl")))

  /** The same (N, avgdl) derived from an already-built postings relation —
    * the serving path must not rescan the raw corpus for stats the store
    * already determines. One skinny agg over the distinct (doc, dl) pairs. */
  private def storeStats(post: DataFrame, idCol: String): DataFrame =
    broadcast(post.select(col(idCol), col("dl")).distinct().agg(
      count(lit(1)).cast("double").as("__n"),
      avg(col("dl").cast("double")).as("__avgdl")))

  /** Okapi BM25 top-k: for each probe query, the `k` best-scoring documents.
    *
    * score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * with the standard non-negative idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
    *
    * `queries` (q_id, q_text) must be probe-sized (authored audit queries,
    * not a second corpus): its distinct term set is broadcast twice — once
    * to semi-filter the postings scan, once to attach per-term df/idf — so
    * the df aggregation runs over matched postings only, not the whole
    * vocabulary. Deterministic across engines: doubles end-to-end, scores
    * rounded to 6 before ranking, ties broken by doc id. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id",
      queryId: String = "q_id", queryText: String = "q_text"): DataFrame =
    bm25Score(postings(docs, textCol, idCol), corpusStats(docs, textCol),
      queries, k, k1, b, idCol, queryId, queryText)

  /** [[bm25TopK]] over an already-built postings store — the 100 TB
    * operating loop: [[postings]] is materialized ONCE (parquet, ideally
    * bucketed by term so probe joins prune files), then every audit probe
    * runs against it without touching the raw corpus. Corpus stats are
    * derived from the store itself (one pre-combined agg over the distinct
    * (doc, dl) pairs), so the raw text is never rescanned. */
  def bm25TopKAgainstStore(post: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id",
      queryId: String = "q_id", queryText: String = "q_text"): DataFrame =
    bm25Score(post, storeStats(post, idCol), queries, k, k1, b,
      idCol, queryId, queryText)

  private def bm25Score(post: DataFrame, stats: DataFrame, queries: DataFrame,
      k: Int, k1: Double, b: Double, idCol: String,
      queryId: String, queryText: String): DataFrame = {
    val qterms = queries.select(col(queryId),
      explode(array_distinct(TextAnalysis.tokens(lower(col(queryText))))).as("term"))

    // document frequency over the probe vocabulary only: semi-filter the
    // postings with the broadcast term set, then one skinny agg
    val dfT = post.join(broadcast(qterms.select("term").distinct()), Seq("term"))
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))

    val matched = post
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(stats)
    val idf = log((col("__n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val tfNorm = col("tf").cast("double") * (k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("__avgdl")))
    val scored = matched.withColumn("__s", idf * tfNorm)
      .groupBy(col(queryId), col(idCol))
      .agg(round(sum(col("__s")), 6).as("score"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(idCol), col("score"), col("rank"))
  }

  /** BM25 hard-negative mining — the retrieval-training data-prep step
    * (the BM25-negatives recipe of Karpukhin et al. 2020, DPR): for each
    * (query, positive-document) pair, the `k` best-scoring documents that
    * are NOT the positive. Lexically confusable non-answers are what a
    * dense retriever trains against; random negatives are too easy.
    *
    * `posPairs` (q_id, q_text, pos_id) is probe-sized and broadcasts.
    * Candidates come from [[bm25TopK]] at k+1 (one exclusion per query at
    * most), then re-rank after dropping the positive — exact, not a
    * heuristic margin. Near-duplicates of the positive (false negatives)
    * are the caller's concern: compose with the Dedup family first when
    * the corpus isn't already deduped. */
  def hardNegatives(docs: DataFrame, posPairs: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id",
      queryId: String = "q_id", queryText: String = "q_text",
      posId: String = "pos_id"): DataFrame = {
    val cands = bm25TopK(docs, posPairs.select(col(queryId), col(queryText)),
      k + 1, k1, b, textCol, idCol, queryId, queryText)
    val neg = cands
      .join(broadcast(posPairs.select(col(queryId), col(posId))), Seq(queryId))
      .where(col(idCol) =!= col(posId))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(idCol).asc)
    neg.withColumn("neg_rank", row_number().over(w))
      .where(col("neg_rank") <= k)
      .select(col(queryId), col(posId), col(idCol), col("score"),
        col("neg_rank"))
  }

  /** TF-IDF salient terms: the `k` highest-weighted terms per document,
    * tfidf(t, d) = (tf/dl) · ln(N/df) — the corpus-audit "what is this
    * document about" projection. Unlike [[bm25TopK]] the document
    * frequencies here cover the FULL vocabulary (one pre-combined agg over
    * the postings, vocabulary-cardinality output — still skinny: term +
    * count, no doc ids). The per-doc top-k window shuffles (doc_id, term,
    * score) triples only. */
  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of ranked
    * result lists — the hybrid-retrieval merge: a lexical ([[bm25TopK]])
    * and a dense ([[Similarity.bruteForceTopK]] / IVF-PQ) list fuse into
    * one ranking with `score = Σᵢ 1/(rrfK + rankᵢ)`, missing entries
    * contributing 0. No score calibration across systems is needed —
    * only ranks — which is why RRF is the standard first fusion.
    *
    * Each input holds (q_id, doc_id, rank). Determinism: the fold joins
    * lists full-outer in ARGUMENT ORDER and sums coalesced terms in that
    * fixed nesting, so the double arithmetic is engine-reproducible
    * (and exactly commutative for the common two-list case).
    *
    * Scale shape: rank lists are (queries × k) rows — everything here is
    * probe-sized; the corpus was touched only inside the upstream
    * retrievers. The final per-query window runs over ≤ Σ list sizes. */
  def rrfFuse(lists: Seq[DataFrame], k: Int, rrfK: Int = 60,
      qCol: String = "q_id", idCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val prepared = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(qCol), col(idCol),
        (lit(1.0) / (lit(rrfK) + col(rankCol))).as(s"__s$i"))
    }
    val joined = prepared.reduce((a, b) => a.join(b, Seq(qCol, idCol), "full_outer"))
    val score = round(lists.indices
      .map(i => coalesce(col(s"__s$i"), lit(0.0)))
      .reduce(_ + _), 6)
    val w = Window.partitionBy(col(qCol))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    joined.withColumn("rrf_score", score)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qCol), col(idCol), col("rrf_score"), col("rank"))
  }

  def tfidfTopTerms(docs: DataFrame, k: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val post = postings(docs, textCol, idCol)
    val dfT = post.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val scored = post
      .join(dfT, Seq("term"))
      .crossJoin(corpusStats(docs, textCol))
      .withColumn("tfidf", round(
        col("tf").cast("double") / col("dl").cast("double") *
          log(col("__n") / col("df")), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("tfidf"), col("rank"))
  }
}
