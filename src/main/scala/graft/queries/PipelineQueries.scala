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
import graft.pipeline.{Dedup, Eval, Graphs, Multimodal, Preference, Similarity, Sketches, TextAnalysis, WebOps}

/** End-to-end curation composites and multimodal rows: corpus
  * curation, split leakage, warehouse loop, entity resolution,
  * WARC ingest, dataset cards, media plumbing. */
private[graft] trait PipelineQueries extends RegistryBase {
  // p12 composes the justext page fixtures and the URL canon chain —
  // both defined (and individually oracled) in the sibling traits
  this: TextQueries with DedupQueries =>


  // The composite training-corpus filter — the query a data-curation user
  // actually runs: exact-dedup keep verdict ∧ quality floor ∧ language ∧
  // minimum length, returning the kept corpus with its curation columns.
  // Every stage is an already-oracled operator (d1/t1/t2/t3) composed in
  // one plan: the dedup verdict is the only shuffle (16-byte fingerprint
  // groupBy), everything else stays scan-side.
  register(
    "p0_training_corpus",
    """WITH fp AS (
      |  SELECT doc_id,
      |         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
      |  FROM documents),
      |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
      |feat AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
      |      AS n_tokens,
      |    round(greatest(0.0,
      |      least(length(text) / 500.0, 1.0) * 0.4 +
      |      least((len(list_filter(string_split_regex(lower(text), '\s+'),
      |              x -> x IN ('the','a','of','and','to','in'))) ::DOUBLE /
      |             greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
      |              x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |      (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |                   greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6)
      |      AS quality,
      |    (SELECT CASE
      |       WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
      |       WHEN s_es >= s_de THEN 'es' ELSE 'de' END
      |     FROM (SELECT
      |       len(list_intersect(t, ['the','a','and','scan','join'])) AS s_en,
      |       len(list_intersect(t, ['el','la','que','datos'])) AS s_es,
      |       len(list_intersect(t, ['der','die','und','das'])) AS s_de
      |       FROM (SELECT list_distinct(list_filter(
      |         string_split_regex(lower(text), '\s+'), x -> x != '')) AS t)))
      |      AS langid
      |  FROM documents)
      |SELECT f.doc_id, f.n_tokens, f.quality
      |FROM feat f JOIN keep k ON f.doc_id = k.doc_id
      |WHERE f.quality >= 0.3 AND f.langid = 'en' AND f.n_tokens >= 5
      |ORDER BY f.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val kept = Dedup.dropExactDuplicates(docs, "text", "doc_id")
    kept.select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.qualityScore(col("text"),
        Seq("the", "a", "of", "and", "to", "in")).as("quality"),
      TextAnalysis.langId(col("text"), Seq(
        "en" -> Seq("the", "a", "and", "scan", "join"),
        "es" -> Seq("el", "la", "que", "datos"),
        "de" -> Seq("der", "die", "und", "das"))).as("langid"))
      .where(col("quality") >= 0.3 && col("langid") === "en" &&
        col("n_tokens") >= 5)
      .drop("langid")
      .orderBy("doc_id")
  }


  // Round-10 warehouse loop composite: three batches COMMIT to the
  // snapshot store, the materialized view refreshes incrementally after
  // each (manifest delta + moment merge), and the drift monitor compares
  // the first and last ingest batches' histograms — the steady-state
  // closed loop a 100 TB store runs daily, pinned as ONE hash-matched
  // program (the p0/p1 composite tradition for the storage family).
  // Random thirds drift ~0, so the monitor correctly stays silent.
  register(
    "p3_warehouse_loop",
    """WITH m AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS s,
      |         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) *
      |                  CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS ss
      |  FROM lineitem GROUP BY l_returnflag),
      |a AS (
      |  SELECT l_returnflag,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) // 500 AS bin,
      |         count(*) AS n
      |  FROM lineitem WHERE l_orderkey % 3 = 0 GROUP BY 1, 2),
      |b AS (
      |  SELECT l_returnflag,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) // 500 AS bin,
      |         count(*) AS n
      |  FROM lineitem WHERE l_orderkey % 3 = 2 GROUP BY 1, 2),
      |ta AS (SELECT l_returnflag, CAST(sum(n) AS DOUBLE) AS t FROM a GROUP BY 1),
      |tb AS (SELECT l_returnflag, CAST(sum(n) AS DOUBLE) AS t FROM b GROUP BY 1),
      |j AS (
      |  SELECT coalesce(a.l_returnflag, b.l_returnflag) AS l_returnflag,
      |         coalesce(a.bin, b.bin) AS bin,
      |         coalesce(a.n, 0) AS na, coalesce(b.n, 0) AS nb
      |  FROM a FULL OUTER JOIN b
      |    ON a.l_returnflag = b.l_returnflag AND a.bin = b.bin),
      |c AS (
      |  SELECT j.l_returnflag, j.bin,
      |         (greatest(CAST(na AS DOUBLE) / ta.t, 0.000001) -
      |          greatest(CAST(nb AS DOUBLE) / tb.t, 0.000001)) *
      |         ln(greatest(CAST(na AS DOUBLE) / ta.t, 0.000001) /
      |            greatest(CAST(nb AS DOUBLE) / tb.t, 0.000001)) AS c
      |  FROM j JOIN ta USING (l_returnflag) JOIN tb USING (l_returnflag)),
      |psi AS (
      |  SELECT l_returnflag,
      |         round(list_sum(list(c ORDER BY bin)), 6) AS psi
      |  FROM c GROUP BY l_returnflag)
      |SELECT m.l_returnflag, m.n,
      |       round((CAST(m.s AS DOUBLE) / 100.0) / m.n, 6) AS mean,
      |       round((CAST(m.ss AS DOUBLE) / 10000.0 -
      |              (CAST(m.s AS DOUBLE) / 100.0) *
      |              (CAST(m.s AS DOUBLE) / 100.0) / m.n) / m.n, 6) AS var_pop,
      |       psi.psi, psi.psi > 0.1 AS drifted
      |FROM m JOIN psi USING (l_returnflag)
      |ORDER BY m.l_returnflag""".stripMargin) { (s, dir) =>
    import graft.history.{Materialized, Snapshots}
    val root = scratchDir("graft_p3base")
    val viewRoot = scratchDir("graft_p3view")
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_returnflag"),
      floor(col("l_quantity") * 100 + 0.5).cast("long").as("qc"))
    val partial = (df: DataFrame) =>
      Sketches.momentSketches(df, Seq("l_returnflag"), col("qc"))
    val merge = (df: DataFrame) => Sketches.momentMerge(df, Seq("l_returnflag"))
    var view: DataFrame = null
    for (b <- 0 to 2) {
      Snapshots.commit(li.where(pmod(col("l_orderkey"), lit(3)) === b), root)
      view = Materialized.refresh(s, root, viewRoot, partial, merge)
    }
    // drift monitor over the FIRST vs LAST committed batches, read back
    // from their snapshot versions (time travel is the monitor's input).
    // r20: the version diff comes from the manifests (readVersionDelta —
    // provably the same rows as read(v).exceptAll(read(v−1)) for these
    // append-only commits), so the monitor scans ONE batch directory
    // instead of two full snapshots plus an all-column exceptAll shuffle
    def hist(v: Long) = Sketches.histSketches(
      Snapshots.readVersionDelta(s, root, v),
      Seq("l_returnflag"), col("qc"), binWidthCents = 500L)
    val drift = Sketches.psiDrift(hist(1L), hist(3L), Seq("l_returnflag"))
    Sketches.momentStats(view)
      .join(drift, "l_returnflag")
      .select(col("l_returnflag"), col("n"), col("mean"), col("var_pop"),
        col("psi"), col("drifted"))
      .orderBy("l_returnflag")
  }


  // Blocked fuzzy entity resolution: a corrupted twin of every customer
  // (the '#' separator swapped for '=') must link back to exactly its
  // source — levenshtein 1 to the source, >= 2 to every other name —
  // searched only inside (name-digit-prefix, nation) blocks so the
  // quadratic edit distance never sees the table, just the block.
  register(
    "p4_entity_resolution",
    """WITH dirty AS (
      |  SELECT c_custkey + 1000000 AS d_id,
      |         replace(c_name, '#', '=') AS d_name,
      |         c_nationkey AS d_nat
      |  FROM customer),
      |m AS (
      |  SELECT d.d_id, c.c_custkey,
      |         CAST(levenshtein(d.d_name, c.c_name) AS BIGINT) AS dist
      |  FROM dirty d JOIN customer c
      |    ON substr(d.d_name, 10, 6) = substr(c.c_name, 10, 6)
      |   AND d.d_nat = c.c_nationkey
      |  WHERE levenshtein(d.d_name, c.c_name) <= 1),
      |r AS (SELECT d_id, c_custkey, dist,
      |             row_number() OVER (PARTITION BY d_id
      |                                ORDER BY dist, c_custkey) AS rn
      |      FROM m)
      |SELECT d_id, c_custkey AS matched_id, dist
      |FROM r WHERE rn = 1 ORDER BY d_id""".stripMargin) { (s, dir) =>
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val dirty = cust.select(
      (col("c_custkey") + 1000000).as("d_id"),
      regexp_replace(col("c_name"), "#", "=").as("d_name"),
      col("c_nationkey").as("d_nat"))
    Dedup.entityMatch(dirty, cust, "d_id", "c_custkey", "d_name", "c_name",
        blockKeys = Seq(
          substring(col("d_name"), 10, 6) -> substring(col("c_name"), 10, 6),
          col("d_nat") -> col("c_nationkey")),
        maxDist = 1)
      .orderBy("d_id")
  }


  // Composite program (the p0/p1 tradition): margin-mine parallel pairs,
  // then gate each mined pair's TARGET through semantic benchmark
  // decontamination — the bitext-curation loop a multilingual pipeline
  // runs end to end (mine -> decontaminate -> ship), pinned as ONE
  // hash-matched program. Mining algebra = ann_margin_mine's; the gate =
  // d17's max-bench-cos; on this corpus the keeps are honestly all true
  // (near-orthogonal bench), with d17 carrying the planted drop proof.
  register(
    "p5_mined_pair_curation",
    """WITH x AS (SELECT vec_id AS x_id, embedding AS xv FROM embeddings
      |           WHERE vec_id % 2 = 0 AND vec_id < 200),
      |y AS (SELECT vec_id AS y_id, embedding AS yv FROM embeddings
      |      WHERE vec_id % 2 = 1),
      |sx AS (SELECT x_id, y_id,
      |              round(list_cosine_similarity(yv::DOUBLE[], xv::DOUBLE[]), 6) AS cos
      |       FROM x CROSS JOIN y),
      |xk AS (SELECT x_id, y_id, cos FROM (
      |         SELECT *, row_number() OVER (PARTITION BY x_id
      |                    ORDER BY cos DESC, y_id ASC) AS rn FROM sx)
      |       WHERE rn <= 4),
      |yk AS (SELECT x_id, y_id, cos FROM (
      |         SELECT *, row_number() OVER (PARTITION BY y_id
      |                    ORDER BY cos DESC, x_id ASC) AS rn FROM sx)
      |       WHERE rn <= 4),
      |xa AS (SELECT x_id, sum(CAST(floor(cos * 1000000 + 0.5) AS BIGINT)) AS sxs,
      |              count(*) AS cx FROM xk GROUP BY x_id),
      |ya AS (SELECT y_id, sum(CAST(floor(cos * 1000000 + 0.5) AS BIGINT)) AS sys,
      |              count(*) AS cy FROM yk GROUP BY y_id),
      |m AS (SELECT xk.x_id, xk.y_id, xk.cos,
      |             CASE WHEN (CAST(sxs AS DOUBLE) / cx + CAST(sys AS DOUBLE) / cy) / 2 > 0
      |               THEN round(CAST(floor(xk.cos * 1000000 + 0.5) AS BIGINT) /
      |                 ((CAST(sxs AS DOUBLE) / cx + CAST(sys AS DOUBLE) / cy) / 2), 6)
      |             END AS margin
      |      FROM xk JOIN xa USING (x_id) JOIN ya USING (y_id)),
      |mined AS (SELECT x_id, y_id, cos, margin FROM (
      |            SELECT *, row_number() OVER (PARTITION BY x_id
      |                       ORDER BY margin DESC NULLS LAST, y_id ASC) AS rn
      |            FROM m)
      |          WHERE rn = 1 AND margin IS NOT NULL AND margin >= 1.0),
      |deco AS (SELECT y.y_id,
      |                max(round(list_cosine_similarity(y.yv::DOUBLE[],
      |                                                 be.bv::DOUBLE[]), 6))
      |                  AS bench_cos
      |         FROM y CROSS JOIN (SELECT embedding AS bv FROM embeddings
      |                            WHERE vec_id < 5) be
      |         GROUP BY y.y_id)
      |SELECT mined.x_id, mined.y_id, mined.margin, deco.bench_cos,
      |       deco.bench_cos < 0.95 AS keep
      |FROM mined JOIN deco USING (y_id)
      |ORDER BY x_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val xs = e.where(col("vec_id") % 2 === 0 && col("vec_id") < 200)
      .select(col("vec_id").as("x_id"), col("embedding").as("x_vec"))
    val ys = e.where(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("y_id"), col("embedding").as("y_vec"))
    val bench = e.where(col("vec_id") < 5).select(col("embedding"))
    val mined = Similarity.marginMine(xs, ys, k = 4, threshold = 1.0)
    val deco = Dedup.semanticDecontaminate(ys, bench, "y_id", "y_vec",
      "embedding", threshold = 0.95)
    mined.join(deco, "y_id")
      .select(col("x_id"), col("y_id"), col("margin"),
        col("max_bench_cos").as("bench_cos"), col("keep"))
      .orderBy("x_id")
  }


  // Split-leakage audit — the eval-hygiene composite: near-duplicate
  // pairs whose members land in DIFFERENT train/val/test splits are
  // contamination that benchmark decontamination (t8/t8b/t33) cannot
  // see, because both sides live inside the corpus. Composes the real
  // minhash near-dup pipeline with the md5-interval split rule on the
  // planted corpus (byte-identical copies under id+1e6 — the d2c
  // construction), where the leaked set is SQL-exact: the planted pairs
  // whose two ids hash into different splits (4 at sf0.01, 22 at sf0.1).
  register(
    "p2_split_leakage",
    """WITH p AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
      |           FROM documents WHERE doc_id % 97 = 0),
      |s AS (SELECT id,
      |        CASE WHEN substr(md5(CAST(id AS VARCHAR)), 1, 8) < 'cccccccc'
      |               THEN 'train'
      |             WHEN substr(md5(CAST(id AS VARCHAR)), 1, 8) < 'e6666666'
      |               THEN 'val'
      |             ELSE 'test' END AS split
      |      FROM (SELECT id_a AS id FROM p UNION SELECT id_b FROM p))
      |SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
      |FROM p JOIN s sa ON sa.id = p.id_a JOIN s sb ON sb.id = p.id_b
      |WHERE sa.split != sb.split ORDER BY p.id_a""".stripMargin) { (s, dir) =>
    val corpus = docPlantedCorpus(t(s, dir, "documents"))
    val pairs = Dedup.minhashNearDups(corpus, "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
    val splits = TextAnalysis.splitAssign(corpus.select("doc_id"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("split"))
    pairs
      .join(splits.select(col("doc_id").as("id_a"), col("split").as("split_a")),
        "id_a")
      .join(splits.select(col("doc_id").as("id_b"), col("split").as("split_b")),
        "id_b")
      .where(col("split_a") =!= col("split_b"))
      .select("id_a", "id_b", "split_a", "split_b")
      .orderBy("id_a")
  }


  // Dataset card: the one-row release summary (sizes, vocab, mean
  // quality, exact-dup rate, blocklist exposure) — a composite of
  // individually-proven pieces (t2 quality, d1 hash-dedup, t75
  // blocklist) in ONE pre-combined per-doc aggregate + a vocab pass.
  register(
    "p9_dataset_card",
    """WITH d AS (
      |  SELECT text, lower(text) AS lt,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(len(toks)) AS BIGINT) AS ntok,
      |         CAST(sum(length(text)) AS BIGINT) AS nch,
      |         CAST(sum(CAST(floor(round(greatest(0.0,
      |           least(length(text) / 500.0, 1.0) * 0.4 +
      |           least((len(list_filter(toks, x -> x IN ('the','a','of',
      |             'and','to','in')))::DOUBLE /
      |             greatest(len(toks), 1)) * 3.0, 1.0) * 0.4 +
      |           (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |             greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6)
      |           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS q,
      |         CAST(count(DISTINCT md5(text)) AS BIGINT) AS dh,
      |         CAST(sum(CASE WHEN len(list_filter(['dup', 'join order',
      |             'slo', 'slow', 'zzzz'], p -> contains(lt, p))) > 0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS bln
      |  FROM d),
      |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab
      |      FROM (SELECT unnest(toks) AS tok FROM d))
      |SELECT n AS n_docs, ntok AS n_tokens, nch AS n_chars, vocab,
      |       floor(CAST(q AS DOUBLE) / n + 0.5) / 1000000.0 AS mean_quality,
      |       floor(CAST(n - dh AS DOUBLE) * 1000000.0 / n + 0.5)
      |         / 1000000.0 AS dup_rate,
      |       floor(CAST(bln AS DOUBLE) * 1000000.0 / n + 0.5)
      |         / 1000000.0 AS blocked_frac
      |FROM a, v""".stripMargin) { (s, dir) =>
    TextAnalysis.datasetCard(t(s, dir, "documents"), "text",
      stopwords = Seq("the", "a", "of", "and", "to", "in"),
      blocklist = Seq("dup", "join order", "slo", "slow", "zzzz"))
  }


  // Paired A/B system comparison with a significance envelope — the
  // eval report that decides "ship system A or B": per document, both
  // systems' candidates score ROUGE-L recall against the same
  // reference (A = prefix-30, B = kept-subsequence+noise — both with
  // ANALYTIC LCS), then win/tie/loss counts plus a grouped-jackknife
  // CI on the mean per-pair delta. A CI excluding 0 = a significant
  // winner, computed deterministically end to end — hash oracle on the
  // single report row.
  register(
    "p8_ab_eval",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |b AS (SELECT pair_id, list_slice(toks, 1, 40) AS rt FROM w),
      |k AS (SELECT pair_id, rt,
      |             list_filter(rt, (x, i) -> i % 3 != 0) AS kept FROM b),
      |m AS (
      |  SELECT pair_id, CAST(len(rt) AS BIGINT) AS rl,
      |         CAST(least(len(rt), 30) AS BIGINT) AS lcs_a,
      |         CAST(len(kept) AS BIGINT) AS lcs_b
      |  FROM k WHERE len(rt) > 0),
      |d AS (
      |  SELECT pair_id,
      |    CAST(floor(CAST(lcs_a AS DOUBLE) * 1000000.0 / rl + 0.5)
      |      AS BIGINT) AS am,
      |    CAST(floor(CAST(lcs_b AS DOUBLE) * 1000000.0 / rl + 0.5)
      |      AS BIGINT) AS bm
      |  FROM m),
      |wl AS (
      |  SELECT CAST(sum(CASE WHEN am / 1000000.0 > bm / 1000000.0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS a_wins,
      |         CAST(sum(CASE WHEN am / 1000000.0 = bm / 1000000.0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS ties,
      |         CAST(sum(CASE WHEN am / 1000000.0 < bm / 1000000.0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS b_wins
      |  FROM d),
      |q AS (
      |  SELECT pair_id % 20 AS bk,
      |    CAST(floor((am / 1000000.0 - bm / 1000000.0) * 1000000.0 + 0.5)
      |      AS BIGINT) AS v
      |  FROM d),
      |pb AS (SELECT bk, CAST(count(*) AS BIGINT) AS bn,
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
      |SELECT f.n, f.nb AS n_buckets, wl.a_wins, wl.ties, wl.b_wins,
      |       f.meanm / 1000000.0 AS mean, f.sem / 1000000.0 AS se,
      |       (f.meanm - CAST(floor(CAST(f.sem AS DOUBLE) * 1.96 + 0.5)
      |         AS BIGINT)) / 1000000.0 AS lo,
      |       (f.meanm + CAST(floor(CAST(f.sem AS DOUBLE) * 1.96 + 0.5)
      |         AS BIGINT)) / 1000000.0 AS hi
      |FROM fin f, wl""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val kdf = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), slice(toksCol, 1, 40).as("rt"))
      .select(col("pair_id"), col("rt"),
        filter(col("rt"), (_, i) => (i + 1) % 3 =!= 0).as("kept"))
      .where(size(col("rt")) > 0)
    val noise = md5(col("pair_id").cast("string"))
    val candB = concat(array(noise), slice(col("kept"), 1, 10), array(noise),
      slice(col("kept"), lit(11), greatest(size(col("kept")) - 10, lit(0))))
    val pa = kdf.select(col("pair_id"),
      array_join(slice(col("rt"), 1, 30), " ").as("cand"),
      array_join(col("rt"), " ").as("ref"))
    val pb = kdf.select(col("pair_id"), array_join(candB, " ").as("cand"),
      array_join(col("rt"), " ").as("ref"))
    val ra = Eval.rougeL(pa, "pair_id", "cand", "ref")
      .select(col("pair_id"), col("rouge_r").as("a_r"))
    val rb = Eval.rougeL(pb, "pair_id", "cand", "ref")
      .select(col("pair_id"), col("rouge_r").as("b_r"))
    val joined = ra.join(rb, "pair_id").localCheckpoint()
    val wl = joined.agg(
      sum(when(col("a_r") > col("b_r"), 1L).otherwise(0L)).as("a_wins"),
      sum(when(col("a_r") === col("b_r"), 1L).otherwise(0L)).as("ties"),
      sum(when(col("a_r") < col("b_r"), 1L).otherwise(0L)).as("b_wins"))
    val jk = Eval.jackknifeCI(
      joined.select((col("pair_id") % 20).as("bucket"),
        (col("a_r") - col("b_r")).as("delta")),
      "delta", "bucket")
    jk.crossJoin(broadcast(wl))
      .select(col("n"), col("n_buckets"), col("a_wins"), col("ties"),
        col("b_wins"), col("mean"), col("se"), col("lo"), col("hi"))
  }


  // WARC web-corpus ingestion round trip (the a6 round-trip oracle
  // pattern): documents serialize into 50-record WARC blobs with real
  // Content-Length byte framing — every 17th body EMBEDS the
  // "WARC/1.0" magic verbatim, which shreds any delimiter-split parser
  // — then warc_split parses the blobs back scan-side. The oracle never
  // parses: it asserts the parse reproduces the source records exactly.
  register(
    "p7_warc_ingest",
    """SELECT 'd' || CAST(doc_id AS VARCHAR) AS rec_id,
      |       'conversion' AS rec_type,
      |       CAST(strlen(body) AS BIGINT) AS content_length, body
      |FROM (SELECT doc_id,
      |        CASE WHEN doc_id % 17 = 0 THEN text || ' WARC/1.0 embedded'
      |             ELSE text END AS body
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val body = when(col("doc_id") % 17 === 0,
      concat(col("text"), lit(" WARC/1.0 embedded"))).otherwise(col("text"))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: d"),
      col("doc_id").cast("string"),
      lit("\r\nContent-Length: "), octet_length(body).cast("string"),
      lit("\r\n\r\n"), body, lit("\r\n\r\n"))
    val blobs = t(s, dir, "documents")
      .select((col("doc_id") / 50).cast("long").as("blob_id"),
        struct(col("doc_id").as("i"), rec.as("r")).as("e"))
      .groupBy("blob_id")
      .agg(array_join(transform(sort_array(collect_list(col("e"))),
        e => e.getField("r")), "").as("blob"))
    blobs
      .select(explode(graft.functions.WarcSplit.column(
        col("blob").cast("binary"))).as("rec"))
      .select(col("rec.rec_id"), col("rec.rec_type"),
        col("rec.content_length"), col("rec.body"))
      .orderBy(substring(col("rec_id"), 2, 18).cast("long"))
  }


  // Model-output QA gate (the p1/p5-style composite a generation-data
  // curator ships): every candidate clears non-empty ∧ non-verbatim ∧
  // ROUGE-L recall ≥ 0.6 against its reference before it enters a
  // training set. Branches: empty (%19), verbatim copy (%13, the
  // plagiarism reject), kept-subsequence+noise (%5, ships), prefix
  // (default, ships) — every branch has an ANALYTIC LCS (prefixes and
  // subsequences of the reference), so the whole verdict row
  // hash-matches end to end.
  register(
    "p6_output_qa",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |b AS (SELECT pair_id, list_slice(toks, 1, 40) AS rt FROM w),
      |k AS (SELECT pair_id, rt,
      |             list_filter(rt, (x, i) -> i % 3 != 0) AS kept FROM b),
      |a AS (
      |  SELECT pair_id, CAST(len(rt) AS BIGINT) AS ref_toks,
      |         CASE WHEN pair_id % 19 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 13 = 0 THEN CAST(len(rt) AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN CAST(len(kept) + 2 AS BIGINT)
      |              ELSE CAST(least(len(rt), 30) AS BIGINT) END AS cand_toks,
      |         CASE WHEN pair_id % 19 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 13 = 0 THEN CAST(len(rt) AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN CAST(len(kept) AS BIGINT)
      |              ELSE CAST(least(len(rt), 30) AS BIGINT) END AS lcs,
      |         pair_id % 19 = 0 AS empty_side,
      |         (pair_id % 19 != 0 AND (pair_id % 13 = 0 OR
      |          (pair_id % 5 != 0 AND len(rt) <= 30))) AS identical
      |  FROM k),
      |m AS (
      |  SELECT pair_id, cand_toks, ref_toks, lcs, empty_side, identical,
      |         CASE WHEN ref_toks > 0 THEN CAST(floor(CAST(lcs AS DOUBLE)
      |           * 1000000.0 / ref_toks + 0.5) AS BIGINT) END AS rm
      |  FROM a)
      |SELECT pair_id, cand_toks, ref_toks, lcs,
      |       rm / 1000000.0 AS rouge_r, identical, empty_side,
      |       (NOT identical AND NOT empty_side
      |        AND coalesce(rm, 0) >= 600000) AS ship
      |FROM m ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val kdf = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), slice(toksCol, 1, 40).as("rt"))
      .select(col("pair_id"), col("rt"),
        filter(col("rt"), (_, i) => (i + 1) % 3 =!= 0).as("kept"))
    val noise = md5(col("pair_id").cast("string"))
    val candArr = when(col("pair_id") % 19 === 0,
        array().cast("array<string>"))
      .when(col("pair_id") % 13 === 0, col("rt"))
      .when(col("pair_id") % 5 === 0, concat(array(noise),
        slice(col("kept"), 1, 10), array(noise),
        slice(col("kept"), lit(11), greatest(size(col("kept")) - 10, lit(0)))))
      .otherwise(slice(col("rt"), 1, 30))
    val pairs = kdf.select(col("pair_id"),
      array_join(candArr, " ").as("cand"), array_join(col("rt"), " ").as("ref"))
    val flags = pairs.select(col("pair_id"),
      (trim(col("cand")) === "").as("empty_side"),
      (trim(col("cand")) =!= "" && col("cand") === col("ref")).as("identical"))
    Eval.rougeL(pairs, "pair_id", "cand", "ref")
      .join(flags, "pair_id")
      .select(col("pair_id"), col("cand_len").as("cand_toks"),
        col("ref_len").as("ref_toks"), col("lcs"), col("rouge_r"),
        col("identical"), col("empty_side"),
        (!col("identical") && !col("empty_side") &&
          coalesce(col("rouge_r"), lit(0.0)) >= 0.6).as("ship"))
      .orderBy("pair_id")
  }


  // Composite curation v2 — the round-9 operators chained end-to-end the
  // way a real corpus build runs them: exact dedup (md5 keep-min) →
  // EXACT PPJoin near-dup drop at τ=0.8 (drop the higher id of every
  // pair among exact survivors) → Bloom-pruned 5-gram decontamination
  // (drop any doc colliding with the benchmark snippets) → stratified
  // A-ES sample (15 per language by n_chars). Every stage is
  // individually hash-proven (d1/d14/t33/t32b); this row pins the
  // COMPOSITION, stage ordering included, against one DuckDB program.
  register(
    "p1_curation_v2",
    """WITH fp AS (
      |  SELECT doc_id, lang, n_chars, text,
      |         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
      |  FROM documents),
      |s1 AS (  -- exact dedup survivors (keep min id per fingerprint)
      |  SELECT * FROM fp WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
      |toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM s1),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks),
      |neardup_b AS (  -- higher id of every >=0.8 pair among s1
      |  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.s, b.s))::DOUBLE /
      |        len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
      |s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM neardup_b)),
      |grams AS (
      |  SELECT s2.doc_id, unnest(list_distinct(
      |    CASE WHEN len(t.t) >= 5
      |      THEN list_transform(generate_series(1, len(t.t) - 4),
      |             i -> t.t[i] || ' ' || t.t[i+1] || ' ' || t.t[i+2] ||
      |                  ' ' || t.t[i+3] || ' ' || t.t[i+4])
      |      ELSE [] END)) AS gram
      |  FROM s2 JOIN toks t ON t.doc_id = s2.doc_id),
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
      |                           x -> x != '') AS words FROM snips)),
      |contaminated AS (SELECT DISTINCT g.doc_id FROM grams g JOIN sgrams USING (gram)),
      |s3 AS (SELECT * FROM s2
      |       WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
      |         AND n_chars > 0)
      |SELECT doc_id, lang, n_chars FROM (
      |  SELECT doc_id, lang, n_chars, row_number() OVER (PARTITION BY lang ORDER BY
      |    -ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'cur1'),
      |                                  1, 13)) AS BIGINT) + 0.5)
      |        / 4503599627370496.0) / n_chars) AS rn
      |  FROM s3)
      |WHERE rn <= 15 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val s1 = Dedup.dropExactDuplicates(docs, "text", "doc_id")
      .localCheckpoint() // three downstream stages read the survivor set
    val dropB = Dedup.similarityJoin(s1, "text", "doc_id",
      shingleWords = 2, threshold = 0.8).select(col("id_b").as("doc_id"))
    val s2 = s1.join(dropB, Seq("doc_id"), "left_anti")
    val snips = docs.where(col("doc_id") % 41 === 0 && length(col("text")) >= 100)
      .select(substring(col("text"), 1, 100).as("snip")).distinct()
    val contaminated = TextAnalysis.ngramContaminationBloom(
      s2, "text", "doc_id", snips, "snip", n = 5).select("doc_id")
    val s3 = s2.join(contaminated, Seq("doc_id"), "left_anti")
    TextAnalysis.weightedSamplePerGroup(s3, "doc_id", "lang",
        col("n_chars"), k = 15, seed = "cur1")
      .select("doc_id", "lang", "n_chars").orderBy("doc_id")
  }


  // Cluster-aware split assignment — the FIX for the leakage p2 detects:
  // hash the dedup CLUSTER id (d6's fingerprint clusters), not the doc
  // id, so near-identical docs can never straddle train/test. The
  // cross-split duplicate-pair count is computed for real in both
  // engines and must be exactly 0 (fingerprint-equal => same cluster =>
  // same md5 bucket) — the invariant rides the hash.
  register(
    "p10_cluster_split",
    """WITH fp AS (
      |  SELECT doc_id,
      |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 80) AS f
      |  FROM documents),
      |cl AS (SELECT f, CAST(min(doc_id) AS BIGINT) AS cluster_id
      |       FROM fp GROUP BY f),
      |d AS (
      |  SELECT fp.doc_id, fp.f, cl.cluster_id,
      |    CASE WHEN substr(md5(CAST(cl.cluster_id AS VARCHAR)), 1, 8)
      |              < 'cccccccc' THEN 'train'
      |         WHEN substr(md5(CAST(cl.cluster_id AS VARCHAR)), 1, 8)
      |              < 'e6666666' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM fp JOIN cl ON fp.f = cl.f),
      |x AS (SELECT CAST(count(*) AS BIGINT) AS cross_split_dup_pairs
      |      FROM d a JOIN d b ON a.f = b.f AND a.doc_id < b.doc_id
      |        AND a.split != b.split)
      |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
      |       x.cross_split_dup_pairs
      |FROM d, x GROUP BY split, x.cross_split_dup_pairs
      |ORDER BY split""".stripMargin) { (s, dir) =>
    val fp = t(s, dir, "documents").select(col("doc_id"),
      substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 80)
        .as("f"))
    val cl = fp.groupBy("f").agg(min(col("doc_id")).as("cluster_id"))
    val d = TextAnalysis.splitAssign(fp.join(cl, "f"), "cluster_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).localCheckpoint()
    val cross = broadcast(d.as("a").join(d.as("b"),
        col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id") &&
          col("a.split") =!= col("b.split"))
      .agg(count(lit(1)).as("cross_split_dup_pairs")))
    d.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .crossJoin(cross)
      .orderBy("split")
  }


  // The full WEB-CORPUS program pinned as ONE hash-matched composite —
  // WARC bytes to shippable split corpus, every stage an individually
  // oracled operator (p7/d19/t75/t88/d1/d22/t17/t33/p10), this row pins
  // their COMPOSITION: WARC framing round trip → URL canonicalize +
  // domain blocklist + url dedup (keep min fetch per canonical URL) →
  // robots.txt allow/deny gate (t90 algebra, per-host policies) →
  // jusText content extraction (chrome-only pages drop) → exact content
  // dedup → corpus-wide exact-substring cut (Lee et al. 2022, over the
  // SURVIVOR set) → Gopher quality gates (minWords scaled to the cut
  // corpus) → 5-gram benchmark decontamination → cluster-safe
  // train/val/test split with the cross-split duplicate-pair invariant
  // computed FOR REAL in both engines (must be 0). The funnel's planted
  // shapes: 500 fetches collapse to 150 canonical pages on 7 hosts (2
  // hosts blocklisted), page shapes exercise every jusText class, the
  // shared good/near paragraphs become corpus-wide repeated substrings
  // that the cut removes everywhere.
  /** The p12 WITH chain (WARC bodies through the split d2 + invariant x),
    * shared verbatim by `p12_web_pipeline` and `p12b_web_funnel`. */
  private lazy val webPipelineChainSql: String =
    """b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 17 = 0 THEN text || ' WARC/1.0 embedded'
      |         ELSE text END AS body
      |  FROM documents),
      |raw AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN 'https://www.site' || ((doc_id % 150) % 7) || '.com/p/' || (doc_id % 150) || '/'
      |      WHEN 1 THEN 'HTTPS://Site' || ((doc_id % 150) % 7) || '.com:443/p/' || (doc_id % 150)
      |      WHEN 2 THEN 'https://site' || ((doc_id % 150) % 7) || '.com/p/' || (doc_id % 150) || '?utm_k=9'
      |      ELSE 'https://site' || ((doc_id % 150) % 7) || '.com/p/' || (doc_id % 150) || '#sec' END AS url
      |  FROM b),
      |""".stripMargin + urlCanonSql + """,
      |k AS (SELECT b.doc_id, b.body, c.canon,
      |             min(b.doc_id) OVER (PARTITION BY c.canon) AS mke
      |      FROM b JOIN c USING (doc_id)),
      |u AS (SELECT doc_id, body, canon FROM k
      |      WHERE doc_id = mke
      |        AND NOT contains(lower(canon), 'site3.com')
      |        AND NOT contains(lower(canon), 'site5.com')),
      |uh AS (SELECT DISTINCT regexp_extract(canon, '(site[0-9]+\.com)', 1) AS host
      |       FROM u),
      |rb AS (SELECT host,
      |         'User-agent: *' || chr(10) ||
      |         'Disallow: /p/' || regexp_extract(host, 'site([0-9]+)', 1) || chr(10) ||
      |         'Allow: /p/' || regexp_extract(host, 'site([0-9]+)', 1) || '2' AS body
      |       FROM uh),
      |""".stripMargin + robotsRulesSql + """,
      |up AS (SELECT doc_id, canon,
      |         regexp_extract(canon, '(site[0-9]+\.com)', 1) AS host,
      |         regexp_extract(canon, '\.com(/p/[0-9]+)', 1) AS upath
      |       FROM u),
      |rcand AS (SELECT up.doc_id, r.allow, strlen(r.rpath) AS rl
      |          FROM up LEFT JOIN rules r
      |            ON r.host = up.host AND starts_with(up.upath, r.rpath)),
      |rbest AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |            ORDER BY rl DESC NULLS LAST, allow DESC NULLS LAST) AS rn
      |          FROM rcand),
      |rallow AS (SELECT doc_id FROM rbest WHERE rn = 1 AND coalesce(allow, TRUE)),
      |u2 AS (SELECT u.doc_id, u.body, u.canon FROM u JOIN rallow USING (doc_id)),
      |""".stripMargin +
      justextPagesSql("u2", "body") + ",\n" +
      justextBlocksSql + """,
      |jx AS (SELECT doc_id,
      |         coalesce(string_agg(text, chr(10) ORDER BY block_idx)
      |                    FILTER (WHERE block_class = 'good'), '') AS content
      |       FROM fin GROUP BY doc_id),
      |j AS (SELECT doc_id, content FROM jx WHERE length(content) > 0),
      |ef AS (SELECT doc_id, content,
      |         md5(regexp_replace(lower(content), '[^a-z0-9]', '', 'g')) AS fe
      |       FROM j),
      |e AS (SELECT doc_id, content FROM ef
      |      WHERE doc_id IN (SELECT min(doc_id) FROM ef GROUP BY fe)),
      |""".stripMargin + substringCleanSql("e", "content") + """,
      |clean AS (SELECT t.doc_id, coalesce(a.clean_text, '') AS clean_text
      |          FROM toks t LEFT JOIN agg a USING (doc_id)),
      |gt AS (SELECT doc_id, clean_text,
      |         list_filter(string_split_regex(clean_text, '\s+'), x -> x != '') AS tk,
      |         list_filter(string_split(clean_text, chr(10)), l -> trim(l) != '') AS ls
      |       FROM clean),
      |gm AS (SELECT doc_id, clean_text,
      |         len(tk)::BIGINT AS n_words,
      |         round(CASE WHEN len(tk) > 0
      |           THEN list_sum(list_transform(tk, x -> length(x)))::DOUBLE / len(tk)
      |           ELSE 0.0 END, 6) AS mean_word_len,
      |         round((len(regexp_extract_all(clean_text, '#')) +
      |                len(regexp_extract_all(clean_text, '\.\.\.')))::DOUBLE /
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
      |           list_distinct(list_filter(string_split_regex(lower(clean_text), '\s+'), x -> x != '')),
      |           ['the','be','to','of','and','that','have','with']))::BIGINT AS stop_hits
      |       FROM gt),
      |gk AS (SELECT doc_id, clean_text FROM gm
      |       WHERE n_words BETWEEN 30 AND 100000
      |         AND mean_word_len BETWEEN 3.0 AND 10.0
      |         AND symbol_ratio < 0.1 AND bullet_ratio < 0.9
      |         AND ellipsis_ratio < 0.3 AND alpha_frac >= 0.8
      |         AND stop_hits >= 1),
      |gw AS (SELECT doc_id, list_filter(string_split_regex(lower(clean_text), '\s+'),
      |                                  x -> x != '') AS w FROM gk),
      |grams AS (SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(w) >= 5
      |      THEN list_transform(generate_series(1, len(w) - 4),
      |             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] ||
      |                  ' ' || w[i+3] || ' ' || w[i+4])
      |      ELSE [] END)) AS gram
      |  FROM gw),
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
      |                           x -> x != '') AS words FROM snips)),
      |contaminated AS (SELECT DISTINCT g2.doc_id FROM grams g2 JOIN sgrams USING (gram)),
      |dk AS (SELECT * FROM gk
      |       WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
      |fp2 AS (SELECT doc_id, clean_text,
      |          substr(regexp_replace(lower(clean_text), '[^a-z0-9]', '', 'g'), 1, 80) AS f2
      |        FROM dk),
      |cl2 AS (SELECT f2, CAST(min(doc_id) AS BIGINT) AS cluster_id
      |        FROM fp2 GROUP BY f2),
      |d2 AS (SELECT fp2.doc_id, fp2.clean_text, fp2.f2,
      |         CASE WHEN substr(md5(CAST(cl2.cluster_id AS VARCHAR)), 1, 8)
      |                   < 'cccccccc' THEN 'train'
      |              WHEN substr(md5(CAST(cl2.cluster_id AS VARCHAR)), 1, 8)
      |                   < 'e6666666' THEN 'val'
      |              ELSE 'test' END AS split
      |       FROM fp2 JOIN cl2 USING (f2)),
      |x AS (SELECT CAST(count(*) AS BIGINT) AS cross_split_dup_pairs
      |      FROM d2 a JOIN d2 b ON a.f2 = b.f2 AND a.doc_id < b.doc_id
      |        AND a.split != b.split)""".stripMargin

  register(
    "p12_web_pipeline",
    "WITH " + webPipelineChainSql + """
      |SELECT d2.doc_id, c.canon AS url, d2.split,
      |       CAST(len(list_filter(string_split_regex(d2.clean_text, '\s+'),
      |                            x -> x != '')) AS BIGINT) AS n_tokens,
      |       d2.clean_text, x.cross_split_dup_pairs
      |FROM d2 JOIN c USING (doc_id), x
      |ORDER BY d2.doc_id""".stripMargin) { (s, dir) =>
    val st = webStages(s, dir)
    val cross = broadcast(st.d2.as("a").join(st.d2.as("b"),
        col("a.f2") === col("b.f2") && col("a.doc_id") < col("b.doc_id") &&
          col("a.split") =!= col("b.split"))
      .agg(count(lit(1)).as("cross_split_dup_pairs")))
    st.d2.join(st.u.select(col("doc_id"), col("canon").as("url")), Seq("doc_id"))
      .select(col("doc_id"), col("url"), col("split"),
        TextAnalysis.tokenCount(col("clean_text")).cast("long").as("n_tokens"),
        col("clean_text"))
      .crossJoin(cross)
      .orderBy("doc_id")
  }

  /** Funnel counts of the SAME chain — the p12 stage survivors pinned as
    * their own hash-matched row (per-split counts pin the split hashing
    * too). Shares `webPipelineChainSql` / [[webStages]] with p12, so the
    * two rows cannot silently diverge. */
  register(
    "p12b_web_funnel",
    "WITH " + webPipelineChainSql + """
      |SELECT stage, n_docs FROM (
      |  SELECT '0_fetched' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM b
      |  UNION ALL SELECT '1_url_kept', CAST(count(*) AS BIGINT) FROM u
      |  UNION ALL SELECT '1b_robots_ok', CAST(count(*) AS BIGINT) FROM u2
      |  UNION ALL SELECT '2_content', CAST(count(*) AS BIGINT) FROM j
      |  UNION ALL SELECT '3_exact_unique', CAST(count(*) AS BIGINT) FROM e
      |  UNION ALL SELECT '4_gopher_pass', CAST(count(*) AS BIGINT) FROM gk
      |  UNION ALL SELECT '5_decontaminated', CAST(count(*) AS BIGINT) FROM dk
      |  UNION ALL SELECT '6_split_' || split, CAST(count(*) AS BIGINT)
      |            FROM d2 GROUP BY split)
      |ORDER BY stage""".stripMargin) { (s, dir) =>
    val st = webStages(s, dir)
    def cnt(stage: String, df: DataFrame) =
      df.agg(count(lit(1)).cast("long").as("n_docs"))
        .select(lit(stage).as("stage"), col("n_docs"))
    cnt("0_fetched", st.parsed)
      .unionAll(cnt("1_url_kept", st.u))
      .unionAll(cnt("1b_robots_ok", st.u2))
      .unionAll(cnt("2_content", st.j))
      .unionAll(cnt("3_exact_unique", st.e))
      .unionAll(cnt("4_gopher_pass", st.gk))
      .unionAll(cnt("5_decontaminated", st.dk))
      .unionAll(st.d2
        .groupBy(concat(lit("6_split_"), col("split")).as("stage"))
        .agg(count(lit(1)).cast("long").as("n_docs")))
      .orderBy("stage")
  }

  // Host link graph + PageRank — the domain-authority tier beside t96's
  // Bayesian trust: hrefs extract scan-side from page HTML, resolve to
  // target hosts (relative/mailto links and SELF-links drop — intra-site
  // navigation is not authority), the (src_host, dst_host, weight) edge
  // list pre-combines, and 3 unrolled integer-exact PageRank iterations
  // (the q31 algebra: rank·w div outw mass passing, 15/85 teleport, all
  // in parts-per-1e9) rank the hosts. Residues make every doc link its
  // successor host and a 3x+2 rotation (self for doc%7==6 — dropped),
  // with every 5th doc adding a site0 hub link, so in-weights differ per
  // host and the ranking is non-trivial. Hash oracle over (host,
  // out_hosts, in_hosts, rank_e9).
  register(
    "p13_host_pagerank",
    """WITH pg AS (
      |  SELECT doc_id, 'site' || (doc_id % 7) || '.com' AS src,
      |    '<html><body>'
      |    || '<a href="https://site' || ((doc_id + 1) % 7) || '.com/p/' || doc_id || '">next</a>'
      |    || '<a href="https://site' || ((doc_id * 3 + 2) % 7) || '.com/x">rot</a>'
      |    || CASE WHEN doc_id % 5 = 0
      |            THEN '<a href="https://site0.com/">hub</a>' ELSE '' END
      |    || '<a href="https://site' || (doc_id % 7) || '.com/self">self</a>'
      |    || '<a href="/local">rel</a><a href="mailto:x@y.z">m</a>'
      |    || '</body></html>' AS html
      |  FROM documents),
      |hr AS (SELECT doc_id, src,
      |         unnest(regexp_extract_all(html,
      |           '(?is)<a\s[^>]*href\s*=\s*["'']([^"'']+)["'']', 1)) AS href
      |       FROM pg),
      |e AS (SELECT src, regexp_extract(href, '^https?://([^/]+)', 1) AS dst,
      |        CAST(count(*) AS BIGINT) AS w
      |      FROM hr
      |      WHERE length(regexp_extract(href, '^https?://([^/]+)', 1)) > 0
      |        AND regexp_extract(href, '^https?://([^/]+)', 1) != src
      |      GROUP BY 1, 2),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |ow AS (SELECT src, sum(w) AS outw FROM e GROUP BY src),
      |r0 AS (SELECT node, 1000000000 // (SELECT n FROM nn) AS rank
      |       FROM nodes),
      |r1 AS (SELECT nodes.node,
      |         (15 * (1000000000 // (SELECT n FROM nn))) // 100 +
      |         (85 * coalesce(m.s, 0)) // 100 AS rank
      |       FROM nodes LEFT JOIN (
      |         SELECT e.dst AS node, sum((r0.rank * e.w) // ow.outw) AS s
      |         FROM e JOIN ow ON e.src = ow.src
      |                JOIN r0 ON r0.node = e.src
      |         GROUP BY e.dst) m ON m.node = nodes.node),
      |r2 AS (SELECT nodes.node,
      |         (15 * (1000000000 // (SELECT n FROM nn))) // 100 +
      |         (85 * coalesce(m.s, 0)) // 100 AS rank
      |       FROM nodes LEFT JOIN (
      |         SELECT e.dst AS node, sum((r1.rank * e.w) // ow.outw) AS s
      |         FROM e JOIN ow ON e.src = ow.src
      |                JOIN r1 ON r1.node = e.src
      |         GROUP BY e.dst) m ON m.node = nodes.node),
      |r3 AS (SELECT nodes.node,
      |         (15 * (1000000000 // (SELECT n FROM nn))) // 100 +
      |         (85 * coalesce(m.s, 0)) // 100 AS rank
      |       FROM nodes LEFT JOIN (
      |         SELECT e.dst AS node, sum((r2.rank * e.w) // ow.outw) AS s
      |         FROM e JOIN ow ON e.src = ow.src
      |                JOIN r2 ON r2.node = e.src
      |         GROUP BY e.dst) m ON m.node = nodes.node),
      |od AS (SELECT src AS node, CAST(count(DISTINCT dst) AS BIGINT) AS out_hosts
      |       FROM e GROUP BY 1),
      |id2 AS (SELECT dst AS node, CAST(count(DISTINCT src) AS BIGINT) AS in_hosts
      |        FROM e GROUP BY 1)
      |SELECT r3.node AS host,
      |       coalesce(od.out_hosts, 0) AS out_hosts,
      |       coalesce(id2.in_hosts, 0) AS in_hosts,
      |       CAST(r3.rank AS BIGINT) AS rank_e9
      |FROM r3 LEFT JOIN od USING (node) LEFT JOIN id2 USING (node)
      |ORDER BY host""".stripMargin) { (s, dir) =>
    val pg = t(s, dir, "documents").select(col("doc_id"),
      concat(lit("site"), col("doc_id") % 7, lit(".com")).as("src"),
      concat(
        lit("<html><body><a href=\"https://site"), (col("doc_id") + 1) % 7,
        lit(".com/p/"), col("doc_id"),
        lit("\">next</a><a href=\"https://site"), (col("doc_id") * 3 + 2) % 7,
        lit(".com/x\">rot</a>"),
        when(col("doc_id") % 5 === 0,
          lit("<a href=\"https://site0.com/\">hub</a>")).otherwise(lit("")),
        lit("<a href=\"https://site"), col("doc_id") % 7,
        lit(".com/self\">self</a>" +
          "<a href=\"/local\">rel</a><a href=\"mailto:x@y.z\">m</a>" +
          "</body></html>")).as("html"))
    val dstOf = regexp_extract(col("href"), "^https?://([^/]+)", 1)
    val edges = pg.select(col("src"),
        explode(regexp_extract_all(col("html"),
          lit("(?is)<a\\s[^>]*href\\s*=\\s*[\"']([^\"']+)[\"']"),
          lit(1))).as("href"))
      .select(col("src"), dstOf.as("dst"))
      .where(length(col("dst")) > 0 && col("dst") =!= col("src"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      // ONE scan+extract+pre-combine serves pagerank AND both degree
      // aggs (diamond rule) — and the final plan then never references
      // the page html at all
      .localCheckpoint()
    val ranks = Graphs.pagerank(edges, iters = 3)
    val outd = edges.groupBy(col("src").as("node"))
      .agg(countDistinct(col("dst")).as("out_hosts"))
    val ind = edges.groupBy(col("dst").as("node"))
      .agg(countDistinct(col("src")).as("in_hosts"))
    ranks.join(outd, Seq("node"), "left").join(ind, Seq("node"), "left")
      .select(col("node").as("host"),
        coalesce(col("out_hosts"), lit(0L)).as("out_hosts"),
        coalesce(col("in_hosts"), lit(0L)).as("in_hosts"),
        col("rank").cast(LongType).as("rank_e9"))
      .orderBy("host")
  }

  private case class WebStages(parsed: DataFrame, u: DataFrame,
    u2: DataFrame, j: DataFrame, e: DataFrame, gk: DataFrame, dk: DataFrame,
    d2: DataFrame)

  /** The p12 stage frames (Scala side of [[webPipelineChainSql]]). */
  private def webStages(s: SparkSession, dir: String): WebStages = {
    val docs = t(s, dir, "documents")
    // 0: WARC serialize into 50-record blobs + byte-framed parse back
    val body0 = when(col("doc_id") % 17 === 0,
      concat(col("text"), lit(" WARC/1.0 embedded"))).otherwise(col("text"))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: d"),
      col("doc_id").cast("string"),
      lit("\r\nContent-Length: "), octet_length(body0).cast("string"),
      lit("\r\n\r\n"), body0, lit("\r\n\r\n"))
    val parsed = docs
      .select((col("doc_id") / 50).cast("long").as("blob_id"),
        struct(col("doc_id").as("i"), rec.as("r")).as("e"))
      .groupBy("blob_id")
      .agg(array_join(transform(sort_array(collect_list(col("e"))),
        e => e.getField("r")), "").as("blob"))
      .select(explode(graft.functions.WarcSplit.column(
        col("blob").cast("binary"))).as("rec"))
      .select(substring(col("rec.rec_id"), 2, 18).cast("long").as("doc_id"),
        col("rec.body").as("body"))
      .localCheckpoint() // every stage frame feeds its successor AND the funnel count
    // 1: URL synthesis (fetch noise per d19) + canonicalize + url dedup
    //    keep + domain blocklist — 500 fetches -> 150 pages on 7 hosts
    val page = col("doc_id") % 150
    val host = page % 7
    val withUrl = parsed.withColumn("url",
      when(col("doc_id") % 4 === 0,
        concat(lit("https://www.site"), host, lit(".com/p/"), page, lit("/")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("HTTPS://Site"), host, lit(".com:443/p/"), page))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://site"), host, lit(".com/p/"), page, lit("?utm_k=9")))
        .otherwise(concat(lit("https://site"), host, lit(".com/p/"), page,
          lit("#sec"))))
      .withColumn("canon", TextAnalysis.canonicalizeUrl(col("url")))
    val keepers = withUrl.withColumn("__m", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("canon")))
      .where(col("doc_id") === col("__m")).drop("__m")
    val blocked = TextAnalysis.blocklistFilter(keepers, "canon", "doc_id",
      Seq("site3.com", "site5.com")).where(col("blocked")).select("doc_id")
    val u = keepers.join(blocked, Seq("doc_id"), "left_anti")
      .localCheckpoint() // feeds the robots gate, funnel, AND the url join
    // 1b: robots.txt gate (t90 algebra) — per-host policies synthesized
    //     from the canonical URL, RFC 9309 longest-match verdicts
    val hostOf = regexp_extract(col("canon"), "(site[0-9]+\\.com)", 1)
    val urls = u.select(col("doc_id"), hostOf.as("host"),
      regexp_extract(col("canon"), "\\.com(/p/[0-9]+)", 1).as("upath"))
    val kOf = regexp_extract(col("host"), "site([0-9]+)", 1)
    val robots = urls.select("host").distinct()
      .select(col("host"), concat(lit("User-agent: *\nDisallow: /p/"), kOf,
        lit("\nAllow: /p/"), kOf, lit("2")).as("body"))
    val rallow = WebOps.robotsVerdict(urls, "doc_id", "host", "upath",
        WebOps.robotsRules(robots, "host", "body"), knownSmall = true)
      .where(col("allowed")).select("doc_id")
    val u2 = u.join(rallow, Seq("doc_id")).localCheckpoint()
    // 2: jusText extraction; chrome-only pages (no good block) drop
    val blocks = TextAnalysis.justextBlocks(
      justextPages(u2, col("body")), "html", "doc_id",
      Seq("the", "a", "of", "and", "to", "in"),
      stopwordsLow = 0.04, stopwordsHigh = 0.08)
    val j = TextAnalysis.justextContent(blocks)
      .where(col("content_chars") > 0).select("doc_id", "content")
      .localCheckpoint()
    // 3: exact dedup on the extracted content (d1 algebra)
    val e = Dedup.dropExactDuplicates(j, "content", "doc_id")
      .localCheckpoint()
    // 4: corpus-wide exact-substring cut over the survivor set (d22)
    val clean = Dedup.removeRepeatedSubstrings(e, "content", "doc_id",
        minLen = 8)
      .select("doc_id", "clean_text")
      .localCheckpoint() // feeds the gopher report AND the survivor join
    // 5: Gopher quality gates on the cut text — the per-corpus CONFIG
    //    over the individually-oracled report columns (the synthetic
    //    corpus is domain jargon, so the stop-hit floor scales to >= 1
    //    the way the stopword thresholds scale in t88)
    val gk = clean.join(
      TextAnalysis.gopherRuleReport(clean, "clean_text", "doc_id",
        minWords = 30)
        .where(col("ok_words") && col("ok_word_len") && col("ok_symbols") &&
          col("ok_bullets") && col("ok_ellipsis") && col("ok_alpha") &&
          col("stop_hits") >= 1)
        .select("doc_id"),
      Seq("doc_id")).localCheckpoint() // feeds decontamination AND dk
    // 6: 5-gram benchmark decontamination (t33 algebra)
    val snips = docs.where(col("doc_id") % 41 === 0 && length(col("text")) >= 100)
      .select(substring(col("text"), 1, 100).as("snip")).distinct()
    val dk = gk.join(TextAnalysis.ngramContaminationBloom(
        gk, "clean_text", "doc_id", snips, "snip", n = 5).select("doc_id"),
      Seq("doc_id"), "left_anti")
      .localCheckpoint()
    // 7: cluster-safe split; the cross-split duplicate invariant rides
    //    the hash (p10 rule)
    val fp2 = dk.select(col("doc_id"), col("clean_text"),
      substring(regexp_replace(lower(col("clean_text")), "[^a-z0-9]", ""),
        1, 80).as("f2"))
    val cl2 = fp2.groupBy("f2").agg(min(col("doc_id")).as("cluster_id"))
    val d2 = TextAnalysis.splitAssign(fp2.join(cl2, "f2"), "cluster_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .localCheckpoint() // feeds the output, the invariant, and the funnel
    WebStages(parsed, u, u2, j, e, gk, dk, d2)
  }

  // Dolma-style tag-then-filter curation (Soldaini et al. 2024): ONE
  // tagging pass writes the skinny per-doc attribute table (quality,
  // langid, repetition, token/char counts, exact-dedup canonical
  // verdict), then declarative filter CONFIGS select from it — two
  // configs here (lenient keep-set + strict flag) off the SAME
  // localCheckpoint'd attribute table, pinning the architecture's point:
  // threshold iteration re-reads attributes, never the corpus. Every
  // attribute reuses an individually-oracled tagger (t1/t2/t3/t9/d1);
  // this row pins their composition and the config compiler.
  register(
    "p11_attribute_filter",
    """WITH fp AS (
      |  SELECT doc_id, text,
      |         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
      |  FROM documents),
      |cn AS (SELECT f, min(doc_id) AS keep FROM fp GROUP BY f),
      |w AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                                 x -> x != '') AS words FROM documents),
      |g AS (SELECT doc_id, CASE WHEN len(words) >= 2
      |        THEN list_transform(generate_series(1, len(words) - 1),
      |                            i -> words[i] || ' ' || words[i + 1])
      |        ELSE [] END AS grams FROM w),
      |at AS (
      |  SELECT fp.doc_id,
      |    CAST(len(list_filter(string_split_regex(fp.text, '\s+'), x -> x != '')) AS BIGINT) AS n_tokens,
      |    CAST(length(fp.text) AS BIGINT) AS n_chars,
      |    round(greatest(0.0,
      |      least(length(fp.text) / 500.0, 1.0) * 0.4 +
      |      least((len(list_filter(string_split_regex(lower(fp.text), '\s+'),
      |              x -> x IN ('the','a','of','and','to','in')))::DOUBLE /
      |             greatest(len(list_filter(string_split_regex(lower(fp.text), '\s+'),
      |              x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |      (1.0 - least(len(regexp_extract_all(fp.text, '[^\w\s]'))::DOUBLE /
      |                   greatest(length(fp.text), 1) * 5.0, 1.0)) * 0.2), 6) AS quality,
      |    (SELECT CASE
      |       WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
      |       WHEN s_es >= s_de THEN 'es' ELSE 'de' END
      |     FROM (SELECT
      |       len(list_intersect(t, ['the','a','and','scan','join'])) AS s_en,
      |       len(list_intersect(t, ['el','la','que','datos'])) AS s_es,
      |       len(list_intersect(t, ['der','die','und','das'])) AS s_de
      |       FROM (SELECT list_distinct(list_filter(
      |         string_split_regex(lower(fp.text), '\s+'), x -> x != '')) AS t))) AS langid,
      |    CASE WHEN len(g.grams) > 0
      |      THEN round(1.0 - len(list_distinct(g.grams))::DOUBLE / len(g.grams), 6)
      |      ELSE 0.0 END AS rep_frac,
      |    (fp.doc_id = cn.keep) AS is_canonical
      |  FROM fp JOIN cn USING (f) JOIN g ON g.doc_id = fp.doc_id)
      |SELECT doc_id, n_tokens, n_chars, quality, langid, rep_frac,
      |       (quality >= 0.35 AND langid = 'en' AND rep_frac <= 0.2) AS kept_strict
      |FROM at
      |WHERE quality >= 0.25 AND n_tokens >= 5 AND is_canonical
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import graft.pipeline.Curation
    import graft.pipeline.Curation.AttrRule
    val attrs = Curation.tagAttributes(t(s, dir, "documents"), "text",
        "doc_id", Seq("the", "a", "of", "and", "to", "in"),
        Seq("en" -> Seq("the", "a", "and", "scan", "join"),
          "es" -> Seq("el", "la", "que", "datos"),
          "de" -> Seq("der", "die", "und", "das")))
      .localCheckpoint() // diamond: two filter configs read the table
    val lenient = Seq(AttrRule("quality", ">=", "0.25"),
      AttrRule("n_tokens", ">=", "5"), AttrRule("is_canonical", "==", "true"))
    val strictOnly = Seq(AttrRule("quality", ">=", "0.35"),
      AttrRule("langid", "==", "en"), AttrRule("rep_frac", "<=", "0.2"))
    val keptStrict = Curation.applyConfig(attrs, lenient ++ strictOnly)
      .select(col("doc_id"), lit(true).as("kept_strict"))
    Curation.applyConfig(attrs, lenient)
      .join(keptStrict, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_chars"), col("quality"),
        col("langid"), col("rep_frac"),
        coalesce(col("kept_strict"), lit(false)).as("kept_strict"))
      .orderBy("doc_id")
  }


  // Multimodal perceptual-hash near-dup: the pigeonhole machinery over a
  // 64-bit media hash (stub = md5-derived, so only byte-identical media
  // collide — which is exactly what the oracle can pin; a real pHash slots
  // into the same pipeline).
  register(
    "mm_phash_neardup",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 97 = 0),
      |h AS (SELECT doc_id, md5(text) AS m FROM corpus)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
      |FROM h a JOIN h b ON a.m = b.m AND a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents").select("doc_id", "text")
    // plant byte-identical "media" (re-ingested copies) so the pair output
    // is non-empty and the oracle pins them exactly
    val corpus = docs.unionAll(docs.where(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val media = Multimodal.asMediaTable(corpus, "doc_id", "text", "image")
    Multimodal.phashNearDups(media)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .orderBy("id_a", "id_b")
  }


  // Multimodal: binary media table with typed metadata + stub frame sampling
  // (decode itself is stubbed; schema/partitioning/batch shape are real).
  register(
    "mm_media_frames",
    """SELECT doc_id AS media_id, f AS frame_idx,
      |       (f * length(text)) // 4 AS byte_offset,
      |       md5(text || CAST(f AS VARCHAR)) AS frame_md5
      |FROM documents, range(4) r(f) ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
    val media = Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id", "text", "image")
    Multimodal.stubFrameSample(media, 4)
      .select("media_id", "frame_idx", "byte_offset", "frame_md5")
      .orderBy("media_id", "frame_idx")
  }


  // Scene-change detection over the sampled frames: consecutive frame
  // hashes' hamming distance against a threshold — the shot-segmentation
  // primitive for video corpora (threshold 30 splits the stub hash's
  // random ~30-bit median, so both verdicts occur; a real pHash makes it
  // a visual knob). One lag window per media.
  register(
    "mm_scene_changes",
    """WITH f AS (
      |  SELECT doc_id AS media_id, f AS frame_idx,
      |         CAST(('0x' || substr(md5(text || CAST(f AS VARCHAR)), 1, 15))
      |              AS BIGINT) AS h
      |  FROM documents, range(4) r(f)),
      |l AS (SELECT media_id, frame_idx, h,
      |             lag(h) OVER (PARTITION BY media_id ORDER BY frame_idx) AS ph
      |      FROM f)
      |SELECT media_id, frame_idx,
      |       CAST(bit_count(xor(h, ph)) AS BIGINT) AS hamming,
      |       bit_count(xor(h, ph)) > 30 AS is_scene_change
      |FROM l WHERE ph IS NOT NULL
      |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
    val media = Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id",
      "text", "video")
    Multimodal.sceneChanges(Multimodal.stubFrameSample(media, 4),
        hammingThreshold = 30)
      .orderBy("media_id", "frame_idx")
  }


  // Voice-activity segmentation over the sampled frames: runs of
  // consecutive "speech" frames (stub energy = md5 hex lexically >= 'c',
  // ~25% of frames) collapse to segments — the gaps-and-islands
  // run-length grouping every audio corpus needs before transcription.
  // The window partitions by media_id over the frame-count-bounded frame
  // set, never a corpus-cardinality key.
  register(
    "mm_audio_vad",
    """WITH f AS (
      |  SELECT doc_id AS media_id, f AS frame_idx,
      |         md5(text || CAST(f AS VARCHAR)) AS h
      |  FROM documents, range(8) r(f)),
      |sp AS (SELECT media_id, frame_idx,
      |              row_number() OVER (PARTITION BY media_id
      |                                 ORDER BY frame_idx) AS rn
      |       FROM f WHERE h >= 'c')
      |SELECT media_id, min(frame_idx) AS seg_start,
      |       max(frame_idx) AS seg_end,
      |       CAST(count(*) AS BIGINT) AS n_frames
      |FROM sp GROUP BY media_id, frame_idx - rn
      |ORDER BY media_id, seg_start""".stripMargin) { (s, dir) =>
    val media = Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id",
      "text", "audio")
    Multimodal.vadSegments(Multimodal.stubFrameSample(media, 8),
        speechThresholdHex = "c")
      .orderBy("media_id", "seg_start")
  }

  // Image dimension probe — REAL byte parsing over opaque binary, no
  // codec: PNG width/height at the spec-fixed IHDR offsets (exact for
  // every conformant file), JPEG via the first ALIGNED SOF0/SOF2 marker
  // on the hex encoding (the `^(?:..)*?FFC[02]` alignment trick — the
  // fixture plants an odd-offset FFC0 decoy that must be skipped), a
  // truncated PNG magic (null dims, valid=false), and a text blob
  // (format unknown). The Spark side builds genuine binary via unhex;
  // the oracle computes on the hex string with the '0x' cast.
  register(
    "mm_image_dims",
    """WITH b AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN '89504E470D0A1A0A0000000D49484452'
      |        || lpad(hex(100 + doc_id % 900), 8, '0')
      |        || lpad(hex(50 + doc_id % 500), 8, '0')
      |        || '08060000001A2B3C4D'
      |      WHEN 1 THEN 'FFD8FFE000104A464946000101010060006000000FFC01FFC0001108'
      |        || lpad(hex(240 + doc_id % 480), 4, '0')
      |        || lpad(hex(320 + doc_id % 640), 4, '0')
      |        || '03012200021101031101'
      |      WHEN 2 THEN '89504E470D0A1A0A0000'
      |      ELSE hex(text) END AS hx
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  CASE WHEN starts_with(hx, '89504E470D0A1A0A') THEN 'png'
      |       WHEN starts_with(hx, 'FFD8FF') THEN 'jpeg'
      |       ELSE 'unknown' END AS format,
      |  CAST(length(hx) // 2 AS BIGINT) AS n_bytes,
      |  CASE WHEN starts_with(hx, '89504E470D0A1A0A') AND length(hx) >= 48
      |         THEN CAST(('0x' || substr(hx, 33, 8)) AS BIGINT)
      |       WHEN starts_with(hx, 'FFD8FF')
      |         AND regexp_extract(hx, '^(?:..)*?FFC[02]..........(....)', 1) != ''
      |         THEN CAST(('0x' || regexp_extract(hx, '^(?:..)*?FFC[02]..........(....)', 1)) AS BIGINT)
      |       END AS width,
      |  CASE WHEN starts_with(hx, '89504E470D0A1A0A') AND length(hx) >= 48
      |         THEN CAST(('0x' || substr(hx, 41, 8)) AS BIGINT)
      |       WHEN starts_with(hx, 'FFD8FF')
      |         AND regexp_extract(hx, '^(?:..)*?FFC[02]......(....)', 1) != ''
      |         THEN CAST(('0x' || regexp_extract(hx, '^(?:..)*?FFC[02]......(....)', 1)) AS BIGINT)
      |       END AS height,
      |  CASE WHEN starts_with(hx, '89504E470D0A1A0A') AND length(hx) >= 48
      |         THEN TRUE
      |       WHEN starts_with(hx, 'FFD8FF')
      |         AND regexp_extract(hx, '^(?:..)*?FFC[02]..........(....)', 1) != ''
      |         THEN TRUE ELSE FALSE END AS valid
      |FROM b ORDER BY media_id""".stripMargin) { (s, dir) =>
    val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
      lpad(hex(lit(100) + col("doc_id") % 900), 8, "0"),
      lpad(hex(lit(50) + col("doc_id") % 500), 8, "0"),
      lit("08060000001A2B3C4D"))
    val jpgHex = concat(
      lit("FFD8FFE000104A464946000101010060006000000FFC01FFC0001108"),
      lpad(hex(lit(240) + col("doc_id") % 480), 4, "0"),
      lpad(hex(lit(320) + col("doc_id") % 640), 4, "0"),
      lit("03012200021101031101"))
    val blobs = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 0, unhex(pngHex))
        .when(col("doc_id") % 4 === 1, unhex(jpgHex))
        .when(col("doc_id") % 4 === 2, unhex(lit("89504E470D0A1A0A0000")))
        .otherwise(col("text").cast("binary")).as("blob"))
    Multimodal.imageDims(blobs, "blob", "doc_id").orderBy("media_id")
  }


  // Image dimension probe, r19 format-extension classes: GIF 87a+89a
  // (u16 LITTLE-endian logical-screen dims — the byte-swap path), BMP
  // bottom-up AND top-down (the NEGATIVE i32 height must report its
  // magnitude), and all three WebP container flavors (VP8 lossy behind
  // its validated 9D012A start code, VP8L's 28-bit packed bitfield,
  // VP8X's u24 canvas dims). The oracle derives every field
  // analytically from the doc_id parameters; garbage is prefixed with
  // 0x00 bytes so no ASCII text can spoof the two-letter BMP magic.
  register(
    "mm_image_dims2",
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS m8,
      |         doc_id % 1920 + 1 AS w, doc_id % 1080 + 1 AS h,
      |         strlen(text) AS tlen
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  CASE WHEN m8 <= 1 THEN 'gif' WHEN m8 <= 3 THEN 'bmp'
      |       WHEN m8 <= 6 THEN 'webp' ELSE 'unknown' END AS format,
      |  CAST(CASE WHEN m8 <= 1 THEN 13 WHEN m8 <= 3 THEN 26
      |            WHEN m8 = 4 THEN 30 WHEN m8 = 5 THEN 25
      |            WHEN m8 = 6 THEN 30 ELSE tlen + 2 END AS BIGINT)
      |    AS n_bytes,
      |  CASE WHEN m8 <= 6 THEN CAST(w AS BIGINT) END AS width,
      |  CASE WHEN m8 <= 6 THEN CAST(h AS BIGINT) END AS height,
      |  m8 <= 6 AS valid
      |FROM p ORDER BY media_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id")
    val w = id % 1920 + 1
    val h = id % 1080 + 1
    def byteHex(v: Column): Column = lpad(hex(v % 256), 2, "0")
    def le16(v: Column): Column = concat(byteHex(v), byteHex(floor(v / 256)))
    def le24(v: Column): Column =
      concat(byteHex(v), byteHex(floor(v / 256)), byteHex(floor(v / 65536)))
    def le32(v: Column): Column = concat(byteHex(v), byteHex(floor(v / 256)),
      byteHex(floor(v / 65536)), byteHex(floor(v / 16777216)))
    val gif87 = concat(lit("474946383761"), le16(w), le16(h), lit("F70000"))
    val gif89 = concat(lit("474946383961"), le16(w), le16(h), lit("F70000"))
    val bmpUp = concat(lit("424D" + "00" * 12 + "28000000"), le32(w), le32(h))
    val bmpDown = concat(lit("424D" + "00" * 12 + "28000000"), le32(w),
      le32(lit(4294967296L) - h)) // two's-complement -h: top-down rows
    val webpHead = "52494646" + "18000000" + "57454250"
    val vp8 = concat(lit(webpHead + "56503820" + "10000000" + "000000" +
      "9D012A"), le16(w), le16(h))
    // VP8L: 0x2F then width-1/height-1 as the low 28 bits of a LE u32
    val wm = w - 1
    val hm = h - 1
    val vp8l = concat(lit(webpHead + "5650384C" + "05000000" + "2F"),
      byteHex(wm), byteHex(floor(wm / 256) + (hm % 4) * 64),
      byteHex(floor(hm / 4)), byteHex(floor(hm / 1024)))
    val vp8x = concat(lit(webpHead + "56503858" + "0A000000" + "00000000"),
      le24(w - 1), le24(h - 1))
    val m8 = id % 8
    val blobs = t(s, dir, "documents").select(id,
      when(m8 === 0, unhex(gif87))
        .when(m8 === 1, unhex(gif89))
        .when(m8 === 2, unhex(bmpUp))
        .when(m8 === 3, unhex(bmpDown))
        .when(m8 === 4, unhex(vp8))
        .when(m8 === 5, unhex(vp8l))
        .when(m8 === 6, unhex(vp8x))
        .otherwise(unhex(concat(lit("0000"), hex(col("text"))))).as("blob"))
    Multimodal.imageDims(blobs, "blob", "doc_id").orderBy("media_id")
  }


  // Codec-free WAV duration probe (audio sibling of mm_image_dims):
  // canonical 44-byte PCM headers built from doc_id (little-endian u32s
  // as swapped hex pairs in BOTH engines), plus truncated and garbage
  // cases; duration = data_size / byte_rate without touching samples.
  // Oracle derives expected fields analytically from the same params.
  register(
    "mm_audio_duration",
    """WITH p AS (
      |  SELECT doc_id,
      |    8000 + (doc_id % 3) * 18050 AS rate,
      |    1 + doc_id % 2 AS ch,
      |    (8000 + (doc_id % 3) * 18050) * 2 * (1 + doc_id % 2) AS brate,
      |    (doc_id % 1000 + 1) * 2000 AS dsize
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  doc_id % 4 <= 1 AS valid,
      |  CASE WHEN doc_id % 4 <= 1 THEN CAST(ch AS BIGINT) END AS channels,
      |  CASE WHEN doc_id % 4 <= 1 THEN CAST(rate AS BIGINT) END AS sample_rate,
      |  CASE WHEN doc_id % 4 <= 1 THEN CAST(brate AS BIGINT) END AS byte_rate,
      |  CASE WHEN doc_id % 4 <= 1 THEN CAST(floor(
      |    CAST(dsize AS DOUBLE) * 1000.0 / CAST(brate AS DOUBLE) + 0.5)
      |    AS BIGINT) END AS duration_ms
      |FROM p ORDER BY media_id""".stripMargin) { (s, dir) =>
    def le32(v: Column): Column = {
      val h = lpad(hex(v), 8, "0")
      concat(substring(h, 7, 2), substring(h, 5, 2),
        substring(h, 3, 2), substring(h, 1, 2))
    }
    def le16(v: Column): Column = {
      val h = lpad(hex(v), 4, "0")
      concat(substring(h, 3, 2), substring(h, 1, 2))
    }
    val rate = lit(8000) + (col("doc_id") % 3) * 18050
    val ch = lit(1) + col("doc_id") % 2
    val brate = rate * 2 * ch
    val dsize = (col("doc_id") % 1000 + 1) * 2000
    val hdr = concat(lit("52494646"), le32(dsize + 36),
      lit("57415645"), lit("666D7420"), lit("10000000"), lit("0100"),
      le16(ch), le32(rate), le32(brate), le16(ch * 2), lit("1000"),
      lit("64617461"), le32(dsize))
    val m4 = col("doc_id") % 4
    val blobs = t(s, dir, "documents").select(col("doc_id"),
      when(m4 <= 1, unhex(hdr))
        .when(m4 === 2, unhex(substring(hdr, 1, 40))) // truncated header
        .otherwise(unhex(lit("00DEADBEEF00"))).as("blob"))
    Multimodal.audioDuration(blobs, "blob", "doc_id").orderBy("media_id")
  }


  // Codec-free EXIF probe (mm_image_dims' provenance sibling): a REAL
  // APP1/TIFF IFD walk over planted JPEG bytes — little-endian with a
  // GPS-IFD pointer, big-endian without, an EXIF-less JPEG, a truncated
  // TIFF, and garbage. Every class carries the UNALIGNED FFE1+Exif-magic
  // decoy inside APP0 (hex '0FFE1002...' puts FFE1 at an even 1-based
  // hex index), so a broken alignment guard would misparse and fail the
  // hash. The oracle derives expected fields analytically from the same
  // doc_id parameters — the hash match proves the byte walk is exact.
  register(
    "mm_exif",
    """SELECT doc_id AS media_id,
      |  doc_id % 5 <= 1 AS valid,
      |  CASE WHEN doc_id % 5 = 0 THEN 'II'
      |       WHEN doc_id % 5 = 1 THEN 'MM' END AS byte_order,
      |  CASE WHEN doc_id % 5 <= 1
      |       THEN CAST(1 + doc_id % 8 AS BIGINT) END AS orientation,
      |  CASE WHEN doc_id % 5 <= 1
      |       THEN '1995:06:18 ' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
      |            || ':00:00' END AS datetime_original,
      |  doc_id % 5 = 0 AS has_gps
      |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
    def le16h(v: Column): Column = {
      val h = lpad(hex(v), 4, "0")
      concat(substring(h, 3, 2), substring(h, 1, 2))
    }
    val orient = lit(1) + col("doc_id") % 8
    val hh = col("doc_id") % 24
    // "1995:06:18 HH:00:00\0" as ASCII hex (digits are 0x30 + d)
    val dtoHex = concat(lit("313939353A30363A313820"),
      hex(lit(48) + floor(hh / 10)), hex(lit(48) + hh % 10),
      lit("3A30303A303000"))
    // IFD0: orientation, Exif-IFD ptr -> 50, GPS-IFD ptr -> 88;
    // sub-IFD: DateTimeOriginal ASCII(20) @ offset 68; GPS IFD: empty
    val tiffLE = concat(lit("49492A0008000000"), lit("0300"),
      lit("120103000100" + "0000"), le16h(orient), lit("0000"),
      lit("6987040001000000" + "32000000"),
      lit("2588040001000000" + "58000000"),
      lit("00000000"),
      lit("0100" + "039002001400000044000000" + "00000000"),
      dtoHex, lit("0000" + "00000000"))
    // BE: orientation + Exif-IFD ptr -> 38; DateTimeOriginal @ offset 56
    val tiffBE = concat(lit("4D4D002A00000008"), lit("0002"),
      lit("0112" + "0003" + "00000001"), lpad(hex(orient), 4, "0"),
      lit("0000"),
      lit("8769" + "0004" + "00000001" + "00000026"),
      lit("00000000"),
      lit("0001" + "9003" + "0002" + "00000014" + "00000038" + "00000000"),
      dtoHex)
    // APP0 payload = 'JFIF\0' + the 11-byte unaligned FFE1+magic decoy
    val app0 = "FFE000124A46494600" + "0FFE100204578696600000"
    val jpegLE = concat(lit("FFD8" + app0 + "FFE10066457869660000"), tiffLE)
    val jpegBE = concat(lit("FFD8" + app0 + "FFE10054457869660000"), tiffBE)
    val noExif = lit("FFD8" + app0 + "FFDB00430011223344FFD9")
    val truncated = lit("FFD8FFE1000C45786966000049492A00")
    val m5 = col("doc_id") % 5
    val blobs = t(s, dir, "documents").select(col("doc_id"),
      when(m5 === 0, unhex(jpegLE))
        .when(m5 === 1, unhex(jpegBE))
        .when(m5 === 2, unhex(noExif))
        .when(m5 === 3, unhex(truncated))
        .otherwise(col("text").cast("binary")).as("blob"))
    Multimodal.exifProbe(blobs, "blob", "doc_id").orderBy("media_id")
  }


  // EXIF GPS decode (mm_exif's coordinate follow-through, r17 verdict ask
  // #7): the same codec-free IFD walk follows pointer tag 0x8825 into the
  // GPS IFD and decodes GPSLatitude/GPSLongitude RATIONAL(3) triples plus
  // their N/S/E/W refs — planted LE and BE fixtures with doc_id-derived
  // deg/min/centisec rationals, a no-GPS EXIF class, a zero-denominator
  // class (has_gps stays true, coords null — presence is the PII signal),
  // and garbage. Coordinates hash-compare as SIGNED micro-degree BIGINTs:
  // both engines replay the identical fixed-shape IEEE expression
  // (dn/dd + (mn/md)/60 + (sn/sd)/3600) * 1e6, floor-rounded, so the
  // match is bit-exact, not approximate.
  register(
    "mm_exif_gps",
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 5 AS INT) AS m5,
      |         1 + doc_id % 8 AS orient,
      |         doc_id % 90 AS dla, doc_id % 60 AS mla, doc_id % 6000 AS sla,
      |         doc_id % 180 AS dlo, doc_id % 59 AS mlo, doc_id % 5900 AS slo
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  m5 <= 3 AS valid,
      |  m5 IN (0, 1, 3) AS has_gps,
      |  CASE WHEN m5 <= 3 THEN CAST(orient AS BIGINT) END AS orientation,
      |  CASE WHEN m5 IN (0, 1, 3)
      |       THEN CASE WHEN doc_id % 2 = 0 THEN 'N' ELSE 'S' END
      |       END AS lat_ref,
      |  CASE WHEN m5 IN (0, 1, 3)
      |       THEN CASE WHEN doc_id % 3 = 0 THEN 'W' ELSE 'E' END
      |       END AS lon_ref,
      |  CASE WHEN m5 IN (0, 1) THEN
      |    (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END) *
      |    CAST(floor((CAST(dla AS DOUBLE) / 1.0 +
      |      (CAST(mla AS DOUBLE) / 1.0) / 60.0 +
      |      (CAST(sla AS DOUBLE) / 100.0) / 3600.0) * 1000000.0 + 0.5)
      |      AS BIGINT) END AS lat_udeg,
      |  CASE WHEN m5 IN (0, 1) THEN
      |    (CASE WHEN doc_id % 3 = 0 THEN -1 ELSE 1 END) *
      |    CAST(floor((CAST(dlo AS DOUBLE) / 1.0 +
      |      (CAST(mlo AS DOUBLE) / 1.0) / 60.0 +
      |      (CAST(slo AS DOUBLE) / 100.0) / 3600.0) * 1000000.0 + 0.5)
      |      AS BIGINT) END AS lon_udeg
      |FROM p ORDER BY media_id""".stripMargin) { (s, dir) =>
    def be32(v: Column): Column = lpad(hex(v), 8, "0")
    def le32h(v: Column): Column = {
      val h = be32(v)
      concat(substring(h, 7, 2), substring(h, 5, 2),
        substring(h, 3, 2), substring(h, 1, 2))
    }
    def be16(v: Column): Column = lpad(hex(v), 4, "0")
    def le16h(v: Column): Column = {
      val h = be16(v)
      concat(substring(h, 3, 2), substring(h, 1, 2))
    }
    val id = col("doc_id")
    val orient = lit(1) + id % 8
    val (dla, mla, sla) = (id % 90, id % 60, id % 6000)
    val (dlo, mlo, slo) = (id % 180, id % 59, id % 5900)
    val refLat = when(id % 2 === 0, lit("4E")).otherwise(lit("53")) // N/S
    val refLon = when(id % 3 === 0, lit("57")).otherwise(lit("45")) // W/E
    // RATIONAL(3) block: (deg, 1) (min, 1) (sec, secDen) as six u32s
    def ratLE(d: Column, m: Column, sN: Column, sD: Column): Column =
      concat(le32h(d), le32h(lit(1)), le32h(m), le32h(lit(1)),
        le32h(sN), le32h(sD))
    def ratBE(d: Column, m: Column, sN: Column, sD: Column): Column =
      concat(be32(d), be32(lit(1)), be32(m), be32(lit(1)),
        be32(sN), be32(sD))
    // LE TIFF with GPS: IFD0 {orientation, GPS ptr -> 38}; GPS IFD at 38
    // {latRef, lat -> 92, lonRef, lon -> 116}; rationals at 92 and 116
    def tiffLE(secDen: Column): Column = concat(
      lit("49492A00" + "08000000" + "0200"),
      lit("120103000100" + "0000"), le16h(orient), lit("0000"),
      lit("2588040001000000" + "26000000"),
      lit("00000000"),
      lit("0400"),
      lit("0100" + "0200" + "02000000"), refLat, lit("000000"),
      lit("0200" + "0500" + "03000000" + "5C000000"),
      lit("0300" + "0200" + "02000000"), refLon, lit("000000"),
      lit("0400" + "0500" + "03000000" + "74000000"),
      lit("00000000"),
      ratLE(dla, mla, sla, secDen), ratLE(dlo, mlo, slo, secDen))
    val tiffBE = concat(
      lit("4D4D002A" + "00000008" + "0002"),
      lit("0112" + "0003" + "00000001"), be16(orient), lit("0000"),
      lit("8825" + "0004" + "00000001" + "00000026"),
      lit("00000000"),
      lit("0004"),
      lit("0001" + "0002" + "00000002"), refLat, lit("000000"),
      lit("0002" + "0005" + "00000003" + "0000005C"),
      lit("0003" + "0002" + "00000002"), refLon, lit("000000"),
      lit("0004" + "0005" + "00000003" + "00000074"),
      lit("00000000"),
      ratBE(dla, mla, sla, lit(100)), ratBE(dlo, mlo, slo, lit(100)))
    // EXIF with orientation but NO GPS pointer (has_gps must be false)
    val tiffNoGps = concat(
      lit("49492A00" + "08000000" + "0100"),
      lit("120103000100" + "0000"), le16h(orient), lit("0000"),
      lit("00000000"))
    val app0 = "FFE000124A46494600" + "0FFE100204578696600000" // w/ decoy
    def jpeg(app1Len: String, tiff: Column): Column =
      concat(lit("FFD8" + app0 + "FFE1" + app1Len + "457869660000"), tiff)
    val m5 = id % 5
    val blobs = t(s, dir, "documents").select(id,
      when(m5 === 0, unhex(jpeg("0094", tiffLE(lit(100)))))
        .when(m5 === 1, unhex(jpeg("0094", tiffBE)))
        .when(m5 === 2, unhex(jpeg("0022", tiffNoGps)))
        .when(m5 === 3, unhex(jpeg("0094", tiffLE(lit(0))))) // 0-denominator
        .otherwise(col("text").cast("binary")).as("blob"))
    Multimodal.exifGps(blobs, "blob", "doc_id").orderBy("media_id")
  }


  // Codec-free MP4/ISO-BMFF duration probe (r18 verdict ask #8 — video
  // was the one multimodal tier with only the stubbed frame sampler):
  // a REAL length-framed box walk to moov/mvhd over planted bytes. The
  // v0 fixture is the non-faststart layout (ftyp + free before moov)
  // with a udta child BEFORE mvhd, so both walks must actually follow
  // box sizes; the v1 fixture routes through the 64-bit size==1
  // largesize escape and reads duration as u64. Truncated-mvhd, no-moov,
  // and garbage classes yield valid=false. The oracle derives expected
  // fields analytically from the same doc_id parameters — the hash match
  // proves the byte walk is exact.
  register(
    "mm_video_duration",
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 5 AS INT) AS m5,
      |         600 + doc_id % 1000 AS ts,
      |         (doc_id % 5000 + 1) * 123 AS dur
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  m5 <= 1 AS valid,
      |  CASE WHEN m5 <= 1 THEN CAST(m5 AS BIGINT) END AS version,
      |  CASE WHEN m5 <= 1 THEN CAST(ts AS BIGINT) END AS timescale,
      |  CASE WHEN m5 <= 1 THEN CAST(dur AS BIGINT) END AS duration,
      |  CASE WHEN m5 <= 1 THEN CAST(floor(
      |    CAST(dur AS DOUBLE) * 1000.0 / CAST(ts AS DOUBLE) + 0.5)
      |    AS BIGINT) END AS duration_ms
      |FROM p ORDER BY media_id""".stripMargin) { (s, dir) =>
    def be32(v: Column): Column = lpad(hex(v), 8, "0")
    val id = col("doc_id")
    val ts = lit(600) + id % 1000
    val dur = (id % 5000 + 1) * 123
    val ftyp = "00000010" + "66747970" + "69736F6D" + "00000000"
    val free8 = "00000008" + "66726565"
    // size==1 largesize escape: 24-byte free box, length in the u64
    val freeLarge = "00000001" + "66726565" + "0000000000000018" +
      "0000000000000000"
    val udta8 = "00000008" + "75647461"
    // v0 mvhd: 28-byte box (header + version/flags + ctime + mtime + ts + dur)
    val mvhd0 = concat(lit("0000001C" + "6D766864" + "00000000" +
      "00000000" + "00000000"), be32(ts), be32(dur))
    // v1 mvhd: 40-byte box (u64 ctime/mtime, u32 ts, u64 dur)
    val mvhd1 = concat(lit("00000028" + "6D766864" + "01000000" +
      "0000000000000000" + "0000000000000000"), be32(ts),
      lit("00000000"), be32(dur))
    val moov0 = concat(lit("0000002C" + "6D6F6F76" + udta8), mvhd0)
    val moov1 = concat(lit("00000030" + "6D6F6F76"), mvhd1)
    // truncated: mvhd header present, timescale/duration cut off
    val truncated = ftyp + "0000002C6D6F6F76" + udta8 +
      "0000001C6D766864" + "00000000"
    val noMoov = ftyp + "00000010" + "6D646174" + "0011223344556677"
    val m5 = id % 5
    val blobs = t(s, dir, "documents").select(id,
      when(m5 === 0, unhex(concat(lit(ftyp + free8), moov0)))
        .when(m5 === 1, unhex(concat(lit(ftyp + freeLarge), moov1)))
        .when(m5 === 2, unhex(lit(truncated)))
        .when(m5 === 3, unhex(lit(noMoov)))
        .otherwise(col("text").cast("binary")).as("blob"))
    Multimodal.videoDuration(blobs, "blob", "doc_id").orderBy("media_id")
  }


  // Codec-free MP3 duration probe (compressed-audio sibling of
  // mm_audio_duration's PCM WAV): frame-header decode against the
  // published ISO 11172-3 tables + ID3v2 syncsafe skip + Xing/Info
  // exact-frame-count path. Fixture classes: CBR MPEG1 128k/44100
  // behind a VARIABLE-size ID3v2 tag (the syncsafe skip must land the
  // sync on the right byte for every size), VBR MPEG1 stereo with a
  // Xing frame count (offset 36 path), CBR MPEG2 MONO with an Info
  // count behind a second ID3 size (offset 13 path — both version and
  // channel-mode offsets exercised), a truncated ID3 claiming audio
  // past end-of-blob, and text garbage. The oracle derives every field
  // analytically from the same doc_id parameters — the hash match
  // proves the bit-field decode and both duration paths are exact.
  register(
    "mm_mp3_duration",
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 5 AS INT) AS m5,
      |         doc_id % 100 AS id3s, doc_id % 400 + 50 AS fill,
      |         doc_id % 10000 + 1 AS xf, doc_id % 5000 + 2 AS inf
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  m5 <= 2 AS valid,
      |  CASE WHEN m5 IN (0, 1) THEN '1' WHEN m5 = 2 THEN '2' END AS version,
      |  CASE WHEN m5 IN (0, 1) THEN CAST(128 AS BIGINT)
      |       WHEN m5 = 2 THEN CAST(64 AS BIGINT) END AS bitrate_kbps,
      |  CASE WHEN m5 IN (0, 1) THEN CAST(44100 AS BIGINT)
      |       WHEN m5 = 2 THEN CAST(22050 AS BIGINT) END AS sample_rate,
      |  CASE WHEN m5 <= 2 THEN m5 = 1 END AS vbr,
      |  CASE WHEN m5 = 1 THEN CAST(xf AS BIGINT)
      |       WHEN m5 = 2 THEN CAST(inf AS BIGINT) END AS n_frames,
      |  CASE WHEN m5 = 0 THEN CAST(floor(
      |         CAST((fill + 4) * 8000 AS DOUBLE) / 128000.0 + 0.5) AS BIGINT)
      |       WHEN m5 = 1 THEN CAST(floor(
      |         CAST(xf * 1152 * 1000 AS DOUBLE) / 44100.0 + 0.5) AS BIGINT)
      |       WHEN m5 = 2 THEN CAST(floor(
      |         CAST(inf * 576 * 1000 AS DOUBLE) / 22050.0 + 0.5) AS BIGINT)
      |  END AS duration_ms
      |FROM p ORDER BY media_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id")
    val zeros = lit("0" * 1024)
    def zpad(nBytes: Column): Column = zeros.substr(lit(1), (nBytes * 2).cast("int"))
    def be32(v: Column): Column = lpad(hex(v), 8, "0")
    // ID3v2 header with a syncsafe size (< 128, so only the low byte)
    def id3(size: Column): Column =
      concat(lit("494433" + "0400" + "00" + "000000"),
        lpad(hex(size), 2, "0"), zpad(size))
    val id3s = id % 100
    val fill = id % 400 + 50
    val xf = id % 10000 + 1
    val inf = id % 5000 + 2
    // MPEG1 Layer III 128kbps 44100 stereo: FF FB 90 00; MPEG2 Layer III
    // 64kbps 22050 mono: FF F3 80 C0
    val cbr1 = concat(id3(id3s), lit("FFFB9000"), zpad(fill))
    val xing = concat(lit("FFFB9000"), zpad(lit(32)),
      lit("58696E67" + "00000001"), be32(xf))
    val info2 = concat(id3(id % 50), lit("FFF380C0"), zpad(lit(9)),
      lit("496E666F" + "00000001"), be32(inf))
    val truncId3 = "494433" + "0400" + "00" + "00000010"
    val m5 = id % 5
    val blobs = t(s, dir, "documents").select(id,
      when(m5 === 0, unhex(cbr1))
        .when(m5 === 1, unhex(xing))
        .when(m5 === 2, unhex(info2))
        .when(m5 === 3, unhex(lit(truncId3)))
        .otherwise(col("text").cast("binary")).as("blob"))
    Multimodal.mp3Duration(blobs, "blob", "doc_id").orderBy("media_id")
  }


  // Codec-free WebM/Matroska duration probe — a REAL bounded EBML
  // varint walk (Segment -> Info -> TimestampScale/Duration), the
  // second dominant video container next to mm_video_duration's
  // ISO-BMFF. Duration is a FLOAT in scale units: fixtures plant values
  // in [2^20, 2^21) so the IEEE bit patterns build EXACTLY from integer
  // arithmetic (bits = (1023+20)<<52 | (v-2^20)<<32 for f64;
  // (127+20)<<23 | (v-2^20)<<3 for f32) and the in-plan float decode
  // must reproduce v exactly. Class 0 walks past a Void child with an
  // explicit TimestampScale; class 1 rides the UNKNOWN-size streaming
  // Segment (01FF..) with the default scale and an f32 Duration; no
  // Info / truncated / garbage yield valid=false.
  register(
    "mm_webm_duration",
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 5 AS INT) AS m5,
      |         1048576 + doc_id % 1000000 AS v
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  m5 <= 1 AS valid,
      |  CASE WHEN m5 <= 1 THEN CAST(1000000 AS BIGINT) END AS timescale_ns,
      |  CASE WHEN m5 <= 1 THEN CAST(v AS BIGINT) END AS duration_ms
      |FROM p ORDER BY media_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id")
    val v = id % 1000000 + 1048576
    val f64bits = lit(1043L * 4503599627370496L) + (v - 1048576) * 4294967296L
    val f32bits = lit(147L * 8388608L) + (v - 1048576) * 8
    val ebml = "1A45DFA3" + "84" + "42868101"
    // Info: TimestampScale 1e6 + f64 Duration; Void precedes Info
    val info0 = concat(lit("1549A966" + "92" + "2AD7B1" + "83" + "0F4240" +
      "4489" + "88"), lpad(hex(f64bits), 16, "0"))
    val seg0 = concat(lit("18538067" + "9B" + "EC" + "82" + "0000"), info0)
    // unknown-size Segment, Info first, f32 Duration, default scale
    val info1 = concat(lit("1549A966" + "87" + "4489" + "84"),
      lpad(hex(f32bits), 8, "0"))
    val seg1 = concat(lit("18538067" + "01FFFFFFFFFFFFFF"), info1)
    val noInfo = ebml + "18538067" + "88" + "EC" + "86" + "000000000000"
    val m5 = id % 5
    val blobs = t(s, dir, "documents").select(id,
      when(m5 === 0, unhex(concat(lit(ebml), seg0)))
        .when(m5 === 1, unhex(concat(lit(ebml), seg1)))
        .when(m5 === 2, unhex(lit(noInfo)))
        .when(m5 === 3, unhex(lit("1A45DF")))
        .otherwise(unhex(concat(lit("0000"), hex(col("text"))))).as("blob"))
    Multimodal.webmDuration(blobs, "blob", "doc_id").orderBy("media_id")
  }


  // Codec-free Ogg/Opus duration probe: the LAST page's granule
  // position (one greedy aligned scan — the last-occurrence dual of
  // the JPEG SOF first-occurrence trick) minus the OpusHead pre-skip,
  // at Opus's fixed 48 kHz granule rate. Class 0 is a BOS+EOS pair with
  // a real pre-skip (312, the libopus default); class 1 a pre-skip-0
  // mono stream whose final page lacks the EOS flag (live-stream shape
  // — reported, not required); a Vorbis-headed Ogg is valid=false (no
  // codec-free granule mapping without its head parse); garbage too.
  // Granules are planted as preskip + ms*48 so duration_ms hash-equals
  // the analytic oracle exactly.
  register(
    "mm_ogg_duration",
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 4 AS INT) AS m4,
      |         doc_id % 100000 AS ms
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  m4 <= 1 AS valid,
      |  CASE WHEN m4 = 0 THEN CAST(2 AS BIGINT)
      |       WHEN m4 = 1 THEN CAST(1 AS BIGINT) END AS channels,
      |  CASE WHEN m4 = 0 THEN CAST(312 AS BIGINT)
      |       WHEN m4 = 1 THEN CAST(0 AS BIGINT) END AS pre_skip,
      |  CASE WHEN m4 = 0 THEN TRUE WHEN m4 = 1 THEN FALSE END AS eos,
      |  CASE WHEN m4 = 0 THEN CAST(312 + ms * 48 AS BIGINT)
      |       WHEN m4 = 1 THEN CAST(ms * 48 AS BIGINT) END AS granule,
      |  CASE WHEN m4 <= 1 THEN CAST(ms AS BIGINT) END AS duration_ms
      |FROM p ORDER BY media_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id")
    val ms = id % 100000
    def byteHex(v: Column): Column = lpad(hex(v % 256), 2, "0")
    def leN(v: Column, n: Int): Column =
      concat((0 until n).map(i => byteHex(floor(v / math.pow(256, i)))): _*)
    def opusHead(ch: String, preskip: Column): Column =
      concat(lit("4F70757348656164" + "01" + ch), leN(preskip, 2),
        lit("80BB0000" + "0000" + "00")) // rate 48000 LE, gain, family
    def page0(flags: String, head: Column): Column =
      concat(lit("4F676753" + "00" + flags + "00" * 8 + "01000000" +
        "00000000" + "00000000" + "01" + "13"), head)
    def lastPage(flags: String, granule: Column): Column =
      concat(lit("4F676753" + "00" + flags), leN(granule, 8),
        lit("01000000" + "01000000" + "00000000" + "00"))
    val ogg0 = concat(page0("02", opusHead("02", lit(312))),
      lastPage("04", ms * 48 + 312))
    val ogg1 = concat(page0("02", opusHead("01", lit(0))),
      lastPage("00", ms * 48))
    val vorbis = "4F676753" + "00" + "02" + "00" * 8 + "01000000" +
      "00000000" + "00000000" + "01" + "13" +
      "01766F72626973" + "00" * 12
    val m4 = id % 4
    val blobs = t(s, dir, "documents").select(id,
      when(m4 === 0, unhex(ogg0))
        .when(m4 === 1, unhex(ogg1))
        .when(m4 === 2, unhex(lit(vorbis)))
        .otherwise(unhex(concat(lit("0000"), hex(col("text"))))).as("blob"))
    Multimodal.oggDuration(blobs, "blob", "doc_id").orderBy("media_id")
  }


  // Codec-free FLAC duration probe completing the audio tier (WAV PCM +
  // MP3 + FLAC lossless): STREAMINFO is REQUIRED first, so the packed
  // rate/channels/bps/total-samples bitfield sits at fixed offsets —
  // decoded piecewise from u8 reads. Class 1 plants a total-sample
  // count ABOVE 2^32 so the 36-bit path (the high nibble of byte 21)
  // is exercised for real; truncated-header and garbage classes yield
  // valid=false. The oracle derives every field analytically.
  register(
    "mm_flac_duration",
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 4 AS INT) AS m4,
      |         doc_id % 10000000 AS n0,
      |         4294967296 + doc_id % 100000 AS n1
      |  FROM documents)
      |SELECT doc_id AS media_id,
      |  m4 <= 1 AS valid,
      |  CASE WHEN m4 = 0 THEN CAST(44100 AS BIGINT)
      |       WHEN m4 = 1 THEN CAST(8000 AS BIGINT) END AS sample_rate,
      |  CASE WHEN m4 = 0 THEN CAST(2 AS BIGINT)
      |       WHEN m4 = 1 THEN CAST(1 AS BIGINT) END AS channels,
      |  CASE WHEN m4 = 0 THEN CAST(16 AS BIGINT)
      |       WHEN m4 = 1 THEN CAST(8 AS BIGINT) END AS bits_per_sample,
      |  CASE WHEN m4 = 0 THEN CAST(n0 AS BIGINT)
      |       WHEN m4 = 1 THEN CAST(n1 AS BIGINT) END AS n_samples,
      |  CASE WHEN m4 = 0 THEN CAST(floor(
      |         CAST(n0 * 1000 AS DOUBLE) / 44100.0 + 0.5) AS BIGINT)
      |       WHEN m4 = 1 THEN CAST(floor(
      |         CAST(n1 * 1000 AS DOUBLE) / 8000.0 + 0.5) AS BIGINT)
      |  END AS duration_ms
      |FROM p ORDER BY media_id""".stripMargin) { (s, dir) =>
    val id = col("doc_id")
    val n0 = id % 10000000
    val n1 = id % 100000 // low 32 bits; the 36-bit high nibble rides b21
    // magic + header(type 0, len 34) + min/max block + min/max frame
    val pre = "664C6143" + "00" + "000022" + "1000" + "1000" +
      "000000" + "000000"
    val md5 = "00" * 16
    // packed prefixes: (rate, ch-1, bps-1) = 44100/1/15 -> 0A C4 42 F0;
    // 8000/0/7 -> 01 F4 00 7n with n = samples bit 35..32 = 1
    val flac0 = concat(lit(pre + "0AC442F0"), lpad(hex(n0), 8, "0"), lit(md5))
    val flac1 = concat(lit(pre + "01F40071"), lpad(hex(n1), 8, "0"), lit(md5))
    val m4 = id % 4
    val blobs = t(s, dir, "documents").select(id,
      when(m4 === 0, unhex(flac0))
        .when(m4 === 1, unhex(flac1))
        .when(m4 === 2, unhex(lit("664C6143" + "000000"))) // truncated
        .otherwise(unhex(concat(lit("0000"), hex(col("text"))))).as("blob"))
    Multimodal.flacDuration(blobs, "blob", "doc_id").orderBy("media_id")
  }


  // The INGEST-TRIAGE composite — the fetch-to-frontier program in front
  // of p12's content pipeline, chaining this round's surface: response
  // head (t105) -> status/content-type gates -> charset sniff over body
  // BYTES (t109) -> REP indexability (t108) -> redirect resolution for
  // the 3xx rows (t110, the frontier update). One fixture drives every
  // stage; the funnel pins per-stage survivor counts and the resolved
  // redirect count against a single DuckDB program reusing each
  // standalone row's expressions.
  register(
    "p14_ingest_triage",
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 8 AS INT)
      |      WHEN 2 THEN 'HTTP/1.1 301 Moved Permanently' || chr(13) || chr(10)
      |        || 'Location: u' || (doc_id + 8)
      |      WHEN 3 THEN 'HTTP/1.1 404 Not Found' || chr(13) || chr(10)
      |        || 'Content-Type: text/html'
      |      WHEN 4 THEN 'HTTP/1.1 200 OK' || chr(13) || chr(10)
      |        || 'Content-Type: text/plain'
      |      WHEN 5 THEN 'HTTP/1.1 200 OK' || chr(13) || chr(10)
      |        || 'Content-Type: text/html' || chr(13) || chr(10)
      |        || 'X-Robots-Tag: noindex'
      |      ELSE 'HTTP/1.1 200 OK' || chr(13) || chr(10)
      |        || 'Content-Type: text/html; charset=UTF-8' END AS head,
      |    CASE CAST(doc_id % 8 AS INT)
      |      WHEN 0 THEN '<html><body>plain page ' || text
      |      WHEN 1 THEN '<html><head><meta name="robots" content="noindex"></head><body>x'
      |      WHEN 2 THEN ''
      |      WHEN 3 THEN '<html><body>nope'
      |      WHEN 4 THEN 'just text'
      |      WHEN 5 THEN '<html><body>y'
      |      WHEN 6 THEN '<html><body>bad bytes'
      |      ELSE '<html><body>good ' || text END AS html
      |  FROM documents),
      |fb AS (
      |  SELECT doc_id, head, html,
      |    CASE WHEN doc_id % 8 = 6 THEN hex(html) || 'FF'
      |         ELSE hex(html) END AS hx
      |  FROM f),
      |g AS (
      |  SELECT doc_id,
      |    TRY_CAST(regexp_extract(head, '^HTTP/[0-9.]+ ([0-9]{3})', 1)
      |      AS BIGINT) AS status,
      |    lower(trim(regexp_extract(regexp_extract(head,
      |      '(?im)^content-type:\s*([^\r\n]*)', 1), '^([^;]*)', 1))) AS ct,
      |    (regexp_matches(hx, '^(?:[0-7].)*$') OR regexp_matches(hx,
      |      '^(?:[0-7].|(?:C[2-9A-F]|D.)[89AB].|E0[AB].[89AB].|ED[89].[89AB].|E[1-9A-CEF].[89AB].[89AB].|F0[9AB].[89AB].[89AB].|F[1-3][89AB].[89AB].[89AB].|F48.[89AB].[89AB].)*$'))
      |      AS decodable,
      |    NOT (list_contains(al, 'noindex') OR list_contains(al, 'none'))
      |      AS indexable
      |  FROM (
      |    SELECT doc_id, head, hx, list_concat(
      |      list_filter(list_transform(flatten(list_transform(
      |        list_transform(regexp_extract_all(html,
      |          '(?is)(<meta\s[^>]*name\s*=\s*["'']robots["''][^>]*>)', 1),
      |          t -> CASE WHEN regexp_matches(t, '(?i)content\s*=\s*"')
      |                 THEN regexp_extract(t, '(?i)content\s*=\s*"([^"]*)"', 1)
      |                 ELSE regexp_extract(t, '(?i)content\s*=\s*''([^'']*)''', 1)
      |               END),
      |        c -> string_split(lower(c), ','))), x -> trim(x)), x -> x != ''),
      |      list_filter(list_transform(flatten(list_transform(
      |        regexp_extract_all(head, '(?im)^x-robots-tag:\s*([^\r\n]*)', 1),
      |        c -> string_split(lower(c), ','))), x -> trim(x)), x -> x != ''))
      |      AS al
      |    FROM fb)),
      |ed AS (
      |  SELECT 'u' || doc_id AS src,
      |         regexp_extract(head, '(?im)^location:\s*([^\r\n]*)', 1) AS dst
      |  FROM f WHERE doc_id % 8 = 2),
      |walk AS (
      |  WITH RECURSIVE w(src, cur, hops) AS (
      |    SELECT src, dst, 1 FROM ed
      |    UNION ALL
      |    SELECT w.src, e.dst, w.hops + 1 FROM w JOIN ed e ON w.cur = e.src
      |    WHERE w.hops < 8)
      |  SELECT * FROM w),
      |rr AS (
      |  SELECT src, cur AS final_url FROM (
      |    SELECT *, row_number() OVER (PARTITION BY src ORDER BY hops DESC)
      |      AS rn FROM walk) WHERE rn = 1)
      |SELECT stage, n_docs FROM (
      |  SELECT '1_fetched' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM g
      |  UNION ALL SELECT '2_status_ok', CAST(sum(CASE WHEN status = 200
      |    THEN 1 ELSE 0 END) AS BIGINT) FROM g
      |  UNION ALL SELECT '3_html', CAST(sum(CASE WHEN status = 200
      |    AND ct = 'text/html' THEN 1 ELSE 0 END) AS BIGINT) FROM g
      |  UNION ALL SELECT '4_decodable', CAST(sum(CASE WHEN status = 200
      |    AND ct = 'text/html' AND decodable THEN 1 ELSE 0 END) AS BIGINT) FROM g
      |  UNION ALL SELECT '5_indexable', CAST(sum(CASE WHEN status = 200
      |    AND ct = 'text/html' AND decodable AND indexable THEN 1 ELSE 0 END)
      |    AS BIGINT) FROM g
      |  UNION ALL SELECT '6_redirects_resolved', CAST(sum(CASE WHEN
      |    final_url NOT IN (SELECT src FROM ed) THEN 1 ELSE 0 END) AS BIGINT)
      |    FROM rr)
      |ORDER BY stage""".stripMargin) { (s, dir) =>
    val m8 = col("doc_id") % 8
    val head = when(m8 === 2, concat(
      lit("HTTP/1.1 301 Moved Permanently\r\nLocation: u"), col("doc_id") + 8))
      .when(m8 === 3, lit("HTTP/1.1 404 Not Found\r\nContent-Type: text/html"))
      .when(m8 === 4, lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain"))
      .when(m8 === 5, lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "X-Robots-Tag: noindex"))
      .otherwise(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8"))
    val html = when(m8 === 0, concat(lit("<html><body>plain page "), col("text")))
      .when(m8 === 1, lit("<html><head><meta name=\"robots\" " +
        "content=\"noindex\"></head><body>x"))
      .when(m8 === 2, lit(""))
      .when(m8 === 3, lit("<html><body>nope"))
      .when(m8 === 4, lit("just text"))
      .when(m8 === 5, lit("<html><body>y"))
      .when(m8 === 6, lit("<html><body>bad bytes"))
      .otherwise(concat(lit("<html><body>good "), col("text")))
    val fixture = t(s, dir, "documents").select(col("doc_id"),
      head.as("head"), html.as("html"),
      when(m8 === 6,
        unhex(concat(upper(hex(html.cast("binary"))), lit("FF"))))
        .otherwise(html.cast("binary")).as("bytes"))
    val heads = WebOps.httpHead(
      fixture.select(col("doc_id"), col("head").as("raw")), "raw", "doc_id")
      .select(col("doc_id"), col("status"), col("content_type").as("ct"))
    // decodable = structural validity (is_ascii OR utf8_valid), the exact
    // predicate the oracle computes — NOT the charset label, whose BOM
    // branch would accept an EFBBBF prefix with invalid bytes after it
    val cs = WebOps.charsetSniff(fixture, "bytes", "doc_id")
      .select(col("doc_id"),
        (col("is_ascii") || col("utf8_valid")).as("body_ok"))
    val rm = WebOps.robotsMeta(fixture, "html", "head", "doc_id")
      .select(col("doc_id"), col("indexable"))
    val g = heads.join(cs, "doc_id").join(rm, "doc_id")
    val s200 = col("status") === 200
    val sHtml = s200 && col("ct") === "text/html"
    val sDec = sHtml && col("body_ok")
    val sIdx = sDec && col("indexable")
    val funnel = g.agg(
      count(lit(1)).as("n1"),
      sum(when(s200, 1L).otherwise(0L)).as("n2"),
      sum(when(sHtml, 1L).otherwise(0L)).as("n3"),
      sum(when(sDec, 1L).otherwise(0L)).as("n4"),
      sum(when(sIdx, 1L).otherwise(0L)).as("n5"))
      .selectExpr("stack(5, '1_fetched', n1, '2_status_ok', n2, " +
        "'3_html', n3, '4_decodable', n4, '5_indexable', n5) " +
        "AS (stage, n_docs)")
    val edges = fixture.where(m8 === 2).select(
      concat(lit("u"), col("doc_id")).as("src"),
      regexp_extract(col("head"), "(?im)^location:\\s*([^\\r\\n]*)", 1)
        .as("dst"))
    val rr = WebOps.resolveRedirects(edges, "src", "dst", doublingRounds = 3)
      .agg(sum(when(col("resolved"), 1L).otherwise(0L)).as("n_docs"))
      .select(lit("6_redirects_resolved").as("stage"), col("n_docs"))
    funnel.unionAll(rr).orderBy("stage")
  }
}
