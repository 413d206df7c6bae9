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

/** Dedup family: exact, minhash/LSH, simhash, embedding near-dup,
  * PPJoin similarity joins, span/substring dedup, URL dedup,
  * containment, decontamination. */
private[graft] trait DedupQueries extends RegistryBase {


  // Exact dedup: hash-groupBy on the normalized-text fingerprint.
  register(
    "d1_dedup_exact",
    """SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
      |       count(*) AS n_docs, min(doc_id) AS canonical_id
      |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
    Dedup.exactGroups(t(s, dir, "documents"), "text", "doc_id")
  }


  // MinHash+LSH near-dup: shingle -> signature -> band-bucket join -> exact
  // Jaccard verify. LSH bucketing is not ANSI-SQL-expressible -> rows-only.
  registerNoOracle("d2_dedup_minhash_lsh") { (s, dir) =>
    // 8 bands × 4 rows: band-collision prob j^4 — near-random pairs
    // (baseline jaccard ~0.03 on this corpus) generate ~zero candidates
    // while planted near-dups (j>0.9) are caught with ~certainty
    Dedup.minhashNearDups(t(s, dir, "documents"), "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
  }


  // Incremental near-dup (the 100 TB operating mode): even doc_ids act as
  // the staged corpus signature store, odd doc_ids as the arriving batch —
  // only the batch is shingled/signed; cross-batch dups surface via the
  // bucket join against the store.
  registerNoOracle("d2b_dedup_incremental") { (s, dir) =>
    val d = t(s, dir, "documents")
    val (storeShingles, storeBuckets) = Dedup.minhashStages(
      d.where(col("doc_id") % 2 === 0), "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8)
    Dedup.minhashNearDupsAgainstStore(
      d.where(col("doc_id") % 2 === 1), "text", "doc_id",
      storeShingles, storeBuckets,
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy("id_new", "id_store")
  }


  // MinHash+LSH, hash-matched: the mm_phash trick applied to the minhash
  // pipeline (see docPrefixed). The REAL shingle→signature→band-bucket→
  // exact-verify pipeline has exactly one SQL-expressible answer: the
  // planted pairs — identical shingle sets collide in every band with
  // certainty, and no other pair reaches the 0.5 verify threshold.
  // Converts the approximate family's core operator from rows-only to a
  // full hash match (d2 keeps the realistic corpus).
  register(
    "d2c_dedup_minhash_planted",
    """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
      |       CAST(1.0 AS DOUBLE) AS jaccard
      |FROM documents WHERE doc_id % 97 = 0 ORDER BY id_a""".stripMargin) { (s, dir) =>
    Dedup.minhashNearDups(docPlantedCorpus(t(s, dir, "documents")), "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy("id_a")
  }


  // The INCREMENTAL store mode, hash-matched: the staged corpus is the
  // prefixed documents table, the arriving batch is the planted copies —
  // the bipartite bucket join against the store can only pair each copy
  // with its source (jaccard 1 vs 0 for everything else), so the exact
  // output is SQL-computable. Proves the *AgainstStore path (d2b keeps the
  // realistic even/odd split) with a real hash oracle.
  register(
    "d2d_incremental_planted",
    """SELECT doc_id + 1000000 AS id_new, doc_id AS id_store,
      |       CAST(1.0 AS DOUBLE) AS jaccard
      |FROM documents WHERE doc_id % 97 = 0 ORDER BY id_new""".stripMargin) { (s, dir) =>
    val prefixed = docPrefixed(t(s, dir, "documents"))
    val (storeShingles, storeBuckets) = Dedup.minhashStages(prefixed,
      "text", "doc_id", shingleWords = 2, numHashes = 32, bands = 8)
    val batch = prefixed.where(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    Dedup.minhashNearDupsAgainstStore(batch, "text", "doc_id",
      storeShingles, storeBuckets, shingleWords = 2, numHashes = 32, bands = 8,
      threshold = 0.5).orderBy("id_new")
  }


  // MinHash recall on the REALISTIC corpus, hash-pinned — the d3c
  // construction applied to the minhash pipeline. d2c proves the pipeline
  // on planted byte-identical pairs; this row bounds its recall on the
  // corpus's organic near-dups: DuckDB brute-forces the exact 2-gram
  // Jaccard >= 0.7 pair count (id-bounded to doc_id < 500 so the ground
  // truth stays O(1) in corpus size; the whole corpus at correctness SFs)
  // and constant-folds the claim to TRUE; Spark computes the same exact
  // count plus containment of those pairs in d2's band-bucket output. The
  // signature permutations are seeded, so measured recall is deterministic
  // and the bound CLAIM hash-compares — a banding/signature regression
  // flips the bool and fails the hash. The all-pairs join is the
  // VERIFICATION harness at test SF; the scale path is d2 itself.
  register(
    "d2e_minhash_recall_bound",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents WHERE doc_id < 500),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks)
      |SELECT CAST(count(*) AS BIGINT) AS exact_pairs, TRUE AS recall_floor_met
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
      |      len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.7""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
    // shared cached harness ([[exactJaccardPairs]]): the J >= 0.7 set is
    // the j-filtered subset of the J >= 0.5 ground truth d3c also reads
    val exact = exactJaccardPairs(s, dir)
      .where(col("j") >= 0.7)
      .select("id_a", "id_b")
    val found = Dedup.minhashNearDups(d, "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
      .select(col("id_a"), col("id_b"), lit(1).as("__found"))
    exact.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("__exact"), sum(coalesce(col("__found"), lit(0))).as("__hit"))
      .select(col("__exact").cast("long").as("exact_pairs"),
        // the corpus's organic near-dups all sit at J >= 0.9, where banding
        // theory (8 bands × 4 rows) detects with prob 1-(1-0.9^4)^8 ≈
        // 0.9998 — measured recall is 1.0 at sf0.001/sf0.01 for 3+ rounds;
        // floor 0.95 per the house stability rule (within 0.05 of worst
        // measured once stable 2+ rounds — the ivf/d5e precedent).
        // coalesce: empty ground truth → vacuous-true on both engines
        coalesce(col("__hit").cast("double") / col("__exact") >= 0.95, lit(true))
          .as("recall_floor_met"))
  }


  // End-to-end near-dup corpus dedup on the planted corpus: pairs →
  // connected components → keep-one. Same doc-unique-prefix construction
  // as d2c, so the expected clusters are exact: each planted copy joins
  // its source's cluster (labeled by the min id = the source) and is
  // dropped; every other doc is its own kept cluster.
  register(
    "d9_drop_near_duplicates",
    """SELECT doc_id AS id, doc_id AS cluster_id, TRUE AS keep FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS id, doc_id AS cluster_id, FALSE AS keep
      |FROM documents WHERE doc_id % 97 = 0
      |ORDER BY id""".stripMargin) { (s, dir) =>
    Dedup.dropNearDuplicates(docPlantedCorpus(t(s, dir, "documents")), "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy("id")
  }


  // Canonical selection by QUALITY: same planted corpus, but score = doc_id
  // makes each planted copy (id + 1,000,000) the best-scoring cluster
  // member — the keep verdict FLIPS relative to d9 (copy kept, source
  // dropped), which is exactly what proves the score path: a text-derived
  // score would tie on the byte-identical pair and fall back to d9's
  // min-id answer.
  register(
    "d12_keep_best_quality",
    """SELECT doc_id AS id, doc_id AS cluster_id,
      |       doc_id % 97 <> 0 AS keep
      |FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS id, doc_id AS cluster_id, TRUE AS keep
      |FROM documents WHERE doc_id % 97 = 0
      |ORDER BY id""".stripMargin) { (s, dir) =>
    Dedup.dropNearDuplicatesKeepBest(
      docPlantedCorpus(t(s, dir, "documents")), "text", "doc_id",
      scoreCol = col("doc_id"),
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy("id")
  }


  // Corpus snapshot diff: snapshot B derives deterministically from the
  // documents table — every doc_id % 7 == 0 removed, % 11 == 0 rewritten
  // (changed), % 13 == 0 re-added under id+1,000,000 (added; the %7
  // deletions win where they overlap) — so all four statuses are
  // genuinely exercised. The operator joins (id, md5) fingerprints only.
  register(
    "d13_snapshot_diff",
    """WITH b AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END
      |           AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text
      |  FROM documents WHERE doc_id % 13 = 0),
      |j AS (
      |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |         md5(a.text) AS ha, md5(b.text) AS hb
      |  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      |SELECT doc_id,
      |       CASE WHEN ha IS NULL THEN 'added'
      |            WHEN hb IS NULL THEN 'removed'
      |            WHEN ha = hb THEN 'unchanged'
      |            ELSE 'changed' END AS status
      |FROM j ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "documents")
    val b = a.where(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionByName(a.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    Dedup.snapshotDiff(a, b, "doc_id", "text").orderBy("doc_id")
  }


  // Winnowing (MOSS) near-dup candidates: deterministic fingerprint
  // selection, so — unlike the minhash/simhash family — the REALISTIC
  // corpus run is exactly SQL-expressible, star cap and all. Window
  // minima compare md5 hex strings lexicographically on both engines.
  register(
    "d10_winnowing",
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, list_transform(generate_series(0, len(t) - 3),
      |           i -> md5(array_to_string(t[i+1:i+3], ' '))) AS grams
      |  FROM w WHERE len(t) >= 3),
      |fps AS (
      |  SELECT DISTINCT doc_id, fp FROM (
      |    SELECT doc_id, unnest(list_distinct(list_transform(
      |             generate_series(0, greatest(len(grams) - 4, 0)),
      |             i -> list_min(grams[i+1:i+4])))) AS fp
      |    FROM g)),
      |rk AS (
      |  SELECT fp, doc_id AS id,
      |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |  FROM fps)
      |SELECT DISTINCT x.id AS id_a, y.id AS id_b
      |FROM rk x JOIN rk y
      |  ON x.fp = y.fp AND x.id < y.id AND (y.rn <= 64 OR x.rn = 1)
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Dedup.winnowingCandidates(t(s, dir, "documents"), "text", "doc_id",
      k = 3, window = 4, maxBucketPairing = 64)
      .orderBy("id_a", "id_b")
  }


  // The MOSS guarantee pinned as a row (d10's recall-bound companion —
  // winnowing is DETERMINISTIC, so the guarantee is exactly oracled, not
  // floor-bounded like d2e/d3c): any shared token run of length >=
  // window + k - 1 (= 6 here) MUST share a selected fingerprint
  // (Schleimer, Wilkerson & Aiken 2003, thm in §3). Doc-unique token
  // prefixes make every non-planted gram globally unique (zero background
  // pairs at any SF), while each planted twin copies its base's first 8
  // tokens — an 8 >= 6 run, so the candidate join must surface EXACTLY
  // the planted pairs. A selection/windowing regression that drops a
  // guaranteed fingerprint loses a pair and fails the hash.
  register(
    "d10b_winnowing_guarantee",
    """WITH t AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(lower(text), '\s+'),
      |        x -> x != '')) AS n
      |  FROM documents)
      |SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
      |FROM t WHERE doc_id % 37 = 0 AND n >= 8
      |ORDER BY id_a""".stripMargin) { (s, dir) =>
    val withN = t(s, dir, "documents").select(col("doc_id"),
      size(TextAnalysis.tokens(lower(col("text")))).as("n"))
    def uniqRun(prefix: String, count: Column): Column =
      concat_ws(" ", transform(sequence(lit(1), count),
        j => concat(lit(prefix), col("doc_id"), lit("w"), j)))
    val baseDocs = withN.select(col("doc_id"),
      uniqRun("d", greatest(col("n"), lit(1))).as("text"))
    // two selects: with the id-shift aliased AS doc_id in the same
    // projection, Spark 4's lateral column alias resolution would shadow
    // the INPUT doc_id inside the text expression (planted tokens would
    // not match their base's)
    val plantedDocs = withN
      .where(col("doc_id") % 37 === 0 && col("n") >= 8)
      .select(col("doc_id"),
        concat_ws(" ", uniqRun("d", lit(8)), uniqRun("p", lit(5))).as("text"))
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    Dedup.winnowingCandidates(baseDocs.unionByName(plantedDocs),
        "text", "doc_id", k = 3, window = 4)
      .orderBy("id_a", "id_b")
  }


  // SimHash near-dup: 64-bit fingerprint, hamming <= 6, chunk-bucketed.
  registerNoOracle("d3_dedup_simhash") { (s, dir) =>
    Dedup.simhashNearDups(t(s, dir, "documents"), "text", "doc_id", maxDist = 6)
  }


  // SimHash, hash-matched: the d2c construction again. Doc-unique token
  // prefixes make every distinct pair's token sets disjoint, so their
  // 64-bit fingerprints are independent random draws — P(hamming <= 6)
  // ~4e-12 per pair, i.e. ZERO non-planted pairs pass the verify at any
  // test SF — while the planted byte-identical copies fingerprint to the
  // SAME 64 bits (hamming 0, all four pigeonhole chunks collide, detection
  // certain). The real fingerprint→chunk-bucket→exact-hamming pipeline thus
  // has exactly one SQL-expressible answer: the planted pairs at distance 0.
  register(
    "d3b_dedup_simhash_planted",
    """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, 0 AS hamming
      |FROM documents WHERE doc_id % 97 = 0 ORDER BY id_a""".stripMargin) { (s, dir) =>
    Dedup.simhashNearDups(docPlantedCorpus(t(s, dir, "documents")), "text", "doc_id",
      maxDist = 6).orderBy("id_a")
  }


  // The q16b pattern for d3's REALISTIC corpus (d3b proves the planted
  // one): simhash is approximate in WHICH candidate pairs it surfaces, but
  // its recall against the exact high-Jaccard ground truth is a
  // deterministic number (seeded token hashing, no randomness), so the
  // bound CLAIM hash-compares. DuckDB brute-forces the exact 2-gram
  // Jaccard >= 0.5 pair count (the d4 gram conventions) and constant-folds
  // the claim to TRUE; Spark computes the same exact count plus the actual
  // containment of those pairs in d3's hamming<=6 output. A recall
  // regression in the fingerprint/bucket/verify pipeline flips the bool
  // and fails the hash. The all-pairs join is the VERIFICATION harness at
  // test SF, not the scale path — the scale path is d3 itself; the ground
  // truth is id-bounded to doc_id < 500 (the whole corpus at the
  // correctness SFs, a fixed slice at larger ones) so the brute force
  // stays O(1) in corpus size while simhash still runs full-corpus.
  register(
    "d3c_simhash_recall_bound",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents WHERE doc_id < 500),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks)
      |SELECT CAST(count(*) AS BIGINT) AS exact_pairs, TRUE AS recall_floor_met
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
      |      len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.5""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
    // shared cached harness ([[exactJaccardPairs]]) — d2e filters the
    // same ground truth to its higher threshold
    val exact = exactJaccardPairs(s, dir).select("id_a", "id_b")
    val sim = Dedup.simhashNearDups(d, "text", "doc_id", maxDist = 6)
      .select(col("id_a"), col("id_b"), lit(1).as("__found"))
    exact.join(sim, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("__exact"), sum(coalesce(col("__found"), lit(0))).as("__hit"))
      .select(col("__exact").cast("long").as("exact_pairs"),
        // measured recall is 0.92-0.93 at sf0.001/sf0.01, DETERMINISTIC and
        // stable 3+ rounds — floor 0.87 = within 0.05 of worst measured
        // (the d2e/d5e stability rule; no drift margin applies to a
        // deterministic pipeline).
        // coalesce: empty ground truth → 0/0 → NULL would hash-mismatch the
        // oracle's constant TRUE; degrade to vacuous-true on both engines
        coalesce(col("__hit").cast("double") / col("__exact") >= 0.87, lit(true))
          .as("recall_floor_met"))
  }


  // n-gram Jaccard: the exact verifier over adjacent-id document pairs.
  register(
    "d4_ngram_jaccard",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks)
      |SELECT a.doc_id AS id, round(len(list_intersect(a.s, b.s))::DOUBLE /
      |       len(list_distinct(list_concat(a.s, b.s))), 6) AS j
      |FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id ORDER BY id""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
    val paired = d.as("a").join(d.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
      .select(col("a.doc_id").as("id"), col("a.text").as("ta"), col("b.text").as("tb"))
    paired.select(col("id"),
      round(Dedup.ngramJaccardPairs(paired, "ta", "tb", shingleWords = 2), 6).as("j"))
      .orderBy("id")
  }


  // Asymmetric containment C(A->B) = |A∩B|/|A| — the subset-duplication
  // detector symmetric Jaccard structurally misses (a short doc fully
  // quoted in a long one has J ≈ 0 but C = 1). Realistic rows: adjacent
  // doc pairs, both directions + J for contrast; planted rows: each
  // doc's own 8-token prefix vs the full doc, where C(prefix->doc) MUST
  // be exactly 1.0 while C(doc->prefix) and J stay fractional — the
  // asymmetry proven in the same hash-matched result.
  register(
    "d18_containment",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)),
      |                                      i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks),
      |psh AS (
      |  SELECT doc_id, CASE WHEN least(len(t), 8) >= 2
      |    THEN list_distinct(list_transform(range(1, least(len(t), 8)),
      |                                      i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t[1 : 8], ' ')] END AS s
      |  FROM toks),
      |realistic AS (
      |  SELECT a.doc_id AS id,
      |    round(len(list_intersect(a.s, b.s))::DOUBLE / len(a.s), 6) AS c_ab,
      |    round(len(list_intersect(a.s, b.s))::DOUBLE / len(b.s), 6) AS c_ba,
      |    round(len(list_intersect(a.s, b.s))::DOUBLE /
      |          len(list_distinct(list_concat(a.s, b.s))), 6) AS j
      |  FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id),
      |planted AS (
      |  SELECT p.doc_id + 1000000 AS id,
      |    round(len(list_intersect(p.s, f.s))::DOUBLE / len(p.s), 6) AS c_ab,
      |    round(len(list_intersect(p.s, f.s))::DOUBLE / len(f.s), 6) AS c_ba,
      |    round(len(list_intersect(p.s, f.s))::DOUBLE /
      |          len(list_distinct(list_concat(p.s, f.s))), 6) AS j
      |  FROM psh p JOIN sh f USING (doc_id))
      |SELECT id, c_ab, c_ba, j FROM realistic
      |UNION ALL SELECT id, c_ab, c_ba, j FROM planted
      |ORDER BY id""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
    val paired = d.as("a").join(d.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
      .select(col("a.doc_id").as("id"), col("a.text").as("ta"),
        col("b.text").as("tb"))
    def row(df: DataFrame): DataFrame = {
      val sa = Dedup.wordShingles(col("ta"), 2)
      val sb = Dedup.wordShingles(col("tb"), 2)
      df.select(col("id"),
        round(Dedup.containment(sa, sb), 6).as("c_ab"),
        round(Dedup.containment(sb, sa), 6).as("c_ba"),
        round(Dedup.jaccard(sa, sb), 6).as("j"))
    }
    val planted = d.select((col("doc_id") + 1000000).as("id"),
      concat_ws(" ",
        slice(TextAnalysis.tokens(lower(col("text"))), 1, 8)).as("ta"),
      col("text").as("tb"))
    row(paired).unionAll(row(planted)).orderBy("id")
  }


  // EXACT similarity join via prefix filtering (AllPairs/PPJoin): every
  // pair with bigram-shingle Jaccard >= 0.8, no candidate-recall loss —
  // the deterministic complement to d2's minhash path, so the oracle is
  // the full quadratic ground truth (tractable in DuckDB at oracle SF;
  // the Spark side runs the prefix-filtered plan, never the all-pairs
  // join, and must produce the IDENTICAL pair set to hash-match).
  // 0.8 is the operator's intended high-similarity regime: the synthetic
  // corpus's templated bigrams make moderate thresholds adversarial for
  // prefix filtering (τ=0.6 leaves 2.4M of 12.5M pairs as candidates at
  // sf0.1; τ=0.8 prunes to the true near-dup structure) — below ~0.7 on
  // such corpora the minhash band join (d2) is the scale path, which the
  // similarityJoin Scaladoc states.
  register(
    "d14_similarity_join",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |         len(list_intersect(a.s, b.s))::DOUBLE /
      |         len(list_distinct(list_concat(a.s, b.s))) AS j
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, round(j, 6) AS jaccard
      |FROM pairs WHERE j >= 0.8 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Dedup.similarityJoin(t(s, dir, "documents"), "text", "doc_id",
        shingleWords = 2, threshold = 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }


  // The incremental twin, fully oracled (exactness makes that possible —
  // the probabilistic incremental rows d2b/d5f settle for planted twins):
  // docs < 250 found the staged store and FREEZE the canonical token
  // order; docs >= 250 arrive as the new batch and join bipartite
  // against the store, with unseen tokens ranking at frozen-df 0. The
  // oracle is the quadratic bipartite ground truth.
  register(
    "d15_similarity_join_incremental",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks),
      |pairs AS (
      |  SELECT b.doc_id AS id_new, a.doc_id AS id_store,
      |         len(list_intersect(a.s, b.s))::DOUBLE /
      |         len(list_distinct(list_concat(a.s, b.s))) AS j
      |  FROM sh a JOIN sh b ON a.doc_id < 250 AND b.doc_id >= 250)
      |SELECT id_new, id_store, round(j, 6) AS jaccard
      |FROM pairs WHERE j >= 0.8 ORDER BY id_new, id_store""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val (freqPlan, sortedPlan) = Dedup.similarityStages(
      docs.where(col("doc_id") < 250), "text", "doc_id", shingleWords = 2)
    // materialize the stages like the parquet-staged store they stand in
    // for: the prefix AND verify branches both read the store side, and
    // an unmaterialized plan would recompute the shingle scan twice
    val (freq, sorted) = (freqPlan.localCheckpoint(), sortedPlan.localCheckpoint())
    Dedup.similarityJoinAgainstStore(docs.where(col("doc_id") >= 250),
        "text", "doc_id", freq, sorted, shingleWords = 2, threshold = 0.8)
      .select(col("id_new"), col("id_store"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_new", "id_store")
  }


  // Embedding-cosine near-dup (exact verify path over adjacent pairs; the
  // LSH-bucketed variant is d5b below).
  register(
    "d5_embedding_cosine",
    """SELECT a.vec_id AS id,
      |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
      |ORDER BY id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    e.as("a").join(e.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.vec_id").as("id"),
        round(Dedup.cosine(col("a.embedding"), col("b.embedding")), 6).as("cos"))
      .orderBy("id")
  }


  // Hyperplane-LSH bucketed embedding near-dup (the 100 TB scale path).
  registerNoOracle("d5b_embedding_lsh_neardup") { (s, dir) =>
    // synthetic embeddings are near-orthogonal (max pairwise cos ~0.3), so
    // the "near-dup" bar is set to the top of that range
    Dedup.embeddingNearDups(t(s, dir, "embeddings"), "embedding", "vec_id",
      planes = 6, threshold = 0.2)
  }


  // Banded (OR-amplified) hyperplane LSH with its recall hash-pinned — the
  // d3c pattern over embeddings. d5b's single 6-bit signature needs all
  // signs to agree, so realistic-corpus recall at cos>=0.2 is ~4%; 16
  // bands of 4 planes lift the theoretical pair-recall to 1-(1-p^4)^16
  // ~0.8 at the same bucket-join shape. The hyperplanes are seeded, so the
  // measured recall against brute-force ground truth is deterministic and
  // the bound claim hash-compares: DuckDB computes the exact cos>=0.2 pair
  // count (id-bounded to vec_id < 500, the whole corpus at correctness
  // SFs) and constant-folds TRUE; Spark additionally checks containment in
  // the banded output. The all-pairs side is the VERIFICATION harness;
  // the scale path is the band join itself.
  register(
    "d5e_embedding_banded_recall",
    """WITH gt AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE a.vec_id < 500 AND b.vec_id < 500
      |    AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.2)
      |SELECT CAST(count(*) AS BIGINT) AS exact_pairs, TRUE AS recall_floor_met
      |FROM gt""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    // id-bounded brute-force ground truth, cached per (session, sf) like
    // the d2e/d3c harness — the banded pipeline below still runs per rep
    val exact = cachedHarness(s, dir, "cos_pairs_500") {
      // materialize + spread the sliced vectors: the inequality pair join
      // is a nested loop that would otherwise re-read one split serially
      val slice = e.where(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
        .repartition(32).localCheckpoint()
      slice.as("a").join(slice.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          round(Dedup.cosine(col("a.embedding"), col("b.embedding")), 6).as("cos"))
        .where(col("cos") >= 0.2)
        .select("id_a", "id_b")
    }
    val found = Dedup.embeddingNearDupsBanded(e, "embedding", "vec_id",
      bands = 16, planesPerBand = 4, threshold = 0.2)
      .select(col("id_a"), col("id_b"), lit(1).as("__found"))
    exact.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("__exact"), sum(coalesce(col("__found"), lit(0))).as("__hit"))
      .select(col("__exact").cast("long").as("exact_pairs"),
        // measured recall 0.849-0.857 at sf0.001/sf0.01 (deterministic,
        // theory ~0.82 for cos 0.2 at 16 bands x 4 planes); floor 0.8 sits
        // within 0.05 of the worst measurement (r8 shipped 0.7; tightened
        // after a second round of stable measurements). coalesce: empty
        // ground truth → vacuous-true on both engines, not a NULL mismatch
        coalesce(col("__hit").cast("double") / col("__exact") >= 0.8, lit(true))
          .as("recall_floor_met"))
  }


  // The banded index's INCREMENTAL mode, hash-matched — the d2d
  // construction over embeddings: the staged store is the corpus's banded
  // (id, v) + (id, band, sig) stages, the arriving batch is byte-identical
  // copies of every 7th vector under id + 1,000,000. A copy shares every
  // band signature with its source (detection certain, cos exactly 1.0)
  // while the near-orthogonal rest of the corpus stays far below the 0.9
  // threshold, so the bipartite new-vs-store join has exactly one
  // SQL-expressible answer. Proves the *AgainstStore path of the banded
  // family (d5e pins the full-corpus recall).
  register(
    "d5f_banded_incremental_planted",
    """SELECT vec_id + 1000000 AS id_new, vec_id AS id_store,
      |       CAST(1.0 AS DOUBLE) AS cos
      |FROM embeddings WHERE vec_id % 7 = 0 ORDER BY id_new""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val (storeBase, storeBuckets) = Dedup.embeddingStagesBanded(
      e.select(col("vec_id"), col("embedding")), "embedding", "vec_id",
      bands = 16, planesPerBand = 4)
    val batch = e.where(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    Dedup.embeddingNearDupsBandedAgainstStore(batch, "embedding", "vec_id",
      storeBase, storeBuckets, bands = 16, planesPerBand = 4, threshold = 0.9)
      .orderBy("id_new")
  }


  // Embedding-LSH near-dup, hash-matched: byte-identical copies of every
  // 7th vector planted under id + 1,000,000. Identical vectors share every
  // hyperplane sign (same bucket, detection certain) and cosine 1.0, while
  // the near-orthogonal rest of the corpus stays far below the 0.9
  // threshold — the real signature→bucket-join→cosine-verify pipeline has
  // exactly one SQL-expressible answer (d5b keeps the realistic corpus).
  register(
    "d5c_embedding_lsh_planted",
    """SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
      |       CAST(1.0 AS DOUBLE) AS cos
      |FROM embeddings WHERE vec_id % 7 = 0 ORDER BY id_a""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val corpus = e.select(col("vec_id"), col("embedding")).unionAll(
      e.where(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
    Dedup.embeddingNearDups(corpus, "embedding", "vec_id",
      planes = 6, threshold = 0.9)
      .orderBy("id_a")
  }


  // Edit-distance verification (the character-level complement to n-gram
  // Jaccard for SHORT strings — titles, names, URLs — where shingles are
  // too coarse): Levenshtein over adjacent-id document pairs, normalized
  // by the longer length at 6 dp. Classic DP is engine-identical;
  // per-pair O(len²) work stays scan-side.
  register(
    "d16_edit_distance",
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
      |       round(CAST(levenshtein(a.text, b.text) AS DOUBLE) /
      |             greatest(len(a.text), len(b.text)), 6) AS norm_dist
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |ORDER BY id_a""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
    d.as("a").join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        levenshtein(col("a.text"), col("b.text")).cast("long").as("dist"),
        round(levenshtein(col("a.text"), col("b.text")).cast("double") /
          greatest(length(col("a.text")), length(col("b.text"))), 6)
          .as("norm_dist"))
      .orderBy("id_a")
  }


  // Semantic (embedding-space) test-set decontamination: the benchmark
  // slice (vec_id < 5) broadcasts with precomputed norms; every training
  // vector takes its max cosine against it, pre-combined map-side —
  // paraphrased benchmark leakage the lexical tiers (t8/t8b/t33) miss.
  // Planted copies of the benchmark vectors (ids + 1,000,000, cos 1.0 by
  // construction) MUST be flagged, so the drop verdict is hash-proven
  // alongside the realistic rows (the near-orthogonal corpus keeps its
  // honest max-cos ~0.3, all kept).
  register(
    "d17_semantic_decontaminate",
    """WITH bench AS (SELECT embedding AS bv FROM embeddings WHERE vec_id < 5),
      |train AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT t.vec_id,
      |         max(round(list_cosine_similarity(t.embedding::DOUBLE[],
      |                                          b.bv::DOUBLE[]), 6)) AS max_bench_cos
      |  FROM train t CROSS JOIN bench b GROUP BY t.vec_id)
      |SELECT vec_id, max_bench_cos, max_bench_cos < 0.95 AS keep
      |FROM scored ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val train = e.select(col("vec_id"), col("embedding")).unionAll(
      e.where(col("vec_id") < 5)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
    val bench = e.where(col("vec_id") < 5).select(col("embedding"))
    Dedup.semanticDecontaminate(train, bench, "vec_id", "embedding",
        "embedding", threshold = 0.95)
      .orderBy("vec_id")
  }


  // URL-keyed dedup — canonicalize, group, keep the smallest doc_id: the
  // first dedup tier of every web-corpus pipeline (crawls re-fetch the
  // same page under www/port/tracking-param/fragment noise). The
  // construction plants exactly that noise: doc_id % 50 picks the true
  // page, doc_id % 4 the noise variant, so each canonical key collapses
  // ~10 fetches to one keeper. Hash oracle over (doc_id, canon, keep).
  /** The d22 exact-substring clean chain (Lee et al. 2022 cut) over a
    * relation `rel(doc_id, <textExpr>)` — emits `toks(doc_id, t)` and
    * `agg(doc_id, clean_text, n_kept)`; consumers LEFT JOIN `agg` onto
    * `toks` (a fully-cut doc has no `agg` row). Shared by d22 and the
    * p12 composite. */
  private[graft] def substringCleanSql(rel: String, textExpr: String): String =
    s"""toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower($textExpr), '\\s+'), x -> x != '') AS t
      |  FROM $rel),
      |g AS (
      |  SELECT doc_id,
      |         CAST(unnest(range(1, greatest(len(t) - 6, 1))) AS BIGINT) - 1 AS pos,
      |         unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
      |           i -> md5(array_to_string(t[i:i+7], ' ')))) AS gh
      |  FROM toks),
      |rep AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
      |cov AS (SELECT g.doc_id, g.pos, g.pos + 7 AS e FROM g JOIN rep USING (gh)),
      |m AS (SELECT doc_id, pos, e,
      |        max(e) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |      FROM cov),
      |f AS (SELECT doc_id, pos, e,
      |        CASE WHEN pm IS NULL OR pos > pm + 1 THEN 1 ELSE 0 END AS nw
      |      FROM m),
      |gr AS (SELECT doc_id, pos, e,
      |         sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM f),
      |sp AS (SELECT doc_id, min(pos) AS s, max(e) AS e2
      |       FROM gr GROUP BY doc_id, grp),
      |cpos AS (SELECT doc_id, unnest(range(s, e2 + 1)) AS pos FROM sp),
      |dt AS (SELECT doc_id, unnest(t) AS tok,
      |              CAST(generate_subscripts(t, 1) AS BIGINT) - 1 AS pos
      |       FROM toks),
      |kept AS (
      |  SELECT dt.doc_id, dt.tok, dt.pos FROM dt
      |  ANTI JOIN cpos ON cpos.doc_id = dt.doc_id AND cpos.pos = dt.pos),
      |agg AS (
      |  SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS clean_text,
      |         count(*) AS n_kept
      |  FROM kept GROUP BY doc_id)""".stripMargin

  /** URL canonicalization chain over a CTE `raw(doc_id, url)` — emits
    * `c(doc_id, canon)`. Shared by d19 and the p12 composite so both
    * engines provably canonicalize identically. */
  private[graft] val urlCanonSql: String =
    """s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag
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
      |       FROM s4),
      |c AS (SELECT doc_id,
      |        CASE WHEN scheme = '' THEN url
      |             ELSE scheme || '://' || host || path ||
      |                  CASE WHEN len(joined) > 0 THEN '?' || joined
      |                       ELSE '' END END AS canon
      |      FROM s5)""".stripMargin

  register(
    "d19_url_dedup",
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN 'https://www.site' || (doc_id % 50) || '.com/page/'
      |      WHEN 1 THEN 'HTTPS://Site' || (doc_id % 50) || '.com:443/page'
      |      WHEN 2 THEN 'https://site' || (doc_id % 50) || '.com/page?utm_k=9'
      |      ELSE 'https://site' || (doc_id % 50) || '.com/page#sec2' END AS url
      |  FROM documents),
      |""".stripMargin + urlCanonSql + """
      |SELECT doc_id, canon,
      |       doc_id = min(doc_id) OVER (PARTITION BY canon) AS keep
      |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val raw = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(lit("https://www.site"), col("doc_id") % 50, lit(".com/page/")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("HTTPS://Site"), col("doc_id") % 50, lit(".com:443/page")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://site"), col("doc_id") % 50,
            lit(".com/page?utm_k=9")))
        .otherwise(concat(lit("https://site"), col("doc_id") % 50,
          lit(".com/page#sec2"))).as("url"))
    val canon = raw.select(col("doc_id"),
      TextAnalysis.canonicalizeUrl(col("url")).as("canon"))
    canon.withColumn("keep",
        col("doc_id") === min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("canon")))
      .orderBy("doc_id")
  }


  // Variable-length exact-substring dedup (Lee et al. 2022 suffix-array
  // semantics, relational form): flag every token inside a >= 8-token
  // substring occurring >= 2 times corpus-wide, at ANY offset and ANY
  // length — the tier d8's fixed chunk grid cannot express. The oracle
  // recomputes the IDENTICAL algebra (positional md5 8-gram anchors →
  // global repeat filter → per-doc interval union), so the organic run
  // is hash-proven END-TO-END; d20b proves the extension boundaries
  // analytically. Both engines zip two equal-length unnests / one
  // posexplode — integer positions and md5 strings only.
  register(
    "d20_repeated_substrings",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |         CAST(unnest(range(1, greatest(len(t) - 6, 1))) AS BIGINT) - 1 AS pos,
      |         unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
      |           i -> md5(array_to_string(t[i:i+7], ' ')))) AS gh
      |  FROM toks),
      |rep AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
      |cov AS (SELECT g.doc_id, g.pos, g.pos + 7 AS e FROM g JOIN rep USING (gh)),
      |m AS (SELECT doc_id, pos, e,
      |        max(e) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |      FROM cov),
      |f AS (SELECT doc_id, pos, e,
      |        CASE WHEN pm IS NULL OR pos > pm + 1 THEN 1 ELSE 0 END AS nw
      |      FROM m),
      |gr AS (SELECT doc_id, pos, e,
      |         sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM f),
      |sp AS (SELECT doc_id, min(pos) AS s, max(e) AS e2
      |       FROM gr GROUP BY doc_id, grp),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
      |          CAST(sum(e2 - s + 1) AS BIGINT) AS dup_tokens,
      |          string_agg(s || ':' || e2, ';' ORDER BY s) AS dup_spans
      |        FROM sp GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
      |       coalesce(a.n_dup_spans, CAST(0 AS BIGINT)) AS n_dup_spans,
      |       coalesce(a.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
      |       coalesce(a.dup_spans, '') AS dup_spans
      |FROM toks t LEFT JOIN agg a USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    Dedup.repeatedSubstringSpans(t(s, dir, "documents"), "text", "doc_id",
      minLen = 8)
      .withColumn("dup_spans", coalesce(col("dup_spans"), lit("")))
      .orderBy("doc_id")
  }


  // Planted twin with ANALYTIC extension boundaries: 60 docs of globally
  // unique filler tokens d{i}t{j} share one 24-token block blk0..blk23,
  // inserted at token offset 10 (even ids) or 17 (odd) — the offset-
  // by-anything case d8's aligned chunks miss by construction. With
  // minLen=8 the repeated 8-gram starts are exactly o..o+16, whose
  // interval union is the single maximal span [o, o+23]: grams
  // straddling a block edge carry doc-unique filler, so extension
  // provably stops at the block boundary. The oracle is the closed
  // form — 64 tokens, one span of 24, '10:33' / '17:40'.
  register(
    "d20b_repeated_substrings_planted",
    """SELECT CAST(i AS BIGINT) AS doc_id, CAST(64 AS BIGINT) AS n_tokens,
      |       CAST(1 AS BIGINT) AS n_dup_spans, CAST(24 AS BIGINT) AS dup_tokens,
      |       CASE WHEN i % 2 = 0 THEN '10:33' ELSE '17:40' END AS dup_spans
      |FROM (SELECT unnest(range(0, 60)) AS i) ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      val off = when(col("i") % 2 === 0, lit(10)).otherwise(lit(17))
      val uniq = (j: Column) =>
        concat(lit("d"), col("i"), lit("t"), j)
      val planted = s.range(60).select(col("id").as("i"))
        .select(col("i").as("doc_id"),
          array_join(concat(
            transform(sequence(lit(0), off - 1), j => uniq(j)),
            transform(sequence(lit(0), lit(23)), j => concat(lit("blk"), j)),
            transform(sequence(off, lit(39)), j => uniq(j))), " ").as("text"))
      Dedup.repeatedSubstringSpans(planted, "text", "doc_id", minLen = 8)
        .withColumn("dup_spans", coalesce(col("dup_spans"), lit("")))
        .orderBy("doc_id")
  }

  // Incremental tier of the suffix family: two batches through the
  // parquet-staged gram-count store (repeatedSubstringStoreStep). The
  // contract is the minhashStoreStep asymmetry — a batch's report sees
  // gram counts of everything ingested UP TO AND INCLUDING itself — so
  // the oracle computes batch-0 docs against batch-0 grams and batch-1
  // docs against the full corpus, with the identical interval algebra.
  // The store round-trips real parquet (scratchDir) and the write is
  // retry-idempotent (per-batch partition overwrite; spec-pinned).
  // Confined to the doc_id < 500 slice (the d2e harness rule): this row
  // proves STORE semantics, which is id-bounded by nature; the corpus-
  // scale path is d20 itself, which runs the full table every rep.
  register(
    "d21_substring_incremental",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents WHERE doc_id < 500),
      |g AS (
      |  SELECT doc_id,
      |         CAST(unnest(range(1, greatest(len(t) - 6, 1))) AS BIGINT) - 1 AS pos,
      |         unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
      |           i -> md5(array_to_string(t[i:i+7], ' ')))) AS gh
      |  FROM toks),
      |rep0 AS (SELECT gh FROM g WHERE doc_id < 250 GROUP BY gh HAVING count(*) >= 2),
      |repAll AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
      |cov AS (
      |  SELECT g.doc_id, g.pos, g.pos + 7 AS e
      |  FROM g JOIN rep0 USING (gh) WHERE g.doc_id < 250
      |  UNION ALL
      |  SELECT g.doc_id, g.pos, g.pos + 7 AS e
      |  FROM g JOIN repAll USING (gh) WHERE g.doc_id >= 250),
      |m AS (SELECT doc_id, pos, e,
      |        max(e) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |      FROM cov),
      |f AS (SELECT doc_id, pos, e,
      |        CASE WHEN pm IS NULL OR pos > pm + 1 THEN 1 ELSE 0 END AS nw
      |      FROM m),
      |gr AS (SELECT doc_id, pos, e,
      |         sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM f),
      |sp AS (SELECT doc_id, min(pos) AS s, max(e) AS e2
      |       FROM gr GROUP BY doc_id, grp),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
      |          CAST(sum(e2 - s + 1) AS BIGINT) AS dup_tokens,
      |          string_agg(s || ':' || e2, ';' ORDER BY s) AS dup_spans
      |        FROM sp GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
      |       coalesce(a.n_dup_spans, CAST(0 AS BIGINT)) AS n_dup_spans,
      |       coalesce(a.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
      |       coalesce(a.dup_spans, '') AS dup_spans
      |FROM toks t LEFT JOIN agg a USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    val store = scratchDir("d21_store")
    val docs = t(s, dir, "documents").where(col("doc_id") < 500)
    val b0 = Dedup.repeatedSubstringStoreStep(
      docs.where(col("doc_id") < 250), store, "text", "doc_id",
      minLen = 8, batchId = 0L)
    val b1 = Dedup.repeatedSubstringStoreStep(
      docs.where(col("doc_id") >= 250), store, "text", "doc_id",
      minLen = 8, batchId = 1L)
    b0.unionAll(b1)
      .withColumn("dup_spans", coalesce(col("dup_spans"), lit("")))
      .orderBy("doc_id")
  }


  // The incremental CLEAN tier: d21's two-batch store loop, but emitting
  // the deduplicated TEXT of each arriving batch instead of the span
  // report (repeatedSubstringCleanStoreStep = storeStep semantics + the
  // d22 cut). The oracle reuses d21's asymmetric cov algebra (batch-0
  // docs vs batch-0 grams, batch-1 vs full corpus) and then cuts by
  // per-position anti-join — hash-proven to the clean_text bytes.
  register(
    "d23_substring_clean_incremental",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents WHERE doc_id < 500),
      |g AS (
      |  SELECT doc_id,
      |         CAST(unnest(range(1, greatest(len(t) - 6, 1))) AS BIGINT) - 1 AS pos,
      |         unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
      |           i -> md5(array_to_string(t[i:i+7], ' ')))) AS gh
      |  FROM toks),
      |rep0 AS (SELECT gh FROM g WHERE doc_id < 250 GROUP BY gh HAVING count(*) >= 2),
      |repAll AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
      |cov AS (
      |  SELECT g.doc_id, g.pos, g.pos + 7 AS e
      |  FROM g JOIN rep0 USING (gh) WHERE g.doc_id < 250
      |  UNION ALL
      |  SELECT g.doc_id, g.pos, g.pos + 7 AS e
      |  FROM g JOIN repAll USING (gh) WHERE g.doc_id >= 250),
      |m AS (SELECT doc_id, pos, e,
      |        max(e) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |      FROM cov),
      |f AS (SELECT doc_id, pos, e,
      |        CASE WHEN pm IS NULL OR pos > pm + 1 THEN 1 ELSE 0 END AS nw
      |      FROM m),
      |gr AS (SELECT doc_id, pos, e,
      |         sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM f),
      |sp AS (SELECT doc_id, min(pos) AS s, max(e) AS e2
      |       FROM gr GROUP BY doc_id, grp),
      |cpos AS (SELECT doc_id, unnest(range(s, e2 + 1)) AS pos FROM sp),
      |dt AS (SELECT doc_id, unnest(t) AS tok,
      |              CAST(generate_subscripts(t, 1) AS BIGINT) - 1 AS pos
      |       FROM toks),
      |kept AS (
      |  SELECT dt.doc_id, dt.tok, dt.pos FROM dt
      |  ANTI JOIN cpos ON cpos.doc_id = dt.doc_id AND cpos.pos = dt.pos),
      |agg AS (
      |  SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS clean_text,
      |         count(*) AS n_kept
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, coalesce(a.clean_text, '') AS clean_text,
      |       CAST(len(t.t) AS BIGINT) AS n_tokens,
      |       CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
      |FROM toks t LEFT JOIN agg a USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    val store = scratchDir("d23_store")
    val docs = t(s, dir, "documents").where(col("doc_id") < 500)
    val b0 = Dedup.repeatedSubstringCleanStoreStep(
      docs.where(col("doc_id") < 250), store, "text", "doc_id",
      minLen = 8, batchId = 0L)
    val b1 = Dedup.repeatedSubstringCleanStoreStep(
      docs.where(col("doc_id") >= 250), store, "text", "doc_id",
      minLen = 8, batchId = 1L)
    b0.unionAll(b1).orderBy("doc_id")
  }


  // The winnowing STORE LOOP, hash-matched end to end — the fully
  // deterministic member of the incremental dedup family (window minima,
  // no RNG), so unlike the minhash/banded loops the whole two-batch store
  // path is exactly SQL-expressible: batch 0 founds the store (no dups by
  // construction), batch 1 candidates against batch-0 fingerprints under
  // the store-side cap, pairs need >= 2 shared fingerprints. Confined to
  // the doc_id < 500 slice (the store-semantics harness rule; the
  // corpus-scale batch path is d10).
  register(
    "d24_winnowing_incremental",
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS t
      |  FROM documents WHERE doc_id < 500),
      |g AS (
      |  SELECT doc_id, list_transform(generate_series(0, len(t) - 3),
      |           i -> md5(array_to_string(t[i+1:i+3], ' '))) AS grams
      |  FROM w WHERE len(t) >= 3),
      |fps AS (
      |  SELECT DISTINCT doc_id, fp FROM (
      |    SELECT doc_id, unnest(list_distinct(list_transform(
      |             generate_series(0, greatest(len(grams) - 4, 0)),
      |             i -> list_min(grams[i+1:i+4])))) AS fp
      |    FROM g)),
      |rk AS (
      |  SELECT fp, doc_id AS id_store,
      |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |  FROM fps WHERE doc_id < 250),
      |pairs AS (
      |  SELECT f1.doc_id AS id_new, rk.id_store,
      |         CAST(count(*) AS BIGINT) AS shared_fps
      |  FROM fps f1 JOIN rk USING (fp)
      |  WHERE f1.doc_id >= 250 AND rk.rn <= 64
      |  GROUP BY f1.doc_id, rk.id_store)
      |SELECT id_new, id_store, shared_fps FROM pairs WHERE shared_fps >= 2
      |ORDER BY id_new, id_store""".stripMargin) { (s, dir) =>
    val store = scratchDir("d24_store")
    val docs = t(s, dir, "documents").where(col("doc_id") < 500)
    val b0 = Dedup.winnowingStoreStep(docs.where(col("doc_id") < 250),
      store, "text", "doc_id", batchId = 0L)
    val b1 = Dedup.winnowingStoreStep(docs.where(col("doc_id") >= 250),
      store, "text", "doc_id", batchId = 1L)
    b0.unionAll(b1).orderBy("id_new", "id_store")
  }


  // The CLEANED corpus from the substring tier — d20's spans actually cut
  // and the survivors reassembled (the Lee et al. 2022 ExactSubstr
  // deliverable; d20 only reports). The oracle recomputes the identical
  // algebra through the span sweep, then cuts by per-position anti-join
  // and reassembles in token order — hash-proven down to the clean_text
  // bytes. Fully-repeated docs return EMPTY text (never vanish).
  register(
    "d22_substring_dedup_clean",
    "WITH " + substringCleanSql("documents", "text") + """
      |SELECT t.doc_id, coalesce(a.clean_text, '') AS clean_text,
      |       CAST(len(t.t) AS BIGINT) AS n_tokens,
      |       CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
      |FROM toks t LEFT JOIN agg a USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    Dedup.removeRepeatedSubstrings(t(s, dir, "documents"), "text", "doc_id",
      minLen = 8)
      .orderBy("doc_id")
  }


  // Duplicate-cluster labeling: prefix-fingerprint chain edges → min-label
  // propagation to fixpoint (Dedup.connectedComponents). The oracle computes
  // the same clusters independently via a window over the fingerprint —
  // verifying the distributed graph algorithm against a declarative spec.
  register(
    "d6_dedup_clusters",
    """WITH fp AS (
      |  SELECT doc_id,
      |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 80) AS f
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS cluster_id,
      |         count(*) OVER (PARTITION BY f) AS n
      |  FROM fp)
      |SELECT doc_id AS id, cluster_id FROM g WHERE n > 1 ORDER BY id""".stripMargin) { (s, dir) =>
    Dedup.exactDupClusters(t(s, dir, "documents"), "text", "doc_id", prefixLen = 80)
      .orderBy("id")
  }


  // Span-level corpus dedup (C4-style): non-overlapping 8-token spans,
  // corpus-wide keep-first, documents reassembled from survivors.
  register(
    "d8_span_dedup",
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
      |                             x -> x != '') AS words
      |  FROM documents),
      |flat AS (
      |  SELECT doc_id, sp.span_idx AS span_idx, sp.span AS span
      |  FROM (SELECT doc_id, unnest(list_transform(
      |          generate_series(0, CAST(ceil(len(words) / 8.0) AS BIGINT) - 1),
      |          i -> struct_pack(span_idx := i,
      |                 span := array_to_string(words[i*8+1:i*8+8], ' ')))) AS sp
      |        FROM w)
      |  WHERE length(sp.span) > 0),
      |keep AS (
      |  SELECT doc_id, span_idx, span,
      |         row_number() OVER (PARTITION BY span
      |                            ORDER BY doc_id, span_idx) AS rn
      |  FROM flat)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans_kept,
      |       string_agg(span, ' ' ORDER BY span_idx) AS dedup_text
      |FROM keep WHERE rn = 1
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.spanDedup(t(s, dir, "documents"), "text", "doc_id", spanWords = 8)
      .orderBy("doc_id")
  }


  // Intra-document span dedup (the C4 page-LOCAL rule): the keep-first
  // window scopes to (doc, span) — a span repeated inside one document
  // collapses, but documents never affect each other.
  register(
    "d11_intradoc_span_dedup",
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
      |                             x -> x != '') AS words
      |  FROM documents),
      |flat AS (
      |  SELECT doc_id, sp.span_idx AS span_idx, sp.span AS span
      |  FROM (SELECT doc_id, unnest(list_transform(
      |          generate_series(0, CAST(ceil(len(words) / 8.0) AS BIGINT) - 1),
      |          i -> struct_pack(span_idx := i,
      |                 span := array_to_string(words[i*8+1:i*8+8], ' ')))) AS sp
      |        FROM w)
      |  WHERE length(sp.span) > 0),
      |keep AS (
      |  SELECT doc_id, span_idx, span,
      |         row_number() OVER (PARTITION BY doc_id, span
      |                            ORDER BY doc_id, span_idx) AS rn
      |  FROM flat)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans_kept,
      |       string_agg(span, ' ' ORDER BY span_idx) AS dedup_text
      |FROM keep WHERE rn = 1
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.spanDedup(t(s, dir, "documents"), "text", "doc_id", spanWords = 8,
      withinDoc = true)
      .orderBy("doc_id")
  }


  // Semantic dedup: nearest-centroid cluster assignment + keep-one
  // representative per cluster (embedding-space analogue of d1/d2's
  // lexical keep-one; centroid matrix rides the ivf one-row broadcast).
  register(
    "d7_semantic_dedup",
    """WITH c AS (
      |  SELECT CAST(label AS VARCHAR) AS grp, pos, avg(v) AS centroid
      |  FROM (SELECT label, unnest(embedding) AS v,
      |               generate_subscripts(embedding, 1) AS pos FROM embeddings)
      |  GROUP BY 1, pos),
      |d AS (
      |  SELECT e.vec_id, c.grp,
      |         round(sum((CAST(e.v AS DOUBLE) - c.centroid) *
      |                   (CAST(e.v AS DOUBLE) - c.centroid)), 6) AS d2
      |  FROM (SELECT vec_id, unnest(embedding) AS v,
      |               generate_subscripts(embedding, 1) AS pos FROM embeddings) e
      |  JOIN c USING (pos)
      |  GROUP BY e.vec_id, c.grp),
      |a AS (
      |  SELECT vec_id, grp AS cluster, d2,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, grp) AS rn
      |  FROM d),
      |asn AS (SELECT vec_id, cluster, d2 FROM a WHERE rn = 1),
      |r AS (
      |  SELECT vec_id, cluster,
      |         row_number() OVER (PARTITION BY cluster ORDER BY d2, vec_id) AS rnk
      |  FROM asn)
      |SELECT vec_id, cluster, rnk = 1 AS keep FROM r ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val cents = Similarity.centroids(
      e.withColumn("grp", col("label").cast("string")), "embedding", "grp")
    Similarity.semanticDedup(e, cents).orderBy("vec_id")
  }
}
