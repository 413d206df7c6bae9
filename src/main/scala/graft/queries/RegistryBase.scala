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

/** Shared infrastructure for the per-family query registries: the
  * entries map behind `register`/`registerNoOracle`, table loading,
  * scratch dirs, the recall-harness cache, and every helper used by
  * more than one family. Family traits ([[SqlQueries]],
  * [[DedupQueries]], ...) extend this and register their rows in their
  * trait body; [[graft.Queries]] mixes them all into one registry. */
private[graft] trait RegistryBase {


  protected type Q = (SparkSession, String) => DataFrame


  protected val entries = scala.collection.mutable.LinkedHashMap[String, (Q, Option[String])]()


  protected def register(name: String, oracle: String)(fn: Q): Unit =
    entries(name) = (fn, Some(oracle))


  protected def registerNoOracle(name: String)(fn: Q): Unit =
    entries(name) = (fn, None)


  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)


  /** One per-JVM scratch root for the snapshot-store queries (q39/q40/p3),
    * removed recursively on shutdown — Bench re-executes those queries
    * n>=3 times and a bare createTempDirectory would leak a committed
    * parquet store under /tmp per execution. */
  protected lazy val scratchRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p
  }


  protected def scratchDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(scratchRoot, prefix).toString


  /** Cache for the recall-bound rows' brute-force GROUND-TRUTH sides,
    * keyed (session, sfDir, harness). The ground truth is deliberately
    * id-bounded (O(1) in corpus size) verification rig, not the scale
    * path — the measured pipelines (d2/d3/d5 full-corpus runs) still
    * execute in full on every rep; only the exact-pair harness, identical
    * across reps and shared between d2e and d3c (same id slice, same
    * 2-gram shingles — the J >= 0.7 set is a subset of the J >= 0.5 set,
    * and any J >= 0.7 pair passes the 2x length prune), is computed once
    * per (session, sf). */
  protected val harnessCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  protected def cachedHarness(s: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = {
    // evict entries owned by stopped sessions (their checkpoint blocks
    // died with the context; the stale DataFrame handles must not pin the
    // session object or accumulate across sessions in one JVM)
    val it = harnessCache.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    harnessCache.computeIfAbsent((s, dir, key), _ => build.localCheckpoint())
  }


  /** Shared d2e/d3c ground truth: all (id_a < id_b) pairs among
    * doc_id < 500 with 2-gram-shingle Jaccard >= 0.5, with the j value. */
  protected def exactJaccardPairs(s: SparkSession, dir: String): DataFrame =
    cachedHarness(s, dir, "jaccard_pairs_500") {
      // shingle once per DOC and MATERIALIZE (localCheckpoint): the
      // inequality join is a nested loop whose condition/projection would
      // otherwise re-run the shingle pipeline per candidate pair
      val sh = t(s, dir, "documents").where(col("doc_id") < 500)
        .select(col("doc_id"), Dedup.wordShingles(col("text"), 2).as("s"))
        .withColumn("n", size(col("s")))
        .repartition(32)
        .localCheckpoint()
      // length-ratio prune: J(A,B) >= 0.5 forces |A| and |B| within 2x of
      // each other, so most pairs skip the array intersect entirely
      sh.as("a").join(sh.as("b"),
          col("a.doc_id") < col("b.doc_id") &&
            col("a.n") * 2 >= col("b.n") && col("b.n") * 2 >= col("a.n"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          round(Dedup.jaccard(col("a.s"), col("b.s")), 6).as("j"))
        .where(col("j") >= 0.5)
    }


  /** Events scan widened for the CPU-heavy ingest fixtures: a single
    * small parquet file yields 1-3 scan splits, and the JSON round-trip +
    * classification chain inherits that width (guide §2.5). Identity once
    * the scan is wide — a real ingest reads many shards/objects. */
  protected def eventsWide(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.AdaptiveParts.widenNarrowScan(
      t(s, dir, "events"), col("event_id"))


  protected def classifiedEvents(s: SparkSession, dir: String): DataFrame = {
    val raw = eventsWide(s, dir).select(
      to_json(struct(col("event_id"), col("event_type"), col("value"), col("props")))
        .as("line"))
    new Classifier(Seq(DemoSchemas.jsonEvents))
      .classify(raw, "line").forType("demo:json_events")
  }


  protected val fixedClock = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")


  protected val normSchema = graft.core.LogSchema(
    name = "demo:json_norm", parser = graft.core.ParserKind.Json,
    schema = TStruct.of("event_id" -> TInteger, "etype" -> TString, "k" -> TInteger))


  protected val normConfig: Map[String, Seq[NormalizedField]] = Map(
    "event_category" -> Seq(NormalizedField(
      path = Seq("etype"), function = Some("Event category"),
      condition = Some(NormCondition(Seq("etype"), "in", Seq("purchase", "signup"))))),
    "numeric_k" -> Seq(NormalizedField(path = Seq("k"), function = Some("K value"))),
    "hidden_id" -> Seq(NormalizedField(path = Seq("event_id"), sendToArtifacts = false)))


  protected def normalizedEvents(s: SparkSession, dir: String): DataFrame = {
    val raw = eventsWide(s, dir).select(
      to_json(struct(col("event_id"), col("event_type").as("etype"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))).as("line"))
    val typed = new Classifier(Seq(normSchema)).classify(raw, "line")
      .forType("demo:json_norm")
    typed
      .withColumn(Normalizer.NormalizationKey,
        Normalizer.normalizationCol(col("record"), normConfig, Some(normSchema.schema)))
      .withColumn(Normalizer.RecordIdKey,
        Normalizer.recordIdCol(col(Normalizer.NormalizationKey),
          deterministicFrom = Some(col("record.event_id"))))
  }


  /** The planted-corpus construction shared by every lexical hash-matched
    * approximate row (d2c/d2d/d3b/d9): every token is prefixed with its
    * doc_id, so DISTINCT docs share zero shingles/tokens (cross-doc jaccard
    * 0, independent fingerprints) while a re-ingested copy keeps its
    * source's text verbatim (jaccard 1, identical fingerprint). */
  protected def docPrefixed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_join(transform(split(lower(col("text")), "\\s+"),
        x => concat_ws("_", col("doc_id").cast("string"), x)), " ").as("text"))


  /** [[docPrefixed]] plus one byte-identical copy of every 97th doc under
    * id + 1,000,000 — the planted near-dup pairs. */
  protected def docPlantedCorpus(docs: DataFrame): DataFrame = {
    val prefixed = docPrefixed(docs)
    prefixed.unionAll(prefixed.where(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }


  /** The d2c planting construction applied to embeddings: each query vector
    * (vec_id < 5) is re-ingested as `reps` byte-identical copies under ids
    * q_id + r·1,000,000. Identical vectors share every hyperplane sign and
    * every centroid distance, so BOTH bucketed ANN paths find the copies
    * with certainty (they sit in the query's own bucket / nearest inverted
    * list), and cosine(v, v) rounds to exactly 1.0 — strictly above the
    * near-orthogonal rest of the corpus (max pairwise cos ~0.3). The real
    * bucket→probe→verify→top-k pipeline therefore has exactly ONE possible
    * answer: the planted copies in id order. */
  protected def plantedAnnCorpus(e: DataFrame, reps: Int): DataFrame = {
    val base = e.select(col("vec_id"), col("embedding"))
    val planted = (1 to reps).map(r => e.where(col("vec_id") < 5)
      .select((col("vec_id") + r * 1000000).as("vec_id"), col("embedding")))
      .reduce(_ unionAll _)
    base.unionAll(planted)
  }


  protected val AnnPlantedOracle =
    """SELECT e.vec_id AS q_id, e.vec_id + reps.r * 1000000 AS neighbor_id,
      |       CAST(1.0 AS DOUBLE) AS cos, CAST(reps.r AS INTEGER) AS rank
      |FROM embeddings e CROSS JOIN (SELECT unnest([1, 2, 3]) AS r) reps
      |WHERE e.vec_id < 5 ORDER BY q_id, rank""".stripMargin


  // Recall@k bounds for the approximate ANN paths on the REALISTIC corpus —
  // the d3c/d2e construction with brute-force top-k as the ground truth.
  // DuckDB recomputes the exact top-3 neighbor set of the 5 query vectors
  // (the same ranking ann_bruteforce_topk hash-verifies) and constant-folds
  // the claim to TRUE; Spark recomputes it AND measures containment in the
  // approximate output. Centroids/hyperplanes are seeded, so measured
  // recall is deterministic and the bound claim hash-compares. The ground
  // truth is query-bounded (5 ids), so the brute-force side stays O(corpus)
  // — the same work the approximate path's verify stage already does.
  protected val AnnRecallOracle =
    """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.q_id, c.vec_id AS neighbor_id,
      |         round(list_cosine_similarity(c.embedding::DOUBLE[], q.q_vec::DOUBLE[]), 6) AS cos
      |  FROM embeddings c CROSS JOIN q WHERE c.vec_id != q.q_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT CAST(count(*) AS BIGINT) AS exact_pairs, TRUE AS recall_floor_met
      |FROM ranked WHERE rank <= 3""".stripMargin


  protected def annRecallClaim(exact: DataFrame, approx: DataFrame,
      floor: Double): DataFrame =
    exact.select(col("q_id"), col("neighbor_id"))
      .join(approx.select(col("q_id"), col("neighbor_id"), lit(1).as("__found")),
        Seq("q_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("__exact"), sum(coalesce(col("__found"), lit(0))).as("__hit"))
      .select(col("__exact").cast("long").as("exact_pairs"),
        // coalesce: empty ground truth → vacuous-true on both engines
        coalesce(col("__hit").cast("double") / col("__exact") >= floor, lit(true))
          .as("recall_floor_met"))


  /** Deterministic PQ codebook for the oracle rows: code c of subspace s is
    * the s-th 16-dim slice of vector c (vec_id < 4) — SQL-expressible, so
    * the encode/ADC machinery gets an exact hash oracle (production trains
    * the codebook per subspace with [[graft.pipeline.Similarity.kmeansLloyd]];
    * see the PipelineOpsSpec composition test). */
  protected def pqSliceCodebook(e: DataFrame): DataFrame =
    e.where(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("code"),
        explode(sequence(lit(0), lit(3))).as("sub"), col("embedding"))
      .select(col("sub"), col("code"),
        slice(col("embedding").cast("array<double>"),
          col("sub") * 16 + 1, lit(16)).as("centroid"))


  protected val PqCbSql =
    """cb AS (
      |  SELECT s.s AS sub, e.vec_id::INT AS code,
      |         list_transform(range(s.s * 16 + 1, s.s * 16 + 17),
      |           i -> e.embedding[i]::DOUBLE) AS cvec
      |  FROM embeddings e CROSS JOIN (SELECT unnest(range(0, 4)) AS s) s
      |  WHERE e.vec_id < 4),
      |enc AS (
      |  SELECT v.vec_id, cb.sub, cb.code,
      |         row_number() OVER (PARTITION BY v.vec_id, cb.sub ORDER BY
      |           round(list_sum(list_transform(range(1, 17),
      |             i -> (v.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]) *
      |                  (v.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]))), 6) ASC,
      |           cb.code ASC) AS rn
      |  FROM embeddings v CROSS JOIN cb)""".stripMargin


  /** Piece vocabulary for the t38 WordPiece fertility row — fixed multi-char
    * pieces; single characters are the implicit fallback on both engines. */
  protected val WpVocab = Seq("ta", "er", "an", "in", "re", "st", "on",
    "ing", "ion", "ble", "data", "scan")


  /** One greedy-match step of the t38 oracle: consume the longest vocab
    * piece at the cursor (or one char), frozen once the cursor passes the
    * word end — the CTE-unrolled mirror of the Spark-side aggregate fold
    * (10 steps cover the corpus's max 8-char token with margin). */
  protected def wpStepSql(i: Int): String =
    s"""s$i AS (
       |  SELECT tok, pos + step AS pos,
       |         cnt + (CASE WHEN pos <= len(tok) THEN 1 ELSE 0 END) AS cnt
       |  FROM (
       |    SELECT s.tok, s.pos, s.cnt,
       |           CASE WHEN s.pos <= len(s.tok)
       |                THEN max(CASE WHEN substr(s.tok, s.pos, len(v.piece)) = v.piece
       |                              THEN len(v.piece) ELSE 1 END)
       |                ELSE 0 END AS step
       |    FROM s${i - 1} s CROSS JOIN v
       |    GROUP BY s.tok, s.pos, s.cnt))""".stripMargin


  /** The native array<string> aggregation behind q17 — kept separately so
    * PipelineOpsSpec can prove the list-through-parquet path (Spark
    * array<string> → parquet → read-back) even though the driver's oracle
    * hashes the string projection.
    */
  def q17Native(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").groupBy("user_id")
      .agg(
        array_sort(collect_set(col("event_type"))).as("event_types"),
        count(lit(1)).as("n_events"))
}
