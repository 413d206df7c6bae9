package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *  - Brute force: broadcast the (small) query set against the corpus; one
  *    scan, no corpus shuffle, window top-k per query. The correctness
  *    baseline at any scale where |queries| ≪ |corpus|.
  *  - LSH-bucketed: hyperplane sign buckets with multi-probe (flip one bit)
  *    — the 100 TB path: candidate generation is an equi-join on bucket ids,
  *    so cost is |bucket|² per bucket instead of |corpus| per query.
  */
object Similarity {

  /** Broadcast cap for query-set join sides: 64k embedding rows (~32 MB
    * at dim 64 doubles) stays inside any sane executor heap; a fatter
    * query set DEMOTES to an unhinted join instead of hinting a broadcast
    * that ERRORS (not spills) when the build outgrows a tight heap — the
    * r17 memory-pressure receipt's one operational cliff, now decided
    * per-run from the data ([[graft.pipeline.BatchStore.probeSide]]'s
    * early-stopping count idiom applied to the ANN family). */
  val QueryBroadcastCap: Long = 1L << 16

  /** Byte budget for the free stats tier: a 32 MB build sits inside any
    * sane executor heap (Spark's own autoBroadcastJoinThreshold scale). */
  val BroadcastByteBudget: Long = 32L << 20

  /** Hint `side` for broadcast only when provably small. Two tiers: the
    * free one reads the BROADCAST SIDE'S OWN logical-plan byte statistics
    * (no job) against [[BroadcastByteBudget]] — gating on the skinny
    * `gate` frame's bytes instead assumed ~512 bytes/row of side payload,
    * which a fat derived side (adcTopK's m×K distance tables) violates
    * and a skinny gate could then admit a multi-GB build (r18 advice).
    * The stats tier only fires when the side's schema is FIXED-WIDTH:
    * Catalyst's size-only estimation prices variable-size columns at
    * `defaultSize` (an Array[Double] column counts 8 bytes regardless of
    * runtime length), so for array/map/string-bearing sides — every ANN
    * side — the byte statistic is not a bound and the decision falls
    * through to the early-stopping ROW count of `gate`, a cheap frame
    * whose rows bound side's rows within `factor`, with `cap` priced by
    * the caller for side's actual bytes-per-row. Above both tiers the
    * join shuffles/spills; semantics identical. */
  private def broadcastIfSmall(side: DataFrame, gate: DataFrame,
      factor: Long = 1L, cap: Long = QueryBroadcastCap): DataFrame = {
    val rowCap = math.max(1L, cap / math.max(1L, factor))
    val sideBytes = side.queryExecution.optimizedPlan.stats.sizeInBytes
    val statsSound = side.schema.fields.forall(f => f.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.BooleanType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.TimestampType => true
      case _ => false
    })
    if (statsSound && sideBytes <= BigInt(BroadcastByteBudget)) broadcast(side)
    else if (BatchStore.fitsBroadcast(gate, rowCap)) broadcast(side)
    else side
  }

  /** Exact top-k neighbors per query by cosine. The query side is
    * broadcast-hinted only when provably small ([[QueryBroadcastCap]]);
    * above the cap the cross join degrades to a spilling cartesian
    * instead of a broadcast-build error. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "q_id", queryVec: String = "q_vec",
      queryBroadcastCap: Long = QueryBroadcastCap): DataFrame = {
    // norms precomputed per side (r12): each pair pays ONE dot kernel,
    // bit-identical to the inlined Dedup.cosine it replaced
    val c = corpus.withColumn("__cn", Dedup.vecNorm(col(corpusVec)))
    val q = queries.withColumn("__qn", Dedup.vecNorm(col(queryVec)))
    val joined = c.crossJoin(
      broadcastIfSmall(q, queries, cap = queryBroadcastCap))
      .where(col(corpusId) =!= col(queryId))
      .withColumn("cos", Dedup.cosineFromNorms(col(corpusVec), col(queryVec),
        col("__cn"), col("__qn")))
    val w = Window.partitionBy(col(queryId))
      .orderBy(round(col("cos"), 6).desc, col(corpusId).asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Per-dimension centroids of embedding groups — the IVF coarse
    * quantizer's training step, as a plain posexplode + groupBy (fully
    * distributed; no driver-side vectors). Output: (group, pos, centroid). */
  def centroids(df: DataFrame, vecCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol).as("group"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("group", "pos")
      .agg(avg(col("v")).as("centroid"))

  /** IVF-style ANN: vectors are assigned to their nearest centroid (inverted
    * lists); a query searches only the `nProbe` nearest lists. Centroids are
    * collected to the driver ONCE (k × dim doubles — tiny) and folded into
    * the plan as ONE matrix literal (`typedlit`), so assignment stays a
    * scan-side argmin with no join and no shuffle.
    *
    * Why a one-ROW broadcast and not per-centroid literals or a k-row
    * broadcast centroid join: nLists separate `array(lit…)` nodes make the
    * plan (and codegen) grow O(nLists × dim) — at a production nLists≈4096
    * analysis alone blows up — while a k-row join needs an argmin over an
    * nLists× row explosion, i.e. a corpus-cardinality groupBy shuffle that
    * the scan-side form simply doesn't have. Broadcasting the whole matrix
    * as a single row (1-row BroadcastNestedLoopJoin — preserves corpus
    * partitioning) keeps the plan O(1) in nLists and the distance argmin a
    * per-row higher-order-function loop over the matrix column. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    // coarse centroids: deterministic grouping by id hash (k-means would
    // iterate this same shape; one round is enough for a coarse quantizer)
    val assigned0 = corpus.withColumn("group",
      pmod(xxhash64(col(corpusId)), lit(nLists)).cast("int"))
    val cents = centroids(assigned0, corpusVec, "group")
      .groupBy("group").agg(array_sort(collect_list(struct(col("pos"), col("centroid"))))
        .as("cs"))
      .select(col("group"), transform(col("cs"), c => c.getField("centroid")).as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap

    // the centroid table as ONE broadcast row: group-id vector + centroid
    // matrix, index-aligned (only groups the hash populated) — the k×dim
    // data never appears in the plan text
    val groupsSorted = cents.keys.toSeq.sorted
    val session = corpus.sparkSession
    import session.implicits._
    val centRow = broadcast(Seq(
      (groupsSorted, groupsSorted.map(g => cents(g).toSeq)))
      .toDF("__cent_groups", "__cent_mat"))

    def dist2(a: Column, b: Column): Column =
      graft.functions.VectorOps.l2_sq(a, b) // codegen'd; HOF-bit-identical

    // nearest-centroid assignment: argmin over the matrix column (struct
    // ordering compares d first, then group id for deterministic ties)
    def nearestLists(vec: Column, n: Int): Column = {
      val scored = zip_with(col("__cent_mat"), col("__cent_groups"),
        (c, g) => struct(dist2(vec, c).as("d"), g.as("g")))
      slice(transform(array_sort(scored), s => s.getField("g")), 1, n)
    }

    val invLists = corpus.crossJoin(centRow)
      .withColumn("list", nearestLists(col(corpusVec), 1).getItem(0))
      .drop("__cent_groups", "__cent_mat")
    val probes = queries.crossJoin(centRow)
      .withColumn("list", explode(nearestLists(col(queryVec), nProbe)))
      .drop("__cent_groups", "__cent_mat")
    // gate on the cheap base frame: probes = queries × nProbe by
    // construction, and recounting probes would re-run the argmin
    val candidates = invLists.join(
      broadcastIfSmall(probes, queries, factor = nProbe), Seq("list"))
      .where(col(corpusId) =!= col(queryId))
      .withColumn("cos", Dedup.cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(round(col("cos"), 6).desc, col(corpusId).asc)
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Semantic deduplication: assign every vector to its nearest centroid
    * (clusters trained elsewhere — [[centroids]] over labels here, k-means
    * lists in production) and keep ONE representative per cluster: the
    * vector closest to its centroid (ties on rounded distance break by id).
    * Everything else in the cluster is a semantic duplicate — the
    * embedding-space analogue of [[Dedup]]'s lexical near-dup keep-one.
    *
    * Scale shape: the centroid table rides in as the same one-row matrix
    * broadcast as [[ivfTopK]] (plan O(1) in cluster count, corpus
    * partitioning preserved), assignment is a scan-side argmin, and the
    * only shuffle is the per-cluster representative window — cardinality
    * |clusters|, skew-bounded by cluster size. Output: (vec_id, cluster,
    * keep). */
  def semanticDedup(corpus: DataFrame, cents: DataFrame,
      corpusId: String = "vec_id", corpusVec: String = "embedding"): DataFrame = {
    val byGroup = cents
      .groupBy("group").agg(array_sort(collect_list(struct(col("pos"), col("centroid"))))
        .as("cs"))
      .select(col("group"), transform(col("cs"), c => c.getField("centroid")).as("centroid"))
      .collect().map(r => r.get(0).toString -> r.getSeq[Double](1).toArray).toMap
    val groupsSorted = byGroup.keys.toSeq.sorted
    val session = corpus.sparkSession
    import session.implicits._
    val centRow = broadcast(Seq(
      (groupsSorted, groupsSorted.map(g => byGroup(g).toSeq)))
      .toDF("__cent_groups", "__cent_mat"))

    def dist2(a: Column, b: Column): Column =
      graft.functions.VectorOps.l2_sq(a, b) // codegen'd; HOF-bit-identical

    val assigned = corpus.crossJoin(centRow)
      .withColumn("__scored", array_sort(zip_with(col("__cent_mat"), col("__cent_groups"),
        (c, g) => struct(round(dist2(col(corpusVec), c), 6).as("d"), g.as("g")))))
      .select(col(corpusId),
        col("__scored").getItem(0).getField("g").as("cluster"),
        col("__scored").getItem(0).getField("d").as("__d"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("__d").asc, col(corpusId).asc)
    assigned.withColumn("keep", row_number().over(w) === 1)
      .select(col(corpusId), col("cluster"), col("keep"))
  }

  /** K-means (Lloyd) training from explicit initial centroids — the trainer
    * behind [[ivfTopK]]'s coarse quantizer and [[semanticDedup]]'s cluster
    * table, as a deterministic relational iteration. `init` is (cluster:
    * int, centroid_vec: array) — k rows, tiny by definition. Returns the
    * per-dimension centroids (cluster, pos, centroid) after `iters` Lloyd
    * rounds (nearest-centroid assignment → per-cluster mean).
    *
    * Scale shape: each round the current centroids (k×dim doubles) are
    * folded back into the plan as the SAME one-row matrix broadcast
    * [[ivfTopK]] uses, so assignment stays a scan-side argmin — plan O(1)
    * in k, no join, corpus partitioning preserved — and the only shuffle
    * per round is the (cluster, pos) mean, cardinality k×dim. Rounds start
    * from a fresh literal matrix, so lineage does NOT grow with `iters`
    * (the connected-components plan-growth trap doesn't apply); callers
    * should persist the corpus, which every round rescans. Assignment
    * argmin compares distances rounded to 6 decimals with cluster-id
    * tie-break — deterministic across engines. A cluster that captures no
    * vectors drops out of subsequent rounds (callers wanting k stable
    * should re-seed; at corpus scale with data-drawn seeds this does not
    * arise). */
  def kmeansLloyd(corpus: DataFrame, init: DataFrame, iters: Int,
      vecCol: String = "embedding",
      initCluster: String = "cluster", initVec: String = "centroid_vec"): DataFrame = {
    require(iters >= 1, "kmeansLloyd: iters must be >= 1")
    val session = corpus.sparkSession
    import session.implicits._

    def matRow(cents: Seq[(Int, Seq[Double])]): DataFrame = {
      val sorted = cents.sortBy(_._1)
      broadcast(Seq((sorted.map(_._1), sorted.map(_._2)))
        .toDF("__cent_groups", "__cent_mat"))
    }

    def dist2(a: Column, b: Column): Column =
      graft.functions.VectorOps.l2_sq(a, b) // codegen'd; HOF-bit-identical

    // one Lloyd round against a centroid literal: scan-side argmin
    // assignment, then the k×dim mean — lazy until collected/returned
    // the scalar cluster id is projected in its OWN select before the
    // posexplode: as a sibling of the generator, the k-struct argmin array
    // would be carried (and its projection evaluated) once per exploded
    // dimension instead of once per vector
    def meanUpdate(cents: Seq[(Int, Seq[Double])]): DataFrame =
      corpus.crossJoin(matRow(cents))
        .withColumn("__scored", array_sort(zip_with(col("__cent_mat"), col("__cent_groups"),
          (c, g) => struct(round(dist2(col(vecCol), c), 6).as("d"), g.as("g")))))
        .select(col("__scored").getItem(0).getField("g").as("cluster"),
          col(vecCol).cast("array<double>").as("__v"))
        .select(col("cluster"), posexplode(col("__v")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(avg(col("v")).as("centroid"))

    var cents: Seq[(Int, Seq[Double])] = init
      .select(col(initCluster).cast("int"), col(initVec).cast("array<double>"))
      .collect().toSeq.map(r => r.getInt(0) -> r.getSeq[Double](1))
    var r = 1
    while (r < iters) {
      cents = meanUpdate(cents).collect().toSeq
        .groupBy(_.getAs[Int]("cluster")).toSeq.map { case (c, rs) =>
          c -> rs.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("centroid")).toSeq
        }
      r += 1
    }
    meanUpdate(cents)
  }

  // ---------------------------------------------------------------------------
  // Product quantization (PQ)
  // ---------------------------------------------------------------------------

  /** Collect a PQ codebook (sub, code, centroid) into ONE broadcast row
    * holding the m×K×subDim matrix — the same plan-O(1) shape as
    * [[ivfTopK]]'s centroid row. The codebook is m·K·subDim doubles (a
    * production 64×256×8 is 128k values — trivially broadcastable); codes
    * must be dense 0..K-1 per subspace so ADC lookups are array indexing. */
  private def pqMatrixRow(codebook: DataFrame, subCol: String, codeCol: String,
      centroidCol: String): (DataFrame, Int, Int, Int) = {
    val entries = codebook
      .select(col(subCol).cast("int"), col(codeCol).cast("int"),
        col(centroidCol).cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    require(entries.nonEmpty, "pq: empty codebook")
    val bySub = entries.groupBy(_._1)
    val m = bySub.size
    require(bySub.keySet == (0 until m).toSet,
      s"pq: subspaces must be dense 0..${m - 1}, got ${bySub.keySet.toSeq.sorted}")
    val k = bySub(0).length
    val subDim = entries.head._3.length
    val mats = (0 until m).map { s =>
      val rows = bySub(s).sortBy(_._2)
      require(rows.map(_._2).toSeq == (0 until rows.length),
        s"pq: codes in subspace $s must be dense 0..K-1")
      require(rows.length == k, s"pq: subspace $s has ${rows.length} codes, expected $k")
      require(rows.forall(_._3.length == subDim),
        s"pq: centroid length mismatch in subspace $s")
      rows.map(_._3.toSeq).toSeq
    }
    val session = codebook.sparkSession
    import session.implicits._
    (broadcast(Seq(Tuple1(mats)).toDF("__pq_mats")), m, k, subDim)
  }

  private def dist2Col(a: Column, b: Column): Column =
    graft.functions.VectorOps.l2_sq(a, b) // codegen'd; HOF-bit-identical

  /** Per-subspace argmin codes for one vector against the matrix column
    * (6-decimal-rounded distances, code-id tie-break — deterministic). */
  private def pqCodesExpr(vec: Column, m: Int, k: Int, subDim: Int): Column = {
    val v = vec.cast("array<double>")
    transform(sequence(lit(0), lit(m - 1)), s => {
      val subv = slice(v, s * subDim + 1, lit(subDim))
      val scored = zip_with(element_at(col("__pq_mats"), s + 1),
        sequence(lit(0), lit(k - 1)),
        (c, code) => struct(round(dist2Col(subv, c), 6).as("d"), code.as("g")))
      element_at(array_sort(scored), 1).getField("g").cast("int")
    })
  }

  /** Product-quantization encode: each vector becomes m code-ids — its
    * nearest codebook centroid per subspace. THE memory move of
    * billion-vector ANN: a 64-dim float vector (256 B) becomes m bytes, so
    * the ADC scan in [[pqAdcTopK]] touches codes only and the float
    * corpus stays in cold storage. Train the codebook per subspace with
    * [[kmeansLloyd]] over sliced vectors (see the spec); any (sub, code,
    * centroid) table with dense 0..K-1 codes works.
    *
    * Scale shape: codebook rides in as one broadcast row (plan O(1) in
    * m·K), encoding is a scan-side argmin per subspace — no join, no
    * shuffle, corpus partitioning preserved. */
  def pqEncode(corpus: DataFrame, codebook: DataFrame,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      subCol: String = "sub", codeCol: String = "code",
      centroidCol: String = "centroid"): DataFrame = {
    val (centRow, m, k, subDim) = pqMatrixRow(codebook, subCol, codeCol, centroidCol)
    corpus.crossJoin(centRow)
      .select(col(corpusId), pqCodesExpr(col(corpusVec), m, k, subDim).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: each query
    * precomputes its m×K distance table against the codebook, then a
    * candidate's approximate distance is m table lookups summed —
    * `sum_s dt[s][code_s]` — with no float-vector access at all.
    *
    * Scale shape: the scan side is the (id, m codes) table — bytes per
    * row; queries (with their tables) broadcast; the only shuffle is the
    * per-query top-k window. Compose with [[ivfTopK]]'s inverted lists to
    * restrict the scan to probed lists (IVF-PQ) — the candidate set
    * shrinks, the per-candidate math is identical. Ranks ascend by
    * distance (6-decimal-rounded) with id tie-break. */
  def pqAdcTopK(codes: DataFrame, queries: DataFrame, codebook: DataFrame,
      k: Int,
      codesId: String = "vec_id", codesCol: String = "codes",
      queryId: String = "q_id", queryVec: String = "q_vec",
      subCol: String = "sub", codeCol: String = "code",
      centroidCol: String = "centroid"): DataFrame = {
    val (centRow, m, nCodes, subDim) = pqMatrixRow(codebook, subCol, codeCol, centroidCol)
    val qv = col(queryVec).cast("array<double>")
    val dt = transform(sequence(lit(0), lit(m - 1)), s =>
      transform(element_at(col("__pq_mats"), s + 1),
        c => round(dist2Col(slice(qv, s * subDim + 1, lit(subDim)), c), 6)))
    val withDt = queries.crossJoin(centRow)
      .select(col(queryId), dt.as("__dt"))
    val adist = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
      acc + element_at(element_at(col("__dt"), s + 1),
        element_at(col(codesCol), s + 1) + 1))
    // withDt rows are FAT — each carries an m×K double distance table
    // (~m·K·8 bytes/row, e.g. 32 KB at m=16, K=256), so the broadcast
    // cap must be row-size-aware: the default 64k-row cap would admit a
    // ~2 GB build (the r17 error-not-spill cliff). m and K are known
    // here, so derive the cap from a 32 MB build budget.
    val dtCap = math.max(1L, (32L << 20) / (m.toLong * nCodes * 8 + 64))
    val candidates = codes.join(
      broadcastIfSmall(withDt, queries, cap = dtCap),
      col(codesId) =!= col(queryId))
      .withColumn("adist", round(adist, 6))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("adist").asc, col(codesId).asc)
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(codesId).as("neighbor_id"), col("adist"), col("rank"))
  }

  /** Two-stage PQ serving: ADC shortlist → EXACT re-rank. The quantized
    * scan ([[pqAdcTopK]]) over-fetches `rerank` candidates per query, then
    * only those ids re-attach their float vectors for a true squared-L2
    * re-rank to top-k — the standard accuracy recovery for PQ's
    * quantization error (re-ranked top-k ⊇ ADC top-k whenever the true
    * neighbors survive the shortlist, at the cost of rerank·|Q| float-row
    * reads instead of a corpus scan).
    *
    * Scale shape: stage 1 touches codes only; stage 2's float reads are
    * shortlist-cardinality — the (q, candidate) pairs broadcast against
    * the corpus id scan, so the float corpus is FILTERED, never shuffled;
    * the final top-k is a per-query window over ≤ rerank rows. */
  def pqRefineTopK(corpus: DataFrame, codes: DataFrame, queries: DataFrame,
      codebook: DataFrame, k: Int, rerank: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      codesId: String = "vec_id", codesCol: String = "codes",
      queryId: String = "q_id", queryVec: String = "q_vec",
      subCol: String = "sub", codeCol: String = "code",
      centroidCol: String = "centroid"): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must cover top-k $k")
    val shortlist = pqAdcTopK(codes, queries, codebook, rerank, codesId,
      codesCol, queryId, queryVec, subCol, codeCol, centroidCol)
      .select(col(queryId), col("neighbor_id"))
    val floats = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).cast("array<double>").as("__cv"))
    val qv = queries.select(col(queryId),
      col(queryVec).cast("array<double>").as("__qv"))
    // the shortlist KEEPS its unconditional hint: its cardinality is
    // bounded by queries × rerank by construction (never corpus-sized),
    // and recounting it would re-run the whole ADC scan
    val exact = floats.join(broadcast(shortlist), "neighbor_id")
      .join(broadcastIfSmall(qv, queries), queryId)
      .withColumn("dist2", round(dist2Col(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("dist2").asc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col("neighbor_id"), col("dist2"), col("rank"))
  }

  /** Seed the streaming centroid store: train with [[kmeansLloyd]], then
    * one extra assignment pass counts each cluster's members so later
    * [[kmeansStoreStep]] updates can weight correctly. Store rows:
    * (cluster, pos, centroid, n), published as snapshot version 1 of a
    * [[graft.history.Snapshots]] store (atomic commits + the retry
    * markers the step relies on). */
  def kmeansStoreInit(corpus: DataFrame, init: DataFrame, iters: Int,
      storeDir: String, vecCol: String = "embedding"): Unit = {
    val trained = kmeansLloyd(corpus, init, iters, vecCol)
    val cents = collectCentroids(trained)
    val counts = assignToCentroids(corpus, cents, vecCol)
      .groupBy("cluster").agg(count(lit(1)).as("n"))
    val store = trained.join(counts, "cluster")
      .select(col("cluster"), col("pos"), col("centroid"), col("n"))
      .localCheckpoint()
    graft.history.Snapshots.commit(store, s"$storeDir/centroids",
      replace = true): Unit
  }

  /** One micro-batch step of STREAMING centroid maintenance — mini-batch
    * k-means (Sculley, WWW 2010) against the parquet-staged store: the
    * arriving vectors assign to the stored centroids (one-row matrix
    * broadcast, scan-side argmin — the Lloyd shape), then each touched
    * centroid moves to the count-weighted mean
    * `(centroid·n + Σ batch) / (n + n_batch)` and the store rewrites.
    * Untouched clusters are byte-stable. The drift counterpart of the
    * streaming ANN index loop: embeddings distributions move, the
    * quantizer follows without retraining from scratch.
    *
    * Per batch: one batch-sized argmin scan + one (cluster, pos) agg +
    * one store-sized join — never a corpus re-scan. The store is a
    * [[graft.history.Snapshots]] store: each step publishes a
    * replace-commit, and passing foreachBatch's `batchId` makes retries
    * IDEMPOTENT via the Materialized meta scheme — the batch id is
    * recorded per store version, written BEFORE that version commits, so
    * a re-delivered batch either finds its id on the latest version
    * (returns it unchanged) or recomputes from the pre-batch state; a
    * crash between marker and commit leaves an orphan marker with no
    * matching version, which is ignored. Returns the updated store
    * rows. */
  def kmeansStoreStep(batch: DataFrame, storeDir: String,
      vecCol: String = "embedding", batchId: Option[Long] = None): DataFrame = {
    import graft.history.Snapshots
    val spark = batch.sparkSession
    val path = s"$storeDir/centroids"
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val curVersion = Snapshots.versions(spark, path).last
    def markerPath(v: Long) = new org.apache.hadoop.fs.Path(s"$path/batch_of_v$v")
    val appliedToCurrent = batchId.exists { id =>
      fsys.exists(markerPath(curVersion)) && {
        val in = fsys.open(markerPath(curVersion))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim == id.toString
        finally in.close()
      }
    }
    if (appliedToCurrent) return Snapshots.read(spark, path)
    val store = Snapshots.read(spark, path)
    val cents = collectCentroids(store)
    val sums = assignToCentroids(batch, cents, vecCol)
      .select(col("cluster"), posexplode(col("__v")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg(sum(col("v")).as("__s"), count(lit(1)).as("__bn"))
    val updated = store.join(sums, Seq("cluster", "pos"), "left")
      .select(col("cluster"), col("pos"),
        when(col("__bn").isNull, col("centroid"))
          .otherwise((col("centroid") * col("n") + col("__s")) /
            (col("n") + col("__bn"))).as("centroid"),
        when(col("__bn").isNull, col("n"))
          .otherwise(col("n") + col("__bn")).as("n"))
      .localCheckpoint()
    batchId.foreach { id =>
      val out = fsys.create(markerPath(curVersion + 1), true)
      try out.write(s"$id\n".getBytes("UTF-8")) finally out.close()
    }
    val committed = Snapshots.commit(updated, path, replace = true)
    require(committed == curVersion + 1,
      s"centroid store commit raced: expected v${curVersion + 1}, got v$committed")
    updated
  }

  /** (cluster, pos, centroid) long rows → driver-side centroid seq (k×dim
    * doubles — tiny, the same collect [[kmeansLloyd]] performs per round). */
  private def collectCentroids(rows: DataFrame): Seq[(Int, Seq[Double])] =
    rows.select(col("cluster").cast("int"), col("pos").cast("int"),
        col("centroid").cast("double"))
      .collect().toSeq
      .groupBy(_.getInt(0)).toSeq.map { case (c, rs) =>
        c -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }

  /** Scan-side nearest-centroid assignment against a one-row matrix
    * broadcast — the [[kmeansLloyd]] argmin (rounded distances, cluster-id
    * tie-break), shared by the store init/step. Output: (cluster, __v). */
  private def assignToCentroids(df: DataFrame, cents: Seq[(Int, Seq[Double])],
      vecCol: String): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val sorted = cents.sortBy(_._1)
    val matRow = broadcast(Seq((sorted.map(_._1), sorted.map(_._2)))
      .toDF("__cent_groups", "__cent_mat"))
    df.crossJoin(matRow)
      .withColumn("__scored", array_sort(zip_with(col("__cent_mat"),
        col("__cent_groups"),
        (c, g) => struct(round(graft.functions.VectorOps.l2_sq(col(vecCol), c), 6)
          .as("d"), g.as("g")))))
      .select(col("__scored").getItem(0).getField("g").as("cluster"),
        col(vecCol).cast("array<double>").as("__v"))
  }

  /** IVF-PQ top-k — the composed billion-vector serving architecture:
    * coarse inverted lists restrict the scan, PQ codes replace the float
    * vectors, ADC scores the candidates. Coarse centroids arrive
    * EXPLICITLY in [[centroids]]' (group, pos, centroid) long format
    * (train with [[kmeansLloyd]]); the codebook as (sub, code, centroid)
    * with dense 0..K-1 codes.
    *
    * Scale shape: both tables fold into one-row broadcasts, so the index
    * build (list + codes per vector) is ONE scan-side pass — no join, no
    * shuffle, corpus partitioning preserved — and serving joins only the
    * probed lists' code rows against the broadcast queries. The residual
    * variant (PQ over v − centroid[list]) is the same plan with one
    * zip_with subtraction before the code argmin. All distances compare
    * 6-decimal-rounded with id tie-breaks — deterministic across engines,
    * which is how this operator carries an exact SQL oracle. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, cents: DataFrame,
      codebook: DataFrame, k: Int, nProbe: Int = 4,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "q_id", queryVec: String = "q_vec",
      centGroup: String = "group", centPos: String = "pos",
      centVal: String = "centroid",
      subCol: String = "sub", codeCol: String = "code",
      centroidCol: String = "centroid"): DataFrame =
    ivfPqTopKAgainstStore(
      ivfPqIndex(corpus, cents, codebook, corpusId, corpusVec,
        centGroup, centPos, centVal, subCol, codeCol, centroidCol),
      queries, cents, codebook, k, nProbe, corpusId,
      queryId, queryVec, centGroup, centPos, centVal,
      subCol, codeCol, centroidCol)

  /** Centroid table → ONE broadcast row holding (sorted group ids, their
    * vectors) — the shared coarse-quantizer shape ([[ivfTopK]]'s matrix). */
  private def centMatrixRow(cents: DataFrame, centGroup: String,
      centPos: String, centVal: String): DataFrame = {
    val session = cents.sparkSession
    import session.implicits._
    val byGroup = cents
      .groupBy(col(centGroup).cast("int").as("g"))
      .agg(array_sort(collect_list(struct(col(centPos), col(centVal)))).as("cs"))
      .select(col("g"), transform(col("cs"), c => c.getField(centVal)).as("cv"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1))
      .toMap
    require(byGroup.nonEmpty, "ivfPq: empty centroid table")
    val groupsSorted = byGroup.keys.toSeq.sorted
    broadcast(Seq((groupsSorted, groupsSorted.map(byGroup)))
      .toDF("__cent_groups", "__cent_mat"))
  }

  /** n nearest coarse lists for a vector, evaluated against the
    * [[centMatrixRow]] columns (6-decimal-rounded, group-id tie-break). */
  private def nearestListsCol(vec: Column, n: Int): Column = {
    val v = vec.cast("array<double>")
    val scored = zip_with(col("__cent_mat"), col("__cent_groups"),
      (c, g) => struct(round(dist2Col(v, c), 6).as("d"), g.as("g")))
    slice(transform(array_sort(scored), s => s.getField("g")), 1, n)
  }

  /** IVF-PQ index build — ONE scan-side pass emitting (id, list, codes):
    * the coarse list assignment and the PQ codes come from the same
    * projection, both matrices riding one-row broadcasts (no join, no
    * shuffle, corpus partitioning preserved). Persist the result —
    * parquet partitioned or bucketed by `list` so probe joins prune — and
    * serving never touches the float corpus again. */
  def ivfPqIndex(corpus: DataFrame, cents: DataFrame, codebook: DataFrame,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      centGroup: String = "group", centPos: String = "pos",
      centVal: String = "centroid",
      subCol: String = "sub", codeCol: String = "code",
      centroidCol: String = "centroid"): DataFrame = {
    val centRow = centMatrixRow(cents, centGroup, centPos, centVal)
    val (pqRow, m, nCodes, subDim) =
      pqMatrixRow(codebook, subCol, codeCol, centroidCol)
    corpus.crossJoin(centRow).crossJoin(pqRow)
      .select(col(corpusId),
        nearestListsCol(col(corpusVec), 1).getItem(0).as("list"),
        pqCodesExpr(col(corpusVec), m, nCodes, subDim).as("codes"))
  }

  /** IVF-PQ serving over an ALREADY-BUILT (id, list, codes) index — the
    * build-once/probe-many loop, the ANN analogue of
    * [[Retrieval.bm25TopKAgainstStore]]: each query picks its nProbe
    * nearest lists and precomputes its m×K distance table, candidates are
    * the probed lists' code rows only, and the raw float vectors never
    * appear in the serving plan at all. */
  def ivfPqTopKAgainstStore(index: DataFrame, queries: DataFrame,
      cents: DataFrame, codebook: DataFrame, k: Int, nProbe: Int = 4,
      corpusId: String = "vec_id",
      queryId: String = "q_id", queryVec: String = "q_vec",
      centGroup: String = "group", centPos: String = "pos",
      centVal: String = "centroid",
      subCol: String = "sub", codeCol: String = "code",
      centroidCol: String = "centroid"): DataFrame = {
    val centRow = centMatrixRow(cents, centGroup, centPos, centVal)
    val (pqRow, m, nCodes, subDim) =
      pqMatrixRow(codebook, subCol, codeCol, centroidCol)
    val qv = col(queryVec).cast("array<double>")
    val dt = transform(sequence(lit(0), lit(m - 1)), s =>
      transform(element_at(col("__pq_mats"), s + 1),
        c => round(dist2Col(slice(qv, s * subDim + 1, lit(subDim)), c), 6)))
    // probe list + distance table projected BEFORE the explode — as a
    // generator sibling the m×K table would be recomputed per probe row
    val probes = queries.crossJoin(centRow).crossJoin(pqRow)
      .select(col(queryId), nearestListsCol(col(queryVec), nProbe).as("__probe"),
        dt.as("__dt"))
      .select(col(queryId), explode(col("__probe")).as("list"), col("__dt"))
    val adist = round(aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc + element_at(element_at(col("__dt"), s + 1),
        element_at(col("codes"), s + 1) + 1)), 6)
    val candidates = index.join(broadcast(probes), Seq("list"))
      .where(col(corpusId) =!= col(queryId))
      .withColumn("adist", adist)
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("adist").asc, col(corpusId).asc)
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"), col("adist"),
        col("rank"))
  }

  /** LSH-bucketed ANN — banded (AND-OR amplified) hyperplane buckets with
    * multi-probe. A single wide signature ANDs every sign bit, so pair
    * recall at moderate cosine collapses exponentially (p^planes with
    * p = 1 − θ/π — the measured-0.2-recall trap the pre-banded version
    * fell into); banding OR-amplifies it to 1 − (1 − p^r)^b while
    * candidate generation stays a (band, sig) equi-join. Each query probes
    * its own bucket per band plus every 1-bit-flip neighbor WITHIN the
    * band, so recall degrades gracefully instead of falling off a cliff.
    *
    * Scale shape ([[Dedup.embeddingNearDupsBanded]]'s): the bucket join
    * ships (id, band, sig) — never vectors — survivors re-attach their
    * vectors by id for the exact cosine verify, and the final top-k is a
    * per-query window. Per-query candidate cost is
    * ~bands · (1 + planesPerBand) · corpus / 2^planesPerBand: at corpus
    * scale widen `planesPerBand` (buckets sharpen exponentially) and
    * recover the lost per-band recall with more `bands` — the knobs move
    * cost and recall independently, which the single-signature scheme
    * could not. SCALE.md ("lshTopK occupancy-driven bands/planes
    * defaults") tabulates recommended (bands, planesPerBand) by corpus
    * size with the recall/candidate closed forms — the 8×6 defaults are
    * tuned for a 10⁴-vector corpus and deliberately probe ~87% of it;
    * production sizes want r 14–20.
    *
    * `corpusSize`, when known (the serving path over a staged corpus always
    * knows it), feeds the occupancy guard: a fixed band width saturates at
    * 100× the corpus — candidate cost per query grows linearly and the
    * probes stop discriminating. When None the guard is skipped so this
    * stays a pure plan-builder (one limit(1) dimension probe aside — the
    * [[Dedup.embeddingStagesBanded]] literal-matrix fast path).
    *
    * The QUERY side (probes + vectors-with-norms) broadcasts — correct for
    * the serving contract where |Q| ≪ corpus. For corpus-×-corpus jobs
    * (all-pairs mining) use [[Dedup.embeddingNearDupsBanded]], whose
    * bucket SELF-join never broadcasts either side. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bands: Int = 8, planesPerBand: Int = 6,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "q_id", queryVec: String = "q_vec",
      corpusSize: Option[Long] = None): DataFrame = {
    corpusSize.foreach(n =>
      Dedup.warnIfUnderPlaned("lshTopK", n, planesPerBand, maxBucketPairing = 512))
    val (cBase, cBuckets) =
      Dedup.embeddingStagesBanded(corpus, corpusVec, corpusId, bands, planesPerBand)
    // query side rides broadcasts (probes, qBase) — no widen under a
    // broadcast build (the exchange would only delay the build)
    val (qBase, qBuckets) =
      Dedup.embeddingStagesBanded(queries, queryVec, queryId, bands, planesPerBand,
        widen = false)
    // multi-probe: own bucket + flip each of the band's `planesPerBand` bits
    val probes = qBuckets.select(col("id").as("__qid"), col("band"),
      explode(array((-1 until planesPerBand).map {
        case -1 => col("sig")
        case p  => col("sig").bitwiseXOR(lit(1L << p))
      }: _*)).as("sig"))
    val candIds = cBuckets.select(col("id").as("__cid"), col("band"), col("sig"))
      .join(broadcast(probes), Seq("band", "sig"))
      .where(col("__cid") =!= col("__qid"))
      .select(col("__qid"), col("__cid"))
      .dropDuplicates("__qid", "__cid")
    val scored = candIds
      .join(cBase.select(col("id").as("__cid"), col("v").as("__cv"),
        col("nrm").as("__cn")), "__cid")
      .join(broadcast(qBase.select(col("id").as("__qid"), col("v").as("__qv"),
        col("nrm").as("__qn"))), "__qid")
      .withColumn("cos",
        Dedup.cosineFromNorms(col("__cv"), col("__qv"), col("__cn"), col("__qn")))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(round(col("cos"), 6).desc, col("__cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__qid").as(queryId), col("__cid").as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Empirical covariance matrix of an embedding column — the training
    * statistic for PCA / whitening / OPQ-style rotations in embedding
    * pipelines. ONE pass: the corpus folds into a single fixed-size
    * moments buffer via [[graft.functions.GramAgg]] (partial-aggregated
    * map-side — dim·(dim+3)/2+1 longs cross the exchange, never a
    * dim²-per-row explode), then the (i ≤ j, cov) triangle unpacks from
    * that one row with `cov_ij = E[x_i·x_j] − E[x_i]·E[x_j]` over the
    * exact fixed-point integer sums (per-term micro-unit rounding — see
    * GramAgg — makes the result engine- and partitioning-exact, which is
    * how this row hash-matches a SQL oracle). Eigen-decomposition of the
    * returned dim×dim matrix is driver-side math by construction (the
    * matrix is tiny; the DATA work is this one scan). Returns
    * (i, j, cov) for i ≤ j, 6 dp. */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    covarianceFromMoments(
      df.agg(graft.functions.GramAgg.vec_moments(
        col(vecCol).cast("array<double>"), dim).as("m")),
      dim)

  /** Covariance cells from an ALREADY-AGGREGATED one-row moments frame
    * (`m` = the [[graft.functions.GramAgg]] array) — the read side of the
    * STORED moments path: per-batch moment rows from
    * [[Sketches.gramSketch]] roll up losslessly through
    * [[Sketches.gramMerge]] (the moments are linear integer sums), so
    * covariance/drift over any stored time window derives without ever
    * re-scanning vectors. Bit-identical to [[covarianceMatrix]] on the
    * same data under any batch split (GramAggSpec pins it). */
  def covarianceFromMoments(m: DataFrame, dim: Int): DataFrame = {
    val pairs = m
      .select(col("m"), explode(sequence(lit(0), lit(dim - 1))).as("i"))
      .select(col("m"), col("i"),
        explode(sequence(col("i"), lit(dim - 1))).as("j"))
    val n = element_at(col("m"), 1).cast("double")
    val si = element_at(col("m"), (col("i") + 2).cast("int")).cast("double")
    val sj = element_at(col("m"), (col("j") + 2).cast("int")).cast("double")
    // upper-tri row-major: row i starts at i·dim − i(i−1)/2 (exact: the
    // product is even), entry (i, j) sits (j − i) further along
    val start = col("i") * dim - (col("i") * (col("i") - 1)) / 2
    val p = element_at(col("m"),
      (lit(1 + dim) + start + (col("j") - col("i")) + 1).cast("int"))
      .cast("double")
    // p/scale = E[x_i·x_j]; si/scale = E[x_i] (micro-units cancel);
    // + 0.0 collapses IEEE negative zero (round can yield −0.0, whose
    // textual form differs between engines)
    val scale = lit(1000000.0) * n
    pairs.select(col("i"), col("j"),
      (round(p / scale - (si / scale) * (sj / scale), 6) + lit(0.0)).as("cov"))
  }

  /** Two-sample embedding distribution drift — covariance cells of slice
    * A vs slice B (crawl N vs crawl N+1, pre- vs post-filter corpus) with
    * their absolute difference: the "has the embedding distribution
    * moved" diagnostic that decides when IVF/PQ quantizers and LSH
    * planes need retraining ([[kmeansStoreStep]] tracks drift
    * incrementally; this measures it exactly between two snapshots).
    * Diagonal rows (i = j) are per-dimension variance drift; summing
    * `dcov²` gives the Frobenius drift norm. Cost: one
    * [[covarianceMatrix]] pass per slice (fixed-size moment buffers,
    * map-side combined) + a dim²-cardinality join — corpus vectors never
    * shuffle. Returns (i, j, cov_a, cov_b, dcov) for i ≤ j, 6 dp. */
  def embeddingDrift(a: DataFrame, b: DataFrame, vecCol: String,
      dim: Int): DataFrame =
    covarianceMatrix(a, vecCol, dim).withColumnRenamed("cov", "cov_a")
      .join(covarianceMatrix(b, vecCol, dim).withColumnRenamed("cov", "cov_b"),
        Seq("i", "j"))
      .select(col("i"), col("j"), col("cov_a"), col("cov_b"),
        (round(abs(col("cov_a") - col("cov_b")), 6) + lit(0.0)).as("dcov"))

  /** Cross-set exact top-k by cosine — [[bruteForceTopK]] WITHOUT the
    * same-id exclusion: `corpus` and `queries` are different tables
    * (different id namespaces), so id equality across them is
    * meaningless, not a self-match. The margin-mining building block. */
  private def crossTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String): DataFrame = {
    // norms are per-vector quantities: compute once per side, so each of
    // the |corpus|·|queries| pairs costs ONE dot kernel instead of three
    // (bit-identical to Dedup.cosine, which is cosineFromNorms inlined)
    val c = corpus.withColumn("__cn", Dedup.vecNorm(col(corpusVec)))
    val q = queries.withColumn("__qn", Dedup.vecNorm(col(queryVec)))
    val joined = c.crossJoin(broadcast(q))
      .withColumn("cos", Dedup.cosineFromNorms(col(corpusVec), col(queryVec),
        col("__cn"), col("__qn")))
    val w = Window.partitionBy(col(queryId))
      .orderBy(round(col("cos"), 6).desc, col(corpusId).asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk, ACL 2019 —
    * the CCMatrix/NLLB bitext-mining score): for source set X and target
    * set Y (e.g. sentence embeddings of two languages), a candidate pair
    * scores `margin(x,y) = cos(x,y) / ((avg_kNN_cos(x→Y) +
    * avg_kNN_cos(y→X)) / 2)` — cosine normalized by both sides' local
    * neighborhood density, which suppresses hub vectors that score high
    * against EVERYTHING. Each x keeps its best-margin y ("max" strategy);
    * pairs below `threshold` drop. The mined pairs are the training
    * corpus for translation / cross-lingual alignment.
    *
    * Determinism (how this carries an exact SQL oracle): cosines are
    * 6-dp-rounded then lifted to integer MICRO-units
    * (`floor(cos·10⁶ + 0.5)` — the money-in-cents move); neighborhood
    * means stay exact-integer sums ÷ exact counts, so the margin is one
    * fixed-shape double expression over exact integers — bit-identical
    * in any engine. Ties in the per-x argmax break to the smallest y id.
    * A non-positive denominator (pathological anti-aligned neighborhoods)
    * yields no pair rather than a sign-flipped margin.
    *
    * Scale shape: both kNN passes here are the exact [[crossTopK]]
    * (correctness baseline — one broadcast of the smaller set per pass,
    * corpus never shuffles); at billion-pair scale generate the SAME
    * (q_id, neighbor_id, cos, rank) tables with the banded [[lshTopK]]
    * and feed them to [[marginMineFromKnn]] — the margin algebra only
    * ever touches the skinny kNN tables (id, id, long), never vectors. */
  def marginMine(xs: DataFrame, ys: DataFrame, k: Int, threshold: Double,
      xId: String = "x_id", xVec: String = "x_vec",
      yId: String = "y_id", yVec: String = "y_vec"): DataFrame = {
    val xk = crossTopK(ys.select(col(yId), col(yVec)),
      xs.select(col(xId), col(xVec)), k, yId, yVec, xId, xVec)
      .select(col(xId).as("q_id"), col("neighbor_id"), col("cos"))
    val yk = crossTopK(xs.select(col(xId), col(xVec)),
      ys.select(col(yId), col(yVec)), k, xId, xVec, yId, yVec)
      .select(col(yId).as("q_id"), col("neighbor_id"), col("cos"))
    marginMineFromKnn(xk, yk, threshold)
  }

  /** Margin scoring over PRECOMPUTED kNN tables — `xk` = X→Y neighbors,
    * `yk` = Y→X neighbors, both (q_id, neighbor_id, cos[, ...]) as
    * [[bruteForceTopK]]/[[lshTopK]] emit. Returns
    * (x_id, y_id, cos, margin) — the best-margin y per x at or above
    * `threshold`. All shuffles are skinny (id, id, long) rows. */
  def marginMineFromKnn(xk: DataFrame, yk: DataFrame,
      threshold: Double): DataFrame = {
    def micro(c: Column): Column =
      floor(c * 1000000.0 + 0.5).cast("long")
    val xAvg = xk.groupBy(col("q_id").as("x_id"))
      .agg(sum(micro(col("cos"))).as("__sx"), count(lit(1)).as("__cx"))
    val yAvg = yk.groupBy(col("q_id").as("y_id"))
      .agg(sum(micro(col("cos"))).as("__sy"), count(lit(1)).as("__cy"))
    val denom = (col("__sx").cast("double") / col("__cx") +
      col("__sy").cast("double") / col("__cy")) / 2.0
    val scored = xk
      .select(col("q_id").as("x_id"), col("neighbor_id").as("y_id"),
        col("cos"))
      .join(xAvg, "x_id")
      .join(yAvg, "y_id")
      .withColumn("margin",
        when(denom > 0,
          round(micro(col("cos")).cast("double") / denom, 6)))
    val w = Window.partitionBy(col("x_id"))
      .orderBy(col("margin").desc, col("y_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("margin").isNotNull &&
        col("margin") >= threshold)
      .select(col("x_id"), col("y_id"), col("cos"), col("margin"))
  }

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * diversity re-ranking — the serving-side counterpart of
    * [[kCenterSelect]]: from each query's candidate shortlist (an ANN /
    * BM25 rerank window), greedily pick k items maximizing
    * `λ·relevance − (1−λ)·max-cosine-to-already-picked` — relevant
    * results that aren't near-duplicates of each other (search result
    * diversification, RAG context packing, eval-set sampling per query).
    *
    * Determinism: relevance arrives 6-dp rounded (any kNN op here emits
    * that); each round's score and the running max-similarity fold are
    * fixed-shape 6-dp-rounded expressions; argmax ties break to the
    * smallest candidate id — a SQL oracle unrolls the rounds exactly.
    *
    * Scale shape — ALL queries progress in parallel, unlike the
    * single-loop kCenter: state is the (q_id, cand, rel, vec, maxsim)
    * table (|Q| × window rows, window human-bounded); each of the k
    * rounds is one pre-combined per-query argmax (min-of-struct — no
    * window, no sort), one broadcast-join of the |Q| selected rows back
    * for the max-sim fold, and an anti-join dropping the picks;
    * `localCheckpoint` per round keeps lineage flat. No driver actions
    * in the loop at all. Returns (q_id, rank, cand_id, score). */
  def mmrRerank(candidates: DataFrame, k: Int, lambdaPct: Int = 70,
      qIdCol: String = "q_id", candIdCol: String = "neighbor_id",
      relCol: String = "cos", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"mmrRerank needs k >= 1, got $k")
    require(lambdaPct >= 0 && lambdaPct <= 100, "lambdaPct in [0, 100]")
    // both coefficients parse as their own shortest decimal literal
    // (1.0 − 0.7 is 0.30000000000000004, NOT the 0.3 a SQL oracle
    // writes — derive 0.3 from the integer percent instead)
    val lam = lambdaPct / 100.0
    val oneMinusLam = (100 - lambdaPct) / 100.0
    var state = candidates.select(col(qIdCol).as("q_id"),
        col(candIdCol).as("cand_id"), col(relCol).as("rel"),
        col(vecCol).as("v"), lit(0.0).as("maxsim"))
      .localCheckpoint()
    val rounds = scala.collection.mutable.ListBuffer.empty[DataFrame]
    for (r <- 1 to k) {
      // floor(x·10⁶ + 0.5)/10⁶ instead of round(x, 6): round()'s internal
      // algorithm differs across engines exactly at the half-boundary a
      // λ-scaled product can land on; the floor formulation is the same
      // IEEE ops everywhere (the money-in-cents move)
      val score = floor((lit(lam) * col("rel") -
        lit(oneMinusLam) * col("maxsim")) * 1000000.0 + 0.5) / 1000000.0
      val sel = state
        .select(col("q_id"), struct((-score).as("ns"), col("cand_id").as("c"),
          score.as("s"), col("v").as("sv")).as("__pick"))
        .groupBy("q_id").agg(min(col("__pick")).as("__pick"))
        .select(col("q_id"), col("__pick.c").as("cand_id"),
          col("__pick.s").as("score"), col("__pick.sv").as("__sv"))
        .localCheckpoint()
      rounds += sel.select(col("q_id"), lit(r.toLong).as("rank"),
        col("cand_id"), col("score"))
      if (r < k) {
        state = state.join(broadcast(sel.select(col("q_id"),
            col("cand_id").as("__selc"), col("__sv"))), Seq("q_id"))
          .where(col("cand_id") =!= col("__selc"))
          .select(col("q_id"), col("cand_id"), col("rel"), col("v"),
            greatest(col("maxsim"),
              round(Dedup.cosine(col("v"), col("__sv")), 6)).as("maxsim"))
          .localCheckpoint()
      }
    }
    rounds.reduce(_ unionAll _)
  }

  /** Greedy k-center (farthest-point, Gonzalez 1985) diverse-subset
    * selection — the coreset/diversity sampler for training-data curation:
    * pick the min-id point, then k−1 times the UNCHOSEN point FARTHEST
    * (max min-cosine-distance) from everything chosen so far. The classic
    * 2-approximation to the k-center objective, and the standard "cover
    * the embedding space" selection for dedup-aware sampling.
    *
    * Determinism: distances are `round(1 − cos, 6)`; min-distances fold
    * as `least(prev, round(dist, 6))` — the exact nesting a SQL oracle
    * reproduces — and argmax ties break to the smallest id. Chosen ids
    * are EXCLUDED from later argmaxes (a ≤k-element isin filter), so a
    * duplicate-heavy corpus where every remaining distance is 0 still
    * yields k DISTINCT ids; asking for more centers than the input has
    * rows fails loudly, as does an empty input.
    *
    * Scale shape: each of the k rounds is ONE corpus scan folding the
    * running min-distance against a one-row broadcast center (the
    * codebook pattern — vectors never shuffle); the center's VECTOR rides
    * the same 1-row argmax collect that picks its id (no second scan to
    * fetch it — r11 finding) and re-enters the plan via a literal 1-row
    * frame; `localCheckpoint` per round keeps lineage flat. Cost is
    * k × one scan; k is a human-chosen selection budget, never
    * data-sized. Returns (sel_rank, vec_id) in selection order. */
  def kCenterSelect(df: DataFrame, vecCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"kCenterSelect needs k >= 1, got $k")
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .localCheckpoint()
    val vType = base.schema("v").dataType
    // the collected (id, v) row → a broadcast 1-row center frame; the
    // vector re-enters the plan without touching `base` again
    def centerRow(row: org.apache.spark.sql.Row): DataFrame = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cv", vType)))
      broadcast(spark.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row(row.get(1))), schema))
    }
    val firstRows = base.orderBy("id").limit(1).collect()
    require(firstRows.nonEmpty, "kCenterSelect: empty input")
    val chosen = scala.collection.mutable.ListBuffer((1L, firstRows(0).getLong(0)))
    var state = base.crossJoin(centerRow(firstRows(0)))
      .select(col("id"), col("v"),
        round(lit(1.0) - Dedup.cosine(col("v"), col("cv")), 6).as("mind"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val chosenIds = chosen.map(_._2).toSeq
      val nextRows = state.where(!col("id").isin(chosenIds: _*))
        .orderBy(col("mind").desc, col("id").asc)
        .limit(1).collect()
      require(nextRows.nonEmpty,
        s"kCenterSelect: k=$k exceeds the ${chosenIds.size} distinct input rows")
      chosen += ((r.toLong, nextRows(0).getLong(0)))
      state = state.crossJoin(centerRow(nextRows(0)))
        .select(col("id"), col("v"),
          least(col("mind"),
            round(lit(1.0) - Dedup.cosine(col("v"), col("cv")), 6)).as("mind"))
        .localCheckpoint()
    }
    import spark.implicits._
    chosen.toSeq.toDF("sel_rank", "vec_id")
  }

  /** Dominant principal component by power iteration — the PCA step
    * that sizes embedding whitening, matryoshka truncation, and "is one
    * direction eating the variance" drift diagnostics. Architecture
    * follows the moments rule: the DISTRIBUTED work is the one
    * [[covarianceMatrix]] scan (exact integer micro moments —
    * GramAggSpec pins batch-split invariance); the eigen-solve then
    * runs driver-side on the collected dim×dim cell table (dim is
    * 10¹–10³ — trivially driver-sized, the kmeans collect pattern), so
    * corpus scale only ever touches the moments scan. Sign fixes to a
    * positive first nonzero loading; a zero-variance corpus fails
    * loudly. Returns dim rows (pos, loading, eigenvalue), micro-floored.
    * `iters` is a convergence budget, never data-sized. */
  def powerIteration(df: DataFrame, vecCol: String, dim: Int,
      iters: Int = 30): DataFrame = {
    require(iters >= 1, s"powerIteration needs iters >= 1, got $iters")
    val spark = df.sparkSession
    val cells = covarianceMatrix(df, vecCol, dim).collect()
    val c = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      c(i)(j) = v; c(j)(i) = v
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(0.0)((acc, j) => acc + c(i)(j) * v(j)))
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0, "powerIteration: zero-variance input")
      v = w.map(_ / nrm)
    }
    val firstNz = v.indexWhere(x => math.abs(x) > 1e-12)
    if (firstNz >= 0 && v(firstNz) < 0) v = v.map(x => -x)
    val lam = (0 until dim).foldLeft(0.0)((acc, i) =>
      acc + v(i) * (0 until dim).foldLeft(0.0)((a, j) => a + c(i)(j) * v(j)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("loading",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("eigenvalue",
        org.apache.spark.sql.types.DoubleType)))
    val lamM = math.floor(lam * 1000000.0 + 0.5) / 1000000.0
    val rows = (0 until dim).map(i => org.apache.spark.sql.Row(
      i, math.floor(v(i) * 1000000.0 + 0.5) / 1000000.0, lamM))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }

  /** Per-dimension (min, max) quantization range of an embedding corpus
    * as ONE row (mn, mx double arrays) — the scalar quantizer's training
    * step. posexplode + groupBy(pos) pre-combines map-side (min/max are
    * algebraic), so the shuffle carries dim × partitions rows; the
    * dim-cardinality table then folds into sorted arrays. */
  def sq8Stats(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"),
        col("mx")))).as("a"))
      .select(transform(col("a"), s => s.getField("mn")).as("mn"),
        transform(col("a"), s => s.getField("mx")).as("mx"))

  // code_i = floor((x_i − mn_i) / (mx_i − mn_i) · 255 + 0.5) ∈ [0, 255];
  // a degenerate dimension (mx == mn) codes to 0. Codes CLAMP to
  // [0, 255] so query vectors outside the corpus-trained range still
  // honor the int8 contract (corpus vectors are in range by
  // construction — the clamp is a no-op for them). One fixed-shape
  // double expression over the exactly-widened float — spelled
  // identically in the DuckDB oracle.
  private def sq8Code(vec: Column, mn: Column, mx: Column): Column =
    transform(sequence(lit(0), size(vec) - 1), i => {
      val x = element_at(vec, (i + 1).cast("int")).cast("double")
      val lo = element_at(mn, (i + 1).cast("int"))
      val hi = element_at(mx, (i + 1).cast("int"))
      when(hi > lo,
        greatest(lit(0L), least(lit(255L),
          floor(((x - lo) / (hi - lo)) * 255.0 + 0.5).cast("long"))))
        .otherwise(lit(0L))
    })

  /** Scalar (int8) quantization serving path — the memory-bound half of
    * the quantization family next to PQ/ADC ([[pqAdcTopK]]): per-dim
    * min-max codes shrink float32 vectors 4× (and integer dot products
    * replace float kernels — on real serving hardware the int8 SIMD
    * path), at far better fidelity than PQ's codebook but none of its
    * sub-linear scan savings. Ranking is by SYMMETRIC quantized dot —
    * exact integer arithmetic end to end, so unlike the LSH/IVF rows
    * this path is hash-provable, not recall-bounded.
    *
    * Scale shape: the (mn, mx) stats ride ONE broadcast row (the ivf
    * codebook pattern — corpus partitioning preserved); encoding is a
    * scan-side projection; after encoding, floats never move — the
    * serving join carries (id, long-code) only; the top-k is the
    * [[bruteForceTopK]] broadcast-queries window shape with integer
    * scores and id tie-breaks. Returns (q_id, neighbor_id, score,
    * rank). */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    val st = broadcast(sq8Stats(corpus, corpusVec))
    val c = corpus.crossJoin(st)
      .select(col(corpusId),
        sq8Code(col(corpusVec), col("mn"), col("mx")).as("__code"))
    val q = queries.crossJoin(st)
      .select(col(queryId),
        sq8Code(col(queryVec), col("mn"), col("mx")).as("__qcode"))
    val scored = c.crossJoin(broadcast(q))
      .where(col(corpusId) =!= col(queryId))
      .withColumn("score", aggregate(
        zip_with(col("__code"), col("__qcode"), _ * _), lit(0L), _ + _))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("score").desc, col(corpusId).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"),
        col("score"), col("rank"))
  }
}
