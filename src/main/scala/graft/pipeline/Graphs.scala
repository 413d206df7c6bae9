package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over relational edge lists — the crawl-prioritization
  * face of the corpus pipeline: given a domain→domain link graph (e.g.
  * from [[TextAnalysis]]'s URL/domain extraction over a web corpus),
  * PageRank scores feed source weighting and frontier ordering the same
  * way quality scores feed document filtering.
  *
  * Fixed-point integer arithmetic throughout: total rank mass is 10^9
  * "rank units", every division is integer floor division, so ANY engine
  * (and any partitioning/summation order) reproduces the scores
  * bit-for-bit — the money-in-cents move applied to eigenvector mass.
  */
object Graphs {

  /** Ancestor closure over a FOREST (child → parent edges): every node's
    * root and depth — the recursive-hierarchy query (org charts, BOM
    * explosion, category trees) that Spark lacks a `WITH RECURSIVE` for.
    * Pointer doubling: each round joins the state to itself on the
    * current ancestor, DOUBLING the jump distance, so a depth-D
    * hierarchy closes in ⌈log₂ D⌉ rounds of skinny (node, anc, depth)
    * self-joins — never D sequential passes. Roots (nodes with no parent
    * edge) fix to themselves at distance 0, which makes the iteration a
    * fixpoint once every pointer reaches a root. `maxIter` bounds depth
    * at 2^maxIter; per-round `localCheckpoint` keeps the plan flat.
    * Returns (node, root, depth) for every node in the forest. */
  def forestRootDepth(edges: DataFrame, maxIter: Int = 6,
      childCol: String = "child", parentCol: String = "parent"): DataFrame = {
    val e = edges.select(col(childCol).as("node"), col(parentCol).as("p"))
      .localCheckpoint()
    val roots = e.select(col("p").as("node"))
      .unionAll(e.select(col("node"))).distinct()
      .join(e.select(col("node")), Seq("node"), "left_anti")
    var state = e.select(col("node"), col("p").as("anc"), lit(0L).as("d"))
      .unionAll(roots.select(col("node"), col("node").as("anc"), lit(-1L).as("d")))
      .select(col("node"), col("anc"), (col("d") + 1).as("d"))
      .localCheckpoint()
    // after the unionAll: non-roots (node, parent, 1), roots (node, node, 0)
    for (_ <- 1 to maxIter) {
      val jumped = state.as("s1")
        .join(state.as("s2"), col("s1.anc") === col("s2.node"))
        .select(col("s1.node").as("node"), col("s2.anc").as("anc"),
          (col("s1.d") + col("s2.d")).as("d"))
      state = jumped.localCheckpoint()
    }
    // Fail loudly instead of returning a partial closure: at fixpoint
    // EVERY pointer must have reached a root (roots point at themselves,
    // so a converged anc is always in the root set). A hierarchy deeper
    // than 2^maxIter would otherwise silently report an intermediate
    // ancestor as the root. One skinny anti-join against the (small) root
    // set; state is already checkpointed so this re-scans, not re-derives.
    val unconverged = state
      .join(roots.select(col("node").as("anc")), Seq("anc"), "left_anti")
      .limit(1).count()
    require(unconverged == 0L,
      s"forestRootDepth: some node(s) did not reach a root in $maxIter " +
        s"doubling rounds (hierarchy deeper than 2^$maxIter); raise maxIter")
    state.select(col("node"), col("anc").as("root"), col("d").as("depth"))
  }

  /** HITS hubs & authorities (Kleinberg 1999) for a fixed iteration count
    * over unweighted `edges` (src, dst) — the link-spam-resistant
    * complement to [[pagerank]] for domain curation: a hub score flags
    * aggregator/directory domains, an authority score flags content
    * domains worth crawl budget.
    *
    * Per half-iteration: new authority mass = Σ incoming hub scores, then
    * rescaled so total mass is 10⁶ "ppm" units (`(raw·10⁶) div Σraw` —
    * integer floor division stands in for the L1 normalization);
    * symmetrically for hubs. The ppm scale keeps every intermediate under
    * 2⁶³ for graphs up to ~10⁶ max in-degree × 10⁶ nodes; rescale the
    * constant for denser graphs.
    *
    * Scale shape: each half-iteration is one skinny (node, long) join
    * against edges plus one pre-combined groupBy and a one-row total
    * broadcast; per-round `localCheckpoint` keeps the plan flat. Returns
    * (node, hub_ppm, auth_ppm). */
  def hits(edges: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1)
    val scale = 1000000L
    // materialize the (graph-cardinality) edge list ONCE — every
    // half-iteration's checkpoint action would otherwise re-run the
    // upstream edge-building joins from scratch
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    // r20: normalize no longer left-joins the node universe per
    // half-step — a node absent from `raw` would get score 0, and zero
    // scores are INERT through the propagation (they contribute nothing
    // to either half-step's incoming sums and nothing to the rescale
    // total), so carrying them through every iteration only added a
    // join + its AQE stage-jobs per half-step (q34 profiled 62
    // scheduling-bound ~45 ms jobs at sf0.1, construct-dominated). The
    // node universe re-attaches ONCE in the final select, where the
    // missing rows take their provable 0. Scores and totals are the
    // same integers as before at every step.
    def normalize(raw: DataFrame): DataFrame = {
      val tot = raw.agg(sum(col("raw")).as("tot"))
      raw.crossJoin(broadcast(tot))
        .select(col("node"), expr(s"(raw * $scale) div tot").as("score"))
    }
    val n = nodes.count()
    require(n > 0, "hits needs a non-empty edge list")
    var hubs = nodes.select(col("node"), lit(scale / n).as("score"))
    var auths: DataFrame = null
    for (it <- 1 to iters) {
      // ONE checkpoint per iteration, on hubs: the auth half-step's plan
      // nests inside it at fixed depth 2, so lineage stays flat while the
      // per-iteration job count halves (r19: q34 ran 65 scheduling-bound
      // jobs at sf0.1 with a checkpoint per HALF-step). auths checkpoints
      // only on the last iteration, where the caller's final join reads it.
      auths = normalize(e.join(hubs.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("score")).as("raw")))
      if (it == iters) auths = auths.localCheckpoint()
      hubs = normalize(e.join(auths.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(sum(col("score")).as("raw")))
        .localCheckpoint()
    }
    nodes
      .join(hubs.withColumnRenamed("score", "hub_ppm"), Seq("node"), "left")
      .join(auths.withColumnRenamed("score", "auth_ppm"), Seq("node"), "left")
      .select(col("node"), coalesce(col("hub_ppm"), lit(0L)).as("hub_ppm"),
        coalesce(col("auth_ppm"), lit(0L)).as("auth_ppm"))
  }

  /** Weighted PageRank with damping d = dampingPct/100 for a fixed
    * iteration count over `edges` (src, dst, w):
    *
    *   rank₀(v)   = 10⁹ div N
    *   rankₜ₊₁(v) = ((100−d)·rank₀) div 100 +
    *                (d · Σ_{u→v} (rankₜ(u)·w(u,v)) div outw(u)) div 100
    *
    * Dangling-node mass (nodes with no out-edges) decays rather than
    * redistributing — acceptable for ranking (relative order of connected
    * mass is unaffected) and keeps every term a per-edge integer.
    *
    * Scale shape: per iteration — the rank table is (node, long), node-
    * cardinality, so the edges⋈ranks join shuffles edges ONCE on src (or
    * broadcasts ranks when the graph's node set fits), and the in-mass
    * aggregation is one pre-combined groupBy(dst). Per-round
    * `localCheckpoint` keeps the plan flat (the iterative-algorithm
    * invariant — lineage would otherwise grow multiplicatively). The only
    * driver action is N, one scalar. */
  def pagerank(edges: DataFrame, iters: Int, dampingPct: Int = 85,
      srcCol: String = "src", dstCol: String = "dst",
      wCol: String = "w"): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // materialize the (graph-cardinality) edge list ONCE — every
    // iteration's checkpoint action would otherwise re-run the upstream
    // edge-building joins from scratch
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("long").as("w"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pagerank needs a non-empty edge list")
    val init = 1000000000L / n
    val teleport = (100L - dampingPct) * init / 100L
    val outW = e.groupBy("src").agg(sum(col("w")).as("outw"))
    var ranks = nodes.select(col("node"), lit(init).as("rank"))
    for (_ <- 1 to iters) {
      val inMass = e.join(outW, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("(rank * w) div outw").as("m"))
        .groupBy("node").agg(sum(col("m")).as("in_mass"))
      ranks = nodes.join(inMass, Seq("node"), "left")
        .select(col("node"), (lit(teleport) +
          expr(s"($dampingPct * coalesce(in_mass, 0L)) div 100")).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Exact global triangle count via DEGREE ORIENTATION (Suri &
    * Vassilvitskii, WWW'11, "Counting triangles and the curse of the last
    * reducer") — the clustering/community-density signal for link-graph
    * curation. Each undirected edge orients from its lower-(degree, id)
    * endpoint to the higher, so every wedge is generated at its LOWEST-
    * order apex: out-degrees under this orientation are O(√m) on any
    * graph, which caps the wedge explosion a hub vertex causes under the
    * naive formulation (the "last reducer" skew — a degree-10⁶ hub would
    * otherwise emit 10¹² wedges from one key). Each triangle is generated
    * exactly once (at its lowest-order vertex, closed by its
    * lowest-order edge), so the count needs no /3 or /6 correction.
    *
    * Scale shape: dedup + degree join are skinny (node/edge, long)
    * shuffles; the wedge self-join keys on the apex and the closing join
    * keys on the (v1, v2) pair — both hash equi-joins; nothing wider than
    * (id, id, long) ever moves. Input orientation/duplicates/self-loops
    * are normalized here. Returns one row (triangles). */
  def triangleCount(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame =
    triangleNodes(edges, srcCol, dstCol)._1
      .agg((count(lit(1)) / 3).cast("long").as("triangles"))

  /** Local clustering coefficient per node: 2·T(v) / (deg(v)·(deg(v)−1)) —
    * the community-density / link-spam signal per vertex. Triangles come
    * from the SAME degree-oriented machinery as [[triangleCount]] (each
    * triangle contributes one membership row per corner); degrees are the
    * undirected distinct-neighbor counts. Nodes with deg < 2 have
    * coefficient 0 by convention. Returns (node, deg, triangles, coeff),
    * coeff rounded at 6 dp (exact integer inputs, one double division —
    * engine-reproducible). */
  def clusteringCoefficient(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val (members, deg) = triangleNodes(edges, srcCol, dstCol)
    val perNode = members.groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("deg") >= 2,
          round(coalesce(col("triangles"), lit(0L)) * 2.0 /
            (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)).as("coeff"))
  }

  /** Shared degree-orientation core: one membership row per (triangle,
    * corner) plus the undirected degree table. Global count = rows/3. */
  private def triangleNodes(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame) = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    // orient by the (deg, node) total order; carry the head's order key so
    // wedges can impose the same order on their two far endpoints without
    // a global rank table
    val oriented = withDeg.select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("v"), col("da").as("dv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .localCheckpoint() // reused by the wedge self-join AND the closing join
    // wedge (u→v1, u→v2) with (dv1,v1) < (dv2,v2): the closing edge, if it
    // exists, is oriented v1→v2 under the SAME total order; each triangle
    // is generated exactly once (at its lowest-order apex)
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") &&
          struct(col("x.dv"), col("x.v")) < struct(col("y.dv"), col("y.v")))
      .select(col("x.u").as("apex"), col("x.v").as("u"), col("y.v").as("v"))
    val triangles = wedges.join(oriented.select("u", "v"), Seq("u", "v"))
    val members = triangles.select(
        explode(array(col("apex"), col("u"), col("v"))).as("node"))
    (members, deg)
  }

  /** Seeded label propagation (semi-supervised label spreading, Zhu &
    * Ghahramani 2002 shape) over an undirected graph — the
    * label-expansion primitive for corpus curation: a few human-labeled
    * seeds (quality tiers, toxicity, topical domains) spread through a
    * similarity/link graph to label every reachable node.
    *
    * Per round, every node's per-label mass is the sum of its neighbors'
    * mass; SEEDS ARE CLAMPED back to (seed label, 10⁶) each round (the
    * standard semi-supervised constraint — ground truth never drifts).
    * All mass is integer and unnormalized, so any partitioning and any
    * engine reproduces it bit-for-bit; with S seeds and max degree d the
    * largest mass after k rounds is ≤ 10⁶·S·dᵏ. That envelope is ENFORCED,
    * not just documented (the [[forestRootDepth]] fail-loudly tradition):
    * before each round a max-mass probe over the (already checkpointed)
    * skinny state requires max(m) ≤ Long.Max / max-degree — the exact
    * precondition under which the coming round's neighbor sum cannot wrap
    * — and fails with a clear message (fewer iters, or pre-aggregate the
    * graph) instead of letting a hub graph overflow silently. Cost: one
    * scalar agg per round over cached (node, label, long) rows.
    * Final label = argmax mass, ties to the SMALLEST label id
    * (deterministic). Seeds are labeled by their clamp; unreachable
    * unlabeled nodes are absent from the output.
    *
    * Scale shape: per round one skinny (node, label, long) join against
    * the mirrored edge list + one pre-combined groupBy — the PageRank
    * cost envelope with a label-cardinality fan-out (bounded: labels are
    * human-defined tiers, not data). `localCheckpoint` per round keeps
    * lineage flat. */
  def labelPropagation(edges: DataFrame, seeds: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", labelCol: String = "label"): DataFrame = {
    require(iters >= 1)
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val und = canon.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(canon.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    // undirected max degree (und is mirrored, so out-degree IS degree):
    // the worst-case per-(node,label) fan-in of one propagation round
    val degMax = math.max(1L, und.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max(col("d")).as("dm")).collect()(0).getLong(0))
    val seedState = seeds
      .select(col(nodeCol).as("node"), col(labelCol).cast("long").as("label"),
        lit(1000000L).as("m"))
      .localCheckpoint()
    val seedNodes = seedState.select("node")
    var state = seedState
    for (r <- 1 to iters) {
      // overflow envelope, enforced BEFORE the sum that would wrap: the
      // round's in-mass per (node, label) is at most degMax · max(m)
      val maxM = state.agg(max(col("m")).as("mm")).collect()(0).getLong(0)
      require(maxM <= Long.MaxValue / degMax,
        s"labelPropagation: round $r max mass $maxM times max degree " +
          s"$degMax would overflow Long — use fewer iters or pre-aggregate " +
          "the graph (10^6-unit seed mass grows as degree^rounds)")
      val prop = und
        .join(state.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(sum(col("m")).as("m"))
      state = prop.join(seedNodes, Seq("node"), "left_anti")
        .unionAll(seedState)
        .localCheckpoint()
    }
    state.groupBy("node")
      .agg(min(struct((-col("m")).as("nm"), col("label").as("l"))).as("best"))
      .select(col("node"), col("best.l").as("label"))
  }

  /** k-core: the maximal subgraph where every node keeps degree ≥ k —
    * the dense-subgraph extractor (spam rings, genuine communities vs
    * long tails) completing the density family next to triangles and
    * clustering coefficients. Iterative peel: drop all nodes of degree
    * < k simultaneously, re-count, repeat to fixpoint. Converges in at
    * most graph-diameter-ish rounds; fails LOUDLY past `maxRounds`
    * (forestRootDepth tradition) instead of silently truncating.
    *
    * Scale shape per round: ONE pre-combined degree aggregate over the
    * (a, b) edge table + two semi-joins against the skinny keep set;
    * edges `localCheckpoint` per round (the iterative-lineage rule);
    * the only driver value is the edge count driving the fixpoint test.
    * Edge-count fixpoint is sound: unchanged edges ⇒ unchanged degrees
    * ⇒ unchanged keep set. Returns (node, deg) of the surviving core —
    * empty when no k-core exists. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 50,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(k >= 1, s"kCore needs k >= 1, got $k")
    val a = least(col(srcCol), col(dstCol))
    val b = greatest(col(srcCol), col(dstCol))
    var e = edges.select(a.as("a"), b.as("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint()
    var n = e.count()
    var stable = false
    var rounds = 0
    while (!stable) {
      rounds += 1
      require(rounds <= maxRounds,
        s"kCore: no fixpoint after $maxRounds peel rounds — raise " +
          "maxRounds (peel cascades are at most node-count deep)")
      val deg = e.select(col("a").as("node"))
        .unionAll(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k).select("node").localCheckpoint()
      val e2 = e
        .join(keep.withColumnRenamed("node", "__ka"),
          col("a") === col("__ka"), "left_semi")
        .join(keep.withColumnRenamed("node", "__kb"),
          col("b") === col("__kb"), "left_semi")
        .localCheckpoint()
      val n2 = e2.count()
      if (n2 == n) stable = true
      e = e2
      n = n2
    }
    e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }
}
