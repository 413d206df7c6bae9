package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Graphs

/** Fixed-point PageRank / HITS: partitioning invariance (the point of the
  * integer arithmetic), direction of the scores on known shapes, and
  * dangling-mass behavior. */
class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // star graph: every spoke links to the hub, hub links to one spoke
  private def starEdges = Seq(
    (1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L), (4L, 0L, 1L), (0L, 1L, 1L)
  ).toDF("src", "dst", "w")

  test("pagerank: hub of a star outranks spokes; results partitioning-invariant") {
    val r1 = Graphs.pagerank(starEdges.repartition(1), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r7 = Graphs.pagerank(starEdges.repartition(7), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r7, "integer fixed-point must be partitioning-invariant")
    assert(r1(0L) > r1(2L) && r1(0L) > r1(3L), s"hub must outrank spokes: $r1")
    // total mass never exceeds the initial 1e9 (floor divisions + dangling
    // decay only lose mass)
    assert(r1.values.sum <= 1000000000L)
  }

  test("pagerank: weighted edges shift rank toward the heavy target") {
    // 0 links to 1 (w=9) and 2 (w=1)
    val e = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "w")
    val r = Graphs.pagerank(e, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L), s"9:1 edge weight must rank 1 above 2: $r")
  }

  test("pagerank: dangling mass decays, teleport keeps every node positive") {
    val e = Seq((0L, 1L, 1L), (1L, 2L, 1L)).toDF("src", "dst", "w") // 2 dangles
    val r = Graphs.pagerank(e, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.values.forall(_ > 0L), s"teleport floor must keep ranks positive: $r")
    assert(r.values.sum < 1000000000L, "dangling mass must decay")
  }

  test("randomized: pagerank and hits are partitioning-invariant, mass bounded") {
    val rnd = new scala.util.Random(777)
    for (_ <- 1 to 5) {
      val edges = (1 to 40).map(_ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong, 1L + rnd.nextInt(5)))
        .filter(e => e._1 != e._2).distinct
      val e = edges.toDF("src", "dst", "w")
      val pr1 = Graphs.pagerank(e.repartition(1), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val pr8 = Graphs.pagerank(e.repartition(8), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(pr1 == pr8, "pagerank must not depend on partitioning")
      assert(pr1.values.sum <= 1000000000L && pr1.values.forall(_ > 0L))
      val h1 = Graphs.hits(e.repartition(1), iters = 2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val h8 = Graphs.hits(e.repartition(8), iters = 2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(h1 == h8, "hits must not depend on partitioning")
      assert(h1.values.map(_._1).sum <= 1000000L &&
        h1.values.map(_._2).sum <= 1000000L)
    }
  }

  test("forestRootDepth: a 50-deep chain closes in log rounds; multi-tree forests keep roots apart") {
    // chain 1->0, 2->1, ..., 49->48 (depth up to 49 needs only 6 doubling
    // rounds), plus a separate 2-node tree rooted at 100
    val edges = ((1L to 49L).map(i => (i, i - 1)) :+ (101L, 100L))
      .toDF("child", "parent")
    val out = Graphs.forestRootDepth(edges, maxIter = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (i <- 0L to 49L)
      assert(out(i) == (0L, i), s"node $i: ${out(i)}")
    assert(out(100L) == (100L, 0L) && out(101L) == (100L, 1L),
      "second tree must keep its own root")
  }

  test("forestRootDepth: fails loudly when the hierarchy exceeds 2^maxIter") {
    // depth-8 chain with maxIter=2 (reach 2^2=4): must throw, not return
    // an intermediate ancestor as the root
    val edges = (1L to 8L).map(i => (i, i - 1)).toDF("child", "parent")
    val e = intercept[IllegalArgumentException](
      Graphs.forestRootDepth(edges, maxIter = 2))
    assert(e.getMessage.contains("did not reach a root"))
  }

  test("triangleCount: counts exactly once; orientation handles duplicates and hubs") {
    // K4 has 4 triangles; an extra pendant edge adds none. Feed edges in
    // BOTH orientations plus duplicates and a self-loop — normalization
    // must collapse them all.
    val k4 = for {
      a <- 0L to 3L; b <- 0L to 3L if a != b
    } yield (a, b)
    val edges = (k4 ++ Seq((0L, 0L), (3L, 9L), (9L, 3L), (1L, 2L)))
      .toDF("src", "dst")
    val n = Graphs.triangleCount(edges).head().getLong(0)
    assert(n == 4L, s"K4 + pendant must have 4 triangles, got $n")
    // a hub star has no triangles at any fan-out
    val star = (1L to 40L).map(i => (0L, i)).toDF("src", "dst")
    assert(Graphs.triangleCount(star).head().getLong(0) == 0L)
    // partitioning invariance (exact count)
    val n7 = Graphs.triangleCount(edges.repartition(7)).head().getLong(0)
    assert(n7 == 4L)
  }

  test("clusteringCoefficient: K4 corners are 1.0, pendant 0, bridge scales") {
    // K4 (nodes 0-3) + pendant 9 attached to 3: nodes 0-2 have deg 3 and
    // all 3 of their neighbor pairs closed (coeff 1.0); node 3 has deg 4
    // with 3 of its 6 pairs closed (0.5); node 9 has deg 1 (0.0)
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    val edges = (k4 :+ ((3L, 9L))).toDF("src", "dst")
    val out = Graphs.clusteringCoefficient(edges)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(0L) == ((3L, 3L, 1.0)) && out(1L) == ((3L, 3L, 1.0)) &&
      out(2L) == ((3L, 3L, 1.0)), s"K4 corners: $out")
    assert(out(3L) == ((4L, 3L, 0.5)), s"bridge node: $out")
    assert(out(9L) == ((1L, 0L, 0.0)), s"pendant: $out")
  }

  test("labelPropagation: spreads from seeds, clamps seeds, ties to smallest label") {
    // path 0-1-2-3-4, seeds 0→10 and 4→20: after 2 rounds node 1 takes 10,
    // node 3 takes 20, and node 2 receives EQUAL mass from both sides —
    // the deterministic tie-break must pick the smaller label
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq((0L, 10L), (4L, 20L)).toDF("node", "label")
    val out = Graphs.labelPropagation(edges, seeds, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 10L, 1L -> 10L, 2L -> 10L, 3L -> 20L, 4L -> 20L),
      s"unexpected labels: $out")
    // partitioning invariance (integer mass, no normalization)
    val out7 = Graphs.labelPropagation(edges.repartition(7), seeds, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out7 == out)
    // a seed surrounded by the other label keeps its clamp
    val hostile = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val seeds2 = Seq((0L, 99L), (1L, 5L), (2L, 5L), (3L, 5L)).toDF("node", "label")
    val o2 = Graphs.labelPropagation(hostile, seeds2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(o2(0L) == 99L, s"seed must stay clamped: $o2")
  }

  test("labelPropagation: hub-graph mass overflow fails loudly, not silently") {
    // an UNLABELED 100-clique with one seed touching every member: clique
    // masses multiply by ~99 per round (10^6 · 99^(r-1)), so by round 8
    // the neighbor sum would exceed Long.Max — the per-round guard must
    // trip BEFORE the wrap (max(m) · degMax > Long.Max), with a clear
    // message, while a shallow run on the same graph stays fine
    val clique = (for {
      a <- 1 to 100; b <- (a + 1) to 100
    } yield (a.toLong, b.toLong)).toDF("src", "dst")
    val edges = clique.unionAll(
      (1 to 100).map(n => (0L, n.toLong)).toDF("src", "dst"))
    val seeds = Seq((0L, 7L)).toDF("node", "label")
    // 3 rounds: max mass ~10^10 — comfortably inside the envelope
    val ok = Graphs.labelPropagation(edges, seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.size == 101 && ok.values.forall(_ == 7L), s"shallow run: $ok")
    val e = intercept[IllegalArgumentException] {
      Graphs.labelPropagation(edges, seeds, iters = 9)
    }
    assert(e.getMessage.contains("overflow"), e.getMessage)
  }

  test("kCore: clique survives the peel, cascades converge, no-core empties, cap is loud") {
    // K4 + a pendant: at k=3 the pendant peels, the clique stays deg 3
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b))
    val edges = (k4 ++ Seq((3L, 9L))).toDF("src", "dst")
    val core = Graphs.kCore(edges, k = 3).orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(core == Seq(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // a path has no 2-core: ends peel, new ends peel — the CASCADE must
    // run to an empty fixpoint across multiple rounds, not one
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    assert(Graphs.kCore(path, k = 2).count() == 0)
    // round cap fails loudly, never silently truncates
    intercept[IllegalArgumentException] {
      Graphs.kCore(path, k = 2, maxRounds = 2).count()
    }
  }

  test("hits: directory page is the hub, linked pages the authorities; partitioning-invariant") {
    // 0 links to 1,2,3 (a directory); 4 links to 1 as well
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 1L)).toDF("src", "dst")
    val h1 = Graphs.hits(e.repartition(1), iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val h5 = Graphs.hits(e.repartition(5), iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h1 == h5, "integer fixed-point must be partitioning-invariant")
    assert(h1(0L)._1 > h1(4L)._1, s"3-out directory must out-hub 1-out node: $h1")
    assert(h1(1L)._2 > h1(2L)._2, s"doubly-linked page must out-auth others: $h1")
    assert(h1(0L)._2 == 0L, "unlinked node has zero authority")
  }
}
