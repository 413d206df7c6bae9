package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{AdaptiveParts, Dedup}

/** Input-statistics exchange sizing (r17 verdict ask #1): the chooser is
  * monotone in the estimate and clamped to [session floor, MaxParts]; the
  * capped-star pair pricing is exact; and the candidate-join operators
  * actually WIRE it — a pair estimate above the target forces a
  * REPARTITION_BY_NUM exchange of the computed width into the physical
  * plan, while results stay identical to the un-sized plan. */
class AdaptivePartsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def repartitionWidths(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
    df.count() // finalize the AQE plan before reading it
    val p = df.queryExecution.executedPlan.toString
    // the r19 widenNarrowScan input fix repartitions narrow SCANS to
    // defaultParallelism — those exchanges are input hygiene, not
    // candidate-join sizing; this helper measures SIZING exchanges only
    val widen = spark.sparkContext.defaultParallelism
    raw"hashpartitioning\([^)]*, (\d+)\), REPARTITION_BY_NUM".r
      .findAllMatchIn(p).map(_.group(1).toInt).filterNot(_ == widen).toSeq
  }

  /** r19 advice: a genuine sizing exchange whose width happens to equal
    * the host's core count would be silently dropped by the widen filter
    * above — every test asserting a sizing width must first prove its
    * fixture does not collide (loud fixture error, never a blind spot). */
  private def requireNoWidenCollision(expected: Int): Unit =
    assert(expected != spark.sparkContext.defaultParallelism,
      s"fixture sizing width $expected collides with defaultParallelism — " +
        "adjust the test's rowsPerPartition so the assertion can see it")

  test("partsFor: monotone in the estimate, clamped to [floor, MaxParts]") {
    val floor = 32
    assert(AdaptiveParts.partsFor(0L, floor) == floor)
    assert(AdaptiveParts.partsFor(1L, floor) == floor)
    // below floor * target rows → floor (small inputs keep the r17 plan)
    assert(AdaptiveParts.partsFor(
      AdaptiveParts.RowsPerPartition * floor, floor) == floor)
    // scales linearly with the estimate past the floor
    assert(AdaptiveParts.partsFor(
      AdaptiveParts.RowsPerPartition * 100, floor) == 100)
    assert(AdaptiveParts.partsFor(
      AdaptiveParts.RowsPerPartition * 100 + 1, floor) == 101)
    // monotone across a sweep
    val sweep = Seq(1L, 1000L, 1000000L, 100000000L, 10000000000L)
      .map(AdaptiveParts.partsFor(_, floor))
    assert(sweep == sweep.sorted, s"must be monotone: $sweep")
    // upper clamp
    assert(AdaptiveParts.partsFor(Long.MaxValue / 2, floor) ==
      AdaptiveParts.MaxParts)
  }

  test("cappedPairEstimate prices the capped-star rule exactly per bucket") {
    // bucket sizes 1, 3, 5, 100 at cap 4:
    //   m=1 → 0; m=3 → C(3,2)=3; m=5 → C(4,2)+1=7; m=100 → C(4,2)+96=102
    val ranked = Seq(1, 3, 5, 100).zipWithIndex.flatMap { case (m, b) =>
      (1 to m).map(i => (s"bucket$b", i.toLong, i))
    }.toDF("fp", "id", "rn")
    assert(AdaptiveParts.cappedPairEstimate(ranked, Seq("fp"), 4) ==
      3L + 7L + 102L)
    // and the estimate equals the operator's REAL pre-dedup output here
    // (ids are bucket-local so no pair collapses in the dedup)
    val ranked2 = Seq(1, 3, 5, 100).zipWithIndex.flatMap { case (m, b) =>
      (1 to m).map(i => (s"bucket$b", b * 1000L + i, i))
    }.toDF("fp", "id", "rn")
    assert(Dedup.cappedPairs(ranked2, Seq("fp"), 4).count() == 3L + 7L + 102L)
  }

  test("allPairEstimate prices the uncapped prefix join") {
    val rows = Seq(2, 4).zipWithIndex.flatMap { case (m, b) =>
      (1 to m).map(i => (s"t$b", i.toLong))
    }.toDF("tok", "id")
    assert(AdaptiveParts.allPairEstimate(rows, Seq("tok")) == 1L + 6L)
  }

  test("cappedPairs sizes its exchanges from the pair estimate (wired)") {
    // one hot bucket of 200 rows, cap 64: estimate = C(64,2)+136 = 2152
    val ranked = (1 to 200).map(i => ("hot", i.toLong, i)).toDF("fp", "id", "rn")
      .localCheckpoint()
    val floor = AdaptiveParts.sessionFloor(spark)
    val tiny = 100L // rows per partition — forces sizing on a test fixture
    val expected = AdaptiveParts.partsFor(2152L, floor, tiny)
    assert(expected > floor, s"fixture must exceed the floor: $expected")
    requireNoWidenCollision(expected)
    val sized = Dedup.cappedPairs(ranked, Seq("fp"), 64, rowsPerPartition = tiny)
    assert(repartitionWidths(sized).contains(expected),
      s"expected a REPARTITION_BY_NUM($expected) exchange")
    // default target at this scale: no repartition, identical results
    val plain = Dedup.cappedPairs(ranked, Seq("fp"), 64)
    assert(repartitionWidths(plain).isEmpty,
      "below the floor the r17 plan must be untouched")
    assert(sized.collect().toSet == plain.collect().toSet)
  }

  test("bipartite estimates price the batch-x-capped-store join exactly") {
    // left buckets: a=2, b=3; right buckets: a=5, b=1, c=9; cap 4
    //   a: 2·min(5,4)=8; b: 3·min(1,4)=3; c unmatched → 0
    val left = Seq.tabulate(2)(i => ("a", i)) ++ Seq.tabulate(3)(i => ("b", i))
    val right = Seq.tabulate(5)(i => ("a", i)) ++ Seq(("b", 0)) ++
      Seq.tabulate(9)(i => ("c", i))
    val l = left.toDF("fp", "x")
    val r = right.toDF("fp", "x")
    assert(AdaptiveParts.bipartiteCappedEstimate(l, r, Seq("fp"), 4) == 11L)
    // uncapped via hists (the PPJoin-store freq-table path)
    val lh = l.groupBy("fp").agg(count(lit(1)).as("__ml"))
    val rh = r.groupBy("fp").agg(count(lit(1)).as("__mr"))
    assert(AdaptiveParts.bipartiteFromHists(lh, rh, Seq("fp")) ==
      2L * 5 + 3L * 1)
    assert(AdaptiveParts.bipartiteFromHists(lh, rh, Seq("fp"), 4) == 11L)
    // no matching buckets → 0, never null
    assert(AdaptiveParts.bipartiteCappedEstimate(
      Seq(("z", 1)).toDF("fp", "x"), r, Seq("fp"), 4) == 0L)
  }

  test("against-store joins size their exchanges from the bipartite estimate (wired)") {
    val floor = AdaptiveParts.sessionFloor(spark)
    val tiny = 2L // rows per partition — forces sizing on a test fixture
    // winnowing: batch and store share boilerplate text → one hot fp
    val mk = (ids: Range) => ids.map(i =>
      (i.toLong, s"alpha beta gamma delta shared boiler plate text run $i"))
      .toDF("doc_id", "text")
    val store = Dedup.winnowFingerprints(mk(0 until 40), "text", "doc_id")
      .localCheckpoint()
    val (sized, stW) = Dedup.winnowingCandidatesAgainstStorePlan(
      mk(100 until 140), "text", "doc_id", store, 3, 4,
      maxBucketPairing = 8, rowsPerPartition = tiny)
    assert(repartitionWidths(sized).exists(_ > floor),
      "store path must carry a REPARTITION_BY_NUM exchange above the floor")
    val (plain, stW2) = Dedup.winnowingCandidatesAgainstStorePlan(
      mk(100 until 140), "text", "doc_id", store, 3, 4,
      maxBucketPairing = 8, AdaptiveParts.RowsPerPartition)
    assert(repartitionWidths(plain).isEmpty,
      "below the floor the store-path plan must be untouched")
    assert(sized.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet == plain.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet, "sizing must never change results")
    (stW ++ stW2).foreach(_.unpersist(true))
    assert(spark.sharedState.cacheManager.isEmpty,
      "winnowing store path leaked cache entries")
    // PPJoin store: the freq-table bound prices the prefix join
    val (freq, sorted) = Dedup.similarityStages(mk(0 until 40), "text", "doc_id")
    val freqC = freq.localCheckpoint(); val sortedC = sorted.localCheckpoint()
    val (sizedS, stS) = Dedup.similarityJoinAgainstStorePlan(mk(100 until 140),
      "text", "doc_id", freqC, sortedC, 2, 0.3, rowsPerPartition = tiny)
    assert(repartitionWidths(sizedS).exists(_ > floor),
      "ppjoin store path must size above the floor")
    val (plainS, stS2) = Dedup.similarityJoinAgainstStorePlan(mk(100 until 140),
      "text", "doc_id", freqC, sortedC, 2, 0.3,
      AdaptiveParts.RowsPerPartition)
    assert(repartitionWidths(plainS).isEmpty)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
      math.round(r.getDouble(2) * 1e6))
    assert(sizedS.collect().map(key).toSet == plainS.collect().map(key).toSet)
    (stS ++ stS2).foreach(_.unpersist(true))
    assert(spark.sharedState.cacheManager.isEmpty,
      "ppjoin store path leaked cache entries")
    // the materializing wrappers stay cache-clean too
    assert(Dedup.winnowingCandidatesAgainstStore(mk(100 until 110), "text",
      "doc_id", store, maxBucketPairing = 8).count() > 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "winnowing wrapper leaked cache entries")
  }

  test("outgrown-exactness advisory fires exactly past the sizing budget") {
    val budget = AdaptiveParts.MaxParts.toLong * 100
    assert(!Dedup.warnIfExactnessOutgrown("spec", budget, 100, 0.6))
    assert(Dedup.warnIfExactnessOutgrown("spec", budget + 1, 100, 0.6))
    assert(!Dedup.warnIfExactnessOutgrown("spec", 0L, 100, 0.6))
  }

  test("ANN query-set broadcast demotes above the cap (spill, not error)") {
    import graft.pipeline.Similarity
    val corpus = (0L until 50L).map(i =>
      (i, Array(i.toDouble, (i % 7).toDouble))).toDF("vec_id", "embedding")
    // 30 rows: above the 512-byte stats tier for cap=1 (so demotion has
    // to consult the count), still trivially small for the default cap
    val queries = (100L until 130L).map(i =>
      (i, Array(i.toDouble, 1.0))).toDF("q_id", "q_vec")
    // isolate the HINT: with auto-broadcast off, a BroadcastExchange can
    // only come from broadcastIfSmall's hint
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      def planOf(cap: Long): (String, Set[(Long, Long)]) = {
        val df = Similarity.bruteForceTopK(corpus, queries, k = 2,
          queryBroadcastCap = cap)
        df.count()
        (df.queryExecution.executedPlan.toString,
          df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      }
      val (hinted, rHinted) = planOf(Similarity.QueryBroadcastCap)
      assert(hinted.contains("Broadcast"),
        "a provably-small query set must keep the broadcast hint")
      val (demoted, rDemoted) = planOf(1L) // 3 queries > cap 1 → demote
      assert(!demoted.contains("Broadcast"),
        s"above the cap the hint must demote to a shuffling join:\n$demoted")
      assert(rHinted == rDemoted, "demotion must never change results")
    } finally spark.conf.set(key, prev)
  }

  test("similarityJoinPlan sizes the prefix join from the token histogram") {
    val docs = (0 until 40).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta${i % 4} eta${i % 7}"))
      .toDF("doc_id", "text")
    val floor = AdaptiveParts.sessionFloor(spark)
    val (sized, stagesS) = Dedup.similarityJoinPlan(docs, "text", "doc_id",
      shingleWords = 2, threshold = 0.6, rowsPerPartition = 1L)
    val widths = repartitionWidths(sized)
    assert(widths.nonEmpty && widths.forall(_ > floor),
      s"tiny target must force sizing above floor $floor: $widths")
    stagesS.foreach(_.unpersist())
    val (plain, stagesP) = Dedup.similarityJoinPlan(docs, "text", "doc_id",
      shingleWords = 2, threshold = 0.6)
    assert(repartitionWidths(plain).isEmpty)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
      math.round(r.getDouble(2) * 1e6))
    assert(sized.collect().map(key).toSet == plain.collect().map(key).toSet,
      "sizing must never change results")
    stagesP.foreach(_.unpersist())
  }
}
