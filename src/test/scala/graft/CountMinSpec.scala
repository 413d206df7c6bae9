package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.CountMinAgg.{cm_estimate, count_min}

/** The Count-Min TypedImperativeAggregate: the no-undercount guarantee
  * under forced partial/merge paths, Column-side estimate parity with the
  * imperative update hashing, linearity (relational store merge equals
  * single-pass), and the SQL-surface registration. */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = 4
  private val W = 1024

  private def estimates(items: Seq[String], queried: Seq[String],
      partitions: Int): Map[String, Long] = {
    val sketch = items.toDF("item").repartition(partitions)
      .agg(count_min(col("item"), D, W).as("cm"))
    queried.toDF("q").crossJoin(broadcast(sketch))
      .select(col("q"), cm_estimate(col("cm"), col("q"), D, W).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("estimates never undercount, exact when uncontended, across partitionings") {
    val items = (0 until 2000).map(i => s"t${i % 97}") // 97 distinct << W
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (p <- Seq(1, 4, 16)) {
      val est = estimates(items, truth.keys.toSeq, p)
      for ((item, exact) <- truth) {
        assert(est(item) >= exact, s"undercount $item at partitions=$p")
        // 97 items in 256 buckets collide sometimes, but min-over-4-rows
        // with independent row hashes keeps the overcount within 2n/W
        assert(est(item) - exact <= 2L * items.size / W,
          s"overcount beyond 2n/W: $item at partitions=$p")
      }
    }
  }

  test("an absent item estimates only collision mass") {
    val est = estimates(Seq.fill(100)("present"), Seq("absent-item"), 4)
    assert(est("absent-item") <= 100L)
  }

  test("linearity: relational cmMerge over batch sketches == single-pass sketch") {
    val items = (0 until 3000).map(i => s"w${i % 151}")
    val single = items.toDF("item")
      .agg(count_min(col("item"), D, W).as("cm"))
      .collect().head.getSeq[Long](0)
    val store = items.grouped(1000).toSeq.zipWithIndex.map { case (b, i) =>
      b.toDF("item").agg(lit(i).as("g"), count_min(col("item"), D, W).as("cm"))
    }.reduce(_ unionAll _).withColumn("src", lit("all"))
    val merged = graft.pipeline.Sketches.cmMerge(store, Seq("src"))
      .collect().head.getSeq[Long](1)
    assert(merged == single)
  }

  test("cmTrendStep: sketch store baseline, spike detection, seed batch emits nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("cmtrend").toString
    def batchOf(items: Seq[String]) = items.toDF("tok")
    // two seed batches: steady mix of "common" (100/batch) + "rare" (5/batch)
    val steady = Seq.fill(100)("common") ++ Seq.fill(5)("rare")
    val first = graft.pipeline.Sketches.cmTrendStep(
      batchOf(steady), tmp, "tok", depth = D, width = W)
    assert(first.isEmpty, "first batch must only seed the store")
    assert(!graft.pipeline.Sketches.cmTrendStep(
        batchOf(steady), tmp, "tok", depth = D, width = W)
      .collect().map(_.getString(0)).contains("common"),
      "steady token must not trend")
    // spike batch: "burst" never seen before + "rare" at 20x its rate
    val spiked = Seq.fill(100)("common") ++ Seq.fill(100)("rare") ++
      Seq.fill(50)("burst")
    val out = graft.pipeline.Sketches.cmTrendStep(
        batchOf(spiked), tmp, "tok", depth = D, width = W)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.contains("burst") && out("burst")._2 == 0L,
      s"never-seen burst must trend with baseline 0: $out")
    assert(out.contains("rare"), s"20x rate spike must trend: $out")
    assert(!out.contains("common"), s"steady token trended: $out")
    // store grew one fixed-size sketch row per batch
    assert(spark.read.parquet(s"$tmp/cm").count() == 3)
  }

  test("cmTrendStep with batchId: re-delivered batches replace, not double-count") {
    val tmp = java.nio.file.Files.createTempDirectory("cmtrendid").toString
    def step(items: Seq[String], id: Long) = graft.pipeline.Sketches
      .cmTrendStep(items.toDF("tok"), tmp, "tok", depth = D, width = W,
        batchId = Some(id))
    val steady = Seq.fill(100)("common")
    assert(step(steady, 0L).isEmpty)
    val spiked = Seq.fill(100)("common") ++ Seq.fill(80)("burst")
    val first = step(spiked, 1L).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(first.exists(_._1 == "burst"))
    // retry of batch 1: its earlier partition is excluded from the
    // baseline, so the verdicts are IDENTICAL and the store still holds
    // exactly one sketch row per batch id
    val retry = step(spiked, 1L).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(retry == first, s"retry diverged: $retry vs $first")
    assert(spark.read.parquet(s"$tmp/cm").count() == 2)
  }

  test("cmTrendStep: marker-less pre-upgrade store infers its mode from the schema") {
    // simulate a store seeded BEFORE the _cm_mode marker existed: seed in
    // append mode, then delete the marker. A batchId call must still be
    // rejected — the mode is inferred from the sketch schema (no 'batch'
    // partition column), not stamped from the caller's mode
    val tmp = java.nio.file.Files.createTempDirectory("cmtrendup").toString
    def step(id: Option[Long]) = graft.pipeline.Sketches.cmTrendStep(
      Seq.fill(20)("x").toDF("tok"), tmp, "tok", depth = D, width = W,
      batchId = id)
    step(None)
    val marker = new java.io.File(tmp, "_cm_mode")
    assert(marker.delete(), "marker must exist after the seed")
    val e = intercept[IllegalArgumentException] { step(Some(1L)) }
    assert(e.getMessage.contains("seeded in 'append'"), e.getMessage)
    // the matching mode passes and re-stamps the marker with the
    // INFERRED mode
    step(None)
    assert(scala.io.Source.fromFile(marker).mkString.trim == "append")
    // symmetric: a marker-less batch-partitioned store rejects append calls
    val tmp2 = java.nio.file.Files.createTempDirectory("cmtrendup2").toString
    graft.pipeline.Sketches.cmTrendStep(Seq.fill(20)("x").toDF("tok"), tmp2,
      "tok", depth = D, width = W, batchId = Some(0L))
    assert(new java.io.File(tmp2, "_cm_mode").delete())
    val e2 = intercept[IllegalArgumentException] {
      graft.pipeline.Sketches.cmTrendStep(Seq.fill(20)("x").toDF("tok"), tmp2,
        "tok", depth = D, width = W)
    }
    assert(e2.getMessage.contains("seeded in 'batch'"), e2.getMessage)
  }

  test("count_min + nulls skipped via SQL surface") {
    // same entries Verify/Bench sessions get via injectFunction
    graft.plans.GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    Seq(Some("a"), None, Some("a"), Some("b")).toDF("item")
      .createOrReplaceTempView("cm_in")
    val arr = spark.sql("SELECT count_min(item, 2, 64) AS cm FROM cm_in")
      .collect().head.getSeq[Long](0)
    assert(arr.length == 2 * 64)
    assert(arr.sum == 2 * 3) // 3 non-null items hit depth=2 rows each
  }
}
