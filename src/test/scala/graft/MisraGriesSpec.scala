package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAgg.misra_gries

/** The Misra–Gries TypedImperativeAggregate: exactness when the summary
  * fits, the frequency guarantee under forced partial/merge paths, and
  * per-group usage. */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketchOf(items: Seq[String], k: Int,
      partitions: Int): Map[String, Long] = {
    val rows = items.toDF("item").repartition(partitions)
    val arr = rows.agg(misra_gries(col("item"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est")).collect()
    arr.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("distinct items <= k: the sketch is the exact count map") {
    val items = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    // across 1 and 4 partitions (merge path hits the serialize round-trip)
    for (p <- Seq(1, 4)) {
      assert(sketchOf(items, k = 8, partitions = p) ==
        Map("a" -> 7L, "b" -> 3L, "c" -> 1L), s"partitions=$p")
    }
  }

  test("MG guarantee holds across partitionings on a skewed stream") {
    // 5 heavy items (1000 each) over a 500-item tail (~10 each): n=10000,
    // k=16 -> threshold n/17 = 588. Guarantee: heavies present, ests never
    // overcount, undercount <= n/17 — for EVERY partitioning (merge order).
    val heavy = (0 until 5).flatMap(i => Seq.fill(1000)(s"H$i"))
    val tail = (0 until 5000).map(i => s"t${i % 500}")
    val items = scala.util.Random.shuffle(heavy ++ tail)
    val truth = items.groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    val n = items.size
    for (p <- Seq(1, 3, 8, 32)) {
      val sk = sketchOf(items, k = 16, partitions = p)
      for (i <- 0 until 5)
        assert(sk.contains(s"H$i"), s"heavy H$i missing at partitions=$p")
      for ((item, est) <- sk) {
        val exact = truth(item)
        assert(est <= exact, s"overcount $item at partitions=$p")
        assert(exact - est <= n / 17, s"undercount beyond bound: $item p=$p")
      }
    }
  }

  test("per-group sketches: groupBy key isolates the streams") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "z")).toDF("g", "item")
    val out = df.groupBy("g").agg(misra_gries(col("item"), 4).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.item"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("g1", "x", 2L), ("g1", "y", 1L), ("g2", "z", 1L)))
  }

  test("relational store merge: batches sketch independently, mgMerge keeps the guarantee") {
    // 3 "ingest batches" sketch independently (the staged-store shape);
    // the relational merge over the union of (item, est) rows must keep
    // the MG guarantee for the WHOLE stream: heavies present, no
    // overcount, undercount <= n/(k+1)
    // lowercase items: heavyHitters tokenizes with lower()
    val heavy = (0 until 4).flatMap(i => Seq.fill(900)(s"h$i"))
    val tail = (0 until 3600).map(i => s"t${i % 400}")
    val items = scala.util.Random.shuffle(heavy ++ tail)
    val truth = items.groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    val n = items.size
    val k = 16
    val batches = items.grouped(items.size / 3 + 1).toSeq
    val store = batches.map { b =>
      graft.pipeline.TextAnalysis.heavyHitters(
        b.map(x => Tuple1(x)).toDF("text"), "text", k)
    }.reduce(_ unionAll _)
    val merged = pipelineMergeMap(store, k)
    for (i <- 0 until 4)
      assert(merged.contains(s"h$i"), s"heavy h$i missing from merged store")
    for ((item, est) <- merged) {
      assert(est <= truth(item), s"overcount $item")
      assert(truth(item) - est <= n / (k + 1), s"undercount beyond bound: $item")
    }
  }

  private def pipelineMergeMap(store: org.apache.spark.sql.DataFrame,
      k: Int): Map[String, Long] =
    graft.pipeline.Sketches.mgMerge(store, k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("nulls are skipped; output is (est desc, item asc) ordered") {
    val df = Seq(Some("b"), None, Some("a"), Some("b"), Some("a"), Some("b"))
      .toDF("item")
    val arr = df.agg(misra_gries(col("item"), 4).as("hh"))
      .select(col("hh")).collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(arr.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("b", 3L), ("a", 2L)))
  }
}
