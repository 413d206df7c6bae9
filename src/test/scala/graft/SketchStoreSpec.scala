package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Sketches

/** Randomized guarantees of the mergeable store family: histogram
  * percentiles within one bin width of the exact order statistic, and
  * moment rollups bit-equal to single-pass regardless of batching. */
class SketchStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("histPercentile lower edge is within one bin width of the exact order statistic") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 10) {
      val w = Seq(100L, 250L, 500L)(trial % 3)
      val vals = (1 to 500).map(_ => rnd.nextInt(10000).toLong)
      val df = vals.map(v => ("g", v)).toDF("g", "cents")
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val hist = Sketches.histSketches(df, Seq("g"), col("cents"), w)
        val got = Sketches.histPercentile(hist, Seq("g"), q, w)
          .head.getAs[Long]("p_lower_cents")
        val sorted = vals.sorted
        val exact = sorted(math.min(sorted.size - 1,
          math.max(0, math.ceil(q * sorted.size).toInt - 1)))
        assert(got <= exact && exact < got + w,
          s"trial=$trial q=$q w=$w: exact $exact outside [$got, ${got + w})")
      }
    }
  }

  test("moment rollup over ANY batching is bit-equal to single-pass") {
    val rnd = new scala.util.Random(5)
    val vals = (1L to 300L).map(i => (s"g${i % 3}", rnd.nextInt(5000).toLong))
    val df = vals.toDF("g", "cents")
    val direct = Sketches.momentSketches(df, Seq("g"), col("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    for (nb <- Seq(2, 5, 9)) {
      val store = Sketches.momentSketches(
        df.withColumn("b", pmod(xxhash64(col("cents")), lit(nb))),
        Seq("g", "b"), col("cents"))
      val merged = Sketches.momentMerge(store, Seq("g"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(merged == direct, s"batching nb=$nb diverged")
    }
  }
}
