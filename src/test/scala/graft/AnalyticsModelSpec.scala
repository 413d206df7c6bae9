package graft

import org.scalatest.funsuite.AnyFunSuite

/** A SECOND independent oracle for the round-10 window-algebra rows: the
  * registered queries run at sf0.001 and must match naive Scala models
  * computed from the same parquet inputs — so each row is pinned by
  * DuckDB SQL (the driver gate) AND by imperative reference code that
  * shares nothing with either engine's evaluation. */
class AnalyticsModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def cents(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  private lazy val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    .selectExpr("cast(l_orderkey as long)", "cast(l_linenumber as long)",
      "l_returnflag", "l_quantity", "l_extendedprice")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      cents(r.getDouble(3)), cents(r.getDouble(4))))

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")
    .selectExpr("cast(o_orderkey as long)", "o_totalprice")
    .collect().map(r => r.getLong(0) -> cents(r.getDouble(1))).toMap

  test("q47 proration matches the imperative largest-remainder model") {
    // (orderkey, linenumber) is NOT unique in the synthetic data —
    // compare MULTISETS of output rows, and bump by row identity
    val got = SparkEntry.queries("q47_proration")(spark, sf)
      .selectExpr("cast(l_orderkey as long)", "cast(l_linenumber as long)",
        "alloc_cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val model = lineitem.groupBy(_._1).toSeq.flatMap { case (ok, rows) =>
      val total = orders(ok)
      val qsum = rows.map(_._4).sum
      val shares = rows.zipWithIndex.map { case (r, i) =>
        (i, r._2, total * r._4 / qsum, total * r._4 % qsum) }
      val rem = total - shares.map(_._3).sum
      val bump = shares.sortBy(s => (-s._4, s._2, s._1)).take(rem.toInt)
        .map(_._1).toSet
      shares.map(s => (ok, s._2, s._3 + (if (bump(s._1)) 1L else 0L)))
    }.sorted.toSeq
    assert(got == model,
      s"first diffs: ${got.diff(model).take(3)} vs ${model.diff(got).take(3)}")
    // global invariant: every order's allocations sum exactly to its total
    for ((ok, rows) <- got.groupBy(_._1))
      assert(rows.map(_._3).sum == orders(ok), s"order $ok mismatch")
  }

  test("q49 skyline matches the quadratic dominance model") {
    val got = SparkEntry.queries("q49_skyline")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val byFlag = lineitem.groupBy(_._3)
    val model = byFlag.toSeq.flatMap { case (rf, rows) =>
      val pts = rows.map(r => (r._5, r._4)) // (price, qty)
      pts.distinct.filter { case (p, q) =>
        !pts.exists { case (p2, q2) =>
          (p2 <= p && q2 >= q) && (p2 < p || q2 > q)
        }
      }.map { case (p, q) => (rf, p, q) }
    }.toSet
    assert(got == model, s"skyline diff: ${got.diff(model)} / ${model.diff(got)}")
  }

  test("q51 weighted median matches the sorted-scan model") {
    val got = SparkEntry.queries("q51_weighted_median")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((rf, rows) <- lineitem.groupBy(_._3)) {
      val sorted = rows.map(r => (r._5, r._4)).sortBy(_._1)
      val tot = sorted.map(_._2).sum
      var cum = 0L
      val med = sorted.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      assert(got(rf) == med, s"$rf: ${got(rf)} != $med")
    }
  }

  test("q45 capped balance matches the sequential fold model") {
    val got = SparkEntry.queries("q45_capped_balance")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ordRows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey",
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000 as d",
        "cast(floor(o_totalprice * 100 + 0.5) as long) as cents")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((k, rows) <- ordRows.groupBy(_._1)) {
      val deltas = rows.sortBy(r => (r._3, r._2))
        .map(r => if (r._2 % 2 == 0) r._4 else -r._4)
      val bal = deltas.foldLeft(0L)((acc, d) => math.max(0L, acc + d))
      assert(got(k) == ((deltas.size.toLong, bal)), s"cust $k: ${got(k)}")
    }
  }
}
