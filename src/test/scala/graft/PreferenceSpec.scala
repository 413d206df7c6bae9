package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Preference

/** Preference-data QA semantics on hand-computed fixtures. */
class PreferenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pairAudit: identical/empty/valid flags and micro-floored ratio") {
    val pairs = Seq(
      (1L, "a b c", "a b"),     // valid, chosen longer, ratio 1.5
      (2L, "same text", "same text"), // identical
      (3L, "  ", "a b"),        // empty chosen side
      (4L, "a", ""),            // empty rejected: ratio null
      (5L, "x", "x y z"))       // valid, rejected longer
      .toDF("pair_id", "chosen", "rejected")
    val out = Preference.pairAudit(pairs, "pair_id", "chosen", "rejected")
      .orderBy("pair_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 3 && byId(1L).getLong(2) == 2)
    assert(byId(1L).getDouble(6) == 1.5 && byId(1L).getBoolean(7))
    assert(byId(2L).getBoolean(3) && !byId(2L).getBoolean(7)) // identical
    assert(byId(3L).getBoolean(4) && !byId(3L).getBoolean(7)) // empty side
    assert(byId(4L).isNullAt(6) && byId(4L).getBoolean(4))    // no ratio
    assert(!byId(5L).getBoolean(5) && byId(5L).getBoolean(7)) // not longer
  }

  test("fleissKappa: perfect per-item agreement across two labels = 1") {
    // i1 all-x, i2 all-y: Po = 1; marginals 50/50 -> Pe = 0.5; kappa = 1
    val ratings = Seq((1L, "x"), (1L, "x"), (1L, "x"),
      (2L, "y"), (2L, "y"), (2L, "y")).toDF("item", "label")
    val r = Preference.fleissKappa(ratings, "item", "label").collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 6)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 1.0)
  }

  test("fleissKappa: chance-level agreement = 0; <2-rating items drop") {
    // i1 {x,x,x} (P=1), i2 {x,y,z} (P=0) -> Po = 0.5; marginals
    // 4/6,1/6,1/6 -> Pe = 0.5 (micro-floored) -> kappa = 0.
    // i3 has ONE rating: excluded from items AND marginals.
    val ratings = Seq((1L, "x"), (1L, "x"), (1L, "x"),
      (2L, "x"), (2L, "y"), (2L, "z"), (3L, "w")).toDF("item", "label")
    val r = Preference.fleissKappa(ratings, "item", "label").collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 6)
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 0.0)
  }

  test("fleissKappa: single-category table has undefined kappa (null)") {
    val ratings = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"))
      .toDF("item", "label")
    val r = Preference.fleissKappa(ratings, "item", "label").collect()(0)
    assert(r.getDouble(3) == 1.0 && r.isNullAt(4))
  }

  test("winRateIntervals: counts, canonical pair order, Wilson bounds") {
    val matches = Seq(
      ("x", "y", "x"), ("y", "x", "x"), ("x", "y", "x"), ("x", "y", "y"),
      ("y", "z", "y"), ("z", "z", "z")) // self-match ignored
      .toDF("a", "b", "winner")
    val out = Preference.winRateIntervals(matches, "a", "b", "winner")
      .orderBy("item_i", "item_j").collect()
    assert(out.length == 2)
    val xy = out(0)
    assert(xy.getString(0) == "x" && xy.getString(1) == "y")
    assert(xy.getLong(2) == 4 && xy.getLong(3) == 3)
    assert(xy.getDouble(4) == 0.75)
    // same fixed-shape arrangement as the operator
    val (w, n, z) = (3.0, 4.0, 1.96)
    val ph = w / n
    val half = z * math.sqrt((ph * (1.0 - ph) + z * z / (n * 4)) / n)
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(xy.getDouble(5) == r6((ph + z * z / (n * 2) - half) /
      (1.0 + z * z / n)))
    assert(xy.getDouble(6) == r6((ph + z * z / (n * 2) + half) /
      (1.0 + z * z / n)))
    // degenerate n=1, w=1: interval stays within [0, 1]
    val yz = out(1)
    assert(yz.getLong(2) == 1 && yz.getDouble(4) == 1.0)
    assert(yz.getDouble(5) >= 0.0 && yz.getDouble(6) <= 1.0 + 1e-9)
  }

  test("from-counts seam: split-batch count rollup == one-shot") {
    import org.apache.spark.sql.functions._
    val all = Seq(
      ("x", "y", "x"), ("x", "y", "x"), ("x", "y", "y"), ("y", "z", "y"),
      ("x", "z", "x"), ("y", "z", "z"), ("x", "z", "x"), ("x", "y", "x"))
      .toDF("a", "b", "winner")
    // two "micro-batches" counted separately, rolled up by summing —
    // the store path — must equal the one-shot pass exactly
    val batches = Seq(all.limit(3), all.offset(3))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(least(col("a"), col("b")).as("i"),
        greatest(col("a"), col("b")).as("j"), col("winner"))
    val pcRolled = batches.map(b => canon(b)
        .groupBy("i", "j").agg(count(lit(1)).as("nij")))
      .reduce(_ unionByName _)
      .groupBy("i", "j").agg(sum(col("nij")).as("nij"))
    val winsRolled = batches.map(_.groupBy(col("winner").as("item"))
        .agg(count(lit(1)).as("wi")))
      .reduce(_ unionByName _)
      .groupBy("item").agg(sum(col("wi")).as("wi"))
    val oneShot = Preference.btRank(all, "a", "b", "winner", iters = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val stored = Preference.btRankFromCounts(pcRolled, winsRolled, iters = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(stored.sortBy(_._1).toSeq == oneShot.sortBy(_._1).toSeq)
    val wrOne = Preference.winRateIntervals(all, "a", "b", "winner")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(5), r.getDouble(6)))
    val pcWins = pcRolled.join(
      batches.map(b => canon(b).where(col("winner") === col("i"))
          .groupBy("i", "j").agg(count(lit(1)).as("wins")))
        .reduce(_ unionByName _)
        .groupBy("i", "j").agg(sum(col("wins")).as("wins")),
      Seq("i", "j"), "left").na.fill(0L, Seq("wins"))
      .select(col("i").as("item_i"), col("j").as("item_j"),
        col("nij").as("n"), col("wins"))
    val wrStored = Preference.winRateIntervalsFromCounts(pcWins)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(5), r.getDouble(6)))
    assert(wrStored.sortBy(t => (t._1, t._2)).toSeq ==
      wrOne.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("krippendorffAlpha: perfect agreement = 1; unequal raters") {
    // u1 {x,x}, u2 {y,y,y}: Do = 0; marginals x=2,y=3,n=5
    // De = (2*3 + 3*2)/(5*4) = 0.6 -> alpha = 1
    val ratings = Seq((1L, "x"), (1L, "x"),
      (2L, "y"), (2L, "y"), (2L, "y")).toDF("item", "label")
    val r = Preference.krippendorffAlpha(ratings, "item", "label")
      .collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 5)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.6)
    assert(r.getDouble(4) == 1.0)
  }

  test("krippendorffAlpha: chance agreement = 0; <2-rating items drop") {
    // u1 {x,x} (term 0), u2 {x,y} (terms 1+1), u3 single rating drops
    // Do = 2/4 = 0.5; marginals x=3,y=1: De = (3*1+1*3)/(4*3) = 0.5
    val ratings = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "y"),
      (3L, "z")).toDF("item", "label")
    val r = Preference.krippendorffAlpha(ratings, "item", "label")
      .collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 0.0)
  }

  test("krippendorffAlpha: single category has undefined alpha") {
    val ratings = Seq((1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"))
      .toDF("item", "label")
    val r = Preference.krippendorffAlpha(ratings, "item", "label")
      .collect()(0)
    assert(r.getDouble(3) == 0.0 && r.isNullAt(4))
  }

  test("dawidSkene: EM recovers what majority voting cannot") {
    // w1/w2 accurate, w3 always votes 'a' (a spammer). Disputed items
    // 7-8 see only w1 ('x', correct) vs w3 ('a') — a 1-1 tie majority
    // init resolves WRONG (smallest label 'a'). One EM round learns
    // w1's accuracy and w3's constant-'a' confusion from the anchor
    // items and flips the disputed items to 'x'.
    val votes = (
      (1 to 4).flatMap(i => Seq((i, "w1", "x"), (i, "w2", "x"),
        (i, "w3", "a"))) ++
      (5 to 6).flatMap(i => Seq((i, "w1", "a"), (i, "w2", "a"),
        (i, "w3", "a"))) ++
      (7 to 8).flatMap(i => Seq((i, "w1", "x"), (i, "w3", "a"))))
      .toDF("item", "worker", "vote")
    val out = Preference.dawidSkene(votes, "item", "worker", "vote",
      iters = 1).collect()
      .map(r => r.getString(0).toInt -> r).toMap
    (1 to 4).foreach(i => assert(out(i).getString(1) == "x"))
    (5 to 6).foreach(i => assert(out(i).getString(1) == "a"))
    (7 to 8).foreach { i =>
      assert(out(i).getString(1) == "x",
        s"item $i: EM failed to overrule the spammer")
      assert(out(i).getLong(2) == 2 && out(i).getLong(3) == 1)
    }
    // a second round is stable (the fixed point holds)
    val out2 = Preference.dawidSkene(votes, "item", "worker", "vote",
      iters = 2).collect().map(r => r.getString(0).toInt -> r.getString(1))
      .toMap
    assert((1 to 8).forall(i => out2(i) == out(i).getString(1)))
  }

  test("btRank: dominance ordering and mean-1 normalization") {
    // A beats B 2-1, B beats C 2-1, A beats C 2-0: expect A > B > C
    val m = Seq(("A", "B", "A"), ("A", "B", "A"), ("A", "B", "B"),
      ("B", "C", "B"), ("B", "C", "B"), ("B", "C", "C"),
      ("A", "C", "A"), ("A", "C", "A"),
      ("A", "A", "A")) // same-contestant row: ignored
      .toDF("a", "b", "winner")
    val out = Preference.btRank(m, "a", "b", "winner", iters = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq("A", "B", "C"))
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._2 > out(1)._2 && out(1)._2 > out(2)._2)
    // renormalized to mean 1 (within micro-rounding)
    assert(math.abs(out.map(_._2).sum - 3.0) < 1e-5)
  }

  test("btRank: deterministic across reruns; empty matches fail loudly") {
    val m = Seq(("A", "B", "A"), ("B", "C", "C")).toDF("a", "b", "winner")
    val r1 = Preference.btRank(m, "a", "b", "winner").collect().toSeq
    val r2 = Preference.btRank(m, "a", "b", "winner").collect().toSeq
    assert(r1 == r2)
    val empty = Seq(("A", "A", "A")).toDF("a", "b", "winner")
    val ex = intercept[IllegalArgumentException] {
      Preference.btRank(empty, "a", "b", "winner")
    }
    assert(ex.getMessage.contains("no valid matches"))
  }
}
