package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Similarity

/** Margin-based bitext mining: best-pair identity on a hand-built
  * geometry, the threshold wall, and the non-positive-denominator
  * guard. */
class MarginMineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // x1 aligns with y1, x2 with y2; y3 is anti-aligned noise
  private lazy val xs = Seq(
    (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
    .toDF("x_id", "x_vec")
  private lazy val ys = Seq(
    (11L, Array(1.0f, 0.1f)), (12L, Array(0.1f, 1.0f)),
    (13L, Array(-1.0f, 0.0f)))
    .toDF("y_id", "y_vec")

  test("each source mines its aligned target; margin normalizes by both neighborhoods") {
    val out = Similarity.marginMine(xs, ys, k = 2, threshold = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L), s"sources mined: $out")
    assert(out(1L)._1 == 11L && out(2L)._1 == 12L, s"wrong pairs: $out")
    // cos(top) ~0.995 over mean-neighborhood ~0.547 -> margin ~1.82
    assert(out.values.forall(v => v._2 > 1.7 && v._2 < 1.9), s"margins: $out")
  }

  test("threshold is a hard wall") {
    assert(Similarity.marginMine(xs, ys, k = 2, threshold = 2.0)
      .collect().isEmpty)
  }

  test("approximate path: banded-LSH kNN tables feed the same margin algebra") {
    // the scale composition — marginMineFromKnn over lshTopK output —
    // must recover most of the exact-path pairs on the sf0.001
    // embeddings (banded recall ~0.87 here, and the argmax pair is the
    // easiest to retain: it has the highest cosine of the neighborhood)
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val xsE = e.where(col("vec_id") % 2 === 0 && col("vec_id") < 100)
      .select(col("vec_id").as("x_id"), col("embedding").as("x_vec"))
    val ysE = e.where(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("y_id"), col("embedding").as("y_vec"))
    val exact = Similarity.marginMine(xsE, ysE, k = 4, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val xkA = Similarity.lshTopK(ysE, xsE, k = 4,
        corpusId = "y_id", corpusVec = "y_vec",
        queryId = "x_id", queryVec = "x_vec")
      .select(col("x_id").as("q_id"), col("neighbor_id"), col("cos"))
    val ykA = Similarity.lshTopK(xsE, ysE, k = 4,
        corpusId = "x_id", corpusVec = "x_vec",
        queryId = "y_id", queryVec = "y_vec")
      .select(col("y_id").as("q_id"), col("neighbor_id"), col("cos"))
    val approx = Similarity.marginMineFromKnn(xkA, ykA, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.intersect(exact).size >= (exact.size * 3) / 5,
      s"approx path recovered ${approx.intersect(exact).size}/${exact.size}")
  }

  test("mmr rerank: skips the near-duplicate plain top-k would take") {
    import org.apache.spark.sql.functions.{col, lit, round}
    // query along +x; candidates: 11 and 12 nearly identical high-rel
    // vectors (12 pays a ~full max-sim penalty after 11 is picked), 13
    // barely relevant but nearly orthogonal. Plain top-2 = {11, 12}; a
    // diversity-weighted lambda must pick 11 then JUMP to 13 (the dup's
    // penalty 0.7·1.0 dwarfs 13's relevance gap at lambda = 0.3).
    val cands = Seq(
      (11L, Array(1.0f, 0.02f)), (12L, Array(1.0f, 0.03f)),
      (13L, Array(0.1f, 0.995f)))
      .toDF("neighbor_id", "embedding")
      .withColumn("q_id", lit(1L))
      .withColumn("cos", round(graft.pipeline.Dedup.cosine(
        col("embedding"), org.apache.spark.sql.functions.array(
          lit(1.0f), lit(0.0f))), 6))
    val picks = Similarity.mmrRerank(cands, k = 2, lambdaPct = 30)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(picks.toSeq == Seq((1L, 11L), (2L, 13L)), picks.toSeq)
    // lambda = 100 degenerates to plain relevance order
    val plain = Similarity.mmrRerank(cands, k = 2, lambdaPct = 100)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(plain == Seq(11L, 12L), plain)
    // a query with fewer candidates than k just stops early
    val short = Similarity.mmrRerank(cands.limit(1), k = 3, lambdaPct = 70)
      .collect()
    assert(short.length == 1)
  }

  test("non-positive denominator yields no pair instead of a flipped margin") {
    // every target is anti-aligned with every source: all cosines are
    // negative, so both neighborhood means are negative and the margin
    // is undefined — the pair must be absent, not emitted with a
    // sign-flipped score
    val xneg = Seq((1L, Array(1.0f, 0.0f))).toDF("x_id", "x_vec")
    val yneg = Seq((21L, Array(-1.0f, 0.0f)), (22L, Array(-1.0f, -0.1f)))
      .toDF("y_id", "y_vec")
    assert(Similarity.marginMine(xneg, yneg, k = 2, threshold = 0.0)
      .collect().isEmpty)
  }
}
