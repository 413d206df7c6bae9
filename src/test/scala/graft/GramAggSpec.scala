package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Fixed-point second-moment aggregate + covariance derivation:
  * hand-computed values, partitioning invariance, and the width guard. */
class GramAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
    (3L, Array(1.0f, 1.0f)), (4L, Array(0.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("covariance matches the hand computation") {
    // x0: [1,0,1,0] mean .5 var .25; x1: [0,1,1,0] mean .5 var .25
    // E[x0·x1] = (0+0+1+0)/4 = .25; cov01 = .25 − .25 = 0
    val out = Similarity.covarianceMatrix(vecs, "embedding", dim = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out == Map((0, 0) -> 0.25, (0, 1) -> 0.0, (1, 1) -> 0.25), out)
  }

  test("moments are partitioning-exact (integer micro-unit sums)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(parts: Int) = Similarity.covarianceMatrix(
        e.repartition(parts), "embedding", dim = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val a = run(1)
    val b = run(13)
    assert(a.size == 64 * 65 / 2)
    assert(a == b, "covariance must not depend on partitioning")
  }

  test("embedding drift: iid halves are near-flat, a planted shift lights up") {
    import org.apache.spark.sql.DataFrame
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def fro(d: DataFrame): Double = d
      .agg(org.apache.spark.sql.functions.sum(col("dcov") * col("dcov")))
      .collect()(0).getDouble(0)
    val iid = fro(Similarity.embeddingDrift(
      e.where(col("vec_id") % 2 === 0), e.where(col("vec_id") % 2 === 1),
      "embedding", 64))
    // plant a shift: scale every component 3x in slice B — variances 9x
    val shifted = e.where(col("vec_id") % 2 === 1)
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x * lit(3.0f)).as("embedding"))
    val drifted = fro(Similarity.embeddingDrift(
      e.where(col("vec_id") % 2 === 0), shifted, "embedding", 64))
    assert(drifted > 10 * iid,
      s"planted 3x scale must dominate iid noise: iid=$iid drifted=$drifted")
  }

  test("stored gram rows roll up losslessly: batched == single-pass covariance") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // three "micro-batches" append one fixed-size moment row each
    val store = (0 until 3).map(b =>
        graft.pipeline.Sketches.gramSketch(
          e.where(col("vec_id") % 3 === b), "embedding", 64))
      .reduce(_ unionAll _)
    val merged = graft.pipeline.Sketches.gramMerge(store)
    val fromStore = Similarity.covarianceFromMoments(merged, 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val direct = Similarity.covarianceMatrix(e, "embedding", 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(fromStore == direct,
      "stored-moments covariance must be bit-identical to the single pass")
  }

  test("wrong vector width fails loudly") {
    val bad = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.covarianceMatrix(bad, "embedding", dim = 2).collect()
    }
    assert(e.getMessage != null)
  }
}
