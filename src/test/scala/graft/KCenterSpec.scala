package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Similarity

/** Greedy k-center selection: farthest-point order on a hand-built set,
  * duplicate degeneration (k distinct ids), k=1, and the loud failures
  * (empty input, k past the input size). */
class KCenterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("selects farthest-first by cosine distance, ids break ties") {
    // id 0: +x; id 1: +x (duplicate direction); id 2: -x (opposite);
    // id 3: +y (orthogonal). Start = min id 0; farthest = 2 (dist 2.0);
    // then 3 (dist 1.0 to both). Round 4: id 1 duplicates a center (mind
    // 0 everywhere) but chosen ids are EXCLUDED from the argmax, so the
    // selection still yields the 4th distinct id — exactly what the SQL
    // oracle's NOT-IN-prior-centers CTEs compute on the same input.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(2.0f, 0.0f)),
      (2L, Array(-1.0f, 0.0f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val sel = Similarity.kCenterSelect(vecs, "embedding", "vec_id", k = 4)
      .orderBy("sel_rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sel.toSeq == Seq((1L, 0L), (2L, 2L), (3L, 3L), (4L, 1L)), sel.toSeq)
  }

  test("k=1 returns just the min id; all-duplicates still yield distinct ids") {
    val dup = Seq((5L, Array(1.0f, 1.0f)), (7L, Array(2.0f, 2.0f)),
      (9L, Array(3.0f, 3.0f))).toDF("vec_id", "embedding")
    assert(Similarity.kCenterSelect(dup, "embedding", "vec_id", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 5L)))
    // every pairwise distance is 0: the argmax ties at 0 each round, but
    // the chosen-id exclusion walks the tie-break down the id order — a
    // k-point "diverse" selection never returns fewer than k distinct ids
    val sel = Similarity.kCenterSelect(dup, "embedding", "vec_id", 3)
      .orderBy("sel_rank").collect().map(_.getLong(1)).toSeq
    assert(sel == Seq(5L, 7L, 9L), sel)
  }

  test("empty input and k past the input size fail loudly") {
    val dup = Seq((5L, Array(1.0f, 1.0f)), (7L, Array(2.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.kCenterSelect(dup.limit(0), "embedding", "vec_id", 1)
    }
    assert(e1.getMessage.contains("empty input"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.kCenterSelect(dup, "embedding", "vec_id", 3)
    }
    assert(e2.getMessage.contains("exceeds"))
  }
}
