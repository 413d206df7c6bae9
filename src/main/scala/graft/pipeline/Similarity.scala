package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *  - Brute force: broadcast the (small) query set against the corpus; one
  *    scan, no corpus shuffle, window top-k per query. The correctness
  *    baseline at any scale where |queries| ≪ |corpus|.
  *  - LSH-bucketed: hyperplane sign buckets with multi-probe (flip one bit)
  *    — the 100 TB path: candidate generation is an equi-join on bucket ids,
  *    so cost is |bucket|² per bucket instead of |corpus| per query.
  */
object Similarity {

  /** Exact top-k neighbors per query by cosine. `queries` must be small
    * enough to broadcast (driver-side collect of ids happens nowhere; the
    * broadcast is plan-level). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .where(col(corpusId) =!= col(queryId))
      .withColumn("cos", Dedup.cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(round(col("cos"), 6).desc, col(corpusId).asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** LSH-bucketed ANN: corpus bucketed once by hyperplane signature; queries
    * probe their own bucket plus all 1-bit-flip neighbors (multi-probe), so
    * recall degrades gracefully instead of falling off a cliff. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    val bucketed = corpus.withColumn("bucket",
      Dedup.hyperplaneSignature(col(corpusVec), planes))
    val qSig = queries.withColumn("sig",
      Dedup.hyperplaneSignature(col(queryVec), planes))
    // multi-probe: own bucket + flip each of the `planes` bits
    val probes = qSig.withColumn("bucket",
      explode(array((-1 until planes).map {
        case -1 => col("sig")
        case p  => col("sig").bitwiseXOR(lit(1L << p))
      }: _*)))
    val candidates = bucketed.join(broadcast(probes), Seq("bucket"))
      .where(col(corpusId) =!= col(queryId))
      .dropDuplicates(queryId, corpusId)
      .withColumn("cos", Dedup.cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(round(col("cos"), 6).desc, col(corpusId).asc)
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }
}
