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

  /** Per-dimension centroids of embedding groups — the IVF coarse
    * quantizer's training step, as a plain posexplode + groupBy (fully
    * distributed; no driver-side vectors). Output: (group, pos, centroid). */
  def centroids(df: DataFrame, vecCol: String, groupCol: String): DataFrame =
    df.select(col(groupCol).as("group"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("group", "pos")
      .agg(avg(col("v")).as("centroid"))

  /** IVF-style ANN: vectors are assigned to their nearest centroid (inverted
    * lists); a query searches only the `nProbe` nearest lists. Centroids are
    * collected to the driver ONCE (k × dim doubles — tiny) and folded into
    * the plan as literals, so assignment is a scan-side argmin with no
    * join. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    // coarse centroids: deterministic grouping by id hash (k-means would
    // iterate this same shape; one round is enough for a coarse quantizer)
    val assigned0 = corpus.withColumn("group",
      pmod(xxhash64(col(corpusId)), lit(nLists)).cast("int"))
    val cents = centroids(assigned0, corpusVec, "group")
      .groupBy("group").agg(array_sort(collect_list(struct(col("pos"), col("centroid"))))
        .as("cs"))
      .select(col("group"), transform(col("cs"), c => c.getField("centroid")).as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap

    def centroidLit(g: Int): Column =
      array(cents(g).map(v => lit(v)): _*)
    def dist2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
        lit(0.0), (acc, v) => acc + v)

    // nearest-centroid assignment as a plan-literal argmin (no join)
    def nearestLists(vec: Column, n: Int): Column = {
      val scored = array(cents.keys.toSeq.sorted.map(g =>
        struct(dist2(vec, centroidLit(g)).as("d"), lit(g).as("g"))): _*)
      slice(transform(array_sort(scored), s => s.getField("g")), 1, n)
    }

    val invLists = corpus.withColumn("list",
      nearestLists(col(corpusVec), 1).getItem(0))
    val probes = queries.withColumn("list",
      explode(nearestLists(col(queryVec), nProbe)))
    val candidates = invLists.join(broadcast(probes), Seq("list"))
      .where(col(corpusId) =!= col(queryId))
      .withColumn("cos", Dedup.cosine(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(round(col("cos"), 6).desc, col(corpusId).asc)
    candidates.withColumn("rank", row_number().over(w))
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
