package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication family for training-data pipelines, each shaped for 100 TB:
  *
  *  - exact: one hash-groupBy shuffle on a 16-byte fingerprint (not the text)
  *  - MinHash+LSH: shingle → signature → band-bucket join; candidate pairs
  *    only ever meet inside a bucket, so the shuffle is on (band, bucket)
  *    keys and the quadratic blow-up is bounded per bucket
  *  - SimHash: 64-bit fingerprint, near-dup = small Hamming distance,
  *    bucketed by 16-bit chunks (any pair within distance 3 shares a chunk)
  *  - n-gram Jaccard: the exact verifier applied to candidate pairs
  *  - embedding cosine: random-hyperplane LSH over the embedding column
  *
  * Everything before the bucket joins is pure Column work (no UDFs).
  */
object Dedup {

  // -------------------------------------------------------------------------
  // Exact
  // -------------------------------------------------------------------------

  /** Exact duplicate groups by normalized-text fingerprint: one row per
    * distinct document, keeping the smallest id as canonical. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))

  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val canon = exactGroups(df, textCol, idCol)
      .select(col("canonical_id").as(idCol))
    df.join(canon, Seq(idCol), "left_semi")
  }

  // -------------------------------------------------------------------------
  // MinHash + LSH
  // -------------------------------------------------------------------------

  /** Character k-shingles as a distinct array (Column-only sliding window). */
  def charShingles(text: Column, k: Int): Column = {
    val n = length(text)
    array_distinct(when(n >= k,
      transform(sequence(lit(1), n - k + 1), i => text.substr(i, lit(k))))
      .otherwise(array(text)))
  }

  /** Word w-shingles (token n-grams). */
  def wordShingles(text: Column, w: Int): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    array_distinct(when(size(toks) >= w,
      transform(sequence(lit(0), size(toks) - w),
        i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
      .otherwise(array(concat_ws(" ", toks))))
  }

  /** MinHash signature: H independent permutation proxies via seeded
    * xxhash64; entry i = min over shingles of xxhash64(i, shingle). */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingleArr, s => xxhash64(lit(i), s)))): _*)

  /** LSH banding: (band_idx, hash of the band's signature slice) pairs. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b => struct(
      lit(b).as("band"),
      xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand))).as("bucket"))): _*)

  /** Candidate pairs from shared LSH buckets, verified with exact Jaccard
    * over the shingle sets. Returns (id_a, id_b, jaccard) with id_a < id_b. */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
      shingleWords: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    val withSig = df.select(
      col(idCol).as("id"),
      wordShingles(col(textCol), shingleWords).as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
      .withColumn("bands", lshBands(col("sig"), bands, numHashes / bands))
    val buckets = withSig.select(col("id"), col("shingles"),
      explode(col("bands")).as("b"))
    val a = buckets.select(col("id").as("id_a"), col("shingles").as("sh_a"),
      col("b").as("ba"))
    val bb = buckets.select(col("id").as("id_b"), col("shingles").as("sh_b"),
      col("b").as("bb"))
    val pairs = a.join(bb,
      a("ba") === bb("bb") && a("id_a") < bb("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact Jaccard over two string arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val union = size(array_union(a, b)).cast(DoubleType)
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** n-gram Jaccard similarity between paired documents (the exact verifier
    * as a standalone operator). */
  def ngramJaccardPairs(pairs: DataFrame, textA: String, textB: String,
      shingleWords: Int = 2): Column =
    jaccard(wordShingles(col(textA), shingleWords),
      wordShingles(col(textB), shingleWords))

  // -------------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------------

  /** 64-bit SimHash: per-bit majority vote over token hashes. Column-only:
    * for each bit position, sum ±1 across tokens, then assemble the sign
    * bits into one long. */
  def simhash64(text: Column): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    val hashes = transform(toks, t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << i)
    }
    bits.reduce(_ + _)
  }

  /** Near-dups by Hamming distance ≤ maxDist, bucketed on 16-bit chunks
    * (pigeonhole: distance ≤ 3 ⇒ some chunk of 4 is identical). */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
    val chunked = withSim.select(col("id"), col("sim"),
      explode(array((0 until 4).map(c => struct(
        lit(c).as("chunk"),
        shiftright(col("sim"), c * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("b"))
    val l = chunked.select(col("id").as("id_a"), col("sim").as("sim_a"), col("b").as("ba"))
    val r = chunked.select(col("id").as("id_b"), col("sim").as("sim_b"), col("b").as("bb"))
    l.join(r, l("ba") === r("bb") && l("id_a") < r("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  // -------------------------------------------------------------------------
  // Embedding cosine near-dup (random hyperplane LSH)
  // -------------------------------------------------------------------------

  /** Deterministic pseudo-random hyperplane component r_{p,j} in [-0.5,0.5]
    * derived from xxhash64 — no RNG state to ship to executors. */
  private def hyperplaneComponent(p: Int, j: Column): Column =
    (xxhash64(lit(p), j).cast(DoubleType) / lit(Long.MaxValue.toDouble)) / 2.0

  /** Sign-bit signature of `planes` random hyperplanes packed into a long. */
  def hyperplaneSignature(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val dot = aggregate(zip_with(vec,
        transform(sequence(lit(0), size(vec) - 1), j => hyperplaneComponent(p, j)),
        (v, r) => v.cast(DoubleType) * r), lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }.reduce(_ + _)

  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))
    when(na > 0 && nb > 0, dot / (na * nb)).otherwise(lit(0.0))
  }

  /** Embedding near-dups: bucket by hyperplane signature (all `planes` bits
    * equal ⇒ likely high cosine), verify exactly. */
  def embeddingNearDups(df: DataFrame, vecCol: String, idCol: String,
      planes: Int = 12, threshold: Double = 0.95): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      hyperplaneSignature(col(vecCol), planes).as("sig"))
    val l = sigs.select(col("id").as("id_a"), col("v").as("v_a"), col("sig").as("sig_a"))
    val r = sigs.select(col("id").as("id_b"), col("v").as("v_b"), col("sig").as("sig_b"))
    l.join(r, l("sig_a") === r("sig_b") && l("id_a") < r("id_b"))
      .withColumn("cos", cosine(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
