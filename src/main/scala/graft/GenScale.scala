package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-receipt corpus generator: synthesize a `documents` table with
  * the SAME marginal statistics as a source sf dir (vocabulary, per-doc
  * word-count, lang/source mix — each new doc inherits them from its
  * `id % n` base row) at `factor`× the row count, fully deterministic
  * (seeded hash chain, no RNG). Generating BOTH the 1× and the 10×
  * corpus through this generator gives apples-to-apples inputs for the
  * linear-scaling receipts in SCALE.md — naive replication would
  * multiply duplicate DENSITY (every doc ×k near-copies) and measure a
  * data pathology, not the plan.
  *
  * Vocabulary scales with the corpus per Heaps' law (V ∝ N^0.5, the
  * β ≈ 0.5 exponent of real text): every token carries an `x<v>`
  * variant suffix with v < ceil(sqrt(factor)), so the effective vocab
  * is |base| · ceil(sqrt(factor)). A FIXED vocab at 10× the docs multiplies random
  * shingle/fingerprint collisions quadratically (measured: winnowing
  * match rows grew 74× and the PPJoin candidate set ~19× at 10× docs
  * with 31 fixed words) — that measures a data pathology no growing
  * corpus exhibits, not the plan's scaling.
  *
  * Usage: runMain graft.GenScale <srcSfDir> <outDir> [factor]
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = spark.read.parquet(s"$srcDir/documents.parquet")
    val n = src.count()
    // the pmod(id, n) base join assumes DENSE doc_ids 0..n-1 — a sparse
    // or duplicated id space would silently shrink/inflate the output
    // and skew every scaling ratio derived from it. min/max alone can't
    // reject a duplicated+gapped space ({0,1,1,3}), so distinct count
    // completes the bijection proof; n > 0 first (min/max are null on
    // an empty table)
    require(n > 0, s"$srcDir/documents.parquet is empty")
    val s0 = src.agg(min(col("doc_id")), max(col("doc_id")),
      countDistinct(col("doc_id"))).head
    require(s0.getLong(0) == 0L && s0.getLong(1) == n - 1 &&
      s0.getLong(2) == n,
      s"source doc_ids must be dense 0..${n - 1}: got " +
        s"[${s0.getLong(0)}, ${s0.getLong(1)}], ${s0.getLong(2)} distinct " +
        s"over $n rows")
    val vocab = src
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct().orderBy("w")
      .collect().map(_.getString(0))
    val vlit = array(vocab.map(lit): _*)
    val base = src.select((col("doc_id")).as("__base"),
      col("lang"), col("source"),
      size(split(col("text"), " ")).as("__nw"))
    val ids = spark.range(n * factor).select(col("id").as("doc_id"),
      pmod(col("id"), lit(n)).as("__base"))
    val variants = math.ceil(math.sqrt(factor.toDouble)).toInt
    val out = ids.join(base, Seq("__base"))
      .select(col("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), col("__nw") - 1),
          j => concat(
            element_at(vlit,
              (pmod(xxhash64(col("doc_id") * 1009 + j * 7919),
                lit(vocab.length)) + 1).cast("int")),
            lit("x"),
            pmod(xxhash64(col("doc_id") * 2971 + j * 6007),
              lit(variants.toLong))))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    out.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")
    val written = spark.read.parquet(s"$outDir/documents.parquet").count()
    require(written == n * factor,
      s"expected ${n * factor} rows, wrote $written")
    println(s"[genscale] wrote $written docs (${vocab.length}-word " +
      s"vocab x$variants variants, factor $factor) to " +
      s"$outDir/documents.parquet")
    spark.stop()
  }
}
