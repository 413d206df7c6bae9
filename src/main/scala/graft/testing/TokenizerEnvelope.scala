package graft.testing

import org.apache.spark.sql.SparkSession

/** Dev harness for the tokenizer-trainer scale envelopes (SCALE.md):
  * trains [[graft.pipeline.TextAnalysis.unigramLmLearn]] at a REALISTIC
  * seed vocabulary (t78 registers at toy seedSize; a shipped
  * SentencePiece-style vocab is ~30k) and prints the wall time, the
  * surviving vocab size, and the driver-state bound — the receipt that
  * the hard-EM state is seedSize+alphabet-cardinality, never
  * corpus-cardinality (the bpeLearn driverVocabLimit precedent,
  * SCALE.md lesson 28).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *   sbt "runMain graft.testing.TokenizerEnvelope [seedSize] [rounds]"
  */
object TokenizerEnvelope {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val seedSize = args.headOption.map(_.toInt).getOrElse(30000)
    val rounds = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .appName("graft-tokenizer-envelope").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = graft.core.Tables.load(spark, sfDir, "documents")
      val nDocs = docs.count()
      // warm the scan so the measurement is the trainer, not parquet I/O
      val t0 = System.nanoTime()
      val vocab = graft.pipeline.TextAnalysis.unigramLmLearn(
        docs, "text", maxPieceLen = 4, seedSize = seedSize, rounds = rounds)
      val rows = vocab.collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val multi = rows.count(_.getString(0).length >= 2)
      val bytes = rows.map(r => r.getString(0).length.toLong + 16L).sum
      println(f"[tokenizer-envelope] sf=$sfDir docs=$nDocs " +
        f"seedSize=$seedSize rounds=$rounds -> vocab=${rows.length} " +
        f"(multi-char $multi) train=${secs}%.2f s " +
        f"driverState~${bytes / 1024}%d KiB")
    } finally spark.stop()
  }
}
