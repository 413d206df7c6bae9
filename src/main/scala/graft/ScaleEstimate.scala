package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev helper for scale receipts: print the PPJoin family's candidate-pair
  * estimate for a corpus WITHOUT running the join — the number
  * [[graft.pipeline.Dedup.similarityJoinPlan]] computes for exchange
  * sizing and the outgrown-exactness advisory. Receipts quote it next to
  * the sizing budget so "this corpus outgrew exact PPJoin" is a measured
  * statement, not a vibe.
  *
  * `runMain graft.ScaleEstimate <sfDir> [threshold...]` */
object ScaleEstimate {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val thresholds =
      if (args.length > 1) args.drop(1).map(_.toDouble).toSeq else Seq(0.6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val budget = graft.pipeline.AdaptiveParts.MaxParts.toLong *
      graft.pipeline.AdaptiveParts.RowsPerPartition
    thresholds.foreach { t =>
      val t0 = System.nanoTime()
      // the same stages similarityJoinPlan prices; the estimate job is
      // the only thing executed
      val (prefix, _, stages) = graft.pipeline.Dedup.ppjoinPrefixStage(
        docs, "text", "doc_id", 2, t)
      val est = graft.pipeline.AdaptiveParts.allPairEstimate(prefix,
        Seq("tok"))
      stages.foreach(_.unpersist(false))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scale-estimate] docs=$n%,d t=$t candidate_pairs=$est%,d " +
        f"budget=$budget%,d ratio=${est.toDouble / budget}%.2f " +
        f"outgrown=${est > budget} (estimate job $secs%.1f s)")
    }
    spark.stop()
  }
}
