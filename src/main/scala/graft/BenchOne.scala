package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: time individual queries by name (same session config as
  * Bench). `runMain graft.BenchOne q1_agg d2_dedup_minhash_lsh ...` */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // SPARK_GRAFT_AQE_* expose AQE coalescing knobs for headroom-cost
      // experiments (defaults match Bench: Spark's own — the measured
      // receipts on why NO initialPartitionNum headroom are in Bench)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_AQE_INIT", cpus))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PFIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "64m"))
      // SPARK_GRAFT_OPENCOST: scan-split floor experiment (guide §6) —
      // openCostInBytes is the binding constraint on split count for
      // single small files (maxSplitBytes = max(openCost, bytes/cores))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPENCOST", "4194304"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // first run per query is reported as COLD (JIT/codegen/file-index —
    // 2-4x the steady-state cost, r16 verdict's spot-check trap); the
    // number that matters for receipts is the warm median
    args.foreach { name =>
      def timed(): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (cold, n) = timed()
      // SPARK_GRAFT_BENCHONE_RUNS=1: cold-only, for hour-scale receipts
      // (the 1000x corpus) where 3 executions are impractical — the
      // printout then quotes the cold time explicitly
      val warmRuns =
        sys.env.getOrElse("SPARK_GRAFT_BENCHONE_RUNS", "3").toInt - 1
      if (warmRuns <= 0)
        println(f"[benchone] $name%-32s cold $cold%7.2f s  (single run, $n rows)")
      else {
        val warm = Seq.fill(warmRuns)(timed()._1)
        // mean of the warm samples (Bench's even-count median is the
        // same middle-pair average); sorted(1) would be the warm MAX
        val warmMean = warm.sum / warm.size
        println(f"[benchone] $name%-32s cold $cold%7.2f s  " +
          f"warm ${warm.map(w => f"$w%.2f").mkString("/")} s  " +
          f"(mean $warmMean%.2f s, $n rows)")
      }
    }
    spark.stop()
  }
}
