package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // n>=3 runs with per-query medians: single-shot timings at this scale
    // carry ±30-50% run-to-run noise (observed r1→r2), which makes
    // round-over-round comparison unattributable
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as epoch-nanos long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/JIT/file-index so the first timed query isn't charged
    // session startup
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val names = SparkEntry.queries.keys.toSeq.sorted
    // run-major order (full sweep per run) so consecutive samples of one
    // query don't share a hot page cache/JIT state unrealistically
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    for (_ <- 1 to runs; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // failures must be LOUD — in the JSON itself, not just stderr: a
      // swallowed exception would otherwise time as ~0s and read as a
      // perf win (bit by the a6 repeat-run bug)
      try {
        fn(spark, sfDir).count()
        samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      // drop persisted stages (dedup/ANN pipelines cache their signature
      // stage) so every run recomputes rather than reading the cache
      spark.catalog.clearCache()
    }
    // a query that failed in ANY run reports -1 (never a time-to-throw,
    // never a partial-sample median) and is excluded from the total; the
    // "failed" list makes it machine-visible
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val med = names.map(n =>
      n -> (if (failed.contains(n)) -1.0 else median(samples(n)))).toMap
    val spread = names.map { n =>
      val xs = samples(n)
      n -> (if (xs.isEmpty) 0.0 else xs.max - xs.min)
    }.toMap
    // Locale.ROOT: the f"" interpolator honors the default locale, and a
    // comma decimal separator would emit malformed JSON
    def num(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", d)
    def jmap(m: Map[String, Double]): String =
      names.map(n => s"\"" + n + "\":" + num(m(n))).mkString("{", ",", "}")
    val total = med.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // field order matters: harness snapshots keep only a TAIL window of
    // stdout, so the dict that must survive truncation — the medians — goes
    // LAST (r8 post-mortem: spread-last meant the driver artifact's visible
    // tail was the spread dict, read as 200x-wrong "medians")
    val json = s"""{"metric":"total_median","value":$total,"unit":"sec","runs":$runs,"failed":$failedJson,"sf":"$sfDir","spread":${jmap(spread)},"queries":${jmap(med)}}"""
    // printed TWICE and mirrored to a repo file: harness snapshots that keep
    // only a tail window of stdout front-truncate a single long line (seen
    // r4+r5); the duplicate line and the file keep the full payload reachable
    println(json)
    println(json)
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
