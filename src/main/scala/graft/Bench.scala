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
      // NO initialPartitionNum headroom: measured (r18), raising it to
      // 8x/4x cpus taxes every exchange's map side (256 shuffle buckets
      // per task beats the bypass-merge threshold; parallelismFirst
      // coalescing then splinters small stages into 1 MB tasks) for
      // +~12% total at sf0.1, while the scale wins it bought are owned
      // by the operator-level estimates (graft.pipeline.AdaptiveParts
      // sizes candidate-join exchanges from the bucket histogram, which
      // AQE cannot price before the join runs). A real cluster sets its
      // own parallelism; the operators carry their sizing with them.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/JIT/file-index so the first timed query isn't charged
    // session startup
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val names = SparkEntry.queries.keys.toSeq.sorted
    // host-drift canary (see BenchDrift): fixed-cost query timed at sweep
    // boundaries; warmed once so its JIT never reads as drift
    val loadBefore = BenchDrift.loadAverage()
    val canaryFn = SparkEntry.queries.get(BenchDrift.CanaryQuery)
    // each sample is the SUM of 3 back-to-back executions: a single ~0.1s
    // run carries ±40% scheduler jitter, which false-trips the 1.3x gate
    def canarySample(): Double = canaryFn.map { fn =>
      spark.catalog.clearCache()
      val c0 = System.nanoTime()
      try {
        (1 to 3).foreach(_ => fn(spark, sfDir).count())
        (System.nanoTime() - c0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }.getOrElse(-1.0)
    // untimed warm-up: the pre-sweep sample stays ~2.3x hot-state cost even
    // after repeated warm-ups (whole-JVM C2 state, measured) — it ships in
    // the JSON for visibility but is EXCLUDED from the drift ratio below
    canaryFn.foreach(fn =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () })
    val canary = scala.collection.mutable.ArrayBuffer(canarySample())
    // run-major order (full sweep per run) so consecutive samples of one
    // query don't share a hot page cache/JIT state unrealistically
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    for (run <- 1 to runs) {
      for (name <- names) {
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
      canary += canarySample() // boundary sample: start/…/mid/…/end
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
    val loadAfter = BenchDrift.loadAverage()
    // drift over the POST-SWEEP samples only: after one full sweep the JVM
    // is hot and the canary is a pure host-contention signal; the pre-sweep
    // sample (canary[0]) carries residual compile cost and would read as
    // permanent ~2x false drift. Samples pass UNFILTERED so a failed
    // canary run (-1) hits driftRatio's broken-canary guard (ratio 1.0 —
    // an unadjudicable canary must not quarantine)
    val driftRatio = BenchDrift.driftRatio(canary.toSeq.drop(1))
    val canaryJson = canary.map(num).mkString("[", ",", "]")
    // host-speed index vs the COMMITTED snapshot (read before this run
    // overwrites it): cross-round comparisons normalize by this instead
    // of reconstructing control-row ratios by hand (r18 verdict ask #7)
    val hostIndex = BenchDrift.hostIndex(med, BenchDrift.committedQueries())
    // field order matters: harness snapshots keep only a TAIL window of
    // stdout, so the dict that must survive truncation — the medians — goes
    // LAST (r8 post-mortem: spread-last meant the driver artifact's visible
    // tail was the spread dict, read as 200x-wrong "medians")
    val json = s"""{"metric":"total_median","value":$total,"unit":"sec","runs":$runs,"failed":$failedJson,"sf":"$sfDir","load_before":${num(loadBefore)},"load_after":${num(loadAfter)},"canary":$canaryJson,"drift_ratio":${num(driftRatio)},"host_index":${num(hostIndex)},"spread":${jmap(spread)},"queries":${jmap(med)}}"""
    // printed TWICE and mirrored to a repo file: harness snapshots that keep
    // only a tail window of stdout front-truncate a single long line (seen
    // r4+r5); the duplicate line and the file keep the full payload reachable
    println(json)
    println(json)
    // compact summary printed LAST (r19 verdict ask #2): the full line is
    // ~17 KB for 335 queries and a harness that keeps only a ~2000-char
    // stdout tail always front-truncates it — this <500-char line carries
    // the totals (no per-query dicts) and survives any tail window. The
    // full-payload lines above and the BENCH_LOCAL.json mirror are
    // unchanged; nothing about the measurement itself changed.
    println(s"""{"metric":"total_median","value":$total,"unit":"sec","runs":$runs,"n_queries":${names.size},"failed":$failedJson,"drift_ratio":${num(driftRatio)},"host_index":${num(hostIndex)},"sf":"$sfDir"}""")
    // a drifted run (canary max/min beyond BenchDrift.MaxDrift) must not
    // overwrite the committed quiet snapshot — it lands in a sibling file
    // and says so loudly; a run with FAILED queries is not a quiet-truth
    // figure either (a killed/partial run once overwrote the snapshot)
    val snapFile =
      if (failed.nonEmpty) "BENCH_LOCAL.failed.json"
      else BenchDrift.snapshotFile(driftRatio)
    // cause-specific diversion messages: a failed-query run is not host
    // drift, and saying so when the ratio is quiet was misleading
    if (failed.nonEmpty)
      System.err.println(s"[bench] QUERY FAILURES: ${failed.mkString(", ")} " +
        s"— snapshot diverted to $snapFile")
    else if (snapFile != "BENCH_LOCAL.json")
      System.err.println(f"[bench] HOST DRIFT: canary ratio $driftRatio%.2f > " +
        f"${BenchDrift.MaxDrift}%.2f — snapshot diverted to $snapFile")
    try java.nio.file.Files.write(java.nio.file.Paths.get(snapFile),
      (json + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
