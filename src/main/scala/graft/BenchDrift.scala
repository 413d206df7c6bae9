package graft

/** Host-drift canary policy for [[Bench]]: three rounds of adjudication
  * (r12/r15/r16 verdicts) were burned on snapshots taken while the host
  * was under unrelated load. The bench now times a fixed-cost canary
  * query at sweep boundaries (start / between runs / end, warmed once so
  * JIT never counts as drift); if the slowest canary sample is more than
  * [[MaxDrift]]× the fastest, the run was not quiet and the snapshot is
  * written to `BENCH_LOCAL.drifted.json` instead of overwriting the
  * committed `BENCH_LOCAL.json`. The ratio itself ships in the JSON
  * (`drift_ratio`, plus the raw `canary` samples and 1-min load average
  * before/after), so adjudicating a suspect snapshot is one number. */
object BenchDrift {

  /** A drifted run may not overwrite the quiet snapshot. */
  val MaxDrift = 1.3

  /** The canary: cheap, shuffle-light, cardinality-stable — its wall time
    * moves with host contention, not with plan changes under test. */
  val CanaryQuery = "t4_fingerprint"

  /** max/min over the canary samples; 1.0 when degenerate (fewer than two
    * samples, or a non-positive time from a failed canary run — a broken
    * canary must not quarantine the snapshot). */
  def driftRatio(samples: Seq[Double]): Double =
    if (samples.size < 2 || samples.exists(_ <= 0)) 1.0
    else samples.max / samples.min

  /** Where the snapshot lands for a given drift ratio. */
  def snapshotFile(driftRatio: Double): String =
    if (driftRatio > MaxDrift) "BENCH_LOCAL.drifted.json" else "BENCH_LOCAL.json"

  /** 1-minute system load average (-1.0 where unavailable). */
  def loadAverage(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  /** Host-speed control set for [[hostIndex]] (r18 verdict ask #7): ten
    * long-stable rows across families, each ≥1 s at sf0.1 (single-shot
    * noise on a 0.2 s row false-reads as drift) and none on any active
    * optimization path. REPICKED r19-opt: the r18 set (o1/o12/s1/r5/a7 +
    * friends) became exactly the rows that optimization round targeted —
    * a control row that speeds up reads as a "faster host" and corrupts
    * every cross-round normalization — so the set now draws from the
    * graph/ANN/SQL/window families this round measured and deliberately
    * left alone. The round after ANY round that optimizes a control row
    * must repick, or retire the stale row from the ratio by hand. */
  val HostIndexControl: Seq[String] = Seq(
    "q31_pagerank_trade", "q40_incremental_view", "q51_weighted_median",
    "q54_label_propagation", "p4_entity_resolution", "ann_lsh_planted",
    "ann_ivf_planted", "t68_dawid_skene", "t28_nb_classifier",
    "t26_quality_calibration")

  /** Median per-query ratio of the current run's medians vs the committed
    * quiet snapshot over [[HostIndexControl]] — the mechanical form of
    * the host-speed adjudication r18's verdict did in prose (its hand
    * analysis: median control ratio 1.165 ≙ a ~1.17× slower host).
    * Cross-round comparisons divide by this. -1.0 when fewer than 5
    * control rows are usable (no committed snapshot, renamed rows) —
    * distinct from 1.0, which means "same-speed host". */
  def hostIndex(current: Map[String, Double],
      baseline: Map[String, Double]): Double = {
    val ratios = HostIndexControl.flatMap { q =>
      for {
        c <- current.get(q); b <- baseline.get(q)
        if c > 0 && b > 0
      } yield c / b
    }.sorted
    if (ratios.size < 5) -1.0
    else if (ratios.size % 2 == 1) ratios(ratios.size / 2)
    else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2
  }

  /** The committed quiet snapshot's per-query medians (empty map when the
    * file is missing/unparseable — hostIndex then reports -1.0). Read
    * BEFORE the run overwrites the snapshot. */
  def committedQueries(path: String = "BENCH_LOCAL.json"): Map[String, Double] =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      val idx = s.lastIndexOf("\"queries\":{")
      if (idx < 0) Map.empty
      else "\"([A-Za-z0-9_]+)\":(-?[0-9][0-9.]*)".r
        .findAllMatchIn(s.substring(idx + 11))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
}
