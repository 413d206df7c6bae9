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
}
