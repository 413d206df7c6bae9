package graft

import org.scalatest.funsuite.AnyFunSuite

/** BenchDrift — the snapshot-quarantine policy (r16 verdict ask #4):
  * drifted runs must never overwrite the committed quiet snapshot. */
class BenchDriftSpec extends AnyFunSuite {

  test("drift ratio is max/min over positive samples") {
    assert(BenchDrift.driftRatio(Seq(0.10, 0.11, 0.12)) === 1.2)
    assert(BenchDrift.driftRatio(Seq(0.10, 0.50)) === 5.0)
  }

  test("degenerate canaries never quarantine: <2 samples or failed runs → 1.0") {
    assert(BenchDrift.driftRatio(Nil) === 1.0)
    assert(BenchDrift.driftRatio(Seq(0.3)) === 1.0)
    assert(BenchDrift.driftRatio(Seq(0.3, -1.0, 0.4)) === 1.0)
  }

  test("snapshot target: quiet overwrites, drifted diverts") {
    assert(BenchDrift.snapshotFile(1.0) === "BENCH_LOCAL.json")
    assert(BenchDrift.snapshotFile(BenchDrift.MaxDrift) === "BENCH_LOCAL.json")
    assert(BenchDrift.snapshotFile(1.31) === "BENCH_LOCAL.drifted.json")
    assert(BenchDrift.snapshotFile(77.0) === "BENCH_LOCAL.drifted.json")
  }

  test("the canary query exists in the registry") {
    assert(SparkEntry.queries.contains(BenchDrift.CanaryQuery))
  }
}
