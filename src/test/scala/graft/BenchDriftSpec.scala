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

  test("host index: median control-row ratio vs the committed snapshot") {
    val ctl = BenchDrift.HostIndexControl
    assert(ctl.size == 10 && ctl.forall(SparkEntry.queries.contains),
      "every control row must exist in the registry")
    // 10 usable rows at ratios 1.0,1.1,...,1.9 → median 1.45
    val base = ctl.map(_ -> 1.0).toMap
    val cur = ctl.zipWithIndex.map { case (q, i) => q -> (1.0 + i / 10.0) }.toMap
    assert(math.abs(BenchDrift.hostIndex(cur, base) - 1.45) < 1e-9)
    // a failed row (-1) and a missing row drop out; median over the rest
    val cur2 = cur + (ctl.head -> -1.0) - ctl(1)
    val rest = ctl.drop(2).map(cur).sorted
    val want = (rest(3) + rest(4)) / 2
    assert(math.abs(BenchDrift.hostIndex(cur2, base) - want) < 1e-9)
    // fewer than 5 usable rows → -1.0 (unadjudicable, not "same speed")
    assert(BenchDrift.hostIndex(
      ctl.take(4).map(_ -> 1.2).toMap, base) === -1.0)
    assert(BenchDrift.hostIndex(cur, Map.empty) === -1.0)
  }

  test("committedQueries parses the snapshot's trailing queries dict") {
    val f = java.nio.file.Files.createTempFile("bench", ".json")
    java.nio.file.Files.write(f,
      ("""{"metric":"total_median","value":1.5,"spread":{"a":0.1},""" +
        """"queries":{"a":1.250,"b":-1.000,"c":0.033}}""").getBytes("UTF-8"))
    val m = BenchDrift.committedQueries(f.toString)
    assert(m === Map("a" -> 1.25, "b" -> -1.0, "c" -> 0.033))
    assert(BenchDrift.committedQueries("/nonexistent/x.json") === Map.empty)
    java.nio.file.Files.delete(f)
  }
}
