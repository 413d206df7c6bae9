package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.classify.Classifier

/** Guard for the r17 StreamBench source bug class: every prior streaming
  * rec/s figure silently measured the classify-REJECT path because the
  * synthetic JSON line was unterminated. This pins that the shared line
  * expression CLASSIFIES — a future edit that breaks the line again fails
  * here instead of silently re-baselining throughput on garbage. */
class StreamBenchSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("StreamBench synthetic lines classify as demo:json_events (100% accept)") {
    val lines = spark.range(0, 300)
      .select(StreamBench.syntheticEventLine(col("id")).as("value"))
    val tagged = new Classifier(Seq(DemoSchemas.jsonEvents))
      .classify(lines).tagged
    val n = tagged.count()
    val accepted = tagged
      .where(col("log_schema_type") === DemoSchemas.jsonEvents.name).count()
    assert(n === 300L)
    assert(accepted === n,
      s"only $accepted/$n synthetic lines classified — the StreamBench " +
        "rec/s figures would measure the reject path (r17 bug class)")
  }
}
