package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{NormCondition, NormalizedField}
import graft.classify.{ArtifactExtractor, Normalizer, Sanitizer}

/** Mirrors tests/unit/streamalert/shared/test_normalizer.py and
  * test_artifact_extractor.py behaviors. */
class NormalizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val config = Map(
    "category" -> Seq(NormalizedField(
      path = Seq("etype"), function = Some("Event category"),
      condition = Some(NormCondition(Seq("etype"), "in", Seq("purchase", "signup"))))),
    "kval" -> Seq(NormalizedField(path = Seq("props", "k"), function = Some("K value"))),
    "hidden" -> Seq(NormalizedField(path = Seq("event_id"), sendToArtifacts = false)))

  private def df = Seq(
    (1L, "purchase", 7L),
    (2L, "error", 3L),
    (3L, "signup", 0L)) // k=0 is falsey -> kval absent (normalize.py:224-238)
    .toDF("event_id", "etype", "k")
    .select(struct(col("event_id"), col("etype"), struct(col("k")).as("props")).as("record"))

  private def normalized = df.withColumn(
    Normalizer.NormalizationKey,
    Normalizer.normalizationCol(col("record"), config))
    .withColumn(Normalizer.RecordIdKey,
      Normalizer.recordIdCol(col(Normalizer.NormalizationKey),
        deterministicFrom = Some(col("record.event_id"))))

  test("conditions gate extraction; falsey values read as absent") {
    val rows = normalized.select(
      col("record.event_id"),
      array_join(Normalizer.valuesForNormalizedType(
        col(Normalizer.NormalizationKey), "category"), ",").as("cat"),
      array_join(Normalizer.valuesForNormalizedType(
        col(Normalizer.NormalizationKey), "kval"), ",").as("kv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq((1L, "purchase", "7"), (2L, "", "3"), (3L, "signup", "")))
  }

  test("record id present only when something normalized, deterministic") {
    val ids = normalized.select(col(Normalizer.RecordIdKey)).collect().map(_.getString(0))
    assert(ids.forall(_ != null)) // 'hidden' always extracts event_id
    assert(ids.distinct.length == 3)
  }

  test("artifact explosion: flat 5-string rows, send_to_artifacts=false skipped") {
    val arts = ArtifactExtractor.artifacts(normalized, "demo:test")
    val rows = arts.collect().map(r =>
      (r.getString(0), r.getString(2), r.getString(3), r.getString(4))).toSet
    assert(rows.contains(("Event category", "demo:test", "category", "purchase")))
    assert(rows.contains(("K value", "demo:test", "kval", "3")))
    assert(!rows.exists(_._3 == "hidden")) // flag=false excluded
    assert(arts.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("key sanitization renames nested keys, plan-only") {
    val hostile = Seq(("a", 1L)).toDF("user name", "id")
      .select(struct(col("`user name`"), col("id")).as("outer rec"))
    val clean = Sanitizer.sanitizeKeys(hostile)
    assert(clean.schema.fieldNames.toSeq == Seq("outer_rec"))
    assert(clean.schema.fields(0).dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("user_name", "id"))
  }
}
