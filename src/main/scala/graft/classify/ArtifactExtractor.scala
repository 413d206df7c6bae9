package graft.classify

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Artifact explosion (streamalert/shared/artifact_extractor.py:101-159):
  * the normalization map becomes one flat row per (type, value) —
  * `{function, streamalert_record_id, source_type, type, value}` — with all
  * columns forced to string "to prevent type corruption in Parquet"
  * (artifact_extractor.py:45-49). Entries flagged send_to_artifacts=false
  * are skipped (artifact_extractor.py:128-133).
  *
  * Spark shape: explode(map) → explode(entries) → explode(values); a pure
  * narrow generator pipeline, no shuffle.
  */
object ArtifactExtractor {

  /** df must carry the normalization map column + record-id column. */
  def artifacts(df: DataFrame, sourceType: String,
      normCol: String = Normalizer.NormalizationKey,
      recordIdCol: String = Normalizer.RecordIdKey): DataFrame = {
    df
      .select(col(recordIdCol), explode(col(normCol)).as(Seq("type", "entries")))
      .select(col(recordIdCol), col("type"), explode(col("entries")).as("entry"))
      .where(col("entry.send_to_artifacts"))
      .select(
        coalesce(col("entry.function"), lit("")).cast(StringType).as("function"),
        col(recordIdCol).cast(StringType).as("streamalert_record_id"),
        lit(sourceType).as("source_type"),
        col("type").cast(StringType).as("type"),
        explode(col("entry.values")).as("value"))
      .withColumn("value", col("value").cast(StringType))
  }
}
