package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Stream sources (SURVEY §2.1 S1-S5) normalized to a `value: STRING` column
  * plus service/resource metadata — the StreamPayload surface
  * (streamalert/classifier/payload/payload_base.py:191-280).
  *
  * The SQS classifier→rules hop (S5) disappears: one pipeline. The app
  * pollers (S4) are the [[AppPollerSource]] MicroBatchStream connector. */
object Sources {

  /** Decode a kinesis-style record: base64 → (transparent) gunzip → text
    * (classifier/payload/kinesis.py). unbase64 is built-in; gunzip is the
    * native codegen'd expression [[graft.functions.Gunzip]] — the decode
    * stays inside the whole-stage generated loop, no UDF boundary. */
  def decodeKinesisData(data: Column): Column =
    graft.functions.Gunzip.gunzip(unbase64(data))

  /** Attach the payload envelope metadata (service + resource — the
    * resource mapper, payload_base.py:248-253). */
  def withSourceMetadata(df: DataFrame, service: String, resource: String): DataFrame =
    df.withColumn("source_service", lit(service))
      .withColumn("source_entity", lit(resource))

  /** S2: S3-object / file-drop source — JSON-lines or raw lines; gzip is
    * handled transparently by the text reader via file extension
    * (classifier/payload/s3.py:124-137,153-174). */
  def fileDrop(spark: SparkSession, path: String): DataFrame =
    withSourceMetadata(spark.read.text(path).withColumnRenamed("value", "value"),
      "s3", path)

  /** S2 whole-object mode (classifier/payload/s3.py:153-174): each S3
    * object is first tried as ONE JSON document — the pretty-printed
    * multi-line CloudTrail-export shape — and only falls back to
    * line-orientation (JSON-lines or raw text) when that parse fails.
    *
    * `wholetext` reads one row per file (gzip decoded transparently by
    * extension, s3.py:124-137); `try_parse_json` is the engine-side
    * `json.load` probe, and a whole-file hit is re-serialized to a single
    * minified line so the downstream classifier sees the same wire format
    * as every other source. Scale shape: files parallelize across
    * executors; no driver involvement. */
  def objectDrop(spark: SparkSession, path: String): DataFrame = {
    val whole = spark.read.option("wholetext", "true").text(path)
    val asOneJson = to_json(try_parse_json(col("value")))
    val lines = filter(split(col("value"), "\\r?\\n"), l => trim(l) =!= "")
    // try_parse_json is permissive about trailing data (a JSON-lines file
    // "parses" as its first value) where the reference's json.load raises
    // and falls back to jsonlines — so whole-object mode additionally
    // requires (a) the document to start as an object/array (a scalar
    // prefix like "123 abc" must stay a raw line) and (b) multiple lines
    // whose first is NOT complete JSON on its own (a pretty-printed
    // document's first line is "{"). Single-line files take line mode — a
    // one-line JSON doc classifies identically there, and any trailing
    // garbage is preserved for the dead letter instead of truncated.
    // Known narrowing vs the reference: two CONCATENATED pretty-printed
    // docs in one object emit only the first (json.load raises and falls
    // back to lines); detecting that needs parse positions, which
    // try_parse_json does not expose.
    // NOT trim(): Spark's trim strips ASCII space only — a document opening
    // with "\n{" must still whole-parse, so strip the full whitespace class
    val firstChar = substring(regexp_replace(col("value"), "^\\s+", ""), 1, 1)
    val firstLineIsJson = try_parse_json(trim(element_at(lines, 1))).isNotNull
    val wholeMode = asOneJson.isNotNull &&
      (firstChar === "{" || firstChar === "[") &&
      size(lines) > 1 && !firstLineIsJson
    withSourceMetadata(
      whole.select(explode(
        when(wholeMode, array(asOneJson)).otherwise(lines)).as("value")),
      "s3", path)
  }

  /** Streaming variant of the file-drop source (the Auto-Loader-style
    * file-notification mode). */
  def fileDropStream(spark: SparkSession, path: String,
      schemaHint: String = "value STRING"): DataFrame =
    spark.readStream.schema(schemaHint).text(path)

  /** S3 source (SNS): the record is JSON inside `Sns.Message`
    * (classifier/payload/sns.py); S3-event-via-SNS unwraps one more level
    * (payload_base.py:264-273). */
  def snsMessage(envelope: Column): Column =
    get_json_object(envelope, "$.Sns.Message")

  /** S10: scheduled-query results re-entering the pipeline are just another
    * value column — see graft.history.ScheduledQueries.asStreamQueryRecords. */
}
