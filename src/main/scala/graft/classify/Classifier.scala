package graft.classify

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.core.LogSchema

/** Schema resolution: try each candidate log type in declared order, first
  * full success wins (streamalert/classifier/classifier.py:116-149).
  *
  * Spark shape: ONE narrow projection computes `log_schema_type` via a lazy
  * CASE chain of the compiled validity predicates (left-to-right
  * short-circuit = the reference's early exit, classifier.py:131-147), then
  * per-type DataFrames are filtered views that materialize the typed record
  * only for their own rows. No shuffle anywhere; everything stays inside
  * whole-stage codegen, so at 100 TB this is a pure scan-side map.
  */
final class Classifier(schemas: Seq[LogSchema]) {

  val compiled: Seq[CompiledSchema] = schemas.map(CompiledSchema)

  /** Column with the resolved log type name (null = unclassifiable). */
  def logTypeCol(value: Column): Column =
    compiled.foldRight(lit(null).cast(StringType): Column) { (cs, acc) =>
      when(cs.validCol(value), lit(cs.s.name)).otherwise(acc)
    }

  /** Classify a DataFrame bearing a raw string column.
    *
    * Returns the input with a `log_schema_type` column, plus accessors for
    * per-type typed streams and the dead-letter stream
    * (invalid-record routing, classifier.py:202-215).
    */
  def classify(df: DataFrame, valueCol: String = "value"): ClassifiedStreams = {
    val tagged = df.withColumn("log_schema_type", logTypeCol(col(valueCol)))
    ClassifiedStreams(tagged, compiled, valueCol)
  }
}

final case class ClassifiedStreams(
    tagged: DataFrame, compiled: Seq[CompiledSchema], valueCol: String) {

  /** Typed stream for one log type: metadata + `record` struct + envelope. */
  def forType(name: String): DataFrame = {
    val cs = compiled.find(_.s.name == name)
      .getOrElse(throw new NoSuchElementException(s"unknown log type: $name"))
    cs.parseTyped(tagged.where(col("log_schema_type") === name), valueCol)
  }

  /** Records matching no declared schema — FAILED_PARSES dead letter
    * (classifier.py:236-239). */
  def invalid: DataFrame = tagged.where(col("log_schema_type").isNull)

  def types: Seq[String] = compiled.map(_.s.name)
}
