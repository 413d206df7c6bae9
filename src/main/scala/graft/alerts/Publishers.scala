package graft.alerts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Publishers (SURVEY §2.4 A5; streamalert/shared/publisher.py:39-266):
  * ordered chain of alert→publication transforms applied per output before
  * dispatch. The reference deep-copies dicts between stages
  * (CompositePublisher); here each publisher is a pure DataFrame transform,
  * so "copy" is free and the chain fuses into one projection.
  *
  * The default publisher is the full alert dict (publisher.py `output_dict`
  * default); community publishers like 'StripRecord' or 'add_record_fields'
  * are representative transforms. */
object Publishers {

  type Publisher = DataFrame => DataFrame

  private val registry = scala.collection.mutable.LinkedHashMap[String, Publisher](
    // default publisher: pass everything through (publisher.py default)
    "default" -> identity,
    // community-style publishers (publishers/community/generic.py behaviors)
    "strip_record" -> (df => df.drop("record")),
    "remove_internal_fields" -> (df =>
      df.drop("staged", "publishers", "merge_by_keys", "merge_window_mins")))

  def register(name: String)(p: Publisher): Unit = registry(name) = p

  def apply(name: String): Publisher =
    registry.getOrElse(name, throw new NoSuchElementException(s"unknown publisher: $name"))

  /** Compose an ordered chain (CompositePublisher, publisher.py:150-200). */
  def chain(names: Seq[String]): Publisher =
    names.map(apply).foldLeft(identity[DataFrame] _)(_ andThen _)

  /** Publication JSON per alert for a given output's chain. */
  def publish(alerts: DataFrame, names: Seq[String]): DataFrame = {
    val transformed = chain(if (names.isEmpty) Seq("default") else names)(alerts)
    transformed.withColumn("publication",
      to_json(struct(transformed.columns.map(col): _*)))
  }
}
