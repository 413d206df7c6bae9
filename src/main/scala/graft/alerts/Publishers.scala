package graft.alerts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Publishers (SURVEY §2.4 A5; streamalert/shared/publisher.py:39-266 +
  * publishers/community/generic.py): ordered chain of alert→publication
  * transforms applied per output before dispatch.
  *
  * The reference passes `(alert, publication)` through each publisher and
  * deep-copies between stages (CompositePublisher). Here the publication is
  * a STRUCT COLUMN built from the alert row; each publisher is a DataFrame
  * transform that rewrites that column (bookkeeping columns — alert_id,
  * outputs — stay untouched for the dispatcher), the chain fuses into one
  * projection, and "copy" is free. `publish` serializes the final struct to
  * the `publication` JSON per alert.
  *
  * Library parity (generic.py):
  *   - default                           = full alert dict (publisher.py default)
  *   - strip_record / add_record / record_only (blank+add_record composite)
  *   - remove_internal_fields            (generic.py:38-46)
  *   - remove_streamalert_normalization  (generic.py:109-112)
  *   - enumerate_fields                  (generic.py:115-168): nested structs
  *     flatten to dotted keys sorted alphabetically; arrays/maps serialize as
  *     JSON (plan-time schemas cannot enumerate runtime indices)
  *   - populateFields(keys)              (generic.py:171-203): deep get_keys
  *     per key; always an array of hits (the reference unwraps singleton
  *     extractions — runtime arity, not expressible in a fixed column type)
  */
object Publishers {

  type Publisher = DataFrame => DataFrame

  val PublicationCol = "publication"

  private def onPub(f: Column => Column): Publisher =
    df => df.withColumn(PublicationCol, f(col(PublicationCol)))

  private val registry = scala.collection.mutable.LinkedHashMap[String, Publisher](
    "default" -> identity,
    "strip_record" -> onPub(_.dropFields("record")),
    "add_record" -> (df => df.withColumn(PublicationCol,
      col(PublicationCol).withField("record", col("record")))),
    // the practical blank-then-add_record composition (generic.py blank:32-34
    // exists to start a fresh dict; an empty struct column is untypable)
    "record_only" -> (df => df.withColumn(PublicationCol, struct(col("record")))),
    "remove_internal_fields" -> onPub(_.dropFields(
      "staged", "publishers", "outputs", "merge_by_keys", "merge_window_mins",
      "merge_key_vals")),
    "remove_streamalert_normalization" -> onPub(
      _.dropFields(graft.classify.Normalizer.NormalizationKey)),
    "enumerate_fields" -> (df => df.withColumn(PublicationCol,
      enumerateFields(col(PublicationCol),
        df.schema(PublicationCol).dataType.asInstanceOf[StructType]))))

  def register(name: String)(p: Publisher): Unit = registry(name) = p

  def apply(name: String): Publisher =
    registry.getOrElse(name, throw new NoSuchElementException(s"unknown publisher: $name"))

  /** Compose an ordered chain (CompositePublisher, publisher.py:150-200). */
  def chain(names: Seq[String]): Publisher =
    names.map(apply).foldLeft(identity[DataFrame] _)(_ andThen _)

  /** Publication JSON per alert for a given output's chain. */
  def publish(alerts: DataFrame, names: Seq[String]): DataFrame = {
    val withPub = alerts.withColumn(PublicationCol,
      struct(alerts.columns.map(col): _*))
    val transformed = chain(if (names.isEmpty) Seq("default") else names)(withPub)
    transformed.withColumn(PublicationCol, to_json(col(PublicationCol)))
  }

  /** enumerate_fields (generic.py:115-168): collapse nested structs into a
    * single level with dotted-path keys, alphabetical. */
  private def enumerateFields(pub: Column, dt: StructType): Column = {
    def flat(c: Column, t: DataType, path: String): Seq[(String, Column)] = t match {
      case st: StructType => st.fields.toSeq.flatMap { f =>
        val p = if (path.isEmpty) f.name else s"$path.${f.name}"
        flat(c.getField(f.name), f.dataType, p)
      }
      case _: ArrayType | _: MapType => Seq(path -> to_json(c))
      case _ => Seq(path -> c)
    }
    val fields = flat(pub, dt, "").sortBy(_._1)
    struct(fields.map { case (p, c) => c.as(p) }: _*)
  }

  /** populate_fields (generic.py:171-203): keep ONLY the requested keys,
    * each deep-searched through the publication (typed get_keys); a key
    * absent from the schema publishes an empty array (reference: None). */
  def populateFields(keys: Seq[String]): Publisher = df => {
    val pubType = df.schema(PublicationCol).dataType
    val cols = keys.map { k =>
      val hits = scala.util.Try(
        graft.rules.Helpers.getKeys(col(PublicationCol), pubType, k))
      hits.getOrElse(array().cast(ArrayType(StringType))).as(k)
    }
    df.withColumn(PublicationCol, struct(cols: _*))
  }
}
