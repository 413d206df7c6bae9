package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.classify.Normalizer

/** Threat-intel IOC detection (streamalert/rules_engine/threat_intel.py:37-378)
  * re-expressed as a stream-static broadcast join.
  *
  * Reference flow: extract candidate values from the normalization map via a
  * normalized-key -> ioc-type mapping (threat_intel.py:293-324), drop
  * excluded values/CIDRs (threat_intel.py:272-291), batch-query DynamoDB 100
  * values at a time (threat_intel.py:45,152-229), and annotate matching
  * records in-place with `streamalert:ioc {type -> {values}}`
  * (threat_intel.py:105-132).
  *
  * Spark shape (scale notes): candidates are exploded WITH a per-record id,
  * broadcast-joined against the IOC table (the table is the small side — it
  * replaces the DynamoDB lookup; at 100 TB of records the build side is
  * unchanged), then matches are re-aggregated per record id and joined back.
  * Matches are rare in practice, so the join-back side is tiny and AQE
  * broadcasts it — the only shuffle is over MATCHED records, never the full
  * stream. */
final class ThreatIntel(
    iocTable: DataFrame, // columns: ioc_value string, sub_type string
    normalizedTypeToIoc: Map[String, String], // e.g. "sourceAddress" -> "ip"
    excluded: Map[String, Seq[String]] = Map.empty) { // ioc_type -> values/CIDRs

  val IocKey = "streamalert_ioc"

  private def isExcluded(iocType: String, value: Column): Column =
    excluded.get(iocType) match {
      case None => lit(false)
      case Some(exclusions) if iocType == "ip" =>
        // filter non-IPs and excluded networks (threat_intel.py:287-289)
        !Helpers.validIp(value) || Helpers.inNetwork(value, exclusions)
      case Some(exclusions) => value.isin(exclusions: _*)
    }

  /** Annotate records bearing a normalization map with
    * `streamalert_ioc: map<string, array<string>>` (ioc_type -> matched
    * values); records with no matches get an empty map. */
  def annotate(df: DataFrame, recordId: String = Normalizer.RecordIdKey): DataFrame = {
    val iocMapType = MapType(StringType, ArrayType(StringType))

    // candidate (ioc_type, value) pairs per record, from the normalization map
    val candidateStructs = normalizedTypeToIoc.toSeq.map { case (normKey, iocType) =>
      transform(
        Normalizer.valuesForNormalizedType(col(Normalizer.NormalizationKey), normKey),
        v => when(!isExcluded(iocType, v),
          struct(lit(iocType).as("ioc_type"), v.as("value"))))
    }
    val candidates = array_compact(flatten(array(candidateStructs: _*)))

    val exploded = df
      .select(col(recordId).as("__rid"), explode(candidates).as("cand"))
      .select(col("__rid"), col("cand.ioc_type"), col("cand.value"))

    // broadcast hash join against the IOC table (projection-pruned to
    // ioc_value only — the reference's ProjectionExpression, threat_intel.py:48)
    val matched = exploded
      .join(broadcast(iocTable.select(col("ioc_value"))),
        exploded("value") === col("ioc_value"), "left_semi")
      .groupBy("__rid", "ioc_type")
      .agg(array_sort(array_distinct(collect_list(col("value")))).as("vals"))
      .groupBy("__rid")
      .agg(map_from_arrays(collect_list(col("ioc_type")),
        collect_list(col("vals"))).as(IocKey))

    df.join(matched, df(recordId) === matched("__rid"), "left_outer")
      .drop("__rid")
      .withColumn(IocKey, coalesce(col(IocKey), map().cast(iocMapType)))
  }

  /** is_ioc rule surface (rule usage:
    * rules/community/onelogin/onelogin_events_threat_intel_example.py:24). */
  def isIoc(df: DataFrame): Column = size(map_keys(col(IocKey))) > 0
}

/** Per-micro-batch refreshed IOC table (SURVEY §7.5's flagged risk).
  *
  * The reference keeps its IOC DynamoDB table fresh OUT-OF-BAND via the
  * threat_intel_downloader Lambda (threat_intel_downloader/main.py) while
  * the rules engine queries the live table on every invocation
  * (rules_engine/threat_intel.py:152-229) — so a new IOC takes effect on
  * the next Lambda call without redeploying rules. The Spark analogue:
  * IOCs live in a staged parquet table that a downloader-equivalent job
  * overwrites; [[annotate]] re-reads it on every micro-batch inside
  * `foreachBatch`, so an IOC published between batch N and N+1 matches at
  * N+1 without restarting the stream. Cost per batch is one dim-sized
  * scan + broadcast rebuild — never a stream-side shuffle, and the scan
  * prunes to `ioc_value` exactly like the static path. */
final class RefreshingThreatIntel(
    iocTablePath: String,
    normalizedTypeToIoc: Map[String, String],
    excluded: Map[String, Seq[String]] = Map.empty) extends Serializable {

  val IocKey = "streamalert_ioc"

  /** Snapshot of the staged IOC table as of THIS micro-batch. */
  def current(spark: org.apache.spark.sql.SparkSession): ThreatIntel =
    new ThreatIntel(spark.read.parquet(iocTablePath),
      normalizedTypeToIoc, excluded)

  /** `foreachBatch` body: annotate this batch against the latest IOCs. */
  def annotate(batch: DataFrame, recordId: String = Normalizer.RecordIdKey): DataFrame =
    current(batch.sparkSession).annotate(batch, recordId)
}

object ThreatIntel {
  /** The annotation column rules read (`rec[ThreatIntel.IOC_KEY]`,
    * threat_intel.py:105-132) — the static alias of the instance vals. */
  val IocKey = "streamalert_ioc"

  /** conf/threat_intel.json loader: `normalized_ioc_types` maps ioc_type ->
    * list of normalized keys (threat_intel.py:64-102; inverted here to the
    * per-key mapping the candidate extraction wants) and `excluded_iocs`
    * maps ioc_type -> {value-or-CIDR -> {comment}}. The DynamoDB table the
    * conf names is supplied as the `iocTable` DataFrame — the engine-side
    * equivalent of the batch lookup client. */
  def fromConfJson(json: String, iocTable: DataFrame): ThreatIntel = {
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val normToIoc = Option(root.get("normalized_ioc_types")).map(
      _.properties().asScala.flatMap { e =>
        e.getValue.elements().asScala.map(k => k.asText -> e.getKey)
      }.toMap).getOrElse(Map.empty)
    val excluded = Option(root.get("excluded_iocs")).map(
      _.properties().asScala.map { e =>
        e.getKey -> e.getValue.properties().asScala.map(_.getKey).toSeq
      }.toMap).getOrElse(Map.empty[String, Seq[String]])
    new ThreatIntel(iocTable, normToIoc, excluded)
  }
}
