package graft.rules

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lookup tables (streamalert/shared/lookup_tables/): named KV reference data
  * readable from rule bodies via `LookupTables.get(table, key, default)`
  * (core.py:1-153, table.py:32-44).
  *
  * Two driver styles, size-tiered like the reference:
  *  - [[MapLookupTable]] — the S3 driver (driver_s3.py:36,135-157): whole
  *    JSON doc held in memory. Here: a Scala map folded into the plan as a
  *    literal MapType column — zero joins at runtime, refreshed per batch by
  *    rebuilding the plan (the TTL-cache analogue).
  *  - [[DataFrameLookupTable]] — the DynamoDB driver (driver_dynamodb.py:32):
  *    per-key lookup. Here: a broadcast-hash equi-join; the lookup side is
  *    the build side, so stream size never affects the shuffle (none).
  */
sealed trait LookupTable {
  /** Column expression returning the looked-up value for a key column. */
  def get(key: Column, default: Column): Column
}

final case class MapLookupTable(data: Map[String, String]) extends LookupTable {
  def get(key: Column, default: Column): Column = {
    if (data.isEmpty) default
    else {
      val entries = data.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
      coalesce(element_at(map(entries: _*), key.cast("string")), default)
    }
  }
}

/** For big tables: join-based. `get` is not expressible as a pure Column, so
  * this table exposes a DataFrame transform instead. */
final case class DataFrameLookupTable(df: DataFrame, keyCol: String, valueCol: String)
    extends LookupTable {
  def get(key: Column, default: Column): Column =
    throw new UnsupportedOperationException(
      "DataFrame-backed lookup tables join via LookupTables.joinLookup")

  def join(input: DataFrame, key: Column, as: String, default: Column): DataFrame = {
    val lookup = broadcast(df.select(col(keyCol).as("__lk"), col(valueCol).as("__lv")))
    input.join(lookup, key === col("__lk"), "left_outer")
      .withColumn(as, coalesce(col("__lv"), default))
      .drop("__lk", "__lv")
  }
}

object LookupTables {
  /** One table's entry in conf/lookup_tables.json. */
  final case class TableConf(name: String, driver: String,
      params: Map[String, String])

  /** Parse conf/lookup_tables.json (`tables` -> driver + params; the
    * reference's core.py config surface). Cache/TTL knobs become no-ops:
    * the Spark analogue is per-batch plan rebuild (map tier) or broadcast
    * refresh (join tier). */
  def parseConfJson(json: String): Seq[TableConf] = {
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    Option(root.get("tables")).map(_.properties().asScala.map { e =>
      val params = e.getValue.properties().asScala
        .map(p => p.getKey -> p.getValue.asText).toMap
      TableConf(e.getKey, params.getOrElse("driver",
        throw new IllegalArgumentException(s"table ${e.getKey} has no driver")),
        params)
    }.toSeq).getOrElse(Seq.empty)
  }

  /** Materialize configured tables. The S3 driver's whole-JSON-doc fetch
    * (driver_s3.py:135-157) is pluggable via `s3Fetch(bucket, key)` (no
    * egress here; production plugs an S3 client); the DynamoDB driver
    * (driver_dynamodb.py) maps to a join-tier DataFrame supplied by
    * `dynamoSource`. */
  def fromConf(confs: Seq[TableConf],
      s3Fetch: (String, String) => String,
      dynamoSource: TableConf => DataFrame): LookupTables = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    new LookupTables(confs.map { c =>
      c.driver match {
        case "s3" =>
          val doc = s3Fetch(c.params("bucket"), c.params("key"))
          val data = mapper.readTree(doc).properties().asScala
            .map(e => e.getKey -> (if (e.getValue.isTextual) e.getValue.asText
              else e.getValue.toString)).toMap
          c.name -> (MapLookupTable(data): LookupTable)
        case "dynamodb" =>
          val df = dynamoSource(c)
          c.name -> (DataFrameLookupTable(df,
            c.params("partition_key"), c.params("value_key")): LookupTable)
        case other =>
          throw new IllegalArgumentException(s"unknown lookup driver: $other")
      }
    }.toMap)
  }
}

/** The S3 driver's TTL cache (driver_s3.py:47-121): the whole JSON doc
  * reloads after `cache_refresh_minutes`, otherwise rules read the cached
  * copy. Engine shape: `current()` re-fetches when the TTL lapses and the
  * fresh map folds into THAT micro-batch's plan as a literal — call it
  * inside `foreachBatch` exactly like [[graft.rules.RefreshingThreatIntel]].
  * `fetch` is the doc source (an S3 GET in production, a file in tests);
  * `clock` injectable so the TTL edge is unit-testable. Thread-safe via
  * double-checked reload. */
final class RefreshingMapLookupTable(fetch: () => String,
    cacheRefreshMinutes: Int, clock: () => Long = () => System.currentTimeMillis()) {
  @volatile private var loadedAt = Long.MinValue
  @volatile private var table: MapLookupTable = null

  def current(): MapLookupTable = {
    val ttlMs = cacheRefreshMinutes * 60000L
    if (table == null || clock() - loadedAt >= ttlMs) synchronized {
      if (table == null || clock() - loadedAt >= ttlMs) {
        import scala.jdk.CollectionConverters._
        val doc = new com.fasterxml.jackson.databind.ObjectMapper().readTree(fetch())
        table = MapLookupTable(doc.properties().asScala
          .map(e => e.getKey -> (if (e.getValue.isTextual) e.getValue.asText
            else e.getValue.toString)).toMap)
        loadedAt = clock()
      }
    }
    table
  }

  def get(key: Column, default: Column): Column = current().get(key, default)
}

final class LookupTables(tables: Map[String, LookupTable]) {

  /** Rule-author surface: LookupTables.get('table', key, default)
    * (rules/community/duo_authentication/duo_lookup_tables_example.py:14-18). */
  def get(table: String, key: Column, default: Column = lit(null)): Column =
    tables.get(table) match {
      case Some(t: MapLookupTable) => t.get(key, default)
      case Some(_) => throw new UnsupportedOperationException(
        s"table '$table' is join-based; use joinLookup")
      case None => default
    }

  def joinLookup(input: DataFrame, table: String, key: Column, as: String,
      default: Column = lit(null)): DataFrame =
    tables.get(table) match {
      case Some(t: DataFrameLookupTable) => t.join(input, key, as, default)
      case Some(t: MapLookupTable) => input.withColumn(as, t.get(key, default))
      case None => input.withColumn(as, default)
    }
}
