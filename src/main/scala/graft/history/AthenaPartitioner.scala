package graft.history

/** Hive-partition registration (athena_partitioner/main.py:38-246): the
  * reference Lambda receives S3 object notifications, parses each key
  * against the alerts/data path regexes, infers the table from the path,
  * and issues `ALTER TABLE ... ADD IF NOT EXISTS PARTITION ...` per table.
  *
  * Spark-side, reads through `spark.read.parquet` discover dt partitions
  * from the directory layout, so the engine itself needs no registrar —
  * this exists for the EXTERNAL-catalog deployment (Athena/Glue/HMS
  * tables over the same store), where the statements still have to run.
  * Pure functions: keys → per-table partition specs → ALTER statements
  * (byte-compatible with the reference's), executable via `spark.sql` or
  * any warehouse client.
  */
object AthenaPartitioner {

  /** alerts/dt=YYYY-MM-DD-HH/&lt;file&gt;.json (main.py:41-46). */
  private val AlertsJson =
    """alerts/dt=(\d{4})-(\d{2})-(\d{2})-(\d{2})/.*\.json""".r.unanchored
  /** [data-type]/YYYY/MM/DD/HH/&lt;file&gt; (main.py:47-50). */
  private val DataJson =
    """(\d{4})/(\d{2})/(\d{2})/(\d{2})/.*""".r.unanchored
  /** alerts/dt=YYYY-MM-DD-HH/&lt;file&gt;.parquet (main.py:52-56). */
  private val AlertsParquet =
    """alerts/dt=(\d{4})-(\d{2})-(\d{2})-(\d{2})/.*\.parquet""".r.unanchored
  /** parquet/[data-type]/dt=YYYY-MM-DD-HH/&lt;file&gt; (main.py:57-60). */
  private val DataParquet =
    """dt=(\d{4})-(\d{2})-(\d{2})-(\d{2})/.*""".r.unanchored

  /** One object key parsed: (table, partition spec, location dir).
    *
    * Table inference (main.py:150-166): `alerts` when the alerts regex
    * matched; otherwise the data-type path element — first for json
    * layout, second (under `parquet/`) for parquet layout. Returns None
    * for keys matching no regex (main.py:144-146 "skipping"). */
  def parseKey(bucket: String, key: String, fileFormat: String)
      : Option[(String, String, String)] = {
    val isParquet = fileFormat == "parquet"
    val (alertsRe, dataRe) = if (isParquet) (AlertsParquet, DataParquet)
      else (AlertsJson, DataJson)
    // data regex first, alerts second — main.py:139's pattern order
    val m = dataRe.findFirstMatchIn(key).map(m0 => (false, m0))
      .orElse(alertsRe.findFirstMatchIn(key).map(m0 => (true, m0)))
    // NOTE the reference quirk preserved: the DATA regex is tried first,
    // and for parquet layout `alerts/dt=.../x.parquet` also matches the
    // bare dt= data pattern — the reference then infers the table from
    // the path, which yields 'alerts' only for the alerts bucket; here
    // the same inference applies (path element before dt=).
    m.flatMap { case (isAlerts, g) =>
      val dir = key.substring(0, key.lastIndexOf('/'))
      val parts = dir.split("/")
      // a key whose path has fewer elements than the layout requires (e.g.
      // a bare `dt=.../x.parquet` with no data-type element) is skipped like
      // any other unmatched key — the reference logs-and-skips (main.py:144-146)
      // rather than aborting the whole batch
      val table =
        if (isAlerts || parts.headOption.contains("alerts")) Some("alerts")
        else if (isParquet) parts.lift(1)
        else parts.headOption
      table.map { t =>
        val spec = s"(dt = '${g.group(1)}-${g.group(2)}-${g.group(3)}-${g.group(4)}')"
        (t, spec, s"'s3://$bucket/$dir'")
      }
    }
  }

  /** keys → per-table {partition spec → location} (main.py:111-175's
    * `_get_partitions_from_keys`; spec-keyed map dedupes the same
    * partition arriving from many objects). Keys whose bucket is not in
    * `athenaBuckets` are skipped like the reference's config check. */
  def partitionsFromKeys(keys: Seq[(String, String)],
      athenaBuckets: Set[String], fileFormat: String)
      : Map[String, Map[String, String]] =
    keys.filter(k => athenaBuckets.contains(k._1))
      .flatMap { case (b, k) => parseKey(b, k, fileFormat) }
      .groupBy(_._1)
      .map { case (table, rows) =>
        table -> rows.map { case (_, spec, loc) => spec -> loc }.toMap
      }

  /** One ALTER TABLE per table, all partitions joined — byte-compatible
    * with main.py:190-197's statement. */
  def addPartitionStatements(partitions: Map[String, Map[String, String]])
      : Seq[String] =
    partitions.toSeq.sortBy(_._1).map { case (table, specs) =>
      val joined = specs.toSeq.sorted
        .map { case (spec, loc) => s"PARTITION $spec LOCATION $loc" }
        .mkString(" ")
      s"ALTER TABLE $table ADD IF NOT EXISTS $joined;"
    }
}
