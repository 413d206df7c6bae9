package graft.alerts

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One alert as consumed by the merger.
  *
  * `merge_key_vals` is the '|'-joined VALUES at `merge_by_keys`,
  * precomputed by RulesEngine column-side over the typed record (paths are
  * plan-time literals there) so grouping needs no reduce- or map-side JSON
  * parse; null = not precomputed, groupKey falls back to one Jackson parse.
  *
  * CHECKPOINT COMPATIBILITY: mergeStream stores state as
  * `MergeBuffer` through the product (UnsafeRow) encoder — changing this
  * class's fields invalidates existing streaming checkpoints. Bump
  * [[AlertMerger.StateFormatVersion]] on any field change so
  * [[AlertMerger.versionedCheckpoint]] cold-starts in a fresh directory
  * instead of deserializing the old layout as garbage. */
final case class MergeInputAlert(
    alert_id: String,
    rule_name: String,
    created: Timestamp,
    record_json: String,
    merge_by_keys: String,  // comma-joined key paths ('' = merging disabled)
    merge_window_mins: Int,
    outputs: Seq[String],
    staged: Boolean,
    merge_key_vals: String = null)

/** Per-group streaming merge state: the open window's alerts.
  *
  * A case class (not a bare List) so the state round-trips through the
  * PRODUCT encoder — codegen'd UnsafeRow layout instead of
  * `Encoders.kryo`'s reflective object-graph walk. The state store
  * serializes the whole buffer on every update, so encoder cost is the
  * stateful path's per-record constant; the row encoder writes
  * string/long fields flat (measured ~1.1-1.15× stream throughput vs
  * kryo, SCALE.md). */
final case class MergeBuffer(alerts: List[MergeInputAlert])

/** The merged alert emitted per group window
  * (merged record fields: shared/alert.py:399-417). */
final case class MergedAlert(
    rule_name: String,
    merge_keys: String,      // joined merge-key VALUES identifying the group
    alert_count: Long,       // AlertCount
    alert_time_first: Timestamp, // AlertTimeFirst
    alert_time_last: Timestamp,  // AlertTimeLast
    merged_by_json: String,      // MergedBy {key -> value}
    other_common_keys_json: String, // OtherCommonKeys (greatest common sub-dict)
    value_diffs_json: String,    // ValueDiffs {created -> diff vs common}
    outputs: Seq[String],        // most recent alert's outputs (alert.py:419)
    staged: Boolean)             // any(staged)

/** Alert merge grouping + aggregation (SURVEY §2.4 A2-A4).
  *
  * Window semantics (alert_merger/main.py:106-132 + shared/alert.py:246-269):
  * alerts group by (rule_name, values at merge_by_keys); a window is ANCHORED
  * at the group's oldest alert and spans merge_window_mins; ≤50 alerts per
  * merged group (alert_merger/main.py:34). NOT expressible as built-in
  * `window()`/`session_window` (anchor + cap), hence:
  *   - streaming: `flatMapGroupsWithState` with processing-time timeout —
  *     the state store IS the reference's DynamoDB alert table (A4)
  *   - batch: `flatMapGroups` with the same core window-assignment code
  *
  * Scale: the ONLY shuffle in the whole alert pipeline is this groupBy on
  * (rule, merge-key values) — cardinality = number of alerting entities, not
  * stream size. State per group is bounded (≤50 alerts before forced flush).
  */
object AlertMerger {

  /** Adapt the RulesEngine output DataFrame to the merger input. */
  def fromAlerts(alerts: DataFrame): Dataset[MergeInputAlert] = {
    implicit val enc = Encoders.product[MergeInputAlert]
    val keyVals =
      if (alerts.columns.contains("merge_key_vals")) col("merge_key_vals")
      else lit(null).cast("string")
    // record arrives as the typed struct (single-type evaluate output) or
    // as its JSON text (Pipeline.alertsFor serializes at the cross-type
    // union boundary) — both land as record_json here
    val recordJson = alerts.schema("record").dataType match {
      case org.apache.spark.sql.types.StringType => col("record")
      case _ => to_json(col("record"))
    }
    alerts.select(
      col("alert_id"), col("rule_name"), col("created"),
      recordJson.as("record_json"),
      col("merge_by_keys"), col("merge_window_mins"), col("outputs"),
      coalesce(col("staged"), lit(false)).as("staged"),
      keyVals.as("merge_key_vals"))
      .as[MergeInputAlert]
  }

  private def groupKey(a: MergeInputAlert): String = {
    val keyVals =
      if (a.merge_key_vals != null) a.merge_key_vals
      else {
        val rec = MergeRecord.parse(a.record_json)
        a.merge_by_keys.split(',').filter(_.nonEmpty)
          .map(k => MergeRecord.valueAtPath(rec, k)).mkString("|")
      }
    s"${a.rule_name}|$keyVals"
  }

  /** Split a chronologically sorted group into anchored windows with the
    * 50-alert cap applied inside each window. */
  def assignWindows(sorted: Seq[MergeInputAlert]): Seq[Seq[MergeInputAlert]] = {
    val out = Seq.newBuilder[Seq[MergeInputAlert]]
    var remaining = sorted
    while (remaining.nonEmpty) {
      val anchor = remaining.head
      val windowEnd = anchor.created.getTime + anchor.merge_window_mins * 60000L
      val (in, rest) = remaining.span(_.created.getTime <= windowEnd)
      in.grouped(50).foreach(out += _) // merge cap (alert_merger/main.py:34)
      remaining = rest
    }
    out.result()
  }

  /** The merge algorithm (shared/alert.py:382-433) over one window. */
  def mergeWindow(group: Seq[MergeInputAlert]): MergedAlert = {
    val sorted = group.sortBy(a => (a.created.getTime, a.alert_id))
    val mergeKeys = sorted.head.merge_by_keys.split(',').filter(_.nonEmpty).toSeq
    val parsed = sorted.map(a => MergeRecord.parse(a.record_json))
    val cleaned = parsed.map(MergeRecord.cleanRecord(_, mergeKeys.toSet))
    val common = MergeRecord.computeCommon(cleaned)
    val mergedBy = {
      val node = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.objectNode()
      mergeKeys.foreach(k => node.put(k, MergeRecord.valueAtPath(parsed.head, k)))
      MergeRecord.write(node)
    }
    val diffs = {
      val node = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.objectNode()
      sorted.zip(cleaned).foreach { case (a, rec) =>
        node.set[com.fasterxml.jackson.databind.JsonNode](
          a.created.toInstant.toString, MergeRecord.computeDiff(common, rec))
      }
      MergeRecord.write(node)
    }
    MergedAlert(
      rule_name = sorted.head.rule_name,
      merge_keys = Option(sorted.head.merge_key_vals).getOrElse(
        mergeKeys.map(k => MergeRecord.valueAtPath(parsed.head, k)).mkString("|")),
      alert_count = sorted.size.toLong,
      alert_time_first = sorted.head.created,
      alert_time_last = sorted.last.created,
      merged_by_json = mergedBy,
      other_common_keys_json = MergeRecord.write(common),
      value_diffs_json = diffs,
      outputs = sorted.last.outputs,
      staged = sorted.exists(_.staged))
  }

  /** Batch merge: same grouping + window assignment, no state. Alerts with
    * merging disabled pass through as singleton groups (the merger
    * "dispatches unmerged alerts immediately", alert_merger/main.py:106-120). */
  def mergeBatch(alerts: Dataset[MergeInputAlert]): Dataset[MergedAlert] = {
    implicit val enc = Encoders.product[MergedAlert]
    implicit val strEnc = Encoders.STRING
    val mergeable = alerts.filter((a: MergeInputAlert) =>
      a.merge_by_keys.nonEmpty && a.merge_window_mins > 0)
    val passthrough = alerts.filter((a: MergeInputAlert) =>
      a.merge_by_keys.isEmpty || a.merge_window_mins <= 0)
      .map(a => mergeWindow(Seq(a)))
    val merged = mergeable
      .groupByKey(groupKey _)
      .flatMapGroups { (_, it) =>
        val sorted = it.toSeq.sortBy(a => (a.created.getTime, a.alert_id))
        assignWindows(sorted).map(mergeWindow).iterator
      }
    merged.union(passthrough)
  }

  /** Streaming merge: state per (rule, merge-key values); a window flushes
    * when the watermark passes its anchored end (event-time timeout), when 50
    * alerts accumulate, or when an arriving alert falls outside it.
    *
    * Alerts whose rules have merging disabled NEVER touch the state store —
    * they map straight to singleton merged records, mirroring the reference
    * merger "dispatching unmerged alerts immediately" without a Dynamo
    * round-trip (alert_merger/main.py:106-120). This matters for scale: in
    * most rulesets the bulk of alerts don't merge, and keying them all by
    * the degenerate `rule|` key would funnel the whole stream through one
    * state-store group per rule (a skew ceiling no executor count fixes).
    *
    * Event-time (watermark on `created`) rather than the reference's wall
    * clock: same observable grouping, but deterministic under replay and
    * testable without waiting out real minutes — the SURVEY §2.6 "optional
    * upgrade" taken as the default. `withWatermark` must be applied by the
    * caller via `watermarkDelay`. */
  /** Bump on ANY merge-state layout change (MergeInputAlert / MergeBuffer
    * fields, the kryo→product encoder switch, new per-key state). Consumed
    * by [[versionedCheckpoint]]. */
  val StateFormatVersion = 2

  /** Version-scoped checkpoint location for the merge operators: an
    * incompatible state-format upgrade lands in a FRESH directory (a clean
    * cold start) instead of deserializing an old checkpoint's bytes into
    * the new layout as garbage. Use for every mergeStream/mergeStreamTws
    * query; graft.streaming.Pipeline.start wires it in. */
  def versionedCheckpoint(root: String): String =
    s"$root/merge-state-v$StateFormatVersion"

  /** Refuse to silently abandon an existing checkpoint. A checkpoint holds
    * more than merge state — its OFFSET LOG is the stream's position, so
    * relocating to a fresh versioned directory replays from initial offsets
    * (duplicate alerts) or jumps to latest (missed alerts). That trade must
    * be an operator DECISION, not a side effect of an upgrade: when a
    * legacy checkpoint (an `offsets/` dir at the unversioned root or at a
    * lower merge-state version) exists and the current versioned directory
    * has none, this throws with migration instructions instead of starting.
    * Once the current versioned directory has its own offset log the legacy
    * dirs are ignored (the migration already happened). Dispatch is
    * idempotent on alert_id (the attempt ledger dedupes redelivery,
    * [[Outputs.fanOut]]), which bounds the duplicate window for operators
    * who choose the cold start. */
  def guardLegacyCheckpoint(root: String,
      hadoopConf: org.apache.hadoop.conf.Configuration): Unit = {
    import org.apache.hadoop.fs.Path
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hadoopConf)
    def hasOffsets(p: Path): Boolean = fs.exists(new Path(p, "offsets"))
    if (!hasOffsets(new Path(versionedCheckpoint(root)))) {
      val legacy = (Option(root).filter(_ => hasOffsets(rootPath)).toSeq ++
        (1 until StateFormatVersion).map(v => s"$root/merge-state-v$v")
          .filter(p => hasOffsets(new Path(p))))
      if (legacy.nonEmpty)
        throw new IllegalStateException(
          s"legacy streaming checkpoint found at ${legacy.mkString(", ")} but the " +
            s"current state format v$StateFormatVersion would start fresh at " +
            s"${versionedCheckpoint(root)} — a silent cold start abandons the " +
            "offset log and opens a duplicate/missed-delivery window. Either " +
            "keep running the engine version that wrote the legacy checkpoint, " +
            "or delete/move the legacy directory to accept the cold start " +
            "deliberately (outputs are idempotent on alert_id, so duplicates " +
            "dedupe at dispatch).")
    }
  }

  def mergeStream(alerts: Dataset[MergeInputAlert],
      watermarkDelay: String = "0 seconds"): Dataset[MergedAlert] = {
    implicit val enc = Encoders.product[MergedAlert]
    implicit val bufEnc = Encoders.product[MergeBuffer]
    implicit val strEnc = Encoders.STRING

    val passthrough = alerts
      .filter((a: MergeInputAlert) => a.merge_by_keys.isEmpty || a.merge_window_mins <= 0)
      .map(a => mergeWindow(Seq(a)))
    val merged = alerts
      .filter((a: MergeInputAlert) => a.merge_by_keys.nonEmpty && a.merge_window_mins > 0)
      .withWatermark("created", watermarkDelay)
      .groupByKey(groupKey _)
      .flatMapGroupsWithState[MergeBuffer, MergedAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, incoming: Iterator[MergeInputAlert], state: GroupState[MergeBuffer]) =>
          val buffered = state.getOption.map(_.alerts).getOrElse(Nil)
          val wm = state.getCurrentWatermarkMs()
          val all = (buffered ++ incoming).sortBy(a => (a.created.getTime, a.alert_id))
          if (all.isEmpty) { state.remove(); Iterator.empty }
          else {
            val (closed, open) = splitClosed(all, wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(MergeBuffer(open.toList))
              // fire when the watermark passes the open window's end
              state.setTimeoutTimestamp(math.max(windowEndMs(open), wm + 1))
            }
            closed.map(mergeWindow).iterator
          }
      }
    merged.union(passthrough)
  }

  /** The merge window-close decision shared by both streaming engines:
    * every window before the last is closed (a later anchor proves it
    * ended), and the last closes on the 50-cap or once the watermark
    * passes its anchored end. */
  private def splitClosed(all: Seq[MergeInputAlert], wm: Long)
      : (Seq[Seq[MergeInputAlert]], Seq[MergeInputAlert]) = {
    val windows = assignWindows(all)
    val last = windows.last
    def windowEnd(w: Seq[MergeInputAlert]): Long =
      w.head.created.getTime + w.head.merge_window_mins * 60000L
    if (last.size >= 50 || windowEnd(last) <= wm) (windows, Nil)
    else (windows.dropRight(1), last)
  }

  private def windowEndMs(w: Seq[MergeInputAlert]): Long =
    w.head.created.getTime + w.head.merge_window_mins * 60000L

  /** [[mergeStream]]'s state logic on the arbitrary-state v2 API
    * (`transformWithState`, Spark 4.x): the open window lives in a
    * [[ListState]], so the steady-state path — alerts arriving into a
    * still-open window — is an RocksDB APPEND per alert instead of
    * [[GroupState]]'s read-rewrite of the whole buffer, and flush-on-time
    * runs through a real event-time timer instead of a timeout timestamp
    * re-armed on every update. Requires the RocksDB state store provider
    * (the v2 API does not support the HDFS-backed store). Same observable
    * semantics as [[mergeStream]]; the batch Dataset path and the a2/a3
    * oracle queries pin the window algebra itself. */
  final class MergeProcessor
      extends StatefulProcessor[String, MergeInputAlert, MergedAlert] {
    @transient private var buf: ListState[MergeInputAlert] = _
    @transient private var armedTimer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState("open_window",
        Encoders.product[MergeInputAlert], TTLConfig.NONE)
      // the one armed timer per key: timers accumulate in RocksDB unless
      // the previous registration is deleted before re-arming (re-arming
      // every batch would otherwise grow state unboundedly for long-lived
      // groups and fire extra no-op flush passes)
      armedTimer = getHandle.getValueState("armed_timer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def disarm(): Unit =
      if (armedTimer.exists()) {
        getHandle.deleteTimer(armedTimer.get()) // no-op if it already fired
        armedTimer.clear()
      }

    private def arm(ts: Long): Unit = {
      val prev = if (armedTimer.exists()) armedTimer.get() else Long.MinValue
      if (prev != ts) {
        if (prev != Long.MinValue) getHandle.deleteTimer(prev)
        getHandle.registerTimer(ts)
        armedTimer.update(ts)
      }
    }

    private def flush(incoming: List[MergeInputAlert], wm: Long)
        : Iterator[MergedAlert] = {
      val buffered = if (buf.exists()) buf.get().toList else Nil
      val all = (buffered ++ incoming)
        .sortBy(a => (a.created.getTime, a.alert_id))
      if (all.isEmpty) { buf.clear(); disarm(); return Iterator.empty }
      val (closed, open) = splitClosed(all, wm)
      if (open.isEmpty) { buf.clear(); disarm() }
      else {
        // the appending win: nothing closed means open == buffered ++
        // incoming (order is re-imposed on read), so the state write is a
        // pure append — or NO write at all for a timer that fired early
        // (empty incoming; ListState rejects empty appends) — and only an
        // actual window close rewrites the list
        if (closed.isEmpty && buffered.nonEmpty) {
          if (incoming.nonEmpty) buf.appendList(incoming.toArray)
        } else buf.put(open.toArray)
        arm(math.max(windowEndMs(open), wm + 1))
      }
      closed.map(mergeWindow).iterator
    }

    override def handleInputRows(key: String, rows: Iterator[MergeInputAlert],
        timerValues: TimerValues): Iterator[MergedAlert] =
      flush(rows.toList, timerValues.getCurrentWatermarkInMs())

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[MergedAlert] =
      flush(Nil, timerValues.getCurrentWatermarkInMs())
  }

  /** Streaming merge on `transformWithState` — see [[MergeProcessor]].
    * Drop-in alternative to [[mergeStream]] for RocksDB deployments. */
  def mergeStreamTws(alerts: Dataset[MergeInputAlert],
      watermarkDelay: String = "0 seconds"): Dataset[MergedAlert] = {
    implicit val enc = Encoders.product[MergedAlert]
    implicit val strEnc = Encoders.STRING

    val passthrough = alerts
      .filter((a: MergeInputAlert) => a.merge_by_keys.isEmpty || a.merge_window_mins <= 0)
      .map(a => mergeWindow(Seq(a)))
    val merged = alerts
      .filter((a: MergeInputAlert) => a.merge_by_keys.nonEmpty && a.merge_window_mins > 0)
      .withWatermark("created", watermarkDelay)
      .groupByKey(groupKey _)
      .transformWithState(new MergeProcessor, TimeMode.EventTime(), OutputMode.Append())
    merged.union(passthrough)
  }
}
