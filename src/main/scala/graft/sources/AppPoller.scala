package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** S4: app-poller source (streamalert/apps/: 9 SaaS connector Lambdas,
  * e.g. apps/app_base.py gather/_gather_logs + the per-app `_sleep_seconds`
  * /`_last_timestamp` cursor bookkeeping).
  *
  * The reference polls a SaaS HTTP API on a timer: each invocation resumes
  * from the persisted `last_timestamp` cursor, fetches what's new, and
  * ships it to the classifier. The Spark-native shape is a DataSourceV2
  * MicroBatchStream whose Offset IS that cursor: Structured Streaming's
  * offset log replaces the reference's parameter-store checkpoint, each
  * trigger polls `[start, latest)`, and replay after failure is exact
  * because batches are planned by offset range, not wall clock.
  *
  * The HTTP layer is pluggable (this container has no egress): a poll
  * function keyed by the `app` option serves records from an in-process
  * registry the tests feed. A production connector plugs the real API call
  * into [[AppPollerRegistry.register]] — pagination, auth, and rate-limit
  * sleeps live behind that function exactly as they live behind
  * `_gather_logs` in the reference. The cursor-range contract is unchanged.
  *
  * Scale shape: one poll cursor per app (the reference runs one Lambda per
  * app) — each micro-batch's records split into `partitions` parallel
  * reader splits, so a burst of backlog fans out across executors while the
  * cursor advance stays a single atomic offset commit.
  */
object AppPollerRegistry {
  /** A poller: `latest()` = current cursor high-water mark;
    * `fetch(from, until)` = records in that half-open cursor range. */
  trait Poller extends Serializable {
    def latest(): Long
    def fetch(from: Long, until: Long): Iterator[String]
  }

  /** Pollers that buffer records driver-side (opaque-cursor adapters) and
    * can release everything below a committed offset. */
  trait Prunable { def prune(below: Long): Unit }

  private val pollers = new java.util.concurrent.ConcurrentHashMap[String, Poller]()

  def register(app: String, p: Poller): Unit = pollers.put(app, p)

  def apply(app: String): Poller = {
    val p = pollers.get(app)
    require(p != null, s"no poller registered for app '$app'")
    p
  }

  /** An in-memory append buffer poller — the unit-test / demo "SaaS API". */
  final class BufferPoller extends Poller {
    private val buf = new java.util.concurrent.CopyOnWriteArrayList[String]()
    def append(records: String*): Unit = records.foreach(buf.add)
    def latest(): Long = buf.size().toLong
    def fetch(from: Long, until: Long): Iterator[String] =
      (from until until).iterator.map(i => buf.get(i.toInt))
  }
}

/** One CONCRETE connector's pagination/cursor semantics demonstrated
  * against the generic poller contract: Duo's timestamp cursor + page loop
  * (apps/_apps/duo.py).
  *
  * The reference requests `mintime = last_timestamp + 1` (duo.py:131),
  * advances the cursor to the LAST event's timestamp after every page
  * (duo.py:156 — mid-backlog advance, so a crash between pages resumes
  * from the last full page, not the batch start), and keeps polling while
  * a page comes back full (`_more_to_poll`, duo.py:161-163). Here the
  * cursor is the [[AppPollerRegistry.Poller]] offset: `latest()` is the
  * API's newest visible timestamp (half-open bound), and `fetch(from,
  * until)` runs the same page loop bounded to that range, so Structured
  * Streaming's offset log replays any range bit-for-bit.
  *
  * Faithfully reproduced quirk: because the next page starts at
  * `last_ts + 1`, events sharing the last page-item's timestamp but cut
  * off by the page cap are SKIPPED, exactly as in the reference
  * (duo.py:131 + :156) — pinned by a spec so the behavior is a documented
  * decision, not an accident.
  */
object DuoStylePoller {

  /** The SaaS HTTP surface behind `_get_duo_logs` (duo.py:96-164): one
    * signed GET returning up to `pageSize` logs with `timestamp >=
    * mintime`, ordered by timestamp (Duo returns them sequentially). */
  trait PageApi extends Serializable {
    def pageSize: Int
    def fetchPage(mintime: Long): Seq[(Long, String)]
    def maxTimestamp(): Long
  }

  /** In-memory PageApi with a page-request counter for rate-limit specs. */
  final class InMemoryDuoApi(val pageSize: Int) extends PageApi {
    import scala.jdk.CollectionConverters._
    private val events = new java.util.concurrent.CopyOnWriteArrayList[(Long, String)]()
    val pageCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    def append(ts: Long, rec: String): Unit = events.add((ts, rec))
    def fetchPage(mintime: Long): Seq[(Long, String)] = {
      pageCalls.incrementAndGet()
      events.asScala.toSeq.filter(_._1 >= mintime).sortBy(_._1).take(pageSize)
    }
    def maxTimestamp(): Long =
      if (events.isEmpty) -1L else events.asScala.map(_._1).max
  }

  /** Duo's inter-page rate-limit schedule (duo.py:189-198): 2 requests per
    * minute allowed, so every second poll sleeps 60 s. Exposed as a pure
    * function — in the Spark shape the micro-batch trigger interval
    * replaces the Lambda's in-process sleep. */
  def sleepSeconds(pollCount: Int): Int = math.abs((pollCount % 2) - 1) * 60
}

final class DuoStylePoller(api: DuoStylePoller.PageApi)
    extends AppPollerRegistry.Poller {
  /** Half-open high-water mark: one past the newest visible timestamp. */
  def latest(): Long = api.maxTimestamp() + 1

  def fetch(from: Long, until: Long): Iterator[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var mintime = from
    var more = true
    while (more) {
      val raw = api.fetchPage(mintime)
      if (raw.isEmpty) more = false
      else {
        val kept = raw.filter(_._1 < until) // later events belong to later batches
        out ++= kept.map(_._2)
        if (raw.size < api.pageSize || kept.size < raw.size) more = false
        else {
          // duo.py:156 + :131 — cursor = last event's ts, next mintime +1
          mintime = raw.last._1 + 1
          more = mintime < until
        }
      }
    }
    out.iterator
  }
}

/** Box-style poller: the SECOND cursor family among the reference's nine
  * connectors — a server-issued OPAQUE stream position (box.py:114-116,191)
  * instead of Duo's client-computed `last_ts + 1`. The first request keys
  * on `created_after` (the app's `_last_timestamp`); every subsequent page
  * resumes from the `next_stream_position` the server handed back, and
  * `more_to_poll` is simply `chunk_size >= limit` (box.py:184).
  *
  * Faithfully reproduced quirk: an EMPTY page does not advance the stored
  * stream position — box.py:186-189 returns before `_next_stream_position`
  * is assigned (:191), so the next poll re-asks from the same place.
  *
  * In the Spark shape the server's stream position IS the [[Offset]]
  * (Box positions are numeric), so `latest()` asks the API for its current
  * position and `fetch(from, until)` pages through `[from, until)` —
  * offset-range replay, the property the reference approximates with its
  * parameter-store checkpoint, comes free from the offset log. */
object BoxStylePoller {

  /** The `GET /events` surface (box.py:106-155): up to `chunkLimit`
    * entries from a stream position, plus the server's next position.
    *
    * CONTRACT — positions are DENSE and numeric: `fetchEvents(p)` returns
    * `next == p + entries.size`, and `currentPosition()` is the count-like
    * head. Box's real positions are opaque server tokens; mapping them
    * onto Spark offsets at all (latest(), `[from, until)` range replay,
    * partition splitting in `planInputPartitions`) REQUIRES this density,
    * so an adapter for a sparse/opaque-position API must renumber pages
    * densely itself. `fetch` counts the entries it owns off this same
    * contract. */
  trait EventsApi extends Serializable {
    def chunkLimit: Int
    /** (entries, nextStreamPosition) for one page from `position`;
      * `nextStreamPosition` must equal `position + entries.size`. */
    def fetchEvents(position: Long): (Seq[String], Long)
    /** The server's current head position (what a poll could reach now). */
    def currentPosition(): Long
  }

  /** In-memory EventsApi: the admin-event log as an append buffer, stream
    * position = index into it (numeric, monotonic — like Box's). */
  final class InMemoryBoxApi(val chunkLimit: Int) extends EventsApi {
    import scala.jdk.CollectionConverters._
    private val events = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val pageCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    def append(recs: String*): Unit = recs.foreach(events.add)
    def fetchEvents(position: Long): (Seq[String], Long) = {
      pageCalls.incrementAndGet()
      val all = events.asScala.toSeq
      val page = all.slice(position.toInt, position.toInt + chunkLimit)
      (page, position + page.size)
    }
    def currentPosition(): Long = events.size().toLong
  }
}

final class BoxStylePoller(api: BoxStylePoller.EventsApi)
    extends AppPollerRegistry.Poller {
  def latest(): Long = api.currentPosition()

  def fetch(from: Long, until: Long): Iterator[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var position = from
    var more = true
    while (more && position < until) {
      val (entries, next) = api.fetchEvents(position)
      if (entries.isEmpty) more = false // box.py:186-189 — cursor NOT advanced
      else {
        // entries past `until` belong to later micro-batches: take only
        // what this offset range owns and stop at the boundary (dense-
        // position contract, see EventsApi; Long math so a huge backlog
        // range cannot truncate to a negative Int)
        val owned = entries.take(
          math.min(entries.size.toLong, until - position).toInt)
        out ++= owned
        if (owned.size < entries.size) more = false
        else {
          position = next // box.py:191 — the server's cursor, not ts math
          more = entries.size >= api.chunkLimit // box.py:184
        }
      }
    }
    out.iterator
  }
}

/** Link-cursor poller: the THIRD cursor family among the reference's nine
  * connectors — an OPAQUE server-issued continuation token (GSuite's
  * `pageToken`/`nextPageToken` chain, gsuite.py:143-166; Intercom's
  * `pages.next` URL is the same shape) that cannot be compared, ordered,
  * or split.
  *
  * This is the dense-renumbering adapter the [[BoxStylePoller.EventsApi]]
  * contract calls for: token chains don't map onto Spark's numeric offset
  * ranges, so the adapter OWNS the numbering. `latest()` follows the token
  * chain — AT MOST `maxPagesPerPoll` pages per call, the per-invocation
  * bound every reference poller applies (`_MAX_EVENTS_LIMIT`-style page
  * caps) so a cold start against a deep pre-existing chain cannot drain
  * the whole backlog into driver memory in one trigger; the remainder is
  * picked up by subsequent triggers. Fetched pages land in a driver-side
  * buffer whose logical end `latest()` returns; `fetch` serves buffered
  * slices, so any planned `[from, until)` range replays bit-for-bit
  * regardless of the token chain that produced it. Once Structured
  * Streaming COMMITS an offset the records below it can never be
  * replanned — [[AppPollerStream.commit]] calls `prune`, so steady-state
  * buffer size is one trigger's backlog, not the stream's history (the
  * reference's equivalent is the per-invocation batch it ships to the
  * classifier before checkpointing `_last_timestamp`).
  */
object LinkCursorPoller {
  /** The `GET /logs?after=<token>` surface: one page of records plus the
    * next continuation token, or None when drained (GSuite omits
    * `nextPageToken` on the last page, gsuite.py:194). */
  trait LinkApi extends Serializable {
    /** (records, nextToken); `token` None = start from the beginning. */
    def fetchPage(token: Option[String]): (Seq[String], Option[String])
  }

  /** In-memory LinkApi: opaque tokens are deliberately NON-numeric and
    * non-monotonic (md5 of the position) so nothing can cheat by parsing
    * them. */
  final class InMemoryLinkApi(val pageSize: Int) extends LinkApi {
    import scala.jdk.CollectionConverters._
    private val events = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val pageCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    def append(recs: String*): Unit = recs.foreach(events.add)
    private def tok(pos: Int): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"tok:$pos".getBytes("UTF-8")).map("%02x".format(_)).mkString
    private def pos(token: Option[String]): Int = token match {
      case None => 0
      case Some(t) =>
        (0 to events.size()).find(p => tok(p) == t)
          .getOrElse(throw new IllegalArgumentException(s"bad token: $t"))
    }
    def fetchPage(token: Option[String]): (Seq[String], Option[String]) = {
      pageCalls.incrementAndGet()
      val p = pos(token)
      val all = events.asScala.toSeq
      val page = all.slice(p, p + pageSize)
      val next = p + page.size
      (page, if (next >= all.size) None else Some(tok(next)))
    }
  }
}

final class LinkCursorPoller(api: LinkCursorPoller.LinkApi,
    maxPagesPerPoll: Int = 100)
    extends AppPollerRegistry.Poller with AppPollerRegistry.Prunable {
  require(maxPagesPerPoll > 0, "maxPagesPerPoll must be positive")
  // buffer(i) holds the record at logical offset base + i; all access
  // synchronized — latest()/fetch run on the driver (planning + local
  // source), prune on the commit thread
  private val buffer = scala.collection.mutable.Buffer[String]()
  private var base = 0L
  private var lastToken: Option[String] = None
  // records already buffered from re-fetchable pages PAST lastToken: a
  // drained chain ends with no next token, so the next poll re-requests
  // the last token and must skip what it already shipped (the same
  // resume-and-dedupe an Okta connector does with its final `after` link)
  private var consumedAfterToken = 0

  def latest(): Long = synchronized {
    // follow the token chain as far as the server allows right now, bounded
    // to maxPagesPerPoll pages: a deep backlog arrives over several triggers
    // instead of one unbounded driver-side drain
    var more = true
    var pages = 0
    while (more && pages < maxPagesPerPoll) {
      val (page, next) = api.fetchPage(lastToken)
      pages += 1
      val fresh = page.drop(consumedAfterToken)
      buffer ++= fresh
      next match {
        case Some(_) =>
          lastToken = next; consumedAfterToken = 0; more = page.nonEmpty
        case None =>
          consumedAfterToken += fresh.size; more = false
      }
    }
    base + buffer.size
  }

  def fetch(from: Long, until: Long): Iterator[String] = synchronized {
    require(from >= base,
      s"offset $from below pruned base $base — committed data re-requested")
    buffer.slice((from - base).toInt, (until - base).toInt).toList.iterator
  }

  def prune(below: Long): Unit = synchronized {
    val drop = math.min(math.max(0L, below - base), buffer.size.toLong).toInt
    buffer.remove(0, drop)
    base += drop
  }

  /** Test/monitoring surface: records currently buffered driver-side. */
  def buffered: Int = synchronized(buffer.size)
}

/** `spark.readStream.format("graft-app-poller").option("app", name)`.
  * Options: `app` (required, registry key), `partitions` (reader splits
  * per micro-batch, default 4). */
class AppPollerSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-app-poller"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AppPollerSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AppPollerTable(properties.asScala.toMap)
}

object AppPollerSource {
  /** Raw payload + the cursor it arrived at — the classifier takes `value`
    * like every other source; `poll_seq` is the per-record resume point. */
  val schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("poll_seq", LongType, nullable = false)))
}

final class AppPollerTable(properties: Map[String, String])
    extends Table with SupportsRead {
  private val app = properties.getOrElse("app",
    throw new IllegalArgumentException("graft-app-poller requires option 'app'"))
  override def name(): String = s"graft-app-poller:$app"
  override def schema(): StructType = AppPollerSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = AppPollerSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new AppPollerStream(app,
            properties.get("partitions").map(_.toInt).getOrElse(4))
      }
    }
}

/** Offset = the poll cursor (reference `_last_timestamp`). */
final case class PollOffset(seq: Long) extends Offset {
  override def json(): String = s"""{"seq":$seq}"""
}

final class AppPollerStream(app: String, numPartitions: Int) extends MicroBatchStream {
  override def initialOffset(): Offset = PollOffset(0L)
  override def latestOffset(): Offset = PollOffset(AppPollerRegistry(app).latest())
  override def deserializeOffset(json: String): Offset =
    PollOffset(""""seq"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json")))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (lo, hi) = (start.asInstanceOf[PollOffset].seq, end.asInstanceOf[PollOffset].seq)
    if (hi <= lo) Array.empty
    else {
      // split the cursor range so a large backlog reads in parallel
      val step = math.max(1L, (hi - lo + numPartitions - 1) / numPartitions)
      (lo until hi by step)
        .map(s => AppPollerPartition(app, s, math.min(s + step, hi)): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // resolve on the DRIVER and ship the (Serializable) poller to executors
    // — readers must not depend on executor-side registry state
    val poller = AppPollerRegistry(app)
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[AppPollerPartition]
        new PartitionReader[InternalRow] {
          private val it = poller.fetch(p.from, p.until)
          private var seq = p.from - 1
          private var current: String = _
          override def next(): Boolean =
            if (it.hasNext) { current = it.next(); seq += 1; true } else false
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(current), seq)
          override def close(): Unit = ()
        }
      }
    }
  }

  override def commit(end: Offset): Unit =
    // the offset log is the checkpoint; pollers that buffer driver-side
    // (opaque-cursor adapters) may drop records below the committed
    // offset — they can never be replayed again
    AppPollerRegistry(app) match {
      case p: AppPollerRegistry.Prunable =>
        p.prune(end.asInstanceOf[PollOffset].seq)
      case _ => ()
    }
  override def stop(): Unit = ()
}

final case class AppPollerPartition(app: String, from: Long, until: Long)
    extends InputPartition
