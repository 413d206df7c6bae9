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

  override def commit(end: Offset): Unit = () // offset log is the checkpoint
  override def stop(): Unit = ()
}

final case class AppPollerPartition(app: String, from: Long, until: Long)
    extends InputPartition
