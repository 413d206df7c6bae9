package graft

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure receipt harness (r16 verdict ask #3): run named
  * queries under a DELIBERATELY constrained executor-memory budget
  * (`SPARK_DRIVER_MEM` caps the forked JVM heap; optional
  * `SPARK_GRAFT_MEM_FRACTION` squeezes `spark.memory.fraction` further)
  * and report the task-metric totals that prove how the plan degraded:
  * a scale-safe plan SPILLS (memory/disk spill bytes > 0, wall time
  * grows bounded) — it does not OOM. One JSON line per query:
  *
  *   {"query":..,"sec":..,"rows":..,"mem_spill_mb":..,"disk_spill_mb":..,
  *    "peak_exec_mem_mb":..,"shuffle_write_mb":..}
  *
  * Each query runs once untimed (JIT/codegen warm-up, metrics
  * discarded) and once measured — the BenchOne cold/warm discipline.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_MEM_FRACTION=0.2]
  *        SPARK_DRIVER_MEM=2g sbt "runMain graft.SpillProbe d14_... ..."
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // the at-scale mitigation for per-task memory pressure is MORE
    // partitions (smaller per-task working sets), not a bigger heap —
    // SPARK_GRAFT_SHUFFLE_PARTS decouples partition count from cpus so
    // the receipt can prove that axis
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val builder = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
    sys.env.get("SPARK_GRAFT_MEM_FRACTION")
      .foreach(f => builder.config("spark.memory.fraction", f))
    // broadcast builds ERROR (not spill) when the build side outgrows the
    // memory budget — on a tight heap the operator's real-world move is a
    // lower broadcast threshold (-1 = all joins shuffle, and shuffles spill)
    sys.env.get("SPARK_GRAFT_BROADCAST_THRESHOLD")
      .foreach(t => builder.config("spark.sql.autoBroadcastJoinThreshold", t))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new LongAdder
    val diskSpill = new LongAdder
    val shuffleWrite = new LongAdder
    @volatile var peakExec = 0L
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          memSpill.add(m.memoryBytesSpilled)
          diskSpill.add(m.diskBytesSpilled)
          shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      // per-TASK peak (stage-level taskMetrics.peakExecutionMemory is the
      // SUM across the stage's tasks, which overstated this field pre-r18)
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) peakExec = math.max(peakExec, m.peakExecutionMemory)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val heap = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    System.err.println(s"[spillprobe] heap=${heap}MB sf=$sfDir cpus=$cpus " +
      s"memFraction=${sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "default")}")

    def mb(l: Long): String =
      String.format(java.util.Locale.ROOT, "%.1f", l / 1048576.0)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      fn(spark, sfDir).count() // warm-up, metrics discarded below
      spark.catalog.clearCache()
      memSpill.reset(); diskSpill.reset(); shuffleWrite.reset(); peakExec = 0L
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async and the bus drain API is private —
      // a fixed settle window is enough for a receipt harness
      Thread.sleep(1000)
      println(s"""{"query":"$name","sec":${String.format(
          java.util.Locale.ROOT, "%.2f", sec)},"rows":$rows,""" +
        s""""mem_spill_mb":${mb(memSpill.sum)},""" +
        s""""disk_spill_mb":${mb(diskSpill.sum)},""" +
        s""""peak_exec_mem_mb":${mb(peakExec)},""" +
        s""""shuffle_write_mb":${mb(shuffleWrite.sum)},"heap_mb":$heap}""")
    }
    spark.stop()
  }
}
