package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev helper: attribute a query's wall time to (a) DataFrame
  * construction (Scala-side plan building, incl. any plan-time jobs),
  * (b) analysis+optimization+physical planning, and (c) execution —
  * plus job/stage/task counts and shuffle bytes for the warm run.
  * Guide §1 ("measure first"): a 1 s query at sf0.1 that spends 0.8 s
  * in (a)+(b) needs expression staging, not shuffle surgery.
  *
  * `runMain graft.ProfileOne q1_agg d14_similarity_join ...`
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        val site = j.stageInfos.lastOption.map(si =>
          s"${si.name} (${j.stageInfos.size} stages, " +
            s"${j.stageInfos.map(_.numTasks).sum} tasks)").getOrElse("?")
        jobStart.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(j.jobId)).foreach { case (t0, site) =>
          jobLog.add(((System.nanoTime() - t0) / 1e9, site))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        shuffleRead += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    args.foreach { name =>
      def one(): (Double, Double, Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        val n = df.count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9, n)
      }
      one() // cold: JIT + codegen, discarded
      // listener events are delivered asynchronously: give the bus time to
      // drain cold-run stragglers before resetting, and again before
      // reading, so counters cover exactly the measured run (r19 advice;
      // the bus-drain API is private[spark], a settle pause is the honest
      // public-API equivalent at these event volumes)
      Thread.sleep(300)
      jobs = 0; stages = 0; tasks = 0; shuffleRead = 0; shuffleWrite = 0
      jobLog.clear()
      val (c1, p1, e1, _) = one()
      Thread.sleep(300)
      if (sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")) {
        import scala.jdk.CollectionConverters._
        jobLog.asScala.toSeq.sortBy(-_._1).take(20).foreach { case (d, site) =>
          println(f"[profile-job] $name $d%6.2f s  $site")
        }
      }
      val (j1, s1, t1, sr, sw) = (jobs, stages, tasks, shuffleRead, shuffleWrite)
      val (c2, p2, e2, n) = one()
      println(f"[profile] $name%-32s construct ${(c1 + c2) / 2}%6.2f s  " +
        f"plan ${(p1 + p2) / 2}%6.2f s  exec ${(e1 + e2) / 2}%6.2f s  " +
        f"jobs $j1%3d stages $s1%3d tasks $t1%5d " +
        f"shufR ${sr / 1024}%8d KiB shufW ${sw / 1024}%8d KiB rows $n%d")
    }
    spark.stop()
  }
}
