package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev profiling tool (guide §1): run named queries once and attribute
  * wall time to individual Spark jobs (with call sites) vs driver-side
  * gaps (metadata IO, planning, commit protocol). The fixture-style
  * queries spend most of their wall in many small jobs — this shows
  * which statement owns the time without the (disabled) UI.
  *
  * Usage: tools/run_java.sh graft.tools.JobProfile <sfDir> <q1>[,<q2>...]
  */
object JobProfile {
  private final case class JobRec(id: Int, start: Long, var end: Long = -1L,
                                  desc: String = "", site: String = "",
                                  var tasks: Int = 0, var taskTimeMs: Long = 0L,
                                  var shuffleReadB: Long = 0L, var shuffleWriteB: Long = 0L,
                                  var inputB: Long = 0L, var outputB: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("q122_mview_wide_decimal_avg")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up (same as Bench)
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    spark.range(1000).selectExpr("id % 7 AS k", "id AS v").groupBy("k").sum("v").collect()

    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.Map.empty[Int, Int]
    // SQL-execution attribution: executionId -> first line of the SQL
    // plan description, so each job maps back to the fixture statement
    // that ran it
    val sqlDesc = mutable.Map.empty[Long, String]
    val planSmells = mutable.ArrayBuffer.empty[(String, Seq[(String, Int)])]
    val listener = new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          jobs.synchronized {
            sqlDesc(s.executionId) =
              s.description.linesIterator.nextOption().getOrElse("").take(120)
            // GRAFT_DUMP_PLANS=<dir>: write every internal statement's
            // physical plan for before/after plan-diff artifacts
            sys.env.get("GRAFT_DUMP_PLANS").foreach { dir =>
              java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
              java.nio.file.Files.writeString(
                java.nio.file.Paths.get(dir, f"exec${s.executionId}%04d.txt"),
                s"-- ${sqlDesc(s.executionId)}\n${s.physicalPlanDescription}\n")
            }
            // flag plan smells in INTERNAL statements (the final query's
            // explain is audited separately; fixture-internal writes /
            // refreshes are only visible here)
            val plan = s.physicalPlanDescription
            val smells = Seq("SortMergeJoin", "SortAggregate",
              "CartesianProduct", "BroadcastNestedLoopJoin")
              .map(k => k -> plan.sliding(k.length).count(_ == k))
              .filter(_._2 > 0)
            if (smells.nonEmpty)
              planSmells += ((sqlDesc(s.executionId), smells))
          }
        case _ => ()
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val execId = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
        val desc = execId.flatMap(id => sqlDesc.get(id.toLong))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))))
          .getOrElse("")
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, e.time, desc = desc, site = site)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        for (jid <- stageToJob.get(e.stageId); j <- jobs.get(jid);
             m <- Option(e.taskMetrics)) {
          j.tasks += 1
          j.taskTimeMs += m.executorRunTime
          j.shuffleReadB += m.shuffleReadMetrics.totalBytesRead
          j.shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
          j.inputB += m.inputMetrics.bytesRead
          j.outputB += m.outputMetrics.bytesWritten
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // Poor-man's driver profiler: sample the query thread's stack every
    // 20 ms, histogram the deepest graft/spark frame — attributes the
    // driver-side gap (planning, footer IO, metadata, MV analysis)
    // without a UI or external profiler.
    val sampleCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val mainThread = Thread.currentThread()
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          val key =
            if (st.exists(f => f.getMethodName == "runJob" ||
                f.getMethodName == "awaitResult")) "JOB_WAIT"
            else {
              val g = st.find(f => f.getClassName.startsWith("graft.") &&
                !f.getClassName.contains("JobProfile"))
              val s = st.find(f => f.getClassName.startsWith("org.apache.spark"))
              val gk = g.map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
              val sk = s.map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
              (gk, sk) match {
                case (Some(a), Some(b)) => s"$b <- $a"
                case (Some(a), None) => a
                case (None, Some(b)) => b
                case _ => st.headOption.map(_.getMethodName).getOrElse("?")
              }
            }
          sampleCounts.merge(key, 1, (a, b) => a + b)
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case None => println(s"$n: UNKNOWN")
        case Some(fn) =>
          jobs.synchronized { jobs.clear(); stageToJob.clear(); planSmells.clear() }
          sampleCounts.clear()
          sampling = true
          val t0 = System.nanoTime()
          val rows = fn(spark, sfDir).count()
          sampling = false
          Thread.sleep(300) // let the listener bus drain
          val wallS = (System.nanoTime() - t0) / 1e9
          val snap = jobs.synchronized { jobs.values.toVector }
          val jobSumS = snap.filter(_.end > 0).map(j => (j.end - j.start) / 1e3).sum
          println(f"==== $n rows=$rows wall=$wallS%.2fs jobs=${snap.size} jobSum=$jobSumS%.2fs driverGap=${wallS - jobSumS}%.2fs ====")
          def mb(b: Long) = f"${b / 1e6}%.1f"
          snap.sortBy(j => -(j.end - j.start)).take(40).foreach { j =>
            val w = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
            println(f"  job${j.id}%-5d ${w}%7.3fs tasks=${j.tasks}%-4d taskTime=${j.taskTimeMs / 1e3}%7.2fs in=${mb(j.inputB)}MB shR=${mb(j.shuffleReadB)}MB shW=${mb(j.shuffleWriteB)}MB out=${mb(j.outputB)}MB  ${j.site.take(80)} ${j.desc.take(60)}")
          }
          import scala.jdk.CollectionConverters._
          val samples = sampleCounts.asScala.toSeq.sortBy(-_._2)
          val tot = samples.map(_._2.toInt).sum.max(1)
          println(s"  -- driver samples (20ms each, $tot total) --")
          samples.take(25).foreach { case (k, c) =>
            println(f"  ${100.0 * c / tot}%5.1f%% $k")
          }
          val smellSnap = jobs.synchronized { planSmells.toVector }
          if (smellSnap.nonEmpty) {
            println(s"  -- internal-statement plan smells (${smellSnap.size}) --")
            smellSnap.foreach { case (desc, ss) =>
              println(s"  ${ss.map { case (k, c) => s"$k x$c" }.mkString(", ")}  <<$desc>>")
            }
          }
      }
    }
    spark.stop()
  }
}
