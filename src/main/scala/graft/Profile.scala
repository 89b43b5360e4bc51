package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (guide §1/§7): per-query cost breakdown the bench's single
  * wall number cannot give — where a query's seconds actually go.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.Profile q_ann_ivfpq q_hybrid_search"
  *
  * For each named query it reports, over one warm-up + one timed run:
  *  - CONSTRUCTION seconds: DataFrame-building time — all EAGER driver
  *    work (Lloyd collects, pushTerms/flag collects, pre-flight
  *    estimates) that runs before any action on the result;
  *  - ACTION seconds: the noop write itself;
  *  - the per-JOB timeline (start offset, duration, gap since previous
  *    job's end) — the gaps are pure driver time: planning, collect
  *    result handling, literal building. Large gaps = driver-bound,
  *    large job times = executor-bound;
  *  - per-job task-time sum and max single task (skew at a glance).
  *
  * Timed run only (the warm-up pays codegen/JIT, same rationale as the
  * bench's untimed warm pass). */
object Profile {
  private class JobLog extends SparkListener {
    case class Job(id: Int, desc: String, start: Long, var end: Long = 0L,
                   var taskTime: Long = 0L, var maxTask: Long = 0L,
                   var shuffleMB: Double = 0.0)
    val jobs = new scala.collection.mutable.ArrayBuffer[Job]
    private val byId = new scala.collection.mutable.HashMap[Int, Job]
    private val stageToJob = new scala.collection.mutable.HashMap[Int, Job]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val d = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      val j = Job(e.jobId, d, e.time)
      jobs += j; byId(e.jobId) = j
      e.stageIds.foreach(sid => stageToJob(sid) = j)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      byId.get(e.jobId).foreach(_.end = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = e.stageInfo.taskMetrics
        stageToJob.get(e.stageInfo.stageId).foreach { j =>
          if (m != null) {
            j.taskTime += m.executorRunTime
            j.shuffleMB += (m.shuffleReadMetrics.totalBytesRead +
              m.shuffleWriteMetrics.bytesWritten) / 1048576.0
          }
        }
      }
    def reset(): Unit = synchronized {
      jobs.clear(); byId.clear(); stageToJob.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shared session defaults incl. driver-overhead caps — GraftSession
    val spark = GraftSession.create(cpus)
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    val names =
      if (args.nonEmpty) args.toSeq else Seq("q_ann_ivfpq", "q_hybrid_search")
    names.foreach { n =>
      // warm-up: codegen/JIT, page cache
      try {
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      } catch { case e: Throwable => println(s"[profile] warmup $n: $e") }
      spark.catalog.clearCache()
      graft.operators.Caches.unpersistAll()
      System.gc()
      log.reset()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      spark.catalog.clearCache()
      graft.operators.Caches.unpersistAll()
      val cons = (t1 - t0) / 1e9
      val act = (t2 - t1) / 1e9
      println(f"\n===== $n: total ${cons + act}%.2f s  " +
        f"(construction $cons%.2f s, action $act%.2f s) =====")
      val js = log.jobs.toSeq.sortBy(_.start)
      val origin = if (js.nonEmpty) js.head.start else 0L
      var prevEnd = origin
      println(f"${"job"}%4s ${"t0_ms"}%7s ${"gap_ms"}%7s ${"dur_ms"}%7s " +
        f"${"task_ms"}%8s ${"shufMB"}%7s  desc")
      js.foreach { j =>
        val gap = j.start - prevEnd
        println(f"${j.id}%4d ${j.start - origin}%7d ${gap}%7d " +
          f"${j.end - j.start}%7d ${j.taskTime}%8d ${j.shuffleMB}%7.1f  " +
          j.desc.take(60))
        prevEnd = math.max(prevEnd, j.end)
      }
      val jobSum = js.map(j => j.end - j.start).sum / 1e3
      println(f"[profile] $n jobs=${js.size} jobTimeSum=$jobSum%.2f s " +
        f"(rest of wall = driver planning/collect-handling/stringify)")
    }
    spark.stop()
  }
}
