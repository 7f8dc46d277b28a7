package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query job/stage/task accounting — the measure-first harness of
  * the round-15 optimization pass (guide §1). At bench SFs most
  * declared queries are latency-bound, not data-bound: wall time ≈
  * (driver job round-trips) × (scheduling + AQE replanning overhead),
  * so the number to minimize is JOBS and STAGES, which `explain` alone
  * does not show (training loops, checkpoint barriers and broadcast
  * builds each submit extra jobs at runtime).
  *
  * `sbt 'runMain graft.tools.ProfileQuery <sfDir> <q1,q2,...> [reps]'`
  * prints one line per (query, rep): seconds, jobs, stages, tasks —
  * noop-sink timing, same methodology as graft.Bench.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks.toLong)
          val wall = (for {
            a <- s.stageInfo.completionTime
            b <- s.stageInfo.submissionTime
          } yield a - b).getOrElse(-1L)
          stageLog.add((s.stageInfo.name.takeWhile(_ != '\n').take(70),
            wall, s.stageInfo.numTasks))
        }
      })
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup
    val dumpStages = sys.env.contains("SPARK_GRAFT_PROFILE_STAGES")
    names.foreach { n =>
      (1 to reps).foreach { r =>
        jobs.set(0); stages.set(0); tasks.set(0L); stageLog.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the async listener bus drain
        println(f"PROFILE $n%-24s rep=$r dt=$dt%7.3f jobs=${jobs.get}%4d " +
          f"stages=${stages.get}%4d tasks=${tasks.get}%6d")
        if (dumpStages && r == reps) {
          import scala.jdk.CollectionConverters._
          val all = stageLog.asScala.toSeq
          println(f"  stage wall sum=${all.map(_._2).sum}%6d ms over " +
            f"${all.size} stages")
          all.sortBy(-_._2).take(12).foreach { case (nm, w, t) =>
            println(f"  STAGE $w%6d ms tasks=$t%4d  $nm")
          }
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
      }
    }
    spark.stop()
  }
}
