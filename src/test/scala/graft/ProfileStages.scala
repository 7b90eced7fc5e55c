package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev profiler (test scope — not shipped): runs named queries under the
  * bench's exact session shape (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus, noop sink) and prints a per-JOB and per-STAGE wall
  * time breakdown from a SparkListener — the local stand-in for the
  * Spark UI's stage table (guide §1.1/§7.1; the bench runs with the UI
  * off).
  *
  * Usage: Test/runMain graft.ProfileStages <sfDir> <q1> [q2 ...]
  * Each query: one untimed warmup at sf0.001, then one instrumented run.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class StageRow(id: Int, name: String, tasks: Int, wallMs: Long,
        taskMs: Long, shuffleReadB: Long, shuffleWriteB: Long)
    val stages = mutable.ArrayBuffer[StageRow]()
    val jobs = mutable.LinkedHashMap[Int, (String, Long)]() // id -> (desc, t0)
    val jobWall = mutable.ArrayBuffer[(Int, String, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
          si.numTasks, wall, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten)
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(js.jobId) = (desc, js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.remove(je.jobId).foreach { case (d, t0) =>
          jobWall += ((je.jobId, d, je.time - t0))
        }
    }

    for (n <- names) {
      // warmup (codegen/JIT) at the small sf AND one full sf0.1 pass —
      // the bench reports min of two sf0.1 passes, so the steady-state
      // second pass is the number to decompose
      for (d <- Seq(warmDir, sfDir))
        try SparkEntry.queries(n)(spark, d).write
          .format("noop").mode("overwrite").save()
        finally Caches.releaseAll(spark)
      stages.clear(); jobs.clear(); jobWall.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      finally Caches.releaseAll(spark)
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"%n=== $n: $total%.2f s, ${jobWall.size} jobs, ${stages.size} stages, " +
        f"${stages.map(_.taskMs).sum / 1e3}%.1f s task CPU ===")
      println(f"  job wall sum: ${jobWall.map(_._3).sum / 1e3}%.2f s " +
        f"(gap to total = driver/planning time)")
      val byWall = stages.sortBy(-_.wallMs).take(15)
      for (s <- byWall)
        println(f"  stage ${s.id}%4d ${s.wallMs}%6d ms wall ${s.taskMs}%7d ms task " +
          f"${s.tasks}%3d tasks shR=${s.shuffleReadB}%9d shW=${s.shuffleWriteB}%9d  ${s.name.take(90)}")
    }
    spark.stop()
  }
}
