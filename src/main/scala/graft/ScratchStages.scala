package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway stage-level profile of one query: prints every stage's
  * wall duration, task count and shuffle bytes for the LAST rep. */
object ScratchStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_dedup_ngram_jaccard")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        stages.add(f"stage ${si.stageId}%3d  ${dur}%6d ms  tasks=${si.numTasks}%4d  " +
          f"shufW=${si.taskMetrics.shuffleWriteMetrics.bytesWritten}%9d  " +
          f"shufR=${si.taskMetrics.shuffleReadMetrics.totalBytesRead}%9d  ${si.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { _ => fn(spark, sfDir).count() } // warm
      Thread.sleep(300)
      stages.clear(); jobs.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"== $name total ${dt}%.3f s, jobs=${jobs.get()}")
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
