package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage profile: run one SparkEntry query once (after a
  * warm-up) with a listener that prints every Spark job's wall time, stage
  * count and task count — the measurement tool for round-machinery floors
  * (a query whose time is spread over 40 sub-second jobs needs fewer JOBS,
  * not faster tasks; optimization guide §1.1).
  *
  * Usage: JobProfile <sfDir> <queryName> [cpus]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // warm-up: codegen/parquet/shuffle machinery
    try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"warmup failed: $e") }

    case class J(id: Int, start: Long, var end: Long = -1L,
                 var stages: Int = 0, var tasks: Int = 0,
                 var desc: String = "")
    val jobs = new scala.collection.concurrent.TrieMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId, e.time)
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name))
          .getOrElse("")
        j.stages = e.stageInfos.size
        j.tasks = e.stageInfos.map(_.numTasks).sum
        jobs.put(e.jobId, j)
        order.add(e.jobId): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    var acc = 0.0
    val it = order.iterator()
    while (it.hasNext) {
      val j = jobs(it.next())
      val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
      if (dur > 0) acc += dur
      println(f"job ${j.id}%4d  ${dur}%8.3f s  stages=${j.stages}%3d tasks=${j.tasks}%5d  ${j.desc.take(60)}")
    }
    println(f"TOTAL wall=${wall}%.2f s  sum(job wall)=${acc}%.2f s  n_jobs=${jobs.size}")
    spark.stop()
  }
}
