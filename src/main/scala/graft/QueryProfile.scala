package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query stage profiler (operational/diagnostic main, not a bench):
  * run ONE `SparkEntry.queries` entry in a fresh JVM a few times and
  * print each iteration's wall time plus the final iteration's stage
  * timeline (stage id, name head, task count, total task time, max task
  * time) — the "name the slow stage" tool the drift triage needs when a
  * bench number creeps on an untouched code path.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.QueryProfile prep_corpus_incremental 3"
  */
object QueryProfile {

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: QueryProfile <query> [iters]"))
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)
    // profile what the BENCH times: the production variant over persisted
    // state where one exists (materialized once, untimed — same contract
    // as Bench.main), the plain queries entry otherwise
    val fn = Bench.productionVariants.get(name)
      .orElse(SparkEntry.queries.get(name))
      .getOrElse(throw new IllegalArgumentException(s"no such query: $name"))
    Bench.productionSetup.get(name).foreach(prep => prep(spark, sfDir))

    final case class StageRow(
      id: Int, name: String, tasks: Int, taskSecs: Double, maxTaskSecs: Double,
      wallSecs: Double)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    // per-stage max task duration, fed by onTaskEnd — the straggler signal
    val maxTask = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Double]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (record && te.taskInfo != null)
          maxTask.merge(te.stageId, te.taskInfo.duration / 1e3,
            (a, b) => math.max(a, b))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val i = sc.stageInfo
          val wall = (for {
            a <- i.completionTime; b <- i.submissionTime
          } yield (a - b) / 1e3).getOrElse(0.0)
          stages.add(StageRow(i.stageId, i.name.linesIterator.next().take(90),
            i.numTasks, i.taskMetrics.executorRunTime / 1e3,
            Option(maxTask.get(i.stageId)).fold(0.0)(_.doubleValue()), wall))
        }
    })

    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    (1 to iters).foreach { i =>
      if (i == iters) { stages.clear(); maxTask.clear(); record = true }
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] iter $i: $dt%.3f s  (rows=$n)")
      // the listener bus is asynchronous: drain it before reading the
      // stage table or the tail (often slowest) stages are silently lost
      org.apache.spark.sql.graftshim.Shims.drainListenerBus(spark.sparkContext)
      record = false
      clearAll(); System.gc()
    }
    import scala.jdk.CollectionConverters._
    val rows = stages.asScala.toSeq.sortBy(-_.wallSecs).take(20)
    println(f"[profile] final-iteration stages by wall time "
      + f"(${stages.size()} stages total):")
    rows.foreach { s =>
      println(f"[profile]   stage ${s.id}%5d wall=${s.wallSecs}%7.3f s "
        + f"taskTime=${s.taskSecs}%8.3f s maxTask=${s.maxTaskSecs}%7.3f s "
        + f"tasks=${s.tasks}%4d  ${s.name}")
    }
    spark.stop()
  }
}
