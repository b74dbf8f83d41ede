package graft

import org.apache.spark.sql.SparkSession

/** Single-query bench harness (local iteration aid): run one headline query
  * N times with the same clearCache cadence as [[Bench]] and print every
  * iteration with its GC-pause share and live heap — the tool for
  * attributing a warm-run anomaly to a specific query (and to collector
  * pressure vs the query's own plan) instead of the whole headline loop.
  *
  * usage: runMain graft.BenchOne <queryName> [iters=6] [pollute=0]
  *
  * `pollute=N` first runs the leading N headline queries once each WITHOUT
  * any GC, recreating the mid-session cleanup debt a long bench session
  * accumulates — the reproducer for the round-6 in-run escalation
  * (BENCH_r06 `sim_topk_matryoshka` warm runs 0.317 → 2.462 → 13.117 s).
  * Set SPARK_GRAFT_BENCH_GC=1 to System.gc() between measured iterations
  * (the [[Bench]] default) and watch the escalation disappear.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 6
    val pollute = if (args.length > 2) args(2).toInt else 0
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val gcBetween = sys.env.getOrElse("SPARK_GRAFT_BENCH_GC", "0") == "1"
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

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def heapMb(): Long = {
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
    }

    Bench.headline.take(pollute).foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    }
    if (pollute > 0)
      println(f"[benchone] polluted session with $pollute queries; heap=${heapMb()}m")

    // measure EXACTLY what Bench measures in-suite: the production variant
    // (and its untimed setup) when one exists, the correctness entry
    // otherwise — before this, a variant-backed query (e.g.
    // prep_corpus_incremental) was silently re-measured as its full
    // scenario REPLAY, and the isolated number could not be compared to
    // the in-suite one it was supposed to adjudicate
    Bench.productionSetup.get(name).foreach { prep =>
      println(s"[benchone] running untimed production setup for $name")
      prep(spark, sfDir); spark.catalog.clearCache()
    }
    val fn = Bench.productionVariants.getOrElse(name, SparkEntry.queries(name))
    (1 to iters).foreach { i =>
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      val gc = (gcMillis() - g0) / 1e3
      println(f"[benchone] $name iter $i: $t%.3f s (gc $gc%.3f s, heap ${heapMb()}m)")
      spark.catalog.clearCache()
      if (gcBetween) System.gc()
    }
    spark.stop()
  }
}
