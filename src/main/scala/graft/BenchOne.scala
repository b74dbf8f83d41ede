package graft

import org.apache.spark.sql.SparkSession

/** Single-query bench harness (local iteration aid): run one headline query
  * N times with the same clearCache cadence as [[Bench]] and print every
  * iteration — the tool for attributing a warm-run anomaly to a specific
  * query instead of the whole 41-query loop.
  *
  * usage: runMain graft.BenchOne <queryName> [iters=6]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 6
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
    val fn = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] $name iter $i: $t%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
