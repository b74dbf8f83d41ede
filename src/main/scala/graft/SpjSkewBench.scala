package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.GraftCatalog

/** Adversarial skew benchmark for the storage-partitioned join: one
  * partition value holds ~10× the rows of all others combined (spread over
  * 16 files), and the co-partitioned join is measured three ways:
  *
  *  1. `fully_clustered` — SPJ with one task per key: the hot key's 16
  *     splits serialize into a single task, the failure mode a fixed
  *     one-task-per-key grouping has at any cluster size;
  *  2. `partially_clustered` — Spark's partially-clustered SPJ
  *     (`v2.bucketing.partiallyClusteredDistribution.enabled`): each hot
  *     split zips with a replica of the probe side's key group, so the hot
  *     key fans out across tasks AT RUNTIME, still zero-shuffle (this is
  *     what [[org.apache.spark.sql.graftshim.KeyedScan]]'s stock-sized
  *     per-key repacking exists to enable);
  *  3. `shuffle_join` — the stock non-SPJ plan for context (at bench scale
  *     the shuffle is cheap; SPJ's win is the shuffle it avoids at 100 TB,
  *     while THIS bench isolates the skew-subdivision behavior).
  *
  * Prints one JSON line with wall times and join task counts; numbers
  * recorded in SCALE.md.
  */
object SpjSkewBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val hotRows = args.headOption.map(_.toInt).getOrElse(2000000)
    val nCold = 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)

    val dir = java.nio.file.Files.createTempDirectory("graft-spjskew").toString
    spark.conf.set("spark.sql.catalog.spjskew", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjskew.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spjskew.db")

    // hot key 0: hotRows rows in 16 files; cold keys 1..nCold share a tenth
    spark.range(hotRows.toLong)
      .select(col("id"), lit(0).alias("k"), (col("id") % 1000).alias("v"))
      .repartition(16)
      .writeTo("spjskew.db.fact").using("parquet")
      .partitionedBy(col("k")).createOrReplace()
    spark.range(hotRows.toLong / 10)
      .select(col("id"), (col("id") % nCold + 1).cast("int").alias("k"),
        (col("id") % 1000).alias("v"))
      .coalesce(2)
      .writeTo("spjskew.db.fact").append()
    spark.range((nCold + 1) * 16L)
      .select((col("id") % (nCold + 1)).cast("int").alias("k"),
        col("id").alias("rid"))
      .coalesce(1)
      .writeTo("spjskew.db.probe").using("parquet")
      .partitionedBy(col("k")).createOrReplace()

    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.graft.spj.preserveDataGrouping", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def join() = spark.table("spjskew.db.fact")
      .join(spark.table("spjskew.db.probe"), "k")
      .agg(count(lit(1)).alias("n"), sum(col("v") + col("rid")).alias("s"))

    def measure(): Double = { time(join().collect()); time(join().collect()) } // 2nd = warm

    def tasks(): Int = spark.table("spjskew.db.fact")
      .join(spark.table("spjskew.db.probe"), "k").rdd.getNumPartitions

    spark.conf.set(
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "false")
    val tFully = measure(); val nFully = tasks()
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "true")
    val tPartial = measure(); val nPartial = tasks()
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    val tShuffle = measure()

    println(f"""{"metric":"spj_skew","hot_rows":$hotRows,"cold_keys":$nCold,"fully_clustered_sec":$tFully%.2f,"fully_clustered_tasks":$nFully,"partially_clustered_sec":$tPartial%.2f,"partially_clustered_tasks":$nPartial,"shuffle_join_sec":$tShuffle%.2f}""")
    spark.stop()
  }
}
