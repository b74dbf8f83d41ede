package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Similarity, VectorIndex}
import graft.storage.GraftCatalog

/** Recall-vs-drift curve for the frozen-codebook IVF index
  * ([[VectorIndex]]): build on region-A data, append growing fractions of
  * region-B data the codebook has never seen, and measure recall@10 for
  * region-B queries — frozen codebook vs after [[VectorIndex.refresh]] —
  * plus whether [[VectorIndex.refreshRecommended]] fires at each point.
  * Prints one JSON line per drift fraction; numbers recorded in SCALE.md.
  */
object CodebookDriftBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val dim = 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("graft-cbdrift").toString
    spark.conf.set("spark.sql.catalog.cbd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cbd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cbd.s")

    // region A: scattered deterministic vectors; region B: a distinct
    // cluster family (3 tight sub-clusters keyed by id mod 3) the
    // build-time codebook never saw
    def regionA(ids: DataFrame): DataFrame = ids.select(col("id").alias("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        sin(col("id") * 0.7 + d * 1.3).cast("float")).alias("embedding"))
    def regionB(ids: DataFrame): DataFrame = ids.select(col("id").alias("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        (when(d === pmod(col("id"), lit(3)), lit(-9.0f)).otherwise(lit(0.0f)) +
          (pmod(col("id") * 13 + d * 5, lit(7)) - 3).cast("float") * lit(0.02f)))
        .alias("embedding"))

    for (fMille <- Seq(100L, 250L, 500L)) {
      val prefix = s"cbd.s.emb$fMille"
      val a = regionA(spark.range(n).toDF())
      val bIds = spark.range(10000000L, 10000000L + n * fMille / 1000).toDF()
      val b = regionB(bIds).localCheckpoint(false)
      VectorIndex.build(spark, a, "vec_id", "embedding", prefix,
        numCentroids = 32, kmeansIters = 2)
      val gateFires = VectorIndex.refreshRecommended(spark, b, "vec_id",
        "embedding", prefix)
      VectorIndex.append(spark, b, "vec_id", "embedding", prefix)
      val queries = regionB(bIds.limit(32)).localCheckpoint(false)
      val union = a.unionByName(b)
      val exact = Similarity.bruteForceTopK(union, queries, "vec_id",
        "embedding", k = 10).localCheckpoint(false)
      def recall(): Double = Similarity.recallAtK(
        VectorIndex.search(spark, queries, "vec_id", "embedding", prefix,
          k = 10, nprobe = 4), exact)
      def probe(): Double = {
        time { VectorIndex.search(spark, queries, "vec_id", "embedding",
          prefix, k = 10, nprobe = 4).count() } // settle
        val runs = (1 to 3).map(_ => time {
          VectorIndex.search(spark, queries, "vec_id", "embedding",
            prefix, k = 10, nprobe = 4).count() })
        runs.sorted.apply(runs.size / 2)
      }
      // how concentrated did the frozen codebook leave the drifted mass?
      def maxCell(): Long = spark.table(s"${prefix}_assign")
        .groupBy(col("cell")).count().agg(max("count")).head.getLong(0)
      val recallFrozen = recall()
      val probeFrozen = probe()
      val maxFrozen = maxCell()
      val tRefresh = time {
        require(VectorIndex.refresh(spark, prefix, numCentroids = 32,
          kmeansIters = 2), "refresh audit must pass")
      }
      spark.catalog.refreshTable(s"${prefix}_assign")
      spark.catalog.refreshTable(s"${prefix}_centroids")
      val recallRefreshed = recall()
      val probeRefreshed = probe()
      val maxRefreshed = maxCell()
      val gateQuiet = !VectorIndex.refreshRecommended(spark, b, "vec_id",
        "embedding", prefix)
      println(f"""{"metric":"codebook_drift","n":$n,"drift_fraction":${fMille / 1000.0}%.2f,"gate_fired":$gateFires,"recall_frozen":$recallFrozen%.3f,"recall_refreshed":$recallRefreshed%.3f,"probe_frozen":$probeFrozen%.3f,"probe_refreshed":$probeRefreshed%.3f,"max_cell_frozen":$maxFrozen,"max_cell_refreshed":$maxRefreshed,"gate_quiet_after":$gateQuiet,"refresh_sec":$tRefresh%.1f}""")
    }
    spark.stop()
  }
}
