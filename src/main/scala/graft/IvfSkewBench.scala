package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Similarity, VectorIndex}
import graft.storage.GraftCatalog

/** Scale probe for IVF cell skew ([[VectorIndex.splitHotCells]]): a
  * corpus whose natural clustering drops ~half the vectors into ONE
  * inverted list — the shape where every probe touching the hot cell
  * rescans ~N/2 rows no matter how large the codebook is. Measures, at a
  * volume the sf0.1 bench cannot exercise:
  *
  *  - the cell-size distribution (max / mean / p99) before and after the
  *    split;
  *  - hot-region probe latency (warm median of a query batch aimed at the
  *    cluster) before and after;
  *  - recall@k vs brute force for the same probes before and after (the
  *    split's recall trade, priced).
  *
  * Prints one JSON line; numbers recorded in SCALE.md.
  */
object IvfSkewBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
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
    val wh = java.nio.file.Files.createTempDirectory("graft-ivfskew").toString
    spark.conf.set("spark.sql.catalog.ivs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ivs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ivs.s")

    // ids >= n/2 form one tight cluster (dominant first coordinate, tiny
    // deterministic jitter); the rest scatter. Seeds are the lowest ids,
    // so the cluster lands in whichever scattered cell is nearest — one
    // fat list holding ~half the corpus.
    val hotFrom = n / 2
    val corpus = spark.range(n).select(col("id").alias("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        when(col("id") >= hotFrom,
          when(d === 0, lit(10.0f)).otherwise(lit(0.0f)) +
            (pmod(col("id") * 31 + d * 7, lit(11)) - 5).cast("float") * lit(0.01f))
        .otherwise(sin(col("id") * 0.7 + d * 1.3).cast("float")))
        .alias("embedding"))

    VectorIndex.build(spark, corpus, "vec_id", "embedding", "ivs.s.emb",
      numCentroids = 64, kmeansIters = 1)

    def dist(): (Long, Double, Long, Int) = {
      val sizes = spark.table("ivs.s.emb_assign").groupBy(col("cell"))
        .count().collect().map(_.getLong(1)).sorted
      (sizes.last, sizes.sum.toDouble / sizes.length,
        sizes(math.max(0, (sizes.length * 99) / 100 - 1)), sizes.length)
    }
    // probes aimed at the hot region (cluster members) + a cold control
    val hotQ = corpus.filter(col("vec_id") >= hotFrom &&
      col("vec_id") < hotFrom + 32).localCheckpoint(false)
    val coldQ = corpus.filter(col("vec_id") < 32).localCheckpoint(false)
    def probe(q: org.apache.spark.sql.DataFrame): Double = {
      time { VectorIndex.search(spark, q, "vec_id", "embedding",
        "ivs.s.emb", k = 10, nprobe = 4).count() } // settle
      val runs = (1 to 3).map(_ => time {
        VectorIndex.search(spark, q, "vec_id", "embedding",
          "ivs.s.emb", k = 10, nprobe = 4).count() })
      runs.sorted.apply(runs.size / 2)
    }
    // recall on a SAMPLE (brute force over 2M x 64 queries is the slow
    // exact baseline — bounded query count keeps it tractable)
    val exactHot = Similarity.bruteForceTopK(corpus, hotQ, "vec_id",
      "embedding", k = 10).localCheckpoint(false)
    def recall(): Double = Similarity.recallAtK(
      VectorIndex.search(spark, hotQ, "vec_id", "embedding", "ivs.s.emb",
        k = 10, nprobe = 4), exactHot)

    val (mx0, mean0, p990, cells0) = dist()
    val hot0 = probe(hotQ); val cold0 = probe(coldQ); val rec0 = recall()
    val tSplit = time {
      val nSplit = VectorIndex.splitHotCells(spark, "ivs.s.emb",
        capFactor = 4.0, splitWays = 8)
      require(nSplit >= 1, "expected at least one split")
    }
    spark.catalog.refreshTable("ivs.s.emb_assign")
    spark.catalog.refreshTable("ivs.s.emb_centroids")
    val (mx1, mean1, p991, cells1) = dist()
    val hot1 = probe(hotQ); val cold1 = probe(coldQ); val rec1 = recall()

    println(f"""{"metric":"ivf_skew","n":$n,"dim":$dim,"cells_before":$cells0,"cells_after":$cells1,"max_before":$mx0,"max_after":$mx1,"p99_before":$p990,"p99_after":$p991,"mean":$mean0%.1f,"hot_probe_before":$hot0%.3f,"hot_probe_after":$hot1%.3f,"cold_probe_before":$cold0%.3f,"cold_probe_after":$cold1%.3f,"recall_before":$rec0%.3f,"recall_after":$rec1%.3f,"split_sec":$tSplit%.3f}""")
    spark.stop()
  }
}
