package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build-once/search-many vs the inline IVF funnel (SCALE.md
  * §vector-index): the inline spelling re-assigns the whole corpus to
  * cells on EVERY search call; the persisted index pays that once at
  * build and serves each query batch from the stored inverted lists.
  * Identical results asserted (same frozen codebook).
  *
  * usage: runMain graft.VectorIndexBench [corpusRows=200000] [dim=64] [searches=3]
  */
object VectorIndexBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val searches = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)

    val wh = java.nio.file.Files.createTempDirectory("graft-vidx-bench").toString
    spark.conf.set("spark.sql.catalog.vb", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vb.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vb.s")

    // deterministic pseudo-random float vectors in [-1, 1)
    val corpus = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)), d =>
          (pmod(xxhash64(col("id"), d), lit(2000000)) - 1000000).cast("float") / 1e6f)
          .alias("embedding"))
      .localCheckpoint(false)
    val queries = corpus.filter(col("vec_id") < 100).localCheckpoint(false)

    def time[A](fn: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = fn
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (_, tBuild) = time(ops.VectorIndex.build(spark, corpus, "vec_id",
      "embedding", "vb.s.emb", numCentroids = 64))
    println(f"[vidx] build (fit + assign + write lists): $tBuild%.2f s ($n vectors, dim $dim)")
    val stored = spark.table("vb.s.emb_centroids").localCheckpoint(false)

    def shape(label: String, qdf: org.apache.spark.sql.DataFrame): Unit = {
      var inlineTotal = 0.0
      var indexedTotal = 0.0
      for (i <- 1 to searches) {
        val (a, tInline) = time(ops.Similarity.ivfTopK(corpus, qdf, "vec_id",
          "embedding", k = 10, numCentroids = 64, nprobe = 8,
          fitCentroids = Some(stored)).localCheckpoint(false))
        val (b, tIndexed) = time(ops.VectorIndex.search(spark, qdf, "vec_id",
          "embedding", "vb.s.emb", k = 10, nprobe = 8).localCheckpoint(false))
        println(f"[vidx] $label search $i: inline $tInline%.2f s, from index $tIndexed%.2f s")
        inlineTotal += tInline; indexedTotal += tIndexed
        if (i == 1) {
          val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
          assert(diff == 0, s"indexed vs inline diverged: $diff rows")
        }
        a.unpersist(); b.unpersist()
      }
      println(f"[vidx] $label totals: inline $inlineTotal%.2f s, " +
        f"indexed $indexedTotal%.2f s (${inlineTotal / indexedTotal}%.2fx)")
    }
    // lookup shape: 3 queries probe 8/64 cells — cell pruning reads ~1/8
    // of the lists, inline must still assign the whole corpus
    shape("lookup(3q)", corpus.filter(col("vec_id") < 3).localCheckpoint(false))
    // batch shape: 100 queries touch most cells — pruning is moot, the
    // index saves only the assignment pass
    shape("batch(100q)", queries)
    println(f"[vidx] build cost (one-time): $tBuild%.2f s")
    spark.stop()
  }
}
