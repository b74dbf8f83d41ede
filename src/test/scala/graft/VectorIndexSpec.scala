package graft

import org.apache.spark.sql.functions._

import graft.ops.{Similarity, VectorIndex}
import graft.storage.GraftCatalog

/** The persisted IVF index: build-once/search-many equals the inline
  * funnel exactly, append folds a batch against the frozen codebook, and
  * the inverted lists live as a cell-partitioned catalog table (so probes
  * are partition-pruned scans and every catalog guarantee — snapshots,
  * txns, time travel — applies to the index as data). */
class VectorIndexSpec extends SparkSpec {

  private lazy val wh = {
    val dir = java.nio.file.Files.createTempDirectory("graft-vidx").toString
    spark.conf.set("spark.sql.catalog.vidx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vidx.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vidx.s")
    dir
  }

  private lazy val e =
    queries.Parity.t(spark, "/root/testdata/sf0.001", "embeddings").cache()

  test("indexed search == inline ivfTopK on the same codebook; append " +
    "extends the lists against the frozen centroids; lists are " +
    "cell-partitioned catalog data") {
    wh
    val corpus0 = e.filter(col("vec_id") % 5 =!= 0) // initial build
    val batch = e.filter(col("vec_id") % 5 === 0)   // the "daily" append
    val q = e.filter(col("vec_id") < 10)
    VectorIndex.build(spark, corpus0, "vec_id", "embedding",
      "vidx.s.emb", numCentroids = 8)
    val stored = spark.table("vidx.s.emb_centroids")
    assert(stored.count() == 8)
    // search from the stored lists == the inline funnel given the same
    // codebook — same assignment argmax, same probes, same rescore
    val indexed = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.emb", k = 5, nprobe = 3)
    val inline = Similarity.ivfTopK(corpus0, q, "vec_id", "embedding", k = 5,
      numCentroids = 8, nprobe = 3, fitCentroids = Some(stored))
    assert(indexed.exceptAll(inline).isEmpty && inline.exceptAll(indexed).isEmpty,
      "persisted-index search must equal the inline funnel bit-for-bit")
    // append: only the batch is assigned; a fresh search sees its rows and
    // still equals inline over the union corpus with the SAME frozen codebook
    VectorIndex.append(spark, batch, "vec_id", "embedding", "vidx.s.emb")
    val indexed2 = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.emb", k = 5, nprobe = 3)
    val inline2 = Similarity.ivfTopK(corpus0.unionByName(batch), q, "vec_id",
      "embedding", k = 5, numCentroids = 8, nprobe = 3,
      fitCentroids = Some(stored))
    assert(indexed2.exceptAll(inline2).isEmpty && inline2.exceptAll(indexed2).isEmpty)
    assert(spark.table("vidx.s.emb_assign").count() == e.count())
    // the inverted lists are hive-partitioned by cell on disk: one probe =
    // one partition directory, pruned at plan time like any catalog scan
    val assignDir = new java.io.File(s"$wh/s/emb_assign")
    val cellDirs = assignDir.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell="))
    assert(cellDirs.nonEmpty, s"expected cell=* partition dirs in $assignDir")
    // index maintenance IS table maintenance: daily appends fragment each
    // cell's inverted list into small files; the catalog's own compaction
    // rewrites them (per partition value = per cell) and search results
    // are untouched
    val cat = spark.sessionState.catalogManager.catalog("vidx")
      .asInstanceOf[GraftCatalog]
    val (filesBefore, filesAfter) = cat.compact(spark, "s.emb_assign")
    assert(filesAfter < filesBefore,
      s"compaction should shrink the list files ($filesBefore -> $filesAfter)")
    val indexed3 = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.emb", k = 5, nprobe = 3)
    assert(indexed3.exceptAll(inline2).isEmpty && inline2.exceptAll(indexed3).isEmpty,
      "compacting the inverted lists must not change search results")
    // kmeans-refined build: same surface, better codebook — still exact
    // equality with inline on ITS codebook
    VectorIndex.build(spark, corpus0, "vec_id", "embedding",
      "vidx.s.embk", numCentroids = 8, kmeansIters = 2)
    val storedK = spark.table("vidx.s.embk_centroids")
    val indexedK = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.embk", k = 5, nprobe = 3)
    val inlineK = Similarity.ivfTopK(corpus0, q, "vec_id", "embedding", k = 5,
      numCentroids = 8, nprobe = 3, fitCentroids = Some(storedK))
    assert(indexedK.exceptAll(inlineK).isEmpty && inlineK.exceptAll(indexedK).isEmpty)
  }
}
