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

  test("persisted PQ codes: searchPq == inline ivfPqTopK bit-for-bit; " +
    "the code table is cell-partitioned and 4 codes wide") {
    wh
    val q = e.filter(col("vec_id") < 10)
    VectorIndex.build(spark, e, "vec_id", "embedding", "vidx.s.pq",
      numCentroids = 8)
    VectorIndex.buildPqCodes(spark, "vidx.s.pq", numSub = 4, numCodes = 16)
    val indexed = VectorIndex.searchPq(spark, q, "vec_id", "embedding",
      "vidx.s.pq", k = 5, nprobe = 3, refine = 4)
    val inline = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
      numCentroids = 8, nprobe = 3, numSub = 4, numCodes = 16, refine = 4)
    assert(indexed.exceptAll(inline).isEmpty && inline.exceptAll(indexed).isEmpty,
      "stored-code IVFADC must equal the inline composition bit-for-bit")
    // the code table carries numSub code ids per vector and lives
    // cell-partitioned like the inverted lists
    val codes = spark.table("vidx.s.pq_pq_codes")
    assert(codes.count() == e.count())
    assert(codes.select(size(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(4))
    val codesDir = new java.io.File(s"$wh/s/pq_pq_codes")
    assert(codesDir.listFiles().exists(f =>
      f.isDirectory && f.getName.startsWith("cell=")))
    // the codebook is numSub × numCodes rows — broadcast-sized
    assert(spark.table("vidx.s.pq_pq_codebook").count() == 4L * 16L)
  }

  test("tombstone delete masks rows before ranking (top-k backfills with " +
    "live rows); vacuum reclaims only affected cells; a fully-dead cell " +
    "stays masked until it can be rewritten") {
    wh
    val q = e.filter(col("vec_id") < 10)
    VectorIndex.build(spark, e, "vec_id", "embedding", "vidx.s.del",
      numCentroids = 8)
    VectorIndex.buildPqCodes(spark, "vidx.s.del", numSub = 4, numCodes = 16)
    val stored = spark.table("vidx.s.del_centroids")
    val live = e.filter(col("vec_id") % 7 =!= 3)
    val nAll = e.count(); val nLive = live.count()
    assert(nLive < nAll, "test needs a non-empty delete set")
    // delete ~1/7 of the corpus: an O(batch) tombstone append, no rewrite
    VectorIndex.delete(spark, e.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id")), "vec_id", "vidx.s.del")
    assert(spark.table("vidx.s.del_assign").count() == nAll,
      "delete must not touch the inverted lists")
    // masked search == the inline funnel over the LIVE corpus with the
    // SAME frozen codebook (assignment is per-row, so masking after
    // assignment equals assigning only live rows)
    val masked = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.del", k = 5, nprobe = 3)
    val inline = Similarity.ivfTopK(live, q, "vec_id", "embedding", k = 5,
      numCentroids = 8, nprobe = 3, fitCentroids = Some(stored))
    assert(masked.exceptAll(inline).isEmpty && inline.exceptAll(masked).isEmpty,
      "tombstoned search must equal inline over the surviving rows")
    assert(masked.filter(col("corpus_id") % 7 === 3).isEmpty,
      "no dead row may appear in results")
    // the PQ candidate stage is masked too
    val maskedPq = VectorIndex.searchPq(spark, q, "vec_id", "embedding",
      "vidx.s.del", k = 5, nprobe = 3, refine = 4)
    assert(maskedPq.filter(col("corpus_id") % 7 === 3).isEmpty)
    // vacuum: physically removes the dead rows from lists AND code table,
    // rewriting only the affected cells' partitions; search is unchanged
    val removed = VectorIndex.vacuum(spark, "vidx.s.del")
    assert(removed == nAll - nLive, s"expected ${nAll - nLive} reclaimed, got $removed")
    assert(spark.table("vidx.s.del_assign").count() == nLive)
    assert(spark.table("vidx.s.del_pq_codes").count() == nLive)
    assert(spark.table("vidx.s.del_tombstones").isEmpty,
      "all masks reclaimed -> tombstone table empty")
    val after = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.del", k = 5, nprobe = 3)
    assert(after.exceptAll(inline).isEmpty && inline.exceptAll(after).isEmpty,
      "vacuum must not change search results")
    // idempotent re-vacuum; unknown-id deletes are masked-then-dropped
    assert(VectorIndex.vacuum(spark, "vidx.s.del") == 0L)
    VectorIndex.delete(spark, spark.range(900000, 900003)
      .select(col("id").alias("vec_id")), "vec_id", "vidx.s.del")
    assert(VectorIndex.vacuum(spark, "vidx.s.del") == 0L)
    assert(spark.table("vidx.s.del_tombstones").isEmpty)
    // fully-dead cell: delete EVERY member of one cell — a dynamic
    // partition overwrite cannot clear a partition no surviving row lands
    // in, so the masks are KEPT and search stays correct; the storage is
    // reclaimed by the first vacuum after a live append lands in the cell
    val assign = spark.table("vidx.s.del_assign")
    val victim = assign.groupBy(col("cell")).count()
      .orderBy(col("count").asc, col("cell").asc).head.getLong(0)
    val members = assign.filter(col("cell") === victim)
      .select(col("corpus_id")).cache()
    val nMembers = members.count()
    VectorIndex.delete(spark, members, "corpus_id", "vidx.s.del")
    VectorIndex.vacuum(spark, "vidx.s.del")
    assert(spark.table("vidx.s.del_tombstones").count() == nMembers,
      "fully-dead cell's masks must survive the vacuum")
    val afterDead = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.del", k = 5, nprobe = 3)
    val inlineDead = Similarity.ivfTopK(
      live.join(members, live("vec_id") === members("corpus_id"), "left_anti"),
      q, "vec_id", "embedding", k = 5,
      numCentroids = 8, nprobe = 3, fitCentroids = Some(stored))
    assert(afterDead.exceptAll(inlineDead).isEmpty &&
      inlineDead.exceptAll(afterDead).isEmpty,
      "fully-dead cell's rows must stay masked")
    // a live append into the victim cell makes the next vacuum reclaim it:
    // re-append one of the cell's vectors under a fresh id (same vector ->
    // same cell under the frozen codebook), code it, vacuum again
    val srcVec = e.join(members, e("vec_id") === members("corpus_id"))
      .select((e("vec_id") + 1000000).alias("vec_id"), col("embedding"))
      .orderBy(col("vec_id").asc).limit(1)
    VectorIndex.append(spark, srcVec, "vec_id", "embedding", "vidx.s.del")
    VectorIndex.appendPqCodes(spark, srcVec, "vec_id", "embedding", "vidx.s.del")
    VectorIndex.vacuum(spark, "vidx.s.del")
    assert(spark.table("vidx.s.del_tombstones").isEmpty,
      "post-append vacuum reclaims the formerly fully-dead cell")
    assert(spark.table("vidx.s.del_assign")
      .filter(col("cell") === victim).count() == 1L)
  }

  test("incremental index refresh across a COMPACT adds nothing twice: " +
    "the maintenance snapshot is kind=rewrite, so the incr range feeds " +
    "only the real append into the index") {
    wh
    val corpus0 = e.filter(col("vec_id") % 5 =!= 0)
    val batch = e.filter(col("vec_id") % 5 === 0)
    corpus0.select(col("vec_id"), col("embedding")).repartition(4)
      .writeTo("vidx.s.cinc").using("parquet").createOrReplace()   // snap 1
    VectorIndex.build(spark, spark.table("vidx.s.cinc"),
      "vec_id", "embedding", "vidx.s.cincs", numCentroids = 8)
    batch.select(col("vec_id"), col("embedding"))
      .writeTo("vidx.s.cinc").append()                             // snap 2
    val cat = spark.sessionState.catalogManager.catalog("vidx")
      .asInstanceOf[GraftCatalog]
    val (before, after) = cat.compact(spark, "s.cinc")             // snap 3
    assert(before > after)
    spark.catalog.refreshTable("vidx.s.cinc")
    // the daily refresh: fold the range's NEW rows into the index. The
    // range spans the compact — before rewrite-aware incremental reads,
    // this re-fed EVERY row of the table and silently duplicated the
    // whole corpus inside the inverted lists
    val delta = spark.sql(
      "SELECT * FROM vidx.s.cinc VERSION AS OF 'incr:1..3'")
    assert(delta.count() == batch.count(),
      "the incr range across the compact must hold exactly the appended batch")
    VectorIndex.append(spark, delta, "vec_id", "embedding", "vidx.s.cincs")
    assert(spark.table("vidx.s.cincs_assign").count() == e.count(),
      "the index must hold each corpus row exactly once after the refresh")
    // and searches equal the inline funnel over the live table with the
    // frozen codebook — duplicates would distort nothing here, but the
    // count pin above is what proves exactly-once folding
    val stored = spark.table("vidx.s.cincs_centroids")
    val q = e.filter(col("vec_id") < 10)
    val indexed = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.cincs", k = 5, nprobe = 8)
    val inline = Similarity.ivfTopK(spark.table("vidx.s.cinc"), q,
      "vec_id", "embedding", k = 5, numCentroids = 8, nprobe = 8,
      fitCentroids = Some(stored))
    assert(indexed.exceptAll(inline).isEmpty && inline.exceptAll(indexed).isEmpty)
  }

  test("merge-on-read DML on the BASE table syncs into the index: " +
    "applyTableDeletes tombstones off the sidecar feed (delta-sized), " +
    "searches stop returning deleted rows, re-apply is idempotent") {
    wh
    // the corpus lives as a MERGE-ON-READ catalog table; the index is
    // built from it, then the table's rows change WITHOUT the indexed
    // files being touched — the staleness applyTableDeletes exists for
    e.select(col("vec_id"), col("embedding")).repartition(2)
      .writeTo("vidx.s.cmor").using("parquet")
      .tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      .tableProperty(GraftCatalog.MergeKeyProp, "vec_id")
      .createOrReplace()
    VectorIndex.build(spark, spark.table("vidx.s.cmor"),
      "vec_id", "embedding", "vidx.s.cmors", numCentroids = 8)
    val stored = spark.table("vidx.s.cmors_centroids")
    val q = e.filter(col("vec_id") < 5)
    val before = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.cmors", k = 3, nprobe = 8)
    // delete rows that demonstrably RANK today — staleness must be visible
    val victimIds = before.select(col("corpus_id")).distinct().limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(victimIds.nonEmpty)
    import spark.implicits._
    victimIds.toDF("vid").createOrReplaceTempView("cmor_del")
    // MoR DELETE: a sidecar-only delta commit (snapshot 1 = create,
    // 2 = merge)
    spark.sql("""MERGE INTO vidx.s.cmor t USING cmor_del s
      ON t.vec_id = s.vid WHEN MATCHED THEN DELETE""")
    spark.catalog.refreshTable("vidx.s.cmor")
    assert(spark.table("vidx.s.cmor")
      .filter(col("vec_id").isin(victimIds: _*)).isEmpty)
    // the index is STALE until synced — then the sidecar feed tombstones
    // exactly the deleted keys
    val n = VectorIndex.applyTableDeletes(
      spark, "vidx.s.cmor", 1L, 2L, "vidx.s.cmors")
    assert(n == victimIds.size,
      s"expected ${victimIds.size} deleted keys off the sidecar, got $n")
    val after = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.cmors", k = 3, nprobe = 8)
    assert(after.filter(col("corpus_id").isin(victimIds: _*)).isEmpty,
      "synced search must not return base-table-deleted rows")
    // and equals the inline funnel over the CURRENT table state with the
    // same frozen codebook
    val inline = Similarity.ivfTopK(spark.table("vidx.s.cmor"), q,
      "vec_id", "embedding", k = 3, numCentroids = 8, nprobe = 8,
      fitCentroids = Some(stored))
    assert(after.exceptAll(inline).isEmpty && inline.exceptAll(after).isEmpty,
      "synced index must equal inline over the live table")
    // idempotence: re-applying the same snapshot range is a no-op append
    // (writer-txn contract) — the tombstone table does not grow
    val tombs = spark.table("vidx.s.cmors_tombstones").count()
    assert(VectorIndex.applyTableDeletes(
      spark, "vidx.s.cmor", 1L, 2L, "vidx.s.cmors") == victimIds.size)
    assert(spark.table("vidx.s.cmors_tombstones").count() == tombs,
      "duplicate sync must not re-append tombstones")
    // an empty range yields nothing and writes nothing
    assert(VectorIndex.applyTableDeletes(
      spark, "vidx.s.cmor", 2L, 2L, "vidx.s.cmors") == 0)
  }

  test("KEY-LESS (position-delete) base table syncs too: " +
    "applyTableDeletes with idCol feeds off deletedRows, searches stop " +
    "returning deleted rows, re-apply is idempotent") {
    wh
    e.select(col("vec_id"), col("embedding")).repartition(2)
      .writeTo("vidx.s.cpos").using("parquet")
      .tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      .createOrReplace() // no merge.key → position deletes
    VectorIndex.build(spark, spark.table("vidx.s.cpos"),
      "vec_id", "embedding", "vidx.s.cposs", numCentroids = 8)
    val q = e.filter(col("vec_id") < 5)
    val before = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.cposs", k = 3, nprobe = 8)
    val victimIds = before.select(col("corpus_id")).distinct().limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(victimIds.nonEmpty)
    import spark.implicits._
    victimIds.toDF("vid").createOrReplaceTempView("cpos_del")
    spark.sql("""MERGE INTO vidx.s.cpos t USING cpos_del s
      ON t.vec_id = s.vid WHEN MATCHED THEN DELETE""")
    spark.catalog.refreshTable("vidx.s.cpos")
    assert(spark.table("vidx.s.cpos")
      .filter(col("vec_id").isin(victimIds: _*)).isEmpty)
    // no merge key: the keyed feed fails loudly, the row feed syncs
    val noKey = intercept[Exception](VectorIndex.applyTableDeletes(
      spark, "vidx.s.cpos", 1L, 2L, "vidx.s.cposs"))
    assert(noKey.getMessage.contains("merge.key"), noKey.getMessage)
    val n = VectorIndex.applyTableDeletes(
      spark, "vidx.s.cpos", 1L, 2L, "vidx.s.cposs", idCol = Some("vec_id"))
    assert(n == victimIds.size,
      s"expected ${victimIds.size} deleted ids off deletedRows, got $n")
    val after = VectorIndex.search(spark, q, "vec_id", "embedding",
      "vidx.s.cposs", k = 3, nprobe = 8)
    assert(after.filter(col("corpus_id").isin(victimIds: _*)).isEmpty,
      "synced search must not return base-table-deleted rows")
    // idempotence via the writer-txn contract
    val tombs = spark.table("vidx.s.cposs_tombstones").count()
    assert(VectorIndex.applyTableDeletes(spark, "vidx.s.cpos", 1L, 2L,
      "vidx.s.cposs", idCol = Some("vec_id")) == victimIds.size)
    assert(spark.table("vidx.s.cposs_tombstones").count() == tombs,
      "duplicate sync must not re-append tombstones")
  }

  test("appendPqCodes: the code layer folds a batch in against the frozen " +
    "sub-codebook — appended search equals the inline composition") {
    wh
    // corpus0 holds the lowest ids, so the union's deterministic seeds
    // (centroids = lowest 8, PQ seeds = lowest 16) are IDENTICAL to the
    // frozen stored artifacts and the inline run reproduces them
    val corpus0 = e.filter(col("vec_id") < 400)
    val batch = e.filter(col("vec_id") >= 400)
    val q = e.filter(col("vec_id") < 10)
    VectorIndex.build(spark, corpus0, "vec_id", "embedding", "vidx.s.pqa",
      numCentroids = 8)
    VectorIndex.buildPqCodes(spark, "vidx.s.pqa", numSub = 4, numCodes = 16)
    VectorIndex.append(spark, batch, "vec_id", "embedding", "vidx.s.pqa")
    VectorIndex.appendPqCodes(spark, batch, "vec_id", "embedding", "vidx.s.pqa")
    assert(spark.table("vidx.s.pqa_pq_codes").count() == e.count(),
      "every appended row must carry codes")
    val indexed = VectorIndex.searchPq(spark, q, "vec_id", "embedding",
      "vidx.s.pqa", k = 5, nprobe = 3, refine = 4)
    val inline = Similarity.ivfPqTopK(corpus0.unionByName(batch), q,
      "vec_id", "embedding", k = 5, numCentroids = 8, nprobe = 3,
      numSub = 4, numCodes = 16, refine = 4)
    assert(indexed.exceptAll(inline).isEmpty && inline.exceptAll(indexed).isEmpty,
      "appended code layer must equal the inline composition bit-for-bit")
  }

  test("refreshPqCells: after a codebook refresh rewrites the lists, the " +
    "cell realignment equals a full re-derive without re-encoding") {
    wh
    val q = e.filter(col("vec_id") < 10)
    VectorIndex.build(spark, e, "vec_id", "embedding", "vidx.s.pqr",
      numCentroids = 8)
    VectorIndex.buildPqCodes(spark, "vidx.s.pqr", numSub = 4, numCodes = 16)
    // a kmeans refresh re-fits centroids and re-assigns every row — the
    // code table's cell column is now stale
    assert(VectorIndex.refresh(spark, "vidx.s.pqr", numCentroids = 8,
      kmeansIters = 2, samplePerMille = 1000))
    VectorIndex.refreshPqCells(spark, "vidx.s.pqr")
    // consistency: every code row's cell equals its list assignment
    val mismatch = spark.table("vidx.s.pqr_pq_codes").alias("c")
      .join(spark.table("vidx.s.pqr_assign").alias("a"), Seq("corpus_id"))
      .filter(col("c.cell") =!= col("a.cell")).count()
    assert(mismatch == 0, s"$mismatch stale cells after realignment")
    val realigned = VectorIndex.searchPq(spark, q, "vec_id", "embedding",
      "vidx.s.pqr", k = 5, nprobe = 3).collect().toSeq
    // the corpus vectors are unchanged, so a full re-derive (same frozen
    // seeds → same codes) must give the identical search — realignment
    // bought the same state without re-encoding anything
    VectorIndex.buildPqCodes(spark, "vidx.s.pqr", numSub = 4, numCodes = 16)
    val rederived = VectorIndex.searchPq(spark, q, "vec_id", "embedding",
      "vidx.s.pqr", k = 5, nprobe = 3).collect().toSeq
    assert(realigned == rederived)
  }

  test("splitHotCells: a skewed corpus's fat list splits into bounded " +
    "sub-cells in place — cold lists untouched, recall holds") {
    wh
    import spark.implicits._
    val dim = 16
    // deterministic skew: ids >= 1000 sit in one tight cluster (half the
    // corpus, away from the lowest-id codebook seeds), the rest scatter —
    // the natural-cluster shape that makes one inverted list half the data
    def vec(i: Int): Seq[Float] =
      if (i >= 1000)
        (0 until dim).map(d =>
          (if (d == 0) 10f else 0f) + ((i * 31 + d * 7) % 11 - 5) * 0.01f)
      else (0 until dim).map(d => math.sin(i * 0.7 + d * 1.3).toFloat)
    val corpus = (0 until 2000).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    VectorIndex.build(spark, corpus, "vec_id", "embedding",
      "vidx.s.skew", numCentroids = 8, kmeansIters = 2)
    def cellSizes() = spark.table("vidx.s.skew_assign")
      .groupBy(col("cell")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = cellSizes()
    val beforeMax = before.values.max
    assert(beforeMax >= 900, s"fixture must be skewed, hot cell = $beforeMax")
    val queries = corpus.filter(col("vec_id") < 10 || col("vec_id") >= 1990) // both regions
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id",
      "embedding", k = 5)
    val recallBefore = Similarity.recallAtK(
      VectorIndex.search(spark, queries, "vec_id", "embedding",
        "vidx.s.skew", k = 5, nprobe = 3), exact)
    val coldCells = before.keySet.filter(c => before(c) * 4 <= beforeMax)
    val coldAssignBefore = spark.table("vidx.s.skew_assign")
      .filter(col("cell").isInCollection(coldCells))
      .select("corpus_id", "cell").collect().toSet
    val nSplit = VectorIndex.splitHotCells(spark, "vidx.s.skew",
      capFactor = 2.0, splitWays = 4)
    assert(nSplit >= 1, "the hot cell must be detected and split")
    spark.catalog.refreshTable("vidx.s.skew_assign")
    spark.catalog.refreshTable("vidx.s.skew_centroids")
    val after = cellSizes()
    assert(after.values.sum == 2000L, "no row lost or duplicated")
    assert(after.values.max < beforeMax,
      s"hot list must shrink: ${after.values.max} vs $beforeMax")
    assert(after.values.max <= beforeMax / 2,
      s"4-way split should at least halve the hot list (got ${after.values.max})")
    // cold cells' assignments byte-identical (their partitions were never
    // logically touched)
    val coldAssignAfter = spark.table("vidx.s.skew_assign")
      .filter(col("cell").isInCollection(coldCells))
      .select("corpus_id", "cell").collect().toSet
    assert(coldAssignAfter == coldAssignBefore)
    // the codebook grew by (splitWays-1) per split and search still runs
    // unchanged over the finer cells; recall is re-priced: probing the
    // same nprobe over finer cells must stay within 0.1 of the fat-cell
    // recall (it read half the corpus; the split reads a bounded slice)
    assert(spark.table("vidx.s.skew_centroids").count() == 8 + nSplit * 3)
    val recallAfter = Similarity.recallAtK(
      VectorIndex.search(spark, queries, "vec_id", "embedding",
        "vidx.s.skew", k = 5, nprobe = 3), exact)
    assert(recallAfter >= recallBefore - 0.1,
      s"recall $recallBefore -> $recallAfter")
    // append still works against the finer codebook
    VectorIndex.append(spark, Seq((5000L, vec(4)), (5001L, vec(9)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", "vidx.s.skew")
    spark.catalog.refreshTable("vidx.s.skew_assign")
    assert(spark.table("vidx.s.skew_assign").count() == 2002L)
  }

  test("splitHotCells survives duplicate low-id seed vectors: the parent " +
    "partition always receives rows, so the fat list is always cleared") {
    // regression: sub-seeds are the lowest-id members, and when two of
    // them share a direction the cosine argmax TIES on every duplicate
    // row. Under the old tie-to-highest-cid convention sub-cell #0 (the
    // parent id — the only pre-existing partition) could receive ZERO
    // rows, the dynamic overwrite never cleared the fat parent list, and
    // the audit threw on every attempt — a permanent wedge via streaming
    // maintenance. Tie-to-lowest guarantees seed #1's own row stays home.
    wh
    import spark.implicits._
    val dim = 8
    def vec(i: Int): Seq[Float] =
      if (i < 300) {
        val base = (0 until dim).map(d => if (d == 0) 10f else 0f)
        if (i <= 1) base // ids 0 and 1: EXACT duplicates — the tie seeds
        else base.zipWithIndex.map { case (v, d) =>
          v + ((i * 31 + d * 7) % 11 - 5) * 0.01f }
      } else (0 until dim).map(d => math.sin(i * 0.7 + d * 1.3).toFloat)
    val corpus = (0 until 400).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    VectorIndex.build(spark, corpus, "vec_id", "embedding",
      "vidx.s.dup", numCentroids = 4, kmeansIters = 2)
    val before = spark.table("vidx.s.dup_assign")
      .groupBy(col("cell")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hotCell = before.maxBy(_._2)._1
    assert(before(hotCell) >= 250, s"fixture must be skewed: $before")
    val nSplit = VectorIndex.splitHotCells(spark, "vidx.s.dup",
      capFactor = 2.0, splitWays = 4)
    assert(nSplit >= 1, "split must succeed despite the duplicate seeds")
    spark.catalog.refreshTable("vidx.s.dup_assign")
    spark.catalog.refreshTable("vidx.s.dup_centroids")
    val after = spark.table("vidx.s.dup_assign")
      .groupBy(col("cell")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.values.sum == 400L, s"no row lost or duplicated: $after")
    assert(after.getOrElse(hotCell, 0L) > 0L,
      "the parent sub-cell must hold the duplicate-direction rows")
    assert(after.values.max < before(hotCell),
      s"hot list must shrink: ${after.values.max} vs ${before(hotCell)}")
  }

  test("splitHotCells is write-audit-publish: a failed audit leaves both " +
    "tables byte-identical; the merge-order window never strands a row") {
    wh
    import spark.implicits._
    val dim = 16
    def vec(i: Int): Seq[Float] =
      if (i >= 1000)
        (0 until dim).map(d =>
          (if (d == 0) 10f else 0f) + ((i * 31 + d * 7) % 11 - 5) * 0.01f)
      else (0 until dim).map(d => math.sin(i * 0.7 + d * 1.3).toFloat)
    val corpus = (0 until 2000).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    VectorIndex.build(spark, corpus, "vec_id", "embedding",
      "vidx.s.wap", numCentroids = 8, kmeansIters = 2)
    val cat = spark.sessionState.catalogManager.catalog("vidx")
      .asInstanceOf[GraftCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    val idA = Identifier.of(Array("s"), "wap_assign")
    val idC = Identifier.of(Array("s"), "wap_centroids")
    val snapA0 = cat.currentSnapshot(idA)
    val snapC0 = cat.currentSnapshot(idC)
    val bookBefore = spark.table("vidx.s.wap_centroids").collect().toSet
    val assignBefore = spark.table("vidx.s.wap_assign").collect().toSet
    // (b) failed audit: an unattainable recall floor makes the audit fail —
    // the op throws, main's snapshots never move, the quarantine branch is
    // gone, and both tables read back byte-identical
    val ex = intercept[IllegalStateException] {
      VectorIndex.splitHotCells(spark, "vidx.s.wap",
        capFactor = 2.0, splitWays = 4, minAuditRecall = 1.1)
    }
    assert(ex.getMessage.contains("audit failed"))
    assert(cat.currentSnapshot(idA) == snapA0 &&
      cat.currentSnapshot(idC) == snapC0,
      "a failed audit must not advance either table's main snapshot")
    assert(cat.listRefs(idA).isEmpty && cat.listRefs(idC).isEmpty,
      "the quarantine branch must be dropped on failure")
    spark.catalog.refreshTable("vidx.s.wap_assign")
    spark.catalog.refreshTable("vidx.s.wap_centroids")
    assert(spark.table("vidx.s.wap_centroids").collect().toSet == bookBefore)
    assert(spark.table("vidx.s.wap_assign").collect().toSet == assignBefore)
    // now the real split publishes (staging happened on the branch; main
    // moved only at the audited fast-forwards)
    val nSplit = VectorIndex.splitHotCells(spark, "vidx.s.wap",
      capFactor = 2.0, splitWays = 4)
    assert(nSplit >= 1)
    spark.catalog.refreshTable("vidx.s.wap_assign")
    spark.catalog.refreshTable("vidx.s.wap_centroids")
    assert(cat.listRefs(idA).isEmpty && cat.listRefs(idC).isEmpty)
    // (a) the publish window: the codebook merges FIRST, so the only state
    // a reader between the two commits can see is (new codebook, old
    // lists). Reconstruct exactly that pair via time travel and prove the
    // closure property the order buys: every old list's cell id is still a
    // live centroid (sub-cell #0 inherited the parent id), so no stored
    // row is unreachable in the window — the reader sees fully-old results
    // or finer-codebook results, never a stranded row.
    val oldLists = spark.sql(
      s"SELECT * FROM vidx.s.wap_assign VERSION AS OF $snapA0")
    val newBook = spark.table("vidx.s.wap_centroids")
    val bookIds = newBook.select(col("centroid_id")).collect()
      .map(_.getLong(0)).toSet
    val oldCells = oldLists.select(col("cell")).distinct().collect()
      .map(_.getLong(0)).toSet
    assert(oldCells.subsetOf(bookIds),
      s"window state must keep every old cell probeable: ${oldCells -- bookIds}")
    // and the fully-new state preserved every row
    assert(spark.table("vidx.s.wap_assign").count() == 2000L)
  }

  test("refresh: drift gate recommends, WAP-committed retrain re-fits the " +
    "codebook, audit proves parity, recall recovers on drifted data") {
    wh
    import spark.implicits._
    val dim = 16
    // region A (build-time data): scattered deterministic vectors
    def vecA(i: Int): Seq[Float] =
      (0 until dim).map(d => math.sin(i * 0.7 + d * 1.3).toFloat)
    // region B (post-build drift): a tight cluster far from region A
    def vecB(i: Int): Seq[Float] =
      (0 until dim).map(d =>
        (if (d == dim - 1) -8f else 0f) + ((i * 13 + d * 5) % 7 - 3) * 0.02f)
    val corpusA = (0 until 1000).map(i => (i.toLong, vecA(i)))
      .toDF("vec_id", "embedding")
    VectorIndex.build(spark, corpusA, "vec_id", "embedding",
      "vidx.s.drift", numCentroids = 8, kmeansIters = 2)
    // in-distribution batch: gate stays quiet
    val sameDist = (2000 until 2200).map(i => (i.toLong, vecA(i)))
      .toDF("vec_id", "embedding")
    assert(!VectorIndex.refreshRecommended(spark, sameDist, "vec_id",
      "embedding", "vidx.s.drift", samplePerMille = 1000),
      "an in-distribution batch must not trigger a refresh")
    // drifted batch: fit scores collapse, gate fires
    val drifted = (3000 until 3200).map(i => (i.toLong, vecB(i)))
      .toDF("vec_id", "embedding")
    assert(VectorIndex.refreshRecommended(spark, drifted, "vec_id",
      "embedding", "vidx.s.drift", samplePerMille = 1000),
      "a drifted batch must trigger a refresh")
    // the drifted rows join the index (frozen codebook dumps them into
    // whatever old cell is least-far — the hot mislabeled shape)
    VectorIndex.append(spark, drifted, "vec_id", "embedding", "vidx.s.drift")
    spark.catalog.refreshTable("vidx.s.drift_assign")
    val queries = drifted.filter(col("vec_id") < 3010)
    val exact = Similarity.bruteForceTopK(
      corpusA.unionByName(drifted), queries, "vec_id", "embedding", k = 5)
    val recallFrozen = Similarity.recallAtK(
      VectorIndex.search(spark, queries, "vec_id", "embedding",
        "vidx.s.drift", k = 5, nprobe = 2), exact)
    // refresh: retrain on the stored corpus (sample = all of it at this
    // size), re-assign, audit, publish
    val published = VectorIndex.refresh(spark, "vidx.s.drift",
      numCentroids = 8, kmeansIters = 2, samplePerMille = 1000)
    assert(published, "audit must pass and publish")
    spark.catalog.refreshTable("vidx.s.drift_assign")
    spark.catalog.refreshTable("vidx.s.drift_centroids")
    assert(spark.table("vidx.s.drift_assign").count() == 1200L)
    assert(spark.table("vidx.s.drift_centroids").count() == 8L)
    // quarantine branches are gone
    val cat = spark.sessionState.catalogManager.catalog("vidx")
      .asInstanceOf[GraftCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    assert(cat.listRefs(Identifier.of(Array("s"), "drift_assign")).isEmpty)
    assert(cat.listRefs(Identifier.of(Array("s"), "drift_centroids")).isEmpty)
    // the refreshed codebook dedicates centroids to region B: recall on
    // drifted queries recovers (and never regresses)
    val recallAfter = Similarity.recallAtK(
      VectorIndex.search(spark, queries, "vec_id", "embedding",
        "vidx.s.drift", k = 5, nprobe = 2), exact)
    assert(recallAfter >= recallFrozen,
      s"refresh must not lose recall: $recallFrozen -> $recallAfter")
    assert(recallAfter >= 0.9,
      s"refreshed codebook must localize the drifted cluster, got $recallAfter")
    // and the gate is quiet again for region-B data
    assert(!VectorIndex.refreshRecommended(spark, drifted, "vec_id",
      "embedding", "vidx.s.drift", samplePerMille = 1000))
  }
}
