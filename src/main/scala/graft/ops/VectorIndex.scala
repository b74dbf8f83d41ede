package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** A persisted IVF index as two catalog tables — the "vector database"
  * shape on plain lakehouse storage, where the index is DATA and every
  * maintenance primitive the catalog already has (snapshots, time travel,
  * writer txns, partition layout) applies to it unchanged:
  *
  *  - `<prefix>_centroids` (centroid_id, centvec): the frozen codebook,
  *    broadcast-sized (numCentroids rows);
  *  - `<prefix>_assign` (corpus_id, vec, cell), PARTITIONED BY cell: each
  *    vector stored in its inverted list. A probe of one cell is a
  *    partition-pruned scan (the manifest's file-skipping stats never even
  *    open other cells' footers); a batched multi-query search is a
  *    broadcast join on `cell` that shuffles no corpus rows — identical
  *    plan shape to the inline [[Similarity.ivfTopK]], minus the per-run
  *    assignment pass over the corpus.
  *
  * [[build]] pays the corpus scan ONCE; [[search]] serves any number of
  * query batches from the stored lists; [[append]] folds a new batch in
  * against the FROZEN codebook (assignment is per-row, embarrassingly
  * parallel, and touches only the new rows — the daily-ingest cost is the
  * day's data). Freezing the codebook is what makes append cheap and
  * results reproducible; re-fitting centroids is a [[build]] — the
  * rebuild-vs-drift trade every production ANN index makes.
  *
  * All arithmetic is the same fixed-order cosine as the inline funnels, so
  * [[search]] over a built index EQUALS [[Similarity.ivfTopK]] with the
  * stored centroids passed as `fitCentroids` — spec-asserted, and the
  * indexed query hash-checks against the same DuckDB oracle as the inline
  * one.
  */
object VectorIndex {

  private def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    VectorFunctions.cosine(a, b)

  /** Fit (or take) a codebook and write the two index tables. `kmeansIters
    * = 0` keeps the deterministic lowest-id seed codebook
    * (oracle-reproducible — [[Similarity.ivfTopK]]'s default); more
    * iterations buy recall at identical search cost. */
  def build(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      tablePrefix: String,
      numCentroids: Int = 16,
      kmeansIters: Int = 0): Unit = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("vec"))
    val seed = c.orderBy(col("corpus_id").asc).limit(numCentroids)
      .select(col("corpus_id").alias("centroid_id"), col("vec").alias("centvec"))
    val centroids =
      if (kmeansIters <= 0) seed
      else Similarity.kmeansCentroids(c, "corpus_id", "vec", numCentroids, kmeansIters)
        .select(col("centroid_id"), col("centvec"))
    centroids.writeTo(s"${tablePrefix}_centroids").using("parquet").createOrReplace()
    // repartition ON the cell key before writing: each inverted list lands
    // as ONE file (not one per write task) — without this a 32-task build
    // leaves ~tasks×cells small files and every later search pays their
    // open cost; with it the list layout is the few-big-files shape scans
    // want from day one (appends re-fragment; catalog compact() re-folds)
    assignTo(spark, c, tablePrefix).repartition(col("cell"))
      .writeTo(s"${tablePrefix}_assign")
      .using("parquet")
      .partitionedBy(col("cell"))
      .createOrReplace()
  }

  /** Assign rows to the STORED codebook (same argmax + deterministic ties
    * as the inline funnels). */
  private def assignTo(spark: SparkSession, c: DataFrame, tablePrefix: String): DataFrame = {
    val centroids = spark.table(s"${tablePrefix}_centroids")
    c.crossJoin(broadcast(centroids))
      .select(col("corpus_id"), col("vec"),
        struct(cosine(col("vec"), col("centvec")).alias("s"),
          col("centroid_id").alias("cid")).alias("sc"))
      .groupBy(col("corpus_id"))
      .agg(first(col("vec")).alias("vec"), max(col("sc")).alias("best"))
      .select(col("corpus_id"), col("vec"), col("best.cid").alias("cell"))
  }

  /** Fold a new batch into the index against the frozen codebook — the
    * day's cost is the day's rows (assignment is one broadcast pass over
    * the BATCH; existing lists are untouched, the append is a new-files
    * commit). */
  def append(
      spark: SparkSession,
      newRows: DataFrame,
      idCol: String,
      vecCol: String,
      tablePrefix: String,
      txn: Option[(String, Long)] = None): Unit = {
    val w = assignTo(spark,
      newRows.select(col(idCol).alias("corpus_id"), col(vecCol).alias("vec")),
      tablePrefix)
      .repartition(col("cell"))
      .writeTo(s"${tablePrefix}_assign")
    // a (appId, version) writer txn makes the append replay-idempotent —
    // what the streaming maintenance sink threads its batchId through
    txn.fold(w) { case (app, v) =>
      w.option(graft.storage.GraftCatalog.TxnAppIdOption, app)
        .option(graft.storage.GraftCatalog.TxnVersionOption, v.toString)
    }.append()
  }

  /** Split every over-full inverted list into `splitWays` finer sub-cells —
    * the bounded-hot-cell maintenance a skewed corpus needs. A natural
    * cluster holding half the vectors makes one cell's list half the
    * corpus: every probe that touches it rescans ~N/2 rows regardless of
    * numCentroids, and at 100 TB that hot partition is the whole query
    * cost. The split is LOCAL maintenance, priced like compaction:
    *
    *  - hot = cells whose list exceeds `capFactor ×` the mean list size
    *    (sizes are one codebook-bounded aggregate — ≤ numCentroids rows,
    *    the same driver-side decision class as search's probed-cell set);
    *  - each hot cell reassigns ONLY ITS OWN rows to `splitWays` sub-seeds
    *    drawn deterministically from its members (lowest corpus_ids; each
    *    seed is its own member, so no sub-cell is empty);
    *  - sub-cell #0 INHERITS the parent's cell id, so the dynamic
    *    partition overwrite replaces the fat partition in place and
    *    creates the fresh sub-partitions — cold cells' files are never
    *    read, rewritten, or logically touched;
    *  - the codebook stays FLAT: the parent's centroid row is replaced by
    *    the sub-centroids, so [[search]] and [[append]] are UNCHANGED —
    *    probes simply see finer centroids where the data is dense (the
    *    two-level/IMI idea expressed as data, not as a second index
    *    structure).
    *
    * After a split, cold rows keep their old-codebook assignment (that is
    * the point — no corpus rewrite), so indexed results may differ from an
    * inline re-run under the new codebook; the recall trade is measured in
    * VectorIndexSpec and SCALE.md.
    *
    * The publish is write-audit-publish, the same machinery as [[refresh]]:
    * both the re-assigned lists and the new codebook are staged on a
    * quarantine branch, the audit proves (a) every row survived, (b) every
    * inverted list's cell id exists in the staged codebook (the
    * crash-stranded state a naive two-commit publish can leave), (c) the
    * hot region's members are exactly the parent's, and (d) search over
    * the split index keeps `minAuditRecall` of the pre-split results on
    * the sub-seed queries — only then do both branches fast-forward main.
    * A crash or failed audit leaves main byte-identical (failed audit
    * throws). The two merges publish codebook FIRST, then lists: in the
    * window between them every stored row is still probeable (sub-cell #0
    * inherits the parent id, so the old fat list pairs consistently with
    * the new finer codebook) — the intermediate state degrades recall for
    * one query at worst, never strands a row. Returns the number of cells
    * split. */
  def splitHotCells(
      spark: SparkSession,
      tablePrefix: String,
      capFactor: Double = 4.0,
      splitWays: Int = 4,
      minAuditRecall: Double = 0.8,
      auditK: Int = 5,
      auditNprobe: Int = 3,
      branch: String = "vidx_split"): Int = {
    require(splitWays >= 2, s"splitWays must be >= 2, got $splitWays")
    val assigned = spark.table(s"${tablePrefix}_assign")
    val centroids = spark.table(s"${tablePrefix}_centroids")
    val sizes = assigned.groupBy(col("cell")).agg(count(lit(1)).alias("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val numCells = centroids.count()
    val cap = capFactor * sizes.values.sum.toDouble / numCells
    val hot = sizes.filter(_._2 > cap).keys.toSeq.sorted
    if (hot.isEmpty) return 0
    // deterministic sub-seeds: the splitWays lowest-id members per hot
    // cell — codebook-sized collect (≤ hot × splitWays rows)
    val seedW = Window.partitionBy(col("cell")).orderBy(col("corpus_id").asc)
    val seeds = assigned.filter(col("cell").isInCollection(hot))
      .withColumn("sr", row_number().over(seedW))
      .filter(col("sr") <= splitWays)
      .select(col("cell"), col("sr"), col("vec"))
      .collect()
    val maxId = centroids.agg(max(col("centroid_id"))).head.getLong(0)
    val hotIndex = hot.zipWithIndex.toMap
    val subRows = seeds.map { r =>
      val cell = r.getLong(0); val sr = r.getInt(1)
      val id =
        if (sr == 1) cell
        else maxId + 1 + hotIndex(cell).toLong * (splitWays - 1) + (sr - 2)
      (id, r.getSeq[Float](2), cell)
    }.toSeq
    import spark.implicits._
    val subCentroids = subRows.toDF("centroid_id", "centvec", "parent")
    // reassign the hot cells' rows among their OWN sub-seeds. Ties break
    // to the LOWEST cid — deliberately the opposite of assignTo's
    // max(struct(s, cid)) convention: sub-cell #0 keeps the parent's id,
    // which is the only PRE-EXISTING partition, and the dynamic overwrite
    // only clears partitions that receive rows. Seed #1's own row scores
    // cosine 1.0 against its own centroid, and with tie-low that row can
    // never be poached by a duplicate sub-seed (whose id is always
    // higher), so the parent partition is guaranteed non-empty and the
    // fat parent list is always overwritten. (Under tie-HIGH, a hot cell
    // whose lowest-id seeds share a direction left sub-cell #0 empty, the
    // stale fat list survived on the branch, and the audit failed on
    // every attempt — a permanent wedge via the streaming maintenance
    // path.) Empty NEW sub-cells are harmless: their partitions never
    // existed, so there is nothing stale to clear.
    val reassigned = assigned.filter(col("cell").isInCollection(hot))
      .crossJoin(broadcast(subCentroids)).filter(col("cell") === col("parent"))
      .select(col("corpus_id"), col("vec"),
        struct(cosine(col("vec"), col("centvec")).alias("s"),
          (-col("centroid_id")).alias("ncid")).alias("sc"))
      .groupBy(col("corpus_id"))
      .agg(first(col("vec")).alias("vec"), max(col("sc")).alias("best"))
      .select(col("corpus_id"), col("vec"), (-col("best.ncid")).alias("cell"))
    // swap the fat parents' rows for the sub-centroids (codebook-sized
    // table; full replace is the cheap side of this operation)
    val kept = centroids.filter(!col("centroid_id").isInCollection(hot))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val newBook = (kept ++ subRows.map(t => (t._1, t._2))).toSeq
      .sortBy(_._1).toDF("centroid_id", "centvec")
    // ── write-audit-publish (same shape as refresh) ──
    val (catC, idC) = catalogAndIdent(spark, s"${tablePrefix}_centroids")
    val (catA, idA) = catalogAndIdent(spark, s"${tablePrefix}_assign")
    // a crashed prior split may have left the quarantine branch behind; its
    // staged state never published, so discarding it is the recovery
    catC.dropBranch(idC, branch); catC.createBranch(idC, branch)
    catA.dropBranch(idA, branch); catA.createBranch(idA, branch)
    try {
      newBook.writeTo(s"${tablePrefix}_centroids")
        .option(graft.storage.GraftCatalog.BranchOption, branch)
        .overwrite(lit(true))
      reassigned.repartition(col("cell"))
        .writeTo(s"${tablePrefix}_assign")
        .option(graft.storage.GraftCatalog.BranchOption, branch)
        .overwritePartitions()
      // AUDIT — against the branch heads, the exact snapshots that publish
      val bCent = spark.sql(
        s"SELECT * FROM ${tablePrefix}_centroids VERSION AS OF '$branch'")
      val bAssign = spark.sql(
        s"SELECT * FROM ${tablePrefix}_assign VERSION AS OF '$branch'")
      val nRows = sizes.values.sum
      val rowsOk = bAssign.count() == nRows
      // every inverted list must point at a live centroid — the exact
      // inconsistency a partial two-table publish strands (codebook-sized
      // driver sets on both sides)
      val bookIds = bCent.select(col("centroid_id")).collect()
        .map(_.getLong(0)).toSet
      val listCells = bAssign.select(col("cell")).distinct().collect()
        .map(_.getLong(0)).toSet
      val closureOk = listCells.subsetOf(bookIds)
      // hot membership preserved exactly: the sub-cells' union holds the
      // parents' members, nothing more, nothing less (cold partitions are
      // untouched by the dynamic overwrite, so this pins the whole change)
      val subIds = subRows.map(_._1)
      val hotBefore = assigned.filter(col("cell").isInCollection(hot))
        .select(col("corpus_id"))
      val hotAfter = bAssign.filter(col("cell").isInCollection(subIds))
        .select(col("corpus_id"))
      val membersOk = hotAfter.exceptAll(hotBefore).isEmpty &&
        hotBefore.exceptAll(hotAfter).isEmpty
      // recall gate on the sub-seed queries (hot-region members, already a
      // codebook-sized driver set): the split index must keep
      // minAuditRecall of what the fat-cell scan returned
      val auditQ = subRows.map(t => (t._1, t._2))
        .toDF("query_id", "qvec").localCheckpoint(false)
      val preRes = searchOver(centroids, assigned, auditQ, auditK, auditNprobe)
      val postRes = searchOver(bCent, bAssign, auditQ, auditK, auditNprobe)
      val recall = Similarity.recallAtK(postRes, preRes)
      val recallOk = recall >= minAuditRecall
      if (!(rowsOk && closureOk && membersOk && recallOk)) {
        catC.dropBranch(idC, branch); catA.dropBranch(idA, branch)
        throw new IllegalStateException(
          s"splitHotCells audit failed (rows=$rowsOk closure=$closureOk " +
            s"members=$membersOk recall=$recall>=$minAuditRecall=$recallOk) " +
            "— main left byte-identical, quarantine branch dropped")
      }
      // codebook first, then lists: between the merges the old fat list
      // still pairs with a codebook that contains its cell id (sub-cell #0
      // = parent), so no row is ever unreachable
      catC.mergeBranch(idC, branch)
      catA.mergeBranch(idA, branch)
      catC.dropBranch(idC, branch); catA.dropBranch(idA, branch)
      hot.size
    } catch { case e: Throwable =>
      catC.dropBranch(idC, branch); catA.dropBranch(idA, branch); throw e
    }
  }

  /** The index's tombstone set, if any deletes have been recorded.
    * Missing table (an index that has never seen a [[delete]]) reads as
    * None — every search path treats that as "no deletes". */
  private def tombstonesOpt(spark: SparkSession, tablePrefix: String): Option[DataFrame] =
    try Some(spark.table(s"${tablePrefix}_tombstones"))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Mask `assigned`-shaped rows (anything with a corpus_id column) by the
    * tombstone set: a broadcast anti join against a table bounded by the
    * un-vacuumed delete count — the read-side cost of LSM-style deletes. */
  private def maskDeleted(
      spark: SparkSession, rows: DataFrame, tablePrefix: String): DataFrame =
    tombstonesOpt(spark, tablePrefix).fold(rows)(t =>
      rows.join(broadcast(t), Seq("corpus_id"), "left_anti"))

  /** Tombstone-delete: record the ids in `<prefix>_tombstones` (created on
    * first use) — an O(batch) append, no list rewrite, the LSM delete
    * shape. Every search path anti-joins the tombstones BEFORE ranking, so
    * top-k backfills with live rows immediately; [[vacuum]] later reclaims
    * the storage. Unknown ids are harmless (the mask is an anti join; the
    * next [[vacuum]] drops them). Same `(appId, version)` writer-txn
    * idempotence contract as [[append]] for streaming replay safety. */
  def delete(
      spark: SparkSession,
      ids: DataFrame,
      idCol: String,
      tablePrefix: String,
      txn: Option[(String, Long)] = None): Unit = {
    val t = ids.select(col(idCol).cast("long").alias("corpus_id")).distinct()
    if (tombstonesOpt(spark, tablePrefix).isEmpty) {
      // the txn must be recorded on the CREATE too, or the first delete
      // of a table's life is silently outside the replay guard
      val w0 = t.writeTo(s"${tablePrefix}_tombstones").using("parquet")
      txn.fold(w0) { case (app, v) =>
        w0.option(graft.storage.GraftCatalog.TxnAppIdOption, app)
          .option(graft.storage.GraftCatalog.TxnVersionOption, v.toString)
      }.create()
      return
    }
    val w = t.writeTo(s"${tablePrefix}_tombstones")
    txn.fold(w) { case (app, v) =>
      w.option(graft.storage.GraftCatalog.TxnAppIdOption, app)
        .option(graft.storage.GraftCatalog.TxnVersionOption, v.toString)
    }.append()
  }

  /** Sync the index with a base table's MERGE-ON-READ DML: a delta commit
    * deletes/replaces visible rows without touching the files the index
    * was built from, so the index goes stale silently — searches keep
    * returning rows the table no longer holds. This reads the row keys
    * deleted (or replaced by an update) in `(fromSnapshot, toSnapshot]`
    * off the table's equality-delete sidecars
    * ([[graft.storage.GraftCatalog.deletedKeys]] — delta-sized, never a
    * table diff) and tombstones them; the normal [[append]] over the
    * table's incremental read (`VERSION AS OF 'incr:a..b'`) then folds
    * in the delta's NEW/replacement vectors, completing an update.
    * Requires a single-column integral row identity (the index's
    * `corpus_id` domain). Idempotent per `toSnapshot` via the writer-txn
    * contract. Returns the number of keys tombstoned.
    *
    * KEY-LESS tables (position-delete merge-on-read) have no merge key to
    * read off sidecars — pass `idCol`: the feed becomes
    * [[graft.storage.GraftCatalog.deletedRows]] (the range's tombstoned
    * rows, read from the sidecars + ONLY the named target files — still
    * O(delta), never a table diff), projected to the index's id column. */
  def applyTableDeletes(
      spark: SparkSession,
      table: String,
      fromSnapshot: Long,
      toSnapshot: Long,
      tablePrefix: String,
      idCol: Option[String] = None): Long = {
    val (cat, ident) = catalogAndIdent(spark, table)
    val name = (ident.namespace :+ ident.name).mkString(".")
    // delta-sized by contract, but the plan behind it is not free (the
    // row feed scans the targeted files): checkpoint once so count() and
    // the tombstone write don't evaluate it twice
    val keys = (idCol match {
      case Some(c) =>
        cat.deletedRows(spark, name, fromSnapshot, toSnapshot)
          .select(c).distinct()
      case None => cat.deletedKeys(spark, name, fromSnapshot, toSnapshot)
    }).localCheckpoint(true)
    require(keys.schema.length == 1,
      s"index sync needs a single-column row identity, " +
        s"got ${keys.columns.mkString(",")}")
    val n = keys.count()
    if (n > 0)
      delete(spark, keys, keys.columns.head, tablePrefix,
        txn = Some((s"graft-index-sync-$table-$tablePrefix", toSnapshot)))
    n
  }

  /** Reclaim tombstoned rows' storage: rewrite ONLY the inverted-list
    * partitions that hold dead rows AND have at least one survivor (a
    * dynamic partition overwrite — cold cells' files are never read or
    * touched; the affected-cell set is bounded by the tombstone count and
    * the codebook size), mirror the rewrite onto the PQ code table when
    * one exists, then shrink the tombstone table to the masks still
    * needed. A cell whose rows are ALL dead cannot be cleared by a
    * dynamic overwrite (no surviving row lands in it), so its tombstones
    * are KEPT — the rows stay masked, and the storage is reclaimed by the
    * first vacuum after an append lands a live row in that cell (or by
    * any maintenance rewrite). Write order is crash-safe by construction:
    * lists first, then codes, tombstones LAST — every intermediate state
    * still masks every dead row, so a crash anywhere leaves search
    * correct, only the reclaim unfinished. Returns the number of rows
    * physically removed. */
  def vacuum(spark: SparkSession, tablePrefix: String): Long = {
    val tOpt = tombstonesOpt(spark, tablePrefix)
    if (tOpt.isEmpty) return 0L
    val t = tOpt.get.localCheckpoint(true)
    if (t.isEmpty) return 0L
    // Each cell-partitioned layer is processed independently: a dynamic
    // partition overwrite can only clear a partition some surviving row
    // lands in, and `_assign` and `_pq_codes` can disagree per cell (an
    // [[append]]-ed row has no code row until [[appendPqCodes]]). A
    // layer's dead row keeps its mask until ITS cell is rewritten in that
    // layer; the tombstone survives as long as ANY layer still owes it.
    // Returns (masks this layer still owes, rows physically removed).
    def reclaim(df: DataFrame, table: String): (DataFrame, Long) = {
      val dead = df.join(broadcast(t), Seq("corpus_id"), "left_semi")
        .select(col("corpus_id"), col("cell")).localCheckpoint(true)
      val affected = dead.select(col("cell")).distinct().collect().map(_.get(0))
      if (affected.isEmpty) return (dead.select(col("corpus_id")), 0L)
      // ≤ codebook-sized driver decision, like search's probed-cell set
      val survivors = df.filter(col("cell").isInCollection(affected))
        .join(broadcast(t), Seq("corpus_id"), "left_anti")
        .select(col("cell")).distinct().collect().map(_.get(0))
      if (survivors.nonEmpty) {
        df.filter(col("cell").isInCollection(survivors))
          .join(broadcast(t), Seq("corpus_id"), "left_anti")
          .repartition(col("cell"))
          .writeTo(table)
          .overwritePartitions()
      }
      val owed = dead.filter(!col("cell").isInCollection(
          if (survivors.isEmpty) Seq(-1L) else survivors.toSeq))
        .select(col("corpus_id")).localCheckpoint(true)
      (owed, dead.count() - owed.count())
    }
    val (owedA, removed) =
      reclaim(spark.table(s"${tablePrefix}_assign"), s"${tablePrefix}_assign")
    val owedPq =
      try Some(reclaim(
        spark.table(s"${tablePrefix}_pq_codes"), s"${tablePrefix}_pq_codes")._1)
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    // shrink the tombstones LAST (crash-safe: every earlier state still
    // masks every dead row); unknown-id masks vanish here — they are owed
    // by no layer
    val remaining = owedPq.fold(owedA)(owedA.unionByName(_))
      .distinct().localCheckpoint(true)
    remaining.writeTo(s"${tablePrefix}_tombstones").overwrite(lit(true))
    removed
  }

  /** Top-k by exact cosine inside the `nprobe` nearest cells per query,
    * served from the stored inverted lists. Tombstoned rows ([[delete]])
    * are masked before ranking, so the top-k backfills with live rows.
    * Output schema matches [[Similarity.ivfTopK]]:
    * (query_id, rank, corpus_id, score). */
  def search(
      spark: SparkSession,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      tablePrefix: String,
      k: Int,
      nprobe: Int = 4): DataFrame =
    searchOver(
      spark.table(s"${tablePrefix}_centroids"),
      maskDeleted(spark, spark.table(s"${tablePrefix}_assign"), tablePrefix),
      queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec")),
      k, nprobe)

  /** [[search]] over explicit centroid/list frames — what [[refresh]]'s
    * audit runs against a BRANCH view before anything publishes. `q` is
    * already (query_id, qvec). */
  private def searchOver(
      centroids: DataFrame,
      assigned: DataFrame,
      q: DataFrame,
      k: Int,
      nprobe: Int): DataFrame = {
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ps").desc, col("cell").asc)
    val probed = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qvec"),
        cosine(col("qvec"), col("centvec")).alias("ps"),
        col("centroid_id").alias("cell"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))
    // Static cell pruning: the union of probed cells is bounded by the
    // CODEBOOK size (≤ numCentroids values — a driver-side set the size of
    // a partition-pruning decision, not a data collect), and turning it
    // into an `isin` filter lets the catalog scan prune whole cell
    // partitions at plan time: a lookup probing 8 of 1024 cells reads 8
    // cells' files and opens no other footer. A broad query batch probes
    // most cells and prunes little — exactly the shape where reading the
    // lists was necessary anyway.
    val cells = probed.select(col("cell")).distinct().collect().map(_.get(0))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    assigned.filter(col("cell").isInCollection(cells))
      .join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("vec")).alias("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** Derive the PQ layer of a built index: `<prefix>_pq_codebook`
    * (j, code_id, csub, cnorm2 — numSub × numCodes rows, broadcast-sized)
    * and `<prefix>_pq_codes` (corpus_id, codes array, cell — PARTITIONED
    * BY cell like the inverted lists). The code table is the 4-bytes-per-
    * vector scan representation ([[Similarity.pqTopK]]'s compression
    * argument, persisted): [[searchPq]]'s candidate stage reads ONLY this
    * table's probed partitions, never the float lists; the float `_assign`
    * table is touched only by the exact rescore of `k × refine` candidate
    * rows per query. Sub-codebooks use the same deterministic lowest-id
    * seeding as the inline [[Similarity.ivfPqTopK]], so the indexed search
    * reproduces it bit-for-bit (spec-asserted). Derivation scans the
    * stored lists once; [[append]]-ed rows need a re-derive or an
    * analogous code append — the same frozen-artifact trade as the
    * codebook itself. */
  def buildPqCodes(
      spark: SparkSession,
      tablePrefix: String,
      numSub: Int = 4,
      numCodes: Int = 16): Unit = {
    val assign = spark.table(s"${tablePrefix}_assign")
    val c = assign.select(col("corpus_id"), col("vec").alias("cvec"))
    val (cb, codes, _) = Similarity.pqArtifacts(c, numSub, numCodes)
    cb.select(col("j"), col("code_id"), col("csub"), col("cnorm2"))
      .writeTo(s"${tablePrefix}_pq_codebook").using("parquet").createOrReplace()
    codes
      .groupBy(col("corpus_id"))
      .agg(array_sort(collect_list(struct(col("j"), col("code_id")))).alias("a"))
      .select(col("corpus_id"),
        transform(col("a"), x => x.getField("code_id")).alias("codes"))
      .join(assign.select(col("corpus_id"), col("cell")), Seq("corpus_id"))
      .repartition(col("cell"))
      .writeTo(s"${tablePrefix}_pq_codes")
      .using("parquet")
      .partitionedBy(col("cell"))
      .createOrReplace()
  }

  /** Fold a new batch's PQ codes in against the FROZEN stored sub-codebook
    * — the code-table sibling of [[append]], so the 4-byte scan layer
    * never goes stale. Call AFTER [[append]] (cells are read back from
    * the stored lists by id — one batch-sized join, the corpus is never
    * rescanned). Same `(appId, version)` writer-txn idempotence contract
    * as [[append]], so a streaming maintenance sink can thread one batchId
    * through both. */
  def appendPqCodes(
      spark: SparkSession,
      newRows: DataFrame,
      idCol: String,
      vecCol: String,
      tablePrefix: String,
      txn: Option[(String, Long)] = None): Unit = {
    val cb = spark.table(s"${tablePrefix}_pq_codebook")
    val subDim = cb.select(size(col("csub"))).head().getInt(0)
    val numSub = cb.agg(max(col("j"))).head().getInt(0) + 1
    val batch = newRows.select(col(idCol).alias("corpus_id"),
      col(vecCol).alias("cvec"))
    val cells = spark.table(s"${tablePrefix}_assign")
      .select(col("corpus_id"), col("cell"))
      .join(batch.select(col("corpus_id")), Seq("corpus_id"), "left_semi")
    val w = Similarity.pqEncode(batch, cb, numSub, subDim)
      .groupBy(col("corpus_id"))
      .agg(array_sort(collect_list(struct(col("j"), col("code_id")))).alias("a"))
      .select(col("corpus_id"),
        transform(col("a"), x => x.getField("code_id")).alias("codes"))
      .join(cells, Seq("corpus_id"))
      .repartition(col("cell"))
      .writeTo(s"${tablePrefix}_pq_codes")
    txn.fold(w) { case (app, v) =>
      w.option(graft.storage.GraftCatalog.TxnAppIdOption, app)
        .option(graft.storage.GraftCatalog.TxnVersionOption, v.toString)
    }.append()
  }

  /** Re-align the code table's cell layout after a [[refresh]] or
    * [[splitHotCells]] rewrote the assignments. The CODES themselves stay
    * valid (the sub-codebook quantizes vectors, not cells, and both
    * maintenance ops leave it frozen) — only the `cell` partition column
    * is stale, which would make [[searchPq]] prune the wrong partitions.
    * One batch: stored codes re-join the rewritten lists by id and the
    * table rewrites under the new layout. Never re-encodes a vector. */
  def refreshPqCells(spark: SparkSession, tablePrefix: String): Unit = {
    // materialize before the createOrReplace below reads-and-replaces the
    // same table
    val codes = spark.table(s"${tablePrefix}_pq_codes")
      .select(col("corpus_id"), col("codes"))
      .localCheckpoint(true)
    codes
      .join(spark.table(s"${tablePrefix}_assign")
        .select(col("corpus_id"), col("cell")), Seq("corpus_id"))
      .repartition(col("cell"))
      .writeTo(s"${tablePrefix}_pq_codes")
      .using("parquet")
      .partitionedBy(col("cell"))
      .createOrReplace()
  }

  /** IVFADC search from the STORED code tables: probe `nprobe` cells
    * against the stored centroids, ADC-scan only those cells' PQ codes
    * (a partition-pruned scan of the 4-byte representation — the probed
    * cells become an `isin` literal exactly as in [[search]]), then
    * exact-rescore the top `k × refine` candidates against the float
    * lists. Equals the inline [[Similarity.ivfPqTopK]] on the same corpus
    * bit-for-bit when the index was built with `kmeansIters = 0`. */
  def searchPq(
      spark: SparkSession,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      tablePrefix: String,
      k: Int,
      nprobe: Int = 4,
      refine: Int = 4): DataFrame = {
    val centroids = spark.table(s"${tablePrefix}_centroids")
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ps").desc, col("cell").asc)
    val probed = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qvec"),
        cosine(col("qvec"), col("centvec")).alias("ps"),
        col("centroid_id").alias("cell"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))
    val cells = probed.select(col("cell")).distinct().collect().map(_.get(0))
    val cb = spark.table(s"${tablePrefix}_pq_codebook")
    val subDim = cb.select(size(col("csub"))).head().getInt(0)
    // tombstones mask the CANDIDATE stage, so every one of the k × refine
    // rescore slots is spent on a live row
    val pairsIn = maskDeleted(spark,
      spark.table(s"${tablePrefix}_pq_codes"), tablePrefix)
      .filter(col("cell").isInCollection(cells))
      .select(col("corpus_id"), col("cell"),
        posexplode(col("codes")).as(Seq("j", "code_id")))
      .join(broadcast(cb), Seq("j", "code_id"))
      .join(broadcast(probed), Seq("cell"))
    Similarity.pqScore(pairsIn,
      spark.table(s"${tablePrefix}_assign")
        .select(col("corpus_id"), col("vec").alias("cvec")),
      k, refine, subDim)
  }

  private def catalogAndIdent(spark: SparkSession, table: String)
      : (graft.storage.GraftCatalog, org.apache.spark.sql.connector.catalog.Identifier) = {
    val parts = table.split('.')
    require(parts.length >= 2, s"expected a catalog-qualified table, got $table")
    val cat = spark.sessionState.catalogManager.catalog(parts.head)
      .asInstanceOf[graft.storage.GraftCatalog]
    (cat, org.apache.spark.sql.connector.catalog.Identifier.of(
      parts.drop(1).dropRight(1), parts.last))
  }

  /** Codebook refresh under drift — the rebuild every frozen-codebook ANN
    * store eventually owes, priced and gated like a production one:
    *
    *  1. re-train the codebook with k-means over a DETERMINISTIC
    *     hash-sample of the stored vectors (`samplePerMille` of the
    *     corpus — the fit cost is the sample, not the corpus);
    *  2. re-assign the whole corpus against the new codebook in ONE
    *     broadcast pass (this is the inherent cost of a refresh; the
    *     cheap daily path stays [[append]] against the frozen book);
    *  3. commit via write-audit-publish: both tables are rewritten on a
    *     quarantine branch, the audit proves row preservation AND
    *     search-result parity between the branch index and the inline
    *     funnel on the new codebook ([[Similarity.ivfTopK]]), and only a
    *     passing audit fast-forwards main — a failed audit leaves main
    *     byte-identical and drops the branch.
    *
    * The two merges publish back-to-back (a reader between them can pair
    * the new codebook with the old lists for one query — same class of
    * window as any two-table publish without a cross-table transaction;
    * the audited snapshots themselves are immutable branch heads).
    * Returns true iff the refresh published. */
  def refresh(
      spark: SparkSession,
      tablePrefix: String,
      numCentroids: Int = 16,
      kmeansIters: Int = 2,
      samplePerMille: Int = 100,
      auditQueries: Int = 8,
      auditK: Int = 5,
      auditNprobe: Int = 4,
      branch: String = "vidx_refresh"): Boolean = {
    require(samplePerMille > 0 && samplePerMille <= 1000,
      s"samplePerMille in (0, 1000], got $samplePerMille")
    val corpus = spark.table(s"${tablePrefix}_assign")
      .select(col("corpus_id"), col("vec"))
    val nRows = corpus.count()
    val sample = corpus.filter(
      pmod(xxhash64(col("corpus_id")), lit(1000)) < samplePerMille)
    val newBook = Similarity.kmeansCentroids(sample, "corpus_id", "vec",
      numCentroids, kmeansIters).select(col("centroid_id"), col("centvec"))
      .localCheckpoint(false)
    val reassigned = corpus.crossJoin(broadcast(newBook))
      .select(col("corpus_id"), col("vec"),
        struct(cosine(col("vec"), col("centvec")).alias("s"),
          col("centroid_id").alias("cid")).alias("sc"))
      .groupBy(col("corpus_id"))
      .agg(first(col("vec")).alias("vec"), max(col("sc")).alias("best"))
      .select(col("corpus_id"), col("vec"), col("best.cid").alias("cell"))
    val (catC, idC) = catalogAndIdent(spark, s"${tablePrefix}_centroids")
    val (catA, idA) = catalogAndIdent(spark, s"${tablePrefix}_assign")
    // a crashed prior refresh may have left the quarantine branch behind;
    // its staged state never published, so discarding it is the recovery
    catC.dropBranch(idC, branch); catC.createBranch(idC, branch)
    catA.dropBranch(idA, branch); catA.createBranch(idA, branch)
    try {
      newBook.writeTo(s"${tablePrefix}_centroids")
        .option(graft.storage.GraftCatalog.BranchOption, branch)
        .overwrite(lit(true))
      reassigned.repartition(col("cell"))
        .writeTo(s"${tablePrefix}_assign")
        .option(graft.storage.GraftCatalog.BranchOption, branch)
        .overwrite(lit(true))
      // AUDIT — against the branch heads, the exact snapshots that publish
      val bCent = spark.sql(
        s"SELECT * FROM ${tablePrefix}_centroids VERSION AS OF '$branch'")
      val bAssign = spark.sql(
        s"SELECT * FROM ${tablePrefix}_assign VERSION AS OF '$branch'")
      val rowsOk = bAssign.count() == nRows
      val qs = corpus.orderBy(col("corpus_id").asc).limit(auditQueries)
        .localCheckpoint(false)
      val indexed = searchOver(bCent, bAssign,
        qs.select(col("corpus_id").alias("query_id"), col("vec").alias("qvec")),
        auditK, auditNprobe)
      val inline = Similarity.ivfTopK(
        bAssign.select(col("corpus_id"), col("vec")), qs, "corpus_id", "vec",
        k = auditK, numCentroids = numCentroids, nprobe = auditNprobe,
        fitCentroids = Some(bCent))
      val parity = rowsOk &&
        indexed.exceptAll(inline).isEmpty && inline.exceptAll(indexed).isEmpty
      if (parity) {
        catC.mergeBranch(idC, branch)
        catA.mergeBranch(idA, branch)
      }
      catC.dropBranch(idC, branch); catA.dropBranch(idA, branch)
      parity
    } catch { case e: Throwable =>
      catC.dropBranch(idC, branch); catA.dropBranch(idA, branch); throw e
    }
  }

  /** Drift gate recommending a [[refresh]], wired through
    * [[graft.quality.Drift.histogramDrift]]: histogram the ASSIGNMENT-FIT
    * (each vector's best cosine against the frozen codebook, milli-scaled)
    * of a corpus sample vs the new batch on the shared exact grid, then
    * read the batch's LOW-FIT tail one-sidedly — fire when more than
    * `threshold` of the batch fits worse than all but `lowTail` of the
    * corpus. One-sided on purpose: a symmetric distribution-equality test
    * (chi-square over the full grid) fires forever on a MIXTURE corpus —
    * a batch drawn entirely from one well-covered region never matches
    * the corpus-wide mixture even though the codebook serves it
    * perfectly. Only "the batch fits WORSE than the corpus" means the
    * codebook is stale. Unmeasurable (either side empty) recommends the
    * refresh — a gate that can't measure must not wave data through. */
  def refreshRecommended(
      spark: SparkSession,
      newBatch: DataFrame,
      idCol: String,
      vecCol: String,
      tablePrefix: String,
      threshold: Double = 0.2,
      samplePerMille: Int = 100,
      lowTail: Double = 0.05): Boolean = {
    val centroids = spark.table(s"${tablePrefix}_centroids")
    def fitMilli(df: DataFrame, id: String, v: String): DataFrame = df
      .select(col(id).alias("__id"), col(v).alias("__v"))
      .crossJoin(broadcast(centroids))
      .groupBy(col("__id"))
      .agg(max(cosine(col("__v"), col("centvec"))).alias("__fit"))
      .select((col("__fit") * 1000).cast("long").alias("fit_milli"))
    val ref = fitMilli(spark.table(s"${tablePrefix}_assign").filter(
      pmod(xxhash64(col("corpus_id")), lit(1000)) < samplePerMille),
      "corpus_id", "vec")
    val cur = fitMilli(newBatch, idCol, vecCol)
    // ≤ 2^bits rows — the same bounded histogram Drift's chi-square reads
    val bins = graft.quality.Drift.histogramDrift(ref, cur, "fit_milli", bits = 6)
      .collect().sortBy(_.getAs[Long]("bin"))
    val nRef = bins.map(_.getAs[Long]("cnt_ref")).sum
    val nCur = bins.map(_.getAs[Long]("cnt_cur")).sum
    if (nRef == 0L || nCur == 0L) return true
    // the reference's lowTail line: smallest bin prefix holding >= lowTail
    // of the corpus; batch mass STRICTLY below that prefix's end fits
    // worse than (1 - lowTail) of the corpus
    var cumRef = 0L; var line = 0L
    val it = bins.iterator
    while (it.hasNext && cumRef < (lowTail * nRef)) {
      val r = it.next(); cumRef += r.getAs[Long]("cnt_ref"); line = r.getAs[Long]("bin")
    }
    val curLow = bins.filter(_.getAs[Long]("bin") < line)
      .map(_.getAs[Long]("cnt_cur")).sum
    curLow.toDouble / nCur > threshold
  }
}
