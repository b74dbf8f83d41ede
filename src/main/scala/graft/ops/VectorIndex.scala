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

  /** Top-k by exact cosine inside the `nprobe` nearest cells per query,
    * served from the stored inverted lists. Output schema matches
    * [[Similarity.ivfTopK]]: (query_id, rank, corpus_id, score). */
  def search(
      spark: SparkSession,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      tablePrefix: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    val centroids = spark.table(s"${tablePrefix}_centroids")
    val assigned = spark.table(s"${tablePrefix}_assign")
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
}
