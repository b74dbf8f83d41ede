package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** GROUP-BASED (copy-on-write) row-level operations — what makes SQL
  * `UPDATE` and `MERGE INTO` work against the catalog (Spark's
  * `SupportsRowLevelOperations` contract; `DELETE` keeps its faster
  * [[GraftTable]] `SupportsDelete` path whenever the condition translates,
  * via Spark's own metadata-only-delete optimization, and falls back here
  * only for untranslatable predicates).
  *
  * The shape is Iceberg's copy-on-write without runtime filtering:
  *
  *  - the REWRITE SCAN receives the command's condition as pushed filters
  *    and uses them for FILE-set pruning only (manifest stats + the bloom
  *    index — the same machinery every read gets). It claims NOTHING as
  *    exactly pushed, so Spark re-evaluates the condition row-side and
  *    every surviving file is read WHOLE — copy-on-write must see the
  *    non-matching rows of touched files too;
  *  - the scan records the exact file set it planned on the shared
  *    operation instance;
  *  - the WRITE stages replacement files through the catalog's own
  *    [[GraftWriterFactory]] (hive partition routing, bucket routing,
  *    target file sizing — rewritten rows land exactly like written
  *    rows), and its commit publishes `prior − scanned + staged` as one
  *    OCC'd snapshot: the old state stays time-travelable, a conflicting
  *    writer surfaces loudly.
  *
  * An UPDATE with a pushable WHERE therefore rewrites only the files that
  * may hold matches; a MERGE (whose ON condition is not a static filter)
  * rewrites the table's live set — the documented copy-on-write
  * worst case, correct and loud rather than subtly partial. */
private[storage] final class GraftRowLevelOperation(
    dir: String,
    meta: GraftTableMeta,
    tableName: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** Table-dir-relative files the rewrite scan planned — what commit
    * replaces. Set exactly once, when the scan is built. */
  @volatile private[storage] var scannedFiles: Seq[String] = Seq.empty

  /** Snapshot id the rewrite scan planned against. Commit publishes at
    * exactly this+1 so a concurrent commit that lands between scan and
    * commit fails the exclusive create instead of being silently folded
    * into a manifest computed from stale rows (e.g. resurrecting rows a
    * concurrent DELETE removed). -1 until the scan is built. */
  @volatile private[storage] var scanSnapshot: Long = -1L

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"GraftCowOperation($cmd, $tableName)"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CowScanBuilder(this, dir, meta, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new CowBatchWrite(GraftRowLevelOperation.this, dir, meta,
            info.queryId())
      }
    }
}

/** The rewrite-side scan builder: prunes the FILE set against pushed
  * predicates (stats + blooms) but never lets a predicate reach row or
  * row-group filtering — `pushedFilters()` stays empty, so Spark keeps
  * the whole condition post-scan and touched files are read in full. */
private[storage] final class CowScanBuilder(
    op: GraftRowLevelOperation,
    dir: String,
    meta: GraftTableMeta,
    options: CaseInsensitiveStringMap)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters {

  private val spark = SparkSession.active
  private val root = new Path(dir)
  private val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val scanSnapshot: Long = GraftCatalog.latestSnapshot(fs, root)
  private val live: Seq[String] = GraftCatalog
    .readManifest(fs, root, scanSnapshot)
    .getOrElse(GraftCatalog.listDataFiles(fs, root))
  private var kept: Seq[String] = live
  private var requiredSchema: Option[StructType] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = Some(requiredSchema)

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    val translated = filters.flatMap(
      org.apache.spark.sql.graftshim.Spj.translateFilter)
    if (translated.nonEmpty) {
      val latest = GraftCatalog.latestSnapshot(fs, root)
      val stats = GraftCatalog.readStats(fs, root, latest)
      val blooms = GraftCatalog.readBloomIndex(fs, root)
      // virtual partition-column stats from each file's dir path: an
      // UPDATE scoped to a partition rewrites that partition's files only
      kept = live.filter(f => FileStatsPruning.mayMatchAll(
        GraftCatalog.partitionPathStats(f, meta) ++ stats.getOrElse(f, Map.empty),
        blooms.getOrElse(f, Map.empty), translated))
    }
    filters // nothing claimed: the condition must run row-side, post-scan
  }

  override def pushedFilters()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  override def build(): Scan = {
    op.scannedFiles = kept
    op.scanSnapshot = scanSnapshot
    val prefix = dir.stripSuffix("/") + "/"
    val paths =
      if (kept.nonEmpty) kept.map(f => s"$prefix$f")
      else {
        // empty rewrite set: serve the hidden always-empty dir so the
        // scan can build; commit then replaces nothing
        val empty = new Path(root, "_empty")
        fs.mkdirs(empty)
        Seq(empty.toString)
      }
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("basePath", dir))
    val pt = ParquetTable(s"cow-rewrite", spark, opts, paths,
      Some(meta.schema), classOf[ParquetFileFormat])
    val underlying = ParquetScanBuilder(
      spark, pt.fileIndex, pt.schema, pt.dataSchema, opts)
    requiredSchema.foreach(underlying.pruneColumns)
    underlying.build()
  }
}

/** Aligns the physical rewrite rows with the table schema: Spark's
  * group-based `MergeRows`/update plans PREPEND bookkeeping columns
  * (`__row_operation`) that reach the physical write even though the
  * logical write schema is the bare table schema — verified empirically
  * on 4.1 (rows arrive as `[__row_operation, tableCols…]`). The wrapper
  * measures the arity surplus on the first row and projects the TRAILING
  * table-schema fields; a surplus of zero passes rows through untouched,
  * so the wrapper is future-proof against Spark dropping the column. */
private[storage] final case class CowProjectingFactory(
    inner: DataWriterFactory, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    val w = inner.createWriter(partitionId, taskId)
    new org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      private var proj: org.apache.spark.sql.catalyst.expressions.UnsafeProjection = _
      private var passThrough = false
      override def write(r: org.apache.spark.sql.catalyst.InternalRow): Unit = {
        if (proj == null && !passThrough) {
          val surplus = r.numFields - schema.fields.length
          require(surplus >= 0,
            s"row-level write: row has ${r.numFields} fields, table needs " +
              s"${schema.fields.length}")
          if (surplus == 0) passThrough = true
          else {
            import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
            proj = UnsafeProjection.create(schema.fields.zipWithIndex.map {
              case (f, i) => BoundReference(surplus + i, f.dataType, f.nullable)
            }.toIndexedSeq)
          }
        }
        w.write(if (passThrough) r else proj(r))
      }
      override def commit(): WriterCommitMessage = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
  }
}

/** Publishes the rewrite: stage through the catalog writer, promote, and
  * commit `prior − scanned + staged` under the usual exclusive-create
  * OCC. Mirrors [[GraftBatchWrite]]'s promotion discipline (fail the
  * commit rather than silently lose a staged file; orphans of a failed
  * run are vacuum's to reclaim). */
private[storage] final class CowBatchWrite(
    op: GraftRowLevelOperation,
    dir: String,
    meta: GraftTableMeta,
    queryId: String) extends BatchWrite {

  private val stagingRel = s"_staging-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val inner = GraftWriterFactory(s"$dir/$stagingRel", meta.schema, meta.partitionCols,
      GraftCatalog.parquetWriteConfs(SparkSession.active), queryId,
      meta.properties.get(GraftCatalog.TargetFileRowsProp)
        .flatMap(_.toLongOption).filter(_ > 0).getOrElse(0L),
      meta.bucket)
    CowProjectingFactory(inner, meta.schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    // Commit against the snapshot the rewrite scan PLANNED on, not the
    // current latest: `prior − scanned + staged` is only meaningful
    // relative to the scanned state, so a commit that landed in between
    // must surface as an exclusive-create conflict rather than be folded
    // into a manifest computed from stale rows.
    val scanSnap = op.scanSnapshot
    require(scanSnap >= 0,
      "row-level commit without a planned rewrite scan")
    val prior = GraftCatalog.readManifest(fs, root, scanSnap)
      .getOrElse(GraftCatalog.listDataFiles(fs, root))
    val staged = messages.flatMap(_.asInstanceOf[GraftCommitMessage].files)
    staged.foreach { case (part, file) =>
      val dst = if (part.isEmpty) root else new Path(root, part)
      fs.mkdirs(dst)
      val src = if (part.isEmpty) new Path(root, s"$stagingRel/$file")
                else new Path(root, s"$stagingRel/$part/$file")
      val target = new Path(dst, file)
      if (fs.exists(target) || !fs.rename(src, target))
        throw new java.io.IOException(
          s"row-level commit failed: cannot promote $src to $target")
    }
    fs.delete(new Path(root, stagingRel), true)
    val stagedRel = staged.map { case (p, f) => if (p.isEmpty) f else s"$p/$f" }
    val scanned = op.scannedFiles.toSet
    val live = prior.filterNot(scanned) ++ stagedRel
    GraftCatalog.writeSnapshotAt(fs, root, scanSnap + 1, live.distinct,
      GraftCatalog.readTxns(fs, root, scanSnap))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root, stagingRel), true)
  }
}
