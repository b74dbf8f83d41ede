package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Expressions}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Storage-partitioned join (SPJ) support for [[graft.storage.GraftCatalog]]
  * tables: the scan reports `KeyGroupedPartitioning` over the table's hive
  * partition columns, with per-key file splits (`HasPartitionKey`). When
  * BOTH sides of an equi-join are catalog tables partitioned on the join
  * key and `spark.sql.sources.v2.bucketing.enabled` is set, Spark's
  * `EnsureRequirements` matches the two key-grouped distributions and plans
  * the join with NO shuffle exchange on either side — at 100 TB this turns
  * the nightly fact-fact join between co-partitioned tables from the
  * dominant shuffle into a zero-exchange zip of partitions (Spark's own SPJ
  * machinery, SPARK-37375). Whether a given scan reports the grouping at
  * all is governed by `spark.sql.graft.spj.preserveDataGrouping` — see
  * [[KeyedScan]] for the parallelism trade-off.
  *
  * Lives in the `org.apache.spark.sql` package tree because
  * [[ParquetScanBuilder]] (subclassed to keep ALL of the file source's
  * pushdown surface — catalyst filters, column pruning, aggregate
  * pushdown) is `private[sql]`-adjacent internal API.
  */
object Spj {

  /** Forwarder for [[graft.storage.GraftCatalog]]'s metadata-delete
    * proof: translate one catalyst predicate to a source Filter (None =
    * untranslatable — the caller must then treat the file as unprovable).
    * Lives here because DataSourceStrategy is `sql`-internal. */
  def translateFilter(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** A ScanBuilder over `table` whose built scan additionally reports
    * key-grouped partitioning with the given key expressions — one per
    * physical partition directory level, in order: `identity(col)` for
    * hive partitioning, `bucket(n, col)` for hash-bucketed layout. */
  def keyedScanBuilder(
      table: ParquetTable,
      options: CaseInsensitiveStringMap,
      keys: Seq[V2Expression]): ScanBuilder =
    new KeyedParquetScanBuilder(table, options, keys, Map.empty, "")

  /** [[keyedScanBuilder]] plus MANIFEST-STATS FILE SKIPPING: before filters
    * reach the parquet source, every pushed predicate is evaluated against
    * the per-file min/max/null stats the catalog recorded at commit time
    * ([[graft.storage.GraftCatalog]] `# stats:` manifest lines), and files
    * that provably contain no matching row are dropped from the scan's
    * file set entirely — no footer open, no task. `keys` may be empty
    * (unpartitioned table: pruning only). */
  def prunedScanBuilder(
      table: ParquetTable,
      options: CaseInsensitiveStringMap,
      keys: Seq[V2Expression],
      fileStats: Map[String, Map[String, graft.storage.GraftCatalog.ColStat]],
      tableDir: String): ScanBuilder =
    new KeyedParquetScanBuilder(table, options, keys, fileStats, tableDir)

  /** [[prunedScanBuilder]] plus the catalog's FILE BLOOM INDEX
    * (`_bloomidx-*` sidecars): equality predicates additionally probe each
    * file's per-column Bloom bitset, dropping files whose min/max range
    * straddles the probe value but whose bloom proves absence — the
    * point-lookup skipping min/max can't provide. */
  def prunedScanBuilder(
      table: ParquetTable,
      options: CaseInsensitiveStringMap,
      keys: Seq[V2Expression],
      fileStats: Map[String, Map[String, graft.storage.GraftCatalog.ColStat]],
      tableDir: String,
      fileBlooms: Map[String, Map[String, graft.storage.GraftCatalog.FileBloom]],
      eqDeletes: Option[EqDeleteSpec] = None,
      posDeletes: Map[String, Array[Long]] = Map.empty): ScanBuilder =
    new KeyedParquetScanBuilder(table, options, keys, fileStats, tableDir,
      fileBlooms, eqDeletes, posDeletes)
}

/** Delegates the full parquet pushdown surface (catalyst filters, column
  * pruning, aggregate pushdown) to a real [[ParquetScanBuilder]]; two
  * additions — `pushFilters` first prunes the FILE SET against manifest
  * column stats (rebuilding the delegate over the surviving files), and
  * `build()` wraps the scan with the partition-key report when `keys` are
  * present. (Composition, not inheritance: `ParquetScanBuilder.build()`
  * has a covariant `ParquetScan` return type that an override can't
  * widen.) Spark's push order — filters, then aggregates, then column
  * pruning, then build — makes the delegate swap in `pushFilters` safe:
  * nothing has been pushed to the old delegate yet. */
final class KeyedParquetScanBuilder(
    table: ParquetTable,
    options: CaseInsensitiveStringMap,
    keys: Seq[V2Expression],
    fileStats: Map[String, Map[String, graft.storage.GraftCatalog.ColStat]],
    tableDir: String,
    fileBlooms: Map[String, Map[String, graft.storage.GraftCatalog.FileBloom]] = Map.empty,
    eqDeletes: Option[EqDeleteSpec] = None,
    posDeletes: Map[String, Array[Long]] = Map.empty,
    /** Force the built scan's output to the REQUESTED field order even
      * with no deletes or metadata columns in play — the property a
      * partition-evolved union scan needs so its layout groups (whose
      * delegates place partition columns differently) concatenate
      * positionally ([[EvolvedUnionScan]]). The wrap is pass-through
      * when the orders already agree. */
    canonicalOutput: Boolean = false)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var servedTable: ParquetTable = table
  private var underlying = ParquetScanBuilder(
    table.sparkSession, table.fileIndex, table.schema, table.dataSchema, options)
  // set once pushFilters saw ANY predicate — manifest stats describe whole
  // files, so metadata-only aggregate answering is only sound filter-free
  private var sawFilters = false
  // a metadata-answered aggregate: the scan-side partial schema + its rows
  // (one per live group; one total when ungrouped), computed from manifest
  // stats (see ManifestAggregates)
  private var manifestAgg: Option[(StructType, Seq[InternalRow])] = None

  /** This group's partition-dir level names, for [[EvolvedScanBuilder]]'s
    * provably-absorbed residual test. */
  private[graftshim] def partitionColumnNames: Set[String] =
    table.fileIndex.partitionSchema.fieldNames.toSet

  /** Manifest stats are keyed by table-dir-relative paths. */
  private def relPath(p: String): String = {
    val prefix = tableDir.stripSuffix("/") + "/"
    if (p.startsWith(prefix)) p.stripPrefix(prefix)
    else if (p.contains(prefix)) p.substring(p.indexOf(prefix) + prefix.length)
    else p.substring(p.lastIndexOf('/') + 1)
  }

  // original pruning request, kept so the equality-delete wrapper can
  // hide the key columns it forced into the read
  private var requestedSchema: Option[StructType] = None

  /** `_file` / `_pos` metadata columns the query asked for — synthesized
    * by the wrapper scan, never handed to the parquet delegate. */
  private def metaRequested: Seq[String] =
    DeleteWrap.metaRequested(requestedSchema)

  override def pruneColumns(requiredSchema: StructType): Unit = {
    requestedSchema = Some(requiredSchema)
    // delete-key columns the query didn't ask for are forced into the
    // read (the probe needs them; build() projects them off), and `_pos`
    // / position-delete scoping rides parquet's native row-index
    // generation — one shared definition with the rewrite path
    underlying.pruneColumns(DeleteWrap.parquetSchema(
      requiredSchema, table.schema, eqDeletes, posDeletes))
  }
  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    if (filters.nonEmpty) sawFilters = true
    if ((fileStats.nonEmpty || fileBlooms.nonEmpty) && filters.nonEmpty) {
      val translated = filters.flatMap(e =>
        org.apache.spark.sql.execution.datasources.DataSourceStrategy
          .translateFilter(e, supportNestedPredicatePushdown = true))
      if (translated.nonEmpty) {
        val all = table.fileIndex.inputFiles
        val kept = all.filter { p =>
          val rel = relPath(p)
          graft.storage.FileStatsPruning.mayMatchAll(
            fileStats.getOrElse(rel, Map.empty),
            fileBlooms.getOrElse(rel, Map.empty), translated)
        }
        if (kept.length < all.length) {
          // every file pruned: serve ONE file — its footer stats reject all
          // rows anyway, and an empty-path ParquetTable cannot be built
          val served = if (kept.nonEmpty) kept.toSeq else all.take(1).toSeq
          servedTable = ParquetTable(table.name, table.sparkSession, options,
            served, table.userSpecifiedSchema, table.fallbackFileFormat)
          underlying = ParquetScanBuilder(servedTable.sparkSession,
            servedTable.fileIndex, servedTable.schema, servedTable.dataSchema,
            options)
        }
      }
    }
    underlying.pushFilters(filters)
  }
  override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    underlying.pushedFilters
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    // metadata-only answering first: filter-free min/max/count whose every
    // input file carries manifest stats never touches a footer — the scan
    // plans as a LocalTableScan of ONE pre-aggregated row. Partial-pushdown
    // protocol (supportCompletePushDown stays false), so Spark's final
    // aggregate folds that row with full-scan semantics.
    // pending equality/position deletes: neither manifest row counts nor
    // parquet footer counts see the deleted rows — no aggregate pushdown
    // of any kind until compaction folds the deletes in (the guard lives
    // in tryManifestAggregation; short-circuiting here keeps the footer
    // fallback from engaging too)
    if (eqDeletes.isDefined || posDeletes.nonEmpty) { manifestAgg = None; false }
    else if (tryManifestAggregation(aggregation)) true
    else underlying.pushAggregation(aggregation)
  }

  /** The manifest-stats half of [[pushAggregation]] alone: try to answer
    * the aggregate metadata-only, WITHOUT falling back to parquet footer
    * pushdown. Returns whether [[build]] will serve a [[ManifestAggScan]].
    * Exposed for [[EvolvedScanBuilder]], which needs an all-or-nothing
    * answer across its layout groups (a union scan has ONE read schema,
    * so either every group answers from its manifest stats or none may
    * push anything). */
  private[graftshim] def tryManifestAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (eqDeletes.isDefined || posDeletes.nonEmpty) { manifestAgg = None; return false }
    manifestAgg =
      if (sawFilters || fileStats.isEmpty ||
        table.sparkSession.conf
          .get("spark.sql.graft.manifestAggregates", "true") != "true") None
      else {
        val gb = aggregation.groupByExpressions.toSeq.map {
          case n: org.apache.spark.sql.connector.expressions.NamedReference
            if n.fieldNames.length == 1 => Some(n.fieldNames()(0))
          case _ => None
        }
        val pschema = table.fileIndex.partitionSchema
        if (gb.isEmpty)
          graft.storage.ManifestAggregates.tryAnswer(
            table.schema, table.fileIndex.inputFiles.toSeq.map(relPath),
            fileStats, aggregation).map { case (s, r) => s -> Seq(r) }
        else if (gb.forall(_.exists(pschema.fieldNames.contains))) {
          // GROUP BY partition columns: one row per live partition-value
          // group — the file index already carries each directory's typed
          // partition values, so grouping costs no I/O either
          val idx = gb.map(g => pschema.fieldIndex(g.get))
          val groups = table.fileIndex.listFiles(Nil, Nil)
            .groupBy(d => idx.map(i => d.values.get(i, pschema(i).dataType)))
            .toSeq.sortBy(_._1.toString)
            .map { case (k, ds) =>
              k -> ds.flatMap(_.files).map(f => relPath(f.getPath.toString))
            }
          graft.storage.ManifestAggregates.tryAnswerGrouped(
            table.schema, idx.map(pschema(_)), groups, fileStats, aggregation)
        } else None
      }
    manifestAgg.isDefined
  }

  private[graftshim] def clearManifestAggregation(): Unit = manifestAgg = None

  /** The manifest-answered result, for [[EvolvedScanBuilder]] to combine
    * per-group partials into one LocalScan. */
  private[graftshim] def manifestAggResult: Option[(StructType, Seq[InternalRow])] =
    manifestAgg

  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    if (manifestAgg.isDefined || eqDeletes.isDefined || posDeletes.nonEmpty) false
    else underlying.supportCompletePushDown(aggregation)

  override def build(): Scan = manifestAgg match {
    case Some((schema, rows)) => ManifestAggScan(table.name, schema, rows)
    case None =>
      if (eqDeletes.isDefined || posDeletes.nonEmpty || metaRequested.nonEmpty ||
          canonicalOutput) {
        // merge-on-read with pending deletes, and/or `_file`/`_pos`
        // metadata-column reads: wrap the parquet scan with the row-side
        // apply/synthesis ([[DeleteWrap.wrap]] — shared with the rewrite
        // path). No SPJ grouping through the wrapper — for deletes it's
        // part of the documented read tax compaction clears; metadata
        // reads are diagnostics, not join fast paths.
        DeleteWrap.wrap(underlying.build(),
          requestedSchema.getOrElse(table.schema),
          eqDeletes, posDeletes, tableDir)
      } else {
        val pschema = servedTable.fileIndex.partitionSchema
        underlying.build() match {
          case p: ParquetScan if pschema.nonEmpty && keys.nonEmpty =>
            KeyedScan(p, pschema, keys)
          case other => other
        }
      }
  }
}

/** A manifest-answered aggregate scan: pre-aggregated rows (one per
  * group), served driver-locally ([[org.apache.spark.sql.connector.read
  * .LocalScan]] plans as `LocalTableScan` — zero input files, zero
  * tasks). */
final case class ManifestAggScan(
    tableName: String, aggSchema: StructType, preRows: Seq[InternalRow])
  extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = aggSchema
  override def rows(): Array[InternalRow] = preRows.toArray
  override def description(): String =
    s"ManifestAggregates($tableName, ${aggSchema.fieldNames.mkString(", ")})"
}

/** Wraps a [[ParquetScan]]: re-plans its file splits so every split holds
  * files of a single partition VALUE (`HasPartitionKey` — the unit SPJ
  * aligns across join sides) and reports `KeyGroupedPartitioning` over the
  * partition columns. Reader creation, columnar support, and schemas all
  * delegate to the parquet scan's own machinery.
  *
  * Whether to key-group AT ALL is decided per scan, because Spark's
  * exec-side `groupPartitions` collapses a key's splits into ONE task for
  * every read of a key-reporting scan once `v2.bucketing.enabled` is on —
  * so an unconditional report caps plain-scan parallelism at the live
  * partition count (few date partitions → idle cluster, one task dragging
  * a whole skewed partition). `spark.sql.graft.spj.preserveDataGrouping`
  * (the same trade-off Iceberg exposes under that name):
  *
  *  - `auto` (default): report the grouping only when it cannot cost
  *    parallelism — the pruned partition-value count already reaches the
  *    cluster's default parallelism, or stock file planning produced no
  *    more splits than partition values anyway. The 100 TB fact table
  *    (thousands of date partitions) groups and joins shuffle-free; the
  *    20-partition dimension keeps per-file scan parallelism.
  *  - `true` / `false`: force the report on (SPJ-first workloads) / off.
  *
  * Within a grouped scan, each key's files are still packed into
  * stock-sized `FilePartition`s rather than one mega-split, so Spark's
  * partially-clustered SPJ (skew handling) can subdivide a hot key.
  *
  * Runtime-filtering note: Spark 4.1.2's `ParquetScan` does not implement
  * `SupportsRuntimeV2Filtering` (DSv2 dynamic partition pruning), so the
  * wrapper forfeits nothing there — pruning reaches the scan through the
  * pushed partition filters at plan time; this is a property of the file
  * source, not of the wrapping.
  */
final case class KeyedScan(
    delegate: ParquetScan,
    partitionSchema: StructType,
    keys: Seq[V2Expression])
  extends Scan with Batch with SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.internal.connector.SupportsMetadata {

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    delegate.estimateStatistics()
  // formatted-explain metadata (PushedFilters / PartitionFilters /
  // ReadSchema lines) comes straight from the parquet scan
  override def getMetaData(): Map[String, String] =
    delegate.getMetaData() +
      ("KeyGroupedBy" -> partitionSchema.fieldNames.mkString("[", ", ", "]"))
  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = s"KeyGrouped(${delegate.description()})"
  override def toBatch: Batch = this

  // Either passthrough partitions (key grouping declined or unexpected
  // split type — plan exactly as the parquet scan would) or per-key file
  // splits, each carrying its partition value.
  @transient private lazy val planned: Either[Array[InputPartition], Array[InputPartition]] = {
    val parts = delegate.toBatch.planInputPartitions()
    val mode = delegate.sparkSession.conf
      .get("spark.sql.graft.spj.preserveDataGrouping", "auto")
    // The partition key comes from each file's PATH, not from
    // PartitionedFile.partitionValues: those rows match the delegate's
    // READ partition schema, which is empty whenever column pruning
    // dropped the partition columns (`filter(v).count()`) and ALWAYS
    // empty for derived `__bucket_*` levels (never part of the table
    // schema) — projecting the full partition schema out of such a row
    // read undefined memory (an Unsafe crash on string columns, garbage
    // keys on primitives). The catalog's layout guarantees every dir
    // level is `name=value` with the value recoverable from the path
    // (GraftDataWriter), so the path IS the authoritative key; any file
    // that fails to parse declines grouping for the whole scan.
    if (mode == "false" || !parts.forall(_.isInstanceOf[FilePartition])) Left(parts)
    else {
      val fileParts = parts.map(_.asInstanceOf[FilePartition])
      val proj = UnsafeProjection.create(partitionSchema)
      val keysByFile = fileParts.flatMap(_.files).map { f =>
        f -> KeyedScan.pathPartitionKey(
          f.filePath.toString, partitionSchema, proj)
      }
      if (keysByFile.exists(_._2.isEmpty)) Left(parts)
      else {
      val grouped = keysByFile
        .groupBy(_._2.get).view.mapValues(_.map(_._1)).toMap
      if (!KeyedScan.shouldGroup(
        delegate.sparkSession, mode, grouped.size, parts.length)) Left(parts)
      else {
        // repack each key's (already range-split) files into splits no
        // larger than the stock planner's largest, so a skewed key stays
        // subdividable under partially-clustered SPJ
        val targetBytes = KeyedScan.largestSplitBytes(fileParts.iterator)
        // Deterministic split order (UnsafeRow bytes) — stable plans across runs.
        val sorted = grouped.toArray.sortBy(_._1.toString)
        var idx = -1
        Right(sorted.flatMap { case (key, fs) =>
          FilePartition
            .getFilePartitions(delegate.sparkSession, fs.toIndexedSeq, targetBytes)
            .map { fp =>
              idx += 1
              KeyedFilePartition(FilePartition(idx, fp.files), key): InputPartition
            }
        })
      }
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = planned.merge

  override def createReaderFactory(): PartitionReaderFactory = {
    val inner = delegate.toBatch.createReaderFactory()
    if (planned.isRight) UnwrapReaderFactory(inner) else inner
  }

  override def outputPartitioning(): Partitioning = planned match {
    case Right(splits) if splits.nonEmpty =>
      val numKeys = splits.iterator
        .map(_.asInstanceOf[KeyedFilePartition].key).toSet.size
      new KeyGroupedPartitioning(keys.toArray, numKeys)
    case _ => new UnknownPartitioning(0)
  }
}

object KeyedScan {
  import org.apache.spark.sql.types._

  /** The one key-grouping policy, shared by the uniform layout's
    * [[KeyedScan]] and the mixed layout's [[EvolvedUnionScan]]: group in
    * `auto` mode only when it cannot cost parallelism — the key count
    * already reaches the default parallelism, or stock planning produced
    * no more splits than keys anyway. */
  private[graftshim] def shouldGroup(
      spark: org.apache.spark.sql.SparkSession, mode: String,
      distinctKeys: Int, totalParts: Int): Boolean =
    mode == "true" ||
      distinctKeys >= spark.sparkContext.defaultParallelism ||
      totalParts <= distinctKeys

  /** The stock planner's largest split size — the repack bound that keeps
    * a skewed key subdividable under partially-clustered SPJ. */
  private[graftshim] def largestSplitBytes(
      parts: Iterator[org.apache.spark.sql.execution.datasources.FilePartition]): Long =
    math.max(1L, parts.map(_.files.map(_.length).sum).foldLeft(0L)(math.max))

  /** The file's partition key parsed from its PATH: one `name=value` dir
    * level per `partitionSchema` field, value decoding shared with the
    * stats path ([[graft.storage.GraftCatalog.parsePartValue]] — the one
    * inverse of the writer's dir encoding), projected to an UnsafeRow
    * via `proj` (create once per scan). None when any level is missing
    * or unparseable — the caller must then decline key grouping rather
    * than guess. */
  private[graftshim] def pathPartitionKey(
      path: String,
      partitionSchema: StructType,
      proj: UnsafeProjection): Option[UnsafeRow] = {
    val levels = path.split('/').dropRight(1)
      .filter(_.contains('='))
      .map { seg =>
        val i = seg.indexOf('=')
        seg.substring(0, i) -> seg.substring(i + 1)
      }.toMap
    val values = new Array[Any](partitionSchema.length)
    var ok = true
    partitionSchema.fields.zipWithIndex.foreach { case (f, i) =>
      levels.get(f.name)
        .flatMap(raw => graft.storage.GraftCatalog.parsePartValue(raw, f.dataType)) match {
        case Some(v) => values(i) = v
        case None => ok = false
      }
    }
    if (!ok) None
    else Some(proj(new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(values)).copy())
  }
}

/** The catalog-exposed `bucket(n, col)` function backing GraftCatalog's
  * hash-bucketed storage layout. Spark resolves a scan's `bucket`
  * transform against the table's `FunctionCatalog` to build the
  * `TransformExpression` that SPJ compares across join sides — two scans
  * co-partition when their bound functions share a canonical name and
  * bucket count. `produceResult` implements EXACTLY the writer's routing
  * arithmetic (`pmod(murmur3_hash(col, seed=42), n)`,
  * `GraftDataWriter`), so if Spark ever evaluates the function (e.g.
  * `v2.bucketing.shuffle.enabled` shuffling an unbucketed side into this
  * layout) the computed buckets agree with the files on disk.
  */
object GraftBucketFunction
  extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.types.{DataType, IntegerType}

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3(col, 42), n) — graft storage bucketing"

  override def bind(inputType: StructType)
      : org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, col), got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket count must be INT, got ${inputType.fields(0).dataType.catalogString}")
    GraftBoundBucket(inputType.fields(1).dataType)
  }

  final case class GraftBoundBucket(keyType: DataType)
    extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${keyType.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      // null key: the writer's Murmur3Hash expression leaves the seed
      // untouched for null children — mirror that, not an NPE
      val h =
        if (input.isNullAt(1)) 42
        else org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(input.get(1, keyType), keyType, 42L).toInt
      val m = h % n
      if (m < 0) m + n else m
    }
  }
}

/** One split = one partition value (all its files). `partitionKey` is what
  * Spark groups and aligns across the two join sides. */
final case class KeyedFilePartition(delegate: FilePartition, key: UnsafeRow)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

/** The parquet reader factory only understands [[FilePartition]]; unwrap
  * the keyed split before delegating. */
final case class UnwrapReaderFactory(inner: PartitionReaderFactory)
  extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case k: KeyedFilePartition => k.delegate
    case o => o
  }
  override def createReader(p: InputPartition): org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    inner.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition): org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    inner.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))
}
