package org.apache.spark.sql.graftshim

import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Partition-evolution read path for [[graft.storage.GraftCatalog]] tables.
  *
  * Partition evolution (`write.partition-by`) is a metadata-only commit:
  * existing files keep the directory layout they were written under, new
  * files land under the current spec, and ONE table serves both. Spark's
  * file source cannot do that in one scan — hive-style partition
  * inference over mixed-depth directories fails outright — so an evolved
  * read plans one parquet delegate PER LAYOUT GROUP (each group is
  * internally uniform, so inference, pushdown, and file skipping all work
  * unchanged per group) and unions them:
  *
  *  - every group is pruned and filtered identically (a filter on a
  *    column reaches one group as a partition-directory prune and another
  *    as a parquet data filter — each delegate routes it by ITS layout);
  *  - every group's scan is wrapped to the SAME canonical output order
  *    (the request order — [[DeleteWrap.wrap]]'s contract, which also
  *    keeps pending merge-on-read deletes applying per group), so the
  *    union is pure partition concatenation with per-group reader
  *    factories riding inside their partitions;
  *  - manifest-stats/bloom file skipping stays per-file and
  *    layout-agnostic; aggregate pushdown and SPJ key grouping are
  *    declined on mixed layouts (re-enabled once a rewrite migrates all
  *    files to the current spec — any rewrite writes the current spec).
  *
  * At 100 TB this is the property that makes re-partitioning a table
  * OPERATIONALLY FREE: changing the spec costs one metadata commit, not a
  * table rewrite; the old data migrates incrementally as compaction and
  * row-level DML touch it. (Iceberg's partition-spec-evolution semantics,
  * re-expressed over the catalog's hive-layout files.)
  */
object Evolved {

  def scanBuilder(
      tables: Seq[ParquetTable],
      options: CaseInsensitiveStringMap,
      tableSchema: StructType,
      fileStats: Map[String, Map[String, graft.storage.GraftCatalog.ColStat]],
      tableDir: String,
      fileBlooms: Map[String, Map[String, graft.storage.GraftCatalog.FileBloom]],
      eqDeletes: Option[EqDeleteSpec],
      posDeletes: Map[String, Array[Long]],
      keys: Seq[org.apache.spark.sql.connector.expressions.Expression] = Seq.empty,
      keySchema: StructType = new StructType()): ScanBuilder =
    new EvolvedScanBuilder(tables, options, tableSchema, fileStats,
      tableDir, fileBlooms, eqDeletes, posDeletes, keys, keySchema)
}

/** Fans every pushdown call out to one [[KeyedParquetScanBuilder]] per
  * layout group (keys empty — no SPJ report across mixed layouts; canonical
  * output forced so the groups union positionally). Filters are returned
  * as residuals in full: each delegate still uses them for file skipping
  * and parquet row-group pruning, and Spark re-evaluating them post-scan
  * is the safe spelling when two groups push different subsets. */
final class EvolvedScanBuilder(
    tables: Seq[ParquetTable],
    options: CaseInsensitiveStringMap,
    tableSchema: StructType,
    fileStats: Map[String, Map[String, graft.storage.GraftCatalog.ColStat]],
    tableDir: String,
    fileBlooms: Map[String, Map[String, graft.storage.GraftCatalog.FileBloom]],
    eqDeletes: Option[EqDeleteSpec],
    posDeletes: Map[String, Array[Long]],
    unionKeys: Seq[org.apache.spark.sql.connector.expressions.Expression] = Seq.empty,
    unionKeySchema: StructType = new StructType())
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  require(tables.nonEmpty, "evolved scan: no layout groups")

  private val groups: Seq[KeyedParquetScanBuilder] = tables.map(t =>
    new KeyedParquetScanBuilder(t, options, Seq.empty, fileStats, tableDir,
      fileBlooms, eqDeletes, posDeletes, canonicalOutput = true))

  override def pruneColumns(requiredSchema: StructType): Unit =
    groups.foreach(_.pruneColumns(requiredSchema))

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    // residual = the UNION of the groups' residuals, NARROWED only for
    // predicates in the provably-absorbed class: a predicate each
    // delegate absorbed exactly (its column is a partition-dir level in
    // EVERY layout — hive pruning is exact, unlike parquet's row-group
    // pruning) needs no post-scan re-evaluation; one that any group
    // still serves best-effort (a data filter there) stays residual for
    // all, because the union scan has one FilterExec above it.
    //
    // "Absent from every group's residual" alone is NOT proof of
    // absorption: Spark 4.1.2's FileScanBuilder classifies a partition-
    // column predicate it cannot evaluate during pruning (PythonUDF —
    // and, defensively, anything subquery-shaped) as a partition filter
    // — omitting it from the returned residual — while ALSO excluding it
    // from the stored partition filters, so it would neither prune nor
    // re-evaluate. Dropping such a predicate here would silently
    // un-filter the query. (Scalar-subquery predicates are excluded from
    // pushdown upstream by V2ScanRelationPushDown and stay residual
    // regardless — A/B-verified in PartitionEvolutionSpec — but the
    // guard keeps them out of the drop set anyway rather than depend on
    // that upstream behavior.) So a filter leaves the residual only when
    // it is ALSO deterministic, subquery-free, PythonUDF-free, and
    // references only columns that are dir levels in every group — the
    // exact class the per-group hive pruning evaluates exactly.
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    val residuals = groups.map(_.pushFilters(filters))
    val universalDirCols = groups.map(_.partitionColumnNames)
      .reduce(_ intersect _)
    def provablyAbsorbed(
        f: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      f.deterministic &&
        !SubqueryExpression.hasSubquery(f) &&
        !f.exists(e => e.getClass.getName.endsWith("PythonUDF")) &&
        f.references.nonEmpty &&
        f.references.forall(a => universalDirCols.contains(a.name))
    filters.filter(f =>
      residuals.exists(_.exists(_.semanticEquals(f))) || !provablyAbsorbed(f))
  }

  // for explain honesty report the predicates EVERY group pushed —
  // structural equality (V2 connector expressions implement value
  // equals/hashCode over name + children), not string rendering
  override def pushedFilters()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = {
    val perGroup = groups.map(_.pushedFilters().toSet)
    groups.head.pushedFilters()
      .filter(p => perGroup.forall(_.contains(p)))
  }

  /** Metadata-only aggregate pushdown across a MIXED layout: push the
    * aggregate into EACH layout group's manifest-stats answering and
    * serve the concatenated per-group partial rows as one LocalScan —
    * Spark's final aggregate (partial-pushdown protocol,
    * [[supportCompletePushDown]] stays false) then combines the partials
    * with full-scan semantics: count → sum of group counts, min/max →
    * fold over group bounds.
    *
    * When only SOME groups can answer (the common evolved shape: GROUP BY
    * the new partition column, which legacy flat files carry as a DATA
    * column, not a dir level), the answer goes HYBRID instead of
    * declining outright: stats-capable groups contribute their manifest
    * partials as pre-computed rows (zero input files), and ONLY the
    * failing group(s) are scanned — with the partial aggregate folded
    * inside each partition reader, so the scan emits at most one row per
    * group per partition and Spark's final aggregate combines both kinds
    * of partials identically. At 100 TB this is the difference between
    * scanning a legacy sliver and scanning the whole table while a
    * migration is mid-flight. The hybrid engages only for shapes the
    * row-side fold can reproduce exactly (count(*) / count(col) /
    * min(col) / max(col), plain-column group-bys — the same functions the
    * manifest path serves); anything else, or no group answering at all,
    * declines to the plain union data scan. Filters and pending
    * merge-on-read deletes disable every group's manifest answering
    * (per-group guards), which disables the hybrid with them. */
  private var aggAnswered = false
  private var hybridShape: Option[(Seq[String], Seq[AggFoldSpec.Agg])] = None

  private def singleCol(
      e: org.apache.spark.sql.connector.expressions.Expression): Option[String] = e match {
    case n: org.apache.spark.sql.connector.expressions.NamedReference
      if n.fieldNames.length == 1 => Some(n.fieldNames()(0))
    case _ => None
  }

  /** The aggregation re-expressed for the row-side fold, when every
    * piece is a shape the fold can reproduce with full-scan semantics. */
  private def scannableShape(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(Seq[String], Seq[AggFoldSpec.Agg])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    val gbs = agg.groupByExpressions.toSeq.map(singleCol)
    if (gbs.exists(_.isEmpty)) return None
    val aggs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(AggFoldSpec.Agg(AggFoldSpec.CountStar, None))
      case c: Count if !c.isDistinct =>
        singleCol(c.column).map(col => AggFoldSpec.Agg(AggFoldSpec.Count, Some(col)))
      case m: Min =>
        singleCol(m.column).map(col => AggFoldSpec.Agg(AggFoldSpec.Min, Some(col)))
      case m: Max =>
        singleCol(m.column).map(col => AggFoldSpec.Agg(AggFoldSpec.Max, Some(col)))
      case _ => None
    }
    if (aggs.exists(_.isEmpty)) None else Some((gbs.map(_.get), aggs.map(_.get)))
  }

  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    hybridShape = None
    val answered = groups.map(_.tryManifestAggregation(aggregation))
    aggAnswered = answered.forall(identity)
    if (aggAnswered) return true
    if (answered.exists(identity)) {
      // partial answering: serve the capable groups from their manifests
      // and scan only the rest — if the fold can reproduce the shape
      scannableShape(aggregation) match {
        case s @ Some(_) => hybridShape = s; return true
        case None => ()
      }
    }
    groups.foreach(_.clearManifestAggregation())
    false
  }
  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    false

  override def build(): Scan =
    if (aggAnswered) {
      // every group answered: one pre-aggregated LocalScan (zero input
      // files, zero tasks), rows = the groups' partials concatenated
      val parts = groups.map(_.manifestAggResult.get)
      ManifestAggScan(tables.head.name, parts.head._1, parts.flatMap(_._2))
    } else hybridShape match {
      case Some((gbCols, aggSpecs)) =>
        val (answeredG, scannedG) = groups.partition(_.manifestAggResult.isDefined)
        val aggSchema = answeredG.head.manifestAggResult.get._1
        val localRows = answeredG.flatMap(_.manifestAggResult.get._2)
        // the scanned groups read ONLY the fold's input columns: group-by
        // columns first, then aggregate arguments (deduplicated)
        val inputCols = (gbCols ++ aggSpecs.flatMap(_.col)).distinct
        val inputSchema = StructType(
          inputCols.map(c => tableSchema(tableSchema.fieldIndex(c))))
        val spec = AggFoldSpec(
          groupIdx = gbCols.map(inputCols.indexOf).toArray,
          groupDts = gbCols.map(c =>
            tableSchema(tableSchema.fieldIndex(c)).dataType).toArray,
          aggs = aggSpecs.map { a =>
            val idx = a.col.map(inputCols.indexOf).getOrElse(-1)
            val dt = a.col.map(c =>
              tableSchema(tableSchema.fieldIndex(c)).dataType).orNull
            AggFoldSpec.Bound(a.kind, idx, dt)
          }.toArray)
        scannedG.foreach { g => g.pruneColumns(inputSchema) }
        HybridAggScan(tables.head.name, aggSchema, localRows,
          scannedG.map(_.build()), spec)
      case None =>
        EvolvedUnionScan(groups.map(_.build()), unionKeys, unionKeySchema)
    }
}

/** Concatenates the layout groups' scans: same read schema by
  * construction (every group is canonically wrapped), partitions tagged
  * with their group's reader factory.
  *
  * When `keys` is non-empty — the key-deriving dir levels are INVARIANT
  * across every live layout (decided by the catalog) — the union reports
  * `KeyGroupedPartitioning` and re-packs each group's file splits per key
  * value parsed from the files' paths, so an equi-join on those keys runs
  * as a storage-partitioned join with ZERO shuffle even mid-migration:
  * Spark's exec-side grouping merges same-key splits ACROSS layout groups
  * into one task. Any unparsable path, non-file split, or a
  * `preserveDataGrouping` decline falls back to plain concatenation
  * (UnknownPartitioning) — never a wrong key. */
final case class EvolvedUnionScan(
    scans: Seq[Scan],
    keys: Seq[org.apache.spark.sql.connector.expressions.Expression] = Seq.empty,
    keySchema: StructType = new StructType())
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  override def readSchema(): StructType = scans.head.readSchema()
  override def toBatch: Batch = this
  override def description(): String =
    s"PartitionEvolvedUnion(${scans.size} layouts" +
      (if (keys.nonEmpty) s", keyedBy=[${keySchema.fieldNames.mkString(", ")}]"
       else "") + ": " +
      scans.map(_.description()).mkString(" | ") + ")"

  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val parts = scans.map {
      case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        Some(s.estimateStatistics())
      case _ => None
    }
    new org.apache.spark.sql.connector.read.Statistics {
      private def sum(
          f: org.apache.spark.sql.connector.read.Statistics => java.util.OptionalLong)
          : java.util.OptionalLong = {
        val vals = parts.map(_.map(f))
        if (vals.exists(v => v.isEmpty || !v.get.isPresent))
          java.util.OptionalLong.empty()
        else java.util.OptionalLong.of(vals.map(_.get.getAsLong).sum)
      }
      override def sizeInBytes(): java.util.OptionalLong = sum(_.sizeInBytes())
      override def numRows(): java.util.OptionalLong = sum(_.numRows())
    }
  }

  // Each group's partitions are planned ONCE; the keyed attempt re-packs
  // them per key value (the file's path is the authoritative key — the
  // same parse, decline-on-failure contract, grouping heuristic, and
  // split-size bound as the uniform layout's KeyedScan), and a decline
  // falls back to tagging the already-planned splits.
  @transient private lazy val keyedAndPlanned
      : (Boolean, Array[InputPartition]) = {
    import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
    import org.apache.spark.sql.execution.datasources.FilePartition
    val perGroup = scans.map { s =>
      val b = s.toBatch
      (b.planInputPartitions(), b.createReaderFactory())
    }
    def plain: Array[InputPartition] = perGroup.toArray.flatMap {
      case (parts, f) => parts.map(p => EvolvedPartition(p, f): InputPartition)
    }
    // conf is read from the PLANNING session (this lazy val forces on the
    // driver during planning) — the union has no single delegate session
    val spark = org.apache.spark.sql.SparkSession.active
    val mode = spark.conf
      .get("spark.sql.graft.spj.preserveDataGrouping", "auto")
    if (keys.isEmpty || mode == "false" ||
      !perGroup.forall(_._1.forall(_.isInstanceOf[FilePartition])))
      (false, plain)
    else {
      val proj = UnsafeProjection.create(keySchema)
      val totalParts = perGroup.map(_._1.length).sum
      // (key, group factory, file) for every file of every group
      val keyedFiles = perGroup.flatMap { case (parts, factory) =>
        parts.flatMap(_.asInstanceOf[FilePartition].files).map { f =>
          (KeyedScan.pathPartitionKey(f.filePath.toString, keySchema, proj),
            factory, f)
        }
      }
      if (keyedFiles.exists(_._1.isEmpty)) (false, plain)
      else {
        val grouped = keyedFiles.groupBy(_._1.get)
        if (!KeyedScan.shouldGroup(spark, mode, grouped.size, totalParts))
          (false, plain)
        else {
          val targetBytes = KeyedScan.largestSplitBytes(
            perGroup.iterator.flatMap(_._1.iterator)
              .map(_.asInstanceOf[FilePartition]))
          var idx = -1
          (true, grouped.toArray.sortBy(_._1.toString).flatMap {
            case (key, entries) =>
              // within a key, splits stay group-homogeneous (one reader
              // factory per split); Spark's exec-side grouping merges the
              // key's splits across groups into one task
              entries.groupBy(_._2).toSeq.flatMap { case (factory, es) =>
                FilePartition.getFilePartitions(
                  spark, es.map(_._3).toIndexedSeq, targetBytes)
                  .map { fp =>
                    idx += 1
                    EvolvedKeyedPartition(
                      FilePartition(idx, fp.files), factory, key)
                      : InputPartition
                  }
              }
          })
        }
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    keyedAndPlanned._2
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    keyedAndPlanned match {
      case (true, splits) if splits.nonEmpty =>
        val numKeys = splits.iterator
          .map(_.asInstanceOf[EvolvedKeyedPartition].key).toSet.size
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(keys.toArray, numKeys)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }
  override def createReaderFactory(): PartitionReaderFactory =
    EvolvedUnionReaderFactory
}

/** One layout group's per-key file split: carries the group's reader
  * factory (layouts differ, so readers cannot be shared) and the key
  * value SPJ groups by. */
final case class EvolvedKeyedPartition(
    inner: org.apache.spark.sql.execution.datasources.FilePartition,
    factory: PartitionReaderFactory,
    key: org.apache.spark.sql.catalyst.expressions.UnsafeRow)
  extends InputPartition
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow = key
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** The row-side fold a [[HybridAggScan]] ships to its scanned groups'
  * partition readers: which input columns are group keys, and how each
  * aggregate folds. Mirrors the exact function set the manifest path
  * serves ([[graft.storage.ManifestAggregates]]), so hybrid partials and
  * manifest partials are interchangeable under Spark's final aggregate. */
final case class AggFoldSpec(
    groupIdx: Array[Int],
    groupDts: Array[org.apache.spark.sql.types.DataType],
    aggs: Array[AggFoldSpec.Bound]) extends Serializable

object AggFoldSpec {
  sealed trait Kind extends Serializable
  case object CountStar extends Kind
  case object Count extends Kind
  case object Min extends Kind
  case object Max extends Kind
  /** One aggregate as (kind, argument column) before input-index binding. */
  final case class Agg(kind: Kind, col: Option[String])
  /** One aggregate bound to its input-row slot (`idx` = -1 for count(*)). */
  final case class Bound(
      kind: Kind, idx: Int,
      dt: org.apache.spark.sql.types.DataType) extends Serializable
}

/** Hybrid manifest/data aggregate over a mixed layout: the pre-computed
  * manifest partials of the stats-capable groups ride in ONE extra
  * partition; every other partition is a scanned group's file split whose
  * reader folds the partial aggregate map-side (at most one output row
  * per group key per partition). Spark's final aggregate — already
  * planned by the partial-pushdown protocol — combines both. */
final case class HybridAggScan(
    tableName: String,
    aggSchema: StructType,
    localRows: Seq[org.apache.spark.sql.catalyst.InternalRow],
    dataScans: Seq[Scan],
    fold: AggFoldSpec) extends Scan with Batch {

  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"HybridManifestAggregates($tableName, metadataPartials=${localRows.size}, " +
      s"scannedGroups=${dataScans.size}: " +
      dataScans.map(_.description()).mkString(" | ") + ")"

  @transient private lazy val planned: Array[InputPartition] = {
    val scanned = dataScans.toArray.flatMap { s =>
      val b = s.toBatch
      val f = b.createReaderFactory()
      b.planInputPartitions().map(p => HybridFoldPartition(p, f, fold): InputPartition)
    }
    // manifest partials: copy defensively — GenericInternalRows may share
    // structure with driver-side state, and the partition serializes
    scanned :+ (HybridLocalPartition(
      localRows.map(_.copy()).toArray): InputPartition)
  }
  override def planInputPartitions(): Array[InputPartition] = planned
  override def createReaderFactory(): PartitionReaderFactory =
    HybridAggReaderFactory
}

/** The manifest partials, shipped as data. */
final case class HybridLocalPartition(
    rows: Array[org.apache.spark.sql.catalyst.InternalRow]) extends InputPartition

/** One scanned-group split plus the fold to run over it. */
final case class HybridFoldPartition(
    inner: InputPartition,
    factory: PartitionReaderFactory,
    fold: AggFoldSpec) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

object HybridAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = partition match {
    case HybridLocalPartition(rows) =>
      new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): org.apache.spark.sql.catalyst.InternalRow = rows(i)
        override def close(): Unit = ()
      }
    case p: HybridFoldPartition =>
      new FoldingPartitionReader(p.factory.createReader(p.inner), p.fold)
    case other => throw new IllegalStateException(s"unexpected partition $other")
  }
}

/** Reads the delegate's rows once and emits partial-aggregate rows:
  * group-key columns first, then one value per aggregate — count partials
  * as longs (0 for an all-null count(col) group), min/max partials as the
  * partition's extreme value or null. Value comparisons use Spark's own
  * interpreted orderings (identical NaN/UTF-8 semantics to the Min/Max
  * expressions the final aggregate runs). Memory is bounded by the
  * partition's distinct group-key count — the same cardinality a map-side
  * partial aggregate of the un-pushed plan would hold. */
final class FoldingPartitionReader(
    inner: PartitionReader[org.apache.spark.sql.catalyst.InternalRow],
    spec: AggFoldSpec)
  extends PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {

  import org.apache.spark.sql.catalyst.InternalRow

  private var it: Iterator[InternalRow] = _
  private var cur: InternalRow = _

  private def fold(): Iterator[InternalRow] = {
    val ords: Array[Ordering[Any]] = spec.aggs.map { a =>
      if (a.kind == AggFoldSpec.Min || a.kind == AggFoldSpec.Max)
        org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(a.dt).asInstanceOf[Ordering[Any]]
      else null
    }
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[Vector[Any], Array[Any]]
    while (inner.next()) {
      val row = inner.get()
      val key: Vector[Any] = spec.groupIdx.indices.map { j =>
        val i = spec.groupIdx(j)
        if (row.isNullAt(i)) null
        else InternalRow.copyValue(row.get(i, spec.groupDts(j)))
      }.toVector
      val slots = acc.getOrElseUpdate(key, new Array[Any](spec.aggs.length))
      var k = 0
      while (k < spec.aggs.length) {
        val a = spec.aggs(k)
        a.kind match {
          case AggFoldSpec.CountStar =>
            slots(k) = java.lang.Long.valueOf(
              (if (slots(k) == null) 0L else slots(k).asInstanceOf[java.lang.Long].longValue) + 1L)
          case AggFoldSpec.Count =>
            if (!row.isNullAt(a.idx))
              slots(k) = java.lang.Long.valueOf(
                (if (slots(k) == null) 0L else slots(k).asInstanceOf[java.lang.Long].longValue) + 1L)
          case AggFoldSpec.Min | AggFoldSpec.Max =>
            if (!row.isNullAt(a.idx)) {
              val v = InternalRow.copyValue(row.get(a.idx, a.dt))
              slots(k) =
                if (slots(k) == null) v
                else if (a.kind == AggFoldSpec.Min) {
                  if (ords(k).lt(v, slots(k))) v else slots(k)
                } else {
                  if (ords(k).gt(v, slots(k))) v else slots(k)
                }
            }
        }
        k += 1
      }
    }
    acc.iterator.map { case (key, slots) =>
      val vals = new Array[Any](key.length + slots.length)
      var i = 0
      while (i < key.length) { vals(i) = key(i); i += 1 }
      var k = 0
      while (k < slots.length) {
        val a = spec.aggs(k)
        vals(key.length + k) =
          if (slots(k) == null &&
            (a.kind == AggFoldSpec.CountStar || a.kind == AggFoldSpec.Count))
            java.lang.Long.valueOf(0L)
          else slots(k)
        k += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
        : InternalRow
    }
  }

  override def next(): Boolean = {
    if (it == null) it = fold()
    if (it.hasNext) { cur = it.next(); true } else false
  }
  override def get(): InternalRow = cur
  override def close(): Unit = inner.close()
}

/** A layout group's partition, carrying the group's own reader factory. */
final case class EvolvedPartition(
    inner: InputPartition,
    factory: PartitionReaderFactory) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

object EvolvedUnionReaderFactory extends PartitionReaderFactory {
  private def unwrap(partition: InputPartition)
      : (InputPartition, PartitionReaderFactory) = partition match {
    case p: EvolvedPartition => (p.inner, p.factory)
    case p: EvolvedKeyedPartition => (p.inner, p.factory)
    case other => throw new IllegalStateException(s"unexpected partition $other")
  }
  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val (inner, factory) = unwrap(partition)
    factory.createReader(inner)
  }
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val (inner, factory) = unwrap(partition)
    factory.createColumnarReader(inner)
  }
  override def supportColumnarReads(partition: InputPartition): Boolean = {
    val (inner, factory) = unwrap(partition)
    factory.supportColumnarReads(inner)
  }
}
