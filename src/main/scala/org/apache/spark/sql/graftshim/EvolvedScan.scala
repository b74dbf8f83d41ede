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
      posDeletes: Map[String, Array[Long]]): ScanBuilder =
    new EvolvedScanBuilder(tables, options, tableSchema, fileStats,
      tableDir, fileBlooms, eqDeletes, posDeletes)
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
    posDeletes: Map[String, Array[Long]])
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

  // for explain honesty report the predicates EVERY group pushed
  override def pushedFilters()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = {
    val perGroup = groups.map(_.pushedFilters().map(_.toString).toSet)
    groups.head.pushedFilters()
      .filter(p => perGroup.forall(_.contains(p.toString)))
  }

  /** Metadata-only aggregate pushdown across a MIXED layout: push the
    * aggregate into EACH layout group's manifest-stats answering and
    * serve the concatenated per-group partial rows as one LocalScan —
    * Spark's final aggregate (partial-pushdown protocol,
    * [[supportCompletePushDown]] stays false) then combines the partials
    * with full-scan semantics: count → sum of group counts, min/max →
    * fold over group bounds. All-or-nothing: a union scan has ONE read
    * schema, so if ANY group cannot answer from its manifest stats (stats
    * missing, a GROUP BY column that is not a dir level in that group's
    * layout, pending deletes), every group's answer is cleared and the
    * whole aggregate declines to the plain union data scan.
    *
    * This is what keeps `count(*)`/min/max METADATA-ONLY while a table
    * migrates incrementally — before this, one surviving legacy file
    * demoted the answer to a full data scan of the entire table. */
  private var aggAnswered = false
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    aggAnswered = groups.forall(_.tryManifestAggregation(aggregation))
    if (!aggAnswered) groups.foreach(_.clearManifestAggregation())
    aggAnswered
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
    } else EvolvedUnionScan(groups.map(_.build()))
}

/** Concatenates the layout groups' scans: same read schema by
  * construction (every group is canonically wrapped), partitions tagged
  * with their group's reader factory. */
final case class EvolvedUnionScan(scans: Seq[Scan])
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = scans.head.readSchema()
  override def toBatch: Batch = this
  override def description(): String =
    s"PartitionEvolvedUnion(${scans.size} layouts: " +
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

  @transient private lazy val planned: Array[InputPartition] =
    scans.toArray.flatMap { s =>
      val b = s.toBatch
      val f = b.createReaderFactory()
      b.planInputPartitions().map(p => EvolvedPartition(p, f): InputPartition)
    }

  override def planInputPartitions(): Array[InputPartition] = planned
  override def createReaderFactory(): PartitionReaderFactory =
    EvolvedUnionReaderFactory
}

/** A layout group's partition, carrying the group's own reader factory. */
final case class EvolvedPartition(
    inner: InputPartition,
    factory: PartitionReaderFactory) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

object EvolvedUnionReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[EvolvedPartition]
    p.factory.createReader(p.inner)
  }
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[EvolvedPartition]
    p.factory.createColumnarReader(p.inner)
  }
  override def supportColumnarReads(partition: InputPartition): Boolean = {
    val p = partition.asInstanceOf[EvolvedPartition]
    p.factory.supportColumnarReads(p.inner)
  }
}
