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
  * partition columns, with one input split per live partition value
  * (`HasPartitionKey`). When BOTH sides of an equi-join are catalog tables
  * partitioned on the join key and `spark.sql.sources.v2.bucketing.enabled`
  * is set, Spark's `EnsureRequirements` matches the two key-grouped
  * distributions and plans the join with NO shuffle exchange on either side
  * — at 100 TB this turns the nightly fact-fact join between co-partitioned
  * tables from the dominant shuffle into a zero-exchange zip of partitions
  * (Spark's own SPJ machinery, SPARK-37375).
  *
  * Lives in the `org.apache.spark.sql` package tree because
  * [[ParquetScanBuilder]] (subclassed to keep ALL of the file source's
  * pushdown surface — catalyst filters, column pruning, aggregate pushdown,
  * runtime filtering) is `private[sql]`-adjacent internal API.
  */
object Spj {

  /** A ScanBuilder over `table` whose built scan additionally reports
    * key-grouped partitioning on the table's partition columns. */
  def keyedScanBuilder(table: ParquetTable, options: CaseInsensitiveStringMap): ScanBuilder =
    new KeyedParquetScanBuilder(table, options)
}

/** Delegates the full parquet pushdown surface (catalyst filters, column
  * pruning, aggregate pushdown) to a real [[ParquetScanBuilder]]; only
  * `build()` differs — the scan is wrapped with the partition-key report.
  * (Composition, not inheritance: `ParquetScanBuilder.build()` has a
  * covariant `ParquetScan` return type that an override can't widen.) */
final class KeyedParquetScanBuilder(table: ParquetTable, options: CaseInsensitiveStringMap)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private val underlying = ParquetScanBuilder(
    table.sparkSession, table.fileIndex, table.schema, table.dataSchema, options)

  override def pruneColumns(requiredSchema: StructType): Unit =
    underlying.pruneColumns(requiredSchema)
  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    underlying.pushFilters(filters)
  override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    underlying.pushedFilters
  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    underlying.pushAggregation(aggregation)
  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    underlying.supportCompletePushDown(aggregation)

  override def build(): Scan = {
    val pschema = table.fileIndex.partitionSchema
    underlying.build() match {
      case p: ParquetScan if pschema.nonEmpty => KeyedScan(p, pschema)
      case other => other
    }
  }
}

/** Wraps a [[ParquetScan]]: regroups its planned file splits into one
  * split per partition VALUE (the unit SPJ aligns across join sides) and
  * reports `KeyGroupedPartitioning` over the partition columns. Reader
  * creation, columnar support, and schemas all delegate to the parquet
  * scan's own machinery.
  */
final case class KeyedScan(delegate: ParquetScan, partitionSchema: StructType)
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

  // Either passthrough partitions (unexpected split type — plan exactly as
  // the parquet scan would) or one KeyedFilePartition per partition value.
  @transient private lazy val planned: Either[Array[InputPartition], Array[InputPartition]] = {
    val parts = delegate.toBatch.planInputPartitions()
    if (!parts.forall(_.isInstanceOf[FilePartition])) Left(parts)
    else {
      val files = parts.flatMap(_.asInstanceOf[FilePartition].files)
      val proj = UnsafeProjection.create(partitionSchema)
      val grouped = files.groupBy(f => proj(f.partitionValues).copy())
      // Deterministic split order (UnsafeRow bytes) — stable plans across runs.
      val sorted = grouped.toArray.sortBy(_._1.toString)
      Right(sorted.zipWithIndex.map { case ((key, fs), i) =>
        KeyedFilePartition(FilePartition(i, fs), key): InputPartition
      })
    }
  }

  override def planInputPartitions(): Array[InputPartition] = planned.merge

  override def createReaderFactory(): PartitionReaderFactory = {
    val inner = delegate.toBatch.createReaderFactory()
    if (planned.isRight) UnwrapReaderFactory(inner) else inner
  }

  override def outputPartitioning(): Partitioning = planned match {
    case Right(groups) if groups.nonEmpty =>
      new KeyGroupedPartitioning(
        partitionSchema.fields.map(f => Expressions.identity(f.name): V2Expression),
        groups.length)
    case _ => new UnknownPartitioning(0)
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
