package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.storage.GraftCatalog

/** Streaming SOURCE over a [[GraftCatalog]] table — the read side of the
  * streaming story the exactly-once sinks already cover: a catalog table
  * becomes a micro-batch stream whose offsets are SNAPSHOT IDS, so each
  * batch is one `incr:a..b` incremental read (added files only, with
  * in-range equality deletes applied by the sequence rule) and the whole
  * existing read stack — manifest-stats pruning, merge-on-read delete
  * apply, columnar probes — serves the batch.
  *
  * {{{
  * spark.readStream.format("graft-table")
  *   .option("table", "cat.ns.events")     // catalog-qualified name
  *   .option("startingSnapshot", "0")      // default 0: full table, then tail
  *   .load()
  * }}}
  *
  * Semantics and scale shape:
  *  - exactly-once by construction: offsets are snapshot ids, manifests
  *    are immutable, so replaying a batch re-reads the identical file
  *    set; the poll cost is the manifest DELTA, never a table rescan;
  *  - ADDED-ROWS semantics (Iceberg's streaming read): appends and
  *    merge-on-read upserts surface as their new rows, with deletes
  *    committed inside a batch's range applied to that batch; deletes of
  *    rows emitted by EARLIER batches are not retracted — consumers that
  *    need retractions read the row-level changelog
  *    ([[graft.storage.Snapshots.diff]]) or the CDC sink instead;
  *  - a dynamic-partition overwrite in range surfaces the rewritten
  *    partition's full new contents (file-level diffs cannot express
  *    row-level deletes) — same contract as the batch `incr:` read;
  *  - the schema is pinned when the stream starts (like every file
  *    source); evolve-then-restart.
  */
class GraftTableStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTableStreamSource.baseTable(options).schema()
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftStreamTable(new CaseInsensitiveStringMap(properties))
}

private[sources] object GraftTableStreamSource {
  /** (catalog, "ns.table") from the required `table` option. */
  def resolve(options: CaseInsensitiveStringMap): (GraftCatalog, String) = {
    val fqn = Option(options.get("table")).getOrElse(throw
      new IllegalArgumentException(
        "graft-table source needs option 'table' = <catalog>.<ns>.<table>"))
    val parts = fqn.split('.')
    require(parts.length >= 3,
      s"graft-table: expected <catalog>.<ns>.<table>, got '$fqn'")
    val cat = SparkSession.active.sessionState.catalogManager
      .catalog(parts.head) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"graft-table: catalog '${parts.head}' is not a GraftCatalog ($other)")
    }
    (cat, parts.drop(1).mkString("."))
  }

  def baseTable(options: CaseInsensitiveStringMap): Table = {
    val (cat, nsTable) = resolve(options)
    val parts = nsTable.split('.')
    cat.loadTable(Identifier.of(parts.dropRight(1), parts.last))
  }
}

private[sources] class GraftStreamTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  private lazy val declared = GraftTableStreamSource.baseTable(options).schema()

  override def name(): String =
    s"graft-table(${options.get("table")})"
  override def schema(): StructType = declared
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(readOptions: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = declared
      override def description(): String = name()
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GraftTableMicroBatchStream(options, declared)
    }
}

/** Offset = snapshot id. */
private[sources] final case class GraftStreamOffset(snap: Long) extends Offset {
  override def json(): String = snap.toString
}

/** Each micro-batch delegates to the catalog's OWN batch scan of
  * `incr:start..end` — pruned to the stream's pinned schema, so pending
  * equality deletes, stats pruning, and the columnar read path all apply
  * unchanged. The per-batch reader factory rides inside each partition
  * ([[GraftStreamPartition]]) because a factory built for one snapshot
  * range must never read another range's partitions. */
private[sources] class GraftTableMicroBatchStream(
    options: CaseInsensitiveStringMap,
    declared: StructType) extends MicroBatchStream {

  private val (cat, nsTable) = GraftTableStreamSource.resolve(options)
  private val start: Long =
    Option(options.get("startingSnapshot")).map(_.toLong).getOrElse(0L)

  override def latestOffset(): Offset =
    GraftStreamOffset(math.max(start, cat.latestSnapshot(nsTable)))
  override def initialOffset(): Offset = GraftStreamOffset(start)
  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(
      startOff: Offset, endOff: Offset): Array[InputPartition] = {
    val a = startOff.asInstanceOf[GraftStreamOffset].snap
    val b = endOff.asInstanceOf[GraftStreamOffset].snap
    if (a >= b) return Array.empty
    val parts = nsTable.split('.')
    val incr = cat.loadTable(
      Identifier.of(parts.dropRight(1), parts.last), s"incr:$a..$b")
    val sb = incr.asInstanceOf[SupportsRead]
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    sb match {
      case p: SupportsPushDownRequiredColumns => p.pruneColumns(declared)
      case _ => ()
    }
    val batch = sb.build().toBatch
    val factory = batch.createReaderFactory()
    batch.planInputPartitions()
      .map(p => GraftStreamPartition(p, factory): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftStreamReaderFactory
}

/** Carries the range-specific delegate factory with its partition, so the
  * stream-level factory is stateless across ranges. */
private[sources] final case class GraftStreamPartition(
    inner: InputPartition,
    factory: PartitionReaderFactory) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

private[sources] object GraftStreamReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val p = partition.asInstanceOf[GraftStreamPartition]
    p.factory.createReader(p.inner)
  }
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[GraftStreamPartition]
    p.factory.createColumnarReader(p.inner)
  }
  override def supportColumnarReads(partition: InputPartition): Boolean = {
    val p = partition.asInstanceOf[GraftStreamPartition]
    p.factory.supportColumnarReads(p.inner)
  }
}
