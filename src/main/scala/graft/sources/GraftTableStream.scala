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
  *   .option("skipOverwriteSnapshots", "false") // true: appends-only tail —
  *                                  // overwrite/DML commits contribute
  *                                  // nothing (Iceberg's
  *                                  // streaming-skip-overwrite-snapshots)
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
  *  - REWRITE-AWARE: maintenance commits that leave the row set unchanged
  *    ([[GraftCatalog.compact]], [[GraftCatalog.migrateLayout]],
  *    [[GraftCatalog.clusterTable]], delete compaction — `# kind:rewrite`
  *    snapshots) contribute NOTHING to any batch, so a nightly compaction
  *    or a layout migration under a live stream never re-delivers rows
  *    the stream already emitted (Iceberg's incremental append scan
  *    classifies snapshot operations the same way);
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

private[graft] object GraftTableStreamSource {
  /** Observability/test hook: the delegate read schema each table's most
    * recently planned micro-batch used (narrow after
    * [[PruneGraftStreamColumns]] fires, full width otherwise). Keyed by
    * `<queryId>:<table>` when planning runs under a streaming query
    * (Spark stamps `sql.streaming.queryId` as a local property on the
    * stream's execution thread) and additionally by bare `<table>` as the
    * latest-plan fallback — two CONCURRENT streams over one table then
    * observe their own schemas instead of clobbering a shared key. */
  private[graft] val lastPlannedReadSchema: java.util.Map[String, StructType] =
    // BOUNDED (LRU over the last 64 keys): a long-lived driver starting
    // many ad-hoc streaming queries must not accumulate one entry per
    // (queryId, table) forever in this process-lifetime hook
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, StructType](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, StructType]): Boolean = size() > 64
      })

  private[graft] def recordPlannedSchema(nsTable: String, s: StructType): Unit = {
    lastPlannedReadSchema.put(nsTable, s)
    val qid = Option(SparkSession.active.sparkContext
      .getLocalProperty("sql.streaming.queryId"))
    qid.foreach(q => lastPlannedReadSchema.put(s"$q:$nsTable", s))
  }

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
  * `incr:start..end` — pruned to the stream's REQUIRED schema, so pending
  * equality deletes, stats pruning, and the columnar read path all apply
  * unchanged. The per-batch reader factory rides inside each partition
  * ([[GraftStreamPartition]]) because a factory built for one snapshot
  * range must never read another range's partitions.
  *
  * Column pruning: Spark's micro-batch planner builds the stream scan
  * with `newScanBuilder(options).build()` and never calls
  * `pruneColumns`, so the query's projection cannot arrive through the
  * DSv2 batch pushdown API. [[PruneGraftStreamColumns]] (an injected
  * optimizer rule, run per micro-batch) narrows the plan's relation
  * output and tells this stream via [[setRequiredSchema]] BEFORE the
  * batch's partitions are planned — a narrow streaming query over a wide
  * table then pays a narrow parquet read instead of full width. */
private[sources] class GraftTableMicroBatchStream(
    options: CaseInsensitiveStringMap,
    declared: StructType) extends MicroBatchStream {

  private val (cat, nsTable) = GraftTableStreamSource.resolve(options)
  private val start: Long =
    Option(options.get("startingSnapshot")).map(_.toLong).getOrElse(0L)
  // Iceberg's streaming-skip-overwrite-snapshots: a strictly-appends
  // consumer opts out of re-receiving rewritten partitions/files from
  // overwrite and DML commits (pure rewrites are ALWAYS skipped). Off by
  // default — added-files resume semantics. With the default
  // startingSnapshot = 0 the initial batch replays table history, so a
  // create-or-replace at snapshot 1 is itself an overwrite commit: set
  // startingSnapshot to the last fully-consumed snapshot when enabling.
  private val skipKinds: Set[String] =
    if (Option(options.get("skipOverwriteSnapshots")).exists(_.toBoolean))
      Set(graft.storage.GraftCatalog.KindRewrite,
        graft.storage.GraftCatalog.KindOverwrite,
        graft.storage.GraftCatalog.KindDelete)
    else Set(graft.storage.GraftCatalog.KindRewrite)
  private val sc = SparkSession.active.sparkContext

  // The required-schema channel from [[PruneGraftStreamColumns]] (runs at
  // optimize time) to planInputPartitions — always a subset of `declared`
  // in declared field order, so reader rows line up with the pruned
  // relation output.
  //
  // The requirement rides a SPARK LOCAL PROPERTY (keyed per stream
  // instance), which is the one driver-side channel with exactly the
  // propagation a per-plan value needs:
  //
  //  - optimize and same-thread execution: the rule sets the property on
  //    the action's thread; planInputPartitions on that thread reads it;
  //  - broadcast-exchange / subquery / AQE-stage pool threads that force
  //    the exec's lazy inputPartitions run under
  //    `SQLExecution.withThreadLocalCaptured`, which snapshots the
  //    SUBMITTING thread's local properties into the pool thread — so a
  //    pool thread planning a query's partitions sees the requirement of
  //    THAT query's own optimize, not whatever another concurrent action
  //    wrote last (the failure mode of any shared-slot design);
  //  - foreachBatch batch-df actions never touch this channel AT ALL:
  //    Spark hands foreachBatch a MATERIALIZED df over a LogicalRDD, so
  //    ad-hoc user actions re-optimize over the RDD, not over the
  //    streaming relation (pinned by StreamingSpec "foreachBatch hands
  //    the user a MATERIALIZED df") — the channel's only writer and
  //    reader is the engine's sequential batch thread plus any pool
  //    thread planning the ENGINE's own plan, which the captured
  //    properties cover; two concurrent STREAMS never share state
  //    anyway — each `readStream.load()` query gets its own stream
  //    instance (pinned by "two concurrent streams over one table");
  //  - absence of the property = full declared width (the rule CLEARS it
  //    for full-width plans, so a stale narrow value can never leak into
  //    a later wide plan on the same thread).
  //
  // The value encodes kept FIELD NAMES (declared order is reconstructed
  // from `declared`, so the string is order-free); NUL ("\u0000")
  // separates them because no real column name carries it.
  private val reqProp =
    s"graft.stream.required.${System.identityHashCode(this)}"
  private[graft] def setRequiredSchema(s: StructType): Unit =
    sc.setLocalProperty(reqProp,
      if (s.fieldNames.sameElements(declared.fieldNames)) null
      else s.fieldNames.mkString("\u0000"))
  private def currentRequired: StructType =
    Option(sc.getLocalProperty(reqProp)) match {
      case Some(names) =>
        val keep = names.split('\u0000').toSet
        StructType(declared.fields.filter(f => keep.contains(f.name)))
      case None => declared
    }

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
    val incr = cat.loadIncremental(
      Identifier.of(parts.dropRight(1), parts.last), a, b, skipKinds)
    // snapshot the requirement ONCE: pruning, coverage check, and
    // projection ordinals below must all see the same schema — separate
    // reads could tear across a concurrent setRequiredSchema
    val req = currentRequired
    val sb = incr.asInstanceOf[SupportsRead]
      .newScanBuilder(CaseInsensitiveStringMap.empty())
    sb match {
      case p: SupportsPushDownRequiredColumns => p.pruneColumns(req)
      case _ => ()
    }
    val scan = sb.build()
    GraftTableStreamSource.recordPlannedSchema(nsTable, scan.readSchema())
    val batch = scan.toBatch
    val inner = batch.createReaderFactory()
    // the exec node's output attributes are in REQUIRED order; a bare
    // delegate over a partitioned table moves partition columns to the
    // END of its readSchema — reorder per row/batch or rows silently
    // misalign with the output (delete-wrapped delegates already emit
    // required order and skip this)
    val out = scan.readSchema()
    val factory =
      if (out.fieldNames.sameElements(req.fieldNames)) inner
      else {
        require(req.fieldNames.forall(out.fieldNames.contains),
          s"stream delegate read schema ${out.fieldNames.mkString(",")} " +
            s"does not cover required ${req.fieldNames.mkString(",")}")
        GraftStreamProjectingFactory(inner, out,
          req.fieldNames.map(out.fieldIndex))
      }
    batch.planInputPartitions()
      .map(p => GraftStreamPartition(p, factory): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftStreamReaderFactory
}

/** Reorders the delegate's rows/batches into the stream's required
  * column order: `ords(i)` = the delegate ordinal serving output field
  * `i`. Row path projects (codegen'd UnsafeProjection, built per
  * reader on the executor); columnar path permutes the batch's vectors
  * zero-copy. */
private[sources] final case class GraftStreamProjectingFactory(
    inner: PartitionReaderFactory,
    from: StructType,
    ords: Array[Int]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val r = inner.createReader(partition)
    new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
      private val proj =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
          ords.toIndexedSeq.map(o =>
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              o, from(o).dataType, from(o).nullable)))
      override def next(): Boolean = r.next()
      override def get(): org.apache.spark.sql.catalyst.InternalRow =
        proj(r.get())
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val r = inner.createColumnarReader(partition)
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      override def next(): Boolean = r.next()
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
        val b = r.get()
        new org.apache.spark.sql.vectorized.ColumnarBatch(
          ords.map(b.column), b.numRows())
      }
      override def close(): Unit = r.close()
    }
  }

  override def supportColumnarReads(partition: InputPartition): Boolean =
    inner.supportColumnarReads(partition)
}

/** Carries the range-specific delegate factory with its partition, so the
  * stream-level factory is stateless across ranges. */
private[sources] final case class GraftStreamPartition(
    inner: InputPartition,
    factory: PartitionReaderFactory) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Streaming column pruning for `graft-table` sources.
  *
  * Spark's micro-batch execution builds a streaming scan WITHOUT the
  * batch pushdown pass (`newScanBuilder(options).build()` — no
  * `pruneColumns`), so every micro-batch of a narrow query would read
  * the table full-width. This optimizer rule (injected by
  * [[graft.functions.GraftExtensions]] / `Engine.tune`, and run by
  * `IncrementalExecution` per micro-batch BEFORE partitions are
  * planned) recovers the projection the DSv2 API cannot carry:
  * for a `Project [cols] (+ Filter)` directly over a graft-table
  * streaming relation it narrows the relation's output to the
  * referenced columns and hands that schema to the stream, whose
  * per-batch delegate scan then prunes the parquet read.
  *
  * Safety: the relation keeps its own attribute instances (subset, in
  * declared order), so references above stay valid; a stream appearing
  * in MORE than one relation node of the plan (self-join) is left
  * full-width — one shared mutable requirement cannot serve two
  * different prunings. Correctness is unaffected either way; this is
  * purely an IO-width optimization.
  *
  * Scope: the requirement rides the acting thread's SPARK LOCAL
  * PROPERTIES (keyed per stream instance), which Spark itself snapshots
  * into broadcast/subquery/AQE pool threads via
  * `SQLExecution.withThreadLocalCaptured` — so each plan's partition
  * planning sees ITS OWN optimize's requirement even on a pool thread,
  * and concurrent actions over one foreachBatch df cannot clobber each
  * other; see [[GraftTableMicroBatchStream]] for the full channel
  * contract. */
object PruneGraftStreamColumns
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
  import org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val graftRels = plan.collect {
      case r: StreamingDataSourceV2ScanRelation
          if r.stream.isInstanceOf[GraftTableMicroBatchStream] => r
    }
    if (graftRels.isEmpty) return plan
    // authoritative reset for THIS plan: the stream serves exactly its
    // relation's output unless the transform below narrows it. Without
    // the reset, a previous plan's narrowing would leak into a later
    // full-width plan over the same stream (e.g. two actions in one
    // foreachBatch body) and under-deliver columns.
    graftRels.foreach { r =>
      r.stream.asInstanceOf[GraftTableMicroBatchStream]
        .setRequiredSchema(StructType(r.output.map(a =>
          org.apache.spark.sql.types.StructField(
            a.name, a.dataType, a.nullable, a.metadata))))
    }
    val prunable = graftRels.groupBy(_.stream).collect {
      case (_, Seq(only)) => only
    }.toSet

    def narrow(
        rel: StreamingDataSourceV2ScanRelation,
        required: AttributeSet): StreamingDataSourceV2ScanRelation = {
      val kept0 = rel.output.filter(required.contains)
      // zero-column reads (e.g. a bare count) still need one concrete
      // column to drive the delegate scan — keep the narrowest
      val kept = if (kept0.nonEmpty) kept0
        else Seq(rel.output.minBy(_.dataType.defaultSize))
      if (kept.length == rel.output.length) rel
      else {
        rel.stream.asInstanceOf[GraftTableMicroBatchStream]
          .setRequiredSchema(StructType(kept.map(a =>
            org.apache.spark.sql.types.StructField(
              a.name, a.dataType, a.nullable, a.metadata))))
        rel.copy(output = kept)
      }
    }

    plan.transform {
      case p @ Project(_, r: StreamingDataSourceV2ScanRelation)
          if prunable.contains(r) =>
        p.copy(child = narrow(r, p.references))
      case p @ Project(_, f @ Filter(_, r: StreamingDataSourceV2ScanRelation))
          if prunable.contains(r) =>
        p.copy(child = f.copy(child = narrow(r, p.references ++ f.references)))
    }
  }
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
