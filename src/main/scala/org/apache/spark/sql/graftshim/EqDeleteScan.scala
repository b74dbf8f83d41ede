package org.apache.spark.sql.graftshim

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** Everything the read side needs to apply a table's pending equality
  * deletes (merge-on-read): the declared key columns, every delete entry
  * as (serialized UnsafeRow key bytes, delete snapshot), and each live
  * file's add sequence. A row of file `f` is deleted iff some entry's key
  * equals the row's key AND the entry's snapshot is strictly newer than
  * `f`'s add sequence — Iceberg's sequence-number rule, so keys
  * re-inserted after their delete are never suppressed. */
final case class EqDeleteSpec(
    keyCols: Seq[String],
    entries: Seq[(Array[Byte], Long)],
    addSeq: Map[String, Long],
    tableDir: String,
    /** Per-file [min,max] of a SINGLE integral merge key (from manifest
      * column stats, same value domain as the probe): a file whose range
      * provably holds no delete key is read probe-free. Empty for
      * composite/string keys or when stats are absent — conservative. */
    fileKeyRange: Map[String, (Long, Long)] = Map.empty)

/** The read-side column names of [[graft.storage.GraftCatalog]] tables'
  * METADATA COLUMNS (Iceberg's spelling): the serving file's
  * table-relative path and the row's physical position in it. `_pos`
  * rides parquet's native row-index generation (exact under filter
  * pushdown and row-group pruning), surfaced to the delegate scan as the
  * reader-recognized temporary column. */
object FileMetaCols {
  val File = "_file"
  val Pos = "_pos"
  /** Output-ordinal sentinel: synthesize the sub-file's relative path. */
  val FileOrdinal: Int = -1
  /** The parquet reader's magic row-index field: the TEMPORARY column
    * name is what triggers generation ([[org.apache.spark.sql.execution
    * .datasources.parquet.ParquetRowIndexUtil
    * .findRowIndexColumnIndexInSchema]] matches it by name) — the public
    * `row_index` name would be demanded from the file instead. */
  def rowIndexName: String =
    org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      .ROW_INDEX_TEMPORARY_COLUMN_NAME
  def rowIndexField: org.apache.spark.sql.types.StructField =
    // NULLABLE is load-bearing: the column is absent from every data file
    // (the reader GENERATES it), and the parquet reader's checkColumn
    // rejects missing required columns before generation is considered
    org.apache.spark.sql.types.StructField(
      rowIndexName, org.apache.spark.sql.types.LongType, nullable = true)
}

/** ONE definition of the delete-apply / metadata-column scan wrap, shared
  * by the table read path ([[KeyedParquetScanBuilder]]) and the row-level
  * rewrite path (`graft.storage.CowScanBuilder`): what the parquet
  * delegate must read for a requested projection, and how the built
  * delegate wraps into an [[EqDeleteScan]]. Keeping both callers on the
  * same ordinal/forcing logic is load-bearing — a divergence makes the
  * rewrite scan and the table scan disagree about which rows exist. */
object DeleteWrap {

  /** `_file` / `_pos` metadata columns in the requested projection —
    * synthesized by the wrapper, never handed to the parquet delegate. */
  def metaRequested(requested: Option[StructType]): Seq[String] =
    requested.map(_.fieldNames.toSeq
      .filter(n => n == FileMetaCols.File || n == FileMetaCols.Pos))
      .getOrElse(Seq.empty)

  /** Whether the delegate read needs parquet's generated row index: the
    * query asked for `_pos`, or pending position deletes must be scoped
    * to physical rows. */
  def needRowIdx(
      requested: Option[StructType],
      posDeletes: Map[String, Array[Long]]): Boolean =
    metaRequested(requested).contains(FileMetaCols.Pos) || posDeletes.nonEmpty

  /** The schema the parquet DELEGATE reads: the requested data fields
    * (meta columns stripped), any delete-key columns the query didn't ask
    * for (forced in for the probe; [[wrap]] projects them off), and the
    * row-index field when physical positions are needed. */
  def parquetSchema(
      requested: StructType,
      tableSchema: StructType,
      eqDeletes: Option[EqDeleteSpec],
      posDeletes: Map[String, Array[Long]]): StructType = {
    val dataFields = requested.fields.filterNot(f =>
      f.name == FileMetaCols.File || f.name == FileMetaCols.Pos)
    val withKeys = eqDeletes match {
      case Some(spec) =>
        dataFields ++ spec.keyCols
          .filterNot(n => dataFields.exists(_.name == n))
          .map(k => tableSchema(tableSchema.fieldIndex(k)))
      case None => dataFields
    }
    StructType(
      if (needRowIdx(Some(requested), posDeletes))
        withKeys :+ FileMetaCols.rowIndexField
      else withKeys)
  }

  /** Wrap a BUILT parquet delegate: output exactly the requested fields in
    * request order — delegate ordinals for data columns, the row-index
    * delegate column for `_pos`, the synthesis sentinel for `_file` —
    * with the pending equality/position deletes applied row-side. */
  def wrap(
      scan: Scan,
      requested: StructType,
      eqDeletes: Option[EqDeleteSpec],
      posDeletes: Map[String, Array[Long]],
      tableDir: String): Scan = {
    val full = scan.readSchema()
    val rowIdxOrd =
      if (needRowIdx(Some(requested), posDeletes))
        full.fieldIndex(FileMetaCols.rowIndexName)
      else -1
    val outFields = requested.fields
    val outOrds = outFields.toSeq.map { f =>
      if (f.name == FileMetaCols.File) FileMetaCols.FileOrdinal
      else if (f.name == FileMetaCols.Pos) rowIdxOrd
      else full.fieldIndex(f.name)
    }
    val keyCols = eqDeletes.map(_.keyCols).getOrElse(Seq.empty)
    EqDeleteScan(scan,
      StructType(outFields.map(f =>
        if (f.name == FileMetaCols.Pos)
          f.copy(dataType = org.apache.spark.sql.types.LongType)
        else f)),
      outOrds,
      keyCols.map(full.fieldIndex),
      keyCols.map(k => full(full.fieldIndex(k)).dataType),
      eqDeletes.getOrElse(EqDeleteSpec(Seq.empty, Seq.empty, Map.empty, tableDir)),
      posDeletes,
      rowIdxOrd)
  }
}

/** Wraps a parquet [[Scan]] to apply pending equality deletes row-side.
  *
  *  - the delegate's input partitions are kept AS PLANNED (multi-file
  *    packing of small files, intra-file splits of big ones survive); a
  *    task chains one sub-reader per [[org.apache.spark.sql.execution
  *    .datasources.PartitionedFile]], so each sub-reader knows exactly
  *    which file (⇒ which add sequence) it serves;
  *  - each row's key probes a delete-set [[KeyProbe]] (built once per
  *    executor from a broadcast of the delta-sized entry list) and rows
  *    with a strictly-newer delete are dropped;
  *  - the delegate scan was built with the key columns FORCED into its
  *    required schema; this wrapper projects them back off, so Spark sees
  *    exactly the schema it pruned to.
  *
  * Reads stay COLUMNAR while deletes pend (whenever the delegate's
  * reader is): a fresh file (added at/after the newest delete) passes
  * its batches through untouched; an older file probes each batch's key
  * columns and — only when a deleted key actually hits — wraps the
  * batch's vectors in a zero-copy SELECTION VIEW over the surviving row
  * ordinals ([[SelectedColumnVector]]). The remaining merge-on-read
  * read tax is the per-batch key probe on affected files and the
  * disabled aggregate pushdown — cleared by compaction, which folds
  * deletes into data files and drops the sidecars from the manifest. */
final case class EqDeleteScan(
    delegate: Scan,
    outputSchema: StructType,
    outputOrdinals: Seq[Int],
    keyOrdinals: Seq[Int],
    keyTypes: Seq[DataType],
    spec: EqDeleteSpec,
    /** Pending POSITION deletes: table-relative file → sorted deleted row
      * positions (parquet row indexes). No sequence scoping — a position
      * names one physical row of one live file; rewriting the file
      * retires its entries. */
    posDels: Map[String, Array[Long]] = Map.empty,
    /** Delegate ordinal of the parquet row-index column (forced into the
      * read when `_pos` is requested or position deletes pend); -1 when
      * absent. `outputOrdinals` may reference it directly (a `_pos`
      * projection) — only [[FileMetaCols.FileOrdinal]] is synthesized. */
    rowIdxOrdinal: Int = -1) extends Scan with Batch {

  override def readSchema(): StructType = outputSchema
  override def toBatch: Batch = this
  override def description(): String = {
    val eq =
      if (spec.entries.nonEmpty)
        s"EqDeleteApply(${spec.entries.size} deletes, keys=${spec.keyCols.mkString(",")}) "
      else ""
    val pos =
      if (posDels.nonEmpty)
        s"PosDeleteApply(${posDels.valuesIterator.map(_.length).sum} deletes, ${posDels.size} files) "
      else ""
    val meta =
      if (eq.isEmpty && pos.isEmpty) "FileMetaRead " else ""
    eq + pos + meta + delegate.description()
  }

  private lazy val delegateBatch = delegate.toBatch

  override def planInputPartitions(): Array[InputPartition] = {
    // keep the delegate's task grouping — per-file delete scoping happens
    // inside the reader, which chains one sub-reader per file; splitting
    // to one file per TASK here would turn a many-small-delta-file table
    // (the steady merge-on-read shape) into a task-count explosion
    val parts = delegateBatch.planInputPartitions()
    parts.foreach {
      case _: FilePartition => ()
      case other => throw new IllegalStateException(
        s"equality-delete apply expects file partitions, got $other")
    }
    parts
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val bc = SparkSession.active.sparkContext
      .broadcast(DeleteSets(spec.entries.toArray, posDels))
    EqDeleteReaderFactory(delegateBatch.createReaderFactory(), bc,
      keyOrdinals.toArray, keyTypes.toArray, outputSchema,
      outputOrdinals.toArray, delegate.readSchema().length,
      spec.addSeq, spec.tableDir, spec.fileKeyRange, rowIdxOrdinal)
  }
}

/** One broadcast for both pending delete families — delta-sized by the
  * merge-on-read contract (an outsized set is the compaction signal). */
private[graftshim] final case class DeleteSets(
    eq: Array[(Array[Byte], Long)],
    pos: Map[String, Array[Long]])

private[graftshim] final case class EqDeleteReaderFactory(
    inner: PartitionReaderFactory,
    entries: Broadcast[DeleteSets],
    keyOrdinals: Array[Int],
    keyTypes: Array[DataType],
    outputSchema: StructType,
    outputOrdinals: Array[Int],
    readArity: Int,
    addSeq: Map[String, Long],
    tableDir: String,
    keyRanges: Map[String, (Long, Long)],
    rowIdxOrdinal: Int = -1) extends PartitionReaderFactory {

  // Spark requires the columnar decision to be UNIFORM across a scan's
  // partitions ("Cannot mix row-based and columnar input partitions"),
  // so this must not depend on the file — per-file handling (fresh-file
  // pass-through vs probed selection view) happens inside the reader
  override def supportColumnarReads(partition: InputPartition): Boolean =
    inner.supportColumnarReads(partition)

  // the newest delete snapshot anywhere: a file added at or after it can
  // skip the per-row probe entirely (no delete is strictly newer)
  private lazy val maxDeleteSnap: Long =
    entries.value.eq.foldLeft(Long.MinValue) { case (m, (_, s)) => math.max(m, s) }

  // delete-set probe; built once per EXECUTOR per scan (the broadcast id
  // is process-unique) and shared across this scan's task threads
  private def probe(): KeyProbe = {
    // bound the per-executor footprint: a long session scans many delete
    // sets (one broadcast each); wholesale clear is fine — the probe
    // rebuilds from the still-live broadcast on the next access
    if (EqDeleteReaderFactory.cache.size > 64) EqDeleteReaderFactory.cache.clear()
    EqDeleteReaderFactory.cache.computeIfAbsent(entries.id,
      _ => KeyProbe.build(entries.value.eq, keyOrdinals, keyTypes))
  }

  /** (manifest-relative path, add sequence) of a partitioned file. */
  private def fileInfoOf(
      pf: org.apache.spark.sql.execution.datasources.PartitionedFile)
      : (String, Long) = {
    val file = pf.filePath.toPath.toUri.getPath
    // the partition file path is scheme-stripped (toUri.getPath), so the
    // prefix must normalize the same way: a raw tableDir compare breaks
    // under a scheme-qualified warehouse (file://, hdfs://, s3a://) and a
    // missed match would silently skip the delete apply
    val rel = {
      val prefix = new org.apache.hadoop.fs.Path(tableDir)
        .toUri.getPath.stripSuffix("/") + "/"
      if (file.contains(prefix))
        file.substring(file.indexOf(prefix) + prefix.length)
      else file.substring(file.lastIndexOf('/') + 1)
    }
    // every manifest-listed file carries an add sequence (stamped by every
    // snapshot write), so a miss here is a path-resolution bug — and the
    // only safe response is to fail loudly: any default either skips
    // pending deletes (resurrected rows) or applies deletes to
    // possibly-newer rows. With no equality deletes pending the sequence
    // is never consulted (metadata-only or position-delete reads can
    // serve legacy no-manifest tables) — report probe-free directly.
    if (entries.value.eq.isEmpty) rel -> Long.MaxValue
    else rel -> addSeq.getOrElse(rel, throw new IllegalStateException(
      s"equality-delete apply: file '$rel' (from '$file') has no add " +
        s"sequence in the scan snapshot's manifest — cannot scope pending " +
        s"deletes; known files: ${addSeq.keys.take(3).mkString(", ")}…"))
  }

  /** True when the file needs NO per-row probe: every pending delete is
    * at-or-older than the file (sequence rule), or the file's key range
    * provably holds no delete key (manifest stats). The localized-delete
    * shape — a retention pass over a key-clustered table — reads almost
    * the whole table through this branch, probe-free, before any
    * compaction runs. */
  private def probeFree(rel: String, fileSeq: Long): Boolean =
    fileSeq >= maxDeleteSnap ||
      keyRanges.get(rel).exists { case (mn, mx) => probe().noKeyIn(mn, mx) }

  private def subPartitions(partition: InputPartition): Array[FilePartition] =
    partition match {
      case fp: FilePartition =>
        fp.files.map(pf => FilePartition(fp.index, Array(pf)))
      case other =>
        throw new IllegalStateException(s"unexpected partition $other")
    }

  /** Whether the output is a pure IDENTITY pass-through of the delegate
    * (no dropped forced columns, no synthesized `_file`, no column
    * reordering — the ordinal map must be 0,1,2,…). */
  private def passThroughOutput: Boolean =
    outputSchema.length == readArity &&
      outputOrdinals.indices.forall(i => outputOrdinals(i) == i)

  /** Per-sub-file output projection: delegate ordinals bind directly
    * (`_pos` is just the row-index delegate column); the `_file`
    * sentinel becomes a constant — the file's table-relative path. */
  private def projectionFor(rel: String): UnsafeProjection =
    UnsafeProjection.create(
      outputSchema.indices.map { i =>
        val ord = outputOrdinals(i)
        if (ord == FileMetaCols.FileOrdinal)
          org.apache.spark.sql.catalyst.expressions.Literal(
            UTF8String.fromString(rel), StringType)
            : org.apache.spark.sql.catalyst.expressions.Expression
        else
          BoundReference(ord, outputSchema(i).dataType,
            outputSchema(i).nullable)
      }.toIndexedSeq)

  private def rowReaderFor(sub: FilePartition): PartitionReader[InternalRow] = {
    val (rel, fileSeq) = fileInfoOf(sub.files.head)
    val reader = inner.createReader(sub)
    val project = if (passThroughOutput) null else projectionFor(rel)
    val positions = entries.value.pos.getOrElse(rel, null)

    if (probeFree(rel, fileSeq) && positions == null) {
      // no pending delete can target this file — it predates none of them
      // (the steady-state shape of post-merge appends) or its key range
      // holds no delete key: skip the per-row key probe entirely
      new PartitionReader[InternalRow] {
        override def next(): Boolean = reader.next()
        override def get(): InternalRow = {
          val row = reader.get()
          if (project == null) row else project(row)
        }
        override def close(): Unit = reader.close()
      }
    } else {
      val eqApplies = !probeFree(rel, fileSeq)
      val deletes = if (eqApplies) probe() else null
      require(positions == null || rowIdxOrdinal >= 0,
        s"position deletes pend for '$rel' but the scan carries no row-index column")
      new PartitionReader[InternalRow] {
        private var current: InternalRow = _
        override def next(): Boolean = {
          while (reader.next()) {
            val row = reader.get()
            val posDeleted = positions != null &&
              java.util.Arrays.binarySearch(positions,
                row.getLong(rowIdxOrdinal)) >= 0
            if (!posDeleted && (!eqApplies || deletes.snapOf(row) <= fileSeq)) {
              current = if (project == null) row else project(row)
              return true
            }
          }
          false
        }
        override def get(): InternalRow = current
        override def close(): Unit = reader.close()
      }
    }
  }

  private def colReaderFor(sub: FilePartition): PartitionReader[ColumnarBatch] = {
    val (rel, fileSeq) = fileInfoOf(sub.files.head)
    val rdr = inner.createColumnarReader(sub)
    val relUtf8 = UTF8String.fromString(rel)
    def col(b: ColumnarBatch, ord: Int): ColumnVector =
      if (ord == FileMetaCols.FileOrdinal) new ConstUtf8Vector(relUtf8)
      else b.column(ord)
    def projected(b: ColumnarBatch, n: Int): ColumnarBatch =
      if (passThroughOutput) b
      else new ColumnarBatch(
        outputOrdinals.map(col(b, _)), n)
    val positions = entries.value.pos.getOrElse(rel, null)
    if (probeFree(rel, fileSeq) && positions == null) {
      // no pending delete can target this file (fresh, or key range clear
      // of delete keys): batches pass through untouched (modulo dropping
      // the forced key columns / adding the constant `_file`)
      new PartitionReader[ColumnarBatch] {
        override def next(): Boolean = rdr.next()
        override def get(): ColumnarBatch = {
          val b = rdr.get()
          projected(b, b.numRows())
        }
        override def close(): Unit = rdr.close()
      }
    } else {
      val eqApplies = !probeFree(rel, fileSeq)
      val deletes = if (eqApplies) probe() else null
      require(positions == null || rowIdxOrdinal >= 0,
        s"position deletes pend for '$rel' but the scan carries no row-index column")
      new PartitionReader[ColumnarBatch] {
        private var current: ColumnarBatch = _
        override def next(): Boolean = {
          while (rdr.next()) {
            val b = rdr.get()
            val n = b.numRows()
            // probe every row's key/position; common case — no deleted
            // row in the batch — passes the vectors through, zero copies
            val kept = new Array[Int](n)
            var k =
              if (eqApplies) deletes.fillKept(b, fileSeq, kept)
              else { var i = 0; while (i < n) { kept(i) = i; i += 1 }; n }
            if (positions != null && k > 0)
              k = PosFilter.retain(b.column(rowIdxOrdinal), positions, kept, k)
            if (k == n) { current = projected(b, n); return true }
            else if (k > 0) {
              // some rows deleted: serve a zero-copy selection view over
              // the surviving ordinals — works for every column type
              current = new ColumnarBatch(
                outputOrdinals.map { ord =>
                  val c = col(b, ord)
                  if (ord == FileMetaCols.FileOrdinal) c // constant: selection-invariant
                  else new SelectedColumnVector(c, kept): ColumnVector
                },
                k)
              return true
            }
            // k == 0: the whole batch is deleted — advance
          }
          false
        }
        override def get(): ColumnarBatch = current
        override def close(): Unit = rdr.close()
      }
    }
  }

  private def chained[T](
      subs: Array[FilePartition],
      open: FilePartition => PartitionReader[T]): PartitionReader[T] =
    if (subs.length == 1) open(subs(0))
    else new PartitionReader[T] {
      private var i = 0
      private var cur: PartitionReader[T] = _
      override def next(): Boolean = {
        while (true) {
          if (cur == null) {
            if (i >= subs.length) return false
            cur = open(subs(i)); i += 1
          }
          if (cur.next()) return true
          cur.close(); cur = null
        }
        false
      }
      override def get(): T = cur.get()
      override def close(): Unit = if (cur != null) cur.close()
    }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    chained(subPartitions(partition), rowReaderFor)

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[ColumnarBatch] =
    chained(subPartitions(partition), colReaderFor)
}

/** Per-executor probe from a row's key to the newest pending delete
  * snapshot, [[KeyProbe.None]] when no delete targets the key. The
  * shapes: a single long/int merge key (the overwhelmingly common row
  * identity) probes a SORTED ARRAY by binary search — no per-row
  * allocation, no boxing; a single string key probes a hash map with the
  * vector's [[UTF8String]] view — no copy; anything else (composite or
  * exotic keys) falls back to an UnsafeRow-keyed map behind a per-thread
  * projection. Instances are cached per delete-set broadcast and shared
  * across task threads, so implementations must be thread-safe. */
private[graftshim] sealed abstract class KeyProbe {
  /** Newest delete snapshot targeting the row's key ([[KeyProbe.None]]
    * when untargeted). `row` is in the delegate's READ schema. */
  def snapOf(row: InternalRow): Long
  /** True when NO delete key falls in `[min, max]` — licenses a
    * probe-free read of a file whose key column is bounded by that range.
    * Conservative default: absence cannot be proven. */
  def noKeyIn(min: Long, max: Long): Boolean = false
  /** Fills `kept` with the batch ordinals whose rows survive `fileSeq`;
    * returns the surviving count. Default walks the batch's row view;
    * typed probes read the key vector directly. */
  def fillKept(b: ColumnarBatch, fileSeq: Long, kept: Array[Int]): Int = {
    var k = 0
    var i = 0
    val it = b.rowIterator()
    while (it.hasNext) {
      if (snapOf(it.next()) <= fileSeq) { kept(k) = i; k += 1 }
      i += 1
    }
    k
  }
}

private[graftshim] object KeyProbe {
  /** No pending delete targets the key: MinValue is ≤ every add
    * sequence, so the row is kept by the sequence rule. */
  val None: Long = Long.MinValue

  /** UnsafeRow/ColumnVector accessor width of an integral key type
    * (bytes), 0 when the type is not integral. Date/timestamp share the
    * int/long physical domain — the same domain manifest "l" stats use. */
  private[graftshim] def integralWidth(t: DataType): Int = t match {
    case LongType | org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => 8
    case IntegerType | org.apache.spark.sql.types.DateType => 4
    case org.apache.spark.sql.types.ShortType => 2
    case org.apache.spark.sql.types.ByteType => 1
    case _ => 0
  }

  def build(
      entries: Array[(Array[Byte], Long)],
      keyOrdinals: Array[Int],
      keyTypes: Array[DataType]): KeyProbe = {
    if (keyOrdinals.length == 1) {
      val t = keyTypes(0)
      val w = integralWidth(t)
      val fast =
        if (w > 0) buildLong(entries, keyOrdinals(0), w)
        else if (t == StringType) buildUtf8(entries, keyOrdinals(0))
        else scala.None
      fast.getOrElse(buildGeneric(entries, keyOrdinals, keyTypes))
    } else buildGeneric(entries, keyOrdinals, keyTypes)
  }

  // a null key in ANY entry (a row identity should never be null, but
  // nothing structurally forbids it) punts to the generic map, which
  // handles null keys exactly
  private def buildLong(
      entries: Array[(Array[Byte], Long)], ord: Int,
      width: Int): Option[KeyProbe] = {
    val pairs = new Array[(Long, Long)](entries.length)
    var i = 0
    while (i < entries.length) {
      val (bytes, snap) = entries(i)
      val r = new UnsafeRow(1)
      r.pointTo(bytes, bytes.length)
      if (r.isNullAt(0)) return scala.None
      val k = width match {
        case 8 => r.getLong(0)
        case 4 => r.getInt(0).toLong
        case 2 => r.getShort(0).toLong
        case _ => r.getByte(0).toLong
      }
      pairs(i) = (k, snap)
      i += 1
    }
    val sorted = pairs.sortBy(_._1)
    // dedupe in place, newest snapshot wins
    val keys = new Array[Long](sorted.length)
    val snaps = new Array[Long](sorted.length)
    var n = 0
    sorted.foreach { case (k, s) =>
      if (n > 0 && keys(n - 1) == k) snaps(n - 1) = math.max(snaps(n - 1), s)
      else { keys(n) = k; snaps(n) = s; n += 1 }
    }
    Some(new LongKeyProbe(
      java.util.Arrays.copyOf(keys, n), java.util.Arrays.copyOf(snaps, n),
      ord, width))
  }

  private def buildUtf8(
      entries: Array[(Array[Byte], Long)], ord: Int): Option[KeyProbe] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](entries.length * 2)
    var i = 0
    while (i < entries.length) {
      val (bytes, snap) = entries(i)
      val r = new UnsafeRow(1)
      r.pointTo(bytes, bytes.length)
      if (r.isNullAt(0)) return scala.None
      val k = r.getUTF8String(0).clone()
      val prev = m.get(k)
      if (prev == null || prev.longValue() < snap) m.put(k, snap)
      i += 1
    }
    Some(new Utf8KeyProbe(m, ord))
  }

  private def buildGeneric(
      entries: Array[(Array[Byte], Long)],
      keyOrdinals: Array[Int],
      keyTypes: Array[DataType]): KeyProbe = {
    val m = new java.util.HashMap[UnsafeRow, java.lang.Long]()
    val n = keyOrdinals.length
    entries.foreach { case (bytes, snap) =>
      val r = new UnsafeRow(n)
      r.pointTo(bytes, bytes.length)
      val prev = m.get(r)
      if (prev == null || prev.longValue() < snap) m.put(r, snap)
    }
    new GenericKeyProbe(m, keyOrdinals, keyTypes)
  }
}

private[graftshim] final class LongKeyProbe(
    keys: Array[Long], snaps: Array[Long], ord: Int, width: Int)
  extends KeyProbe {

  private def snapOfKey(k: Long): Long = {
    val i = java.util.Arrays.binarySearch(keys, k)
    if (i >= 0) snaps(i) else KeyProbe.None
  }
  override def snapOf(row: InternalRow): Long =
    if (row.isNullAt(ord)) KeyProbe.None
    else snapOfKey(width match {
      case 8 => row.getLong(ord)
      case 4 => row.getInt(ord).toLong
      case 2 => row.getShort(ord).toLong
      case _ => row.getByte(ord).toLong
    })
  override def noKeyIn(min: Long, max: Long): Boolean = {
    val i = java.util.Arrays.binarySearch(keys, min)
    if (i >= 0) false
    else {
      val lb = -i - 1 // first key > min (min itself is absent)
      lb >= keys.length || keys(lb) > max
    }
  }
  override def fillKept(b: ColumnarBatch, fileSeq: Long, kept: Array[Int]): Int = {
    val v = b.column(ord)
    val n = b.numRows()
    var k = 0
    var i = 0
    while (i < n) {
      val dropped = !v.isNullAt(i) && snapOfKey(width match {
        case 8 => v.getLong(i)
        case 4 => v.getInt(i).toLong
        case 2 => v.getShort(i).toLong
        case _ => v.getByte(i).toLong
      }) > fileSeq
      if (!dropped) { kept(k) = i; k += 1 }
      i += 1
    }
    k
  }
}

private[graftshim] final class Utf8KeyProbe(
    m: java.util.HashMap[UTF8String, java.lang.Long], ord: Int)
  extends KeyProbe {

  override def snapOf(row: InternalRow): Long = {
    if (row.isNullAt(ord)) return KeyProbe.None
    val snap = m.get(row.getUTF8String(ord))
    if (snap == null) KeyProbe.None else snap.longValue()
  }
  override def fillKept(b: ColumnarBatch, fileSeq: Long, kept: Array[Int]): Int = {
    val v = b.column(ord)
    val n = b.numRows()
    var k = 0
    var i = 0
    while (i < n) {
      val dropped = !v.isNullAt(i) && {
        val snap = m.get(v.getUTF8String(i))
        snap != null && snap.longValue() > fileSeq
      }
      if (!dropped) { kept(k) = i; k += 1 }
      i += 1
    }
    k
  }
}

private[graftshim] final class GenericKeyProbe(
    m: java.util.HashMap[UnsafeRow, java.lang.Long],
    keyOrdinals: Array[Int],
    keyTypes: Array[DataType])
  extends KeyProbe {

  // UnsafeProjection is stateful (reused output buffer): one per task
  // thread, since the probe itself is shared executor-wide
  private val proj = ThreadLocal.withInitial[UnsafeProjection](() =>
    UnsafeProjection.create(
      keyOrdinals.zip(keyTypes).map { case (i, t) =>
        BoundReference(i, t, nullable = true)
      }.toIndexedSeq))

  override def snapOf(row: InternalRow): Long = {
    val snap = m.get(proj.get()(row))
    if (snap == null) KeyProbe.None else snap.longValue()
  }
}

/** Zero-copy SELECTION VIEW over a delegate [[ColumnVector]]: row `i` of
  * the view reads the delegate's `sel(i)`. The columnar spelling of a
  * filtered batch — the equality-delete apply emits one of these per
  * affected batch instead of falling back to row-based reads (or copying
  * survivors into fresh vectors). Works for every type, including nested
  * ones: scalar getters remap the row ordinal; `getArray`/`getMap`
  * delegate whole (their return values are anchored in the delegate's
  * child vectors); `getChild` (struct fields) re-wraps so struct-field
  * access remaps through the same selection. `hasNull`/`numNulls` may
  * over-report (they answer for the delegate's full batch) — consumers
  * use them only to pick the null-checking code path, so over-reporting
  * is safe, under-reporting would not be. The delegate's lifecycle stays
  * with the underlying reader, so `close()` is a no-op. */
private[graftshim] final class SelectedColumnVector(
    src: ColumnVector,
    sel: Array[Int])
  extends ColumnVector(src.dataType()) {

  override def close(): Unit = ()
  override def hasNull: Boolean = src.hasNull
  override def numNulls: Int = src.numNulls
  override def isNullAt(rowId: Int): Boolean = src.isNullAt(sel(rowId))
  override def getBoolean(rowId: Int): Boolean = src.getBoolean(sel(rowId))
  override def getByte(rowId: Int): Byte = src.getByte(sel(rowId))
  override def getShort(rowId: Int): Short = src.getShort(sel(rowId))
  override def getInt(rowId: Int): Int = src.getInt(sel(rowId))
  override def getLong(rowId: Int): Long = src.getLong(sel(rowId))
  override def getFloat(rowId: Int): Float = src.getFloat(sel(rowId))
  override def getDouble(rowId: Int): Double = src.getDouble(sel(rowId))
  override def getArray(rowId: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    src.getArray(sel(rowId))
  override def getMap(rowId: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    src.getMap(sel(rowId))
  override def getDecimal(rowId: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    src.getDecimal(sel(rowId), precision, scale)
  override def getUTF8String(rowId: Int): UTF8String =
    src.getUTF8String(sel(rowId))
  override def getBinary(rowId: Int): Array[Byte] = src.getBinary(sel(rowId))
  override def getChild(ordinal: Int): ColumnVector =
    new SelectedColumnVector(src.getChild(ordinal), sel)
}

private[graftshim] object EqDeleteReaderFactory {
  // per-executor probe cache, one entry per delete-set broadcast; the
  // broadcast id is process-unique and probes are delta-sized, so a
  // bounded soft footprint beats rebuilding per task
  private[graftshim] val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, KeyProbe]()
}

/** Position-delete retain pass over a batch's already-kept ordinals: both
  * the batch's row-index column and the file's deleted-position list are
  * ascending, so one merge walk filters the kept set — no per-row binary
  * search. */
private[graftshim] object PosFilter {
  def retain(
      rowIdx: ColumnVector,
      positions: Array[Long],
      kept: Array[Int],
      k: Int): Int = {
    var out = 0
    var i = 0
    var p = 0
    while (i < k) {
      val pos = rowIdx.getLong(kept(i))
      while (p < positions.length && positions(p) < pos) p += 1
      if (p >= positions.length || positions(p) != pos) {
        kept(out) = kept(i); out += 1
      }
      i += 1
    }
    out
  }
}

/** A constant string vector — the columnar spelling of the synthesized
  * `_file` metadata column (one table-relative path per sub-file reader).
  * Selection-invariant: every row reads the same value, so the
  * delete-apply's selection view passes it through unwrapped. */
private[graftshim] final class ConstUtf8Vector(v: UTF8String)
  extends ColumnVector(StringType) {
  override def close(): Unit = ()
  override def hasNull: Boolean = false
  override def numNulls: Int = 0
  override def isNullAt(rowId: Int): Boolean = false
  override def getUTF8String(rowId: Int): UTF8String = v
  override def getBoolean(rowId: Int): Boolean =
    throw new UnsupportedOperationException
  override def getByte(rowId: Int): Byte =
    throw new UnsupportedOperationException
  override def getShort(rowId: Int): Short =
    throw new UnsupportedOperationException
  override def getInt(rowId: Int): Int =
    throw new UnsupportedOperationException
  override def getLong(rowId: Int): Long =
    throw new UnsupportedOperationException
  override def getFloat(rowId: Int): Float =
    throw new UnsupportedOperationException
  override def getDouble(rowId: Int): Double =
    throw new UnsupportedOperationException
  override def getArray(rowId: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    throw new UnsupportedOperationException
  override def getMap(rowId: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    throw new UnsupportedOperationException
  override def getDecimal(rowId: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    throw new UnsupportedOperationException
  override def getBinary(rowId: Int): Array[Byte] = v.getBytes
  override def getChild(ordinal: Int): ColumnVector =
    throw new UnsupportedOperationException
}
