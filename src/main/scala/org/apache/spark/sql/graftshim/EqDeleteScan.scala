package org.apache.spark.sql.graftshim

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{DataType, StructType}

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
    tableDir: String)

/** Wraps a parquet [[Scan]] to apply pending equality deletes row-side.
  *
  *  - input partitions are re-planned to ONE PartitionedFile each, so a
  *    reader knows exactly which file (⇒ which add sequence) it serves;
  *  - the reader probes each row's key against a key→max-delete-snapshot
  *    map (built once per task from a broadcast of the delta-sized entry
  *    list) and drops rows with a strictly-newer delete;
  *  - the delegate scan was built with the key columns FORCED into its
  *    required schema; this wrapper projects them back off, so Spark sees
  *    exactly the schema it pruned to.
  *
  * Reads go through the delegate's row-based (non-columnar) reader while
  * deletes are pending — the documented merge-on-read read tax, cleared
  * by compaction, which folds deletes into data files and drops the
  * sidecars from the manifest. */
final case class EqDeleteScan(
    delegate: Scan,
    outputSchema: StructType,
    outputOrdinals: Seq[Int],
    keyOrdinals: Seq[Int],
    keyTypes: Seq[DataType],
    spec: EqDeleteSpec) extends Scan with Batch {

  override def readSchema(): StructType = outputSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"EqDeleteApply(${spec.entries.size} deletes, keys=${spec.keyCols.mkString(",")}) " +
      delegate.description()

  private lazy val delegateBatch = delegate.toBatch

  override def planInputPartitions(): Array[InputPartition] = {
    val flat = delegateBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"equality-delete apply expects file partitions, got $other")
    }
    flat.zipWithIndex.map { case (pf, i) =>
      FilePartition(i, Array(pf)): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val bc = SparkSession.active.sparkContext.broadcast(spec.entries.toArray)
    EqDeleteReaderFactory(delegateBatch.createReaderFactory(), bc,
      keyOrdinals.toArray, keyTypes.toArray, outputSchema,
      outputOrdinals.toArray, delegate.readSchema().length,
      spec.addSeq, spec.tableDir)
  }
}

private[graftshim] final case class EqDeleteReaderFactory(
    inner: PartitionReaderFactory,
    entries: Broadcast[Array[(Array[Byte], Long)]],
    keyOrdinals: Array[Int],
    keyTypes: Array[DataType],
    outputSchema: StructType,
    outputOrdinals: Array[Int],
    readArity: Int,
    addSeq: Map[String, Long],
    tableDir: String) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  // the newest delete snapshot anywhere: a file added at or after it can
  // skip the per-row probe entirely (no delete is strictly newer)
  private lazy val maxDeleteSnap: Long =
    entries.value.foldLeft(Long.MinValue) { case (m, (_, s)) => math.max(m, s) }

  // key -> newest delete snapshot; built once per EXECUTOR per scan (the
  // single-file partitions mean many tasks share one broadcast)
  private def keyMap(): java.util.HashMap[UnsafeRow, java.lang.Long] = {
    // bound the per-executor footprint: a long session scans many delete
    // sets (one broadcast each); wholesale clear is fine — entries rebuild
    // from the still-live broadcast on the next probe
    if (EqDeleteReaderFactory.cache.size > 64) EqDeleteReaderFactory.cache.clear()
    EqDeleteReaderFactory.cache.computeIfAbsent(entries.id, _ => {
      val m = new java.util.HashMap[UnsafeRow, java.lang.Long]()
      val n = keyOrdinals.length
      entries.value.foreach { case (bytes, snap) =>
        val r = new UnsafeRow(n)
        r.pointTo(bytes, bytes.length)
        val prev = m.get(r)
        if (prev == null || prev.longValue() < snap) m.put(r, snap)
      }
      m
    })
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition match {
      case fp: FilePartition =>
        require(fp.files.length == 1,
          s"equality-delete partitions hold one file, got ${fp.files.length}")
        fp.files.head.filePath.toPath.toUri.getPath
      case other => throw new IllegalStateException(s"unexpected partition $other")
    }
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
    // possibly-newer rows
    val fileSeq = addSeq.getOrElse(rel, throw new IllegalStateException(
      s"equality-delete apply: file '$rel' (from '$file') has no add " +
        s"sequence in the scan snapshot's manifest — cannot scope pending " +
        s"deletes; known files: ${addSeq.keys.take(3).mkString(", ")}…"))
    val reader = inner.createReader(partition)
    val project =
      if (outputSchema.length == readArity) null
      else UnsafeProjection.create(
        outputSchema.indices.map(i =>
          BoundReference(outputOrdinals(i), outputSchema(i).dataType,
            outputSchema(i).nullable)).toIndexedSeq)

    if (fileSeq >= maxDeleteSnap) {
      // no pending delete is strictly newer than this file (it was added
      // by or after the newest delete's commit — the steady-state shape
      // of post-merge appends): skip the per-row key probe entirely
      new PartitionReader[InternalRow] {
        override def next(): Boolean = reader.next()
        override def get(): InternalRow = {
          val row = reader.get()
          if (project == null) row else project(row)
        }
        override def close(): Unit = reader.close()
      }
    } else {
      val deletes = keyMap()
      val keyProj = UnsafeProjection.create(
        keyOrdinals.zip(keyTypes).map { case (i, t) =>
          BoundReference(i, t, nullable = true)
        }.toIndexedSeq)
      new PartitionReader[InternalRow] {
        private var current: InternalRow = _
        override def next(): Boolean = {
          while (reader.next()) {
            val row = reader.get()
            val snap = deletes.get(keyProj(row))
            if (snap == null || snap.longValue() <= fileSeq) {
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
}

private[graftshim] object EqDeleteReaderFactory {
  // per-executor key-map cache, one entry per delete-set broadcast; the
  // broadcast id is process-unique and the maps are delta-sized, so a
  // bounded soft footprint beats rebuilding per single-file task
  private[graftshim] val cache =
    new java.util.concurrent.ConcurrentHashMap[
      Long, java.util.HashMap[UnsafeRow, java.lang.Long]]()
}
