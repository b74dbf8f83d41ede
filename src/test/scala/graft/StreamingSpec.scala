package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.{SessionEvent, SessionOut}

/** Structured Streaming: windowed aggregation under watermark, stateful
  * sessionization, and batch-transform reuse — driven with MemoryStream
  * micro-batches.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed counts under watermark aggregate per window and type") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val counts = Streams.windowedEventCounts(
      input.toDF().toDF("ts", "event_type", "value"),
      watermarkDelay = "10 minutes", windowLength = "30 minutes")
    val q = counts.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((ts(0), "view", 1.0), (ts(5), "view", 2.0), (ts(40), "click", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .groupBy("window_start", "event_type")
        .agg(max("n_events").alias("n"), max("total_value").alias("v"))
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(rows(("2024-01-01 10:00:00.0", "view")) == (2L, 3.0))
      assert(rows(("2024-01-01 10:30:00.0", "click")) == (1L, 5.0))
    } finally q.stop()
  }

  test("native session_window runs the same aggregation batch and stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val sessions = input.toDF().toDF("ets", "user_id")
      .withWatermark("ets", "1 hour")
      .groupBy(col("user_id"), session_window(col("ets"), "10 minutes"))
      .agg(count(lit(1)).alias("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Complete()).start()
    try {
      // user 1: events at 10:00, 10:05 (one session), 10:40 (second session)
      input.addData((ts(0), 1L), (ts(5), 1L), (ts(40), 1L))
      q.processAllAvailable()
      val got = spark.table("sess_win").collect()
        .map(r => (r.getLong(0), r.getStruct(1).getTimestamp(0).toString, r.getLong(2)))
        .toSet
      assert(got == Set(
        (1L, "2024-01-01 10:00:00.0", 2L),
        (1L, "2024-01-01 10:40:00.0", 1L)))
      // identical grouping on a batch frame yields the same sessions
      val batch = Seq((ts(0), 1L), (ts(5), 1L), (ts(40), 1L)).toDF("ets", "user_id")
        .groupBy(col("user_id"), session_window(col("ets"), "10 minutes"))
        .agg(count(lit(1)).alias("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getStruct(1).getTimestamp(0).toString, r.getLong(2)))
        .toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("drift-gated sink: in-distribution batches pass, shifted batches quarantine") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-dg").toString
    spark.conf.set("spark.sql.catalog.dg", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dg.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dg.s")
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    empty.writeTo("dg.s.ok").using("parquet").create()
    empty.writeTo("dg.s.bad").using("parquet").create()
    val reference = (1L to 400L).map(i => (i, i % 100)).toDF("id", "v")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dg-ckpt").toString
    val input = MemoryStream[(Long, Long)]
    val q = Streams.sinkToCatalogDriftGated(
      input.toDF().toDF("id", "v"), "dg.s.ok", "dg.s.bad",
      reference, "v", maxChi2 = 50.0, ckpt)
    try {
      input.addData((1001L to 1200L).map(i => (i, i % 100)): _*) // same shape
      q.processAllAvailable()
      input.addData((2001L to 2200L).map(i => (i, 50 + i % 50)): _*) // shifted
      q.processAllAvailable()
      spark.catalog.refreshTable("dg.s.ok"); spark.catalog.refreshTable("dg.s.bad")
      val ok = spark.table("dg.s.ok").select("id").collect().map(_.getLong(0))
      val bad = spark.table("dg.s.bad").select("id").collect().map(_.getLong(0))
      assert(ok.length == 200 && ok.forall(_ <= 1200L), s"ok table: ${ok.length}")
      assert(bad.length == 200 && bad.forall(_ >= 2001L), s"bad table: ${bad.length}")
    } finally q.stop()
  }

  test("streaming materialized view: agg table converges to full recompute") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-mv").toString
    spark.conf.set("spark.sql.catalog.mv", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mv.s")
    // base table + empty aggregate table (the view's initial state)
    val empty = Seq.empty[(String, Long)].toDF("g", "v")
    empty.writeTo("mv.s.base").using("parquet").create()
    graft.ops.Incremental.aggregate(empty, Seq("g"), Seq("v"))
      .writeTo("mv.s.agg").using("parquet").create()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mv-ckpt").toString
    val input = MemoryStream[(String, Long)]
    val q = Streams.sinkWithAggMaintenance(
      input.toDF().toDF("g", "v"), "mv.s.base", "mv.s.agg",
      Seq("g"), Seq("v"), ckpt)
    try {
      input.addData(("x", 1L), ("y", 2L), ("x", 3L))
      q.processAllAvailable()
      input.addData(("y", 10L), ("z", 5L))
      q.processAllAvailable()
      spark.catalog.refreshTable("mv.s.agg")
      spark.catalog.refreshTable("mv.s.base")
      val got = spark.table("mv.s.agg").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = graft.ops.Incremental
        .aggregate(spark.table("mv.s.base"), Seq("g"), Seq("v")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want && got == Set(("x", 2L, 4L), ("y", 2L, 12L), ("z", 1L, 5L)))
      // per-batch history of the VIEW is time-travelable (snapshot per fold)
      assert(spark.sql("SELECT sum(cnt) FROM mv.s.agg VERSION AS OF 2")
        .collect().head.getLong(0) == 3L)
    } finally q.stop()
  }

  test("streaming count-min maintenance: folded sketch == batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.SketchAggregates.countMinAgg
    val wh = java.nio.file.Files.createTempDirectory("graft-cms").toString
    spark.conf.set("spark.sql.catalog.cms", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cms.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cms.s")
    // initial state: the empty sketch (all-zero table)
    Seq.empty[String].toDF("t")
      .agg(countMinAgg(xxhash64(col("t")), 2, 8).as("cms"))
      .writeTo("cms.s.sketch").using("parquet").create()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cms-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = Streams.sinkWithSketchMaintenance(
      input.toDF().toDF("doc_id", "text"), "text", "cms.s.sketch",
      depth = 2, width = 8, ckpt)
    val all = Seq((1L, "a a b"), (2L, "b c"), (3L, "a c c d"))
    try {
      input.addData(all(0)); q.processAllAvailable()
      input.addData(all(1), all(2)); q.processAllAvailable()
      spark.catalog.refreshTable("cms.s.sketch")
      val folded = spark.table("cms.s.sketch").head.getSeq[Long](0)
      val batch = all.toDF("doc_id", "text")
        .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("t"))
        .agg(countMinAgg(xxhash64(col("t")), 2, 8).as("cms"))
        .head.getSeq[Long](0)
      assert(folded == batch) // mergeable across micro-batches, bit-exact
      assert(folded.sum == 2 * 9L) // depth rows x 9 token instances
    } finally q.stop()
  }

  test("streaming bloom maintenance: folded filter == batch filter; " +
    "persisted gate yields exact incremental dedup with no history scan") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.BloomFunctions.bloom_agg
    val bits = 1 << 10
    val wh = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    spark.conf.set("spark.sql.catalog.blm", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS blm.s")
    // initial state: the empty filter (all-zero bitset) with its build
    // parameters riding alongside
    Seq.empty[(Long, String)].toDF("user_id", "event_type")
      .agg(bloom_agg(xxhash64(col("user_id"), col("event_type")), bits, 5).as("bloom"))
      .select(col("bloom"), lit(bits).as("num_bits"), lit(5).as("num_hashes"))
      .writeTo("blm.s.filter").using("parquet").create()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bloom-ckpt").toString
    val input = MemoryStream[(Long, Long, String)]
    val q = Streams.sinkWithBloomMaintenance(
      input.toDF().toDF("event_id", "user_id", "event_type"),
      Seq("user_id", "event_type"), "blm.s.filter", ckpt,
      numBits = bits, numHashes = 5)
    val hist = Seq((1L, 10L, "a"), (2L, 11L, "b"), (3L, 12L, "c"), (4L, 10L, "a"))
    try {
      input.addData(hist(0), hist(1)); q.processAllAvailable()
      input.addData(hist(2), hist(3)); q.processAllAvailable()
      spark.catalog.refreshTable("blm.s.filter")
      val folded = spark.table("blm.s.filter").head.getSeq[Long](0)
      val batch = hist.toDF("event_id", "user_id", "event_type")
        .agg(bloom_agg(xxhash64(col("user_id"), col("event_type")), bits, 5).as("bloom"))
        .head.getSeq[Long](0)
      assert(folded == batch, "OR-fold across micro-batches must be bit-exact")
      // the persisted filter gates a daily batch exactly
      val histDf = hist.toDF("event_id", "user_id", "event_type")
      val today = Seq((5L, 10L, "a"), (6L, 13L, "d"), (7L, 13L, "d"))
        .toDF("event_id", "user_id", "event_type")
      val gated = graft.ops.Dedup.incrementalBloom(histDf, today,
        Seq("user_id", "event_type"), "event_id", numBits = bits,
        precomputed = Some(spark.table("blm.s.filter")))
      val plain = graft.ops.Dedup.incremental(histDf, today,
        Seq("user_id", "event_type"), "event_id")
      assert(gated.exceptAll(plain).isEmpty && plain.exceptAll(gated).isEmpty)
    } finally q.stop()
  }

  test("streaming file-bloom-index maintenance: appended files get indexed " +
    "on cadence, point lookups prune, unindexed tail stays conservative") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-fbloom").toString
    spark.conf.set("spark.sql.catalog.fbl", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.fbl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fbl.s")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fbloom-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = Streams.sinkWithFileBloomIndex(
      input.toDF().toDF("id", "tag").repartition(1),
      "fbl.s.evts", Seq("id"), ckpt, indexEvery = 2)
    def scanned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.map {
        case k: org.apache.spark.sql.graftshim.KeyedScan =>
          k.delegate.fileIndex.inputFiles.length
        case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          p.fileIndex.inputFiles.length
        case other => fail(s"unexpected scan: $other")
      }.head
    try {
      // overlapping id ranges across batches so min/max never prunes
      input.addData((0L, "a"), (100L, "b")); q.processAllAvailable()
      input.addData((1L, "c"), (101L, "d")); q.processAllAvailable() // cadence fires
      spark.catalog.refreshTable("fbl.s.evts")
      assert(spark.table("fbl.s.evts").count() === 4)
      val hit = spark.table("fbl.s.evts").filter(col("id") === 100L)
      assert(scanned(hit) === 1, "both batch files indexed; probe plans one")
      assert(hit.count() === 1)
      // absent-but-in-range: everything bloom-pruned (sentinel file)
      val miss = spark.table("fbl.s.evts").filter(col("id") === 50L)
      assert(scanned(miss) === 1)
      assert(miss.count() === 0)
      // a batch AFTER the cadence firing: its file has no entry — kept
      // conservatively, correctness intact. Probe a value the UNINDEXED
      // file's range straddles but only an indexed file holds: the holder
      // is kept by its bloom, the other indexed file bloom-pruned, the
      // tail kept blind
      input.addData((2L, "e"), (102L, "f")); q.processAllAvailable()
      spark.catalog.refreshTable("fbl.s.evts")
      val probe = spark.table("fbl.s.evts").filter(col("id") === 100L)
      assert(scanned(probe) === 2, "one indexed holder + the unindexed tail")
      assert(probe.count() === 1)
      assert(spark.table("fbl.s.evts").filter(col("id") === 102L).count() === 1)
      // next cadence firing indexes exactly the tail file: the probe now
      // plans the holder alone
      input.addData((3L, "g"), (103L, "h")); q.processAllAvailable()
      spark.catalog.refreshTable("fbl.s.evts")
      assert(scanned(spark.table("fbl.s.evts").filter(col("id") === 100L)) === 1)
      assert(spark.table("fbl.s.evts").count() === 8)
    } finally q.stop()
  }

  test("streaming corpus maintenance: folded state manifests equal the " +
    "batch pipeline over everything ingested; re-ingest is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    spark.conf.set("spark.sql.catalog.corp", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.corp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS corp.s")
    Streams.bootstrapCorpusState(spark, "corp.s.docs", "doc_id", "text", "lang")
    val all = graft.queries.Parity.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang")
    val rows = all.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // arrival order: day d ingests docs with doc_id % 3 == d
    def day(d: Int) = rows.filter(_._1 % 3 == d)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-corpus-ckpt").toString
    val input = MemoryStream[(Long, String, String)]
    val q = Streams.sinkWithCorpusMaintenance(
      input.toDF().toDF("doc_id", "text", "lang"),
      "corp.s.docs", ckpt, "doc_id", "text", "lang")
    def refreshAll(): Unit = Seq("gated", "sigs", "labels", "bloom")
      .foreach(t => spark.catalog.refreshTable(s"corp.s.docs_$t"))
    def manifest(): org.apache.spark.sql.DataFrame =
      graft.ops.TrainPrep.manifestFromState(
        spark.table("corp.s.docs_gated"),
        Streams.latestLabels(spark, "corp.s.docs"),
        "doc_id", "lang")
    try {
      input.addData(day(0).toSeq: _*); q.processAllAvailable()
      input.addData(day(1).toSeq: _*); q.processAllAvailable()
      input.addData(day(2).toSeq: _*); q.processAllAvailable()
      refreshAll()
      // the maintained state's manifest == the batch pipeline over the
      // full corpus with arrival-order priority (first seen wins)
      val scratch = graft.ops.TrainPrep.prepareCorpusNearDup(
        all, "doc_id", "text", "lang",
        priority = pmod(col("doc_id"), lit(3)))
      val got = manifest()
      assert(got.exceptAll(scratch).isEmpty && scratch.exceptAll(got).isEmpty,
        "folded corpus state must manifest exactly the batch pipeline")
      // re-ingesting an already-seen day: every doc exact-dups history —
      // state tables gain nothing, the manifest is unchanged
      val gatedBefore = spark.table("corp.s.docs_gated").count()
      val labelsBefore = spark.table("corp.s.docs_labels").count()
      input.addData(day(1).toSeq: _*); q.processAllAvailable()
      refreshAll()
      assert(spark.table("corp.s.docs_gated").count() == gatedBefore,
        "re-ingest must add no survivors")
      assert(spark.table("corp.s.docs_labels").count() == labelsBefore,
        "re-ingest must change no labels")
      val again = manifest()
      assert(again.exceptAll(scratch).isEmpty && scratch.exceptAll(again).isEmpty)
    } finally q.stop()
  }

  test("label squash: latest-per-id resolution unchanged, replayed squash " +
    "is a no-op, post-squash deltas still win, sink cadence bounds the table") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-lsq").toString
    spark.conf.set("spark.sql.catalog.lsq", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lsq.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lsq.s")
    Streams.bootstrapCorpusState(spark, "lsq.s.docs", "doc_id", "text", "lang")
    // a delta history with relabels: ids 1 and 2 change cluster across seqs
    Seq((1L, 1L, 0L), (2L, 2L, 0L), (1L, 5L, 1L), (3L, 3L, 1L), (2L, 5L, 2L))
      .toDF("id", "cluster_id", "seq")
      .writeTo("lsq.s.docs_labels").append()
    def labelsT() = { spark.catalog.refreshTable("lsq.s.docs_labels")
      spark.table("lsq.s.docs_labels") }
    val before = Streams.latestLabels(spark, "lsq.s.docs").collect().toSet
    assert(labelsT().count() == 5)
    Streams.squashLabels(spark, "lsq.s.docs", txn = Some(("t#sq", 7L)))
    assert(labelsT().count() == 3, "squash must leave one row per id")
    assert(Streams.latestLabels(spark, "lsq.s.docs").collect().toSet == before,
      "squash must not change any resolved label")
    // a replayed squash (same writer txn) commits nothing
    val cat = spark.sessionState.catalogManager.catalog("lsq")
      .asInstanceOf[graft.storage.GraftCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    val identL = Identifier.of(Array("s"), "docs_labels")
    val snap = cat.currentSnapshot(identL)
    Streams.squashLabels(spark, "lsq.s.docs", txn = Some(("t#sq", 7L)))
    assert(cat.currentSnapshot(identL) == snap,
      "a replayed squash must be a no-op commit")
    // ids keep their winning seq through the squash, so later deltas with
    // higher seqs still resolve by the same latest-seq-wins rule
    Seq((1L, 9L, 8L)).toDF("id", "cluster_id", "seq")
      .writeTo("lsq.s.docs_labels").append()
    val resolved = Streams.latestLabels(spark, "lsq.s.docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resolved(1L) == 9L && resolved(2L) == 5L && resolved(3L) == 3L)
    // cadence: the corpus sink squashing EVERY batch still manifests the
    // batch pipeline exactly, and the delta table stays one-row-per-id
    val wh2 = java.nio.file.Files.createTempDirectory("graft-lsq2").toString
    spark.conf.set("spark.sql.catalog.lsq2", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.lsq2.warehouse", wh2)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lsq2.s")
    Streams.bootstrapCorpusState(spark, "lsq2.s.docs", "doc_id", "text", "lang")
    val all = graft.queries.Parity.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang")
    val rows = all.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lsq-ckpt").toString
    val input = MemoryStream[(Long, String, String)]
    val q = Streams.sinkWithCorpusMaintenance(
      input.toDF().toDF("doc_id", "text", "lang"),
      "lsq2.s.docs", ckpt, "doc_id", "text", "lang", squashLabelsEvery = 1)
    try {
      input.addData(rows.filter(_._1 % 2 == 0).toSeq: _*); q.processAllAvailable()
      input.addData(rows.filter(_._1 % 2 == 1).toSeq: _*); q.processAllAvailable()
      Seq("gated", "sigs", "labels", "bloom")
        .foreach(t => spark.catalog.refreshTable(s"lsq2.s.docs_$t"))
      val got = graft.ops.TrainPrep.manifestFromState(
        spark.table("lsq2.s.docs_gated"),
        Streams.latestLabels(spark, "lsq2.s.docs"),
        "doc_id", "lang")
      val scratch = graft.ops.TrainPrep.prepareCorpusNearDup(
        all, "doc_id", "text", "lang",
        priority = pmod(col("doc_id"), lit(2)))
      assert(got.exceptAll(scratch).isEmpty && scratch.exceptAll(got).isEmpty,
        "squash-on-cadence must not change the manifested corpus")
      val lbl = spark.table("lsq2.s.docs_labels")
      assert(lbl.count() == lbl.select(col("id")).distinct().count(),
        "with a squash cadence the delta table stays one row per id")
    } finally q.stop()
  }

  test("streaming bloom maintenance: a stored filter of the wrong size " +
    "fails the batch loudly instead of null-padding into a corrupt gate") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.BloomFunctions.bloom_agg
    val wh = java.nio.file.Files.createTempDirectory("graft-bloommis").toString
    spark.conf.set("spark.sql.catalog.blmm", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blmm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS blmm.s")
    // stored filter built at 64 bits (1 word); the sink runs at 1024 (16)
    Seq.empty[(Long, String)].toDF("user_id", "event_type")
      .agg(bloom_agg(xxhash64(col("user_id"), col("event_type")), 64, 5).as("bloom"))
      .select(col("bloom"), lit(64).as("num_bits"), lit(5).as("num_hashes"))
      .writeTo("blmm.s.filter").using("parquet").create()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bloommis-ckpt").toString
    val input = MemoryStream[(Long, Long, String)]
    val q = Streams.sinkWithBloomMaintenance(
      input.toDF().toDF("event_id", "user_id", "event_type"),
      Seq("user_id", "event_type"), "blmm.s.filter", ckpt,
      numBits = 1 << 10, numHashes = 5)
    try {
      input.addData((1L, 10L, "a"))
      val ex = intercept[Throwable] { q.processAllAvailable() }
      val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
        .map(m => String.valueOf(m.getMessage)).mkString(" | ")
      assert(msgs.contains("refusing to merge"),
        s"expected the size-mismatch refusal, got: $msgs")
      // the stored filter is untouched — corruption never reached the table
      spark.catalog.refreshTable("blmm.s.filter")
      assert(spark.table("blmm.s.filter").head.getSeq[Long](0).length == 1)
    } finally q.stop()
  }

  test("streaming IVF index maintenance: appended micro-batches searchable, " +
    "equal to inline search over the union with the frozen codebook") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-vidxs").toString
    spark.conf.set("spark.sql.catalog.vis", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vis.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vis.s")
    val all = graft.queries.Parity.t(spark, "/root/testdata/sf0.001", "embeddings")
    val initial = all.filter(col("vec_id") % 3 === 0)
    graft.ops.VectorIndex.build(spark, initial, "vec_id", "embedding",
      "vis.s.emb", numCentroids = 8)
    val stored = spark.table("vis.s.emb_centroids")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vidxs-ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Streams.sinkWithIndexMaintenance(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      "vis.s.emb", ckpt)
    val newRows = all.filter(col("vec_id") % 3 =!= 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    try {
      input.addData(newRows.take(newRows.length / 2).toSeq: _*); q.processAllAvailable()
      input.addData(newRows.drop(newRows.length / 2).toSeq: _*); q.processAllAvailable()
      spark.catalog.refreshTable("vis.s.emb_assign")
      val queries = all.filter(col("vec_id") < 5)
      val indexed = graft.ops.VectorIndex.search(spark, queries, "vec_id",
        "embedding", "vis.s.emb", k = 5, nprobe = 3)
      val inline = graft.ops.Similarity.ivfTopK(all, queries, "vec_id",
        "embedding", k = 5, numCentroids = 8, nprobe = 3,
        fitCentroids = Some(stored))
      assert(indexed.exceptAll(inline).isEmpty && inline.exceptAll(indexed).isEmpty,
        "streamed-in vectors must be searchable and equal the inline result")
      assert(spark.table("vis.s.emb_assign").count() == all.count())
    } finally q.stop()
  }

  test("streaming PQ code maintenance: streamed batches' codes fold in " +
    "against the frozen sub-codebook; stored-code search equals inline") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-vpqs").toString
    spark.conf.set("spark.sql.catalog.vps", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vps.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vps.s")
    val all = graft.queries.Parity.t(spark, "/root/testdata/sf0.001", "embeddings")
    // the initial corpus holds the LOWEST ids, so the frozen deterministic
    // seeds (centroids + PQ sub-codebook) equal the union's and the inline
    // composition reproduces the stored artifacts
    val initial = all.filter(col("vec_id") < 400)
    graft.ops.VectorIndex.build(spark, initial, "vec_id", "embedding",
      "vps.s.emb", numCentroids = 8)
    graft.ops.VectorIndex.buildPqCodes(spark, "vps.s.emb",
      numSub = 4, numCodes = 16)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vpqs-ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Streams.sinkWithIndexMaintenance(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      "vps.s.emb", ckpt)
    val newRows = all.filter(col("vec_id") >= 400)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    try {
      input.addData(newRows.take(newRows.length / 2).toSeq: _*); q.processAllAvailable()
      input.addData(newRows.drop(newRows.length / 2).toSeq: _*); q.processAllAvailable()
      Seq("assign", "pq_codes").foreach(t =>
        spark.catalog.refreshTable(s"vps.s.emb_$t"))
      assert(spark.table("vps.s.emb_pq_codes").count() == all.count(),
        "every streamed row must carry codes")
      val queries = all.filter(col("vec_id") < 5)
      val indexed = graft.ops.VectorIndex.searchPq(spark, queries, "vec_id",
        "embedding", "vps.s.emb", k = 5, nprobe = 3, refine = 4)
      val inline = graft.ops.Similarity.ivfPqTopK(all, queries, "vec_id",
        "embedding", k = 5, numCentroids = 8, nprobe = 3,
        numSub = 4, numCodes = 16, refine = 4)
      assert(indexed.exceptAll(inline).isEmpty && inline.exceptAll(indexed).isEmpty,
        "streamed-in codes must serve the IVFADC search exactly")
    } finally q.stop()
  }

  test("streaming IVF maintenance loop: drift gate fires once, WAP refresh " +
    "runs, gate quiet after; no query ever sees a partial index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-viml").toString
    spark.conf.set("spark.sql.catalog.vim", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vim.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vim.s")
    val dim = 16
    def vecA(i: Int): Seq[Float] =
      (0 until dim).map(d => math.sin(i * 0.7 + d * 1.3).toFloat)
    def vecB(i: Int): Seq[Float] =
      (0 until dim).map(d =>
        (if (d == dim - 1) -8f else 0f) + ((i * 13 + d * 5) % 7 - 3) * 0.02f)
    val corpusA = (0 until 1000).map(i => (i.toLong, vecA(i)))
      .toDF("vec_id", "embedding")
    graft.ops.VectorIndex.build(spark, corpusA, "vec_id", "embedding",
      "vim.s.idx", numCentroids = 8, kmeansIters = 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-viml-ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = Streams.sinkWithIndexMaintenance(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      "vim.s.idx", ckpt, maintainEvery = 1, numCentroids = 8,
      kmeansIters = 2, samplePerMille = 1000)
    def refreshAll(): Unit = Seq("assign", "centroids")
      .foreach(t => spark.catalog.refreshTable(s"vim.s.idx_$t"))
    try {
      // batch 0: in-distribution — appended, gate quiet, no maintenance
      input.addData((2000 until 2200).map(i => (i.toLong, vecA(i))): _*)
      q.processAllAvailable(); refreshAll()
      assert(!spark.catalog.tableExists("vim.s.idx_maintenance"),
        "an in-distribution batch must trigger no maintenance")
      assert(spark.table("vim.s.idx_assign").count() == 1200L)
      // batch 1: drifted — gate fires, the sink runs the audited refresh
      input.addData((3000 until 3200).map(i => (i.toLong, vecB(i))): _*)
      q.processAllAvailable(); refreshAll()
      spark.catalog.refreshTable("vim.s.idx_maintenance")
      val actions = spark.table("vim.s.idx_maintenance")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(actions.toSeq == Seq((1L, "refresh")),
        s"expected one refresh at batch 1, got ${actions.toSeq}")
      // the refresh re-assigned the WHOLE corpus (including this batch)
      // under the retrained codebook: no partial state — every stored row
      // probes through a live centroid, and search equals the inline
      // funnel on the published codebook
      assert(spark.table("vim.s.idx_assign").count() == 1400L)
      val book = spark.table("vim.s.idx_centroids")
      val bookIds = book.collect().map(_.getLong(0)).toSet
      val cells = spark.table("vim.s.idx_assign").select(col("cell"))
        .distinct().collect().map(_.getLong(0)).toSet
      assert(cells.subsetOf(bookIds), "every list must probe through the codebook")
      val allRows = corpusA
        .unionByName((2000 until 2200).map(i => (i.toLong, vecA(i)))
          .toDF("vec_id", "embedding"))
        .unionByName((3000 until 3200).map(i => (i.toLong, vecB(i)))
          .toDF("vec_id", "embedding"))
      val queries = (3000 until 3010).map(i => (i.toLong, vecB(i)))
        .toDF("vec_id", "embedding")
      val indexed = graft.ops.VectorIndex.search(spark, queries, "vec_id",
        "embedding", "vim.s.idx", k = 5, nprobe = 2)
      val inline = graft.ops.Similarity.ivfTopK(allRows, queries, "vec_id",
        "embedding", k = 5, numCentroids = 8, nprobe = 2,
        fitCentroids = Some(book))
      assert(indexed.exceptAll(inline).isEmpty && inline.exceptAll(indexed).isEmpty)
      // batch 2: more region-B — the refreshed codebook serves it, gate
      // stays quiet, no second refresh
      input.addData((4000 until 4200).map(i => (i.toLong, vecB(i))): _*)
      q.processAllAvailable(); refreshAll()
      spark.catalog.refreshTable("vim.s.idx_maintenance")
      assert(spark.table("vim.s.idx_maintenance").count() == 1L,
        "the gate must be quiet after the refresh")
      assert(spark.table("vim.s.idx_assign").count() == 1600L)
    } finally q.stop()
  }

  test("streaming tokenizer monitor: UNK gate quiet in-distribution, " +
    "fires once on vocabulary drift, in-engine retrain quiets it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-tok").toString
    spark.conf.set("spark.sql.catalog.tok", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tok.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tok.s")
    // seed corpus: lowercase latin words — merges and vocab learn this shape
    val latin = Seq("the", "brewery", "pours", "amber", "ale", "stone", "hops")
    def latinDoc(i: Int) =
      (0 until 8).map(j => latin((i * 7 + j * 3) % latin.size)).mkString(" ")
    val seed = (0 until 60).map(i => (i.toLong, latinDoc(i))).toDF("doc_id", "text")
    Streams.bootstrapTokenizer(spark, seed, "doc_id", "text", "tok.s.bpe",
      numMerges = 4, topK = 32)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tok-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = Streams.sinkWithTokenizerMonitor(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      "tok.s.bpe", ckpt, checkEvery = 1, maxUnkRate = 0.3,
      numMerges = 4, topK = 32)
    def refreshAll(): Unit = Seq("docs", "merges", "vocab")
      .foreach(t => spark.catalog.refreshTable(s"tok.s.bpe_$t"))
    try {
      // batch 0: same distribution — gate quiet, artifacts untouched
      val mergesBefore = spark.table("tok.s.bpe_merges").collect().toSet
      input.addData((100 until 120).map(i => (i.toLong, latinDoc(i))): _*)
      q.processAllAvailable(); refreshAll()
      assert(!spark.catalog.tableExists("tok.s.bpe_maintenance"),
        "an in-distribution batch must trigger no retrain")
      assert(spark.table("tok.s.bpe_docs").count() == 80L)
      assert(spark.table("tok.s.bpe_merges").collect().toSet == mergesBefore)
      // batch 1: digit-heavy drift — every pre-token is OOV under the
      // latin vocab, the gate fires, the tokenizer retrains over the
      // ACCUMULATED corpus (latin + digits)
      def digitDoc(i: Int) =
        (0 until 8).map(j => ((i * 17 + j * 5) % 9000 + 1000).toString).mkString(" ")
      input.addData((200 until 240).map(i => (i.toLong, digitDoc(i))): _*)
      q.processAllAvailable(); refreshAll()
      spark.catalog.refreshTable("tok.s.bpe_maintenance")
      val actions = spark.table("tok.s.bpe_maintenance")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(actions.length == 1 && actions.head._1 == 1L &&
        actions.head._2.startsWith("retrain:unk="),
        s"expected one retrain at batch 1, got ${actions.toSeq}")
      assert(spark.table("tok.s.bpe_merges").collect().toSet != mergesBefore,
        "the retrain must replace the merge table")
      // the refreshed vocab now carries digit tokens
      val vocabNow = spark.table("tok.s.bpe_vocab")
        .collect().map(_.getString(0)).toSet
      assert(vocabNow.exists(_.forall(_.isDigit)),
        s"retrained vocab must cover the drifted batch: $vocabNow")
      // batch 2: more digits — the refreshed tokenizer serves it, the
      // gate stays quiet, no second retrain
      input.addData((300 until 320).map(i => (i.toLong, digitDoc(i))): _*)
      q.processAllAvailable(); refreshAll()
      spark.catalog.refreshTable("tok.s.bpe_maintenance")
      assert(spark.table("tok.s.bpe_maintenance").count() == 1L,
        "the gate must be quiet after the retrain")
      assert(spark.table("tok.s.bpe_docs").count() == 140L)
    } finally q.stop()
  }

  test("streaming wordpiece monitor: whole-word UNK gate fires once on " +
    "script drift, vocab-only retrain quiets it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-wp").toString
    spark.conf.set("spark.sql.catalog.wpt", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wpt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wpt.s")
    val latin = Seq("the", "brewery", "pours", "amber", "ale", "stone", "hops")
    def latinDoc(i: Int) =
      (0 until 8).map(j => latin((i * 7 + j * 3) % latin.size)).mkString(" ")
    val seed = (0 until 60).map(i => (i.toLong, latinDoc(i))).toDF("doc_id", "text")
    Streams.bootstrapWordPiece(spark, seed, "doc_id", "text", "wpt.s.wp",
      maxPieceLen = 4, topK = 32)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-wp-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = Streams.sinkWithWordPieceMonitor(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      "wpt.s.wp", ckpt, checkEvery = 1, maxUnkRate = 0.3,
      maxPieceLen = 4, topK = 32)
    def refreshAll(): Unit = Seq("docs", "vocab")
      .foreach(t => spark.catalog.refreshTable(s"wpt.s.wp_$t"))
    try {
      // in-distribution: the char floor covers every latin word — quiet
      val vocabBefore = spark.table("wpt.s.wp_vocab").collect().toSet
      input.addData((100 until 120).map(i => (i.toLong, latinDoc(i))): _*)
      q.processAllAvailable(); refreshAll()
      assert(!spark.catalog.tableExists("wpt.s.wp_maintenance"))
      assert(spark.table("wpt.s.wp_vocab").collect().toSet == vocabBefore)
      // digit drift: every word holds chars the vocab never saw — greedy
      // segmentation aborts whole words, the gate fires, vocab retrains
      def digitDoc(i: Int) =
        (0 until 8).map(j => ((i * 17 + j * 5) % 9000 + 1000).toString).mkString(" ")
      input.addData((200 until 240).map(i => (i.toLong, digitDoc(i))): _*)
      q.processAllAvailable(); refreshAll()
      spark.catalog.refreshTable("wpt.s.wp_maintenance")
      val actions = spark.table("wpt.s.wp_maintenance")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(actions.length == 1 && actions.head._1 == 1L &&
        actions.head._2.startsWith("retrain:unk="),
        s"expected one retrain at batch 1, got ${actions.toSeq}")
      val vocabNow = spark.table("wpt.s.wp_vocab")
        .collect().map(_.getString(0)).toSet
      assert(vocabNow.exists(t => t.stripPrefix("##").forall(_.isDigit) &&
        t.stripPrefix("##").nonEmpty),
        s"retrained vocab must cover digits: $vocabNow")
      // quiet after retrain — same digit family (WordPiece pieces are
      // POSITIONAL: a fresh initial digit would be honest drift again, so
      // batch 2 re-draws from batch 1's value range with new doc ids)
      input.addData((300 until 320).map(i => (i.toLong, digitDoc(i - 100))): _*)
      q.processAllAvailable(); refreshAll()
      spark.catalog.refreshTable("wpt.s.wp_maintenance")
      assert(spark.table("wpt.s.wp_maintenance").count() == 1L)
      assert(spark.table("wpt.s.wp_docs").count() == 140L)
    } finally q.stop()
  }

  test("streaming exact dedup drops repeats, state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = Streams.dedupExactStream(
      input.toDF().toDF("ts", "event_id", "payload"),
      "ts", "10 minutes", Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), 1L, "a"), (ts(1), 2L, "b"), (ts(1), 1L, "a-dup"))
      q.processAllAvailable()
      // second arrival of event_id 1 in a later batch, still within watermark
      input.addData((ts(2), 1L, "a-again"), (ts(3), 3L, "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getLong(1)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stateless sketch stream matches the batch signatures bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val docsData = Seq((0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "completely different content about spark engines"))
    val input = MemoryStream[(Long, String)]
    val sketched = Streams.sketchStream(input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = sketched.writeStream.format("memory").queryName("sketch_stream")
      .outputMode(OutputMode.Append()).start()
    val streamed = try {
      input.addData(docsData: _*)
      q.processAllAvailable()
      spark.table("sketch_stream").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    } finally q.stop()
    val batchDf = docsData.toDF("doc_id", "text")
    val sims = graft.ops.Dedup.simhashes(batchDf, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sigs = graft.ops.Dedup.minhashSignatures(batchDf, "doc_id", "text", 3, 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (id <- docsData.map(_._1)) {
      assert(streamed(id)._1 == sims(id), s"simhash mismatch for doc $id")
      assert(streamed(id)._2 == sigs(id), s"minhash mismatch for doc $id")
    }
  }

  test("stream-stream interval join attributes views to purchases") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Long, Timestamp)]
    val joined = Streams.purchaseAttribution(
      purchases.toDF().toDF("user_id", "event_id", "ts"),
      views.toDF().toDF("user_id", "event_id", "ts"),
      lookback = "30 minutes", watermarkDelay = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("attribution")
      .outputMode(OutputMode.Append()).start()
    try {
      views.addData((1L, 100L, ts(0)), (1L, 101L, ts(40)), (2L, 102L, ts(5)))
      purchases.addData((1L, 200L, ts(20)), (2L, 201L, ts(50)))
      q.processAllAvailable()
      val rows = spark.table("attribution").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      // purchase 200 at :20 sees view 100 at :00 (within 30m), not 101 (:40, later)
      // purchase 201 at :50 sees nothing (view 102 at :05 is 45m earlier)
      assert(rows == Set((200L, 100L)))
    } finally q.stop()
  }

  test("foreachBatch sink appends micro-batches as catalog snapshots") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-stream-wh").toString
    spark.conf.set("spark.sql.catalog.gs", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gs.silver")
    spark.sql("CREATE TABLE gs.silver.events (event_id BIGINT, payload STRING) USING parquet")
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = Streams.sinkToCatalog(
      input.toDF().toDF("event_id", "payload"), "gs.silver.events", ckpt)
    try {
      input.addData((1L, "a")); q.processAllAvailable()
      input.addData((2L, "b"), (3L, "c")); q.processAllAvailable()
      assert(spark.table("gs.silver.events").count() == 3)
      // each batch landed as its own snapshot: version 1 holds only batch 1
      assert(spark.sql("SELECT count(*) FROM gs.silver.events VERSION AS OF 1")
        .collect().head.getLong(0) == 1L)
    } finally q.stop()
  }

  test("WAP sink: cross-batch uniqueness gates the publish on a branch") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-wap-wh").toString
    spark.conf.set("spark.sql.catalog.gw", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gw.silver")
    spark.sql("CREATE TABLE gw.silver.keyed (k BIGINT, payload STRING) USING parquet")
    spark.sql("CREATE TABLE gw.silver.quar (k BIGINT, payload STRING) USING parquet")
    val cat = spark.sessionState.catalogManager.catalog("gw")
      .asInstanceOf[graft.storage.GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("silver"), "keyed")
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-wap-ckpt").toString
    val q = Streams.sinkToCatalogWap(
      input.toDF().toDF("k", "payload"), cat, ident,
      "gw.silver.keyed", "gw.silver.quar", ckpt,
      Seq(graft.quality.Expectations.Unique("k")))
    try {
      input.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      // batch 2 repeats key 1: unique WITHIN the batch, duplicate across
      // the merged table — only the branch-merged audit can see it
      input.addData((1L, "dup"), (3L, "c")); q.processAllAvailable()
      input.addData((4L, "d")); q.processAllAvailable()
      val mainRows = spark.table("gw.silver.keyed")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(mainRows == Seq(1L, 2L, 4L), s"main got $mainRows")
      val quar = spark.table("gw.silver.quar")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(quar == Seq(1L, 3L), s"quarantine got $quar")
      // no leftover audit branches
      assert(cat.listRefs(ident).isEmpty)
    } finally q.stop()
  }

  test("streaming sessionization matches the batch operator on the same events") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic event set: 3 users, gaps at > 1000ms
    val events = for (u <- 1L to 3L; i <- 0L until 6L)
      yield SessionEvent(u, u * 100 + i, i * 400 + (if (i >= 4) 3000 else 0))
    // batch truth
    val batchSessions = graft.ops.Relational.sessionize(
        events.toDF("user_id", "event_id", "ts"), "user_id", "ts", "event_id", gap = 1000L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).alias("n"), min("ts").alias("start_ts"), max("ts").alias("end_ts"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("session_id")) ->
        (r.getLong(2), r.getAs[Long]("start_ts"), r.getAs[Long]("end_ts"))).toMap
    // streaming: feed everything, then a far-future event per user to
    // close the last session
    val input = MemoryStream[SessionEvent]
    val q = Streams.sessionize(input.toDS(), gapMs = 1000L)
      .writeStream.format("memory").queryName("sess_eq")
      .outputMode(OutputMode.Append()).start()
    val streamed = try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData((1L to 3L).map(u => SessionEvent(u, u * 100 + 99, 1000000L)): _*)
      q.processAllAvailable()
      spark.table("sess_eq").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_id) -> (s.n_events, s.start_ts, s.end_ts)).toMap
    } finally q.stop()
    assert(streamed == batchSessions,
      s"batch=$batchSessions\nstream=$streamed")
  }

  test("validated sink routes failing micro-batches to quarantine") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-q-wh").toString
    spark.conf.set("spark.sql.catalog.gq", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gq.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gq.silver")
    spark.sql("CREATE TABLE gq.silver.good (event_id BIGINT, name STRING) USING parquet")
    spark.sql("CREATE TABLE gq.silver.bad (event_id BIGINT, name STRING) USING parquet")
    val input = MemoryStream[(Long, Option[String])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-q-ckpt").toString
    val q = Streams.sinkToCatalogValidated(
      input.toDF().toDF("event_id", "name"), "gq.silver.good", "gq.silver.bad",
      ckpt, Seq(graft.quality.Expectations.NotNull("name")))
    try {
      input.addData((1L, Some("a")), (2L, Some("b"))); q.processAllAvailable()
      input.addData((3L, None), (4L, Some("d"))); q.processAllAvailable() // null -> fails
      input.addData((5L, Some("e"))); q.processAllAvailable()
      assert(spark.table("gq.silver.good").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 2L, 5L))
      assert(spark.table("gq.silver.bad").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(3L, 4L)) // the whole failing batch quarantined for replay
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = Streams.sessionize(input.toDS(), gapMs = 1000L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events 500ms apart (one session, still open)
      input.addData(SessionEvent(1L, 1L, 0L), SessionEvent(1L, 2L, 500L))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // nothing closed yet
      // batch 2: event 5s later -> closes session 1
      input.addData(SessionEvent(1L, 3L, 5500L))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[SessionOut].collect()
      assert(closed.length == 1)
      assert(closed.head == SessionOut(1L, 1L, 2L, 0L, 500L))
      // batch 3: another gap closes session 2 (1 event)
      input.addData(SessionEvent(1L, 4L, 10000L))
      q.processAllAvailable()
      val all = spark.table("sessions").as[SessionOut].collect().sortBy(_.session_id)
      assert(all.length == 2 && all(1) == SessionOut(1L, 2L, 1L, 5500L, 5500L))
    } finally q.stop()
  }

  test("watermarked sessionization flushes idle sessions via event-time timeout") {
    import graft.streaming.Streams.TimedEvent
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TimedEvent]
    val sessions = Streams.sessionizeWatermarked(input.toDS(), gapMs = 120000L,
      watermarkDelay = "1 second")
    val q = sessions.writeStream.format("memory").queryName("wm_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // key 1: two events close together; watermark still behind
      input.addData(TimedEvent(1L, 1L, ts(0)), TimedEvent(1L, 2L, ts(1)))
      q.processAllAvailable()
      assert(spark.table("wm_sessions").count() == 0)
      // far-future event on another key pushes the watermark past
      // key 1's lastTs + gap -> its open session must flush on timeout
      input.addData(TimedEvent(2L, 3L, ts(30)))
      q.processAllAvailable()
      input.addData(TimedEvent(2L, 4L, ts(45))) // one more trigger to fire timeouts
      q.processAllAvailable()
      val flushed = spark.table("wm_sessions").as[SessionOut].collect()
      assert(flushed.exists(s => s.user_id == 1L && s.n_events == 2L))
    } finally q.stop()
  }

  test("file-to-file streaming: text source -> silver -> parquet sink with checkpoint") {
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$base/src"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(srcDir).mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/batch1.json"),
      """{"id": "f-1", "name": "File Brew", "brewery_type": "NANO", "city": "Y", "state_province": "wa", "country": "us", "longitude": "9.5", "latitude": "1.0", "phone": "9-9", "postal_code": "2", "website_url": "w"}""" + "\n")
    val raw = spark.readStream.text(srcDir)
      .withColumnRenamed("value", "raw_json")
      .withColumn("extraction_date", lit(java.sql.Date.valueOf("2024-01-15")))
    val q = Streams.silverStream(raw).writeStream
      .format("parquet").option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.read.parquet(outDir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("brewery_type") == "nano")
    assert(out.head.getAs[String]("phone") == "99")
  }

  test("batch Silver transform runs unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Date)]
    val silver = Streams.silverStream(
      input.toDF().toDF("raw_json", "extraction_date"))
    val q = silver.writeStream.format("memory").queryName("silver_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        ("""{"id": "s-1", "name": " Stream Brew ", "brewery_type": "MICRO", "city": "X", "state_province": "or", "country": "us", "longitude": "1.5", "latitude": "2.5", "phone": "(1) 2-3", "postal_code": "1", "website_url": "w"}""",
          java.sql.Date.valueOf("2024-01-15")))
      q.processAllAvailable()
      val row = spark.table("silver_stream").collect().head
      assert(row.getAs[String]("brewery_type") == "micro")
      assert(row.getAs[String]("state") == "OR")
      assert(row.getAs[String]("phone") == "123")
      assert(row.getAs[Double]("longitude") == 1.5)
    } finally q.stop()
  }

  test("sinkMergeMor: streaming CDC upserts land as DELTA commits on a " +
    "merge-on-read table — no file rewritten, replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-mor-sink").toString
    spark.conf.set("spark.sql.catalog.morsink", classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.morsink.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS morsink.s")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "w").repartition(1)
      .writeTo("morsink.s.t").using("parquet")
      .tableProperty(graft.storage.GraftCatalog.MergeModeProp, "merge-on-read")
      .tableProperty(graft.storage.GraftCatalog.MergeKeyProp, "id")
      .createOrReplace()
    val dir = new org.apache.hadoop.fs.Path(s"$wh/s/t")
    val fsys = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = graft.storage.GraftCatalog.liveDataFiles(fsys, dir).toSet
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mor-ckpt").toString
    val input = MemoryStream[(Long, String, Long, String)]
    val q = Streams.sinkMergeMor(
      input.toDF().toDF("id", "w", "seq", "op"),
      "morsink.s.t", "id", "seq", "op", ckpt)
    try {
      // batch 1: update 2, delete 3, insert 4 — with an in-batch
      // superseded change for key 2 (seq 1 loses to seq 2)
      input.addData((2L, "OLD", 1L, "upsert"), (2L, "B", 2L, "upsert"),
        (3L, "c", 1L, "delete"), (4L, "D", 1L, "upsert"))
      q.processAllAvailable()
      spark.catalog.refreshTable("morsink.s.t")
      val out1 = spark.table("morsink.s.t").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(out1 == Seq((1L, "a"), (2L, "B"), (4L, "D")), s"got $out1")
      // the defining MoR property: every pre-stream file is still live
      assert(before.subsetOf(
        graft.storage.GraftCatalog.liveDataFiles(fsys, dir).toSet),
        "a streaming merge batch must not rewrite data files")
      // batch 2 REPLAYS batch 1's changes (at-least-once source): keyed
      // merge is effect-idempotent — same end state
      input.addData((2L, "B", 2L, "upsert"), (3L, "c", 1L, "delete"),
        (4L, "D", 1L, "upsert"))
      q.processAllAvailable()
      spark.catalog.refreshTable("morsink.s.t")
      val out2 = spark.table("morsink.s.t").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(out2 == out1, s"replay must be a no-op, got $out2")
    } finally q.stop()
  }

  test("graft-table streaming SOURCE: a catalog table tails as a " +
    "micro-batch stream — appends and MoR upserts surface exactly once, " +
    "in-range deletes apply, no retraction of earlier batches") {
    val wh = java.nio.file.Files.createTempDirectory("graft-src-wh").toString
    spark.conf.set("spark.sql.catalog.tailcat",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tailcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tailcat.s")
    Seq((1L, "a"), (2L, "b")).toDF("id", "w").repartition(1)
      .writeTo("tailcat.s.src").using("parquet")
      .tableProperty(graft.storage.GraftCatalog.MergeModeProp, "merge-on-read")
      .tableProperty(graft.storage.GraftCatalog.MergeKeyProp, "id")
      .createOrReplace()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-src-ckpt").toString
    val q = spark.readStream.format("graft-table")
      .option("table", "tailcat.s.src")
      .load()
      .writeStream.format("memory").queryName("tail_out")
      .option("checkpointLocation", ckpt)
      .start()
    def seen(): Seq[(Long, String)] = spark.table("tail_out")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    try {
      // batch 1: the initial snapshot (startingSnapshot defaults to 0)
      q.processAllAvailable()
      assert(seen() == Seq((1L, "a"), (2L, "b")), s"got ${seen()}")
      // an append surfaces ONLY its own rows
      Seq((3L, "c")).toDF("id", "w").writeTo("tailcat.s.src").append()
      q.processAllAvailable()
      assert(seen() == Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // a MoR upsert surfaces the REPLACEMENT row (new data file); the
      // old version emitted earlier is not retracted — added-rows
      // semantics, documented
      Seq((2L, "B2")).toDF("id", "w").createOrReplaceTempView("tail_up")
      spark.sql("""MERGE INTO tailcat.s.src t USING tail_up s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET w = s.w""")
      q.processAllAvailable()
      assert(seen() == Seq((1L, "a"), (2L, "B2"), (2L, "b"), (3L, "c")))
    } finally q.stop()
    // three commits land while the stream is DOWN — an insert, a MERGE
    // deleting it, and a real append. The restarted stream reads them as
    // ONE incr range: the in-range delete applies (sequence rule), so
    // the short-lived row never surfaces, and nothing replays
    Seq((9L, "ghost")).toDF("id", "w").writeTo("tailcat.s.src").append()
    Seq(9L).toDF("id").createOrReplaceTempView("tail_del")
    spark.sql("""MERGE INTO tailcat.s.src t USING tail_del s ON t.id = s.id
      WHEN MATCHED THEN DELETE""")
    Seq((4L, "d")).toDF("id", "w").writeTo("tailcat.s.src").append()
    // (the memory sink cannot recover a checkpoint; foreachBatch can)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q2 = spark.readStream.format("graft-table")
      .option("table", "tailcat.s.src")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add((r.getLong(0), r.getString(1)))); ()
      }
      .start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val out2 = got.asScala.toSeq.sorted
      assert(out2 == Seq((4L, "d")),
        s"restart must resume at the checkpointed snapshot, apply the " +
          s"in-range delete, and replay nothing — got $out2")
    } finally q2.stop()
  }

  test("graft-table streaming SOURCE prunes columns per micro-batch: a " +
    "narrow query reads a narrow delegate scan, a full query reads full") {
    val wh = java.nio.file.Files.createTempDirectory("graft-prune-wh").toString
    spark.conf.set("spark.sql.catalog.prunecat",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.prunecat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS prunecat.s")
    Seq((1L, "a", 10.0, "x", 100L), (2L, "b", 20.0, "y", 200L))
      .toDF("id", "w", "score", "tag", "bytes").repartition(1)
      .writeTo("prunecat.s.wide").using("parquet").createOrReplace()
    def plannedCols(): Seq[String] =
      graft.sources.GraftTableStreamSource.lastPlannedReadSchema
        .get("s.wide").fieldNames.toSeq
    // narrow query: Project(id, w) over the stream — the injected rule
    // must narrow the per-batch delegate scan to exactly those columns
    val q = spark.readStream.format("graft-table")
      .option("table", "prunecat.s.wide")
      .load()
      .select("id", "w")
      .writeStream.format("memory").queryName("prune_narrow")
      .start()
    try {
      q.processAllAvailable()
      assert(plannedCols() == Seq("id", "w"),
        s"expected a pruned delegate read, got ${plannedCols()}")
      assert(spark.table("prune_narrow").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "b")))
      // the rule runs per micro-batch: a later batch stays narrow
      Seq((3L, "c", 30.0, "z", 300L)).toDF("id", "w", "score", "tag", "bytes")
        .writeTo("prunecat.s.wide").append()
      q.processAllAvailable()
      assert(plannedCols() == Seq("id", "w"))
      assert(spark.table("prune_narrow").count() == 3L)
    } finally q.stop()
    // full-width query: nothing to prune, the delegate reads everything
    val q2 = spark.readStream.format("graft-table")
      .option("table", "prunecat.s.wide")
      .load()
      .writeStream.format("memory").queryName("prune_full")
      .start()
    try {
      q2.processAllAvailable()
      assert(plannedCols() == Seq("id", "w", "score", "tag", "bytes"))
      assert(spark.table("prune_full").count() == 3L)
    } finally q2.stop()
  }

  test("graft-table streaming SOURCE over a PARTITIONED table: rows stay " +
    "aligned with the declared column order (partition cols reordered by " +
    "the delegate are projected back)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-part-wh").toString
    spark.conf.set("spark.sql.catalog.partcat",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.partcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS partcat.s")
    // schema (id, region, v): region is the MIDDLE column and the
    // partition column — the bare delegate reads (id, v, region), so an
    // unprojected stream would serve v as region (silent corruption)
    Seq((1L, "us", 10.0), (2L, "de", 20.0), (3L, "us", 30.0))
      .toDF("id", "region", "v")
      .writeTo("partcat.s.pt").using("parquet")
      .partitionedBy(col("region")).createOrReplace()
    val q = spark.readStream.format("graft-table")
      .option("table", "partcat.s.pt")
      .load()
      .writeStream.format("memory").queryName("part_tail")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("part_tail").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSeq == Seq((1L, "us", 10.0), (2L, "de", 20.0), (3L, "us", 30.0)))
      // a narrow projection ending ON the partition column: pruned AND
      // aligned
      Seq((4L, "fr", 40.0)).toDF("id", "region", "v")
        .writeTo("partcat.s.pt").append()
      q.processAllAvailable()
      assert(spark.table("part_tail").count() == 4L)
    } finally q.stop()
    val q2 = spark.readStream.format("graft-table")
      .option("table", "partcat.s.pt")
      .load()
      .select("id", "region")
      .writeStream.format("memory").queryName("part_narrow")
      .start()
    try {
      q2.processAllAvailable()
      assert(spark.table("part_narrow").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "us"), (2L, "de"), (3L, "us"), (4L, "fr")))
    } finally q2.stop()
  }

  test("graft-table streaming SOURCE is rewrite-aware: compact AND " +
    "migrate_layout under a live stream re-deliver nothing (exactly-once " +
    "across maintenance)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-maint-wh").toString
    spark.conf.set("spark.sql.catalog.maintcat",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.maintcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS maintcat.s")
    val cat = spark.sessionState.catalogManager.catalog("maintcat")
      .asInstanceOf[graft.storage.GraftCatalog]
    // several small appends: the classic compaction producer
    Seq((1L, "us", 10.0)).toDF("id", "region", "v").repartition(1)
      .writeTo("maintcat.s.mt").using("parquet").createOrReplace()
    Seq((2L, "de", 20.0)).toDF("id", "region", "v")
      .writeTo("maintcat.s.mt").append()
    val q = spark.readStream.format("graft-table")
      .option("table", "maintcat.s.mt")
      .load()
      .writeStream.format("memory").queryName("maint_tail")
      .start()
    def seen(): Seq[Long] = spark.table("maint_tail")
      .collect().map(_.getLong(0)).sorted.toSeq
    try {
      q.processAllAvailable()
      assert(seen() == Seq(1L, 2L))
      // COMPACT while the stream is live: its snapshot is kind=rewrite —
      // the batch spanning it must be empty, not a full re-delivery
      val (before, after) = cat.compact(spark, "s.mt")
      assert(before >= 2 && after == 1)
      q.processAllAvailable()
      assert(seen() == Seq(1L, 2L),
        s"compact re-delivered rows to a live stream: ${seen()}")
      // a real append after the compact surfaces exactly its own rows
      Seq((3L, "us", 30.0)).toDF("id", "region", "v")
        .writeTo("maintcat.s.mt").append()
      q.processAllAvailable()
      assert(seen() == Seq(1L, 2L, 3L))
      // EVOLVE the partition spec (metadata-only — contributes nothing)
      // then MIGRATE_LAYOUT under the live stream: also kind=rewrite
      spark.sql(s"""ALTER TABLE maintcat.s.mt SET TBLPROPERTIES
        ('${graft.storage.GraftCatalog.PartitionByProp}' = 'region')""")
      Seq((4L, "fr", 40.0)).toDF("id", "region", "v")
        .writeTo("maintcat.s.mt").append()
      q.processAllAvailable()
      assert(seen() == Seq(1L, 2L, 3L, 4L))
      val (migrated, keptN) = cat.migrateLayout(spark, "s.mt")
      assert(migrated > 0, "expected a legacy tail to migrate")
      q.processAllAvailable()
      assert(seen() == Seq(1L, 2L, 3L, 4L),
        s"migrate_layout re-delivered rows to a live stream: ${seen()}")
      // and the stream keeps tailing normally afterwards
      Seq((5L, "us", 50.0)).toDF("id", "region", "v")
        .writeTo("maintcat.s.mt").append()
      q.processAllAvailable()
      assert(seen() == Seq(1L, 2L, 3L, 4L, 5L))
    } finally q.stop()
  }

  test("skipOverwriteSnapshots: an appends-only stream ignores a dynamic " +
    "partition overwrite mid-stream, keeps serving appends") {
    val wh = java.nio.file.Files.createTempDirectory("graft-skipow-wh").toString
    spark.conf.set("spark.sql.catalog.skipow",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.skipow.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS skipow.s")
    Seq((1L, "us"), (2L, "de")).toDF("id", "region").repartition(1)
      .writeTo("skipow.s.ow").using("parquet")
      .partitionedBy(col("region")).createOrReplace()          // snap 1
    val q = spark.readStream.format("graft-table")
      .option("table", "skipow.s.ow")
      // snapshot 1 is the create (itself an overwrite commit): start the
      // appends-only tail AFTER it — the documented operating point
      .option("startingSnapshot", "0")
      .option("skipOverwriteSnapshots", "true")
      .load()
      .writeStream.format("memory").queryName("skipow_tail")
      .start()
    def seen(): Seq[Long] = spark.table("skipow_tail")
      .collect().map(_.getLong(0)).sorted.toSeq
    try {
      q.processAllAvailable()
      // with startingSnapshot=0 the initial batch spans the create —
      // which IS an overwrite commit, so an appends-only stream starts
      // empty (pinning the documented startingSnapshot interaction)
      assert(seen() == Seq.empty, s"got ${seen()}")
      Seq((3L, "us")).toDF("id", "region")
        .writeTo("skipow.s.ow").append()                       // snap 2
      q.processAllAvailable()
      assert(seen() == Seq(3L))
      // dynamic partition overwrite mid-stream: replaces the us partition
      // — the default stream would re-deliver the new partition contents;
      // the appends-only stream must deliver NOTHING for it
      Seq((9L, "us")).toDF("id", "region")
        .writeTo("skipow.s.ow").overwritePartitions()          // snap 3
      q.processAllAvailable()
      assert(seen() == Seq(3L),
        s"an appends-only stream must skip the overwrite: ${seen()}")
      // and later appends still flow
      Seq((4L, "fr")).toDF("id", "region")
        .writeTo("skipow.s.ow").append()                       // snap 4
      q.processAllAvailable()
      assert(seen() == Seq(3L, 4L))
    } finally q.stop()
    // control: the DEFAULT stream over the same table serves every
    // snapshot's added rows — including the overwritten partition's OLD
    // contents (live when snapshot 1 committed) and its NEW contents (the
    // cadence-independent per-snapshot walk: same rows as polling after
    // every commit)
    val q2 = spark.readStream.format("graft-table")
      .option("table", "skipow.s.ow")
      .load()
      .writeStream.format("memory").queryName("skipow_all")
      .start()
    try {
      q2.processAllAvailable()
      assert(spark.table("skipow_all").collect().map(_.getLong(0)).sorted
        .toSeq == Seq(1L, 2L, 3L, 4L, 9L))
    } finally q2.stop()
  }

  test("two actions over one foreachBatch df: a narrow first action must " +
    "not leave a stale narrow schema for the full-width second") {
    val wh = java.nio.file.Files.createTempDirectory("graft-fb-wh").toString
    spark.conf.set("spark.sql.catalog.fbcat",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.fbcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fbcat.s")
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "w", "v")
      .writeTo("fbcat.s.fb").using("parquet").createOrReplace()
    val narrow = new java.util.concurrent.atomic.AtomicLong(-1)
    val full = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Double)]()
    val q = spark.readStream.format("graft-table")
      .option("table", "fbcat.s.fb")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // action 1: narrow plan — the prune rule narrows the stream
        narrow.set(df.select("w").count())
        // action 2: full width — re-planned; the rule must RESET the
        // stream's requirement or rows arrive one column wide
        df.collect().foreach(r =>
          full.add((r.getLong(0), r.getString(1), r.getDouble(2))))
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(narrow.get() == 2L)
      import scala.jdk.CollectionConverters._
      assert(full.asScala.toSeq.sorted ==
        Seq((1L, "a", 1.0), (2L, "b", 2.0)))
      // the narrowing from batch 1's first action must not leak into
      // batch 2's OWN source planning (full-width, no Project) — without
      // the per-plan reset the next batch reads one-column rows into a
      // three-attribute relation
      Seq((3L, "c", 3.0)).toDF("id", "w", "v")
        .writeTo("fbcat.s.fb").append()
      q.processAllAvailable()
      assert(narrow.get() == 1L)
      assert(full.asScala.toSeq.sorted ==
        Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    } finally q.stop()
  }

  test("sinkMergeMor under sustained load: N micro-batches fold to the " +
    "batch answer, sidecars accumulate one per delta commit, and " +
    "targeted delete compaction folds them with results unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-mor-sinkn").toString
    spark.conf.set("spark.sql.catalog.morsinkn",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.morsinkn.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS morsinkn.s")
    (0L to 9L).map(i => (i, s"v$i")).toDF("id", "w").repartition(1)
      .writeTo("morsinkn.s.t").using("parquet")
      .tableProperty(graft.storage.GraftCatalog.MergeModeProp, "merge-on-read")
      .tableProperty(graft.storage.GraftCatalog.MergeKeyProp, "id")
      .createOrReplace()
    def eqDelCount: Int = spark.sessionState.catalogManager
      .catalog("morsinkn").asInstanceOf[graft.storage.GraftCatalog]
      .pendingDeletes("s.t").size
    val ckpt = java.nio.file.Files.createTempDirectory("graft-morn-ckpt").toString
    val input = MemoryStream[(Long, String, Long, String)]
    val q = Streams.sinkMergeMor(
      input.toDF().toDF("id", "w", "seq", "op"),
      "morsinkn.s.t", "id", "seq", "op", ckpt)
    // five micro-batches with cross-batch key overlap, re-inserts after
    // deletes, and monotone seqs — the sustained-CDC shape
    val batches = Seq(
      Seq((0L, "b1", 1L, "upsert"), (1L, "x1", 1L, "upsert"),
        (10L, "n1", 1L, "upsert")),
      Seq((1L, "x2", 2L, "upsert"), (2L, "", 2L, "delete")),
      Seq((3L, "y3", 3L, "upsert"), (10L, "n3", 3L, "upsert")),
      Seq((0L, "", 4L, "delete"), (11L, "m4", 4L, "upsert")),
      Seq((11L, "m5", 5L, "upsert"), (4L, "z5", 5L, "upsert"),
        (2L, "back2", 5L, "upsert"))) // re-insert of a deleted key
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.catalog.refreshTable("morsinkn.s.t")
    // the BATCH answer: newest-wins fold of the whole change log over the
    // initial state, hand-applied
    val expected = Seq(
      1L -> "x2", 2L -> "back2", 3L -> "y3", 4L -> "z5",
      5L -> "v5", 6L -> "v6", 7L -> "v7", 8L -> "v8", 9L -> "v9",
      10L -> "n3", 11L -> "m5") // 0 deleted at seq 4
    val out = spark.table("morsinkn.s.t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == expected, s"folded state diverged from the batch answer: $out")
    // every batch MATCHED at least one live key → one sidecar per commit
    assert(eqDelCount == batches.size,
      s"expected ${batches.size} accumulated sidecars, got $eqDelCount")
    // targeted delete compaction folds the accumulated deletes: refs
    // clear, the folded state is byte-for-byte the same
    val cat = spark.sessionState.catalogManager.catalog("morsinkn")
      .asInstanceOf[graft.storage.GraftCatalog]
    val (rew, _) = cat.compactDeletes(spark, "s.t")
    assert(rew > 0)
    spark.catalog.refreshTable("morsinkn.s.t")
    assert(eqDelCount == 0, "compaction must clear the eqdel refs")
    val outC = spark.table("morsinkn.s.t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(outC == expected, s"compaction changed the answer: $outC")
  }

  test("sinkMergeMor on a KEY-LESS merge-on-read table: each batch lands " +
    "as a position-delta commit (sidecar per batch, zero rewrites), the " +
    "folded state matches, and replay is effect-idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-pos-sink").toString
    spark.conf.set("spark.sql.catalog.possink",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.possink.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS possink.s")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "w").repartition(1)
      .writeTo("possink.s.t").using("parquet")
      .tableProperty(graft.storage.GraftCatalog.MergeModeProp, "merge-on-read")
      .createOrReplace() // no merge.key → the position-delete path
    val dir = new org.apache.hadoop.fs.Path(s"$wh/s/t")
    val fsys = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = graft.storage.GraftCatalog.liveDataFiles(fsys, dir).toSet
    val cat = spark.sessionState.catalogManager.catalog("possink")
      .asInstanceOf[graft.storage.GraftCatalog]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pos-ckpt").toString
    val input = MemoryStream[(Long, String, Long, String)]
    val q = Streams.sinkMergeMor(
      input.toDF().toDF("id", "w", "seq", "op"),
      "possink.s.t", "id", "seq", "op", ckpt)
    try {
      input.addData((2L, "B", 1L, "upsert"), (3L, "c", 1L, "delete"),
        (4L, "D", 1L, "upsert"))
      q.processAllAvailable()
      spark.catalog.refreshTable("possink.s.t")
      val out1 = spark.table("possink.s.t").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(out1 == Seq((1L, "a"), (2L, "B"), (4L, "D")), s"got $out1")
      assert(before.subsetOf(
        graft.storage.GraftCatalog.liveDataFiles(fsys, dir).toSet),
        "a key-less streaming merge batch must not rewrite data files")
      assert(cat.pendingPositionDeletes("s.t").nonEmpty,
        "the batch's deletes must land as a position sidecar")
      // replay the same changes: matched rows update again (a new
      // position delta), end state unchanged
      input.addData((2L, "B", 1L, "upsert"), (3L, "c", 1L, "delete"),
        (4L, "D", 1L, "upsert"))
      q.processAllAvailable()
      spark.catalog.refreshTable("possink.s.t")
      val out2 = spark.table("possink.s.t").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(out2 == out1, s"replay must be effect-idempotent, got $out2")
      // compaction folds the accumulated position deltas, results fixed
      val (rew, _) = cat.compactDeletes(spark, "s.t")
      assert(rew > 0)
      spark.catalog.refreshTable("possink.s.t")
      assert(cat.pendingPositionDeletes("s.t").isEmpty)
      val outC = spark.table("possink.s.t").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(outC == out1, s"compaction changed the answer: $outC")
    } finally q.stop()
  }

  test("sinkMergeMor: a batch missing a table column fails by NAME, not " +
    "with an opaque analysis error") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-mor-sinkv").toString
    spark.conf.set("spark.sql.catalog.morsinkv",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.morsinkv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS morsinkv.s")
    Seq((1L, "a", 0.5)).toDF("id", "w", "score").repartition(1)
      .writeTo("morsinkv.s.t").using("parquet")
      .tableProperty(graft.storage.GraftCatalog.MergeModeProp, "merge-on-read")
      .tableProperty(graft.storage.GraftCatalog.MergeKeyProp, "id")
      .createOrReplace()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-morv-ckpt").toString
    val input = MemoryStream[(Long, String, Long, String)]
    // batch carries (id, w, seq, op) but the table also needs `score`
    val q = Streams.sinkMergeMor(
      input.toDF().toDF("id", "w", "seq", "op"),
      "morsinkv.s.t", "id", "seq", "op", ckpt)
    try {
      input.addData((2L, "B", 1L, "upsert"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("score") && m.contains("missing")),
        s"expected the missing column named, got $e")
    } finally q.stop()
  }

  test("foreachBatch hands the user a MATERIALIZED df (LogicalRDD): batch-" +
    "df actions never re-plan the stream scan, so the requirement channel " +
    "has exactly one writer — the engine's sequential batch thread") {
    // This pins the fact that makes the requirement channel's
    // concurrency story SIMPLE: Spark materializes each micro-batch and
    // gives foreachBatch a df over a LogicalRDD, so ad-hoc user actions
    // (broadcast joins included) re-optimize over the RDD, never over
    // the StreamingDataSourceV2ScanRelation — the prune rule cannot fire
    // for them and planInputPartitions is never re-entered concurrently.
    // If a Spark upgrade ever hands foreachBatch a live streaming
    // relation instead, this test fails and the channel's concurrency
    // contract must be re-audited (the local-property carrier is already
    // per-plan-safe for pool threads via withThreadLocalCaptured).
    val wh = java.nio.file.Files.createTempDirectory("graft-bcast-wh").toString
    spark.conf.set("spark.sql.catalog.bccat",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bccat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bccat.s")
    Seq((1L, "a", 10.0, 100L), (2L, "b", 20.0, 200L), (3L, "c", 30.0, 300L))
      .toDF("id", "w", "score", "bytes").repartition(1)
      .writeTo("bccat.s.bw").using("parquet").createOrReplace()
    val joined = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val leaves = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val q = spark.readStream.format("graft-table")
      .option("table", "bccat.s.bw").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        try {
          df.queryExecution.optimizedPlan.collectLeaves()
            .foreach(l => leaves.add(l.getClass.getSimpleName))
          // an ad-hoc broadcast join over the batch handle — correct, and
          // served from the materialized batch, not a re-planned scan
          val probe = spark.range(0, 100).toDF("id")
          probe.join(broadcast(df.select("id", "w")), "id")
            .collect()
            .foreach(r => joined.add((r.getLong(0), r.getString(1))))
        } catch { case e: Throwable => failure.compareAndSet(null, e) }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      if (failure.get() != null) throw failure.get()
      import scala.jdk.CollectionConverters._
      assert(joined.asScala.toSeq.sorted ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")), s"join rows: ${joined.asScala}")
      assert(leaves.asScala.nonEmpty &&
        leaves.asScala.forall(_ == "LogicalRDD"),
        s"foreachBatch df must be LogicalRDD-backed, got ${leaves.asScala}")
    } finally q.stop()
  }

  test("two concurrent streams over one table prune independently: each " +
    "query's delegate reads only its own columns") {
    val wh = java.nio.file.Files.createTempDirectory("graft-2q-wh").toString
    spark.conf.set("spark.sql.catalog.twoqcat",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.twoqcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS twoqcat.s")
    Seq((1L, "a", 10.0, 100L), (2L, "b", 20.0, 200L))
      .toDF("id", "w", "score", "bytes").repartition(1)
      .writeTo("twoqcat.s.wide").using("parquet").createOrReplace()
    def stream(cols: String*)(name: String) =
      spark.readStream.format("graft-table")
        .option("table", "twoqcat.s.wide").load()
        .select(cols.map(col): _*)
        .writeStream.format("memory").queryName(name).start()
    // both queries run at once (each on its own stream-execution thread,
    // each with its OWN stream instance — the requirement channel is
    // per-stream, so neither narrows the other)
    val q1 = stream("id", "w")("twoq_a")
    val q2 = stream("score", "bytes")("twoq_b")
    try {
      q1.processAllAvailable()
      q2.processAllAvailable()
      def planned(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[String] =
        graft.sources.GraftTableStreamSource.lastPlannedReadSchema
          .get(s"${q.id}:s.wide").fieldNames.toSeq
      assert(planned(q1) == Seq("id", "w"),
        s"q1 must read only its columns, got ${planned(q1)}")
      assert(planned(q2) == Seq("score", "bytes"),
        s"q2 must read only its columns, got ${planned(q2)}")
      assert(spark.table("twoq_a").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "b")))
      assert(spark.table("twoq_b").orderBy("score")
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq ==
        Seq((10.0, 100L), (20.0, 200L)))
      // a later batch with both still live: still independent
      Seq((3L, "c", 30.0, 300L)).toDF("id", "w", "score", "bytes")
        .writeTo("twoqcat.s.wide").append()
      q1.processAllAvailable()
      q2.processAllAvailable()
      assert(planned(q1) == Seq("id", "w"))
      assert(planned(q2) == Seq("score", "bytes"))
      assert(spark.table("twoq_a").count() == 3L)
      assert(spark.table("twoq_b").count() == 3L)
    } finally { q1.stop(); q2.stop() }
  }

  test("CONCURRENT actions over one foreachBatch df: a narrow and a " +
    "full-width action racing do not misalign each other's rows") {
    val wh = java.nio.file.Files.createTempDirectory("graft-race-wh").toString
    spark.conf.set("spark.sql.catalog.racecat",
      classOf[graft.storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.racecat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS racecat.s")
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "w", "v")
      .writeTo("racecat.s.rc").using("parquet").createOrReplace()
    val narrowN = new java.util.concurrent.atomic.AtomicLong(-1)
    val full = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Double)]()
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val q = spark.readStream.format("graft-table")
      .option("table", "racecat.s.rc")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // both actions re-plan over the batch's MATERIALIZED LogicalRDD
        // (see "foreachBatch hands the user a MATERIALIZED df"), so this
        // race can never reach the stream's requirement channel — the
        // pin here is end-to-end row correctness under concurrent batch
        // actions, whatever the engine materializes
        val t1 = new Thread(() =>
          try narrowN.set(df.select("w").filter(length(col("w")) > 0).count())
          catch { case e: Throwable => failure.compareAndSet(null, e) })
        val t2 = new Thread(() =>
          try df.collect().foreach(r =>
            full.add((r.getLong(0), r.getString(1), r.getDouble(2))))
          catch { case e: Throwable => failure.compareAndSet(null, e) })
        t1.start(); t2.start(); t1.join(); t2.join()
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      if (failure.get() != null) throw failure.get()
      assert(narrowN.get() == 2L)
      import scala.jdk.CollectionConverters._
      assert(full.asScala.toSeq.sorted == Seq((1L, "a", 1.0), (2L, "b", 2.0)))
      Seq((3L, "c", 3.0)).toDF("id", "w", "v")
        .writeTo("racecat.s.rc").append()
      q.processAllAvailable()
      if (failure.get() != null) throw failure.get()
      assert(narrowN.get() == 1L)
      assert(full.asScala.toSeq.sorted ==
        Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    } finally q.stop()
  }
}
