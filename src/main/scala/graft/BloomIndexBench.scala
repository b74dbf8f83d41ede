package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.KeyedScan

import graft.storage.GraftCatalog

/** Scale probe for [[graft.storage.GraftCatalog.buildBloomIndex]] — the
  * point-lookup file-skipping story at a volume where it matters:
  *
  * An UNCLUSTERED ingest (rows hash-scattered across files, the shape
  * every streaming append and shuffle-partitioned write produces) gives
  * every file a min/max spanning the whole key domain, so manifest range
  * stats prune NOTHING for `id = x` — the scan opens every file. The
  * bloom index answers exactly this: after one build pass, a present-key
  * probe plans the one file holding the key and an absent-key probe plans
  * zero (one sentinel).
  *
  * Measures, at `n` rows across `files` files: files planned + warm wall
  * time for present/absent point probes without the index, the one-off
  * index build cost, and the same probes with it. Prints one JSON line;
  * numbers recorded in SCALE.md §bloom-index.
  */
object BloomIndexBench {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  private def plannedFiles(df: DataFrame): Int =
    df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b.scan }
      .map {
        case k: KeyedScan => k.delegate.fileIndex.inputFiles.length
        case p: ParquetScan => p.fileIndex.inputFiles.length
        case _ => -1
      }.head

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val files = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = java.nio.file.Files.createTempDirectory("graft-bloombench").toString
    spark.conf.set("spark.sql.catalog.bb", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bb.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bb.s")

    // hash-scatter unique ids across `files` files: every file's [min,max]
    // spans ~the whole domain — range stats provably useless for id = x.
    // Ids are EVEN (2·i) so an odd probe value is absent yet inside every
    // file's range: only the bloom can prove that absence.
    spark.range(n)
      .select((col("id") * 2).alias("id"),
        concat(lit("t"), col("id") * 2).alias("tag"))
      .repartition(files, col("id"))
      .writeTo("bb.s.pts").using("parquet").createOrReplace()

    val present = Seq(12344L, n / 2 * 2 + 2, (n - 7) * 2)
    val absentV = n + 13 // odd -> in-range, never present

    def probe(v: Long): DataFrame =
      spark.table("bb.s.pts").filter(col("id") === v)
    def probeTag(v: Long): DataFrame =
      spark.table("bb.s.pts").filter(col("tag") === s"t$v")

    // warm both paths once, then measure
    present.foreach(v => probe(v).count())
    val preFiles = plannedFiles(probe(present.head))
    val (_, preHit) = time(present.foreach(v => assert(probe(v).count() == 1L)))
    val (_, preMiss) = time(assert(probe(absentV).count() == 0L))

    val cat = spark.sessionState.catalogManager.catalog("bb")
      .asInstanceOf[GraftCatalog]
    val ((fresh, total), buildS) =
      time(cat.buildBloomIndex(spark, "s.pts", Seq("id", "tag")))

    probe(present.head).count()
    val postFiles = plannedFiles(probe(present.head))
    val postMissFiles = plannedFiles(probe(absentV))
    val (_, postHit) = time(present.foreach(v => assert(probe(v).count() == 1L)))
    val (_, postMiss) = time(assert(probe(absentV).count() == 0L))
    val postTagFiles = plannedFiles(probeTag(present.head))
    val (_, postTag) = time(assert(probeTag(present.head).count() == 1L))

    val idxBytes = new java.io.File(s"$wh/s/pts").listFiles()
      .filter(_.getName.startsWith("_bloomidx-")).map(_.length()).sum

    // copy-on-write point DELETE: with the index, the rewrite set is the
    // one file holding the key; without it, every file is a candidate
    val ((delRw, delKept, delRows), delS) =
      time(cat.deleteWhere(spark, "s.pts", col("id") === present.head))

    // METADATA-ONLY retention delete: a range-laid-out table (each file a
    // disjoint id range — the event-time append shape) expires half its
    // files in manifest time, zero data reads; the boundary file rewrites
    spark.range(n).select(col("id"))
      .repartitionByRange(files, col("id"))
      .writeTo("bb.s.ret").using("parquet").createOrReplace()
    val ((retRm, retKept, retRows), retS) =
      time(cat.deleteWhere(spark, "s.ret", col("id") < n / 2))

    println(s"""{"bench":"bloom_index","n":$n,"files":$files,""" +
      s""""pre_files":$preFiles,"pre_hit3_s":${f"$preHit%.3f"},""" +
      s""""pre_miss_s":${f"$preMiss%.3f"},""" +
      s""""build_s":${f"$buildS%.3f"},"indexed":$fresh,"total":$total,""" +
      s""""idx_bytes":$idxBytes,""" +
      s""""post_files":$postFiles,"post_miss_files":$postMissFiles,""" +
      s""""post_tag_files":$postTagFiles,""" +
      s""""post_hit3_s":${f"$postHit%.3f"},"post_miss_s":${f"$postMiss%.3f"},""" +
      s""""post_tag_s":${f"$postTag%.3f"},""" +
      s""""delete_rewritten":$delRw,"delete_carried":$delKept,""" +
      s""""delete_rows":$delRows,"delete_s":${f"$delS%.3f"},""" +
      s""""retention_removed":$retRm,"retention_carried":$retKept,""" +
      s""""retention_rows":$retRows,"retention_s":${f"$retS%.3f"}}""")
    spark.stop()
  }
}
