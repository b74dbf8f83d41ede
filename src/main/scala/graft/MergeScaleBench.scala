package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.GraftCatalog

/** Scale probe for the merge-on-read cost claim: the SAME delta-sized
  * MERGE INTO against a table big enough that the copy-on-write rewrite
  * cost is visible (the sf0.1 DML bench group's 5 k-row tables are too
  * small — there, CoW's full rewrite is trivially cheap and MoR's fixed
  * overhead dominates).
  *
  * Builds an n-row table in `files` data files twice — once
  * copy-on-write, once merge-on-read — and merges a `delta`-row change
  * set (half updates, half inserts) into each. Reports seconds, the
  * number of pre-merge files still live after the commit, and the
  * post-merge read time (MoR pays a read tax until compaction — that's
  * the trade being measured, not hidden). Prints one JSON line; numbers
  * recorded in SCALE.md §merge-on-read.
  */
object MergeScaleBench {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(64)
    val delta = args.lift(2).map(_.toLong).getOrElse(10000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft-mergescale").toString
    spark.conf.set("spark.sql.catalog.msb", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.msb.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS msb.s")

    def base = spark.range(n).select(col("id"),
      (col("id") % 9973).alias("v"),
      concat(lit("row-"), col("id")).alias("payload"))
    // half the delta updates existing spread-out keys, half inserts new
    def src = spark.range(0, delta / 2).select(
        (col("id") * lit(n / (delta / 2))).alias("id"),
        lit(-1L).alias("v"), lit("updated").alias("payload"))
      .unionByName(spark.range(n, n + delta / 2).select(col("id"),
        lit(-2L).alias("v"), lit("inserted").alias("payload")))

    def build(name: String, mor: Boolean, keyed: Boolean = true): Unit = {
      val w = base.repartition(files)
        .writeTo(s"msb.s.$name").using("parquet")
      (if (mor && keyed)
        w.tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
          .tableProperty(GraftCatalog.MergeKeyProp, "id")
      else if (mor)
        w.tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      else w).createOrReplace()
    }

    def liveFiles(name: String): Set[String] = {
      val dir = new Path(s"$wh/s/$name")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      GraftCatalog.liveDataFiles(fs, dir).toSet
    }

    def merge(name: String): Double = {
      src.createOrReplaceTempView("msb_src")
      val (sec, _) = time {
        spark.sql(s"""MERGE INTO msb.s.$name t USING msb_src s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET v = s.v, payload = s.payload
          WHEN NOT MATCHED THEN INSERT *""")
      }
      spark.catalog.refreshTable(s"msb.s.$name")
      sec
    }

    build("cow", mor = false); build("mor", mor = true)
    // the KEY-LESS variant: same table, no merge.key — the MERGE goes
    // through the position-delete path (rowId = _file/_pos)
    build("pos", mor = true, keyed = false)
    val cowBefore = liveFiles("cow"); val morBefore = liveFiles("mor")
    val posBefore = liveFiles("pos")
    val cowSec = merge("cow")
    val morSec = merge("mor")
    val posSec = merge("pos")
    val cowSurvived = (cowBefore intersect liveFiles("cow")).size
    val morSurvived = (morBefore intersect liveFiles("mor")).size
    val posSurvived = (posBefore intersect liveFiles("pos")).size
    val (cowRead, cowCnt) = time(spark.table("msb.s.cow").count())
    val (morRead, morCnt) = time(spark.table("msb.s.mor").count())
    val (posRead, posCnt) = time(spark.table("msb.s.pos").count())
    require(cowCnt == morCnt && cowCnt == posCnt,
      s"result divergence: $cowCnt vs $morCnt vs $posCnt")
    val (compactSec, _) = time {
      spark.sessionState.catalogManager.catalog("msb")
        .asInstanceOf[GraftCatalog].compact(spark, "s.mor", 8)
    }
    spark.catalog.refreshTable("msb.s.mor")
    val (morReadAfter, _) = time(spark.table("msb.s.mor").count())

    // TARGETED delete compaction on a key-clustered table under a
    // LOCALIZED delete set (the daily-retention shape): candidacy =
    // sequence rule ∧ key-stats overlap, so only the ranges actually
    // holding deleted keys rewrite
    base.repartitionByRange(files, col("id"))
      .writeTo("msb.s.mor2").using("parquet")
      .tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      .tableProperty(GraftCatalog.MergeKeyProp, "id")
      .createOrReplace()
    spark.range(0, delta).select(col("id"), lit(-3L).alias("v"),
        lit("x").alias("payload"))
      .createOrReplaceTempView("msb_localdel")
    spark.sql("""MERGE INTO msb.s.mor2 t USING msb_localdel s ON t.id = s.id
      WHEN MATCHED THEN DELETE""")
    spark.catalog.refreshTable("msb.s.mor2")
    val msbCat = spark.sessionState.catalogManager.catalog("msb")
      .asInstanceOf[GraftCatalog]
    // pending-delete read on the CLUSTERED table: the localized delete
    // set clears almost every file's key range, so the stats-based
    // probe skip should make this read nearly clean BEFORE compaction
    val (mor2PendRead, mor2PendCnt) = time(spark.table("msb.s.mor2").count())
    require(mor2PendCnt == n - delta, s"pending read wrong: $mor2PendCnt")
    // candidate test in isolation (dry run): the distributed
    // keys × file-stats join, no rewrite — timed at 1× and 4× the delta
    // to show the test scales with the DELETE SET, not the table
    val (cand1Sec, cand1) = time(msbCat.compactDeletesDryRun(spark, "s.mor2"))
    val (delcSec, delc) = time(msbCat.compactDeletes(spark, "s.mor2"))
    spark.catalog.refreshTable("msb.s.mor2")
    val (mor2Read, mor2Cnt) = time(spark.table("msb.s.mor2").count())
    require(mor2Cnt == n - delta, s"targeted compaction lost rows: $mor2Cnt")
    require(cand1.size == delc._1,
      s"dry run must price the real rewrite: ${cand1.size} vs ${delc._1}")
    base.repartitionByRange(files, col("id"))
      .writeTo("msb.s.mor3").using("parquet")
      .tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      .tableProperty(GraftCatalog.MergeKeyProp, "id")
      .createOrReplace()
    spark.range(0, 4 * delta).select(col("id"), lit(-4L).alias("v"),
        lit("x").alias("payload"))
      .createOrReplaceTempView("msb_localdel4")
    spark.sql("""MERGE INTO msb.s.mor3 t USING msb_localdel4 s ON t.id = s.id
      WHEN MATCHED THEN DELETE""")
    spark.catalog.refreshTable("msb.s.mor3")
    val (cand4Sec, cand4) = time(msbCat.compactDeletesDryRun(spark, "s.mor3"))

    // position-delete targeted compaction: a LOCALIZED row-level delete
    // on a clustered KEY-LESS table. Position deletes name their target
    // files outright (target liveness, no stats/bloom candidate test),
    // so compaction rewrites exactly the files holding deleted rows —
    // on any layout, with no key column declared at all
    base.repartitionByRange(files, col("id"))
      .writeTo("msb.s.pos2").using("parquet")
      .tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      .createOrReplace()
    // length() keeps the predicate untranslatable → row-level plan
    spark.sql(s"""DELETE FROM msb.s.pos2
      WHERE id < $delta AND length(payload) > 0""")
    spark.catalog.refreshTable("msb.s.pos2")
    val (pos2PendRead, pos2PendCnt) = time(spark.table("msb.s.pos2").count())
    require(pos2PendCnt == n - delta, s"pos pending read wrong: $pos2PendCnt")
    val (posDelcSec, posDelc) = time(msbCat.compactDeletes(spark, "s.pos2"))
    spark.catalog.refreshTable("msb.s.pos2")
    val (pos2Read, pos2Cnt) = time(spark.table("msb.s.pos2").count())
    require(pos2Cnt == n - delta, s"pos targeted compaction lost rows: $pos2Cnt")
    println(f"""{"bench":"merge_scale","rows":$n,"files":$files,"delta":$delta,"cow_merge_sec":$cowSec%.3f,"mor_merge_sec":$morSec%.3f,"pos_merge_sec":$posSec%.3f,"cow_files_survived":$cowSurvived,"cow_files_before":${cowBefore.size},"mor_files_survived":$morSurvived,"mor_files_before":${morBefore.size},"pos_files_survived":$posSurvived,"pos_files_before":${posBefore.size},"cow_read_sec":$cowRead%.3f,"mor_read_sec":$morRead%.3f,"pos_read_sec":$posRead%.3f,"rows_after":$cowCnt,"mor_compact_sec":$compactSec%.3f,"mor_read_after_compact_sec":$morReadAfter%.3f,"clustered_pending_read_sec":$mor2PendRead%.3f,"delc_files_rewritten":${delc._1},"delc_files_untouched":${delc._2},"delc_sec":$delcSec%.3f,"read_after_delc_sec":$mor2Read%.3f,"cand_1x_sec":$cand1Sec%.3f,"cand_1x_files":${cand1.size},"cand_4x_sec":$cand4Sec%.3f,"cand_4x_files":${cand4.size},"pos_pending_read_sec":$pos2PendRead%.3f,"pos_delc_files_rewritten":${posDelc._1},"pos_delc_files_untouched":${posDelc._2},"pos_delc_sec":$posDelcSec%.3f,"pos_read_after_delc_sec":$pos2Read%.3f}""")
    spark.stop()
  }
}
