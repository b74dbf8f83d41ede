package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.write.RowLevelOperation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec

/** The copy-on-write row-level commit's OCC seam, driven directly: the
  * rewrite publishes `prior − scanned + staged` RELATIVE TO the snapshot
  * the scan planned on, so a commit that lands between scan and publish
  * must fail the exclusive create — not be folded into a manifest computed
  * from stale rows (which could, e.g., resurrect rows a concurrent DELETE
  * removed). The end-to-end SQL DML lifecycle runs in FileSkippingSpec;
  * this spec opens the scan→commit window by hand because it lives inside
  * a single command execution.
  */
class RowLevelCommitSpec extends SparkSpec {

  import spark.implicits._

  private lazy val wh = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rlwh").toString
    spark.conf.set("spark.sql.catalog.rlcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rlcat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rlcat.s")
    dir
  }

  test("row-level commit publishes at scan-snapshot + 1: a commit landing " +
    "between scan and publish surfaces as a conflict") {
    val dir = new Path(s"$wh/s/race")
    Seq((1L, "a"), (2L, "b")).toDF("id", "w").repartition(1)
      .writeTo("rlcat.s.race").using("parquet").createOrReplace()
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = GraftCatalog.readMeta(fs, dir).get
    val op = new GraftRowLevelOperation(dir.toString, meta, "s.race",
      RowLevelOperation.Command.UPDATE)
    // plan the rewrite scan: pins scannedFiles AND the snapshot id
    op.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    val scanned = GraftCatalog.latestSnapshot(fs, dir)
    assert(op.scanSnapshot == scanned && op.scannedFiles.nonEmpty)
    // an interloper commits (e.g. a concurrent DELETE) after the scan
    GraftCatalog.writeSnapshotAt(fs, dir, scanned + 1, Seq.empty)
    // the row-level commit must LOSE the race loudly, not publish a
    // manifest computed from the pre-delete rows
    val e = intercept[java.io.IOException] {
      new CowBatchWrite(op, dir.toString, meta, "race-q").commit(Array.empty)
    }
    assert(e.getMessage.contains("concurrent commit"))
    // the interloper's state stands
    assert(GraftCatalog.latestSnapshot(fs, dir) == scanned + 1)
    assert(GraftCatalog.readManifest(fs, dir, scanned + 1).get.isEmpty)
  }

  test("row-level commit without an interloper publishes at scan + 1") {
    val dir = new Path(s"$wh/s/clean")
    Seq((1L, "a")).toDF("id", "w").repartition(1)
      .writeTo("rlcat.s.clean").using("parquet").createOrReplace()
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = GraftCatalog.readMeta(fs, dir).get
    val op = new GraftRowLevelOperation(dir.toString, meta, "s.clean",
      RowLevelOperation.Command.UPDATE)
    op.newScanBuilder(CaseInsensitiveStringMap.empty()).build()
    val scanned = GraftCatalog.latestSnapshot(fs, dir)
    // empty staged set: commit replaces the scanned files with nothing —
    // the shape is what matters (publishes at exactly scanned + 1)
    new CowBatchWrite(op, dir.toString, meta, "clean-q").commit(Array.empty)
    assert(GraftCatalog.latestSnapshot(fs, dir) == scanned + 1)
    assert(GraftCatalog.readManifest(fs, dir, scanned + 1).get.isEmpty)
  }
}
