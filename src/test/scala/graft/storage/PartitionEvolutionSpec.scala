package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PARTITION SPEC EVOLUTION (`write.partition-by`): a metadata-only
  * commit after which new files land under the new directory layout,
  * existing files keep theirs, and one table serves both — each file's
  * partition values come from its own path, its remaining columns from
  * its data. Iceberg's ALTER ... ADD/DROP PARTITION FIELD semantics,
  * re-expressed over the catalog's hive-layout files. Rewrites
  * (compaction, CoW DML) migrate the files they touch to the current
  * spec; dynamic partition overwrite refuses to run while legacy-layout
  * files are live (they could hold rows of the replaced partitions). */
class PartitionEvolutionSpec extends SparkSpec {

  import spark.implicits._

  private lazy val wh = {
    val dir = java.nio.file.Files.createTempDirectory("graft-evowh").toString
    spark.conf.set("spark.sql.catalog.evocat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evocat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evocat.s")
    dir
  }

  private def cat = spark.sessionState.catalogManager.catalog("evocat")
    .asInstanceOf[GraftCatalog]

  private def manifestFiles(name: String): Seq[String] = {
    val dir = new Path(s"$wh/s/$name")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    GraftCatalog.readManifest(fs, dir,
      GraftCatalog.latestSnapshot(fs, dir)).get
  }

  private def evolve(name: String, spec: String): Unit =
    spark.sql(s"""ALTER TABLE evocat.s.$name SET TBLPROPERTIES
      ('${GraftCatalog.PartitionByProp}' = '$spec')""")

  test("unpartitioned -> partitioned: old flat files and new dir files " +
    "serve one table; filters prune and results stay exact") {
    wh
    Seq((1L, "us", 10.0), (2L, "de", 20.0), (3L, "us", 30.0))
      .toDF("id", "region", "v").repartition(1)
      .writeTo("evocat.s.e1").using("parquet").createOrReplace()
    evolve("e1", "region")
    Seq((4L, "us", 40.0), (5L, "fr", 50.0)).toDF("id", "region", "v")
      .writeTo("evocat.s.e1").append()
    spark.catalog.refreshTable("evocat.s.e1")
    // new files landed under region=..., old files stayed flat
    val files = manifestFiles("e1")
    assert(files.exists(f => GraftCatalog.layoutOf(f) == Seq("region")),
      s"expected new-layout files, got $files")
    assert(files.exists(f => GraftCatalog.layoutOf(f).isEmpty),
      s"expected the legacy flat file to survive untouched, got $files")
    val all = spark.table("evocat.s.e1").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(all == Seq((1L, "us", 10.0), (2L, "de", 20.0), (3L, "us", 30.0),
      (4L, "us", 40.0), (5L, "fr", 50.0)))
    // a filter on the (new) partition column is correct across BOTH
    // layouts: data filter on the flat group, dir prune on the new group
    assert(spark.table("evocat.s.e1").filter($"region" === "us")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
    assert(spark.table("evocat.s.e1").agg(sum("v")).head.getDouble(0) == 150.0)
  }

  test("add a partition field: (region) -> (region, day); three layouts " +
    "coexist and aggregate/filter answers stay exact") {
    wh
    Seq((1L, "us", "d1", 1.0), (2L, "de", "d1", 2.0))
      .toDF("id", "region", "day", "v").repartition(1)
      .writeTo("evocat.s.e2").using("parquet")
      .partitionedBy($"region").createOrReplace()
    evolve("e2", "region,day")
    Seq((3L, "us", "d2", 3.0), (4L, "de", "d2", 4.0))
      .toDF("id", "region", "day", "v").writeTo("evocat.s.e2").append()
    evolve("e2", "day")
    Seq((5L, "fr", "d3", 5.0)).toDF("id", "region", "day", "v")
      .writeTo("evocat.s.e2").append()
    spark.catalog.refreshTable("evocat.s.e2")
    val layouts = manifestFiles("e2").map(GraftCatalog.layoutOf).distinct
    assert(layouts.toSet == Set(Seq("region"), Seq("region", "day"), Seq("day")),
      s"expected three coexisting layouts, got $layouts")
    assert(spark.table("evocat.s.e2").count() == 5L)
    assert(spark.table("evocat.s.e2").filter($"region" === "de")
      .select("id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    assert(spark.table("evocat.s.e2").filter($"day" === "d2")
      .agg(sum("v")).head.getDouble(0) == 7.0)
    assert(spark.table("evocat.s.e2").groupBy("region").agg(sum("v").as("s"))
      .orderBy("region").collect().map(r => (r.getString(0), r.getDouble(1)))
      .toSeq == Seq(("de", 6.0), ("fr", 5.0), ("us", 4.0)))
  }

  test("drop to unpartitioned: new files keep the column in data; " +
    "legacy dir files still serve their partition values from the path") {
    wh
    Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "k", "w")
      .writeTo("evocat.s.e3").using("parquet")
      .partitionedBy($"k").createOrReplace()
    evolve("e3", "")
    Seq((3L, "c", "z")).toDF("id", "k", "w").writeTo("evocat.s.e3").append()
    spark.catalog.refreshTable("evocat.s.e3")
    assert(spark.table("evocat.s.e3").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq == Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")))
    // the legacy dir column cannot be dropped while its files are live
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE evocat.s.e3 DROP COLUMN k")
    }
    assert(e.getMessage.contains("partition directory level"),
      s"expected the legacy-layout drop guard, got: ${e.getMessage}")
  }

  test("row-level DML and targeted compaction on an evolved table " +
    "migrate the files they touch to the current spec") {
    wh
    Seq((1L, "us", 1.0), (2L, "de", 2.0), (3L, "us", 3.0))
      .toDF("id", "region", "v").repartition(1)
      .writeTo("evocat.s.e4").using("parquet")
      .tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      .tableProperty(GraftCatalog.MergeKeyProp, "id")
      .createOrReplace()
    evolve("e4", "region")
    // MoR MERGE: delta commit (new-layout replacement file + sidecar),
    // legacy flat file untouched, read applies deletes across layouts
    Seq((2L, "de", 20.0), (4L, "fr", 4.0)).toDF("id", "region", "v")
      .createOrReplaceTempView("e4_up")
    spark.sql("""MERGE INTO evocat.s.e4 t USING e4_up s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, region, v) VALUES (s.id, s.region, s.v)""")
    spark.catalog.refreshTable("evocat.s.e4")
    assert(spark.table("evocat.s.e4").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((1L, "us", 1.0), (2L, "de", 20.0), (3L, "us", 3.0),
        (4L, "fr", 4.0)))
    assert(manifestFiles("e4").exists(f => GraftCatalog.layoutOf(f).isEmpty),
      "MoR delta must not rewrite the legacy file")
    // compaction folds the pending delete INTO the current spec: the
    // affected legacy file is rewritten under region=...
    val (rew, _) = cat.compactDeletes(spark, "s.e4")
    assert(rew >= 1)
    spark.catalog.refreshTable("evocat.s.e4")
    assert(manifestFiles("e4").forall(f =>
      GraftCatalog.layoutOf(f) == Seq("region")),
      s"compaction must migrate rewritten files to the current spec, " +
        s"got ${manifestFiles("e4")}")
    assert(spark.table("evocat.s.e4").filter($"region" === "us").count() == 2L)
  }

  test("dynamic partition overwrite refuses while legacy-layout files " +
    "are live, and works again after migration") {
    wh
    Seq((1L, "us", 1.0), (2L, "de", 2.0)).toDF("id", "region", "v")
      .repartition(1)
      .writeTo("evocat.s.e5").using("parquet").createOrReplace()
    evolve("e5", "region")
    val e = intercept[Exception] {
      Seq((9L, "us", 9.0)).toDF("id", "region", "v")
        .writeTo("evocat.s.e5").overwritePartitions()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("legacy layout"),
      s"expected the evolved-table dynamic-overwrite guard, got: ${msgs(e)}")
    // migrate: a logical truncate-overwrite rewrites everything under the
    // current spec (old files stay on disk for time travel, so the
    // self-read is safe; REPLACE TABLE would physically drop the dir)
    spark.table("evocat.s.e5").writeTo("evocat.s.e5").overwrite(lit(true))
    spark.catalog.refreshTable("evocat.s.e5")
    assert(manifestFiles("e5").forall(f =>
      GraftCatalog.layoutOf(f) == Seq("region")))
    Seq((9L, "us", 9.0)).toDF("id", "region", "v")
      .writeTo("evocat.s.e5").overwritePartitions()
    spark.catalog.refreshTable("evocat.s.e5")
    assert(spark.table("evocat.s.e5").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "de"), (9L, "us")))
  }

  test("runtime group filtering that collapses a mixed rewrite scan to " +
    "ONE layout keeps the planned column order — no row misalignment") {
    wh
    // the OLD spec (region, day) and the NEW single-column spec (region)
    // share `region`, so the runtime In(region, ...) filter (single
    // attribute — translatable; a multi-attribute struct-IN is declined
    // conservatively) CAN prune every legacy file and collapse the
    // rewrite scan to the new layout alone — whose bare delegate would
    // move the partition column to the end and misalign rows with the
    // output attributes planned from the mixed initial scan
    Seq((1L, "r1", "d1", 10.0), (2L, "r2", "d1", 20.0))
      .toDF("id", "region", "day", "v")
      .writeTo("evocat.s.e8").using("parquet")
      .partitionedBy($"region", $"day").createOrReplace()
    evolve("e8", "region")
    Seq((3L, "r9", "d2", 30.0), (4L, "r9", "d3", 40.0))
      .toDF("id", "region", "day", "v").writeTo("evocat.s.e8").append()
    spark.catalog.refreshTable("evocat.s.e8")
    assert(manifestFiles("e8").map(GraftCatalog.layoutOf).distinct.size == 2)
    // copy-on-write MERGE matching ONLY region=r9 rows
    Seq((3L, 300.0), (4L, 400.0)).toDF("id", "nv")
      .createOrReplaceTempView("e8_up")
    spark.sql("""MERGE INTO evocat.s.e8 t USING e8_up s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.nv""")
    spark.catalog.refreshTable("evocat.s.e8")
    assert(spark.table("evocat.s.e8").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3))).toSeq ==
      Seq((1L, "r1", "d1", 10.0), (2L, "r2", "d1", 20.0),
        (3L, "r9", "d2", 300.0), (4L, "r9", "d3", 400.0)))
    // the cold legacy partitions were runtime-pruned, not rewritten
    assert(manifestFiles("e8").exists(f =>
      GraftCatalog.layoutOf(f) == Seq("region", "day")),
      "legacy files outside the matched partitions must survive untouched")
  }

  test("position deletes spanning BOTH layouts: the CDC feed and targeted " +
    "compaction work over the mixed-layout union read") {
    wh
    Seq((1L, "us", "a"), (2L, "de", "b")).toDF("id", "region", "w")
      .repartition(1)
      .writeTo("evocat.s.e9").using("parquet")
      .tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      .createOrReplace()
    evolve("e9", "region")
    Seq((3L, "fr", "c"), (4L, "us", "d")).toDF("id", "region", "w")
      .writeTo("evocat.s.e9").append()
    spark.catalog.refreshTable("evocat.s.e9")
    val snapBefore = {
      val (fs, dir) = {
        val d = new Path(s"$wh/s/e9")
        (d.getFileSystem(spark.sparkContext.hadoopConfiguration), d)
      }
      GraftCatalog.latestSnapshot(fs, dir)
    }
    // one DELETE targeting rows in BOTH layouts (untranslatable conjunct
    // forces the row-level position-delta path)
    spark.sql(
      "DELETE FROM evocat.s.e9 WHERE id IN (2, 3) AND length(w) > 0")
    spark.catalog.refreshTable("evocat.s.e9")
    assert(spark.table("evocat.s.e9").select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 4L))
    // the CDC feed reads the deleted rows through the mixed-layout union
    val fed = cat.deletedRows(spark, "s.e9", snapBefore, snapBefore + 1)
      .select("id").as[Long].collect().sorted.toSeq
    assert(fed == Seq(2L, 3L), s"CDC feed over mixed layouts: $fed")
    // targeted compaction folds both layouts' deletes in
    val (rew, _) = cat.compactDeletes(spark, "s.e9")
    assert(rew >= 1)
    spark.catalog.refreshTable("evocat.s.e9")
    assert(spark.table("evocat.s.e9").select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("evolution is rejected for bucketed tables, unknown columns, and " +
    "reserved names") {
    wh
    Seq((1L, "a")).toDF("id", "w")
      .writeTo("evocat.s.e6").using("parquet").createOrReplace()
    val bad = intercept[Exception] { evolve("e6", "nope") }
    assert(bad.getMessage.contains("not in schema"))
    val res = intercept[Exception] { evolve("e6", "_file") }
    assert(res.getMessage.toLowerCase.contains("reserved"))
  }

  test("plan shape: a mixed-layout read plans the per-layout union scan, " +
    "a uniform table keeps the stock single-delegate scan") {
    wh
    Seq((1L, "us", 1.0)).toDF("id", "region", "v").repartition(1)
      .writeTo("evocat.s.e10").using("parquet").createOrReplace()
    evolve("e10", "region")
    Seq((2L, "de", 2.0)).toDF("id", "region", "v")
      .writeTo("evocat.s.e10").append()
    spark.catalog.refreshTable("evocat.s.e10")
    def scanDesc(t: String): String =
      spark.table(t).filter($"v" > 0).queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }.head
    val mixed = scanDesc("evocat.s.e10")
    assert(mixed.contains("PartitionEvolvedUnion(2 layouts"),
      s"expected the per-layout union scan, got: ${mixed.take(200)}")
    // migrate everything to the current spec: the union scan retires
    spark.table("evocat.s.e10").writeTo("evocat.s.e10").overwrite(lit(true))
    spark.catalog.refreshTable("evocat.s.e10")
    val uniform = scanDesc("evocat.s.e10")
    assert(!uniform.contains("PartitionEvolvedUnion"),
      s"a uniform table must keep the stock scan, got: ${uniform.take(200)}")
  }

  test("time travel: a snapshot before the evolution still reads, and an " +
    "incremental range spanning the evolution serves both layouts") {
    wh
    Seq((1L, "us", 1.0), (2L, "de", 2.0)).toDF("id", "region", "v")
      .repartition(1)
      .writeTo("evocat.s.e7").using("parquet").createOrReplace()
    evolve("e7", "region")
    Seq((3L, "fr", 3.0)).toDF("id", "region", "v")
      .writeTo("evocat.s.e7").append()
    spark.catalog.refreshTable("evocat.s.e7")
    assert(spark.sql("SELECT id FROM evocat.s.e7 VERSION AS OF 1")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(spark.table("evocat.s.e7").count() == 3L)
    // incremental read across the evolution point (snapshot 1 -> latest)
    val parts = Array("s")
    val incr = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(parts, "e7"),
      "incr:0..2")
    assert(incr != null)
    val incRows = spark.sql("SELECT id FROM evocat.s.e7 VERSION AS OF 2")
      .as[Long].collect().sorted.toSeq
    assert(incRows == Seq(1L, 2L, 3L))
  }
}
