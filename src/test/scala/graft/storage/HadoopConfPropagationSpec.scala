package graft.storage

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

import graft.SparkSpec

/** Local filesystem under a scheme (`graftfs://`) that ONLY the session's
  * Hadoop configuration can resolve — `new Configuration()` has no
  * `fs.graftfs.impl` binding and throws "No FileSystem for scheme".
  * Stands in for every warehouse that needs session Hadoop conf to reach
  * (s3a credentials/endpoints, kerberized HDFS, custom `fs.<scheme>.impl`). */
class GraftFakeSchemeFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")
}

/** Executor-side code must resolve filesystems from the DRIVER session's
  * Hadoop configuration, never from `new Configuration()` defaults: a
  * default-conf build silently works on a bare local warehouse and then
  * fails (or worse, writes to the wrong place) on any store that needs
  * session conf. These tests run the full row-level DML surface — keyed
  * equality-delete writers, key-less position-delta writers, the
  * distributed sidecar parse, targeted compaction — over a warehouse whose
  * scheme only the session conf can bind. */
class HadoopConfPropagationSpec extends SparkSpec {

  import spark.implicits._

  private lazy val wh = {
    // stat-based status loading: the deprecated status path loads
    // permissions through new File(path.toUri), which requires scheme
    // "file" and breaks any re-schemed local fs
    RawLocalFileSystem.useStatIfAvailable()
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftfs.impl", classOf[GraftFakeSchemeFs].getName)
    // keep the JVM-global FileSystem cache out of the test: without this,
    // a driver-created graftfs instance would be served to ANY
    // new-Configuration() lookup (cache key ignores the conf), hiding
    // exactly the executor-side regression this spec exists to catch
    spark.sparkContext.hadoopConfiguration.setBoolean(
      "fs.graftfs.impl.disable.cache", true)
    val dir = java.nio.file.Files.createTempDirectory("graft-fakefs").toString
    spark.conf.set("spark.sql.catalog.fakecat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.fakecat.warehouse", s"graftfs://$dir")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fakecat.s")
    dir
  }

  private def cat = spark.sessionState.catalogManager.catalog("fakecat")
    .asInstanceOf[GraftCatalog]

  test("keyed merge-on-read MERGE + targeted compaction on a warehouse " +
    "resolvable only through the session Hadoop conf") {
    wh
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "w")
      .writeTo("fakecat.s.keyed").using("parquet")
      .tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      .tableProperty(GraftCatalog.MergeKeyProp, "id")
      .createOrReplace()
    Seq((2L, "B"), (4L, "D")).toDF("id", "w")
      .createOrReplaceTempView("fake_changes")
    spark.sql("""
      MERGE INTO fakecat.s.keyed t USING fake_changes s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET w = s.w
      WHEN NOT MATCHED THEN INSERT (id, w) VALUES (s.id, s.w)""")
    spark.catalog.refreshTable("fakecat.s.keyed")
    assert(spark.table("fakecat.s.keyed").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
    // distributed sidecar parse + compaction rewrite, same scheme
    val (rew, _) = cat.compactDeletes(spark, "s.keyed")
    assert(rew >= 1, s"expected the delete compaction to rewrite, got $rew")
    spark.catalog.refreshTable("fakecat.s.keyed")
    assert(spark.table("fakecat.s.keyed").count() == 4L)
  }

  test("key-less position-delta MERGE on the session-conf-only warehouse") {
    wh
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "w")
      .writeTo("fakecat.s.keyless").using("parquet")
      .tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      .createOrReplace()
    Seq((3L, "x", "d"), (5L, "E", "u")).toDF("id", "w", "op")
      .createOrReplaceTempView("fake_pos_changes")
    spark.sql("""
      MERGE INTO fakecat.s.keyless t USING fake_pos_changes s ON t.id = s.id
      WHEN MATCHED AND s.op = 'd' THEN DELETE
      WHEN MATCHED THEN UPDATE SET w = s.w
      WHEN NOT MATCHED THEN INSERT (id, w) VALUES (s.id, s.w)""")
    spark.catalog.refreshTable("fakecat.s.keyless")
    assert(spark.table("fakecat.s.keyless").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (5L, "E")))
  }
}
