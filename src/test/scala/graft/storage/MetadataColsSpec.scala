package graft.storage

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `_file` / `_pos` metadata columns on catalog tables (Iceberg's
  * spelling): the serving file's table-relative path and the row's
  * physical parquet row index, synthesized by the shim read wrapper —
  * `_pos` rides the parquet reader's native row-index generation, so it
  * stays exact under filter pushdown and row-group pruning. They are
  * also the row identity position-delete DML addresses rows by. */
class MetadataColsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val wh = {
    val dir = java.nio.file.Files.createTempDirectory("graft-metawh").toString
    spark.conf.set("spark.sql.catalog.metacat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.metacat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS metacat.s")
    dir
  }

  test("SELECT _file, _pos: relative paths, per-file zero-based positions") {
    wh
    Seq.tabulate(10)(i => (i.toLong, s"w$i")).toDF("id", "w")
      .repartition(2)
      .writeTo("metacat.s.meta1").using("parquet").createOrReplace()
    val rows = spark.sql(
      "SELECT id, _file, _pos FROM metacat.s.meta1")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 10)
    val files = rows.map(_._2).distinct
    assert(files.length == 2, s"expected 2 files, got ${files.toSeq}")
    files.foreach(f => assert(!f.startsWith("/") && f.endsWith(".parquet"),
      s"expected table-relative parquet path, got $f"))
    // positions are 0..n-1 within each file
    rows.groupBy(_._2).foreach { case (f, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq,
        s"positions in $f: ${rs.map(_._3).sorted.toSeq}")
    }
    // metadata columns are NOT in SELECT * and not in the schema
    assert(!spark.table("metacat.s.meta1").columns.contains("_file"))
  }

  test("_pos is the PHYSICAL row index: exact under a pushed filter") {
    wh
    Seq.tabulate(100)(i => (i.toLong, i % 7)).toDF("id", "m")
      .repartition(1).sortWithinPartitions("id")
      .writeTo("metacat.s.meta2").using("parquet").createOrReplace()
    // filter prunes most rows; surviving rows must keep their file-global
    // physical index (= id, since the single file is written in id order)
    val rows = spark.sql(
      "SELECT id, _pos FROM metacat.s.meta2 WHERE id >= 90")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.length == 10)
    rows.foreach { case (id, pos) =>
      assert(pos == id, s"row id=$id has physical pos=$pos")
    }
  }

  test("metadata columns compose with pending equality deletes: deleted " +
    "rows vanish, survivors keep their physical _pos") {
    wh
    Seq.tabulate(8)(i => (i.toLong, s"w$i")).toDF("id", "w")
      .repartition(1).sortWithinPartitions("id")
      .writeTo("metacat.s.meta3").using("parquet")
      .tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      .tableProperty(GraftCatalog.MergeKeyProp, "id")
      .createOrReplace()
    Seq((2L, "x"), (5L, "x")).toDF("id", "w")
      .createOrReplaceTempView("meta3_del")
    spark.sql("""MERGE INTO metacat.s.meta3 t USING meta3_del s ON t.id = s.id
      WHEN MATCHED THEN DELETE""")
    spark.catalog.refreshTable("metacat.s.meta3")
    val rows = spark.sql(
      "SELECT id, _pos, _file FROM metacat.s.meta3 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 3L, 4L, 6L, 7L))
    // survivors of the original file keep PHYSICAL positions (gaps where
    // rows were deleted), proving the row index is generated before the
    // delete apply, not re-counted after it
    assert(rows.toSeq == Seq((0L, 0L), (1L, 1L), (3L, 3L), (4L, 4L),
      (6L, 6L), (7L, 7L)))
  }
}
