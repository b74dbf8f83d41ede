package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.GraftCatalog

/** Merge-on-read under SUSTAINED upsert load — the streaming-sink shape
  * ([[graft.streaming.Streams.sinkMergeMor]] commits one delta per
  * micro-batch): sidecars and small delta files accumulate, and the
  * read-side probe set grows with the total pending delete count. This
  * bench drives N sequential delta merges into an n-row table and
  * records the full-scan time at checkpoints along the way, then the
  * compaction recovery — the measured sidecar-count → read-tax curve
  * SCALE.md cites for pricing the compaction cadence. The table is
  * hash-scattered on purpose: every file's key range overlaps every
  * delete set, so the stats-based probe skip never fires and the curve
  * is the worst case.
  *
  * usage: runMain graft.SidecarCurveBench [rows=2000000] [files=64]
  *        [batches=16] [deltaPerBatch=5000]
  */
object SidecarCurveBench {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(64)
    val batches = args.lift(2).map(_.toInt).getOrElse(16)
    val delta = args.lift(3).map(_.toLong).getOrElse(5000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft-sidecar").toString
    spark.conf.set("spark.sql.catalog.scb", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.scb.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS scb.s")
    spark.range(n).select(col("id"), (col("id") % 9973).alias("v"),
        concat(lit("row-"), col("id")).alias("payload"))
      .repartition(files)
      .writeTo("scb.s.t").using("parquet")
      .tableProperty(GraftCatalog.MergeModeProp, "merge-on-read")
      .tableProperty(GraftCatalog.MergeKeyProp, "id")
      .createOrReplace()
    val cat = spark.sessionState.catalogManager.catalog("scb")
      .asInstanceOf[GraftCatalog]

    def read(): Double = {
      spark.catalog.refreshTable("scb.s.t")
      val (sec, cnt) = time(spark.table("scb.s.t").count())
      require(cnt == n, s"row loss under pending deletes: $cnt")
      sec
    }

    val checkpoints = Seq(1, 2, 4, 8, batches).distinct.filter(_ <= batches)
    val curve = Seq.newBuilder[(Int, Int, Double)] // (batches, sidecars, readSec)
    curve += ((0, 0, read()))
    var mergeTotal = 0.0
    (1 to batches).foreach { b =>
      // each batch updates `delta` spread-out keys — every file is hit,
      // the sink's per-micro-batch MERGE shape
      spark.range(0, delta).select(
          ((col("id") * lit(n / delta) + lit(b.toLong)) % n).alias("id"),
          lit(-b.toLong).alias("v"), lit(s"b$b").alias("payload"))
        .createOrReplaceTempView("scb_src")
      val (sec, _) = time(spark.sql(
        """MERGE INTO scb.s.t t USING scb_src s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET v = s.v, payload = s.payload
           WHEN NOT MATCHED THEN INSERT *"""))
      mergeTotal += sec
      if (checkpoints.contains(b)) {
        spark.catalog.refreshTable("scb.s.t")
        curve += ((b, cat.pendingDeletes("s.t").size, read()))
      }
    }
    val (delcSec, delc) = time(cat.compactDeletes(spark, "s.t"))
    val afterDelc = read()
    val sidecarsAfter = cat.pendingDeletes("s.t").size
    val curveJson = curve.result().map { case (b, s, r) =>
      f"""{"batches":$b,"sidecars":$s,"read_sec":$r%.3f}"""
    }.mkString("[", ",", "]")
    println(f"""{"bench":"sidecar_curve","rows":$n,"files":$files,"batches":$batches,"delta_per_batch":$delta,"merge_total_sec":$mergeTotal%.3f,"curve":$curveJson,"delc_sec":$delcSec%.3f,"delc_files_rewritten":${delc._1},"sidecars_after_delc":$sidecarsAfter,"read_after_delc_sec":$afterDelc%.3f}""")
    spark.stop()
  }
}
