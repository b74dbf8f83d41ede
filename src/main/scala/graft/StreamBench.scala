package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming-sink throughput measurement (SCALE.md §streaming-throughput):
  * drives sf0.1 lineitem rows through two catalog sinks in MemoryStream
  * micro-batches and reports rows/s and per-batch latency —
  *
  *  - `sinkToCatalog`: the exactly-once append path (batchId writer-txn);
  *  - `sinkToCatalogWap`: per-batch write–audit–publish on an ephemeral
  *    branch with a CROSS-BATCH uniqueness audit — the audit scans the
  *    merged branch state, so its cost grows with table size; measuring
  *    it honestly is the point (the exactly-once sink is the throughput
  *    path; WAP is the governance path).
  *
  * usage: runMain graft.StreamBench [batches=10]
  * env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 10
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)
    import spark.implicits._

    // unique key per lineitem row (linenumber <= 7), payload = comment
    val rows: Array[(Long, String)] = spark.read
      .parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey * 10 + l_linenumber AS k",
        "concat(l_returnflag, l_linestatus, '-', l_shipdate, '-', l_extendedprice) AS payload")
      .as[(Long, String)].collect()
    val slices = rows.grouped(math.max(1, rows.length / batches)).toSeq
    println(s"[streambench] ${rows.length} rows in ${slices.length} micro-batches")

    def run(label: String)(mk: (MemoryStream[(Long, String)], String) =>
        org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      implicit val sqlCtx = spark.sqlContext
      val wh = java.nio.file.Files.createTempDirectory(s"sb-$label-wh").toString
      val cat = s"sb$label"
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.storage.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.s")
      spark.sql(s"CREATE TABLE $cat.s.t (k BIGINT, payload STRING) USING parquet")
      spark.sql(s"CREATE TABLE $cat.s.q (k BIGINT, payload STRING) USING parquet")
      val input = MemoryStream[(Long, String)]
      val q = mk(input, cat)
      val lat = new scala.collection.mutable.ArrayBuffer[Double]
      val t0 = System.nanoTime()
      try {
        slices.foreach { s =>
          val b0 = System.nanoTime()
          input.addData(s.toIndexedSeq)
          q.processAllAvailable()
          lat += (System.nanoTime() - b0) / 1e9
        }
      } finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val n = spark.table(s"$cat.s.t").count()
      val med = lat.sorted.apply(lat.size / 2)
      println(f"[streambench] $label: $n rows in $wall%.2f s = ${n / wall}%.0f rows/s" +
        f" (median batch ${med}%.3f s, max ${lat.max}%.3f s)")
    }

    run("exactly_once") { (input, cat) =>
      Streams.sinkToCatalog(input.toDF().toDF("k", "payload"), s"$cat.s.t", ckptOf(cat))
    }
    run("wap_audited") { (input, cat) =>
      val c = spark.sessionState.catalogManager.catalog(cat)
        .asInstanceOf[graft.storage.GraftCatalog]
      val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("s"), "t")
      Streams.sinkToCatalogWap(input.toDF().toDF("k", "payload"), c, ident,
        s"$cat.s.t", s"$cat.s.q", ckptOf(cat),
        Seq(graft.quality.Expectations.Unique("k")))
    }

    // corpus-state maintenance: the heaviest sink — per batch it runs the
    // gate, the bloom exact-dedup, the band probe against stored sigs,
    // the incremental component fold, and four state-table commits
    {
      implicit val sqlCtx = spark.sqlContext
      val wh = java.nio.file.Files.createTempDirectory("sb-corp-wh").toString
      spark.conf.set("spark.sql.catalog.sbcorp",
        classOf[graft.storage.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.sbcorp.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS sbcorp.s")
      Streams.bootstrapCorpusState(spark, "sbcorp.s.docs", "doc_id", "text", "lang")
      val docs: Array[(Long, String, String)] = spark.read
        .parquet(s"$sfDir/documents.parquet")
        .selectExpr("doc_id", "text", "lang")
        .as[(Long, String, String)].collect()
      val dSlices = docs.grouped(math.max(1, docs.length / batches)).toSeq
      val input = MemoryStream[(Long, String, String)]
      val q = Streams.sinkWithCorpusMaintenance(
        input.toDF().toDF("doc_id", "text", "lang"),
        "sbcorp.s.docs", ckptOf("sbcorp"), "doc_id", "text", "lang")
      val lat = new scala.collection.mutable.ArrayBuffer[Double]
      val t0 = System.nanoTime()
      try {
        dSlices.foreach { s =>
          val b0 = System.nanoTime()
          input.addData(s.toIndexedSeq)
          q.processAllAvailable()
          lat += (System.nanoTime() - b0) / 1e9
        }
      } finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      val kept = spark.table("sbcorp.s.docs_gated").count()
      val med = lat.sorted.apply(lat.size / 2)
      println(f"[streambench] corpus_maintenance: ${docs.length} docs " +
        f"($kept survivors) in $wall%.2f s = ${docs.length / wall}%.0f docs/s" +
        f" (median batch ${med}%.3f s, max ${lat.max}%.3f s)")
    }
    spark.stop()
  }

  private val ckpts = scala.collection.mutable.Map.empty[String, String]
  private def ckptOf(cat: String): String = ckpts.getOrElseUpdate(cat,
    java.nio.file.Files.createTempDirectory(s"sb-ck-$cat").toString)

  private def Streams = graft.streaming.Streams
}
