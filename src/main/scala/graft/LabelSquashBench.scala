package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.streaming.Streams.squashLabels]]: the
  * label-delta table is APPEND-only (the day's write is the day's
  * changes), so without maintenance the per-batch
  * [[graft.streaming.Streams.latestLabels]] read replays every delta ever
  * appended — O(batches × deltas) — while a squash cadence keeps it
  * O(ids). This probe appends `batches` delta batches of `perBatch` rows
  * over an `ids`-sized id space twice — once never squashing, once
  * squashing every batch — timing the resolve at checkpoints.
  *
  * Prints one JSON line; numbers recorded in SCALE.md §label-delta.
  */
object LabelSquashBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(48)
    val perBatch = args.lift(1).map(_.toLong).getOrElse(250000L)
    val ids = args.lift(2).map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = java.nio.file.Files.createTempDirectory("graft-lsb").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.lsb", classOf[graft.storage.GraftCatalog].getName)
      .config("spark.sql.catalog.lsb.warehouse", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lsb.s")

    def seed(prefix: String): Unit = {
      import org.apache.spark.sql.types._
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(Seq(StructField("id", LongType),
            StructField("cluster_id", LongType), StructField("seq", LongType))))
        .writeTo(s"${prefix}_labels").using("parquet").createOrReplace()
    }
    // batch b relabels a sliding window of the id space: overlap with
    // earlier batches (relabels) plus fresh ids — the streaming sink's
    // delta shape
    def appendBatch(prefix: String, b: Int): Unit =
      spark.range(perBatch).select(
          ((col("id") + lit(b.toLong * perBatch * 7)) % ids).alias("id"),
          (col("id") % 99991).alias("cluster_id"),
          lit(b.toLong).alias("seq"))
        .writeTo(s"${prefix}_labels").append()
    def resolveSec(prefix: String): Double = time {
      graft.streaming.Streams.latestLabels(spark, prefix)
        .agg(count(lit(1))).head()
    }

    val checkpoints = (1 to batches).filter(b => b % 8 == 0 || b == batches).distinct
    val results = Seq(false, true).map { squash =>
      val prefix = if (squash) "lsb.s.sq" else "lsb.s.raw"
      seed(prefix)
      val points = (0 until batches).flatMap { b =>
        appendBatch(prefix, b)
        if (squash) graft.streaming.Streams.squashLabels(spark, prefix)
        if (checkpoints.contains(b + 1)) {
          spark.catalog.refreshTable(s"${prefix}_labels")
          val rows = spark.table(s"${prefix}_labels").count()
          val sec = resolveSec(prefix)
          println(f"[labelsquash] squash=$squash batch=${b + 1}%3d " +
            f"tableRows=$rows%,d resolve=$sec%.2f s")
          Some((b + 1, rows, sec))
        } else None
      }
      squash -> points
    }.toMap
    val js = (sq: Boolean) => results(sq).map { case (b, rows, sec) =>
      s"""{"batch":$b,"rows":$rows,"resolve_sec":$sec}""" }.mkString("[", ",", "]")
    println(s"""{"bench":"label_squash","batches":$batches,""" +
      s""""per_batch":$perBatch,"ids":$ids,""" +
      s""""nosquash":${js(false)},"squash":${js(true)}}""")
    spark.stop()
  }
}
