package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write-path throughput: the GraftCatalog V2 writer (staged ParquetWriter
  * streams + rename commit + snapshot manifest) vs Spark's native
  * `df.write.parquet` on identical data — evidence the transactional
  * catalog write adds bookkeeping, not a data-path penalty. Prints one
  * JSON line with seconds per writer for `SPARK_GRAFT_WRITE_ROWS` rows
  * (default 2M) of a 5-column frame partitioned by a low-cardinality key.
  */
object WriteBench {

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_WRITE_ROWS", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)

    val wh = java.nio.file.Files.createTempDirectory("graft-writebench").toString
    spark.conf.set("spark.sql.catalog.wb", classOf[storage.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wb.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wb.b")

    val df = spark.range(rows).select(
      col("id"),
      (col("id") % 97).alias("k"),
      (col("id") * 31 % 1000003).alias("v"),
      concat(lit("payload-"), col("id")).alias("s"),
      (pmod(col("id"), lit(8))).cast("string").alias("part"))
      .localCheckpoint(true) // pin input: measure the write, not the gen

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once on a slice
    df.limit(1000).write.mode("overwrite").partitionBy("part").parquet(s"$wh/native-warm")
    df.limit(1000).writeTo("wb.b.warm").using("parquet")
      .partitionedBy(col("part")).createOrReplace()

    val tNative = time {
      df.write.mode("overwrite").partitionBy("part").parquet(s"$wh/native")
    }
    val tCatalog = time {
      df.writeTo("wb.b.t1").using("parquet").partitionedBy(col("part")).createOrReplace()
    }
    println(f"""{"rows":$rows,"native_sec":$tNative%.3f,"catalog_sec":$tCatalog%.3f,"ratio":${tCatalog / tNative}%.3f}""")
    spark.stop()
  }
}
