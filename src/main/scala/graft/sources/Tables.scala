package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver's parquet testdata tables (TESTDATA.md).
  *
  * One parquet directory per table; reads go through the vectorized parquet
  * reader and all filters/projections declared downstream push into the scan
  * (check `.explain("formatted")`: PushedFilters / ReadSchema).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
