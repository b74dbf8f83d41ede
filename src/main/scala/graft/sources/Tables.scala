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

  /** Register every testdata table as a temp view and the graft SQL
    * functions (vec_dot/vec_cosine), making the whole engine surface
    * reachable from `spark.sql` — the role Trino plays over the
    * reference's Iceberg tables (SURVEY §3.4) is played here by Spark's
    * own SQL front end over the same data.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    all.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
    graft.functions.VectorFunctions.register(spark)
  }
}
