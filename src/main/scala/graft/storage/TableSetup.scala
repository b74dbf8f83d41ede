package graft.storage

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col

import graft.model.Schemas

/** Warehouse bootstrap: layered namespaces + empty partitioned tables with
  * explicit schemas, mirroring the reference's setup script
  * (reference: setup/create_tables_script.py:42-132 — CREATE NAMESPACE
  * bronze/silver/gold, then per-layer createOrReplace with declared
  * partitioning and parquet/snappy table properties; create_databases.sql).
  *
  * Against an Iceberg catalog the same calls carry the reference's
  * TBLPROPERTIES verbatim; the session catalog records format+partitioning
  * and ignores engine-specific properties.
  */
object TableSetup {

  val layers: Seq[(String, String)] = Seq(
    ("bronze_layer", "bronze"), ("silver_layer", "silver"), ("gold_layer", "gold"))

  def createAll(spark: SparkSession): Unit = {
    val schemas = Map(
      "bronze" -> Schemas.bronze, "silver" -> Schemas.silver, "gold" -> Schemas.gold)
    layers.foreach { case (ns, table) =>
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $ns")
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schemas(table))
      // drop+create: the session catalog supports V2 CREATE but not
      // REPLACE TABLE AS SELECT; on Iceberg this collapses to
      // createOrReplace() in one call.
      spark.sql(s"DROP TABLE IF EXISTS $ns.$table")
      empty.writeTo(s"$ns.$table")
        .using("parquet")
        .partitionedBy(col("extraction_date"))
        .tableProperty("write.format.default", "parquet")
        .tableProperty("write.parquet.compression-codec", "snappy")
        .create()
    }
  }

  def dropAll(spark: SparkSession): Unit =
    layers.foreach { case (ns, table) =>
      spark.sql(s"DROP TABLE IF EXISTS $ns.$table")
      spark.sql(s"DROP NAMESPACE IF EXISTS $ns")
    }
}
