package graft.storage

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage abstraction isolating the only environment-dependent piece of the
  * reference (Iceberg-on-MinIO via Nessie; reference: spark-defaults.conf:15-31).
  *
  * The offline harness exercises [[ParquetWarehouse]]; production would bind
  * an Iceberg catalog profile with the same three calls. Both rely on
  * dynamic partition overwrite for idempotent same-date re-runs
  * (reference: breweries_bronze_processors.py:133,149-153 and the idempotency
  * test tests/unit/test_bronze.py:89-109).
  */
trait Storage {
  def read(table: String): DataFrame

  /** Overwrite ONLY the partitions present in `df` (dynamic overwrite). */
  def writePartitioned(df: DataFrame, table: String, partitionCol: String = "extraction_date"): Unit

  def exists(table: String): Boolean
}

/** Local parquet warehouse: one directory per table under `root`.
  *
  * At cluster scale the same code targets s3a:// or an Iceberg table; dynamic
  * partition overwrite keeps the write idempotent per run-date either way.
  */
final class ParquetWarehouse(spark: SparkSession, root: String) extends Storage {

  private def path(table: String) = s"$root/$table"

  override def read(table: String): DataFrame = spark.read.parquet(path(table))

  override def writePartitioned(df: DataFrame, table: String, partitionCol: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path(table))

  override def exists(table: String): Boolean =
    new java.io.File(path(table)).exists()
}
