package graft.storage

import org.apache.spark.sql.SparkSession

/** Production storage profile: Iceberg on S3A with a Nessie REST catalog —
  * the reference's deployment topology as a conf map
  * (reference: spark-defaults.conf:15-31, dags/01_dag_elt_breweries_bronze.py:30-42).
  *
  * Conf-only by design (SURVEY §7.4-5): the offline harness has neither the
  * Iceberg runtime jar nor MinIO/Nessie containers, so this profile cannot
  * be exercised here — but [[CatalogWarehouse]] and [[TableSetup]] issue
  * catalog-agnostic calls, so binding this profile is the ONLY change a
  * production deployment makes: same writeTo/partitionedBy/tableProperty
  * call sites, V2 `createOrReplace`/`overwritePartitions` become fully
  * supported, and dynamic partition overwrite carries the same idempotency
  * guarantee through Iceberg snapshots.
  */
object IcebergNessieProfile {

  /** Spark confs for an Iceberg+Nessie+S3A deployment. Mirrors the
    * reference's spark-defaults.conf keys with the environment-specific
    * values parameterized. */
  def confs(
      catalogName: String,
      warehouse: String, // e.g. s3a://warehouse
      nessieUri: String, // e.g. http://nessie:19120/api/v2
      s3Endpoint: String, // e.g. http://minio:9000
      s3AccessKey: String,
      s3SecretKey: String): Map[String, String] = Map(
    // Iceberg SQL extensions + Nessie catalog
    "spark.sql.extensions" ->
      ("org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions," +
        "org.projectnessie.spark.extensions.NessieSparkSessionExtensions"),
    s"spark.sql.catalog.$catalogName" -> "org.apache.iceberg.spark.SparkCatalog",
    s"spark.sql.catalog.$catalogName.catalog-impl" -> "org.apache.iceberg.nessie.NessieCatalog",
    s"spark.sql.catalog.$catalogName.uri" -> nessieUri,
    s"spark.sql.catalog.$catalogName.ref" -> "main",
    s"spark.sql.catalog.$catalogName.warehouse" -> warehouse,
    s"spark.sql.catalog.$catalogName.io-impl" -> "org.apache.iceberg.aws.s3.S3FileIO",
    // S3A to MinIO-compatible object storage
    "spark.hadoop.fs.s3a.endpoint" -> s3Endpoint,
    "spark.hadoop.fs.s3a.access.key" -> s3AccessKey,
    "spark.hadoop.fs.s3a.secret.key" -> s3SecretKey,
    "spark.hadoop.fs.s3a.path.style.access" -> "true",
    "spark.hadoop.fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem",
    // execution conf the reference pairs with it
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.sources.partitionOverwriteMode" -> "dynamic")

  /** Apply the profile to a session builder. */
  def configure(
      builder: SparkSession.Builder,
      catalogName: String,
      warehouse: String,
      nessieUri: String,
      s3Endpoint: String,
      s3AccessKey: String,
      s3SecretKey: String): SparkSession.Builder =
    confs(catalogName, warehouse, nessieUri, s3Endpoint, s3AccessKey, s3SecretKey)
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
}
