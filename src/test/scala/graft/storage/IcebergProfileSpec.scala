package graft.storage

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Conf-assembly contract for [[IcebergNessieProfile]] — the one
  * environment-blocked reference capability (live Iceberg + Nessie +
  * MinIO; reference: spark-defaults.conf:15-31). The containers can't run
  * here, but the CONF MAP is code and can bit-rot like code: this spec
  * pins the exact key set and the load-bearing values so a rename or a
  * dropped key fails the suite instead of failing a production
  * deployment at bind time. No SparkSession is created — instantiating
  * the Iceberg/Nessie extension classes requires their jars. */
class IcebergProfileSpec extends AnyFunSuite {

  private val confs = IcebergNessieProfile.confs(
    catalogName = "nessie",
    warehouse = "s3a://warehouse",
    nessieUri = "http://nessie:19120/api/v2",
    s3Endpoint = "http://minio:9000",
    s3AccessKey = "AK",
    s3SecretKey = "SK")

  test("key set matches the reference's spark-defaults.conf exactly") {
    // reference spark-defaults.conf:15-31 — catalog block + S3A block +
    // the execution confs it pairs with. A missing key breaks the
    // deployment; an extra key is config the reference never set.
    val expected = Set(
      "spark.sql.extensions",
      "spark.sql.catalog.nessie",
      "spark.sql.catalog.nessie.catalog-impl",
      "spark.sql.catalog.nessie.uri",
      "spark.sql.catalog.nessie.ref",
      "spark.sql.catalog.nessie.warehouse",
      "spark.sql.catalog.nessie.io-impl",
      "spark.hadoop.fs.s3a.endpoint",
      "spark.hadoop.fs.s3a.access.key",
      "spark.hadoop.fs.s3a.secret.key",
      "spark.hadoop.fs.s3a.path.style.access",
      "spark.hadoop.fs.s3a.impl",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.serializer",
      "spark.sql.sources.partitionOverwriteMode")
    assert(confs.keySet == expected,
      s"profile drift: missing ${expected -- confs.keySet}, " +
        s"extra ${confs.keySet -- expected}")
  }

  test("load-bearing values: both extensions, Nessie catalog impl, S3FileIO, " +
    "path-style access, dynamic overwrite, parameterized values routed") {
    val ext = confs("spark.sql.extensions").split(',')
    assert(ext.contains(
      "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"))
    assert(ext.contains(
      "org.projectnessie.spark.extensions.NessieSparkSessionExtensions"))
    assert(confs("spark.sql.catalog.nessie") ==
      "org.apache.iceberg.spark.SparkCatalog")
    assert(confs("spark.sql.catalog.nessie.catalog-impl") ==
      "org.apache.iceberg.nessie.NessieCatalog")
    assert(confs("spark.sql.catalog.nessie.io-impl") ==
      "org.apache.iceberg.aws.s3.S3FileIO")
    // parameterized values land in THEIR keys (and only theirs): a swap
    // of endpoint/uri or a credential in the wrong key is a deployment
    // outage the type system can't catch
    assert(confs("spark.sql.catalog.nessie.uri") == "http://nessie:19120/api/v2")
    assert(confs("spark.sql.catalog.nessie.ref") == "main")
    assert(confs("spark.sql.catalog.nessie.warehouse") == "s3a://warehouse")
    assert(confs("spark.hadoop.fs.s3a.endpoint") == "http://minio:9000")
    assert(confs("spark.hadoop.fs.s3a.access.key") == "AK")
    assert(confs("spark.hadoop.fs.s3a.secret.key") == "SK")
    assert(confs.count(_._2 == "AK") == 1 && confs.count(_._2 == "SK") == 1,
      "credentials must appear exactly once, in their own keys")
    assert(confs("spark.hadoop.fs.s3a.path.style.access") == "true",
      "MinIO requires path-style addressing")
    // idempotent same-date re-runs (the reference's bronze contract)
    // survive the profile swap only under dynamic overwrite
    assert(confs("spark.sql.sources.partitionOverwriteMode") == "dynamic")
  }

  test("configure applies every conf to the builder verbatim") {
    val builder = IcebergNessieProfile.configure(SparkSession.builder(),
      "nessie", "s3a://warehouse", "http://nessie:19120/api/v2",
      "http://minio:9000", "AK", "SK")
    // Builder exposes no getter; read its private options map (declared
    // on a superclass in Spark 4's api.SparkSessionBuilder hierarchy) —
    // a white-box contract check that configure() loses nothing
    val f = Iterator.iterate[Class[_]](builder.getClass)(_.getSuperclass)
      .takeWhile(_ != null)
      .flatMap(_.getDeclaredFields)
      .find(_.getName.contains("options"))
      .getOrElse(fail("no options field found on the builder hierarchy"))
    f.setAccessible(true)
    val applied = f.get(builder)
      .asInstanceOf[scala.collection.mutable.Map[String, String]]
    confs.foreach { case (k, v) =>
      assert(applied.get(k).contains(v), s"builder lost $k")
    }
  }
}
