package graft.model

import java.sql.Date
import org.apache.spark.sql.types._

/** Layer schemas, one-for-one with the reference DDL
  * (reference: setup/create_tables_script.py:61-123,
  * sql/table/{bronze,silver,gold}_table_ddl.sql). Nullability matches the
  * programmatic StructTypes (raw_json/extraction_date/counts NOT NULL).
  */
object Schemas {

  val bronze: StructType = StructType(Seq(
    StructField("raw_json", StringType, nullable = false),
    StructField("extraction_date", DateType, nullable = false)))

  val silver: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("brewery_type", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("country", StringType),
    StructField("postal_code", StringType),
    StructField("longitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("phone", StringType),
    StructField("website_url", StringType),
    StructField("extraction_date", DateType, nullable = false)))

  val gold: StructType = StructType(Seq(
    StructField("brewery_type", StringType),
    StructField("country", StringType),
    StructField("state", StringType),
    StructField("city", StringType),
    StructField("brewery_count", LongType, nullable = false),
    StructField("unique_brewery_count", LongType, nullable = false),
    StructField("extraction_date", DateType, nullable = false)))
}

/** Typed row for the Bronze layer (raw JSON + run-date partition key). */
final case class BreweryRaw(raw_json: String, extraction_date: Date)

/** Typed row for the Silver layer (12 cleaned fields). */
final case class BrewerySilver(
    id: String,
    name: String,
    brewery_type: String,
    city: String,
    state: String,
    country: String,
    postal_code: String,
    longitude: Option[Double],
    latitude: Option[Double],
    phone: String,
    website_url: String,
    extraction_date: Date)

/** Typed row for the Gold layer aggregate. */
final case class BreweryGoldAgg(
    brewery_type: String,
    country: String,
    state: String,
    city: String,
    brewery_count: Long,
    unique_brewery_count: Long,
    extraction_date: Date)
