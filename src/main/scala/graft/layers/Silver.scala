package graft.layers

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Silver layer: schema-on-read JSON extraction + normalization.
  *
  * Reference semantics: src/processors/breweries_silver_processors.py:22-77.
  *  - 12 `get_json_object` path extractions (missing path / invalid JSON ->
  *    null — the null tolerance the quality tests rely on);
  *  - longitude/latitude arrive as JSON strings, cast to double (bad value ->
  *    null; requires ANSI off, see Engine.tune);
  *  - `address_1` is extracted but dropped by the cleanup select — replicated
  *    (reference extracts it at silver:39, omits it at silver:52-64);
  *  - normalization: trim everywhere, lower(brewery_type), upper(state),
  *    upper(country), digits-only phone (digit-free phone -> "" not null);
  *  - validity filter keeps `id IS NOT NULL` only — an empty-string id
  *    SURVIVES, matching the code not the aspirational test (SURVEY.md §7.4-2).
  *
  * The whole layer is narrow (scan -> project -> filter): no shuffle, fully
  * whole-stage-codegen'd, and the partition filter prunes at the source.
  */
object Silver {

  /** 12-path JSON extraction + double casts (silver:35-49). */
  def extract(bronze: DataFrame): DataFrame =
    bronze.select(
      get_json_object(col("raw_json"), "$.id").alias("id"),
      get_json_object(col("raw_json"), "$.name").alias("name"),
      get_json_object(col("raw_json"), "$.brewery_type").alias("brewery_type"),
      get_json_object(col("raw_json"), "$.address_1").alias("address"),
      get_json_object(col("raw_json"), "$.city").alias("city"),
      get_json_object(col("raw_json"), "$.state_province").alias("state"),
      get_json_object(col("raw_json"), "$.postal_code").alias("postal_code"),
      get_json_object(col("raw_json"), "$.country").alias("country"),
      get_json_object(col("raw_json"), "$.longitude").cast(DoubleType).alias("longitude"),
      get_json_object(col("raw_json"), "$.latitude").cast(DoubleType).alias("latitude"),
      get_json_object(col("raw_json"), "$.phone").alias("phone"),
      get_json_object(col("raw_json"), "$.website_url").alias("website_url"),
      col("extraction_date"))

  /** Normalization + validity filter (silver:52-67); drops `address`. */
  def clean(extracted: DataFrame): DataFrame =
    extracted.select(
      trim(col("id")).alias("id"),
      trim(col("name")).alias("name"),
      lower(trim(col("brewery_type"))).alias("brewery_type"),
      trim(col("city")).alias("city"),
      upper(trim(col("state"))).alias("state"),
      upper(trim(col("country"))).alias("country"),
      trim(col("postal_code")).alias("postal_code"),
      col("longitude"),
      col("latitude"),
      regexp_replace(col("phone"), "[^\\d]", "").alias("phone"),
      trim(col("website_url")).alias("website_url"),
      col("extraction_date"))
      .filter(col("id").isNotNull)

  /** Full layer: partition filter -> extract -> clean (silver:30-67). */
  def transform(bronze: DataFrame, runDate: LocalDate): DataFrame =
    clean(extract(bronze.filter(col("extraction_date") === lit(java.sql.Date.valueOf(runDate)))))
}
