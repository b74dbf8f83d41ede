package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.BreweryApiClient

/** DataSource V2 `TableProvider` for the paginated REST source (SURVEY §2.1
  * S1, idiomatic option): `spark.read.format("brewery-api")`.
  *
  * Compared to the driver-side [[graft.ingest.BreweryApiClient.fetch]] (the
  * reference's shape — one process pulls all pages,
  * reference: src/processors/breweries_bronze_processors.py:26-125), this
  * source plans one `InputPartition` per page RANGE, so page fetching runs
  * ON THE EXECUTORS in parallel and the rows are born distributed — the
  * shape you want when the upstream API allows many concurrent readers
  * and/or deep pagination. Each partition stops early at an empty or
  * partial page, so ranges past the end of data cost one GET each.
  *
  * Options:
  *  - `url`: API base URL (production transport, java.net.http);
  *  - `fixture`: a literal JSON array standing in for the remote body —
  *    offline tests exercise the full V2 read path (planning, pruning,
  *    pagination, early stop) with no network;
  *  - `perPage` (200), `maxPages` (50) — reference pagination policy
  *    (src/config/breweries_pipeline_configs.py:8-10);
  *  - `pagesPerPartition` (5): fetch parallelism = maxPages / this.
  *
  * Schema: `raw_json STRING, page INT` — raw record text preserved for
  * Bronze ([[graft.layers.Bronze]] wraps it verbatim, so `get_json_object`
  * paths stay valid downstream). Column pruning is pushed into the reader
  * (`SupportsPushDownRequiredColumns`).
  */
class BreweryApiSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "brewery-api"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = BreweryApiSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BreweryApiTable(new CaseInsensitiveStringMap(properties))
}

object BreweryApiSource {
  val schema: StructType = StructType(Seq(
    StructField("raw_json", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false)))
}

private[sources] class BreweryApiTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String =
    s"brewery-api(${options.getOrDefault("url", "<fixture>")})"
  override def schema(): StructType = BreweryApiSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(readOptions: CaseInsensitiveStringMap): ScanBuilder =
    new BreweryScanBuilder(readOptions)
}

private[sources] class BreweryScanBuilder(options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = BreweryApiSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new BreweryScan(
    url = Option(options.get("url")),
    fixture = Option(options.get("fixture")),
    perPage = options.getInt("perPage", 200),
    maxPages = options.getInt("maxPages", 50),
    pagesPerPartition = options.getInt("pagesPerPartition", 5),
    required = required)
}

/** Page range [startPage, endPage) — the unit of fetch parallelism. */
private[sources] case class BreweryPageRange(startPage: Int, endPage: Int) extends InputPartition

private[sources] class BreweryScan(
    url: Option[String],
    fixture: Option[String],
    perPage: Int,
    maxPages: Int,
    pagesPerPartition: Int,
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    (1 to maxPages by pagesPerPartition)
      .map(s => BreweryPageRange(s, math.min(s + pagesPerPartition, maxPages + 1)))
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    BreweryReaderFactory(url, fixture, perPage, required.fieldNames)

  override def description(): String =
    s"brewery-api pages=1..$maxPages perPage=$perPage partitions=${planInputPartitions().length}"
}

private[sources] case class BreweryReaderFactory(
    url: Option[String],
    fixture: Option[String],
    perPage: Int,
    fields: Array[String]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BreweryPageReader(partition.asInstanceOf[BreweryPageRange], url, fixture, perPage, fields)
}

private[sources] class BreweryPageReader(
    range: BreweryPageRange,
    url: Option[String],
    fixture: Option[String],
    perPage: Int,
    fields: Array[String]) extends PartitionReader[InternalRow] {

  // executor-side transport; fixture mode slices the literal body into pages
  private lazy val fetchPage: Int => Seq[String] = fixture match {
    case Some(body) =>
      val all = BreweryApiClient.splitJsonArray(body)
      p => all.slice((p - 1) * perPage, p * perPage)
    case None =>
      val client = BreweryApiClient.http(
        url.getOrElse(throw new IllegalArgumentException(
          "brewery-api: one of url= or fixture= is required")),
        perPage = perPage)
      p => client.fetchPage(p)
  }

  private var page = range.startPage
  private var exhausted = false
  private var current: Iterator[InternalRow] = Iterator.empty

  private def mkRow(rec: String, pg: Int): InternalRow = {
    val vals: Array[Any] = fields.map {
      case "raw_json" => UTF8String.fromString(rec)
      case "page"     => pg
      case other      => throw new IllegalStateException(s"unknown column $other")
    }
    new GenericInternalRow(vals)
  }

  override def next(): Boolean = {
    while (!current.hasNext && !exhausted && page < range.endPage) {
      val recs = fetchPage(page)
      if (recs.isEmpty) exhausted = true
      else {
        if (recs.size < perPage) exhausted = true // partial page = last page
        val pg = page
        current = recs.iterator.map(r => mkRow(r, pg))
      }
      page += 1
    }
    current.hasNext
  }

  override def get(): InternalRow = current.next()
  override def close(): Unit = ()
}
