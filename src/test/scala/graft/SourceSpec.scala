package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** DataSource V2 `brewery-api` source: short-name registration, distributed
  * page-range planning, pagination early-stop, raw-record fidelity, and
  * column pruning — the full V2 read path exercised offline via the
  * `fixture` option.
  */
class SourceSpec extends SparkSpec {

  private def record(i: Int) = s"""{"id": "b-$i", "name": "Brewery $i"}"""
  private def body(n: Int) = (0 until n).map(record).mkString("[", ",", "]")

  private def read(n: Int, perPage: Int, maxPages: Int, pagesPerPartition: Int) =
    spark.read.format("brewery-api")
      .option("fixture", body(n))
      .option("perPage", perPage)
      .option("maxPages", maxPages)
      .option("pagesPerPartition", pagesPerPartition)
      .load()

  test("short name resolves; records and page assignment are exact") {
    val df = read(n = 7, perPage = 3, maxPages = 10, pagesPerPartition = 2)
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1)))
    assert(rows.length == 7)
    // records keep their raw JSON text verbatim
    assert(rows.map(_._1).toSet == (0 until 7).map(record).toSet)
    // pages of 3: records 0-2 -> page 1, 3-5 -> page 2, 6 -> page 3 (partial)
    assert(rows.count(_._2 == 1) == 3 && rows.count(_._2 == 2) == 3 &&
      rows.count(_._2 == 3) == 1)
  }

  test("fetch parallelism: one input partition per page range") {
    val df = read(n = 7, perPage = 3, maxPages = 10, pagesPerPartition = 2)
    assert(df.rdd.getNumPartitions == 5) // ceil(10 / 2)
    // ranges past the end of data contribute nothing (empty-page stop)
    assert(df.count() == 7)
  }

  test("page cap truncates like the driver-side client") {
    val df = read(n = 100, perPage = 10, maxPages = 3, pagesPerPartition = 1)
    assert(df.count() == 30)
  }

  test("column pruning reaches the reader (V2 pushdown)") {
    val df = read(n = 5, perPage = 2, maxPages = 5, pagesPerPartition = 5)
    val scan = df.select("page").queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }
    assert(scan.isDefined)
    assert(scan.get.output.map(_.name) == Seq("page"),
      s"reader schema not pruned: ${scan.get.output}")
    assert(df.select("page").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(1, 1, 2, 2, 3))
  }

  test("driver-side fetcher and V2 source agree on the record stream") {
    val fixture = body(11)
    val v2 = read(n = 11, perPage = 4, maxPages = 10, pagesPerPartition = 3)
      .collect().map(_.getString(0)).toSeq.sorted
    val driverSide = new graft.ingest.BreweryApiClient(
      "http://api.test/b",
      _ => graft.ingest.HttpReply(200, Map.empty, "[]"),
      perPage = 4).splitJsonArray(fixture).sorted
    assert(v2 == driverSide)
  }
}
