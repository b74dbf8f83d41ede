package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{BreweryApiClient, HttpReply}

/** Paginated REST source: pagination stop conditions, retry/backoff policy,
  * Retry-After handling, and the JSON array splitter — the contract the
  * reference's connectivity tests assert (SURVEY §5).
  */
class IngestSpec extends AnyFunSuite {

  private def record(i: Int) = s"""{"id": "b-$i", "name": "Brewery $i"}"""
  private def page(from: Int, n: Int) =
    (from until from + n).map(record).mkString("[", ",", "]")

  private def client(
      pages: Map[Int, HttpReply],
      perPage: Int = 3,
      maxPages: Int = 5,
      sleeps: collection.mutable.Buffer[Long] = collection.mutable.Buffer()) = {
    val calls = collection.mutable.Buffer[String]()
    val c = new BreweryApiClient(
      "http://api.test/breweries",
      url => {
        calls += url
        val p = url.split("page=")(1).split("&")(0).toInt
        pages.getOrElse(p, HttpReply(200, Map.empty, "[]"))
      },
      perPage = perPage, maxPages = maxPages,
      sleeper = ms => sleeps += ms)
    (c, calls)
  }

  test("paginates until a partial page") {
    val (c, calls) = client(Map(
      1 -> HttpReply(200, Map.empty, page(0, 3)),
      2 -> HttpReply(200, Map.empty, page(3, 2)))) // partial -> stop
    val out = c.fetch()
    assert(out.size == 5)
    assert(calls.size == 2)
    assert(calls.head.contains("page=1") && calls.head.contains("per_page=3"))
  }

  test("stops on empty page and at the page cap") {
    val (c1, calls1) = client(Map(1 -> HttpReply(200, Map.empty, "[]")))
    assert(c1.fetch().isEmpty && calls1.size == 1)
    val fullPages = (1 to 10).map(p => p -> HttpReply(200, Map.empty, page(p * 3, 3))).toMap
    val (c2, calls2) = client(fullPages, maxPages = 5)
    assert(c2.fetch().size == 15) // capped at 5 pages x 3
    assert(calls2.size == 5)
  }

  test("retries 5xx with exponential backoff, then succeeds") {
    var attempts = 0
    val sleeps = collection.mutable.Buffer[Long]()
    val c = new BreweryApiClient("http://api.test/b", _ => {
      attempts += 1
      if (attempts <= 2) HttpReply(503, Map.empty, "unavailable")
      else HttpReply(200, Map.empty, page(0, 1))
    }, perPage = 3, sleeper = ms => sleeps += ms)
    assert(c.fetch().size == 1)
    assert(attempts == 3)
    assert(sleeps.toSeq == Seq(600L, 1200L)) // 0.6 * 2^0, 0.6 * 2^1 seconds
  }

  test("honors Retry-After header over computed backoff") {
    var attempts = 0
    val sleeps = collection.mutable.Buffer[Long]()
    val c = new BreweryApiClient("http://api.test/b", _ => {
      attempts += 1
      if (attempts == 1) HttpReply(429, Map("retry-after" -> "7"), "slow down")
      else HttpReply(200, Map.empty, "[]")
    }, sleeper = ms => sleeps += ms)
    c.fetch()
    assert(sleeps.toSeq == Seq(7000L))
  }

  test("gives up after max retries") {
    val c = new BreweryApiClient("http://api.test/b",
      _ => HttpReply(500, Map.empty, "boom"), maxRetries = 2, sleeper = _ => ())
    val e = intercept[RuntimeException](c.fetch())
    assert(e.getMessage.contains("failed after 2 retries"))
  }

  test("splitJsonArray: nested objects, escaped quotes, braces in strings") {
    val c = new BreweryApiClient("u", _ => HttpReply(200, Map.empty, "[]"))
    val body = """[{"a": {"nested": {"deep": 1}}, "s": "br{ace"}, {"q": "esc\"aped"}]"""
    val recs = c.splitJsonArray(body)
    assert(recs.size == 2)
    assert(recs.head == """{"a": {"nested": {"deep": 1}}, "s": "br{ace"}""")
    assert(recs(1) == """{"q": "esc\"aped"}""")
    assert(c.splitJsonArray("not json").isEmpty)
    assert(c.splitJsonArray("[]").isEmpty)
  }
}
