package graft.ingest

import scala.annotation.tailrec

/** Record source abstraction: Bronze consumes `Seq[String]` of JSON records,
  * so tests inject fixtures with no patching (fixes the reference's
  * monkey-patch testability defect, SURVEY.md §5).
  */
trait RecordFetcher {
  def fetch(): Seq[String]
}

/** One HTTP exchange: status, headers (lower-cased keys), body. */
final case class HttpReply(status: Int, headers: Map[String, String], body: String)

/** Paginated REST source with retry/backoff, mirroring the reference policy
  * (reference: src/processors/breweries_bronze_processors.py:26-125 and
  * src/config/breweries_pipeline_configs.py:8-10):
  *  - GET `{baseUrl}?page=N&per_page=200` until an empty page, a partial
  *    page, or the 50-page cap;
  *  - 5 retries with exponential backoff (factor 0.6) on 429/500/502/503/504,
  *    honoring `Retry-After`.
  *
  * The transport is injected (`doGet`) so the offline test harness can
  * exercise pagination and retry behavior without a network; production binds
  * `java.net.http.HttpClient`. Fetching stays driver-side on purpose: the API
  * caps at 10k rows/run (200x50) — parallelism buys nothing, and the result
  * feeds `spark.createDataFrame` directly (SURVEY.md §2.1 S1).
  */
final class BreweryApiClient(
    baseUrl: String,
    doGet: String => HttpReply,
    perPage: Int = 200,
    maxPages: Int = 50,
    maxRetries: Int = 5,
    backoffFactor: Double = 0.6,
    sleeper: Long => Unit = Thread.sleep) extends RecordFetcher {

  private val retryStatuses = Set(429, 500, 502, 503, 504)

  /** GET with retry; throws after `maxRetries` failed attempts. */
  private[ingest] def getWithRetry(url: String): HttpReply = {
    @tailrec def loop(attempt: Int): HttpReply = {
      val reply =
        try doGet(url)
        catch {
          case e: Exception if attempt < maxRetries =>
            HttpReply(-1, Map.empty, e.getMessage)
        }
      if (reply.status == 200) reply
      else if (attempt >= maxRetries)
        throw new RuntimeException(s"GET $url failed after $maxRetries retries (status ${reply.status})")
      else {
        val backoffMs = (backoffFactor * math.pow(2, attempt) * 1000).toLong
        val waitMs = reply.headers.get("retry-after").flatMap(_.toLongOption.map(_ * 1000))
          .getOrElse(backoffMs)
        sleeper(waitMs)
        loop(attempt + 1)
      }
    }
    loop(0)
  }

  /** See [[BreweryApiClient.splitJsonArray]]. */
  def splitJsonArray(body: String): Seq[String] = BreweryApiClient.splitJsonArray(body)

  /** Fetch one page and split it into raw records ([[graft.sources.BreweryApiSource]]
    * calls this per executor-side page range). */
  def fetchPage(page: Int): Seq[String] =
    splitJsonArray(getWithRetry(s"$baseUrl?page=$page&per_page=$perPage").body)

  override def fetch(): Seq[String] = {
    val out = Seq.newBuilder[String]
    var page = 1
    var done = false
    while (!done && page <= maxPages) {
      val records = fetchPage(page)
      out ++= records
      // stop on empty page or partial page (reference bronze:100-116)
      done = records.isEmpty || records.size < perPage
      page += 1
    }
    out.result()
  }
}

object BreweryApiClient {

  /** Split a JSON array body into per-record JSON strings.
    *
    * Depth/quote-aware scanner (no regex): robust to nested objects and
    * escaped quotes. The reference keeps one JSON string per record
    * (breweries_bronze_processors.py:145) — we preserve each record's raw
    * text so `get_json_object` paths stay valid downstream.
    */
  def splitJsonArray(body: String): Seq[String] = {
    val trimmed = body.trim
    if (!trimmed.startsWith("[")) return Seq.empty
    val out = Seq.newBuilder[String]
    var depth = 0
    var inString = false
    var escape = false
    var start = -1
    var i = 1
    while (i < trimmed.length) {
      val c = trimmed.charAt(i)
      if (inString) {
        if (escape) escape = false
        else if (c == '\\') escape = true
        else if (c == '"') inString = false
      } else c match {
        case '"' => inString = true
        case '{' =>
          if (depth == 0) start = i
          depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += trimmed.substring(start, i + 1); start = -1 }
        case _ => ()
      }
      i += 1
    }
    out.result()
  }
  /** Production transport over java.net.http (connect 5 s / read 30 s,
    * matching reference timeouts at bronze:82). */
  def http(baseUrl: String, perPage: Int = 200): BreweryApiClient = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(5))
      .build()
    new BreweryApiClient(baseUrl, url => {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(30)).GET().build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      val headers = resp.headers().map().entrySet().iterator()
      val hmap = scala.collection.mutable.Map[String, String]()
      while (headers.hasNext) {
        val e = headers.next()
        if (!e.getValue.isEmpty) hmap += (e.getKey.toLowerCase -> e.getValue.get(0))
      }
      HttpReply(resp.statusCode(), hmap.toMap, resp.body())
    }, perPage = perPage)
  }
}
