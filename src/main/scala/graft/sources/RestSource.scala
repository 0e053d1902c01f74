package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.observability.Log

/** REST API source (S6): GET an endpoint, parse the JSON response, and
  * yield list-of-dicts batches into the same messy-JSON normalization
  * pipeline as any other dict source (S4, [[JsonIngest]]). The Spark
  * realization of the reference's `RestAdapter.get_data`
  * (`examples/rest_adapter.py:9-35`):
  *
  *   - a JSON-array response is one batch of records;
  *   - a non-array response is wrapped in a single-record batch
  *     (reference logs a warning and wraps, `rest_adapter.py:29-31`);
  *   - a non-2xx status raises (the `raise_for_status` analogue).
  *
  * Beyond the reference, `pageParam` opts into page-numbered
  * pagination — `?page=1,2,…` fetched until an empty batch — so large
  * endpoints stream through the loader's `commitInterval` micro-batch
  * bound instead of buffering one giant response.
  *
  * Scale note: REST ingestion is inherently a DRIVER-side stream (one
  * HTTP client, ordered pages) — the parallelism lives downstream, in
  * the distributed write jobs each flush triggers. That matches the
  * reference, whose adapter is a single-threaded generator; corpora
  * that need parallel fetch should land files on object storage and go
  * through the bulk file sources instead.
  */
object RestSource {

  final case class RestConfig(
      timeoutSeconds: Int = 30, // reference default (`rest_adapter.py:24`)
      headers: Map[String, String] = Map.empty,
      // convenience for the common auth shape: folded into the request
      // as `Authorization: Bearer <token>` (an explicit Authorization
      // entry in `headers` wins)
      bearerToken: Option[String] = None,
      pageParam: Option[String] = None,
      startPage: Int = 1,
      maxPages: Int = 10000,
      // transient-failure policy: 5xx responses and connection-level
      // IOExceptions retry with bounded exponential backoff; 4xx never
      // retries (a client error will not heal). A failed attempt yields
      // no records, so retrying cannot double-ingest a page.
      maxRetries: Int = 3,
      retryBackoffMs: Long = 200)

  /** Fetch `url` and yield record batches. With `pageParam` set, pages
    * are fetched lazily — batch N+1's HTTP call happens only when the
    * iterator advances, so the loader's flush cadence bounds memory.
    */
  def getData(url: String, cfg: RestConfig = RestConfig()): Iterator[Seq[JsonIngest.Record]] = {
    // ONE client per ingest: a JDK HttpClient owns a selector thread
    // and connection pool reclaimed only at GC, and reusing it keeps
    // page fetches on pooled connections
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL) // the reference's requests follows redirects
      .connectTimeout(Duration.ofSeconds(cfg.timeoutSeconds)).build()
    cfg.pageParam match {
      case None => Iterator.single(fetchBatch(client, url, cfg))
      case Some(param) =>
        val sep = if (url.contains("?")) "&" else "?"
        Iterator.from(cfg.startPage)
          .take(cfg.maxPages)
          .map { p =>
            val batch = fetchBatch(client, s"$url$sep$param=$p", cfg)
            if (batch.nonEmpty && p == cfg.startPage + cfg.maxPages - 1)
              Log.warn("rest pagination stopped at maxPages with a non-empty " +
                "final page; the endpoint may have more data",
                "url" -> url, "maxPages" -> cfg.maxPages)
            batch
          }
          .takeWhile(_.nonEmpty)
    }
  }

  /** Raised for failures worth retrying (5xx, connection-level IO). */
  private final class TransientRestFailure(msg: String, cause: Throwable = null)
      extends java.io.IOException(msg, cause)

  /** One GET → one batch of records, with bounded-backoff retries on
    * transient failures (see [[RestConfig]]).
    */
  private[sources] def fetchBatch(client: HttpClient, url: String,
                                  cfg: RestConfig): Seq[JsonIngest.Record] = {
    var attempt = 0
    while (true) {
      try return fetchOnce(client, url, cfg)
      catch {
        case e: TransientRestFailure =>
          attempt += 1
          if (attempt > cfg.maxRetries) throw e
          val backoff = cfg.retryBackoffMs * (1L << math.min(attempt - 1, 10))
          Log.warn("rest fetch failed; retrying after backoff",
            "url" -> url, "attempt" -> attempt, "backoff_ms" -> backoff,
            "cause" -> e.getMessage)
          Thread.sleep(backoff)
      }
    }
    sys.error("unreachable")
  }

  private def fetchOnce(client: HttpClient, url: String,
                        cfg: RestConfig): Seq[JsonIngest.Record] = {
    Log.info("rest fetch", "url" -> url)
    // HTTP header names are case-insensitive and HttpRequest.Builder
    // APPENDS on repeat — match any casing of an explicit Authorization
    // so the request never carries two credentials
    val hasExplicitAuth = cfg.headers.keysIterator.exists(_.equalsIgnoreCase("Authorization"))
    val headers = cfg.bearerToken
      .filterNot(_ => hasExplicitAuth)
      .map(t => Map("Authorization" -> s"Bearer $t"))
      .getOrElse(Map.empty) ++ cfg.headers
    val req = headers.foldLeft(
        HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofSeconds(cfg.timeoutSeconds)).GET()) {
        case (b, (k, v)) => b.header(k, v)
      }.build()
    val resp =
      try client.send(req, HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          throw new TransientRestFailure(s"rest source: GET $url failed: ${e.getMessage}", e)
      }
    if (resp.statusCode() / 100 == 5)
      throw new TransientRestFailure(
        s"rest source: GET $url returned HTTP ${resp.statusCode()}")
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"rest source: GET $url returned HTTP ${resp.statusCode()}")
    val node = new ObjectMapper().readTree(resp.body())
    if (node == null) Seq.empty
    else if (node.isArray) node.elements().asScala.map(toRecord).toSeq
    else {
      Log.warn("rest response is not a list; wrapping", "url" -> url)
      Seq(toRecord(node))
    }
  }

  /** JsonNode → Record, preserving field order; nested structures stay
    * as Maps/Seqs for [[JsonIngest]] to JSON-stringify (its S4 rule).
    */
  private def toRecord(n: JsonNode): JsonIngest.Record =
    if (!n.isObject) Seq("value" -> toValue(n)) // scalar list element
    else n.fields().asScala.map(e => e.getKey -> toValue(e.getValue)).toSeq

  private def toValue(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isObject)
      n.fields().asScala.map(e => e.getKey -> toValue(e.getValue))
        .toSeq.foldLeft(scala.collection.immutable.ListMap.empty[String, Any])(_ + _)
    else if (n.isArray) n.elements().asScala.map(toValue).toSeq
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else n.asText()
}
