package graft.adsbx.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Default network transport for the [[SnapshotFetcher]] seam — the
  * concrete `FetchRequest => String` a production poller plugs in, built
  * on the JDK's `java.net.http.HttpClient` (no extra dependency).
  *
  * The reference performs a plain GET with two auth headers and reads the
  * body as text (task.ts:124-129, the `fetch(url, {headers})` +
  * `res.typed(...)` pair); schema validation of the body happens
  * downstream in the pipeline's FAILFAST `from_json` (its `res.typed`
  * counterpart), not in the transport. A non-2xx status throws, which is
  * what arms `SnapshotFetcher.fetchOnce`'s bounded retry — the reference
  * lets a failed fetch fail the whole scheduled invocation, and the next
  * schedule tick is its retry.
  *
  * NEVER exercised against the real network in this repo's tests: specs
  * drive it against a loopback socket stub only, and the library's
  * correctness path stays on fixture files (SURVEY §7.4.7 zero-egress
  * discipline).
  */
object HttpTransport {

  /** Build a transport with the given timeouts. Connect and request
    * timeouts default to the conservative end of a 30 s poll schedule:
    * a hung request must fail in time for `fetchOnce`'s remaining
    * attempts to fit inside one schedule tick. */
  def apply(connectTimeout: Duration = Duration.ofSeconds(5),
            requestTimeout: Duration = Duration.ofSeconds(20))
      : FetchRequest => String = {
    // one client per transport instance: HttpClient owns a connection
    // pool and an executor; building it per-request would leak threads
    // across a long-lived poll loop
    val client = HttpClient.newBuilder()
      .connectTimeout(connectTimeout)
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    req => {
      val builder = HttpRequest.newBuilder(URI.create(req.url))
        .timeout(requestTimeout)
        .GET()
      req.headers.foreach { case (k, v) => builder.header(k, v) }
      val res = client.send(builder.build(),
        HttpResponse.BodyHandlers.ofString())
      val code = res.statusCode()
      if (code < 200 || code >= 300)
        throw new RuntimeException(
          s"snapshot fetch HTTP $code from ${req.url.takeWhile(_ != '?')}")
      res.body()
    }
  }
}
