package graft.adsbx

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.adsbx.sources.{FetchRequest, HttpTransport, SnapshotFetcher}

/** The default network transport, exercised ONLY against a loopback
  * socket stub (com.sun.net.httpserver) — no egress. Verifies the GET
  * shape the reference sends (task.ts:124-129): both auth headers on the
  * wire, body returned as text, non-2xx arming the retry seam. */
class HttpTransportSpec extends AnyFunSuite {

  private def withServer(handler: com.sun.net.httpserver.HttpExchange => Unit)
      (f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", ex => try handler(ex) finally ex.close())
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
                      body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  test("GET returns the body and sends both auth headers") {
    @volatile var seenPath: String = null
    @volatile var seenHeaders: Map[String, String] = Map.empty
    withServer { ex =>
      seenPath = ex.getRequestURI.toString
      seenHeaders = Map(
        "x-rapidapi-key" -> ex.getRequestHeaders.getFirst("x-rapidapi-key"),
        "api-auth" -> ex.getRequestHeaders.getFirst("api-auth"))
      respond(ex, 200, """{"msg":"No error","ac":[]}""")
    } { port =>
      val http = HttpTransport()
      val body = http(FetchRequest(
        s"http://127.0.0.1:$port/v2/lat/1/lon/2/dist/3/?apiKey=tok&cacheBuster=9",
        Map("x-rapidapi-key" -> "tok", "api-auth" -> "tok")))
      assert(body == """{"msg":"No error","ac":[]}""")
      assert(seenPath == "/v2/lat/1/lon/2/dist/3/?apiKey=tok&cacheBuster=9")
      assert(seenHeaders == Map("x-rapidapi-key" -> "tok", "api-auth" -> "tok"))
    }
  }

  test("non-2xx throws, arming fetchOnce's bounded retry") {
    withServer { ex => respond(ex, 503, "unavailable") } { port =>
      val http = HttpTransport()
      val e = intercept[RuntimeException] {
        http(FetchRequest(s"http://127.0.0.1:$port/x?apiKey=s3cret", Map.empty))
      }
      assert(e.getMessage.contains("503"))
      // the query string (which carries the token) must not leak into the
      // error message
      assert(!e.getMessage.contains("s3cret"))
    }
  }

  test("fetchOnce retries through the transport until a 2xx lands") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { ex =>
      if (attempts.incrementAndGet() < 3) respond(ex, 500, "boom")
      else respond(ex, 200, """{"msg":"ok","ac":[]}""")
    } { port =>
      val cfg = AdsbxConfig(token = "tok",
        api = s"http://127.0.0.1:$port/api")
      val body = SnapshotFetcher.fetchOnce(cfg, HttpTransport(),
        clock = () => 42L, maxAttempts = 3)
      assert(body == """{"msg":"ok","ac":[]}""")
      assert(attempts.get() == 3)
    }
  }
}
