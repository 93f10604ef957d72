package graft.catalog

import java.net.InetSocketAddress
import java.net.http.HttpTimeoutException
import java.time.Duration

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** In graft.catalog to reach the package-private [[Http]] verbs: asserts
  * the per-request timeout is actually wired into the request builders
  * (a connect timeout alone cannot fail a server that accepts and stalls).
  */
class HttpTimeoutSpec extends AnyFunSuite {

  test("a stalling server trips the per-request timeout") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      Thread.sleep(5000) // stall well past the override timeout
      ex.sendResponseHeaders(200, 0)
      ex.close()
    })
    server.start()
    try {
      val uri = s"http://127.0.0.1:${server.getAddress.getPort}/slow"
      val client = Http.defaultClient()
      intercept[HttpTimeoutException] {
        Http.get(client, uri, Nil, timeout = Duration.ofMillis(200))
      }
      intercept[HttpTimeoutException] {
        Http.post(client, uri, "{}", Nil, timeout = Duration.ofMillis(200))
      }
    } finally server.stop(0)
  }
}
