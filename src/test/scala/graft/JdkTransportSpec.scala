package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sinks.HttpSink.HttpRequest
import graft.sinks.JdkTransport
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Integration test of the concrete java.net.http transport against a
  * local stub server (the engine's lib/request.js). */
class JdkTransportSpec extends AnyFunSuite {

  test("sends method, headers, and body; returns status and body") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seenAuth: String = null
    @volatile var seenBody: String = null
    @volatile var seenMethod: String = null
    server.createContext("/repos/o/r/issues", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        seenMethod = x.getRequestMethod
        seenAuth = x.getRequestHeaders.getFirst("Authorization")
        seenBody = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val out = """{"number":1}""".getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(201, out.length)
        x.getResponseBody.write(out)
        x.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val t = new JdkTransport(base, Map("Authorization" -> "token t0"))
      val resp = t.send(HttpRequest("POST", "/repos/o/r/issues", """{"title":"x"}"""))
      assert(resp.status == 201 && resp.body == """{"number":1}""")
      assert(seenMethod == "POST")
      assert(seenAuth == "token t0")
      assert(seenBody == """{"title":"x"}""")

      // GET path has no body publisher
      val get = t.send(HttpRequest("GET", "/repos/o/r/issues", ""))
      assert(get.status == 201)
      assert(seenMethod == "GET")
    } finally server.stop(0)
  }

  test("survives java serialization (foreachPartition contract)") {
    val t = new JdkTransport("http://example.invalid", Map("a" -> "b"))
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(t)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject()
    assert(back.isInstanceOf[JdkTransport])
  }
}
