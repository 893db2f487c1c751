package graft.sinks

import graft.sinks.HttpSink.{HttpRequest, HttpResponse, Transport}
import java.net.URI
import java.net.http.{HttpClient, HttpResponse => JResponse, HttpRequest => JRequest}
import java.time.Duration

/** Concrete `java.net.http` transport behind the [[HttpSink.Transport]]
  * trait — the engine's form of the reference's HTTP layer
  * (lib/request.js:1-8 wraps a request lib with a user-agent default;
  * lib/gh.js:21-30 adds base url + auth + accept headers).
  *
  * Connector tier only: EtlMain and the bootstrap calls go through
  * this; nothing on the analytic path performs I/O. Serializable so a
  * change-set `foreachPartition` can ship it to executors — the client
  * itself is transient and rebuilt per JVM.
  *
  * @param baseUrl  e.g. "https://api.github.com" (gh.js:12)
  * @param headers  constant headers; GitHub's are
  *                 accept: application/vnd.github.v3+json and
  *                 Authorization: token <...> (gh.js:25-28)
  */
final class JdkTransport(
    baseUrl: String,
    headers: Map[String, String] = Map.empty,
    timeout: Duration = Duration.ofSeconds(30)) extends Transport {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  override def send(req: HttpRequest): HttpResponse = {
    val b = JRequest.newBuilder(URI.create(baseUrl + req.url)).timeout(timeout)
    headers.foreach { case (k, v) => b.header(k, v) }
    val built = req.method.toUpperCase match {
      case "GET" => b.GET()
      case m =>
        b.header("content-type", "application/json")
          .method(m, JRequest.BodyPublishers.ofString(Option(req.body).getOrElse("")))
    }
    val resp = client.send(built.build(), JResponse.BodyHandlers.ofString())
    HttpResponse(resp.statusCode(), resp.body())
  }
}
