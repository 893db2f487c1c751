package graft.sinks

import org.apache.spark.sql.DataFrame

/** Rate-limited HTTP sink — the Spark-native form of the reference's
  * REST/GraphQL writers (lib/gh.js:192-202, 348-367, 430-485) with its
  * retry policy (lib/gh.js:17, 21-46): secondary-rate-limit detection,
  * exponential backoff 60 s → ×2 per hit → capped at 3660 s, reset on
  * success, plus fixed pacing between mutations (etl.js:6 SLEEP=3000).
  *
  * Design (SURVEY.md §4): the analytic 99% of a pipeline stays fully
  * parallel; only the (small) change set from
  * [[graft.state.StateStore.changeSet]] reaches this sink, usually via
  * `coalesce(1)` when a global rate limit applies, or per-partition
  * token buckets when the endpoint allows N writers. Everything is
  * injectable (transport, clock, sleeper) so tests run with a virtual
  * clock and a scripted transport — the reference's live-API test
  * (tests/set-field-value.js) becomes a deterministic unit test.
  */
object HttpSink {

  final case class HttpRequest(method: String, url: String, body: String)
  final case class HttpResponse(status: Int, body: String)

  /** Pluggable transport; production impl would wrap java.net.http. */
  trait Transport extends Serializable {
    def send(req: HttpRequest): HttpResponse
  }

  /** Rate-limit policy mirroring lib/gh.js semantics. */
  final case class RetryPolicy(
      paceMs: Long = 3000L,           // etl.js:6 inter-write pacing
      backoffInitialMs: Long = 60000L, // gh.js:17 first backoff
      backoffCapMs: Long = 3660000L,   // gh.js:37 cap
      maxRetries: Int = 10)

  final case class SinkReport(sent: Int, retried: Int, failed: Int)

  /** Serialized writer with pacing + exponential backoff.
    * `sleeper` is injectable for tests (virtual time). */
  final class RateLimitedWriter(
      transport: Transport,
      policy: RetryPolicy,
      sleeper: Long => Unit = Thread.sleep) extends Serializable {

    /** 429 always backs off; 403 only when the body says it is a
      * secondary rate limit — the reference's check (gh.js:33 matches
      * 'secondary rate limit' in the message). A plain 403 (bad token,
      * forbidden resource) is a hard failure there and must fail fast
      * here too, not stall a Spark task for hours of doubling backoff. */
    private def isRateLimited(r: HttpResponse): Boolean =
      r.status == 429 ||
        (r.status == 403 && r.body != null &&
          r.body.toLowerCase.contains("secondary rate limit"))

    def write(reqs: Iterator[HttpRequest]): SinkReport = sendAll(reqs)._2

    /** Like [[write]] but also returns each request's final response —
      * the connector tier (EtlMain) needs the created issue's number and
      * node id from the response body, exactly as the reference stores
      * the full create/update responses (etl.js:44-45,195-199).
      *
      * The output is strictly 1:1 with the input, in order: a request
      * that exhausts its rate-limit retries yields a synthetic terminal
      * `HttpResponse(429, "retries exhausted")` rather than being
      * dropped — callers (EtlMain.sendPhase) align responses to request
      * rows positionally, and a dropped entry would shift the zip and
      * attribute later 2xx responses to the wrong rows. */
    def sendAll(reqs: Iterator[HttpRequest]): (Seq[(HttpRequest, HttpResponse)], SinkReport) = {
      val out = Seq.newBuilder[(HttpRequest, HttpResponse)]
      val report = sendEach(reqs)((req, resp) => out += ((req, resp)))
      (out.result(), report)
    }

    /** Streaming form of [[sendAll]]: `onResult` fires once per input
      * request, in order, immediately after its final response —
      * NOTHING is retained here, so a caller that drops request bodies
      * as it goes ([[graft.board.EtlMain]]'s sendPhase keeps only key
      * tuples + parsed 2xx acks) gets a driver footprint bounded by
      * what IT keeps, not by the change-set's serialized bodies. */
    def sendEach(reqs: Iterator[HttpRequest])(
        onResult: (HttpRequest, HttpResponse) => Unit): SinkReport = {
      var sent = 0; var retried = 0; var failed = 0
      var backoff = policy.backoffInitialMs
      var first = true
      reqs.foreach { req =>
        if (!first) sleeper(policy.paceMs)
        first = false
        var attempts = 0
        var done = false
        while (!done && attempts <= policy.maxRetries) {
          val resp = transport.send(req)
          if (isRateLimited(resp)) {
            attempts += 1; retried += 1
            sleeper(backoff)
            backoff = math.min(backoff * 2, policy.backoffCapMs) // gh.js:32-44
          } else {
            if (resp.status >= 200 && resp.status < 300) {
              sent += 1
              backoff = policy.backoffInitialMs // reset on success (gh.js:41)
            } else failed += 1
            onResult(req, resp)
            done = true
          }
        }
        if (!done) { // retries exhausted: emit a terminal row, keep 1:1
          failed += 1
          onResult(req, HttpResponse(429, "retries exhausted"))
        }
      }
      SinkReport(sent, retried, failed)
    }
  }

  /** Ship a change-set DataFrame through the sink. The frame must carry
    * `method`, `url`, `body` string columns. `coalesce(1)` serializes
    * globally (single rate-limit domain, matching the reference's
    * deliberate anti-parallelism); pass parallelism > 1 only when the
    * endpoint tolerates concurrent writers. */
  def writeChangeSet(
      changeSet: DataFrame,
      transport: Transport,
      policy: RetryPolicy = RetryPolicy(),
      parallelism: Int = 1): Unit = {
    changeSet
      .select("method", "url", "body")
      .coalesce(parallelism)
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val writer = new RateLimitedWriter(transport, policy)
        writer.write(rows.map(r => HttpRequest(r.getString(0), r.getString(1), r.getString(2))))
        ()
      }
  }
}
