package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import scala.concurrent.duration._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{HttpReportSource, HttpTokenFetcher, Retry, TokenManager}
import graft.run.Orchestrator

/** Drives the real HTTP client against an in-process JDK HttpServer that
  * speaks the reference's wire protocol, including the failure modes the
  * retry shell must absorb (503-then-success, 429 throttling, terminal 401).
  */
class HttpSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val genAttempts = new AtomicInteger
  private val dlAttempts = new AtomicInteger

  private def respond(ex: HttpExchange, status: Int, body: String, cType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", cType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/oauth/token", (ex: HttpExchange) => {
      val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (form.contains("client_id=cid") && form.contains("client_secret=sec"))
        respond(ex, 200, """{"access_token": "live-token", "expires_in": 1200}""")
      else respond(ex, 401, """{"error": "bad_client"}""")
    })
    server.createContext("/reports/generate", (ex: HttpExchange) => {
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (auth != "Bearer live-token") respond(ex, 401, """{"error": "unauthorized"}""")
      else if (body.contains("flaky") && genAttempts.incrementAndGet() < 3)
        respond(ex, 503, """{"error": "unavailable"}""")
      else if (body.contains("throttled") && dlAttempts.incrementAndGet() < 2)
        respond(ex, 429, """{"error": "slow down"}""")
      else {
        val name = """"report_name"\s*:\s*"([^"]+)"""".r
          .findFirstMatchIn(body).map(_.group(1)).getOrElse("unknown")
        respond(ex, 200, s"""{"report_id": "rid-$name"}""")
      }
    })
    server.createContext("/reports/download", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      if (!q.contains("report_id=rid-")) respond(ex, 404, """{"error": "unknown report"}""")
      else respond(ex, 200, "date,queue,calls\n2024-02-29,q1,10\n2024-02-29,q2,20\n", "text/csv")
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  test("token fetch parses access_token and expires_in from the form POST") {
    val t = HttpTokenFetcher.fetch(s"$base/oauth/token", "cid", "sec")
    assert(t.accessToken == "live-token" && t.expiresIn == 1200L)
  }

  test("token fetch with bad credentials is terminal (no retry burn)") {
    intercept[Retry.TerminalFailure] {
      HttpTokenFetcher.fetch(s"$base/oauth/token", "wrong", "creds")
    }
  }

  test("generate + download round-trip with bearer auth") {
    val src = new HttpReportSource(base)
    val id = src.generateReport("live-token", "call_volume", "2024-02-29", "2024-03-01")
    assert(id == "rid-call_volume")
    val csv = src.downloadReport("live-token", id)
    assert(csv.startsWith("date,queue,calls") && csv.linesIterator.size == 3)
  }

  test("503 responses are retriable: processReport succeeds after backoff") {
    genAttempts.set(0)
    val src = new HttpReportSource(base)
    val tokens = new TokenManager(() => HttpTokenFetcher.fetch(s"$base/oauth/token", "cid", "sec"))
    val out = java.nio.file.Files.createTempDirectory("graft-http").toString
    val run = Orchestrator.processReport(src, tokens, out,
      Orchestrator.ReportTask("http-run", "flaky", 3, 30, "2024-02-29", "2024-03-01"),
      backoffBase = 1.milli)
    assert(run.status == "SUCCESS", run.error_message)
    assert(run.rows_written == 2)
    assert(genAttempts.get == 3, "two 503s then success")
  }

  test("429 throttling is retriable") {
    dlAttempts.set(0)
    val src = new HttpReportSource(base)
    val id = Retry.retry(3, 1.milli, _ => ())(_ =>
      src.generateReport("live-token", "throttled", "2024-02-29", "2024-03-01"))
    assert(id == "rid-throttled" && dlAttempts.get == 2)
  }

  test("401 is terminal: no retries burned") {
    val src = new HttpReportSource(base)
    val calls = new AtomicInteger
    intercept[Retry.TerminalFailure] {
      Retry.retry(3, 1.milli, _ => ()) { _ =>
        calls.incrementAndGet()
        src.generateReport("bad-token", "call_volume", "2024-02-29", "2024-03-01")
      }
    }
    assert(calls.get == 1)
  }
}
