package graft

import java.time.Instant
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{CsvIO, Retry, TokenManager}
import graft.model.Status
import graft.run.Orchestrator

/** Spark-free unit tests: status truth table, retry/backoff arithmetic,
  * token-cache refresh window, date defaulting, CSV row counting.
  * (SURVEY §5's rebuild test strategy.)
  */
class StatusSpec extends AnyFunSuite {
  test("derive: fail==0 -> SUCCESS (incl. zero-report edge, distributed semantics)") {
    assert(Status.derive(5, 0) == "SUCCESS")
    assert(Status.derive(0, 0) == "SUCCESS")
  }
  test("derive: ok==0 && fail>0 -> FAILED") {
    assert(Status.derive(0, 3) == "FAILED")
  }
  test("derive: mixed -> PARTIAL_SUCCESS") {
    assert(Status.derive(2, 1) == "PARTIAL_SUCCESS")
  }
  test("normalize: local-variant total==0 keeps SUCCESS only if caller claimed it") {
    assert(Status.normalize("SUCCESS", 0, 0, 0) == "SUCCESS")
    assert(Status.normalize("RUNNING", 0, 0, 0) == "FAILED")
  }
  test("normalize: all four branches") {
    assert(Status.normalize("RUNNING", 3, 3, 0) == "SUCCESS")
    assert(Status.normalize("RUNNING", 3, 2, 1) == "PARTIAL_SUCCESS")
    assert(Status.normalize("RUNNING", 3, 0, 3) == "FAILED")
    // ok<total with fail==0 (e.g. rows still RUNNING) -> FAILED, not SUCCESS
    assert(Status.normalize("RUNNING", 3, 2, 0) == "FAILED")
  }
}

class RetrySpec extends AnyFunSuite {
  test("backoff doubles per attempt from 1s base") {
    assert(Retry.backoffDelay(1.second, 1) == 1.second)
    assert(Retry.backoffDelay(1.second, 2) == 2.seconds)
    assert(Retry.backoffDelay(1.second, 3) == 4.seconds)
  }
  test("succeeds without retry when op passes") {
    var sleeps = Vector.empty[FiniteDuration]
    val r = Retry.retry(3, 1.second, sleeps :+= _)(_ => 42)
    assert(r == 42 && sleeps.isEmpty)
  }
  test("retries retriable failures with exponential sleeps, then succeeds") {
    var sleeps = Vector.empty[FiniteDuration]
    val calls = new AtomicInteger
    val r = Retry.retry(3, 1.second, sleeps :+= _) { attempt =>
      if (calls.incrementAndGet() < 3) throw Retry.RetriableFailure("503")
      attempt
    }
    assert(r == 3)
    assert(sleeps == Vector(1.second, 2.seconds))
  }
  test("exhaustion raises RetryExhausted carrying the last error") {
    val e = intercept[Retry.RetryExhausted] {
      Retry.retry(3, 1.second, _ => ())(_ => throw Retry.RetriableFailure("boom"))
    }
    assert(e.attempts == 3)
    assert(e.last.getMessage == "boom")
  }
  test("terminal failures (4xx analog) never retry") {
    val calls = new AtomicInteger
    intercept[Retry.TerminalFailure] {
      Retry.retry(3, 1.second, _ => ()) { _ =>
        calls.incrementAndGet(); throw Retry.TerminalFailure("404")
      }
    }
    assert(calls.get == 1)
  }
  test("status classification: 5xx/429 retriable, other 4xx not") {
    assert(Retry.isRetriableStatus(500) && Retry.isRetriableStatus(503))
    assert(Retry.isRetriableStatus(429))
    assert(!Retry.isRetriableStatus(404) && !Retry.isRetriableStatus(401))
    assert(!Retry.isRetriableStatus(200))
  }
}

class TokenManagerSpec extends AnyFunSuite {
  private def clockAt(t: Instant) = {
    var now = t
    (() => now, (d: Long) => now = now.plusSeconds(d))
  }

  test("caches until expiry - 300s, then refreshes") {
    val (now, advance) = clockAt(Instant.parse("2024-01-01T00:00:00Z"))
    val issued = new AtomicInteger
    val tm = new TokenManager(
      () => TokenManager.Token(s"tok${issued.incrementAndGet()}", 3600), now)
    assert(tm.token == "tok1")
    advance(3299) // within 3600-300
    assert(tm.token == "tok1")
    advance(2) // crosses the refresh boundary
    assert(tm.token == "tok2")
  }

  test("short-lived tokens keep a 60s floor") {
    val (now, advance) = clockAt(Instant.parse("2024-01-01T00:00:00Z"))
    val issued = new AtomicInteger
    val tm = new TokenManager(
      () => TokenManager.Token(s"tok${issued.incrementAndGet()}", 120), now)
    assert(tm.token == "tok1")
    advance(59) // 120-300 < 60 -> floor 60s applies
    assert(tm.token == "tok1")
    advance(2)
    assert(tm.token == "tok2")
  }

  test("concurrent callers trigger exactly one refresh") {
    val issued = new AtomicInteger
    val tm = new TokenManager(() => {
      Thread.sleep(20); TokenManager.Token(s"tok${issued.incrementAndGet()}", 3600)
    })
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val tokens = Await.result(
      Future.sequence((1 to 8).map(_ => Future(tm.token))), 10.seconds).toSet
    assert(tokens == Set("tok1"))
    assert(issued.get == 1)
  }
}

class DatesAndCsvSpec extends AnyFunSuite {
  test("default dates are yesterday/today, yyyy-MM-dd") {
    val (from, to) = Orchestrator.defaultDates(java.time.LocalDate.parse("2024-03-01"))
    assert(from == "2024-02-29" && to == "2024-03-01")
  }
  test("countCsvRows excludes the header and trailing newline") {
    assert(CsvIO.countCsvRows("h1,h2\na,1\nb,2\n") == 2)
    assert(CsvIO.countCsvRows("h1,h2\n") == 0)
    assert(CsvIO.countCsvRows("") == 0)
  }
  test("countCsvRows handles CRLF payloads (typical of HTTP responses)") {
    assert(CsvIO.countCsvRows("h1,h2\r\na,1\r\nb,2\r\n") == 2)
    assert(CsvIO.countCsvRows("h1,h2\r\n") == 0)
  }
  test("output path follows the {report}/{from}_to_{to}.csv template") {
    assert(CsvIO.outputPath("/out", "call_volume", "2024-01-01", "2024-01-02") ==
      "/out/call_volume/2024-01-01_to_2024-01-02.csv")
  }
}

/** The bench regression-gate baseline loader: the prior round's snapshot
  * is parsed from a driver BENCH artifact (stdout line wrapped under
  * "parsed", with the same JSON ALSO embedded escaped inside the "tail"
  * string — the trap the string-aware brace scan exists for).
  */
class BenchPriorSpec extends AnyFunSuite {
  test("parseArtifact reads normalized/probe/calib from a driver-shaped artifact") {
    val inner = """{"metric":"total","value":175,"probe_normalized":28.4,""" +
      """"calib_probe":[0.591,0.548],"probe":{"q1_pricing_summary":0.364,"q3_top_orders":0.453},"note":"x"}"""
    val artifact = s"""{"n":1,"tail":"...${inner.replace("\"", "\\\"")}...","parsed":$inner}"""
    val f = java.nio.file.Files.createTempFile("bench-prior", ".json")
    java.nio.file.Files.write(f, artifact.getBytes("UTF-8"))
    val p = Bench.parseArtifact(f, "test").get
    assert(p.normalized == 28.4)
    assert(math.abs(p.calibProbe - 0.5695) < 1e-9)
    assert(p.perQuery == Map("q1_pricing_summary" -> 0.364, "q3_top_orders" -> 0.453))
  }
  test("parseArtifact handles the driver's PRETTY-PRINTED artifact form") {
    val artifact =
      """{
        |  "n": 1,
        |  "parsed": {
        |    "probe_normalized": 28.4,
        |    "calib_probe": [
        |      0.591,
        |      0.548
        |    ],
        |    "probe": {
        |      "q1_pricing_summary": 0.364,
        |      "q3_top_orders": 0.453
        |    }
        |  }
        |}""".stripMargin
    val f = java.nio.file.Files.createTempFile("bench-prior-pp", ".json")
    java.nio.file.Files.write(f, artifact.getBytes("UTF-8"))
    val p = Bench.parseArtifact(f, "pp").get
    assert(p.normalized == 28.4 && math.abs(p.calibProbe - 0.5695) < 1e-9)
    assert(p.perQuery.size == 2)
  }
  test("parseArtifact handles the legacy scalar calib form and rejects garbage") {
    val inner = """{"probe_normalized":33.4,"calib_probe":0.529,"probe":{}}"""
    val f = java.nio.file.Files.createTempFile("bench-prior2", ".json")
    java.nio.file.Files.write(f, s"""{"parsed":$inner}""".getBytes("UTF-8"))
    val p = Bench.parseArtifact(f, "t").get
    assert(p.normalized == 33.4 && p.calibProbe == 0.529 && p.perQuery.isEmpty)
    val g = java.nio.file.Files.createTempFile("bench-prior3", ".json")
    java.nio.file.Files.write(g, "not json at all".getBytes("UTF-8"))
    assert(Bench.parseArtifact(g, "t").isEmpty)
  }
  test("loadPrior falls back to the builtin snapshot or a real artifact, never throws") {
    val p = Bench.loadPrior()
    assert(p.normalized > 0 && p.calibProbe > 0, p.toString)
    // and it must never compare a round against its own artifact (r11
    // advisor): whatever BENCH_r<K> loads as prior, K predates the live
    // round derived from VERDICT.md — DERIVED, not hardcoded (r12
    // reviewer catch: a literal round number fails the suite the moment
    // the next round's artifact lands)
    val live = Bench.currentRound()
    assert(live.nonEmpty, "currentRound() must parse the repo VERDICT.md " +
      "header — a silent non-match reopens the self-compare hole")
    "BENCH_r(\\d+)".r.findFirstMatchIn(p.source).foreach { m =>
      assert(m.group(1).toInt < live.get, s"${p.source} vs live round $live")
    }
  }
  test("parseArtifact reads the PRETTY-PRINTED r12 rows form (driver artifact shape)") {
    val artifact =
      """{
        |  "parsed": {
        |    "probe_normalized": 28.1,
        |    "calib_probe": [
        |      0.7,
        |      0.72
        |    ],
        |    "rows": {
        |      "q1_pricing_summary": [
        |        0.55,
        |        1.31,
        |        1.3,
        |        0.36
        |      ],
        |      "sim_whiten": [
        |        0.3,
        |        -1,
        |        0.6,
        |        0.3
        |      ]
        |    }
        |  }
        |}""".stripMargin
    val f = java.nio.file.Files.createTempFile("bench-prior-rows-pp", ".json")
    java.nio.file.Files.write(f, artifact.getBytes("UTF-8"))
    val p = Bench.parseArtifact(f, "rows-pp").get
    assert(p.normalized == 28.1)
    assert(p.perQuery == Map("q1_pricing_summary" -> 0.55, "sim_whiten" -> 0.3))
  }
  test("parseArtifact reads the r12 unified rows form (probe min = element 0)") {
    val inner = """{"metric":"total","probe_normalized":29.0,""" +
      """"calib_probe":[0.5,0.52],""" +
      """"rows":{"q1_pricing_summary":[0.449,1.02,2.1,0.67],"sim_whiten":[0.3,-1,0.6,0.30],"broken":[-1,-1,-1,-1]}}"""
    val f = java.nio.file.Files.createTempFile("bench-prior-rows", ".json")
    java.nio.file.Files.write(f, s"""{"parsed":$inner}""".getBytes("UTF-8"))
    val p = Bench.parseArtifact(f, "rows").get
    assert(p.normalized == 29.0)
    // element 0 of each rows array is the probe min; -1 rows are dropped
    assert(p.perQuery == Map("q1_pricing_summary" -> 0.449, "sim_whiten" -> 0.3))
  }
  test("parseArtifact overlays full-precision probe values onto the rows map") {
    // bench_out.json carries BOTH: "rows" (2-sig-digit) and "probe"
    // (full precision). Probe wins per name; rows-only names (the
    // scale-base set) survive; -1/0 probe entries don't clobber.
    val inner = """{"probe_normalized":29.0,"calib_probe":[0.5,0.52],""" +
      """"probe":{"q1_pricing_summary":0.4487,"sim_whiten":0.3012},""" +
      """"rows":{"q1_pricing_summary":[0.45,1.02,2.1,0.67],"sim_whiten":[0.3,-1,0.6,0.30],"text_lr_model":[4.0,-1,6.2,0.19]}}"""
    val f = java.nio.file.Files.createTempFile("bench-prior-both", ".json")
    java.nio.file.Files.write(f, s"""{"parsed":$inner}""".getBytes("UTF-8"))
    val p = Bench.parseArtifact(f, "both").get
    assert(p.perQuery == Map("q1_pricing_summary" -> 0.4487,
      "sim_whiten" -> 0.3012, "text_lr_model" -> 4.0))
  }
}
