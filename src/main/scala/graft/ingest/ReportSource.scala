package graft.ingest

/** Report source abstraction — SURVEY §2 C2/C3.
  *
  * The reference's data source is two REST calls per report:
  * POST `{report_name, from, to}` → `report_id`
  * (`databricks/talkdesk_databricks_etl.py:330-354`), then
  * GET `Accept: text/csv` → raw CSV text (`:357-382`). This trait captures
  * exactly that contract; implementations must be Serializable so the
  * distributed orchestrator can ship them to executors.
  *
  * An HTTP implementation would wrap `java.net.http.HttpClient` inside
  * [[Retry.retry]] with per-report `retries`/`timeout_sec`; this container
  * has zero egress, so the shipped implementation is [[FakeReportSource]],
  * a deterministic in-process issuer that preserves every observable
  * behavior (report-id indirection, CSV payload with header, empty-payload
  * and failure paths).
  */
trait ReportSource extends Serializable {
  /** POST /reports/generate — returns an opaque report id. */
  def generateReport(token: String, reportName: String, fromDate: String, toDate: String): String

  /** GET /reports/download — returns raw CSV text (header + data rows). */
  def downloadReport(token: String, reportId: String): String
}

/** Factory used by the DSv2 [[graft.sources.ReportDataSource]] to build the
  * wire client on executors from the scan options — the source
  * implementation is chosen by the `source_provider` option (fully
  * qualified class name with a no-arg constructor), not hardcoded.
  */
trait ReportSourceProvider extends Serializable {
  def create(options: Map[String, String]): ReportSource
}

object ReportSourceProvider {
  def instantiate(options: Map[String, String]): ReportSource = {
    val cls = options.getOrElse("source_provider",
      classOf[FakeReportSourceProvider].getName)
    Class.forName(cls).getDeclaredConstructor().newInstance()
      .asInstanceOf[ReportSourceProvider].create(options)
  }
}

final class FakeReportSourceProvider extends ReportSourceProvider {
  override def create(options: Map[String, String]): ReportSource =
    new FakeReportSource(options.getOrElse("rows_per_report", "100").toInt)
}

final class HttpReportSourceProvider extends ReportSourceProvider {
  override def create(options: Map[String, String]): ReportSource =
    new HttpReportSource(
      options.getOrElse("base_url",
        sys.error("HttpReportSourceProvider requires the base_url option")),
      options.getOrElse("post_endpoint", "/reports/generate"),
      options.getOrElse("get_endpoint", "/reports/download"),
      options.getOrElse("timeout_sec", "30").toInt)
}

/** Deterministic fake: payload is a pure function of (report, from, to).
  * Mirrors the shape of a Talkdesk Explore CSV export (header row + typed
  * columns, `databricks/talkdesk_databricks_etl.py:437`) and the reference's
  * failure paths: a report named with suffix `_fail` throws a retriable
  * error every time (exhausts retries → FAILED row), `_empty` returns a
  * header-only CSV (the no-data path,
  * `databricks/talkdesk_databricks_etl.py:424-434`).
  */
final class FakeReportSource(rowsPerReport: Int = 100) extends ReportSource {

  override def generateReport(token: String, reportName: String, fromDate: String, toDate: String): String = {
    require(token.nonEmpty, "missing bearer token")
    if (reportName.endsWith("_fail"))
      throw Retry.RetriableFailure(s"HTTP 503 generating $reportName")
    s"$reportName|$fromDate|$toDate"
  }

  override def downloadReport(token: String, reportId: String): String = {
    require(token.nonEmpty, "missing bearer token")
    val Array(name, from, to) = reportId.split('|')
    val header = "date,queue,calls,answered,abandoned"
    if (name.endsWith("_empty")) header + "\n"
    else {
      val rows = (0 until rowsPerReport).map { i =>
        // deterministic per (name, from, i): stable across runs and modes
        val h = math.abs((name + from + i).hashCode)
        s"$from,queue_${h % 7},${h % 1000},${h % 800},${h % 50}"
      }
      (header +: rows).mkString("\n") + "\n"
    }
  }
}
