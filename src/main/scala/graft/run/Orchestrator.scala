package graft.run

import java.sql.Timestamp
import java.time.Instant
import java.util.UUID
import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.{Failure, Success => TrySuccess, Try}
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.config.ConfigTables
import graft.ingest.{CsvIO, ReportSource, Retry, TokenManager}
import graft.model.{JobRun, ReportRun, Status}

/** Orchestration core — SURVEY §2 E1–E5, A11–A13.
  *
  * One engine, two execution modes that collapse the reference's three
  * variants:
  *
  *  - [[runDriverParallel]] ≈ the asyncio-on-driver variant
  *    (`databricks/talkdesk_databricks_etl.py:527-558`): `Future.traverse`
  *    fans out one task per report, a shared [[TokenManager]] caches the
  *    OAuth token, every task is isolated (`Try`) so one failure never
  *    aborts siblings (`:460-471`). Correct for the reference's stated
  *    driver envelope (≤ ~50 reports, `README.md:204-207`).
  *
  *  - [[runDistributed]] ≈ the `foreachPartition` variant
  *    (`databricks/talkdesk_databricks_etl_distributed.py:192-256`):
  *    `repartition(⌈n/100⌉)` spreads reports across executors
  *    (`PARTITION_TARGET_SIZE = 100`, `:39`), each partition builds its own
  *    token manager (`:70-76`). Crucially the rebuild returns results
  *    through `mapPartitions` instead of calling `spark` on executors (the
  *    reference's hazard, SURVEY §3.2), and the driver lands ALL monitoring
  *    rows in ONE batched append — no per-row Spark jobs. This is the shape
  *    that holds at 1000 executors: per-partition work is pure, monitoring
  *    writes are O(runs), not O(reports).
  */
object Orchestrator {

  /** Everything a task needs, resolved from config join A3/A4. */
  final case class ReportTask(
      run_id: String,
      report_name: String,
      retries: Int,
      timeout_sec: Int,
      from_date: String,
      to_date: String)

  final case class RunResult(job: JobRun, reports: Seq[ReportRun])

  /** E5: date defaulting — from=yesterday, to=today (UTC), `yyyy-MM-dd`
    * (`databricks/talkdesk_databricks_etl.py:495-497`).
    */
  def defaultDates(today: java.time.LocalDate = java.time.LocalDate.now(java.time.ZoneOffset.UTC)): (String, String) =
    (today.minusDays(1).toString, today.toString)

  /** Process one report: token → generate → download → count → write → row.
    * The retry shell wraps each remote call with the task's own budget
    * (`retries`, base 1 s ×2) and per-call total timeout (`timeout_sec` —
    * the reference's per-report setting, 60 s for call_details), per
    * `databricks/talkdesk_databricks_etl.py:390-471`. A timed-out call
    * counts as retriable, like the reference's `TimeoutError` arm
    * (`local/async_utils.py:44-47`).
    */
  def processReport(
      source: ReportSource,
      tokens: TokenManager,
      outBase: String,
      task: ReportTask,
      backoffBase: FiniteDuration = 1.second,
      now: () => Instant = () => Instant.now()): ReportRun = {
    val start = Timestamp.from(now())
    def timed[T](op: => T): T =
      try Await.result(Future(op)(ExecutionContext.global), task.timeout_sec.seconds)
      catch {
        case _: concurrent.TimeoutException =>
          throw Retry.RetriableFailure(s"call timed out after ${task.timeout_sec}s")
      }
    val attempt = Try {
      val token = tokens.token
      val reportId = Retry.retry(task.retries, backoffBase)(_ =>
        timed(source.generateReport(token, task.report_name, task.from_date, task.to_date)))
      val csv = Retry.retry(task.retries, backoffBase)(_ =>
        timed(source.downloadReport(token, reportId)))
      val rows = CsvIO.countCsvRows(csv)
      if (rows == 0)
        throw Retry.TerminalFailure(s"no data returned for ${task.report_name}")
      CsvIO.writeTextVerbatim(
        CsvIO.outputPath(outBase, task.report_name, task.from_date, task.to_date), csv)
      rows
    }
    val end = Timestamp.from(now())
    attempt match {
      case TrySuccess(rows) =>
        ReportRun(task.run_id, task.report_name, task.from_date, task.to_date,
          start, end, Status.Success, rows, None)
      case Failure(e) =>
        ReportRun(task.run_id, task.report_name, task.from_date, task.to_date,
          start, end, Status.Failed, 0, Option(e.getMessage))
    }
  }

  private def finalizeJob(
      runId: String, fromDate: String, toDate: String,
      jobStart: Timestamp, reports: Seq[ReportRun],
      now: () => Instant): RunResult = {
    val ok = reports.count(_.status == Status.Success).toLong
    val fail = reports.size.toLong - ok
    val job = JobRun(runId, fromDate, toDate, jobStart,
      Some(Timestamp.from(now())), Status.derive(ok, fail),
      reports.size, ok.toInt, fail.toInt, None)
    RunResult(job, reports)
  }

  def tasksFor(spark: SparkSession, env: String, runId: String,
      fromDate: String, toDate: String): Seq[ReportTask] = {
    import spark.implicits._
    // bounded by contract (≤ tens of reports) — collect is justified, A5
    ConfigTables.resolvedReportSpecs(spark, env)
      .select("report_name", "retries", "timeout_sec")
      .as[(String, Int, Int)]
      .collect()
      .toSeq
      .sortBy(_._1)
      .map { case (name, r, t) => ReportTask(runId, name, r, t, fromDate, toDate) }
  }

  /** Driver-parallel mode (E1): all reports in flight at once, like the
    * reference's unbounded `asyncio.gather`
    * (`databricks/talkdesk_databricks_etl.py:558`).
    */
  def runDriverParallel(
      source: ReportSource,
      tokens: TokenManager,
      tasks: Seq[ReportTask],
      outBase: String,
      fromDate: String,
      toDate: String,
      backoffBase: FiniteDuration = 1.second,
      now: () => Instant = () => Instant.now())(implicit ec: ExecutionContext): RunResult = {
    val runId = tasks.headOption.map(_.run_id).getOrElse(UUID.randomUUID().toString)
    val jobStart = Timestamp.from(now())
    val futures = Future.traverse(tasks) { t =>
      Future(processReport(source, tokens, outBase, t, backoffBase, now))
    }
    val reports = Await.result(futures, 10.minutes)
    finalizeJob(runId, fromDate, toDate, jobStart, reports, now)
  }

  /** Reports per Spark partition — the reference's `PARTITION_TARGET_SIZE`
    * (`databricks/talkdesk_databricks_etl_distributed.py:39`).
    */
  val PartitionTargetSize = 100

  /** Distributed mode (A11/A12/A13): fan tasks over executors, return
    * ReportRun rows to the driver as a Dataset. `sourceFactory`/`tokenFactory`
    * are called once per partition on the executor (fresh session + token
    * manager per partition, as the reference does per
    * `databricks/talkdesk_databricks_etl_distributed.py:70-76`).
    */
  def runDistributed(
      spark: SparkSession,
      sourceFactory: () => ReportSource,
      tokenFactory: () => TokenManager,
      tasks: Seq[ReportTask],
      outBase: String,
      fromDate: String,
      toDate: String,
      backoffBase: FiniteDuration = 1.second): RunResult = {
    import spark.implicits._
    val runId = tasks.headOption.map(_.run_id).getOrElse(UUID.randomUUID().toString)
    val jobStart = Timestamp.from(Instant.now())
    val nPartitions = math.max(1, math.ceil(tasks.size.toDouble / PartitionTargetSize).toInt)
    val taskDs: Dataset[ReportTask] = spark.createDataset(tasks)
    val runs = taskDs
      .repartition(nPartitions) // round-robin: even task spread, A11
      .mapPartitions { it =>
        val source = sourceFactory()
        val tokens = tokenFactory()
        it.map(t => processReport(source, tokens, outBase, t, backoffBase))
      }
      .collect() // bounded: one row per report, not per data row
      .toSeq
    finalizeJob(runId, fromDate, toDate, jobStart, runs, () => Instant.now())
  }
}
