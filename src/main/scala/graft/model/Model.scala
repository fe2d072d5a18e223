package graft.model

import java.sql.Timestamp

/** Core data model — typed counterparts of the reference's config and
  * monitoring tables.
  *
  * Reference schemas: `ddl/ddl_talkdesk_config.py:10-34` (config) and
  * `ddl/ddl_talkdesk_monitoring.py:10-41` (monitoring); SQLite analogs at
  * `local/monitoring_db.py:24-51`. Fixed schemas → typed `Dataset[T]` with
  * case-class Encoders; dynamic report payloads stay `DataFrame`.
  */
final case class ReportConfig(
    report_name: String,
    enabled: Boolean,
    endpoint_type: String,
    retries: Int,
    timeout_sec: Int,
    env: String)

final case class EndpointConfig(
    endpoint_type: String,
    base_url: String,
    auth_endpoint: String,
    post_endpoint: String,
    get_endpoint: String,
    env: String)

/** One row per pipeline run (reference `job_monitoring`,
  * `ddl/ddl_talkdesk_monitoring.py:10-25`).
  */
final case class JobRun(
    run_id: String,
    from_date: String, // yyyy-MM-dd, kept as STRING for reference fidelity
    to_date: String,
    start_time: Timestamp,
    end_time: Option[Timestamp],
    status: String,
    total_reports: Int,
    success_count: Int,
    failed_count: Int,
    error_message: Option[String])

/** One row per report extraction attempt (reference `report_monitoring`,
  * `ddl/ddl_talkdesk_monitoring.py:27-41`).
  */
final case class ReportRun(
    run_id: String,
    report_name: String,
    from_date: String,
    to_date: String,
    start_time: Timestamp,
    end_time: Timestamp,
    status: String,
    rows_written: Int,
    error_message: Option[String])

/** Job/report status machine. Values and derivation mirror the reference:
  * `databricks/talkdesk_databricks_etl.py:563-568` (gather-count variant),
  * `databricks/talkdesk_databricks_etl_distributed.py:265-270`
  * (derive-from-storage variant — the semantics this rebuild standardizes
  * on), `local/monitoring_db.py:96-106` (total==0 normalization).
  */
object Status {
  val Running = "RUNNING"
  val Success = "SUCCESS"
  val PartialSuccess = "PARTIAL_SUCCESS"
  val Failed = "FAILED"

  /** Classify a finished job from its per-report outcome counts. */
  def derive(ok: Long, fail: Long): String =
    if (fail == 0L) Success
    else if (ok == 0L) Failed
    else PartialSuccess

  /** Local-variant normalization (`local/monitoring_db.py:99-106`): a job
    * with zero reports keeps SUCCESS only if the caller claimed SUCCESS.
    */
  def normalize(callerStatus: String, total: Long, ok: Long, fail: Long): String =
    if (total == 0L) { if (callerStatus.equalsIgnoreCase(Success)) Success else Failed }
    else if (fail == 0L && ok == total) Success
    else if (ok > 0L && fail > 0L) PartialSuccess
    else Failed
}
