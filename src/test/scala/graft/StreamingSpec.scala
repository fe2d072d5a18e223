package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{ReportRun, Status}
import graft.streaming.MonitoringStream

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rr(runId: String, name: String, status: String, rows: Int, ts: String): ReportRun =
    ReportRun(runId, name, "2024-02-29", "2024-03-01",
      Timestamp.valueOf(ts), Timestamp.valueOf(ts), status, rows, None)

  test("windowed status counts aggregate a streaming monitoring feed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ReportRun]
    val q = MonitoringStream.windowedStatusCounts(mem.toDF(), "1 day", "1 hour")
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("win_counts").start()
    try {
      mem.addData(
        rr("r1", "a", Status.Success, 10, "2024-03-01 01:00:00"),
        rr("r1", "b", Status.Success, 20, "2024-03-01 02:00:00"),
        rr("r1", "c", Status.Failed, 0, "2024-03-01 03:00:00"),
        rr("r2", "a", Status.Success, 5, "2024-03-02 01:00:00"))
      q.processAllAvailable()
      val out = spark.table("win_counts").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[String]("status"), r.getAs[Long]("n_reports"), r.getAs[Long]("total_rows")))
        .toSet
      assert(out == Set(
        ("2024-03-01 00:00:00.0", "SUCCESS", 2L, 30L),
        ("2024-03-01 00:00:00.0", "FAILED", 1L, 0L),
        ("2024-03-02 00:00:00.0", "SUCCESS", 1L, 5L)))
    } finally q.stop()
  }

  test("stateful running status re-derives per-run state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ReportRun]
    val q = MonitoringStream.runningStatus(spark, mem.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("run_status").start()
    try {
      mem.addData(
        rr("r1", "a", Status.Success, 10, "2024-03-01 01:00:00"),
        rr("r1", "b", Status.Success, 20, "2024-03-01 02:00:00"))
      q.processAllAvailable()
      mem.addData(rr("r1", "c", Status.Failed, 0, "2024-03-01 03:00:00"))
      q.processAllAvailable()
      val states = spark.table("run_status").collect()
        .map(r => (r.getAs[Long]("ok"), r.getAs[Long]("fail"), r.getAs[String]("status")))
      // batch 1: 2 ok, 0 fail -> SUCCESS; batch 2 folds in the failure -> PARTIAL
      assert(states.contains((2L, 0L, "SUCCESS")))
      assert(states.contains((2L, 1L, "PARTIAL_SUCCESS")))
    } finally q.stop()
  }

  test("streaming dedup drops repeated fingerprints across batches (state bounded by watermark)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "event_time")
    val q = MonitoringStream.streamingDedup(docs)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_stream").start()
    try {
      mem.addData(
        (1L, "the quick brown fox", Timestamp.valueOf("2024-03-01 10:00:00")),
        (2L, "THE  quick   brown fox", Timestamp.valueOf("2024-03-01 10:00:01")), // dup modulo ws/case
        (3L, "a different document", Timestamp.valueOf("2024-03-01 10:00:02")))
      q.processAllAvailable()
      // duplicate arriving in a LATER batch, still within the watermark
      mem.addData((4L, "the quick brown fox", Timestamp.valueOf("2024-03-01 10:30:00")))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids == Set(1L, 3L), s"survivors: $ids")
    } finally q.stop()
  }

  test("foreachBatch sink lands micro-batches as batched appends; status derivable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-febatch").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-febatch-ckpt").toString
    val mem = MemoryStream[ReportRun]
    val q = MonitoringStream.sinkViaForeachBatch(mem.toDF(), dir, ckpt)
    try {
      mem.addData(
        rr("r1", "a", Status.Success, 10, "2024-03-01 10:00:00"),
        rr("r1", "b", Status.Success, 20, "2024-03-01 10:00:01"))
      q.processAllAvailable()
      mem.addData(rr("r1", "c", Status.Failed, 0, "2024-03-01 10:00:02"))
      q.processAllAvailable()
      val landed = spark.read.parquet(dir)
      assert(landed.count() == 3)
      val derived = graft.run.Monitoring.deriveJobStatus(landed).collect().head
      assert(derived.getAs[String]("status") == Status.PartialSuccess)
    } finally q.stop()
  }

  test("file-stream binding consumes a parquet monitoring dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    spark.createDataset(Seq(
      rr("r1", "a", Status.Success, 10, "2024-03-01 01:00:00"),
      rr("r1", "b", Status.Failed, 0, "2024-03-01 02:00:00")))
      .write.mode("append").parquet(dir)
    val q = MonitoringStream.windowedStatusCounts(
      MonitoringStream.fromParquetDir(spark, dir))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("file_counts").start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_counts").count() == 2)
    } finally q.stop()
  }
}
