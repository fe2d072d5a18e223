package graft.run

import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Embedded-database monitoring store — SURVEY §2 C8 fidelity: the
  * reference's local variant keeps `jobs`/`reports` in SQLite
  * (`local/monitoring_db.py:11-51`). This is the same pattern on the JVM:
  * an embedded Derby database read/written through Spark's JDBC source, so
  * the monitoring surface works against a SQL store exactly as it does
  * against parquet. The parquet/Delta store remains the scale path; this
  * exists for local-variant parity and as the JDBC source/sink exemplar.
  */
object JdbcMonitoring {

  def jdbcUrl(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"

  /** Append monitoring rows through the JDBC sink (table auto-created;
    * Spark's Derby dialect maps strings to CLOB, which the writer also
    * binds — leave that mapping alone and CAST in raw predicates instead).
    */
  def append(df: DataFrame, dbDir: String, table: String): Unit =
    df.write
      .format("jdbc")
      .option("url", jdbcUrl(dbDir))
      .option("dbtable", table)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .mode(SaveMode.Append)
      .save()

  /** Read a monitoring table back as a DataFrame — feeds the same
    * analytics (B1–B4) and status derivation (A7) as the parquet store.
    */
  def read(spark: SparkSession, dbDir: String, table: String): DataFrame =
    spark.read
      .format("jdbc")
      .option("url", jdbcUrl(dbDir))
      .option("dbtable", table)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()

  /** The reference's keyed UPDATE (`local/monitoring_db.py:108-115`) — a
    * genuine SQL UPDATE against the embedded store, parameterized (never
    * string-interpolated; SURVEY A10 hazard).
    */
  def finalizeJob(dbDir: String, table: String, runId: String,
      status: String, ok: Int, fail: Int): Int = {
    val conn = DriverManager.getConnection(jdbcUrl(dbDir))
    try {
      // quote the writer's case-sensitive lowercase columns, and CAST the
      // CLOB key for comparison (Derby cannot compare CLOB directly)
      val ps = conn.prepareStatement(
        s"""UPDATE $table SET "status" = ?, "success_count" = ?,
           |"failed_count" = ?, "end_time" = CURRENT_TIMESTAMP
           |WHERE CAST("run_id" AS VARCHAR(128)) = ?""".stripMargin)
      ps.setString(1, status); ps.setInt(2, ok); ps.setInt(3, fail)
      ps.setString(4, runId)
      ps.executeUpdate()
    } finally conn.close()
  }
}
