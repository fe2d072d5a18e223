package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV payload parse + sink — SURVEY §2 C4/C5.
  *
  * Parse mirrors `pd.read_csv(io.StringIO(text))`
  * (`databricks/talkdesk_databricks_etl.py:437`): header row, inferred
  * dtypes, schema varies per report — so the result stays an untyped
  * DataFrame.
  *
  * Sink mirrors the single-file-per-report layout
  * `…/{report}/{from}_to_{to}.csv`
  * (`databricks/talkdesk_databricks_etl.py:441-446`,
  * `local/async_utils.py:132-140`). Two paths:
  *   - [[writeTextVerbatim]] — the local variant's raw passthrough; exact
  *     filename, no Spark job. Correct for API-sized payloads (bounded per
  *     report by contract, `README.md:204-207`).
  *   - [[writeCsvDistributed]] — Spark-native writer for payloads that are
  *     NOT driver-bounded: part-files under the report directory. This is
  *     the 100 TB-safe path; exact single-file naming is inherently a
  *     single-writer operation and is kept only for reference fidelity.
  */
object CsvIO {

  /** C4: parse raw CSV text into a schema-inferred DataFrame. Splits on
    * `\r?\n` — HTTP CSV payloads are frequently CRLF, and a stray `\r`
    * would otherwise end up inside the last column's name/values.
    */
  def parseCsv(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val lines = text.split("\r?\n", -1).iterator.filter(_.nonEmpty).toSeq
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(spark.createDataset(lines))
  }

  /** Count data rows of a raw CSV payload without a Spark job — the
    * reference's `len(df)` (`databricks/talkdesk_databricks_etl.py:438`)
    * only ever feeds `rows_written`, so a full parse is wasted work.
    */
  def countCsvRows(text: String): Int =
    math.max(0, text.split("\r?\n", -1).count(_.nonEmpty) - 1)

  def outputPath(baseDir: String, reportName: String, fromDate: String, toDate: String): String =
    s"$baseDir/$reportName/${fromDate}_to_$toDate.csv"

  /** C5, local-variant fidelity: verbatim text write with mkdirs. */
  def writeTextVerbatim(path: String, text: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, text.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  /** C5, scale path: header'd CSV directory write through Spark. */
  def writeCsvDistributed(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(dir)
}
