package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Flatten, Transform}

/** Ingest stage utilities (SURVEY.md S8/S16, ingestion.py).
  *
  * The reference pages a SOAP API with offset/limit and lands each page as a
  * JSON object on S3 (ingestion.py:259-279); report-type entities land as
  * gzip CSVs whose schemas drift (renamed/added/removed columns,
  * ingestion.py:84-123). External-API paging is inherently driver-side; the
  * engine keeps each page's landing write distributed and the downstream
  * stages fully parallel — exactly the reference's architecture, minus the
  * row-wise Python.
  */
object Ingest {

  /** S8: paginated external-source scan. Pulls pages until an empty page,
    * landing each page immediately (bounded driver memory), then returns the
    * landed dataset as one DataFrame. `fetchPage(offset)` abstracts the
    * remote call; pages are JSON strings (the reference's serialized SOAP
    * objects).
    */
  def pagedJsonIngest(
      spark: SparkSession,
      fetchPage: Int => Seq[String],
      landingDir: String
  ): DataFrame = {
    // NOTE deliberately no pageSize parameter: a short page does NOT mean
    // last page (APIs truncate on response size), so the only sound
    // termination signal is an empty page and the only sound cursor is the
    // count actually returned. A declared page size would invite the
    // short-page-skips-records bug this loop exists to avoid.
    import spark.implicits._
    var offset = 0
    var page = fetchPage(offset)
    var n = 0
    while (page.nonEmpty) {
      spark.read
        .json(page.toDS())
        .write
        .mode(if (n == 0) "overwrite" else "append")
        .json(landingDir)
      // advance by what was actually returned: a short non-final page (API
      // response-size truncation) must not skip records
      offset += page.size
      n += 1
      page = fetchPage(offset)
    }
    if (n == 0) spark.emptyDataFrame else spark.read.json(landingDir)
  }

  /** Report ingest with schema-drift self-repair (ingestion.py:58-142):
    * normalize headers (lowercase, spaces->underscore, strip dotted
    * prefixes), align to the registry column list (missing -> null, new ->
    * appended), `-` -> null, floats -> zero-defaulted longs, land as
    * pipe-CSV. Returns (landed df, updated registry) — the updated registry
    * is the config-writeback the reference stores to DynamoDB (S16).
    *
    * Drift does not fail the run, but it is not silent either: when the
    * incoming report adds or drops columns vs the registry, `notifier`
    * receives the column diff (the reference flags such runs
    * `Completedwitherrors` and notifies, ingestion.py:99-122).
    */
  def reportIngest(
      spark: SparkSession,
      reportCsvPath: String,
      registry: Seq[String],
      landingDir: String,
      notifier: graft.core.Drift.Notifier = graft.core.Drift.noop
  ): (DataFrame, Seq[String]) = {
    val raw = IO.readReportCsv(spark, reportCsvPath)
    val normalized = Flatten.normalizeHeaders(raw)
    val (aligned, newCols) = Flatten.reconcileSchema(normalized, registry)
    val missingCols = registry.filterNot(normalized.columns.contains)
    graft.core.Drift.emit(notifier, reportCsvPath, newCols, missingCols)
    val repaired = Transform.floatColumnsToLong(aligned)
    IO.writePipeCsv(repaired, landingDir)
    (repaired, registry ++ newCols)
  }
}
