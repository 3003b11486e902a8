package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ServiceConfig, SourceConfig, StagePath}
import graft.operators.{DeltaState, Flatten, Scd2, Transform}
import graft.sources.IO

/** End-to-end staged pipeline — the engine equivalent of the reference's
  * five processes (SURVEY.md §3.1), with the same stage boundaries
  * materialized as partitioned files (lineage + restartability parity):
  *
  *   raw (JSON docs) -> cleansing (flattened pipe-CSV)
  *                   -> partitioning (masked passthrough)
  *                   -> transformation (rules/explodes/filter/delta; main +
  *                      side outputs)
  *                   -> warehouse load (SCD-2 parquet)
  *
  * Each stage is one Spark job graph; within a stage the S3-object handoffs
  * of the reference become shuffle boundaries, between stages they stay
  * files. All writes are partitioned by the run date (year/month/day), so
  * downstream reads prune to one day — at 100 TB that's the difference
  * between scanning a day and scanning the lake.
  */
final case class PipelineRun(
    root: String,
    source: String,
    date: java.time.LocalDate,
    now: Column // injected clock (deterministic backfill: date+1s, F1)
) {
  def path(alias: String, stage: String, fmt: String): String =
    StagePath(root, source, alias, stage, fmt).forDate(date)
}

object Pipeline {

  /** Cleansing stage (cleansing.py:22-41): raw JSON documents -> fully
    * flattened relational pipe-CSV.
    */
  def cleanse(spark: SparkSession, run: PipelineRun, alias: String, listIndexBound: Int = 4): DataFrame = {
    val raw = IO.readJsonDocs(spark, run.path(alias, "raw", "json"))
    if (raw.isEmpty) raw // blank-input short-circuit (P12)
    else {
      val flat = Flatten.flattenAll(raw, listIndexBound = listIndexBound)
      IO.writePipeCsv(flat, run.path(alias, "cleansing", "csv"))
      flat
    }
  }

  /** Partitioning stage (partitioning.py:81-136): raw -> partitioning copy
    * with PII masking-column drops.
    */
  def partitionStage(spark: SparkSession, run: PipelineRun, svc: ServiceConfig): DataFrame = {
    val raw = IO.readJsonDocs(spark, run.path(svc.alias, "raw", "json"))
    val masked = Transform.mask(raw, svc.maskingCols)
    IO.writeJson(masked, run.path(svc.alias, "partitioning", "json"))
    masked
  }

  /** Transformation stage (transformation.py:246-416): config-driven
    * projection, explode side-outputs, year filter, conversions, generic
    * spares + timestamp, stateful delta against the snapshot table. Returns
    * (main, side outputs) and persists all of them as pipe-CSV.
    */
  def transform(
      spark: SparkSession,
      run: PipelineRun,
      svc: ServiceConfig,
      snapshot: Option[DataFrame] = None,
      deltaCounters: Seq[(String, String)] = Nil,
      deltaKeys: Seq[String] = Nil,
      coalesceCurrent: Boolean = false,
      applyYearFilter: Boolean = false
  ): (DataFrame, Map[String, DataFrame]) = {
    val raw = IO.readJsonDocs(spark, run.path(svc.alias, "raw", "json"))
    val (projected, sides) = Transform.forService(raw, svc, applyYearFilter)
    val withDeltas = snapshot match {
      case Some(snap) if deltaCounters.nonEmpty =>
        DeltaState.applyDeltas(projected, snap, deltaKeys, deltaCounters, coalesceCurrent)
      case _ => projected
    }
    val main = Transform.addGenericAndTimestamp(Transform.floatColumnsToLong(withDeltas), run.now)
    IO.writePipeCsv(main, run.path(svc.alias, "transformation", "csv"))
    // side outputs get the same generic-spares + float->long treatment as
    // the main table (transformation.py:339-341, 363-365, 385-387)
    val treatedSides = sides.map { case (name, df) =>
      name -> Transform.addGenericAndTimestamp(Transform.floatColumnsToLong(df), run.now)
    }
    treatedSides.foreach { case (name, df) => IO.writePipeCsv(df, run.path(name, "transformation", "csv")) }
    (main, treatedSides)
  }

  /** Loading stage (loading.py:25-133 shape): staged pipe-CSV -> SCD-2
    * upsert committed as a new snapshot of a [[graft.sources.VersionedTable]]
    * — readers keep a consistent view mid-load, each run is time-travelable,
    * and rollback = read the previous version. Staging "truncate" is the
    * overwrite of the staged file on the next run.
    */
  /** Warehouse-side drift check shared by the loaders: the staged batch's
    * columns vs the existing warehouse payload columns (SCD-2 bookkeeping
    * excluded). The load itself absorbs drift (unionByName null-padding /
    * mergeSchema reads); this surfaces the diff to `notifier` so it is
    * observed, not just absorbed — the reference's `Completedwitherrors`
    * notification (ingestion.py:99-122).
    */
  private[graft] def emitWarehouseDrift(
      spark: SparkSession,
      warehousePath: String,
      staged: DataFrame,
      notifier: graft.core.Drift.Notifier
  ): Unit = {
    import graft.sources.VersionedTable
    VersionedTable.latestVersion(spark, warehousePath).foreach { latest =>
      val bookkeeping = Set("actv_flg", "record_to", "key_bucket")
      // column names come from the commit manifests' schema JSON — commit-
      // count-sized driver work, no mergeSchema footer scan across the
      // warehouse. A delta commit records only its TOUCHED partitions'
      // schema, so union over the manifests still CONTRIBUTING live
      // partitions at the latest version (partition map values + latest) —
      // not over ALL surviving manifests: a column present only in
      // superseded history would otherwise count as 'existing' forever,
      // its removal never reported and its re-introduction silently
      // suppressed as an added-column event
      val contributing: Seq[Long] = VersionedTable.partitionMap(spark, warehousePath, latest) match {
        case None     => Seq(latest) // full snapshot: latest manifest is the whole view
        case Some(pm) => (pm.values.toSeq :+ latest).distinct.sorted
      }
      val existing = contributing
        .flatMap(v => VersionedTable.commitField(spark, warehousePath, v, "schema"))
        .flatMap(s => org.apache.spark.sql.types.DataType.fromJson(s).asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames)
        .distinct
        .filterNot(bookkeeping)
      val incoming = staged.columns.toSeq
      graft.core.Drift.emit(
        notifier,
        warehousePath,
        newColumns = incoming.filterNot(existing.contains),
        missingColumns = existing.filterNot(incoming.contains)
      )
    }
  }

  def load(
      spark: SparkSession,
      run: PipelineRun,
      alias: String,
      warehousePath: String,
      keyCols: Seq[String],
      notifier: graft.core.Drift.Notifier = graft.core.Drift.noop
  ): DataFrame = {
    import graft.sources.VersionedTable
    val staged = IO.readPipeCsv(spark, run.path(alias, "transformation", "csv"))
    emitWarehouseDrift(spark, warehousePath, staged, notifier)
    // optimistic-concurrency loop: the snapshot is a read-modify-write of
    // the whole table, so a commit that lands between our read and our
    // publish would be silently reverted by an unconditional commit. A
    // checked commit aborts instead; the retry rebases on the fresh read
    // (the same loop shape as upsertPartitioned/commitDelta).
    VersionedTable.withCommitRetry() {
      val base = VersionedTable.latestVersion(spark, warehousePath)
      val target = base match {
        case Some(_) => VersionedTable.read(spark, warehousePath)
        case None =>
          // empty target with the staged schema + SCD columns
          staged
            .limit(0)
            .withColumn("actv_flg", lit("Y"))
            .withColumn("record_to", lit(null).cast("timestamp"))
      }
      val result = Scd2.upsert(target, staged, keyCols, run.now)
      VersionedTable.commitChecked(result, warehousePath, base)
    }
    VersionedTable.read(spark, warehousePath)
  }

  /** Partition-scoped loading stage — same reference semantics as [[load]]
    * (loading.py:25-133), but against a delta-committed warehouse table:
    * only the key-bucket partitions touched by this batch are rewritten;
    * the rest carry forward by manifest reference. Use this shape for big
    * fact targets ([[load]]'s full snapshot is fine for small dimensions —
    * at 100 TB a full-table copy per daily load is not).
    */
  def loadPartitioned(
      spark: SparkSession,
      run: PipelineRun,
      alias: String,
      warehousePath: String,
      keyCols: Seq[String],
      nBuckets: Int = 64,
      notifier: graft.core.Drift.Notifier = graft.core.Drift.noop
  ): DataFrame = {
    import graft.sources.VersionedTable
    val staged = IO.readPipeCsv(spark, run.path(alias, "transformation", "csv"))
    emitWarehouseDrift(spark, warehousePath, staged, notifier)
    Scd2.upsertPartitioned(spark, warehousePath, staged, keyCols, nBuckets, run.now)
    VersionedTable.read(spark, warehousePath)
  }

  /** Full-refresh loader (O-FULL, loading.py:1937-1956). */
  def loadFullRefresh(spark: SparkSession, run: PipelineRun, alias: String, warehousePath: String): Unit = {
    val staged = IO.readPipeCsv(spark, run.path(alias, "transformation", "csv"))
    Scd2.fullRefresh(staged, warehousePath)
  }
}
