package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.dq.{DqSuite, Expectation}

/** Structured-Streaming surface (SURVEY.md §2.8).
  *
  * ST1-ST3: the reference validates each micro-batch with Great Expectations
  * inside what is shaped exactly like `foreachBatch`
  * (great_expectation_microbatch.py:16, great_expectations.py:238). Here the
  * DQ suite runs as one aggregation per batch and appends its results to a
  * parquet sink with schema merge.
  *
  * ST5: the cumulative-counter delta state (§2.6) gets a streaming twin via
  * `flatMapGroupsWithState` — per-key last-seen counters live in Spark's
  * state store instead of DynamoDB, which shards state by key across
  * executors and checkpoints it; this is the design that survives
  * 1000-executor scale.
  */
object Streaming {

  /** ST1/ST2: stream with per-micro-batch DQ validation, results appended.
    *
    * foreachBatch batches can be RE-EXECUTED on failure/retry, so the sink
    * must be idempotent: results are partitioned by (file_identifier,
    * batch id) and written with dynamic partition overwrite — a retried
    * batch replaces ITS OWN partition instead of appending duplicate rows,
    * and distinct streams sharing one resultsPath (distinct
    * fileIdentifiers) never clobber each other. Idempotency is per
    * (fileIdentifier, batchId): restarting a stream WITHOUT its checkpoint
    * restarts batch numbering and intentionally replaces the prior run's
    * rows — keep the checkpoint to keep history.
    *
    * LAYOUT NOTE: the partitioning is stream_part=/batch_part= — a
    * resultsPath written by the earlier batch_part-only layout cannot be
    * mixed under the same root (Spark rejects conflicting partition
    * depths); point upgraded deployments at a fresh resultsPath.
    */
  def validatedStream(
      spark: SparkSession,
      source: DataFrame,
      expectations: Seq[Expectation],
      resultsPath: String,
      fileIdentifier: String = "stream",
      checkpointLocation: Option[String] = None
  ): StreamingQuery = {
    val base = source.writeStream
      .outputMode("append")
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val rs = DqSuite.run(df, expectations, batchId.toString, fileIdentifier)
        // schema evolution happens at READ time (IO.readWarehouse sets
        // mergeSchema) — a write-side mergeSchema option is silently ignored
        // by the parquet sink
        DqSuite
          .resultsDf(spark, rs)
          .withColumn("stream_part", lit(fileIdentifier))
          .withColumn("batch_part", lit(batchId))
          .write
          .partitionBy("stream_part", "batch_part")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(resultsPath)
        ()
      }
      .trigger(Trigger.AvailableNow())
    // without a durable checkpoint the documented per-(stream, batch)
    // idempotency is unsatisfiable: a restart renumbers batches from 0 and
    // the dynamic overwrite replaces the prior run's partitions
    checkpointLocation.fold(base)(loc => base.option("checkpointLocation", loc)).start()
  }

  /** Continuous SCD-2 warehouse loading: each micro-batch runs a
    * partition-scoped upsert into the delta-committed warehouse. EXACTLY
    * ONCE: the batch id is recorded atomically INSIDE the commit manifest
    * (`stream_batch`), so a re-delivered micro-batch (foreachBatch's
    * documented retry case) is detected and skipped — no duplicate SCD
    * versions, no marker-file race (the marker publishes with the data or
    * not at all). Three subtleties the implementation covers:
    *  - `checkpointLocation` is REQUIRED: batch ids are only monotone under
    *    a durable checkpoint; without one a restart renumbers from 0 and
    *    the marker would silently suppress genuinely new data;
    *  - the marker is NAMESPACED by `streamId` (`stream_batch:<id>`) and
    *    compared only against markers of the SAME stream — two streams (or a
    *    re-pointed sink) sharing one warehouse can't suppress each other's
    *    batches just because the other's batch id is numerically ahead. One
    *    sink per (warehouse, streamId): two sinks sharing BOTH is the same
    *    checkpoint misconfiguration as two Spark streams sharing one
    *    checkpoint dir;
    *  - the marker survives table maintenance: every delta commit (loads,
    *    deletions, compact) carries its base's `stream_batch:*` fields
    *    forward in the manifest, so the newest commit always holds them
    *    even after compact+vacuum expires the stream commit's own json;
    *  - the marker lookup scans commits newest-first until it finds one
    *    carrying the stream's marker, so interleaved non-stream commits
    *    (compaction, deletions, ad-hoc loads) can't hide it;
    *  - the check runs INSIDE the commit-retry loop: a zombie driver racing
    *    the failed-over one loses the reservation race, re-checks, sees the
    *    winner's marker, and skips instead of re-applying.
    */
  def scd2WarehouseSink(
      spark: SparkSession,
      source: DataFrame,
      warehousePath: String,
      keyCols: Seq[String],
      nBuckets: Int,
      now: Long => org.apache.spark.sql.Column, // batchId -> insrt/close timestamp (injectable clock)
      checkpointLocation: String,
      streamId: String = "default"
  ): StreamingQuery = {
    import graft.sources.VersionedTable
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        VersionedTable.withCommitRetry() {
          val alreadyApplied = lastStreamBatch(spark, warehousePath, streamId).exists(_ >= batchId)
          if (!alreadyApplied) {
            // maxRetries=0: a commit conflict must bubble to THIS loop so the
            // marker is re-checked before any re-attempt
            graft.operators.Scd2.upsertPartitioned(
              spark, warehousePath, df.toDF(), keyCols, nBuckets, now(batchId),
              maxRetries = 0,
              commitMeta = Map(s"stream_batch:$streamId" -> batchId.toString)
            )
          }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** THE MIGRATION SHADOW-READ, shipped as one call: tail a (possibly
    * still-being-written) Delta table commit-by-commit into the partitioned
    * SCD-2 warehouse, exactly-once end to end. Three layers compose:
    *
    *  - [[graft.sources.DeltaImport.tail]] re-delivers on offset loss or
    *    checkpoint-compaction re-seed (at-least-once);
    *  - the `stream_batch:<streamId>` manifest marker (keyed by the SOURCE
    *    COMMIT VERSION, checked inside the commit-retry loop exactly like
    *    [[scd2WarehouseSink]]) no-ops a re-delivery of a version already
    *    applied;
    *  - CONTENT-LEVEL change detection absorbs the re-seed case the marker
    *    cannot: when the writer checkpoints + vacuums past the consumer's
    *    offset, the re-seed batch is the cumulative snapshot (a SUPERSET of
    *    already-applied rows under a version id the marker has never seen).
    *    Rows identical to the warehouse's current active row are dropped
    *    before the upsert (`exceptAll`, null-safe set semantics), so the
    *    re-seed closes/reinserts nothing that did not actually change and
    *    the SCD-2 history stays free of phantom versions. An all-duplicate
    *    batch commits nothing at all.
    *
    * Crash anywhere — before the upsert, between upsert and offset persist,
    * zombie driver racing a failover, vacuum overtaking the offset — and
    * the warehouse history records each actual change exactly once.
    *
    * @return the newest processed source version (the tail offset)
    */
  def deltaTailIntoWarehouse(
      spark: SparkSession,
      deltaRoot: String,
      checkpointLocation: String,
      warehousePath: String,
      keyCols: Seq[String],
      nBuckets: Int,
      now: Long => org.apache.spark.sql.Column, // source version -> insrt/close ts (injectable clock)
      streamId: String = "delta-tail"
  ): Long = {
    import graft.sources.VersionedTable
    graft.sources.DeltaImport.tail(spark, deltaRoot, checkpointLocation, (df, v) =>
      VersionedTable.withCommitRetry() {
        val alreadyApplied = lastStreamBatch(spark, warehousePath, streamId).exists(_ >= v)
        if (!alreadyApplied) {
          // change detection: drop rows whose current active warehouse row
          // is identical — the idempotent-content half of exactly-once.
          // Scoped to the key-buckets this batch touches (the same pruning
          // upsertPartitioned does): a steady tail of small commits must
          // cost O(batch), not a full-warehouse exceptAll per version
          val changed = VersionedTable.latestVersion(spark, warehousePath) match {
            case None => df
            case Some(ver) =>
              import org.apache.spark.sql.functions.col
              val b = df.withColumn("__kb", graft.operators.Scd2.keyBucket(keyCols, nBuckets))
              // bounded driver-side list: at most nBuckets values
              val touched = b.select("__kb").distinct().collect().map(_.getLong(0)).sorted
              val parts = VersionedTable
                .readPartitions(spark, warehousePath, touched.map(_.toString).toSeq, Some(ver))
                .flatten
              parts.reduceOption(_.unionByName(_, allowMissingColumns = true)) match {
                case None => df // none of the touched buckets exist yet
                // a batch carrying columns the warehouse lacks is schema
                // drift: nothing can be content-identical, apply it whole
                case Some(wh) if !df.columns.forall(wh.columns.contains) => df
                case Some(wh) =>
                  val active = wh
                    .filter(col("actv_flg") === "Y")
                    .select(df.columns.map(col).toIndexedSeq: _*)
                  df.exceptAll(active)
              }
          }
          // the diff feeds isEmpty AND the upsert's plan: persist so the
          // bucket-scoped exceptAll runs once, and release on every exit
          val changedC = changed.persist()
          try {
            if (!changedC.isEmpty) {
              graft.operators.Scd2.upsertPartitioned(
                spark, warehousePath, changedC, keyCols, nBuckets, now(v),
                maxRetries = 0,
                commitMeta = Map(s"stream_batch:$streamId" -> v.toString)
              )
              ()
            }
          } finally {
            changedC.unpersist()
            ()
          }
        }
      }
    )
  }

  /** Newest `stream_batch:<streamId>` marker across committed versions
    * (scanning newest-first past commits that don't carry one — normally
    * the NEWEST commit already has it via manifest carry-forward).
    */
  private def lastStreamBatch(spark: SparkSession, warehousePath: String, streamId: String): Option[Long] = {
    import graft.sources.VersionedTable
    VersionedTable.committedVersionsPublic(spark, warehousePath).sorted.reverse.iterator
      .flatMap(v => VersionedTable.commitField(spark, warehousePath, v, s"stream_batch:$streamId"))
      .map(_.toLong)
      .nextOption()
  }

  final case class CounterEvent(key: String, counters: Map[String, Long], ts: java.sql.Timestamp)
  final case class CounterDelta(key: String, deltas: Map[String, Long], ts: java.sql.Timestamp)

  /** ST5: streaming cumulative->delta conversion. State = last-seen counters
    * per key. First event for a key passes through raw (the reference's
    * no-snapshot semantics, transformation.py:93-98).
    */
  def deltaStream(events: Dataset[CounterEvent])(implicit spark: SparkSession): Dataset[CounterDelta] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[CounterEvent], state: GroupState[Map[String, Long]]) =>
          // total order: equal-timestamp events within a batch need a
          // deterministic tiebreak or deltas/state depend on shuffle order
          val sorted = it.toSeq.sortBy(ev => (ev.ts.getTime, ev.ts.getNanos, ev.counters.toSeq.sorted.mkString(",")))
          var last = state.getOption
          val out = sorted.map { ev =>
            val deltas = ev.counters.map { case (k, cur) =>
              k -> (last match {
                case Some(snap) => cur - snap.getOrElse(k, 0L)
                case None       => cur
              })
            }
            // MERGE into the snapshot, don't replace it: the reference's
            // update_item SETs only the counters present in the row
            // (transformation.py:100-116), so a counter absent from this
            // event keeps its last-seen value — wholesale replacement would
            // forget it and double-count its next cumulative reading
            last = Some(last.getOrElse(Map.empty[String, Long]) ++ ev.counters)
            CounterDelta(key, deltas, ev.ts)
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** Event-time windowed aggregation with watermark (engine-native surface
    * beyond reference parity): tumbling-window counts/sums per event type.
    */
  def windowedEventAgg(events: DataFrame, windowLen: String = "1 hour", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("sum_value"))
}
