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
              // single-relation touched read (round-18: one scan, not one
              // per bucket + a union)
              VersionedTable
                .readPartitionsUnioned(spark, warehousePath, touched.map(_.toString).toSeq, Some(ver)) match {
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

  /** Stream-stream event-time interval join: pair each left row with the
    * right rows sharing its key whose timestamp lands in
    * `[leftTs, leftTs + maxDelay]` — the attribution shape (click →
    * purchase within N minutes) as a real two-stream join, not a batch
    * self-join.
    *
    * Both sides carry a watermark, and the time-range predicate bounds the
    * join state Spark must buffer: left rows are dropped from state once
    * the right watermark passes `leftTs + maxDelay + watermarkDelay`,
    * right rows once the left watermark passes their own ts — so state is
    * O(events inside the lateness+delay horizon), not O(stream). That is
    * the property that makes this run indefinitely on a 1000-executor
    * cluster; an unconstrained stream-stream join is rejected by Spark
    * for exactly this reason. Inner-join matches emit as soon as both
    * sides arrive (no watermark wait on the output path).
    *
    * The right side's key column is renamed internally to avoid the
    * ambiguous self-join resolution; all other column names must be
    * disjoint (caller pre-renames — keeps the operator generic without
    * guessing a prefixing scheme).
    *
    * PRECONDITION for exact convergence to the batch time-range oracle:
    * event-time disorder within each stream must not exceed
    * `watermarkDelay`. Once the replay splits into multiple micro-batches
    * (maxFilesPerTrigger, multi-file directories), any row arriving more
    * than `watermarkDelay` behind its stream's max-seen event time is
    * dropped from the join state and its matches are silently lost —
    * watermark semantics, not a bug. Callers that need oracle-exact
    * results on a bounded replay must either keep the replay single-batch
    * or set `watermarkDelay` comfortably above the data's max disorder
    * (q104 uses 1 hour against minute-scale disorder in `events`).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      maxDelay: String,
      watermarkDelay: String): DataFrame = {
    require(leftTs != rightTs, "intervalJoin: rename the two event-time columns apart before joining")
    val overlap = right.columns.toSet.intersect(left.columns.toSet) - keyCol
    require(overlap.isEmpty, s"intervalJoin: non-key columns overlap: ${overlap.mkString(", ")}")
    val rKey = keyCol + "__rhs"
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withColumnRenamed(keyCol, rKey).withWatermark(rightTs, watermarkDelay)
    l.join(
        r,
        col(keyCol) === col(rKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelay"))
      .drop(rKey)
  }

  /** Stream-static enrichment join: each streaming event picks up the
    * dimension attributes for its key — the canonical "enrich clicks with
    * the customer record" shape. The static side is BROADCAST (dimension
    * tables stay dimension-sized while facts stream past them) and Spark
    * re-resolves it at every micro-batch, so a dimension file that changes
    * between batches is picked up without restarting the query — slowly-
    * changing enrichment for free. Stateless: no watermark, no state
    * store; the join cost is a per-batch broadcast hash probe, which is
    * why this scales to any stream rate the executors can scan.
    *
    * `dimCols` selects the attributes to carry (pruning the broadcast to
    * exactly the needed columns); left-outer semantics keep events whose
    * key has no dimension row (their attributes null), because dropping
    * unmatched facts silently is how enrichment pipelines lose data.
    */
  def enrichStream(
      events: DataFrame,
      dim: DataFrame,
      eventKey: String,
      dimKey: String,
      dimCols: Seq[String]): DataFrame = {
    require(dimCols.nonEmpty, "enrichStream: select at least one dimension attribute")
    val slim = dim.select((dimKey +: dimCols).map(col): _*)
    // No forced broadcast() hint: the planner sizes the pruned dimension
    // against autoBroadcastJoinThreshold each micro-batch, so a dimension
    // that fits broadcasts (the common case — dimCols prunes it to the
    // columns used) and one that outgrows the threshold degrades to a
    // shuffled hash join whose build side is the dimension, instead of a
    // forced broadcast OOM-ing the driver.
    events
      .join(slim, col(eventKey) === col(dimKey), "left_outer")
      .drop(dimKey)
  }

  /** Streaming exact deduplication: emit each distinct key ONCE across
    * the whole stream, however many micro-batches its duplicates span.
    * Spark's streaming `dropDuplicates` keeps the seen-key set in the
    * state store, so a key that arrived in batch 1 is suppressed when it
    * reappears in batch 7 — the cross-batch contract a batch `DISTINCT`
    * can't give an unbounded stream.
    *
    * Unbounded streams must bound that state: pass `withinWatermark`
    * (event-time column must be among `keys`' frame) to switch to
    * `dropDuplicatesWithinWatermark`, which evicts keys older than the
    * watermark — the 100 TB/continuous deployment shape, exact as long as
    * duplicates arrive within the lateness bound. Bounded replays (the
    * oracle path) omit it and get exact global dedup.
    */
  def streamingDistinct(
      events: DataFrame,
      keys: Seq[String],
      withinWatermark: Option[(String, String)] = None
  ): DataFrame =
    withinWatermark match {
      case Some((tsCol, delay)) =>
        events.withWatermark(tsCol, delay).select((keys :+ tsCol).distinct.map(col): _*)
          .dropDuplicatesWithinWatermark(keys)
      case None =>
        events.select(keys.map(col): _*).dropDuplicates(keys)
    }

  /** STREAMING NEAR-DUP DEDUP against the persisted MinHash+LSH index —
    * the production shape for continuous corpus ingestion: each
    * micro-batch of documents probes the index
    * ([[graft.operators.Dedup.lshProbeAndAppend]] — batch side broadcast,
    * index never shuffled), durably sinks the exact-Jaccard-verified
    * near-dup pairs it found to `pairsPath/batch=<id>/`, and appends its
    * own signatures so later batches dedup against it. The union of all
    * batches' pairs equals one full LSH recompute over (corpus + all
    * batches) restricted to pairs touching a batch doc — batch
    * boundaries don't change the result, only which batch reports each
    * pair (a pair is reported by the batch of its LATER document,
    * exactly once).
    *
    * Exactly-once under at-least-once re-delivery: the batch id
    * `<streamId>-b<batchId>` is deterministic under a durable
    * `checkpointLocation`, pairs are written (overwrite) BEFORE the
    * index's `_batches/<id>` commit marker, and a re-delivered batch
    * whose marker already exists ([[graft.operators.Dedup
    * .lshBatchCommitted]]) is skipped outright — its pairs and index
    * state are already on disk. A crash before the marker re-runs the
    * whole batch under the SAME id, overwriting its own partial output.
    * One sink per (index, streamId), mirroring [[scd2WarehouseSink]]'s
    * namespacing discipline.
    */
  def lshDedupSink(
      spark: SparkSession,
      source: DataFrame,
      indexPath: String,
      pairsPath: String,
      idCol: String,
      textCol: String,
      checkpointLocation: String,
      shingleSize: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      minJaccard: Double = 0.5,
      streamId: String = "lsh"
  ): StreamingQuery = {
    require(streamId.matches("[A-Za-z0-9_-]+"), s"streamId '$streamId' must be filesystem-safe")
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val bid = s"$streamId-b$batchId"
        if (!graft.operators.Dedup.lshBatchCommitted(spark, indexPath, bid)) {
          graft.operators.Dedup.lshProbeAndAppend(
            spark, indexPath, df.toDF(), idCol, textCol,
            shingleSize, bands, rowsPerBand, minJaccard,
            batchId = Some(bid),
            persistPairs =
              _.write.mode("overwrite").parquet(s"$pairsPath/batch=$bid"))
          ()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** STREAMING VECTOR INGESTION into the persisted residual-PQ serving
    * index ([[graft.operators.Similarity.writeResidualPqIndex]]'s layout)
    * — the ANN twin of [[lshDedupSink]]: each micro-batch of vectors is
    * residual-encoded and appended via ONE delta commit that rewrites
    * only the touched cell partitions
    * ([[graft.operators.Similarity.appendResidualPqBatch]]); probes keep
    * serving every committed version throughout. Exactly-once rides the
    * warehouse's own `stream_batch:<streamId>` manifest marker, checked
    * INSIDE the commit-retry loop exactly like [[scd2WarehouseSink]]: a
    * re-delivered batch id no-ops, a zombie driver that loses the commit
    * race re-checks and sees the winner's marker. The index a probe sees
    * after batch N is bit-identical to building it from scratch over
    * (corpus + batches 1..N) — the parity q164's oracle gates.
    */
  def vectorIndexSink(
      spark: SparkSession,
      source: DataFrame,
      indexPath: String,
      idCol: String,
      vecCol: String,
      dim: Int,
      coarse: Seq[(Long, Seq[Double])],
      codebooks: Seq[Seq[(Long, Seq[Double])]],
      checkpointLocation: String,
      streamId: String = "vec"
  ): StreamingQuery = {
    import graft.sources.VersionedTable
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        VersionedTable.withCommitRetry() {
          val alreadyApplied = lastStreamBatch(spark, indexPath, streamId).exists(_ >= batchId)
          if (!alreadyApplied) {
            graft.operators.Similarity.appendResidualPqBatch(
              spark, indexPath, df.toDF(), idCol, vecCol, dim, coarse, codebooks,
              extraMeta = Map(s"stream_batch:$streamId" -> batchId.toString))
            ()
          }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** STREAMING CDC REPLICA APPLY — the consumer half of the change feed
    * run continuously: each micro-batch of change rows (`_change_type`
    * insert/delete/update_pre/postimage) is applied to the replica by
    * [[graft.sources.VersionedTable.applyChangeFeedOnce]] — idempotent
    * upsert-by-key, touched-bucket rewrite only — as ONE delta commit
    * carrying the exactly-once `stream_batch:<streamId>` manifest marker.
    * The marker is checked INSIDE the commit-retry loop (the
    * [[vectorIndexSink]]/[[scd2WarehouseSink]] discipline): a re-delivered
    * batch id no-ops, a zombie driver that loses the commit race re-checks
    * and sees the winner's marker. Precondition: the upstream feed
    * partitioner must keep all of one key's change rows in one batch
    * (key-hash splitting satisfies it; q166 stages the feed that way) —
    * per-key atomicity is what makes replay order within a batch free.
    */
  def cdcApplySink(
      spark: SparkSession,
      source: DataFrame,
      replicaPath: String,
      keyCols: Seq[String],
      partCol: String,
      checkpointLocation: String,
      streamId: String = "cdc"
  ): StreamingQuery = {
    import graft.sources.VersionedTable
    require(streamId.matches("[A-Za-z0-9_-]+"), s"streamId '$streamId' must be filesystem-safe")
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        VersionedTable.withCommitRetry() {
          val alreadyApplied = lastStreamBatch(spark, replicaPath, streamId).exists(_ >= batchId)
          if (!alreadyApplied) {
            VersionedTable.applyChangeFeedOnce(
              spark, replicaPath, df.toDF(), keyCols, partCol,
              extraMeta = Map(s"stream_batch:$streamId" -> batchId.toString))
            ()
          }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** STREAMING SKETCH-ROLLUP MAINTENANCE — the q165 pre-aggregation kept
    * fresh by a stream instead of nightly jobs, and the proof that the
    * rollup's state is genuinely MERGEABLE: each micro-batch's
    * per-(day, event_type) HLL sketches are UNIONED with the stored
    * sketches of the days the batch touches (merge-on-write — late or
    * same-day data folds into the existing registers losslessly; HLL
    * union is associative, so arrival order and batch boundaries cannot
    * change the state), then committed as ONE delta touching only those
    * day partitions, under the exactly-once `stream_batch` marker checked
    * inside the commit-retry loop. Range probes keep serving every
    * committed version throughout. Per-batch cost: one aggregation of the
    * batch + a read of the touched days' sketch rows (O(types) KB-sized
    * rows per day) — never the historical raw events.
    */
  def sketchRollupSink(
      spark: SparkSession,
      source: DataFrame, // (day STRING, event_type STRING, user_id LONG)
      rollupPath: String,
      checkpointLocation: String,
      streamId: String = "sketch"
  ): StreamingQuery = {
    import graft.sources.VersionedTable
    require(streamId.matches("[A-Za-z0-9_-]+"), s"streamId '$streamId' must be filesystem-safe")
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        VersionedTable.withCommitRetry() {
          val alreadyApplied = lastStreamBatch(spark, rollupPath, streamId).exists(_ >= batchId)
          if (!alreadyApplied) {
            // batch-scoped cache (round-18): the batch aggregation feeds
            // both the touched-day collect and the merge union — uncached
            // it re-aggregated the whole micro-batch twice
            val (batchSk, own) = graft.core.Caching.cachedOwned(
              df.toDF()
                .groupBy(col("day"), col("event_type"))
                .agg(hll_sketch_agg(col("user_id")).as("sk")))
            try {
              val touched = batchSk.select(col("day")).distinct()
                .collect().map(_.getString(0)).sorted.toSeq // bounded: days per batch
              val existing = VersionedTable.latestVersion(spark, rollupPath)
                .flatMap(_ => VersionedTable.readPartitionsUnioned(spark, rollupPath, touched))
              val merged = existing match {
                case Some(ex) => ex.select(col("day"), col("event_type"), col("sk"))
                  .unionByName(batchSk)
                  .groupBy(col("day"), col("event_type"))
                  .agg(hll_union_agg(col("sk")).as("sk"))
                case None => batchSk
              }
              VersionedTable.commitDelta(
                spark, rollupPath, merged, "day",
                extraMeta = Map(s"stream_batch:$streamId" -> batchId.toString))
              ()
            } finally graft.core.Caching.releaseOwned(batchSk, own)
          }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  // ------------------------------------------------------------------
  // Continuous (multi-batch) gap sessionization + cumulative cutover
  // ------------------------------------------------------------------

  /** Reserved user id for watermark-advancing heartbeat rows (the
    * punctuation/idle-source pattern): a bounded replay appends ONE
    * far-future heartbeat event so the watermark passes every open
    * session's timeout and end-of-data state flushes. Heartbeat groups
    * never emit and never hold state.
    */
  val HeartbeatUser: Long = Long.MinValue

  /** Closed gap-session row (column names match q24's batch oracle). */
  final case class GapSession(
      user_id: Long,
      session_id: Long,
      n_events: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      session_value_cents: Option[Long]
  )

  /** Per-user open-session state carried across micro-batches. */
  final case class OpenSession(
      sessionId: Long,
      n: Long,
      startMicros: Long,
      endMicros: Long,
      sumCents: Option[Long]
  )

  private def microsOf(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def tsOf(m: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(m, 1000000L) * 1000L)
    t.setNanos((math.floorMod(m, 1000000L) * 1000L).toInt)
    t
  }

  /** decimal(18,2) HALF_UP cents over the SHORTEST DECIMAL form of the
    * double (BigDecimal.valueOf == Double.toString == what Spark's
    * cast-to-decimal and DuckDB's CAST round from).
    */
  private[graft] def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP).movePointRight(2).longValueExact()

  /** CONTINUOUS gap-based sessionization: per-user open sessions live in
    * `GroupState` and carry across micro-batches; a session closes either
    * when a later event opens the next one (gap exceeded in event time) or
    * when the EVENT-TIME TIMEOUT fires — registered at
    * `session_end + gap` (+1s ceil slack), so once the watermark passes the
    * point where no in-time event could extend the session, it flushes.
    * Output mode Append: each session is emitted exactly once, closed.
    *
    * Ordering contract: intra-batch disorder is fully repaired (events are
    * sorted by (ts, event_id) inside each batch); ACROSS batches events must
    * arrive in event-time order — the file-replay harness guarantees it by
    * time-slicing. A late event older than the watermark is dropped by the
    * engine (standard watermark semantics). An event NEWER than the
    * watermark but older than the open session's last-seen instant (cross-
    * batch disorder inside the watermark delay) would silently
    * mis-sessionize if processed, so it throws IllegalStateException
    * instead — explicit error, never silent wrongness; a feed with genuine
    * in-delay disorder needs a watermark-buffered design (Spark's native
    * session_window), not this state machine.
    *
    * Session numbering survives timeout flushes: the flushed slot collapses
    * to a residual counter (no open session, no timeout — 5 longs per
    * ever-seen user, the same state order as any per-user aggregation), so
    * a user who returns continues at the next session_id exactly like the
    * batch sessionizer.
    *
    * End-of-data flush: a bounded replay appends one [[HeartbeatUser]] row
    * with a far-future timestamp; the watermark then passes every open
    * session's timeout and the final no-data micro-batch (which
    * `Trigger.AvailableNow` runs because the executed plan reports
    * state-cleanup work outstanding) emits them. In continuous operation
    * no heartbeat is needed — fresh data advances the watermark.
    *
    * `events` needs columns (user_id LONG, event_id LONG, ts TIMESTAMP,
    * value DOUBLE nullable); value is summed in exact decimal cents with
    * SQL null semantics (all-null session -> null sum).
    */
  def gapSessions(
      s: SparkSession,
      events: DataFrame,
      gapMicros: Long = 3600000000L,
      watermarkDelay: String = "10 minutes"
  ): Dataset[GapSession] = {
    import s.implicits._
    val gapMs = gapMicros / 1000L
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, java.sql.Timestamp, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, Long, java.sql.Timestamp, Option[Double])], state: GroupState[OpenSession]) =>
          if (uid == HeartbeatUser) Iterator.empty
          else if (state.hasTimedOut) {
            // watermark passed session_end + gap: nothing in-time can extend
            // this session any more -> flush it, but RETAIN the counter as a
            // residual (n = 0) slot so a returning user keeps numbering
            // where the batch sessionizer would (no timeout registered: the
            // residual never fires again until an event re-opens it)
            val o = state.get
            state.update(o.copy(n = 0L, startMicros = o.endMicros, sumCents = None))
            if (o.n > 0)
              Iterator.single(GapSession(uid, o.sessionId, o.n, tsOf(o.startMicros), tsOf(o.endMicros), o.sumCents))
            else Iterator.empty
          } else {
            val sorted = it.toVector.sortBy(e => (microsOf(e._3), e._2))
            val out = Vector.newBuilder[GapSession]
            var sid = 0L; var n = 0L; var sum = Option.empty[Long]
            var start = 0L; var end = 0L; var prev = Long.MinValue
            state.getOption.foreach { o =>
              sid = o.sessionId; n = o.n; sum = o.sumCents; start = o.startMicros; end = o.endMicros; prev = o.endMicros
            }
            sorted.headOption.foreach { case (_, _, ts, _) =>
              val m = microsOf(ts)
              // cross-batch disorder INSIDE the watermark delay: processing
              // it would regress the open session and silently mis-number
              // everything after — refuse loudly instead (see scaladoc)
              require(
                prev == Long.MinValue || m >= prev,
                s"cross-batch event-time disorder for user $uid: event at $m micros predates the " +
                  s"session state at $prev micros (within the watermark delay); this state-machine " +
                  "sessionizer requires cross-batch event-time order — buffer or re-slice the feed"
              )
            }
            def close(): Unit = if (n > 0) out += GapSession(uid, sid, n, tsOf(start), tsOf(end), sum)
            sorted.foreach { case (_, _, ts, v) =>
              val m = microsOf(ts)
              if (prev == Long.MinValue || m - prev > gapMicros) { close(); sid += 1; n = 0; sum = None; start = m }
              n += 1; v.foreach(x => sum = Some(sum.getOrElse(0L) + cents(x))); end = m; prev = m
            }
            // the newest session stays OPEN in state; timeout registered
            // just past the last instant an in-time event could extend it
            // (+1s: setTimeoutTimestamp is millis, end is micros -> ceil)
            state.update(OpenSession(sid, n, start, end, sum))
            if (n > 0) state.setTimeoutTimestamp(end / 1000L + gapMs + 1000L)
            out.result().iterator
          }
      }
  }

  /** Per-user cutover-delta output row (column names match q12's oracle). */
  final case class UserDelta(user_id: Long, n_events: Long, delta_total_cents: Option[Long])

  /** Per-user running accumulator for [[cutoverDeltas]]. */
  final case class DeltaAcc(n: Long, hasPre: Boolean, preSum: Option[Long], postSum: Option[Long])

  /** CONTINUOUS cumulative->delta cutover: per-user sums accumulate in
    * state across micro-batches (order-insensitive — sums commute, so no
    * cross-batch ordering contract is needed here), and every user flushes
    * ONCE when the watermark passes `flushAtMillis` — "snapshot the delta
    * ledger at time T" semantics. Users first seen before `cutoffMicros`
    * get delta = post-cutoff sum (total − snapshot); users first seen after
    * pass their raw total through (the reference's no-snapshot asymmetry).
    * A bounded replay appends a [[HeartbeatUser]] row past `flushAtMillis`
    * (+ watermark delay) to force the flush at end-of-data.
    *
    * Post-flush stragglers: once the watermark has passed `flushAtMillis`
    * the snapshot has been emitted; an event for a new key arriving after
    * that is DROPPED (standard late-data semantics) rather than recreating
    * state — re-registering a timeout at `flushAtMillis` below the current
    * watermark would be rejected by Spark and kill the query. Events for a
    * key whose state still exists in that boundary batch are folded in
    * (its already-registered timeout fires at batch end with them
    * included).
    */
  def cutoverDeltas(
      s: SparkSession,
      events: DataFrame,
      cutoffMicros: Long,
      flushAtMillis: Long,
      watermarkDelay: String = "10 minutes"
  ): Dataset[UserDelta] = {
    import s.implicits._
    events
      .select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp, Option[Double])], state: GroupState[DeltaAcc]) =>
          if (uid == HeartbeatUser) Iterator.empty
          else if (state.hasTimedOut) {
            val a = state.get
            state.remove()
            // snapshot exists (seen pre-cutoff): delta = total - snapshot =
            // post-cutoff sum (SQL null-preserving); else raw total through
            val delta =
              if (a.hasPre) (a.preSum, a.postSum) match {
                case (None, None) => None
                case (_, post)    => Some(post.getOrElse(0L))
              }
              else (a.preSum, a.postSum) match {
                case (None, None) => None
                case (p, q)       => Some(p.getOrElse(0L) + q.getOrElse(0L))
              }
            Iterator.single(UserDelta(uid, a.n, delta))
          } else {
            val wm = state.getCurrentWatermarkMs()
            if (!state.exists && wm >= flushAtMillis) {
              // straggler for an already-flushed key: the snapshot was
              // emitted when the watermark passed flushAtMillis, and a
              // timeout re-registered at flushAtMillis would sit below the
              // watermark (Spark rejects it, killing the query). Drop.
              Iterator.empty
            } else {
              var a = state.getOption.getOrElse(DeltaAcc(0L, hasPre = false, None, None))
              it.foreach { case (_, ts, v) =>
                val pre = microsOf(ts) < cutoffMicros
                a = a.copy(
                  n = a.n + 1,
                  hasPre = a.hasPre || pre,
                  preSum = if (pre) v.map(x => a.preSum.getOrElse(0L) + cents(x)).orElse(a.preSum) else a.preSum,
                  postSum = if (!pre) v.map(x => a.postSum.getOrElse(0L) + cents(x)).orElse(a.postSum) else a.postSum
                )
              }
              state.update(a)
              // existing state in the boundary batch (wm just passed
              // flushAtMillis) keeps its prior registration — its timeout
              // fires at this batch's end with these events folded in
              if (flushAtMillis > wm) state.setTimeoutTimestamp(flushAtMillis)
              Iterator.empty
            }
          }
      }
  }

  /** STREAMING DECAYED COUNTER — the O(1)-state twin of
    * [[graft.operators.TimeSeries.decayedValue]]: per-key state is just
    * (accumulator, count); each micro-batch sorts ITS OWN slice of a
    * key's events by (ts, event_id) and folds them in with
    * `acc' = floor(acc * decayE4 / 1e4) + cents` (floorDiv — the exact
    * integer twin of the batch fold's FLOOR chain). One updated
    * (key, n, acc) row emits per key per batch; the LAST emission per
    * key (max n) is the converged value.
    *
    * Convergence-to-batch precondition (q104's class of caveat): a key's
    * events must not INTERLEAVE out of (ts, id) order ACROSS micro-batch
    * boundaries — within a batch any order is fine (the fold sorts). An
    * AvailableNow replay of a single file is one batch, trivially
    * ordered; multi-batch live streams need per-key event-time ordering
    * across triggers (or a buffer-and-watermark variant) for exact
    * batch-oracle equality. The production semantic of arrival-order
    * folding needs no precondition — only ORACLE EQUALITY does.
    *
    * Input columns: user_id LONG, event_id LONG, ts TIMESTAMP,
    * cents LONG. State per key is two longs — 100M keys is ~GBs sharded
    * across the cluster's state store (RocksDB default in
    * [[graft.core.Sessions]]).
    */
  def decayedCounter(events: DataFrame, decayE4: Long)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(decayE4 >= 0 && decayE4 <= 10000, s"decayE4=$decayE4 must be in [0, 10000]")
    events
      .selectExpr("user_id", "event_id", "ts", "cents")
      .as[(Long, Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, java.sql.Timestamp, Long)], state: GroupState[(Long, Long)]) =>
          val evs = it.toSeq.sortBy(e => (e._3.getTime, e._2))
          var (acc, n) = state.getOption.getOrElse((0L, 0L))
          evs.foreach { e =>
            acc = Math.floorDiv(acc * decayE4, 10000L) + e._4
            n += 1
          }
          state.update((acc, n))
          Iterator((user, n, acc))
      }
      .toDF("user_id", "n_events", "decayed_cents")
  }
}
