package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SCD Type-2 upsert, the reference's core load operator (O-SCD2).
  *
  * Reference semantics (loading.py:25-133, canonical `load_ad_unit`, repeated
  * x14): (1) close every currently-active target row whose business key
  * appears in the staging batch — `actv_flg='N'`, `record_to=now`; (2) insert
  * every batch row as a new active version (`actv_flg='Y'`, `record_to=null`);
  * (3) truncate staging.
  *
  * Spark formulation: a left-semi/anti split of the active partition against
  * the distinct batch keys, then a union. No MERGE engine needed; the whole
  * thing is three narrow scans plus one shuffle on the key. At 100 TB the
  * target should be stored partitioned (or bucketed) by the business key's
  * hash so the semi/anti joins co-locate; the batch key set is typically tiny
  * relative to the target and broadcast-joins automatically.
  */
object Scd2 {

  /** Close-and-insert upsert on a single business key (J1 + O-SCD2).
    *
    * @param target  current SCD-2 table (must contain keyCols, `actv_flg`,
    *                `record_to`)
    * @param batch   staging rows; must contain keyCols and the target's
    *                payload columns (minus actv_flg/record_to, which are set
    *                here)
    * @param keyCols business key column names
    * @param now     close/insert timestamp column (inject a literal for
    *                deterministic tests; reference stamps sysdate,
    *                loading.py:32-35)
    */
  def upsert(target: DataFrame, batch: DataFrame, keyCols: Seq[String], now: Column): DataFrame = {
    val keys = batch.select(keyCols.map(col): _*).distinct()
    val active = target.filter(col("actv_flg") === "Y")
    val inactive = target.filter(col("actv_flg") =!= "Y" || col("actv_flg").isNull)

    // rows to flip: active AND key present in batch
    val closed = active
      .join(keys, keyCols, "left_semi")
      .withColumn("actv_flg", lit("N"))
      .withColumn("record_to", now)
    // rows untouched: active, key absent
    val untouched = active.join(keys, keyCols, "left_anti")

    val inserted = batch
      .withColumn("actv_flg", lit("Y"))
      .withColumn("record_to", lit(null).cast("timestamp"))

    // allowMissingColumns: schema drift between target and batch (a widened
    // batch against a pre-widening target, or the reverse after reading a
    // mix of old/new buckets) null-pads instead of throwing — the write-path
    // mirror of VersionedTable.read's mergeSchema story
    inactive
      .unionByName(closed)
      .unionByName(untouched)
      .unionByName(inserted, allowMissingColumns = true)
  }

  /** Two-key close variant (J2): the reference closes `line_item_creative`
    * rows when `creative_id IN (batch creative ids) AND line_item_id IN
    * (batch line item ids)` — two INDEPENDENT in-lists, not a pair-wise key
    * (loading.py:934-938). This closes strictly more rows than pair matching;
    * the semantics are preserved faithfully here.
    */
  def upsertTwoKeyInLists(
      target: DataFrame,
      batch: DataFrame,
      key1: String,
      key2: String,
      now: Column
  ): DataFrame = {
    val k1 = batch.select(key1).distinct()
    val k2 = batch.select(key2).distinct()
    val active = target.filter(col("actv_flg") === "Y")
    val inactive = target.filter(col("actv_flg") =!= "Y" || col("actv_flg").isNull)

    // independent IN-list semantics: semi-join on key1, then semi-join on key2
    val toClose = active.join(k1, Seq(key1), "left_semi").join(k2, Seq(key2), "left_semi")
    val closed = toClose
      .withColumn("actv_flg", lit("N"))
      .withColumn("record_to", now)
    // untouched = active minus toClose = anti on key1 OR anti on key2
    val untouched = active
      .join(k1, Seq(key1), "left_anti")
      .unionByName(active.join(k1, Seq(key1), "left_semi").join(k2, Seq(key2), "left_anti"))

    val inserted = batch
      .withColumn("actv_flg", lit("Y"))
      .withColumn("record_to", lit(null).cast("timestamp"))

    inactive
      .unionByName(closed)
      .unionByName(untouched)
      .unionByName(inserted, allowMissingColumns = true)
  }

  /** Latest-version view: one row per key, the most recent by `insrt_ts`
    * (window dedup; deterministic tie-break on actv_flg desc so the open
    * version wins a timestamp tie).
    */
  def latestView(scd: DataFrame, keyCols: Seq[String], tsCol: String = "insrt_ts"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol).desc, col("actv_flg").desc)
    scd.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** POINT-IN-TIME LOOKUP JOIN: for each probe row, the warehouse version
    * of its business key that was valid at the probe's timestamp —
    * time-travel as a join, the backbone of training-feature correctness
    * (no future leakage: a feature joined "as the warehouse knew it then").
    *
    * Validity contract: each version row carries `fromCol` (stamped by the
    * loader as batch payload) and the upsert-maintained `toCol` (null =
    * still open); a key's versions must not overlap, so at most one
    * version matches a probe. Probes whose key had NO valid version at
    * their timestamp (key not yet loaded, or probed inside a gap) drop out
    * — inner semantics, the caller outer-joins if absence matters.
    *
    * Scale shape: this is an ordinary EQUI-join on the business key with
    * the containment as a residual filter — no bin blocking needed
    * (contrast [[RangeJoin.binnedIntervalJoin]], which exists for KEYLESS
    * containment). One shuffle on the key; AQE handles key skew.
    */
  def pointInTimeLookup(
      warehouse: DataFrame,
      probes: DataFrame,
      keyCols: Seq[String],
      probeTsCol: String,
      fromCol: String = "record_from",
      toCol: String = "record_to"
  ): DataFrame =
    probes
      .join(warehouse, keyCols)
      .filter(
        col(probeTsCol) >= col(fromCol) &&
          (col(toCol).isNull || col(probeTsCol) < col(toCol)))

  /** O-FULL: full-refresh load (the `*_new` report loaders,
    * loading.py:1937-1956) — plain overwrite, no history.
    */
  def fullRefresh(batch: DataFrame, path: String): Unit =
    batch.write.mode("overwrite").parquet(path)

  /** Deterministic key-bucket for partition-scoped storage: a key's rows
    * (all its SCD-2 versions) always land in the same bucket, so an upsert
    * touches exactly the buckets its batch keys hash to.
    */
  def keyBucket(keyCols: Seq[String], nBuckets: Int): Column =
    pmod(
      graft.plans.HashExpressions.md5Prefix60(concat_ws("", keyCols.map(c => col(c).cast("string")): _*)),
      lit(nBuckets.toLong)
    )

  /** Partition-scoped SCD-2 load against a delta-committed
    * [[graft.sources.VersionedTable]]: reads ONLY the key-bucket partitions
    * the batch touches, upserts within them, and commits just those
    * partitions — untouched partitions carry forward by manifest reference
    * with zero data movement. This is the load shape that survives a 100 TB
    * target (the round-1 full-snapshot `Pipeline.load` copies the whole
    * table per run; reference semantics per loading.py:25-133 are
    * unchanged).
    *
    * Correctness of the scoping: `actv_flg` flips only for rows whose key
    * appears in the batch, and a key's rows live in exactly one bucket
    * ([[keyBucket]] is a pure key function), so rows outside the touched
    * buckets are provably unchanged by [[upsert]].
    *
    * @return the committed version
    */
  def upsertPartitioned(
      spark: org.apache.spark.sql.SparkSession,
      warehousePath: String,
      batch: DataFrame,
      keyCols: Seq[String],
      nBuckets: Int,
      now: Column,
      bucketCol: String = "key_bucket",
      maxRetries: Int = 3,
      commitMeta: Map[String, String] = Map.empty
  ): Long = {
    import graft.sources.VersionedTable
    def attempt(): Long = {
      // operator-scoped cache of the bucketed batch (round-18, guide §2.4):
      // the batch subtree (often a window/join pipeline) is referenced by
      // the touched-list collect, the upsert's key set, and the inserted
      // branch — uncached it re-executed up to 3x per load. Batch-sized
      // (bounded by the load, not the table), MEMORY_AND_DISK, released at
      // commit; recomputed per invocation, never across runs.
      val (b, ownB) = graft.core.Caching.cachedOwned(batch.withColumn(bucketCol, keyBucket(keyCols, nBuckets)))
      try {
        // bounded driver-side list: at most nBuckets values
        val touched = b.select(bucketCol).distinct().collect().map(_.getLong(0)).sorted
        val targetTouched = VersionedTable.latestVersion(spark, warehousePath) match {
          case Some(v) =>
            // one manifest read + ONE multi-dir relation for every touched
            // bucket (round-18: was one scan per bucket + a 16-way union);
            // mergeSchema null-pads drift as the union did
            VersionedTable.readPartitionsUnioned(spark, warehousePath, touched.map(_.toString).toSeq, Some(v))
              .getOrElse(emptyTarget(b, bucketCol))
          case None => emptyTarget(b, bucketCol)
        }
        val result = upsert(targetTouched, b, keyCols, now)
        VersionedTable.commitDelta(spark, warehousePath, result, bucketCol, extraMeta = commitMeta)
      } finally graft.core.Caching.releaseOwned(b, ownB)
    }
    // a losing concurrent writer aborts with ConcurrentModificationException;
    // the whole attempt (target read + upsert + commit) rebases on the new
    // latest version and retries — the optimistic-concurrency loop
    VersionedTable.withCommitRetry(maxRetries)(attempt())
  }

  /** GDPR / takedown deletion on a bucketed SCD-2 warehouse: removes EVERY
    * version (active and history) of the given business keys, rewriting
    * only the buckets those keys hash to — the other partitions carry
    * forward untouched. A bucket whose rows are all removed becomes an
    * empty partition (explicitly cleared from the manifest, never silently
    * resurrected).
    *
    * @return the committed version (current version if no bucket exists)
    */
  def deleteKeys(
      spark: org.apache.spark.sql.SparkSession,
      warehousePath: String,
      keys: DataFrame,
      keyCols: Seq[String],
      nBuckets: Int,
      bucketCol: String = "key_bucket"
  ): Long = graft.sources.VersionedTable.withCommitRetry() {
    import graft.sources.VersionedTable
    val doomed = keys.select(keyCols.map(col): _*).distinct()
    val touched = doomed
      .withColumn(bucketCol, keyBucket(keyCols, nBuckets))
      .select(bucketCol).distinct().collect().map(_.getLong(0)).sorted.map(_.toString).toSeq
    // single-relation touched read (round-18): the anti join distributes
    // over the bucket union — one scan + one join instead of per-bucket
    val existing = VersionedTable.readPartitionsUnioned(spark, warehousePath, touched)
    existing match {
      case None =>
        VersionedTable.latestVersion(spark, warehousePath)
          .getOrElse(throw new IllegalArgumentException(s"no committed versions at $warehousePath"))
      case Some(part) =>
        // NULL-SAFE anti join: a doomed key with NULL components must still
        // match NULL-keyed target rows (plain left_anti equality never
        // matches NULL, which would silently survive a takedown)
        val d = doomed.toDF(keyCols.map(c => s"__del_$c"): _*)
        val cond = keyCols.map(c => part(c) <=> d(s"__del_$c")).reduce(_ && _)
        val kept = part.join(broadcast(d), cond, "left_anti")
        VersionedTable.commitDelta(spark, warehousePath, kept, bucketCol, clearedParts = touched)
    }
  }

  private def emptyTarget(batchWithBucket: DataFrame, bucketCol: String): DataFrame =
    batchWithBucket
      .limit(0)
      .withColumn("actv_flg", lit("Y"))
      .withColumn("record_to", lit(null).cast("timestamp"))
}
