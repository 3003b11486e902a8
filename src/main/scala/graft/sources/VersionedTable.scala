package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal transactional table layout: versioned snapshots with an atomic
  * commit log — the engine's stand-in for a Delta/Iceberg table format
  * (no external format jars in this build, same core semantics).
  *
  * Layout:
  * {{{
  *   table/
  *     v=1/  v=2/ ...           # immutable parquet snapshot directories
  *       p=<part>/ ...          # (delta commits) per-partition data dirs
  *     _commits/1.json ...      # commit metadata, written AFTER the data
  *     _commits/1.reserved ...  # version reservations (writer lock files)
  * }}}
  *
  * Guarantees:
  *  - readers see only fully-committed versions (the commit file is the
  *    atomic publish: data is invisible until its rename completes)
  *  - time travel: `read(spark, path, Some(v))`
  *  - writers never mutate a published snapshot (rollback = read older v)
  *  - concurrent writers are safe: each writer RESERVES its version number
  *    with an exclusive create of `_commits/N.reserved` before touching any
  *    data path, so no two writers ever share a v-dir and no writer ever
  *    deletes another writer's data (the round-1 protocol deleted
  *    "orphan" v-dirs and could silently drop a concurrent writer's commit).
  *    A writer that dies after reserving leaves a version-number gap —
  *    harmless, readers only follow `*.json`. Exclusive create is atomic on
  *    local/HDFS filesystems; an object store without atomic create (raw
  *    S3) needs a catalog/lock service here, exactly as Delta does.
  *
  * Two commit flavors:
  *  - [[commit]]: full copy-on-write snapshot — the standard trade for
  *    small dimension/state tables (SCD-2 targets, config, snapshots).
  *  - [[commitDelta]]: partition-scoped rewrite for big fact tables — only
  *    the partitions present in the written DataFrame get new data; every
  *    other partition is carried forward BY REFERENCE in the commit
  *    manifest (`"partitions": {"<part>": <version holding its data>}`).
  *    A daily SCD-2 load over a 100 TB table rewrites the few key-bucket
  *    partitions its batch touches instead of copying the table.
  */
object VersionedTable {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def latestVersion(spark: SparkSession, path: String): Option[Long] = {
    val f = fs(spark, path)
    val commits = new Path(s"$path/_commits")
    if (!f.exists(commits)) None
    else {
      val vs = f.listStatus(commits).map(_.getPath.getName).filter(_.endsWith(".json")).map(_.stripSuffix(".json").toLong)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Reserve the next free version number with an exclusive create of
    * `_commits/N.reserved`. The reservation IS the write lock: losing the
    * create race just means trying N+1. Reserved-but-never-published
    * numbers (writer crash) stay burned — readers never see them.
    */
  private def reserveVersion(f: FileSystem, path: String): Long = {
    val commitsDir = new Path(s"$path/_commits")
    f.mkdirs(commitsDir)
    val taken = f.listStatus(commitsDir).map(_.getPath.getName).flatMap { n =>
      if (n.endsWith(".json")) Some(n.stripSuffix(".json").toLong)
      else if (n.endsWith(".reserved")) Some(n.stripSuffix(".reserved").toLong)
      else None
    }
    var v = if (taken.isEmpty) 1L else taken.max + 1
    var attempts = 0
    while (attempts < 1000) {
      try {
        val out = f.create(new Path(commitsDir, s"$v.reserved"), false) // exclusive
        out.close()
        return v
      } catch {
        case _: java.io.IOException => v += 1; attempts += 1 // lost the race; next number
      }
    }
    throw new IllegalStateException(s"could not reserve a version at $path after 1000 attempts")
  }

  /** A pre-existing uncommitted `v=N` dir while WE hold the reservation for
    * N can only be dead data (tampering or pre-reservation-protocol
    * leftovers — a live writer can't share our number). Remove it so the
    * rename replaces it instead of nesting inside it. Never touches
    * committed versions.
    */
  private def clearStaleDir(f: FileSystem, path: String, v: Long): Path = {
    val finalDir = new Path(s"$path/v=$v")
    if (f.exists(finalDir)) {
      if (f.exists(new Path(s"$path/_commits/$v.json")))
        throw new IllegalStateException(s"version $v of $path already committed")
      f.delete(finalDir, true)
    }
    finalDir
  }

  /** Atomically publish version `v`: metadata to a tmp file, rename to
    * `N.json`, drop the reservation marker.
    */
  private def publish(f: FileSystem, path: String, v: Long, meta: String): Unit = {
    val tmpCommit = new Path(s"$path/_commits/.$v.json.tmp")
    val out = f.create(tmpCommit, false)
    out.write(meta.getBytes("UTF-8")); out.close()
    if (!f.rename(tmpCommit, new Path(s"$path/_commits/$v.json")))
      throw new IllegalStateException(s"commit race on version $v of $path")
    f.delete(new Path(s"$path/_commits/$v.reserved"), false)
  }

  /** Commit a new FULL snapshot; returns the version number. Unconditional:
    * the newest commit wins regardless of what it was computed from — right
    * for full refreshes, wrong for read-modify-write loads (use
    * [[commitChecked]] there).
    */
  def commit(df: DataFrame, path: String): Long = fullCommit(df, path, check = None)

  /** Full-snapshot commit with optimistic concurrency: `base` is the latest
    * version the caller's snapshot was derived from (None = table was
    * empty). If anyone published since, this commit aborts with
    * `ConcurrentModificationException` instead of silently reverting the
    * concurrent writer's rows — pair with [[withCommitRetry]] and rebuild
    * the snapshot from a fresh read, mirroring [[commitDelta]]'s loop.
    */
  def commitChecked(df: DataFrame, path: String, base: Option[Long]): Long =
    fullCommit(df, path, check = Some(base))

  private def fullCommit(df: DataFrame, path: String, check: Option[Option[Long]]): Long = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    val v = reserveVersion(f, path)
    // v is exclusively ours: the data dir cannot collide with any other
    // writer, so no deletion of foreign dirs is ever needed
    val tmp = new Path(s"$path/.v=$v.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    val finalDir = clearStaleDir(f, path, v)
    if (!f.rename(tmp, finalDir))
      throw new IllegalStateException(s"failed to move snapshot into place for version $v of $path")
    check.foreach { base =>
      if (latestVersion(spark, path) != base) {
        f.delete(finalDir, true) // burned reservation marks the version dead
        throw new java.util.ConcurrentModificationException(
          s"concurrent commit on $path (base was $base); rebuild the snapshot on the new latest version")
      }
    }
    // a checked commit records its base so later writers' conflict checks
    // can tell "built on me" from "never saw me" (commitDelta semantics)
    val baseJson = check.map(b => s""""base": ${b.getOrElse(0L)}, """).getOrElse("")
    publish(f, path, v,
      s"""{"version": $v, $baseJson"schema": ${jsonStr(df.schema.json)}, "committed_at": ${System.currentTimeMillis()}}""")
    check.foreach { base =>
      // close the check-then-publish window exactly like commitDelta: any
      // commit that landed between base and v, or a higher one that never
      // saw us, demotes this commit (unless a successor already built on it)
      def conflictingSuccessor(w: Long): Boolean =
        try commitBase(spark, path, w).forall(_ < v)
        catch { case _: IllegalArgumentException => false } // demoted concurrently
      val conflict = committedVersions(f, path).filter { w =>
        (w > base.getOrElse(0L) && w < v) || (w > v && conflictingSuccessor(w))
      }
      if (conflict.nonEmpty && !durableThroughSuccessor(spark, f, path, v)) {
        try { val out = f.create(new Path(s"$path/_commits/$v.reserved"), false); out.close() }
        catch { case _: java.io.IOException => () } // marker already present
        f.delete(new Path(s"$path/_commits/$v.json"), false)
        throw new java.util.ConcurrentModificationException(
          s"concurrent commit(s) ${conflict.sorted.mkString(",")} on $path conflict with base $base; retry the load")
      }
    }
    v
  }

  /** Commit a DELTA: only the partitions present in `updated` (by the
    * string form of `partCol`) get new data under `v=N/p=<part>/`; all
    * other partitions carry forward by reference. The partition column
    * stays a real data column in the files (the `p=` layout is additional,
    * for pruned single-partition reads).
    *
    * The table must have been created by commitDelta (or be empty): mixing
    * full-snapshot and delta commits on one table is rejected.
    *
    * `clearedParts`: partitions this commit intends to touch even if the
    * written DataFrame holds NO rows for them — they are dropped from the
    * carried-forward manifest (an empty partition), instead of silently
    * resurrecting their previous contents. Required for deletions that
    * empty a partition; harmless to over-state.
    */
  def commitDelta(
      spark: SparkSession,
      path: String,
      updated: DataFrame,
      partCol: String,
      clearedParts: Seq[String] = Nil,
      extraMeta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil,
      clearDv: Boolean = false
  ): Long = {
    val reserved = Set("version", "base", "schema", "committed_at", "partitions", "partition_column")
    require(
      extraMeta.keySet.intersect(reserved).isEmpty,
      s"extraMeta must not use reserved manifest fields: ${extraMeta.keySet.intersect(reserved).mkString(",")}"
    )
    require(
      !extraMeta.keys.exists(_.startsWith("zone:")),
      "zone:* manifest fields are managed by statsCols; do not pass them via extraMeta"
    )
    statsCols.foreach(c =>
      require(c.matches("[A-Za-z0-9_]+"), s"statsCols name '$c' must be [A-Za-z0-9_]+ (it keys manifest fields)"))
    val f = fs(spark, path)
    val v = reserveVersion(f, path)
    // base version read AFTER reserving; re-checked at publish time so a
    // concurrent delta commit can't be silently reverted by our stale
    // carry-forward manifest (optimistic concurrency: the loser aborts and
    // retries on a fresh base)
    val base = latestVersion(spark, path)
    val prev = base.map { pv =>
      partitionMap(spark, path, pv).getOrElse(
        throw new IllegalStateException(
          s"table at $path version $pv is a full snapshot; commitDelta requires a delta-style table"))
    }.getOrElse(Map.empty[String, Long])
    // exactly-once stream markers ride ALONG THE LINEAGE: every delta commit
    // (loads, deletions, compaction) inherits the base manifest's
    // `stream_batch:*` fields, so the NEWEST commit always carries them and
    // compact+vacuum can never erase a marker a re-delivered micro-batch
    // needs to see (own extraMeta wins on key collision)
    // deletion vectors ride the lineage like stream markers — every commit
    // inherits the base's pending `dv:*` entries so merge-on-read keeps
    // applying them — EXCEPT a physical-apply commit (clearDv: the writer
    // certifies its data was produced from a DV-applied read of the whole
    // table, so the entries are spent)
    val inheritedDv =
      if (clearDv) Map.empty[String, String]
      else base.map(dvMarkers(spark, path, _)).getOrElse(Map.empty[String, String])
    val meta = base.map(streamMarkers(spark, path, _)).getOrElse(Map.empty) ++ inheritedDv ++ extraMeta
    // ZONE MAPS (the Delta/Iceberg data-skipping analogue): per written
    // partition, min/max of each requested long-castable column, recorded
    // in the manifest as `zone:<col>:<part>` -> "<min>,<max>". One extra
    // aggregation pass over the BATCH (not the table); the driver holds
    // one row per touched partition. All-null columns record no entry
    // (readers must scan such partitions). Stats for carried-forward
    // partitions are inherited below; partitions rewritten WITHOUT
    // statsCols drop their stale entries — pruning can only under-prune,
    // never serve wrong results.
    val zoneStats: Map[String, Seq[(String, (Long, Long))]] =
      if (statsCols.isEmpty) Map.empty
      else {
        val aggs = statsCols.flatMap(c =>
          Seq(min(col(c).cast("long")).as(s"__mn_$c"), max(col(c).cast("long")).as(s"__mx_$c")))
        updated
          .groupBy(col(partCol).cast("string").as("__p"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            r.getString(0) -> statsCols.flatMap { c =>
              val mn = r.getAs[Any](s"__mn_$c")
              val mx = r.getAs[Any](s"__mx_$c")
              if (mn == null || mx == null) None
              else Some(c -> (mn.asInstanceOf[Long], mx.asInstanceOf[Long]))
            }
          }
          .toMap
      }
    val tmp = new Path(s"$path/.v=$v.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    // duplicate the partition column: partitionBy strips __part from the
    // files, the original column survives as data. Values are validated
    // INSIDE the write job (before anything is renamed into place): a NULL
    // or escape-needing value fails the stage, not the manifest — the p=
    // dir name must stay equal to the data column's value (NULL would land
    // as __HIVE_DEFAULT_PARTITION__, committed under a name no
    // readPartition of the real key can reach).
    val partStr = col(partCol).cast("string")
    val validatedPart = when(
      partStr.isNull,
      raise_error(lit(s"partition column '$partCol' must not be NULL for delta commits")).cast("string")
    ).when(
      !partStr.rlike("^[A-Za-z0-9_.-]+$"),
      raise_error(concat(lit("partition value '"), partStr, lit("' needs escaping; use simple bucket ids"))).cast("string")
    ).otherwise(partStr)
    // stage + move, cleaning the tmp dir on EVERY abort path (a rejected
    // value or failed rename must not leave staged garbage; the burned
    // reservation is harmless — readers only follow *.json)
    val (written, finalDir) =
      try {
        // REBALANCE by the partition value before the partitioned write
        // (round-18, guide §6 "coalesce on write"): without it every task
        // of the upstream join/union stage opens a writer per partition
        // value it holds (observed: 48 files for a 16-bucket commit whose
        // rows fit in one), and at scale the same layout degrades to
        // tasks x partitions small files. The rebalance shuffle carries
        // only the batch being committed; AQE sizes the output tasks to
        // spark.sql.adaptive.advisoryPartitionSizeInBytes (scale-adaptive:
        // tiny commits coalesce to one writer, large commits split at the
        // advisory size, skewed buckets split too).
        //
        // GATED by the batch's estimated size (round-19, VERDICT r18 #1):
        // a commit whose whole batch fits inside ONE advisory partition
        // does not need a shuffle to avoid small files — COALESCE(1) gives
        // exactly one writer task and therefore ONE file per partition
        // value (the same layout the rebalance produced) at zero exchange
        // cost. Many-small-commit builders (index builds, per-day loads)
        // were paying the rebalance exchange + AQE replan on every commit
        // (driver setup_sec: q130 2.67->16.87 s, q140 8.84->18.68 s),
        // while simply SKIPPING the rebalance for small batches fans the
        // write back out to tasks x partitions tiny files, which every
        // later read of the version then pays for (measured this round:
        // q80 2.5->6.0 s with the skip-only gate). Above the advisory
        // size the rebalance stays: AQE sizes writers scale-adaptively.
        // Plan-statistics estimate: over-estimation keeps the rebalance
        // (r18 behavior); under-estimation coalesces a somewhat larger
        // batch through one writer — bounded by how far stats can be off
        // for the join/union shapes commits carry.
        //
        // TWO-BAND cutoff at advisory/16 (sf1 re-bench evidence): a
        // single writer is only free while the batch is genuinely tiny —
        // at ~10-14 MB (the suite's sf1 commit batches) coalesce(1)
        // serialized the post-exchange apply work and the multi-file
        // partitioned write that the rebalance parallelizes (q148 sf1
        // 1.8->3.1 s, q144 sf1 5.1 s measured with a single-band gate),
        // while the sf0.1-scale builder commits (~1-2 MB) keep the full
        // zero-shuffle win. The cutoff scales with the advisory conf, so
        // deployments that raise the advisory raise both bands together.
        val advisory = spark.sessionState.conf.getConf(
          org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
        val estBytes = updated.queryExecution.optimizedPlan.stats.sizeInBytes
        val staged = updated.withColumn("__part", validatedPart)
        val placed =
          if (estBytes <= BigInt(advisory) / 16) staged.coalesce(1)
          else staged.hint("rebalance", col("__part"))
        placed.write.partitionBy("__part").mode("overwrite").parquet(tmp.toString)
        val w = f.listStatus(tmp).map(_.getPath.getName).filter(_.startsWith("__part=")).map(_.stripPrefix("__part="))
        w.foreach { p => // defense in depth; the write-side validation already enforced this
          require(p.matches("[A-Za-z0-9_.-]+"), s"partition value '$p' needs escaping; use simple bucket ids")
        }
        val fd = clearStaleDir(f, path, v)
        f.mkdirs(fd)
        w.foreach { p =>
          if (!f.rename(new Path(tmp, s"__part=$p"), new Path(fd, s"p=$p")))
            throw new IllegalStateException(s"failed to move partition $p into place for version $v of $path")
        }
        f.delete(tmp, true)
        (w, fd)
      } catch {
        case e: Throwable =>
          f.delete(tmp, true)
          f.delete(new Path(s"$path/v=$v"), true) // partially-moved stage (never published)
          throw e
      }
    // publish-time conflict check: if anyone published since `base`, our
    // carry-forward map is stale — abort (data dir stays orphaned under the
    // burned version number; reservation marks it dead). Caller retries the
    // whole upsert against the new latest.
    if (latestVersion(spark, path) != base) {
      f.delete(finalDir, true)
      throw new java.util.ConcurrentModificationException(
        s"concurrent commit on $path (base was $base); retry the delta against the new latest version")
    }
    val parts = (prev -- clearedParts.filterNot(written.contains)) ++ written.map(_ -> v)
    // zone stats ride the lineage like stream markers, but per PARTITION:
    // carried-forward partitions keep their base entries, rewritten or
    // cleared partitions drop them (fresh entries only if statsCols asked)
    val carried = parts.collect { case (p, pv) if pv != v => p }.toSet
    val inheritedZone = base
      .map(zoneMarkers(spark, path, _))
      .getOrElse(Map.empty[String, String])
      .filter { case (k, _) => k.split(":", 3).lift(2).exists(carried.contains) }
    val newZone = zoneStats.flatMap { case (p, cs) =>
      cs.map { case (c, (mn, mx)) => s"zone:$c:$p" -> s"$mn,$mx" }
    }
    val metaAll = inheritedZone ++ meta ++ newZone
    val partsJson = parts.toSeq.sortBy(_._1).map { case (p, pv) => s"${jsonStr(p)}: $pv" }.mkString("{", ", ", "}")
    val extraJson = metaAll.toSeq.sortBy(_._1).map { case (k, x) => s", ${jsonStr(k)}: ${jsonStr(x)}" }.mkString
    publish(f, path, v,
      s"""{"version": $v, "base": ${base.getOrElse(0L)}, "schema": ${jsonStr(updated.schema.json)}, "committed_at": ${System.currentTimeMillis()}, "partition_column": ${jsonStr(partCol)}, "partitions": $partsJson$extraJson}""")
    // Close the remaining check-then-publish window. Conflict shapes:
    //  (a) a commit landed BETWEEN our base and v — its partitions are
    //      missing from our carry-forward manifest;
    //  (b) a HIGHER version published whose recorded `base` < v — it never
    //      saw us (a higher version with base >= v legitimately built ON us
    //      and must NOT trigger a demote). A higher version whose json has
    //      meanwhile VANISHED was itself demoted — not a conflict.
    // Either conflict: demote our own commit and abort — the caller retries
    // on a fresh base, rebasing both updates. Demote protocol:
    //  1. re-create our reservation marker FIRST, so the version number can
    //     never be reused while our v-dir exists (a reuser's stale-dir
    //     clearing could otherwise delete data a successor's manifest
    //     references);
    //  2. delete the json (un-publish);
    //  3. leave the DATA in place — a successor that transiently saw our
    //     commit may reference our partition dirs from its manifest;
    //     reclamation is vacuum's job, which honors such references.
    def conflictingSuccessor(w: Long): Boolean =
      try commitBase(spark, path, w).forall(_ < v)
      catch { case _: IllegalArgumentException => false } // demoted concurrently
    val conflict = committedVersions(f, path).filter { w =>
      (w > base.getOrElse(0L) && w < v) || (w > v && conflictingSuccessor(w))
    }
    if (conflict.nonEmpty && !durableThroughSuccessor(spark, f, path, v)) {
      try { val out = f.create(new Path(s"$path/_commits/$v.reserved"), false); out.close() }
      catch { case _: java.io.IOException => () } // marker already present
      f.delete(new Path(s"$path/_commits/$v.json"), false)
      throw new java.util.ConcurrentModificationException(
        s"concurrent commit(s) ${conflict.sorted.mkString(",")} on $path conflict with base $base; retry the delta")
    }
    v
  }

  /** Demote fence: once a committed SUCCESSOR has recorded `base >= v`, a
    * writer that detects a conflict on its own version v must NOT retract
    * it — the successor read v's published state, so v's effects are
    * durably embedded in the successor's lineage. Retracting would (a)
    * leave the successor's carried partition references pointing at a
    * version readers can no longer justify, and (b) make the caller's
    * retry RE-APPLY the same batch on top of state that already contains
    * it — for SCD-2, closing the just-inserted rows and inserting duplicate
    * versions. The commit is instead treated as durable (the OTHER
    * conflicting writer's own post-publish check demotes/retries it).
    * Residual window (documented, not closed): a racer that published and
    * passed its check between our base read and our publish, combined with
    * a successor landing inside our post-publish check — microseconds wide,
    * needs three writers; a pre-publish fence (pending->seal two-phase
    * commit) would close it at the cost of a second atomic op per commit.
    */
  private[graft] def durableThroughSuccessor(spark: SparkSession, f: FileSystem, path: String, v: Long): Boolean =
    committedVersions(f, path).exists { w =>
      w > v && (try commitBase(spark, path, w).exists(_ >= v)
      catch { case _: IllegalArgumentException => false }) // successor demoted concurrently
    }

  /** Run `body`, retrying on the optimistic-concurrency abort
    * (ConcurrentModificationException) so each attempt rebases on the new
    * latest version.
    */
  def withCommitRetry[T](maxRetries: Int = 3)(body: => T): T = {
    var tries = 0
    while (true) {
      try return body
      catch {
        case e: java.util.ConcurrentModificationException =>
          tries += 1
          if (tries > maxRetries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Committed (published) versions of the table, any order. */
  def committedVersionsPublic(spark: SparkSession, path: String): Seq[Long] =
    committedVersions(fs(spark, path), path)

  private def committedVersions(f: FileSystem, path: String): Seq[Long] = {
    val commits = new Path(s"$path/_commits")
    if (!f.exists(commits)) Nil
    else f.listStatus(commits).map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).toSeq
  }

  /** The `base` a delta commit was built on (None for pre-base-field or
    * full-snapshot commits — treated as "did not see us" conservatively).
    */
  private def commitBase(spark: SparkSession, path: String, version: Long): Option[Long] = {
    val root = readCommitJson(spark, path, version)
    val b = root.path("base")
    if (b.isNumber) Some(b.asLong()) else None
  }

  private def readCommitJson(spark: SparkSession, path: String, version: Long): com.fasterxml.jackson.databind.JsonNode = {
    val f = fs(spark, path)
    val p = new Path(s"$path/_commits/$version.json")
    require(f.exists(p), s"version $version of $path is not committed")
    val in = f.open(p)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes)
  }

  /** A string field of a commit's metadata json (e.g. an exactly-once
    * stream batch marker written via commitDelta's extraMeta).
    */
  def commitField(spark: SparkSession, path: String, version: Long, name: String): Option[String] = {
    val node = readCommitJson(spark, path, version).path(name)
    if (node.isTextual) Some(node.asText()) else None
  }

  /** Committed versions whose FULL referenced file set still exists on
    * disk, oldest first. Vacuum deletes version dirs referenced only by
    * non-retained manifests — but an old commit's JSON can survive (its own
    * dir still carried forward by a newer manifest) while dirs IT references
    * are gone. Such a version cannot be read or exported faithfully any
    * more; exporters must skip it rather than emit a silently partial
    * snapshot.
    */
  def servableVersions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    committedVersions(f, path).sorted.filter { v =>
      val dirs: Seq[String] = partitionMap(spark, path, v) match {
        case None        => Seq(s"v=$v")
        case Some(parts) => parts.values.toSeq.distinct.map(pv => s"v=$pv")
      }
      dirs.forall(d => f.exists(new Path(s"$path/$d")))
    }
  }

  /** Numeric commit-manifest field (e.g. `committed_at`). */
  def commitFieldNumber(spark: SparkSession, path: String, version: Long, name: String): Option[Long] = {
    val node = readCommitJson(spark, path, version).path(name)
    if (node.isNumber) Some(node.asLong()) else None
  }

  /** All exactly-once stream markers (`stream_batch*` fields) in a commit's
    * manifest. Every delta commit carries its base's markers forward (see
    * [[commitDelta]]), so the newest commit's markers are the complete,
    * vacuum-proof set.
    */
  def streamMarkers(spark: SparkSession, path: String, version: Long): Map[String, String] = {
    val root = readCommitJson(spark, path, version)
    scala.jdk.CollectionConverters.IterableHasAsScala(root.properties()).asScala.iterator
      .filter(e => e.getKey.startsWith("stream_batch") && e.getValue.isTextual)
      .map(e => e.getKey -> e.getValue.asText())
      .toMap
  }

  /** All `zone:<col>:<part>` data-skipping entries of a commit manifest. */
  def zoneMarkers(spark: SparkSession, path: String, version: Long): Map[String, String] = {
    val root = readCommitJson(spark, path, version)
    scala.jdk.CollectionConverters.IterableHasAsScala(root.properties()).asScala.iterator
      .filter(e => e.getKey.startsWith("zone:") && e.getValue.isTextual)
      .map(e => e.getKey -> e.getValue.asText())
      .toMap
  }

  /** All pending `dv:<id>` deletion-vector entries of a commit manifest
    * (value format `<file>|<keyCol1,keyCol2,...>`).
    */
  def dvMarkers(spark: SparkSession, path: String, version: Long): Map[String, String] = {
    val root = readCommitJson(spark, path, version)
    scala.jdk.CollectionConverters.IterableHasAsScala(root.properties()).asScala.iterator
      .filter(e => e.getKey.startsWith("dv:") && e.getValue.isTextual)
      .map(e => e.getKey -> e.getValue.asText())
      .toMap
  }

  /** DEFERRED KEY DELETION (merge-on-read, the Delta deletion-vector /
    * Iceberg equality-delete analogue): instead of rewriting every bucket
    * the doomed keys hash to, commit ONLY a key-list sidecar file
    * (`_dv/<id>`) plus a metadata-only delta commit whose manifest
    * carries a `dv:` entry. Every subsequent read — full, partition-
    * pruned, or time travel at-or-after this version — anti-joins the
    * pending vectors, so the deletion is visible IMMEDIATELY at metadata
    * cost O(|keys|), independent of table size. The physical rewrite is
    * deferred to [[compact]], which folds all pending vectors in and
    * clears the entries; [[vacuum]] then reclaims spent sidecar files.
    *
    * The vector is BOUNDARY-SCOPED (Delta's file-scoped semantics): it
    * applies only to partitions whose manifest version is at or before
    * the delete's base version. Data committed AFTER the delete — an
    * SCD-2 upsert or change-feed insert that legitimately re-introduces
    * a doomed key — is exempt and stays visible, matching
    * copy-on-write [[graft.operators.Scd2.deleteKeys]] semantics.
    * (Caveat inherited from partition-granularity scoping: an upsert
    * that REWRITES a bucket containing other doomed keys re-emits that
    * bucket DV-filtered — [[readPartitions]] applies the vectors during
    * the rebuild — so those keys stay deleted through the rewrite.)
    *
    * The GDPR trade vs [[graft.operators.Scd2.deleteKeys]] (copy-on-
    * write): deferred deletes make the takedown instant and cheap, but
    * the doomed bytes remain on storage until compact+vacuum — run the
    * physical pass within the compliance window.
    *
    * @return the committed version carrying the new vector
    */
  def deleteKeysDeferred(spark: SparkSession, path: String, keys: DataFrame, keyCols: Seq[String]): Long =
    withCommitRetry() {
      require(keyCols.nonEmpty, "keyCols must be non-empty")
      keyCols.foreach(c =>
        require(c.matches("[A-Za-z0-9_]+"), s"keyCol '$c' must be [A-Za-z0-9_]+ (it is serialized in the manifest)"))
      val v0 = latestVersion(spark, path).getOrElse(
        throw new IllegalArgumentException(s"no committed versions at $path"))
      require(partitionMap(spark, path, v0).isDefined,
        s"table at $path is not delta-committed; deferred deletes need a manifest")
      val partCol = commitField(spark, path, v0, "partition_column").getOrElse(
        throw new IllegalStateException(s"version $v0 of $path records no partition_column"))
      val id = s"dv-${java.util.UUID.randomUUID().toString.take(12)}"
      keys.select(keyCols.map(col): _*).distinct().write.mode("errorifexists").parquet(s"$path/_dv/$id")
      // the vector is BOUNDARY-SCOPED to the data that existed when the
      // delete committed (Delta's file-scoped behavior): partitions whose
      // manifest version pv <= v0 are anti-joined; partitions written by
      // LATER commits are exempt, so a row legitimately re-inserted with a
      // doomed key after the delete stays visible (ADVICE r10: the
      // table-wide vector silently suppressed such re-inserts until
      // compact, diverging from copy-on-write deleteKeys semantics)
      try
        commitDelta(
          spark, path, read(spark, path, Some(v0)).limit(0), partCol,
          extraMeta = Map(s"dv:$id" -> s"$id|${keyCols.mkString(",")}|$v0"))
      catch {
        case e: Throwable =>
          fs(spark, path).delete(new Path(s"$path/_dv/$id"), true) // unreferenced sidecar
          throw e
      }
    }

  /** Anti-join `df` against every deletion vector pending at `version`
    * (null-safe on the recorded key columns — a doomed NULL key must
    * still match NULL-keyed rows). No pending vectors: returns `df`
    * unchanged, zero plan overhead.
    */
  private def applyDvPending(spark: SparkSession, path: String, version: Long, df: DataFrame): DataFrame =
    applyDvSpecs(spark, path, dvMarkers(spark, path, version).values.toSeq.sorted, df)

  private def applyDvSpecs(spark: SparkSession, path: String, specs: Seq[String], df: DataFrame): DataFrame =
    specs.foldLeft(df) { (d, spec) =>
      val fields = spec.split("\\|", 3)
      val cols = fields(1).split(",").toSeq
      val dv = spark.read.parquet(s"$path/_dv/${fields(0)}").toDF(cols.map(c => s"__dv_$c"): _*)
      val cond = cols.map(c => d(c) <=> dv(s"__dv_$c")).reduce(_ && _)
      d.join(broadcast(dv), cond, "left_anti")
    }

  /** Does a dv spec apply to a partition last rewritten at `pv`? A spec
    * `<file>|<cols>|<boundary>` scopes the vector to partitions committed
    * at or before the delete's base version; a legacy two-field spec
    * applies table-wide.
    */
  private def dvApplies(spec: String, pv: Long): Boolean = {
    val fields = spec.split("\\|", 3)
    fields.length < 3 || pv <= fields(2).toLong
  }

  /** Assemble a multi-partition read with BOUNDARY-SCOPED deletion
    * vectors: partitions are grouped by which pending vectors apply to
    * them (by the pv<=boundary rule), each group anti-joins only its own
    * vectors, and the groups union back (null-padding across the groups'
    * schemas exactly as the mergeSchema read did). With no pending
    * vectors this is one mergeSchema read — zero plan overhead.
    */
  private def readWithDv(
      spark: SparkSession,
      path: String,
      dvSpecs: Seq[String],
      parts: Seq[(String, Long)]
  ): DataFrame = {
    val groups = parts.sortBy(_._1)
      .groupBy { case (_, pv) => dvSpecs.filter(s => dvApplies(s, pv)) }
      .toSeq
      .sortBy(_._2.head._1)
    val dfs = groups.map { case (specs, ps) =>
      val dirs = ps.map { case (p, pv) => s"$path/v=$pv/p=$p" }
      // partitions carried forward from older versions may predate a
      // schema-widening commit — merge schemas so old partitions surface
      // the new columns as nulls
      applyDvSpecs(spark, path, specs, spark.read.option("mergeSchema", "true").parquet(dirs: _*))
    }
    dfs.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Numeric type-widening lattice for schema evolution across commits:
    * integral types widen to the larger integral, fractional to double,
    * integral + fractional to double (documented lossy above 2^53 —
    * the standard lakehouse type-widening trade). Anything else must
    * match exactly.
    */
  private[sources] def widenType(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType
  ): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    val rank: Map[DataType, Int] =
      Map(ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3, FloatType -> 4, DoubleType -> 5)
    if (a == b) a
    else (rank.get(a), rank.get(b)) match {
      case (Some(ra), Some(rb)) =>
        val w = math.max(ra, rb)
        if (w <= 3) Seq(ByteType, ShortType, IntegerType, LongType)(w)
        else DoubleType // any fractional participant -> double
      case _ =>
        throw new IllegalStateException(s"cannot widen incompatible types $a / $b")
    }
  }

  /** TYPE-WIDENING READ (the Delta/Iceberg type-widening story): a
    * delta table whose partitions were written under DIFFERENT numeric
    * types across commits (a column upgraded int->long or ->double)
    * reads as one relation under the WIDEST type per column. Plain
    * [[read]]'s mergeSchema refuses conflicting parquet types; this
    * variant reads each partition under its own file schema, casts up
    * the widening lattice, and unions — missing columns null-pad as in
    * the drift story. Deletion vectors apply as in every read path.
    */
  def readWidened(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    partitionMap(spark, path, v) match {
      case None => read(spark, path, Some(v))
      case Some(parts) =>
        val dfs = parts.toSeq.sortBy(_._1).map { case (p, pv) =>
          spark.read.parquet(s"$path/v=$pv/p=$p")
        }
        val target: Seq[(String, org.apache.spark.sql.types.DataType)] = dfs
          .flatMap(_.schema.fields.map(f => f.name -> f.dataType))
          .groupBy(_._1)
          .map { case (n, ts) => n -> ts.map(_._2).reduce(widenType) }
          .toSeq
          .sortBy(_._1)
        def conform(d: DataFrame): DataFrame =
          d.select(target.map { case (n, t) =>
            (if (d.columns.contains(n)) col(n) else lit(null)).cast(t).as(n)
          }: _*)
        // boundary-scoped DV application per partition (pre-union, so each
        // partition anti-joins only the vectors that apply to its pv)
        val dvSpecs = dvMarkers(spark, path, v).values.toSeq.sorted
        parts.toSeq.sortBy(_._1).zip(dfs).map { case ((_, pv), d) =>
          conform(applyDvSpecs(spark, path, dvSpecs.filter(s => dvApplies(s, pv)), d))
        }.reduce(_.unionByName(_))
    }
  }

  /** REPLICA DIVERGENCE AUDIT (the anti-entropy check behind q148's CDC
    * replication): compare two delta tables PARTITION BY PARTITION using
    * an order-independent content fingerprint — count plus the sum of
    * xxhash64 over each row's common columns — and report, per
    * partition, both row counts and whether content diverged. Partitions
    * present on one side only report diverged with the other side's
    * count null.
    *
    * SCALE: one aggregation pass per table (no row-level join between
    * replicas, no data movement across them — each side reduces to one
    * fingerprint row per partition, and only those meet). This is how
    * you audit a 100 TB replica nightly without shipping the table.
    */
  def divergedPartitions(spark: SparkSession, pathA: String, pathB: String): DataFrame = {
    def side(path: String, cols: Seq[String], partCol: String): DataFrame = {
      val d = read(spark, path)
      // bit_xor, not sum: hash values span the full long range and an
      // ANSI sum overflows; xor is commutative/associative (order-free
      // across partitionings) and cannot overflow. Caveat carried by the
      // count column: xor cancels EVEN multiplicities of an identical
      // row, so equal-count same-xor corruption requires swapping pairs
      // of duplicate rows — detectable only with a stronger (decimal
      // sum) fingerprint if the table allows exact duplicate rows.
      // Each column hashes under a position-tagged null-discriminating
      // encoding ("<i>:<value>" / "<i>:null") — xxhash64 SKIPS null
      // inputs, so without the tag a value moving between a null and a
      // non-null column within a row ((x,null) vs (null,x)) hashed
      // identically and same-count corruption reported clean (ADVICE r10).
      d.withColumn("__h", xxhash64(cols.zipWithIndex.map { case (c, i) =>
        coalesce(concat(lit(s"$i:"), col(c).cast("string")), lit(s"$i:null"))
      }: _*))
        .groupBy(col(partCol).cast("string").as("part"))
        .agg(count(lit(1)).as("rows"), expr("bit_xor(__h)").as("fp"))
    }
    def partColOf(path: String): String = {
      val v = latestVersion(spark, path).getOrElse(
        throw new IllegalArgumentException(s"no committed versions at $path"))
      commitField(spark, path, v, "partition_column").getOrElse(
        throw new IllegalStateException(s"$path is not a delta table (no partition_column)"))
    }
    val (pa, pb) = (partColOf(pathA), partColOf(pathB))
    val common = (read(spark, pathA).columns.toSet intersect read(spark, pathB).columns.toSet).toSeq.sorted
    require(common.nonEmpty, "replicas share no columns to compare")
    val a = side(pathA, common, pa).select(col("part"), col("rows").as("rows_a"), col("fp").as("fp_a"))
    val b = side(pathB, common, pb).select(col("part"), col("rows").as("rows_b"), col("fp").as("fp_b"))
    a.join(b, Seq("part"), "full_outer")
      .select(
        col("part"),
        col("rows_a"), col("rows_b"),
        (!(col("fp_a") <=> col("fp_b")) || !(col("rows_a") <=> col("rows_b"))).as("diverged")
      )
  }

  /** Zone-map pruning plan for `statsCol BETWEEN lo AND hi`: partitions
    * split into (scan, skip). A partition is skipped ONLY when its
    * recorded [min,max] interval misses [lo,hi]; partitions without a
    * recorded entry are always scanned (stats are an optimization, never
    * a correctness input). Driver-side metadata only — one manifest read.
    */
  def zonePrunePlan(
      spark: SparkSession,
      path: String,
      statsCol: String,
      lo: Long,
      hi: Long,
      version: Option[Long] = None
  ): (Seq[String], Seq[String]) = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val parts = partitionMap(spark, path, v).getOrElse(
      throw new IllegalStateException(s"table at $path is not delta-committed; zone maps need a manifest"))
    val zones = zoneMarkers(spark, path, v)
    val (scan, skip) = parts.keys.toSeq.sorted.partition { p =>
      zones.get(s"zone:$statsCol:$p") match {
        case Some(s) =>
          val Array(mn, mx) = s.split(",", 2)
          !(mx.toLong < lo || mn.toLong > hi)
        case None => true
      }
    }
    (scan, skip)
  }

  /** Zone-map pruned range scan — the 100 TB point of the stats: a
    * predicate on a CLUSTERED column (z-ordered / range-bucketed layout)
    * opens only the partitions whose recorded [min,max] intersects the
    * requested range; everything else is eliminated from DRIVER METADATA
    * before a single file is listed. The residual predicate is still
    * applied to the scanned partitions (zone maps prune at partition
    * granularity, they do not filter rows). On a hash-bucketed layout
    * every partition spans the full value range and nothing prunes —
    * cluster first (see the Z-order operator), then skip.
    */
  def readZonePruned(
      spark: SparkSession,
      path: String,
      statsCol: String,
      lo: Long,
      hi: Long,
      version: Option[Long] = None
  ): DataFrame = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    val residual = col(statsCol).cast("long").between(lo, hi)
    partitionMap(spark, path, v) match {
      case None => read(spark, path, Some(v)).filter(residual) // full snapshot: no manifest to prune by
      case Some(parts) =>
        val (scan, _) = zonePrunePlan(spark, path, statsCol, lo, hi, Some(v))
        if (scan.isEmpty) read(spark, path, Some(v)).limit(0).filter(residual)
        else
          readWithDv(spark, path, dvMarkers(spark, path, v).values.toSeq.sorted,
            scan.map(p => p -> parts(p))).filter(residual)
    }
  }

  /** The partition->version manifest of a delta commit; None for full
    * snapshots.
    */
  def partitionMap(spark: SparkSession, path: String, version: Long): Option[Map[String, Long]] = {
    val parts = readCommitJson(spark, path, version).path("partitions")
    if (!parts.isObject) None
    else Some(
      scala.jdk.CollectionConverters.IterableHasAsScala(parts.properties()).asScala.iterator
        .map(e => e.getKey -> e.getValue.asLong()).toMap
    )
  }

  private def jsonStr(s: String): String = graft.core.Json.str(s)

  /** Read a specific version, or the latest committed one. Delta-committed
    * tables resolve each partition to the version dir that last rewrote it.
    */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path")
    )
    // merge-on-read: deletion vectors pending at v filter EVERY read path
    // (deferred deletes are visible from their commit version onward),
    // boundary-scoped so partitions written AFTER a delete are exempt
    partitionMap(spark, path, v) match {
      case None => applyDvPending(spark, path, v, spark.read.parquet(s"$path/v=$v"))
      case Some(parts) =>
        readWithDv(spark, path, dvMarkers(spark, path, v).values.toSeq.sorted, parts.toSeq)
    }
  }

  /** Pruned read of ONE partition of a delta-committed table — the scan a
    * point query / per-bucket job does instead of touching the whole table.
    * Partitions the table has never written return None.
    */
  def readPartition(spark: SparkSession, path: String, part: String, version: Option[Long] = None): Option[DataFrame] =
    readPartitions(spark, path, Seq(part), version).headOption.flatten

  /** Pruned read of several partitions with ONE manifest read (a per-
    * partition readPartition loop would re-open and re-parse the commit
    * json per call — O(n) driver metadata round-trips on an object store).
    * Result aligns with `parts`; never-written partitions are None.
    */
  def readPartitions(spark: SparkSession, path: String, parts: Seq[String], version: Option[Long] = None): Seq[Option[DataFrame]] = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path")
    )
    val m = partitionMap(spark, path, v).getOrElse(
      throw new IllegalStateException(s"table at $path is not delta-committed; read the snapshot instead"))
    // merge-on-read here too: the SCD-2 touched-bucket rebuild reads
    // through this path — without the DV filter an upsert would copy
    // doomed rows back into the buckets it rewrites. DV specs resolved
    // once, honoring this method's one-manifest-read contract.
    val dvSpecs = dvMarkers(spark, path, v).values.toSeq.sorted
    parts.map(p => m.get(p).map { pv =>
      applyDvSpecs(spark, path, dvSpecs.filter(s => dvApplies(s, pv)), spark.read.parquet(s"$path/v=$pv/p=$p"))
    })
  }

  /** Pruned read of several partitions as ONE relation (round-18, guide
    * §2.4/§6): [[readPartitions]] builds a separate parquet relation per
    * bucket and every caller unions them — a 16-bucket upsert planned 16
    * leaf scans, 16 file listings and a 16-way union per touched-bucket
    * read. This variant hands all requested dirs of each DV-group to a
    * single mergeSchema read (exactly [[read]]'s own assembly, via
    * [[readWithDv]]), so the read plans and lists once and downstream
    * joins see one relation. Returns None when none of the requested
    * partitions exist. Row set identical to unioning [[readPartitions]]
    * for COLUMN-ADD drift (same dirs, same DV filters; mergeSchema
    * null-pads missing columns exactly as
    * `unionByName(allowMissingColumns)` did). Cross-commit numeric TYPE
    * drift (e.g. int -> long widening across versions) is REFUSED by the
    * mergeSchema read, where the old per-dir read + union coerced — the
    * delta-commit write path never produces such tables (the schema is
    * recorded per commit and upserts write the merged batch), and tables
    * that need widening semantics read via [[readWidened]].
    */
  def readPartitionsUnioned(
      spark: SparkSession,
      path: String,
      parts: Seq[String],
      version: Option[Long] = None
  ): Option[DataFrame] = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path")
    )
    val m = partitionMap(spark, path, v).getOrElse(
      throw new IllegalStateException(s"table at $path is not delta-committed; read the snapshot instead"))
    val present = parts.distinct.flatMap(p => m.get(p).map(pv => p -> pv))
    if (present.isEmpty) None
    else Some(readWithDv(spark, path, dvMarkers(spark, path, v).values.toSeq.sorted, present))
  }

  /** CDC DOWNSTREAM APPLY — the consumer half of [[changeFeed]]: apply a
    * feed (full-row records tagged `_change_type` insert / delete /
    * update_preimage / update_postimage) to a REPLICA delta table,
    * advancing it from the feed's from-state to its to-state. This is
    * how a derived table (serving copy, regional replica, downstream
    * mart) follows a source warehouse without full recopies: cost is
    * proportional to the CHANGED partitions, not the table.
    *
    * Upsert semantics make the apply IDEMPOTENT: the replica drops every
    * row whose key appears anywhere in the feed (pre-images and deletes,
    * but also insert/post-image keys), then inserts the insert/post-image
    * rows — re-applying the same feed is a no-op, so an at-least-once
    * delivery pipeline converges. Only the partitions named by the feed's
    * `partCol` values are rewritten; the driver holds one partition id
    * per touched partition.
    *
    * @return the replica's committed version
    */
  def applyChangeFeed(
      spark: SparkSession,
      replicaPath: String,
      feed: DataFrame,
      keyCols: Seq[String],
      partCol: String
  ): Long = withCommitRetry() {
    applyChangeFeedOnce(spark, replicaPath, feed, keyCols, partCol)
  }

  /** One non-retrying apply attempt, for callers that run their own
    * [[withCommitRetry]] loop with work that must re-execute alongside the
    * commit (e.g. [[graft.streaming.Streaming.cdcApplySink]]'s exactly-once
    * marker check — re-checked on every retry so a lost commit race can't
    * double-apply a micro-batch). `extraMeta` rides the commit manifest.
    */
  def applyChangeFeedOnce(
      spark: SparkSession,
      replicaPath: String,
      feed: DataFrame,
      keyCols: Seq[String],
      partCol: String,
      extraMeta: Map[String, String] = Map.empty
  ): Long = {
    require(keyCols.nonEmpty, "applyChangeFeed: keyCols must be non-empty")
    require(feed.columns.contains("_change_type"), "applyChangeFeed: feed must carry _change_type")
    // feed-scoped cache (round-18): the feed subtree is referenced by the
    // touched-partition collect, the displaced-key set, and the adds
    // branch — uncached (e.g. a changeFeed diff, or a streaming
    // micro-batch source) it re-executed up to 3x per apply. Feed-sized,
    // MEMORY_AND_DISK, released before return.
    val (feedC, ownF) = graft.core.Caching.cachedOwned(feed)
    try {
    val touched = feedC.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    if (touched.isEmpty)
      latestVersion(spark, replicaPath).getOrElse(
        throw new IllegalArgumentException(s"no committed versions at $replicaPath"))
    else {
      // single-relation touched read (round-18): the anti join distributes
      // over the bucket union, so one scan + one join replaces a
      // per-bucket join fan-out (same broadcast dict either way)
      val existing = readPartitionsUnioned(spark, replicaPath, touched)
      val allKeys = feedC.select(keyCols.map(col): _*).distinct()
      val adds = feedC
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .drop("_change_type")
      // NULL-SAFE anti join (a NULL-keyed change must still displace
      // NULL-keyed replica rows — deleteKeys' rule)
      val kept = existing.map { part =>
        val d = allKeys.toDF(keyCols.map(c => s"__chg_$c"): _*)
        val cond = keyCols.map(c => part(c) <=> d(s"__chg_$c")).reduce(_ && _)
        part.join(broadcast(d), cond, "left_anti")
      }
      val next = kept match {
        case Some(k) => k.unionByName(adds, allowMissingColumns = true)
        case None => adds
      }
      commitDelta(spark, replicaPath, next, partCol, clearedParts = touched, extraMeta = extraMeta)
    }
    } finally graft.core.Caching.releaseOwned(feedC, ownF)
  }

  /** Targeted row deletion (the right-to-be-forgotten / takedown sweep a
    * training-data lake must support): rewrite ONLY the partitions that
    * contain matching rows, dropping them; every other partition carries
    * forward untouched. `touchedParts` bounds the rewrite (for key-bucketed
    * tables: the buckets the doomed keys hash to — computable from the keys
    * alone); the predicate is re-applied inside, so over-approximating
    * touchedParts is safe, under-approximating is not.
    *
    * @return the committed version
    */
  def deleteWhere(
      spark: SparkSession,
      path: String,
      partCol: String,
      touchedParts: Seq[String],
      predicate: org.apache.spark.sql.Column,
      statsCols: Seq[String] = Nil // re-record zone maps on the rewritten parts
  ): Long = withCommitRetry() {
    // the WHOLE attempt re-runs on a commit conflict so the re-read rebases
    // on the new latest version
    // single-relation touched read (round-18): filter distributes over the
    // bucket union; mergeSchema null-pads drift as the union did
    val existing = readPartitionsUnioned(spark, path, touchedParts)
    require(existing.nonEmpty, s"none of ${touchedParts.mkString(",")} exist at $path — nothing to delete")
    // SQL DELETE semantics: remove rows where the predicate is TRUE; rows
    // where it evaluates NULL are KEPT (a bare !predicate would drop them)
    val kept = existing.get.filter(!coalesce(predicate, lit(false)))
    // clearedParts: a bucket whose rows ALL matched writes no data — without
    // the explicit clear its old contents would carry forward (resurrected
    // deletes)
    commitDelta(spark, path, kept, partCol, clearedParts = touchedParts, statsCols = statsCols)
  }

  /** RETENTION SWEEP — temporal deletion, the time-based twin of the
    * keyed GDPR sweep: delete every row with `statsCol < cutoffExclusive`,
    * touching ONLY the partitions whose zone map intersects the doomed
    * range. On a time-clustered layout (the natural one for event data)
    * the touched set is the handful of oldest partitions — driver
    * metadata, no file listing — and everything newer carries forward by
    * manifest reference; a partition without recorded stats is
    * conservatively treated as touched ([[deleteWhere]] re-applies the
    * predicate inside, so over-approximation is safe, and a fully-doomed
    * partition is dropped via its cleared manifest entry). This is the
    * nightly "keep 90 days" job at 100 TB/day: cost O(expiring
    * partitions), never a table scan.
    *
    * @return the committed version (the current one if nothing intersects)
    */
  def retentionSweep(
      spark: SparkSession,
      path: String,
      partCol: String,
      statsCol: String,
      cutoffExclusive: Long
  ): Long = {
    // Long.MinValue would underflow the zone upper bound below into "touch
    // everything" — and means "delete nothing" anyway
    require(cutoffExclusive > Long.MinValue, "retentionSweep: cutoffExclusive must be > Long.MinValue")
    val (touched, _) = zonePrunePlan(spark, path, statsCol, Long.MinValue, cutoffExclusive - 1)
    if (touched.isEmpty)
      latestVersion(spark, path).getOrElse(
        throw new IllegalArgumentException(s"no committed versions at $path"))
    else
      // statsCols: re-record the zone map on the rewritten (straddling)
      // partitions, so the NEXT sweep still prunes them — without it the
      // rewrite would drop their stats and the nightly job would degrade
      // to conservative full-touch over time
      deleteWhere(spark, path, partCol, touched, col(statsCol).cast("long") < cutoffExclusive,
        statsCols = Seq(statsCol))
  }

  /** COMPACT (the OPTIMIZE analogue): rewrite the CURRENT state of a
    * delta-committed table as one fresh delta commit touching every live
    * partition, with `filesPerPartition` output files each. Daily
    * touched-bucket loads accumulate small files per partition across
    * versions; compaction folds them into full-size files and (followed by
    * [[vacuum]]) releases the old dirs. Readers never block: the compacted
    * version publishes atomically like any commit.
    */
  def compact(spark: SparkSession, path: String, partCol: String): Long = withCommitRetry() {
    // hash-repartition by the partition column: each partition value lands
    // wholly in one task -> exactly one output file per partition dir.
    // The read+commit attempt re-runs whole on a commit conflict.
    // `read` applies pending deletion vectors, so compaction IS the
    // physical delete pass: clearDv spends the vector entries, and
    // clearing every prior partition drops any partition whose rows were
    // ALL deleted (it writes no data and must not carry stale bytes
    // forward).
    val prevParts = latestVersion(spark, path)
      .flatMap(partitionMap(spark, path, _)).map(_.keys.toSeq).getOrElse(Nil)
    val current = read(spark, path).repartition(col(partCol))
    commitDelta(spark, path, current, partCol, clearedParts = prevParts, clearDv = true)
  }

  /** VACUUM: delete version data no commit at-or-above `retainVersions`-ago
    * can reference — dead orphans (reserved-but-never-published, demoted
    * conflicts) and snapshots older than the retention window that no
    * RETAINED delta manifest points into. Time travel keeps working for the
    * newest `retainVersions` commits; older reads fail (their data may be
    * gone), exactly Delta VACUUM's contract.
    *
    * @return the version directories removed
    */
  def vacuum(spark: SparkSession, path: String, retainVersions: Int = 2, orphanGraceMs: Long = 24L * 3600 * 1000): Seq[Long] = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val f = fs(spark, path)
    val committed = committedVersions(f, path).sorted
    if (committed.isEmpty) return Nil
    val retained = committed.takeRight(retainVersions)
    // every v-dir any retained manifest references stays (delta commits
    // reference OLDER version dirs for carried-forward partitions)
    val referenced: Set[Long] = retained.toSet ++ retained.flatMap { v =>
      partitionMap(spark, path, v).map(_.values.toSeq).getOrElse(Nil)
    }
    // a version with a live reservation marker may belong to an IN-FLIGHT
    // writer (reserved, data staged, publish not yet run) — deleting it
    // would corrupt the commit that then publishes. Only reclaim reserved
    // versions whose marker is older than the grace window (crashed or
    // demoted writers); pass orphanGraceMs=0 to force.
    def reservedRecently(v: Long): Boolean = {
      val marker = new Path(s"$path/_commits/$v.reserved")
      f.exists(marker) &&
      (System.currentTimeMillis() - f.getFileStatus(marker).getModificationTime) < orphanGraceMs
    }
    val root = new Path(path)
    val vdirs = Option(f.listStatus(root)).getOrElse(Array.empty)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
    val removable = vdirs.filter(v => !referenced.contains(v) && !reservedRecently(v)).sorted.toSeq
    removable.foreach { v =>
      f.delete(new Path(s"$path/v=$v"), true)
      f.delete(new Path(s"$path/_commits/$v.json"), false) // expired commit (if published)
      f.delete(new Path(s"$path/_commits/$v.reserved"), false) // stale marker (if any)
    }
    // deletion-vector sidecars: reclaim files no RETAINED manifest still
    // references (compact clears dv entries; after the window rolls past
    // the pre-compact versions, the doomed bytes' last index dies here —
    // the point where a GDPR delete becomes physically irreversible)
    val referencedDv: Set[String] =
      retained.flatMap(v => dvMarkers(spark, path, v).values.map(_.split("\\|", 2)(0))).toSet
    val dvDir = new Path(s"$path/_dv")
    if (f.exists(dvDir))
      f.listStatus(dvDir).foreach { st =>
        if (!referencedDv.contains(st.getPath.getName)) f.delete(st.getPath, true)
      }
    removable
  }

  /** Change data feed between two committed versions of a delta-style
    * table: every row-level difference, typed Delta-CDF-style as `insert`,
    * `delete`, or an `update_preimage`/`update_postimage` pair.
    *
    * Scale shape: the two manifests are diffed FIRST (metadata-sized), and
    * only partitions whose resolved version differs are read on either
    * side — an incremental consumer of a 100 TB table pays O(changed
    * partitions), never a two-snapshot scan. Unchanged partitions cannot
    * contribute diffs (their files are byte-identical by manifest
    * reference), so pruning them is exact, not approximate.
    *
    * `keyCols` is the row identity the diff joins on; it must be unique
    * per side within the changed partitions — enforced with an in-plan
    * `assert_true` folded into the packing aggregation (round-18), because
    * a silent many-to-many diff would fabricate change rows. The guard
    * fires AT EXECUTION TIME of the returned feed, not at call time:
    * a duplicate key surfaces as a SparkException-wrapped runtime error
    * naming the key (not an eager IllegalArgumentException as in earlier
    * rounds), and a feed that is never fully executed never evaluates the
    * guard. Callers that catch the old exception type must adapt. Schema
    * drift between the versions is null-padded (typed nulls, mirroring
    * `read`'s mergeSchema behavior); a column added between versions
    * surfaces as `update_*` pairs with the preimage null.
    *
    * Output: the union of both versions' columns plus `_change_type`;
    * unchanged rows emit nothing.
    */
  def changeFeed(
      spark: SparkSession,
      path: String,
      fromVersion: Long,
      toVersion: Long,
      keyCols: Seq[String]
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    require(fromVersion < toVersion, s"changeFeed: fromVersion $fromVersion must precede toVersion $toVersion")
    require(keyCols.nonEmpty, "changeFeed: keyCols must be non-empty")
    def manifest(v: Long): Map[String, Long] = partitionMap(spark, path, v).getOrElse(
      throw new IllegalArgumentException(
        s"changeFeed: version $v at $path is a full snapshot — the feed needs delta-style (partitioned) commits"))
    val mOld = manifest(fromVersion)
    val mNew = manifest(toVersion)
    val changed = (mOld.keySet ++ mNew.keySet).filter(p => mOld.get(p) != mNew.get(p)).toSeq.sorted

    // one multi-dir relation per side (round-18, guide §2.4): the previous
    // per-partition read + unionByName planned one leaf scan per changed
    // bucket per side (2 x 16 scans for the q106 feed); mergeSchema
    // null-pads cross-commit drift exactly as the union did
    def side(m: Map[String, Long]): Option[DataFrame] = {
      val dirs = changed.flatMap(p => m.get(p).map(pv => s"$path/v=$pv/p=$p"))
      if (dirs.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true").parquet(dirs: _*))
    }

    (side(mOld), side(mNew)) match {
      case (None, None) =>
        // no changed partitions at all: an empty feed with just the keys
        val empty = read(spark, path, Some(toVersion)).limit(0)
        empty.select(empty.columns.map(col) :+ lit("insert").as("_change_type"): _*).limit(0)
      case (oldSide, newSide) =>
        val oldDf = oldSide
        val newDf = newSide
        val allCols: Seq[String] = {
          val o = oldDf.map(_.columns.toSeq).getOrElse(Nil)
          val n = newDf.map(_.columns.toSeq).getOrElse(Nil)
          (o ++ n.filterNot(o.contains)).distinct
        }
        // Key columns must exist on EVERY present side: padding a key
        // with nulls would join rows on null keys and misclassify every
        // update as delete+insert.
        Seq(oldDf -> "from", newDf -> "to").foreach { case (side, label) =>
          side.foreach(d =>
            keyCols.foreach(kc => require(
              d.columns.contains(kc),
              s"changeFeed: key column '$kc' missing from the $label version's schema — " +
                "the row identity must exist on both sides of the diff")))
        }
        val payload = allCols.filterNot(keyCols.contains)
        // Null-pad schema drift with TYPED nulls (the drifted column's
        // type from whichever side carries it) so the packed structs have
        // identical types and <=> compares without NullType coercion.
        val colType: Map[String, org.apache.spark.sql.types.DataType] =
          (oldDf.toSeq ++ newDf.toSeq).flatMap(_.schema.fields.map(f => f.name -> f.dataType)).toMap
        def widen(df: DataFrame): DataFrame = {
          val missing = allCols.filterNot(df.columns.contains)
          missing.foldLeft(df)((d, c) => d.withColumn(c, lit(null).cast(colType(c))))
        }
        def packed(df: Option[DataFrame], structName: String): DataFrame = df match {
          case Some(d) =>
            val w = widen(d)
            // loud uniqueness guard, folded INTO the plan (round-18): the
            // previous eager groupBy+collect guard re-ran the whole side's
            // scan as a separate job before the diff even started (two
            // extra full jobs per feed). One aggregation now both packs
            // and guards: a duplicated key makes the full-outer diff
            // many-to-many, so assert_true throws at execution time with
            // the offending key; for unique keys (the only passing case)
            // first() is the single row and the output is identical. The
            // agg's hash partitioning on keyCols is exactly the join's, so
            // the exchange is shared — no extra shuffle.
            w.select(keyCols.map(col) :+ struct(payload.map(col): _*).as(structName): _*)
              .groupBy(keyCols.map(col): _*)
              .agg(count(lit(1)).as("__c"), first(col(structName)).as(structName))
              .filter(coalesce(
                assert_true(
                  col("__c") <= 1,
                  concat(
                    lit(s"changeFeed: key ${keyCols.mkString("(", ",", ")")} is not unique in changed partitions (e.g. "),
                    concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
                    lit(")"))
                ).cast("boolean"),
                lit(true)))
              .select(keyCols.map(col) :+ col(structName): _*)
          case None =>
            // absent side: no rows, but the join still needs the shape
            val w = widen(newDf.orElse(oldDf).get).limit(0)
            w.select(keyCols.map(col) :+ struct(payload.map(col): _*).as(structName): _*)
        }
        val o = packed(oldDf, "__old")
        val n = packed(newDf, "__new")
        val joined = o.join(n, keyCols, "full_outer")
        val changeElem = org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField("v", n.schema("__new").dataType))))
        // typed change rows: insert/delete emit one row, updates a
        // preimage/postimage pair; identical rows (null-safe struct
        // equality) emit nothing
        val changes = joined.select(
          keyCols.map(col) :+ explode(
            when(col("__old").isNull, array(struct(lit("insert").as("t"), col("__new").as("v"))))
              .when(col("__new").isNull, array(struct(lit("delete").as("t"), col("__old").as("v"))))
              .when(!(col("__old") <=> col("__new")), array(
                struct(lit("update_preimage").as("t"), col("__old").as("v")),
                struct(lit("update_postimage").as("t"), col("__new").as("v"))))
              .otherwise(array().cast(changeElem))
          ).as("__chg"): _*)
        changes.select(
          keyCols.map(col) ++ payload.map(p => col(s"__chg.v.$p").as(p)) :+ col("__chg.t").as("_change_type"): _*)
    }
  }
}
