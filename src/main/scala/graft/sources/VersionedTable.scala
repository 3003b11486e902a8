package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transactional table layout: versioned snapshots with an atomic
  * commit log — the engine's stand-in for a Delta/Iceberg table format
  * (no external format jars in this build, same core semantics).
  *
  * Layout:
  * {{{
  *   table/
  *     v=1/  v=2/ ...        # immutable parquet snapshot directories
  *     _commits/1.json ...   # commit metadata, written AFTER the data
  * }}}
  *
  * Guarantees:
  *  - readers see only fully-committed versions (the commit file is the
  *    atomic publish: data is invisible until its rename completes)
  *  - time travel: `read(spark, path, Some(v))`
  *  - writers never mutate a published snapshot (rollback = read older v)
  *
  * At 100 TB the copy-on-write snapshot model is the standard trade: full
  * snapshots per version for small dimension/state tables (this use case —
  * SCD-2 targets, config, snapshots), delta logs for the big fact tables
  * (where a real Delta/Iceberg dependency earns its keep).
  */
object VersionedTable {

  private def fs(spark: SparkSession, path: String) =
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

  /** Commit a new snapshot; returns the version number. The data directory
    * is written under a temp name and renamed in, then the commit file is
    * written last — a reader enumerating `_commits` never sees a
    * half-written version.
    */
  def commit(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    val v = latestVersion(spark, path).getOrElse(0L) + 1
    // unique tmp per writer: two racing writers must never share a staging
    // dir (mode=overwrite on a shared path would interleave their files)
    val tmp = new Path(s"$path/.v=$v.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    df.write.mode("overwrite").parquet(tmp.toString)
    val finalDir = new Path(s"$path/v=$v")
    // an orphaned uncommitted v-dir (writer died between rename and commit
    // file) is dead data — remove it, else Hadoop rename would move the new
    // data INSIDE it instead of replacing it
    if (f.exists(finalDir)) {
      if (f.exists(new Path(s"$path/_commits/$v.json")))
        throw new IllegalStateException(s"version $v of $path already committed (concurrent writer)")
      f.delete(finalDir, true)
    }
    if (!f.rename(tmp, finalDir))
      throw new IllegalStateException(s"concurrent commit detected for version $v of $path")
    val commitsDir = new Path(s"$path/_commits")
    f.mkdirs(commitsDir)
    val meta =
      s"""{"version": $v, "schema": ${jsonStr(df.schema.json)}, "committed_at": ${System.currentTimeMillis()}}"""
    val tmpCommit = new Path(s"$path/_commits/.$v.json.tmp")
    val out = f.create(tmpCommit, false)
    out.write(meta.getBytes("UTF-8")); out.close()
    if (!f.rename(tmpCommit, new Path(s"$path/_commits/$v.json")))
      throw new IllegalStateException(s"commit race on version $v of $path")
    v
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Read a specific version, or the latest committed one. */
  def read(spark: SparkSession, path: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path")
    )
    val f = fs(spark, path)
    require(f.exists(new Path(s"$path/_commits/$v.json")), s"version $v of $path is not committed")
    spark.read.parquet(s"$path/v=$v")
  }
}
