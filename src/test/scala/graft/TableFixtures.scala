package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Shared fixtures for the export/import round-trip specs — one model of
  * VersionedTable delta semantics, so a semantics change is updated in ONE
  * place instead of drifting between the Delta and Iceberg property tests.
  */
object TableFixtures {

  /** Write `df` as a SINGLE parquet part file at exactly `dest` (the spec
    * fixtures hand-place files under synthesized metadata trees, which
    * address files by name — a directory of parts would not do).
    */
  def writeSinglePartParquet(df: DataFrame, dest: String): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("graft-single-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val parts = new java.io.File(stage).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parts.length == 1, s"expected exactly one part file, got ${parts.length}")
    val destFile = new java.io.File(dest)
    Option(destFile.getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.move(parts.head.toPath, destFile.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new scala.reflect.io.Directory(new java.io.File(stage)).deleteRecursively()
    ()
  }

  /** Pseudo-random delta-commit / even-key-deletion sequence over `buckets`,
    * committed to the VersionedTable at `path`. Returns, after each commit,
    * (committed version, expected live rows as (bucket, k.toString, x)). The model
    * encodes the delta semantics both interop property tests rely on: a
    * delta commit REPLACES the touched buckets' contents; deleteWhere drops
    * the matching rows of one bucket.
    */
  def randomCommitSequence(
      spark: SparkSession,
      path: String,
      seed: Long,
      buckets: Vector[String] = Vector("a", "b", "c")
  ): Vector[(Long, Set[(String, String, Int)])] = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    var expectedAt = Vector.empty[(Long, Set[(String, String, Int)])]
    var live = Map.empty[String, Map[Int, Int]] // bucket -> (key -> value)
    var nextKey = 0
    val nOps = 4 + rnd.nextInt(3)
    for (_ <- 0 until nOps) {
      if (live.nonEmpty && rnd.nextInt(4) == 0) {
        val b = live.keys.toSeq.sorted(Ordering.String)(rnd.nextInt(live.size))
        VersionedTable.deleteWhere(spark, path, "bucket", Seq(b), col("x") % 2 === 0)
        live += b -> live(b).filter { case (_, v) => v % 2 != 0 }
      } else {
        val bs = rnd.shuffle(buckets).take(1 + rnd.nextInt(2))
        val rows = bs.flatMap { b =>
          (0 until 1 + rnd.nextInt(3)).map { _ => nextKey += 1; (b, nextKey, rnd.nextInt(100)) }
        }
        VersionedTable.commitDelta(spark, path, rows.toDF("bucket", "k", "x"), "bucket")
        live = live -- bs ++ bs.map(b => b -> rows.filter(_._1 == b).map(r => r._2 -> r._3).toMap)
      }
      val v = VersionedTable.latestVersion(spark, path).get
      expectedAt :+= (v, live.toSeq.flatMap { case (b, kv) =>
        kv.map { case (k, x) => (b, k.toString, x) }
      }.toSet)
    }
    expectedAt
  }

  /** Table rows in the model's (bucket, k, x) comparison shape. */
  def got(df: DataFrame): Set[(String, String, Int)] =
    df.select(col("bucket"), col("k").cast("string"), col("x")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
}
