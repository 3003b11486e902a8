package graft

import org.apache.spark.sql.functions._

/** Dev diagnostic for the versioned-warehouse write/read path: builds the
  * q106/q80 two-commit SCD-2 warehouse at SPARK_GRAFT_SF_DIR, reporting per
  * phase wall time, files/bytes written per version dir, and the scan-node
  * count of the touched-bucket read that feeds the second upsert. Evidence
  * harness for the round-18 commitDelta/readPartitions optimization — not
  * part of the driver contract surface.
  */
object WarehouseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(32, "graft-whprobe")
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[whprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val (path, v1, v2) = timed("q106Build total") {
      Queries.q106Build(spark, sfDir)
    }
    // file census per version dir
    val root = new java.io.File(path)
    root.listFiles().filter(_.getName.startsWith("v=")).sortBy(_.getName).foreach { vd =>
      var n = 0L; var bytes = 0L
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(walk)
        else if (f.getName.endsWith(".parquet")) { n += 1; bytes += f.length() }
      walk(vd)
      println(s"[whprobe] ${vd.getName}: $n parquet files, ${bytes / 1024} KiB")
    }
    // the touched-bucket read that feeds an upsert: scan-node count
    val parts = graft.sources.VersionedTable
      .readPartitions(spark, path, (0 until 16).map(_.toString), Some(v2))
      .flatten
    val unioned = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    val nScans = unioned.queryExecution.executedPlan.collectLeaves().size
    println(s"[whprobe] touched-bucket union: ${parts.size} frames, $nScans leaf scans")
    timed("touched-bucket union count") { unioned.count() }
    timed("changeFeed materialize") {
      Bench.materialize(Queries.q106Feed(spark, path, v1, v2))
    }
    spark.stop()
  }
}
