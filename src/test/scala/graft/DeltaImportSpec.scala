package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaExport, DeltaImport, VersionedTable}

/** Import half of the Delta interop story: log replay must reconstruct
  * exactly what the exporter (and any compliant Delta writer) committed —
  * including time travel, the append-only change feed, and partition-column
  * reconstruction for hive-style tables.
  */
class DeltaImportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Int)] =
    df.select(col("bucket"), col("x")).collect().map(r => (r.getString(0), r.getInt(1))).toSet

  test("round-trip: import of an exported VersionedTable matches the manifest read") {
    val path = Files.createTempDirectory("graft-dimp").toString + "/t"
    VersionedTable.commitDelta(spark, path,
      Seq(("a", 1), ("a", 2), ("b", 3)).toDF("bucket", "x"), "bucket")
    val v0Expect = rows(VersionedTable.read(spark, path))
    VersionedTable.commitDelta(spark, path,
      Seq(("b", 30), ("b", 31)).toDF("bucket", "x"), "bucket")
    DeltaExport.export(spark, path)

    assert(rows(DeltaImport.read(spark, path)) == rows(VersionedTable.read(spark, path)))
    // time travel: delta version 0 is the first committed snapshot
    assert(rows(DeltaImport.read(spark, path, versionAsOf = Some(0L))) == v0Expect)
    // change feed since version 0: exactly the partition-b rewrite, tagged
    val ch = DeltaImport.readChanges(spark, path, sinceVersion = 0L)
      .select(col("bucket"), col("x"), col("_commit_version"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(ch == Set(("b", 30, 1L), ("b", 31, 1L)))
  }

  test("hive-style partitioned table: partition column reconstructed, one discovery scan") {
    val root = Files.createTempDirectory("graft-dimp-part").toString
    def writePart(dir: String, xs: Seq[Int]): String = {
      xs.toDF("x").coalesce(1).write.mode("overwrite").parquet(s"$root/$dir")
      val f = new java.io.File(s"$root/$dir").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
      s"$dir/${f.getName}"
    }
    val fa = writePart("p=a", Seq(1, 2))
    val fb = writePart("p=b", Seq(3))
    val schema = new StructType().add("x", "integer").add("p", "string")
    val meta =
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${graft.core.Json.str(schema.json)},"partitionColumns":["p"],"configuration":{}}}"""
    def add(p: String, pv: String) =
      s"""{"add":{"path":${graft.core.Json.str(p)},"partitionValues":{"p":${graft.core.Json.str(pv)}},"size":1,"modificationTime":0,"dataChange":true}}"""
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta,
        add(fa, "a"), add(fb, "b")).mkString("", "\n", "\n"))

    val got = DeltaImport.read(spark, root)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "a"), (2, "a"), (3, "b")))
    assert(DeltaImport.read(spark, root).columns.toSeq == Seq("x", "p"))
  }

  test("non-hive layout falls back to authoritative partitionValues") {
    val root = Files.createTempDirectory("graft-dimp-flat").toString
    Seq(7).toDF("x").coalesce(1).write.mode("overwrite").parquet(s"$root/flat")
    val f = new java.io.File(s"$root/flat").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    val schema = new StructType().add("x", "integer").add("p", "string")
    val meta =
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${graft.core.Json.str(schema.json)},"partitionColumns":["p"],"configuration":{}}}"""
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000000.json"),
      Seq(meta,
        s"""{"add":{"path":${graft.core.Json.str(s"flat/${f.getName}")},"partitionValues":{"p":"z"},"size":1,"modificationTime":0,"dataChange":true}}"""
      ).mkString("", "\n", "\n"))
    val got = DeltaImport.read(spark, root).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((7, "z")))
  }

  test("explicit errors: checkpoint-compacted log and deletion vectors") {
    val root = Files.createTempDirectory("graft-dimp-err").toString
    new java.io.File(s"$root/_delta_log").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$root/_delta_log/00000000000000000005.json"),
      """{"commitInfo":{}}""" + "\n")
    val e = intercept[IllegalArgumentException](DeltaImport.read(spark, root))
    assert(e.getMessage.contains("checkpoint-compacted"))
  }
}
