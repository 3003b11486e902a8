package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedTable

class VersionedTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("commit/read/time-travel/rollback semantics") {
    val path = Files.createTempDirectory("graft-vt").toString + "/t"
    assert(VersionedTable.latestVersion(spark, path).isEmpty)

    val v1 = VersionedTable.commit(Seq((1, "a")).toDF("id", "v"), path)
    val v2 = VersionedTable.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"), path)
    assert((v1, v2) == (1L, 2L))

    assert(VersionedTable.read(spark, path).count() == 2) // latest
    assert(VersionedTable.read(spark, path, Some(1)).count() == 1) // time travel
    // published snapshots are immutable: a new commit doesn't change v1
    VersionedTable.commit(Seq((9, "z")).toDF("id", "v"), path)
    assert(VersionedTable.read(spark, path, Some(1)).head().getInt(0) == 1)
    assert(VersionedTable.read(spark, path).count() == 1) // v3 content
  }

  test("commit recovers from a crash-orphaned version directory") {
    val path = Files.createTempDirectory("graft-vt3").toString + "/t"
    VersionedTable.commit(Seq((1, "a")).toDF("id", "v"), path)
    // crash orphan: v=2 data exists, no commit file
    Seq((99, "dead")).toDF("id", "v").write.parquet(s"$path/v=2")
    val v = VersionedTable.commit(Seq((2, "b"), (3, "c")).toDF("id", "v"), path)
    assert(v == 2L)
    // the dead run's data must NOT survive inside the published v=2
    val got = VersionedTable.read(spark, path, Some(2)).collect().map(_.getInt(0)).sorted
    assert(got.toSeq == Seq(2, 3))
  }

  test("uncommitted versions are invisible") {
    val path = Files.createTempDirectory("graft-vt2").toString + "/t"
    VersionedTable.commit(Seq((1, "a")).toDF("id", "v"), path)
    // simulate a writer crash: data dir exists, commit file doesn't
    Seq((2, "b")).toDF("id", "v").write.parquet(s"$path/v=2")
    assert(VersionedTable.latestVersion(spark, path).contains(1L))
    assert(VersionedTable.read(spark, path).count() == 1)
    assertThrows[IllegalArgumentException](VersionedTable.read(spark, path, Some(2)))
  }
}
