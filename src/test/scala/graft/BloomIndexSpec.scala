package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BloomIndex, VersionedTable}

/** Per-partition bloom index: pruning actually skips partitions, lookups
  * stay row-exact, and the index pins the version it was built at.
  */
class BloomIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): (String, String) = {
    val base = Files.createTempDirectory("bloomidx").toString
    // 4 buckets by id%4; the lookup column `name` is unrelated to layout
    val df = (0L until 400L).map(i => (i, s"name-$i", s"b${i % 4}")).toDF("id", "name", "cb")
    VersionedTable.commitDelta(spark, s"$base/t", df, "cb")
    BloomIndex.build(spark, s"$base/t", s"$base/i", "name", m = 1 << 14, k = 3)
    (s"$base/t", s"$base/i")
  }

  test("prunePlan: present keys scan exactly their buckets, absent keys skip everything") {
    val (_, idx) = freshTable()
    // name-7 lives in bucket b3, name-100 in b0
    val (scan, skip) = BloomIndex.prunePlan(spark, idx, Seq("name-7", "name-100"))
    assert(scan.contains("b3") && scan.contains("b0"), s"scan=$scan")
    assert(scan.size < 4, s"pruning must skip at least one bucket, scanned $scan")
    assert((scan ++ skip).sorted === Seq("b0", "b1", "b2", "b3"))
    val (scanNone, skipNone) = BloomIndex.prunePlan(spark, idx, Seq("no-such-key-xyz"))
    assert(scanNone.size <= 1, s"an absent key should prune (almost) everything, scanned $scanNone") // FP tolerance
    assert(scanNone.size + skipNone.size === 4)
  }

  test("lookup is row-exact and equals the plain filter") {
    val (t, idx) = freshTable()
    val keys = Seq("name-7", "name-100", "name-399", "absent")
    val got = BloomIndex.lookup(spark, idx, keys)
      .select(col("id")).as[Long].collect().sorted.toSeq
    val want = VersionedTable.read(spark, t)
      .filter(col("name").isin(keys: _*)).select(col("id")).as[Long].collect().sorted.toSeq
    assert(got === want && got === Seq(7L, 100L, 399L))
  }

  test("the index pins its build version: rows committed later are invisible to lookups") {
    val (t, idx) = freshTable()
    val extra = Seq((1000L, "name-late", "b0")).toDF("id", "name", "cb")
    VersionedTable.commitDelta(spark, t, extra, "cb")
    assert(BloomIndex.lookup(spark, idx, Seq("name-late")).count() === 0L,
      "a lookup through a v-pinned index must not see post-build commits")
    assert(VersionedTable.read(spark, t).filter(col("name") === "name-late").count() === 1L)
  }

  test("refusal on a full-snapshot (non-delta) table") {
    val base = Files.createTempDirectory("bloomidx").toString
    VersionedTable.commit(Seq((1L, "x")).toDF("id", "name"), s"$base/t")
    val e = intercept[IllegalStateException](
      BloomIndex.build(spark, s"$base/t", s"$base/i", "name"))
    assert(e.getMessage.contains("delta"))
  }
}
