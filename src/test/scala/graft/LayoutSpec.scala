package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue: interleaves bits; locality in both dimensions") {
    val df = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0)).toDF("x", "y")
    val specs = Seq((col("x"), 0.0, 1.0), (col("y"), 0.0, 1.0))
    val z = df.select(Layout.zValue(specs, bits = 1)).collect().map(_.getLong(0)).toSeq
    // 1 bit/col: (0,0)->0, (1,0)->1, (0,1)->2, (1,1)->3 — the 2x2 Morton square
    assert(z == Seq(0L, 1L, 2L, 3L))
  }

  test("z-order clustering prunes files on BOTH columns; linear sort only on its own") {
    // 64x64 grid: every (x, y) combination once
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y)).toDF("x", "y")
    val tmp = Files.createTempDirectory("graft-layout").toString
    val nFiles = 16

    Layout.zOrderWrite(grid, Seq("x", "y"), s"$tmp/zorder", numFiles = nFiles, bits = 6)
    // baseline: linear clustering on x only
    grid.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$tmp/linear")

    // same rows in both layouts
    assert(spark.read.parquet(s"$tmp/zorder").count() == 4096)

    // narrow predicate on x: both layouts prune well
    val (zx, zTotal) = Layout.filesPossiblyMatching(spark, s"$tmp/zorder", "x", 10, 13)
    val (lx, lTotal) = Layout.filesPossiblyMatching(spark, s"$tmp/linear", "x", 10, 13)
    assert(zx < zTotal && lx < lTotal, s"x-predicate should prune in both layouts ($zx/$zTotal, $lx/$lTotal)")

    // narrow predicate on y: the linear-x layout cannot prune AT ALL
    // (every file spans all y); z-order must prune a real fraction
    val (zy, _) = Layout.filesPossiblyMatching(spark, s"$tmp/zorder", "y", 10, 13)
    val (ly, _) = Layout.filesPossiblyMatching(spark, s"$tmp/linear", "y", 10, 13)
    assert(ly == lTotal, s"x-sorted layout unexpectedly pruned y ($ly/$lTotal)")
    assert(zy <= zTotal / 2, s"z-order pruned too little on y: $zy of $zTotal files")
  }

  test("zOrderWrite: all-null clustering column and empty input don't NPE") {
    val tmp = Files.createTempDirectory("graft-layout-null").toString
    // all-null stats: min/max are null, range collapses to bucket 0
    val nulls = Seq((null: java.lang.Double, 1L), (null: java.lang.Double, 2L)).toDF("x", "id")
    Layout.zOrderWrite(nulls, Seq("x"), s"$tmp/nulls", numFiles = 2)
    assert(spark.read.parquet(s"$tmp/nulls").count() == 2)
    // empty input: the stats row is all-null too — the write must succeed
    Layout.zOrderWrite(nulls.filter(col("id") < 0), Seq("x"), s"$tmp/empty", numFiles = 2)
  }

  test("filesPossiblyMatching counts an all-null file as non-matching, not NPE") {
    val tmp = Files.createTempDirectory("graft-layout-nullfile").toString
    Seq((null: java.lang.Double, 1L), (null: java.lang.Double, 2L)).toDF("v", "id")
      .coalesce(1).write.parquet(s"$tmp/t")
    Seq((5.0: java.lang.Double, 3L)).toDF("v", "id")
      .coalesce(1).write.mode("append").parquet(s"$tmp/t")
    val (matching, total) = Layout.filesPossiblyMatching(spark, s"$tmp/t", "v", 0, 10)
    assert(total == 2)
    assert(matching == 1) // the all-null file cannot contain a row in range
  }
}
