package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IO

/** The StagePath/SCALE.md claim made checkable: a date-scoped read of a
  * year=/month=/day= partitioned table prunes at planning time — the scan's
  * PartitionFilters carry the predicate and only matching partitions' rows
  * are read.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("date-partitioned warehouse read prunes partitions") {
    val tmp = Files.createTempDirectory("graft-prune").toString
    val df = Seq(
      (2024, 1, 1, "a", 1.0), (2024, 1, 2, "b", 2.0),
      (2024, 2, 1, "c", 3.0), (2023, 12, 31, "d", 4.0)
    ).toDF("year", "month", "day", "k", "v")
    IO.writeWarehouse(df, s"$tmp/t", partitionCols = Seq("year", "month", "day"), mode = "overwrite")

    val read = spark.read.parquet(s"$tmp/t").filter(col("year") === 2024 && col("month") === 1)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("(year"), "partition predicate missing from PartitionFilters")
    assert(read.count() == 2)
    // pruned scan must not read the 2023 partition's file
    val scanned = read.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(scanned.forall(_.contains("year=2024")), scanned.mkString(","))
    assert(scanned.forall(_.contains("month=1/")), "substring month=1 would also match month=12")
  }
}
