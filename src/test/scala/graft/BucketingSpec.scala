package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IO

/** Bucketing = pay the shuffle at load time, never per query. The spec
  * asserts the actual plan property: a join of two tables bucketed on the
  * join key contains NO shuffle exchange.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("join of co-bucketed tables is shuffle-free") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // clear any stale managed-table locations from prior (failed) runs
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new java.io.File(s"spark-warehouse/$t")
      if (p.exists()) org.apache.commons.io.FileUtils.deleteDirectory(p)
    }
    IO.writeBucketedTable(orders, "b_orders", "o_orderkey", 8, Seq("o_orderkey"))
    IO.writeBucketedTable(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8, Seq("o_orderkey"))

    // the sf0.001 tables auto-broadcast, which bypasses bucketing; disable
    // broadcast to exercise the fact-fact (sort-merge) path bucketing is for
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() == lineitem.count())

      // and the grouped aggregation on the bucket key is also exchange-free
      val agg = spark.table("b_lineitem").groupBy("o_orderkey").agg(count(lit(1)))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
