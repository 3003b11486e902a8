package graft

import org.scalatest.funsuite.AnyFunSuite

/** q63 emits exact stats plus bound-check booleans asserting the sketches
  * (HLL distinct counts, approximate quantiles) landed within their
  * documented error bounds — this spec independently recomputes the exact
  * side and asserts every bound check holds (the same invariant the DuckDB
  * oracle hash-compares via expected TRUEs).
  */
class ApproxStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q63 sketch estimates stay within documented error of the exact stats") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q63_approx_stats")(spark, dir)
    val rows = out.collect().map { r =>
      r.getString(out.columns.indexOf("l_returnflag")) -> r
    }.toMap
    assert(rows.nonEmpty)

    val li = graft.sources.IO.table(spark, dir, "lineitem")
    val exact = li
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders"),
        count(lit(1)).as("n")
      )
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    val idx = out.columns.zipWithIndex.toMap
    exact.foreach { case (flag, (p, o, n)) =>
      val r = rows(flag)
      assert(r.getLong(idx("exact_parts")) == p, s"$flag exact_parts")
      assert(r.getLong(idx("exact_orders")) == o, s"$flag exact_orders")
      assert(r.getLong(idx("n_rows")) == n, s"$flag n_rows")
      Seq("parts_ok", "orders_ok", "median_ok", "p99_ok").foreach { c =>
        assert(r.getBoolean(idx(c)), s"$flag $c bound check failed")
      }
    }
  }
}
