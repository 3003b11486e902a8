package graft

import org.scalatest.funsuite.AnyFunSuite

/** q63 is the single rows-only query (sketch algorithms are engine-specific
  * by design). This spec bounds its error against the exact answers so the
  * approximation is still CHECKED, just not hash-compared.
  */
class ApproxStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q63 sketch estimates stay within documented error of the exact stats") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q63_approx_stats")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val li = graft.sources.IO.table(spark, dir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders")
      ).collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exactMedians = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    exact.foreach { case (flag, (p, o)) =>
      val a = approx(flag)
      // HLL++ default rsd 5%; the 0.01-rsd variant for orders
      assert(math.abs(a.getLong(1) - p).toDouble / p < 0.15, s"$flag approx_parts ${a.getLong(1)} vs $p")
      assert(math.abs(a.getLong(2) - o).toDouble / o < 0.05, s"$flag approx_orders ${a.getLong(2)} vs $o")
      val med = a.getDouble(3)
      val em = exactMedians(flag)
      assert(math.abs(med - em) / em < 0.05, s"$flag approx median $med vs $em")
    }
  }
}
