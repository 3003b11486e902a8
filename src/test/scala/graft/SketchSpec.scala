package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSketches HLL behavior the q125 operator leans on: shard-local
  * sketches merged by `hll_union_agg` estimate the same cardinality as one
  * direct sketch over the unsharded values (mergeability), and the
  * estimate sits within the audit tolerance of exact.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vals = (1L to 20000L).map(i => (i, s"value-${i % 7321}")).toDF("id", "v")
  // 7321 distinct values

  test("hll: sharded-then-merged estimate equals the direct single-sketch estimate") {
    val direct = vals.agg(hll_sketch_estimate(hll_sketch_agg($"v")).as("est")).head().getLong(0)
    val merged = vals
      .withColumn("shard", pmod($"id", lit(8L)))
      .groupBy($"shard").agg(hll_sketch_agg($"v").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est")).head().getLong(0)
    assert(merged == direct, s"merge must not lose information: direct=$direct merged=$merged")
  }

  test("hll: estimate within the 5% audit tolerance of exact") {
    val est = vals.agg(hll_sketch_estimate(hll_sketch_agg($"v")).as("est")).head().getLong(0)
    assert(math.abs(est - 7321L) <= 7321L * 0.05, s"estimate $est vs exact 7321")
  }
}
