package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.DqRule
import graft.dq._

/** DQ suite semantics (FIXTURES.md B6): element/unexpected counts per
  * expectation, single-pass aggregation, config-driven suite construction.
  */
class DqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    ("o1", Some("2024-01-01"), 10.0),
    ("o2", None, 20.0),
    ("o2", Some("2024-01-03"), -5.0),
    ("o4", Some("bad-date"), 40.0)
  ).toDF("order_id", "ship_date", "amount")

  test("NotNull / Between / Matches / Unique counts") {
    val rs = DqSuite
      .run(
        df,
        Seq(
          NotNull("ship_date"),
          Between("amount", 0, 100),
          Matches("ship_date", "\\d{4}-\\d{2}-\\d{2}"),
          Unique("order_id")
        ),
        "b1",
        "f1"
      )
      .map(r => (r.expectationType, r.columnName) -> r)
      .toMap

    val nn = rs(("expect_column_values_to_not_be_null", "ship_date"))
    assert(nn.elementCount == 4 && nn.unexpectedCount == 1 && !nn.success)
    val bt = rs(("expect_column_values_to_be_between", "amount"))
    assert(bt.unexpectedCount == 1 && !bt.success)
    val mt = rs(("expect_column_values_to_match_regex", "ship_date"))
    assert(mt.unexpectedCount == 1)
    val uq = rs(("expect_column_values_to_be_unique", "order_id"))
    assert(uq.elementCount == 4 && uq.unexpectedCount == 2 && !uq.success)
  }

  test("Unique works on a column literally named 'c' (no internal-alias collision)") {
    val cdf = Seq("x", "x", "y").toDF("c")
    val rs = DqSuite.run(cdf, Seq(Unique("c")), "b1", "f1")
    assert(rs.head.elementCount == 3 && rs.head.unexpectedCount == 2)
  }

  test("fromConfig skips non-numeric between bounds like any other malformed rule") {
    val rules = Seq(
      DqRule("p1", "amount", "between:low:high", active = true),
      DqRule("p1", "amount", "between:0:100", active = true)
    )
    val suite = DqSuite.fromConfig(rules)
    assert(suite.collect { case b: Between => (b.lo, b.hi) } == Seq((0.0, 100.0)))
  }

  test("config parse fails with a clear message when 'services' is missing") {
    implicit val s = spark
    val e = intercept[IllegalArgumentException](graft.core.Config.parse("""{"source":"x"}"""))
    assert(e.getMessage.contains("services"))
  }

  test("suite from hot-loaded config rows (ST3)") {
    val rules = Seq(
      DqRule("p1", "order_id", "unique", active = true),
      DqRule("p1", "ship_date", "not_null", active = true),
      DqRule("p1", "amount", "between:0:100", active = true),
      DqRule("p1", "amount", "matches:\\d+", active = false) // inactive -> dropped
    )
    val suite = DqSuite.fromConfig(rules)
    assert(suite.size == 3)
    assert(suite.collect { case u: Unique => u.columnName } == Seq("order_id"))
    assert(suite.collect { case b: Between => (b.lo, b.hi) } == Seq((0.0, 100.0)))
  }

  test("all-pass suite reports success") {
    val clean = Seq(("a", 1.0), ("b", 2.0)).toDF("id", "v")
    val rs = DqSuite.run(clean, Seq(NotNull("id"), Unique("id"), Between("v", 0, 10)), "b", "f")
    assert(rs.forall(_.success))
  }

  test("GX result fidelity: kwargs + run identifiers round-trip through the append sink") {
    val rs = DqSuite.run(df, Seq(NotNull("ship_date"), Between("amount", 0, 100), Unique("order_id")), "b9", "orders_file")
    // reference shape (great_expectations.py:313-335): per-result kwargs and
    // run-level identifiers, deterministic for replayability
    assert(rs.forall(_.greatExpId == "graft-orders_file-b9"))
    assert(rs.forall(_.runName == "graft-checkpoint-b9"))
    val kw = rs.map(r => r.expectationType -> r.expectationKwargs).toMap
    assert(kw("expect_column_values_to_not_be_null") == """{"column": "ship_date"}""")
    assert(kw("expect_column_values_to_be_between") == """{"column": "amount", "min_value": 0.0, "max_value": 100.0}""")

    val tmp = java.nio.file.Files.createTempDirectory("graft-dq").toString
    val out = DqSuite.resultsDf(spark, rs)
    out.write.mode("append").parquet(tmp)
    out.write.mode("append").parquet(tmp) // S12 append semantics
    val back = spark.read.parquet(tmp)
    assert(back.count() == 6)
    assert(
      back.columns.sorted.toSeq ==
        Seq("batchID", "column_name", "element_count", "expectation_kwargs", "expectation_type",
          "file_identifier", "great_exp_id", "run_name", "success", "unexpected_count")
    )
    assert(back.select("run_name").distinct().head().getString(0) == "graft-checkpoint-b9")
  }

  test("histogram: exact bucket edges, clamped outliers, empty buckets densified") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // [0, 100) in 4 buckets of width 25; -5 clamps into bin 0, 250 into bin 3
    val df = Seq(0L, 10L, 24L, 25L, 99L, -5L, 250L).toDF("c")
    val out = graft.dq.DqSuite.histogram(df, col("c"), 0L, 100L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((0L, 0L, 4L), (1L, 25L, 1L), (2L, 50L, 0L), (3L, 75L, 2L)), s"got ${out.toSeq}")
    intercept[IllegalArgumentException] { graft.dq.DqSuite.histogram(df, col("c"), 10L, 10L, 4) }
  }

  test("histogram rollup: stored per-key partials are sparse and their sum equals the direct histogram") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two 'days' of values over [0,100) in 4 bins; day d2 leaves bin 2 empty
    val rows = Seq(("d1", 5L), ("d1", 30L), ("d1", 60L), ("d2", 10L), ("d2", 80L), ("d2", -7L), ("d2", 400L))
    val df = rows.toDF("day", "c")
    val partials = graft.dq.DqSuite.histogramByKey(df, col("day"), col("c"), 0L, 100L, 4)
      .as[(String, Long, Long)].collect().toSet
    // SPARSE: only bins that carry rows are stored
    assert(partials == Set(("d1", 0L, 1L), ("d1", 1L, 1L), ("d1", 2L, 1L),
      ("d2", 0L, 2L), ("d2", 3L, 2L)), s"got $partials")
    // merge-serve over the stored partials == the direct one-shot histogram
    val stored = partials.toSeq.toDF("day", "bin", "n")
    val merged = graft.dq.DqSuite.histogramMergeServe(stored, 0L, 100L, 4)
      .orderBy($"bin").as[(Long, Long, Long)].collect().toSeq
    val direct = graft.dq.DqSuite.histogram(df, col("c"), 0L, 100L, 4)
      .orderBy($"bin").as[(Long, Long, Long)].collect().toSeq
    assert(merged == direct, s"merged $merged != direct $direct")
    assert(merged == Seq((0L, 0L, 3L), (1L, 25L, 1L), (2L, 50L, 1L), (3L, 75L, 2L)))
  }

  test("distributionDrift: hand-computed shares and exact integer TVD") {
    import spark.implicits._
    // grid [0,100) x 4 bins; ref: 4 rows in bin0, 4 in bin1 -> 5000/5000
    // cur: 2 in bin0, 6 in bin3 -> 2500/0/0/7500
    val ref = Seq(1L, 2L, 3L, 4L, 30L, 31L, 32L, 33L).toDF("c")
    val cur = Seq(1L, 2L, 80L, 81L, 82L, 83L, 84L, 85L).toDF("c")
    val got = graft.dq.DqSuite.distributionDrift(ref, cur, org.apache.spark.sql.functions.col("c"), 0L, 100L, 4)
      .orderBy($"bin").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    // |5000-2500| + |5000-0| + 0 + |0-7500| = 15000 -> tvd 7500
    assert(got == Seq(
      (0L, 4L, 2L, 5000L, 2500L, 2500L, 7500L),
      (1L, 4L, 0L, 5000L, 0L, 5000L, 7500L),
      (2L, 0L, 0L, 0L, 0L, 0L, 7500L),
      (3L, 0L, 6L, 0L, 7500L, 7500L, 7500L)
    ), got.toString)
  }

  test("distributionDrift: identical slices give zero TVD; empty current side is total drift-safe") {
    import spark.implicits._
    val df = Seq(1L, 40L, 90L).toDF("c")
    val same = graft.dq.DqSuite.distributionDrift(df, df, org.apache.spark.sql.functions.col("c"), 0L, 100L, 4).collect()
    assert(same.forall(_.getLong(7) == 0L))
    val empty = Seq.empty[Long].toDF("c")
    val out = graft.dq.DqSuite.distributionDrift(df, empty, org.apache.spark.sql.functions.col("c"), 0L, 100L, 4).collect()
    assert(out.forall(_.getLong(5) == 0L), "empty side has zero shares, no division error")
  }
}
