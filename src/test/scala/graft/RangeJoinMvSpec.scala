package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Mv, RangeJoin, Sampling}

class RangeJoinMvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("binnedIntervalJoin: equals the naive range join, including bin-boundary points and multi-bin intervals") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // exactly a bin boundary
      (2L, ts("2024-01-03 12:00:00")),
      (3L, ts("2024-01-10 00:00:00")), // == an interval's exclusive end
      (4L, ts("2024-02-01 00:00:00"))
    ).toDF("pid", "pt")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-10 00:00:00")), // spans many 1-day bins
      (11L, ts("2024-01-03 00:00:00"), ts("2024-01-04 00:00:00")),
      (12L, ts("2024-03-01 00:00:00"), ts("2024-03-01 00:00:00")) // empty: dropped
    ).toDF("iid", "start_ts", "end_ts")
    val got = RangeJoin.binnedIntervalJoin(points, "pt", intervals, "start_ts", "end_ts", binSeconds = 86400)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, $"pt" >= $"start_ts" && $"pt" < $"end_ts")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L)))
  }

  test("binnedIntervalJoin: pair meets exactly once even when the interval covers many bins") {
    val points = Seq((1L, ts("2024-01-05 00:00:00"))).toDF("pid", "pt")
    val intervals = Seq((9L, ts("2024-01-01 00:00:00"), ts("2024-01-31 00:00:00"))).toDF("iid", "s", "e")
    val n = RangeJoin.binnedIntervalJoin(points, "pt", intervals, "s", "e", binSeconds = 3600).count()
    assert(n == 1L, "bin replication must never duplicate a qualifying pair")
  }

  test("maintainCountSum: feed-maintained view equals bootstrap of the next snapshot, with predicate flips") {
    // view: per-group (count, cents) over ACTIVE rows
    val snap1 = Seq(
      ("g1", "Y", 100L), ("g1", "Y", 50L), ("g2", "Y", 10L), ("g2", "N", 999L)
    ).toDF("grp", "actv", "cents_raw")
    val base = Mv.bootstrapCountSum(snap1.filter($"actv" === "Y"), col("grp"), col("cents_raw"))
    // changes: g1 row updated 100->120 (stays active), g2's active row
    // flips to inactive (pre Y / post N), g3 row inserted, one g1 row deleted
    val feed = Seq(
      ("update_preimage", "g1", "Y", 100L),
      ("update_postimage", "g1", "Y", 120L),
      ("update_preimage", "g2", "Y", 10L),
      ("update_postimage", "g2", "N", 10L),
      ("insert", "g3", "Y", 7L),
      ("delete", "g1", "Y", 50L)
    ).toDF("_change_type", "grp", "actv", "cents_raw")
    val maintained = Mv.maintainCountSum(base, feed, col("grp"), col("actv") === "Y", col("cents_raw"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // next snapshot: g1 has one active row @120; g2 none active; g3 one @7
    assert(maintained == Set(("g1", 1L, 120L), ("g3", 1L, 7L)))
  }

  test("maintainCountSum: unknown change type fails loudly") {
    val base = Seq(("g1", 1L, 5L)).toDF("view_key", "n_rows", "cents")
    val feed = Seq(("upsert", "g1", 5L)).toDF("_change_type", "grp", "cents_raw")
    val ex = intercept[Exception](
      Mv.maintainCountSum(base, feed, col("grp"), lit(true), col("cents_raw")).collect())
    assert(ex.getMessage.contains("unknown change type"))
  }

  test("groupSafeSplit: all members of a duplicate group share one split; buckets respect the 8/1/1 cut") {
    val docs = (1L to 3000L).map(i => (i, s"fp${i % 300}")).toDF("id", "fp")
    val got = Sampling.groupSafeSplit(docs, "id", col("fp"))
    val perGroup = got.groupBy($"fp").agg(countDistinct($"split").as("n")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L), "a duplicate group must never straddle splits")
    val reps = got.groupBy($"fp").agg(min($"id").as("want_rep"), first($"rep_id").as("got_rep")).collect()
    assert(reps.forall(r => r.getLong(1) == r.getLong(2)), "representative must be the group min id")
    val bySplit = got.groupBy($"split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 300 groups x 10 rows; md5 buckets uniform -> train ~2400, val/test ~300
    assert(math.abs(bySplit("train") - 2400) < 300, s"train ${bySplit("train")}")
    assert(bySplit.getOrElse("val", 0L) > 100 && bySplit.getOrElse("test", 0L) > 100)
  }

  test("maintainKeyedJoin: touched keys recompute (update/insert/delete/dim-change), untouched carry verbatim") {
    import graft.operators.Mv
    def a(rows: (Long, Long)*) = rows.toDF("k", "a_val")
    def b(rows: (Long, String)*) = rows.toDF("k", "seg")
    val a1 = a(1L -> 10L, 2L -> 20L, 3L -> 30L, 5L -> 50L)
    val b1 = b(1L -> "x", 2L -> "x", 3L -> "x", 4L -> "x", 5L -> "x")
    val view1 = a1.join(b1, "k")
    // to-versions: k1 A-updated, k2 A-deleted, k4 A-inserted, k3 B-segment change, k5 untouched
    val a2 = a(1L -> 11L, 3L -> 30L, 4L -> 40L, 5L -> 99L) // k5 changed too — but NOT fed
    val b2 = b(1L -> "x", 2L -> "x", 3L -> "y", 4L -> "x", 5L -> "x")
    val touched = Seq(1L, 2L, 3L, 4L).toDF("k")
    val got = Mv.maintainKeyedJoin(view1, touched, a2, b2, "k")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 11L, "x"), (3L, 30L, "y"), (4L, 40L, "x"), (5L, 50L, "x")),
      s"got $got")
    // k2 left (A delete); k5 carried at the OLD value — the carry is an
    // anti join against touched keys, never a recompute (a feed that
    // misses a key shows up here as staleness, not silent repair)
    // full-feed maintenance equals the full recompute
    val full = Mv.maintainKeyedJoin(view1, Seq(1L, 2L, 3L, 4L, 5L).toDF("k"), a2, b2, "k")
      .as[(Long, Long, String)].collect().toSet
    val recompute = a2.join(b2, "k").as[(Long, Long, String)].collect().toSet
    assert(full == recompute, s"full maintenance $full != recompute $recompute")
  }
}
