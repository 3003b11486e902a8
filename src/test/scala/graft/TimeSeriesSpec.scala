package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("gapFillDaily: densifies each key's span, LOCF across gaps, gap days flagged with 0 events") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.50),
      (1L, ts("2024-01-01 11:00:00"), 2.50), // day 1: 400 cents, 2 events
      (1L, ts("2024-01-04 09:00:00"), 10.00), // days 2-3 are gaps
      (2L, ts("2024-03-07 00:00:00"), 7.00) // single-day span: no gaps
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.gapFillDaily(ev, "user_id", "ts", "value")
      .orderBy($"user_id", $"day")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01", 400L, 2L, false),
      (1L, "2024-01-02", 400L, 0L, true),
      (1L, "2024-01-03", 400L, 0L, true),
      (1L, "2024-01-04", 1000L, 1L, false),
      (2L, "2024-03-07", 700L, 1L, false)
    ))
  }

  test("funnelSteps: steps must occur strictly after the previous step's earliest completion") {
    val ev = Seq(
      // user 1 completes all three in order
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-02 00:00:00"), "b"),
      (1L, ts("2024-01-03 00:00:00"), "c"),
      // user 2: b BEFORE a — never reaches step 2
      (2L, ts("2024-01-02 00:00:00"), "b"),
      (2L, ts("2024-01-03 00:00:00"), "a"),
      // user 3: a then b simultaneous with a (strict > excludes), later b counts
      (3L, ts("2024-01-01 00:00:00"), "a"),
      (3L, ts("2024-01-01 00:00:00"), "b"),
      (3L, ts("2024-01-05 00:00:00"), "b")
    ).toDF("user_id", "ts", "event_type")
    val got = TimeSeries.funnelSteps(ev, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .orderBy($"step").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "a", 3L), (2, "b", 2L), (3, "c", 1L)))
  }

  test("funnelSteps: earliest-completion greediness does not strand later chances") {
    // earliest a = day1; b exists only BEFORE day1 -> step 2 empty even
    // though (a@day1) has no b after it — documents the greedy semantic
    val ev = Seq(
      (1L, ts("2024-01-05 00:00:00"), "a"),
      (1L, ts("2024-01-01 00:00:00"), "b")
    ).toDF("user_id", "ts", "event_type")
    val got = TimeSeries.funnelSteps(ev, "user_id", "ts", "event_type", Seq("a", "b"))
      .orderBy($"step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(got.toSeq == Seq((1, 1L), (2, 0L)))
  }

  test("retentionCohorts: offsets from each user's first day; same-day duplicates collapse") {
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00")),
      (1L, ts("2024-01-01 09:00:00")), // same day: one activity
      (1L, ts("2024-01-03 00:00:00")),
      (2L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-02 00:00:00"))
    ).toDF("user_id", "ts")
    val got = TimeSeries.retentionCohorts(ev, "user_id", "ts")
      .orderBy($"cohort_day", $"day_offset")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L), // both users active on their first day
      ("2024-01-01", 1, 1L), // user 2 back on day 1
      ("2024-01-01", 2, 1L) // user 1 back on day 2
    ))
  }

  test("decayedValue: hand-traced integer fold in (ts, id) order; decay bounds enforced") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, 1.00),
      (1L, ts("2024-01-02 00:00:00"), 11L, 2.00),
      (1L, ts("2024-01-03 00:00:00"), 12L, 0.50),
      (2L, ts("2024-01-01 00:00:00"), 13L, 3.33),
      // same-ts tie for user 3: event_id orders the fold
      (3L, ts("2024-01-01 00:00:00"), 21L, 1.00),
      (3L, ts("2024-01-01 00:00:00"), 20L, 2.00)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.decayedValue(ev, "user_id", "ts", "event_id", "value", decayE4 = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // user 1: 100 -> floor(100*.5)+200 = 250 -> floor(250*.5)+50 = 175
    assert(out(0) == (1L, 3L, 175L))
    assert(out(1) == (2L, 1L, 333L))
    // user 3: id 20 first: 200 -> floor(200*.5)+100 = 200
    assert(out(2) == (3L, 2L, 200L))
    assertThrows[IllegalArgumentException](
      TimeSeries.decayedValue(ev, "user_id", "ts", "event_id", "value", decayE4 = 10001L))
  }
}
