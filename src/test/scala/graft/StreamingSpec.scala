package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dq.{NotNull, Unique}
import graft.streaming.Streaming

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ST1/ST2: foreachBatch DQ validation appends results per micro-batch") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$tmp/src"
    val resDir = s"$tmp/results"
    Seq(("o1", 10.0), ("o2", 20.0), ("o2", 30.0)).toDF("order_id", "amount")
      .write.parquet(srcDir)

    val stream = spark.readStream
      .schema("order_id STRING, amount DOUBLE")
      .parquet(srcDir)
    val q = Streaming.validatedStream(spark, stream, Seq(NotNull("order_id"), Unique("order_id")), resDir, "t1")
    assert(q.awaitTermination(60000), "stream did not finish in 60s")

    val results = spark.read.parquet(resDir)
    assert(results.count() == 2)
    val uq = results.filter($"expectation_type" === "expect_column_values_to_be_unique").head()
    assert(!uq.getAs[Boolean]("success"))
    assert(uq.getAs[Long]("unexpected_count") == 2L)

    // idempotent sink: re-executing the same micro-batch (fresh query, no
    // checkpoint -> batch 0 runs again, foreachBatch's documented retry
    // case) must REPLACE its batch partition, not append duplicates
    val q2 = Streaming.validatedStream(spark, stream, Seq(NotNull("order_id"), Unique("order_id")), resDir, "t1")
    assert(q2.awaitTermination(60000), "stream did not finish in 60s")
    assert(spark.read.parquet(resDir).count() == 2)
  }

  test("streaming SCD-2 warehouse sink is exactly-once across micro-batch retries") {
    import graft.sources.VersionedTable
    val tmp = Files.createTempDirectory("graft-scd2sink").toString
    val srcDir = s"$tmp/src"; val wh = s"$tmp/warehouse"
    Seq((1L, "a"), (2L, "b")).toDF("k", "payload").write.parquet(srcDir)
    // id-robust injectable clock (digit concatenation would break at id>=10)
    val clock = (id: Long) =>
      org.apache.spark.sql.functions.expr(s"timestamp '2024-01-01 00:00:00' + INTERVAL '$id' SECOND")
    def runOnce(ckpt: String): Unit = {
      val stream = spark.readStream.schema("k BIGINT, payload STRING").parquet(srcDir)
      val q = Streaming.scd2WarehouseSink(spark, stream, wh, Seq("k"), nBuckets = 4, now = clock, checkpointLocation = ckpt)
      assert(q.awaitTermination(60000), "stream did not finish in 60s")
      ()
    }
    runOnce(s"$tmp/ckpt1")
    assert(VersionedTable.read(spark, wh).count() == 2)
    val v1 = VersionedTable.latestVersion(spark, wh).get
    // re-delivery simulation: a SECOND checkpoint re-delivers the same files
    // as batch 0 — the in-manifest stream_batch marker must suppress the
    // re-apply (the crash-between-commit-and-offset retry case)
    runOnce(s"$tmp/ckpt2")
    assert(VersionedTable.latestVersion(spark, wh).get == v1, "re-delivered batch must not commit again")
    val t = VersionedTable.read(spark, wh)
    assert(t.count() == 2 && t.filter($"actv_flg" === "Y").count() == 2)

    // interleaved NON-stream commit must not hide the marker — and table
    // MAINTENANCE must not erase it: compact supersedes the stream commit's
    // own json and vacuum deletes it, so suppression relies on the marker
    // being carried forward into the compacted manifest
    VersionedTable.compact(spark, wh, "key_bucket")
    val vacuumed = VersionedTable.vacuum(spark, wh, retainVersions = 1, orphanGraceMs = 0)
    assert(vacuumed.nonEmpty, "fixture should actually expire the stream commit's json")
    runOnce(s"$tmp/ckpt3")
    val t2 = VersionedTable.read(spark, wh)
    assert(t2.count() == 2 && t2.filter($"actv_flg" === "Y").count() == 2,
      "marker must survive compact+vacuum (re-delivery after maintenance)")

    // new data under the ORIGINAL checkpoint -> batch 1 applies exactly once
    Seq((1L, "a2")).toDF("k", "payload").write.mode("append").parquet(srcDir)
    runOnce(s"$tmp/ckpt1")
    val t3 = VersionedTable.read(spark, wh)
    assert(t3.filter($"k" === 1L).count() == 2) // closed v1 + new active
    assert(t3.filter($"k" === 1L && $"actv_flg" === "Y").collect().head.getAs[String]("payload") == "a2")
  }

  test("two streams sharing a warehouse keep independent exactly-once markers") {
    import graft.sources.VersionedTable
    val tmp = Files.createTempDirectory("graft-scd2multi").toString
    val wh = s"$tmp/warehouse"
    val clock = (id: Long) =>
      org.apache.spark.sql.functions.expr(s"timestamp '2024-01-01 00:00:00' + INTERVAL '$id' SECOND")
    def runStream(srcDir: String, ckpt: String, streamId: String): Unit = {
      val stream = spark.readStream.schema("k BIGINT, payload STRING").parquet(srcDir)
      val q = Streaming.scd2WarehouseSink(spark, stream, wh, Seq("k"), nBuckets = 4, now = clock,
        checkpointLocation = ckpt, streamId = streamId)
      assert(q.awaitTermination(60000), "stream did not finish in 60s")
      ()
    }
    // stream A applies its batch 0
    Seq((1L, "a")).toDF("k", "payload").write.parquet(s"$tmp/srcA")
    runStream(s"$tmp/srcA", s"$tmp/ckptA", "A")
    // stream B's batch 0 must STILL apply: without per-stream namespacing,
    // A's marker (batch 0 >= 0) would silently suppress it — data loss
    Seq((2L, "b")).toDF("k", "payload").write.parquet(s"$tmp/srcB")
    runStream(s"$tmp/srcB", s"$tmp/ckptB", "B")
    val t = VersionedTable.read(spark, wh)
    assert(t.count() == 2, "each stream's first batch must land")
    // re-delivery within each stream is still suppressed
    runStream(s"$tmp/srcA", s"$tmp/ckptA2", "A")
    runStream(s"$tmp/srcB", s"$tmp/ckptB2", "B")
    assert(VersionedTable.read(spark, wh).count() == 2)
    val latest = VersionedTable.latestVersion(spark, wh).get
    assert(VersionedTable.streamMarkers(spark, wh, latest).keySet ==
      Set("stream_batch:A", "stream_batch:B"))
  }

  test("ST5: a counter absent from one event keeps its snapshot (update_item SET semantics)") {
    implicit val s = spark
    val tmp = Files.createTempDirectory("graft-stream-merge").toString
    val srcDir = s"$tmp/src"
    // k1 reports imp, then ONLY clk, then imp again: the imp snapshot must
    // survive the clk-only event or the third reading double-counts 100
    Seq(
      ("k1", "imp", 100L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("k1", "clk", 5L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      ("k1", "imp", 120L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
    ).toDF("key", "cname", "cval", "ts").write.parquet(srcDir)

    val events = spark.readStream
      .schema("key STRING, cname STRING, cval BIGINT, ts TIMESTAMP")
      .parquet(srcDir)
      .select($"key", map($"cname", $"cval").as("counters"), $"ts")
      .as[Streaming.CounterEvent]

    val query = Streaming.deltaStream(events)
      .writeStream.format("memory").queryName("deltas_merge")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(query.awaitTermination(60000), "stream did not finish in 60s")

    val got = spark.table("deltas_merge").collect()
      .map(r => (r.getTimestamp(2).toString, r.getAs[Map[String, Long]](1)))
      .toMap
    assert(got("2024-01-01 00:00:00.0") == Map("imp" -> 100L)) // first seen -> raw
    assert(got("2024-01-02 00:00:00.0") == Map("clk" -> 5L))   // first clk -> raw
    assert(got("2024-01-03 00:00:00.0") == Map("imp" -> 20L))  // 120-100, NOT 120
  }

  test("ST5: streaming cumulative->delta with flatMapGroupsWithState") {
    implicit val s = spark
    val tmp = Files.createTempDirectory("graft-stream2").toString
    val srcDir = s"$tmp/src"
    Seq(
      ("k1", 100L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("k1", 130L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      ("k2", 50L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    ).toDF("key", "imp", "ts").write.parquet(srcDir)

    val events = spark.readStream
      .schema("key STRING, imp BIGINT, ts TIMESTAMP")
      .parquet(srcDir)
      .select($"key", map(lit("imp"), $"imp").as("counters"), $"ts")
      .as[Streaming.CounterEvent]

    val out = Streaming.deltaStream(events)
    val query = out.writeStream.format("memory").queryName("deltas")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(query.awaitTermination(60000), "stream did not finish in 60s")

    val got = spark.table("deltas").collect()
      .map(r => (r.getString(0), r.getAs[Map[String, Long]](1)("imp"), r.getTimestamp(2).toString))
      .toSet
    assert(got.contains(("k1", 100L, "2024-01-01 00:00:00.0"))) // first seen -> raw
    assert(got.contains(("k1", 30L, "2024-01-02 00:00:00.0"))) // delta
    assert(got.contains(("k2", 50L, "2024-01-01 00:00:00.0")))
  }

  test("checkpointed incremental ingest resumes without reprocessing (exactly-once)") {
    val tmp = Files.createTempDirectory("graft-ckpt").toString
    val srcDir = s"$tmp/src"; val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    Seq(("a", 1L)).toDF("k", "v").write.mode("append").parquet(srcDir)

    def runOnce(): Unit = {
      val q = spark.readStream.schema("k STRING, v BIGINT").parquet(srcDir)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "stream did not finish in 60s")
    }
    runOnce()
    assert(spark.read.parquet(outDir).count() == 1)

    // second batch of source data; restart from the checkpoint
    Seq(("b", 2L), ("c", 3L)).toDF("k", "v").write.mode("append").parquet(srcDir)
    runOnce()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 3) // 1 old + 2 new; the old file was NOT re-ingested
    assert(out.agg(org.apache.spark.sql.functions.sum("v")).head().getLong(0) == 6L)
  }

  test("streaming dedup within watermark (exactly-once event semantics)") {
    val tmp = Files.createTempDirectory("graft-sdedup").toString
    Seq(
      ("e1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("e1", java.sql.Timestamp.valueOf("2024-01-01 10:00:05")), // duplicate delivery
      ("e2", java.sql.Timestamp.valueOf("2024-01-01 10:01:00"))
    ).toDF("event_id", "ts").write.parquet(s"$tmp/src")

    val deduped = spark.readStream
      .schema("event_id STRING, ts TIMESTAMP")
      .parquet(s"$tmp/src")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "stream did not finish in 60s")
    val ids = spark.table("sdedup").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("e1", "e2")) // the duplicate delivery is dropped
  }

  test("windowed event aggregation (engine-native streaming surface)") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0)
    ).toDF("ts", "event_type", "value")
    val out = Streaming.windowedEventAgg(df).collect()
    assert(out.length == 2)
    val h10 = out.find(_.getTimestamp(0).toString.startsWith("2024-01-01 10")).get
    assert(h10.getLong(2) == 2L && h10.getDouble(3) == 3.0)
  }
}
