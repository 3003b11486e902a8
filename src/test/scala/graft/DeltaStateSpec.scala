package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DeltaState

/** §2.6 semantics (FIXTURES.md B5): snapshot hit -> delta; snapshot miss ->
  * raw cumulative passthrough; null current counters coalesce to 0 only in
  * line_item_creative mode (coalesceCurrent=true).
  */
class DeltaStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshot hit yields delta, miss yields raw value") {
    val batch = Seq(("a", "r1", 100L), ("b", "r1", 50L)).toDF("_id", "reference_id", "imp")
    val snap = Seq(("a", "r1", 70L)).toDF("_id", "reference_id", "prev_imp")
    val out = DeltaState
      .applyDeltas(batch, snap, Seq("_id", "reference_id"), Seq("imp" -> "prev_imp"), coalesceCurrent = false)
      .collect()
      .map(r => (r.getString(0), r.getLong(r.fieldIndex("delta_imp"))))
      .toMap
    assert(out("a") == 30L) // 100 - 70
    assert(out("b") == 50L) // no snapshot -> raw passthrough
  }

  test("null current counter: preserved without coalesce (line_item mode)") {
    val batch = Seq(("a", "r1", Some(100L)), ("c", "r1", None)).toDF("_id", "reference_id", "imp")
    val snap = Seq(("a", "r1", 70L), ("c", "r1", 10L)).toDF("_id", "reference_id", "prev_imp")
    val out = DeltaState
      .applyDeltas(batch, snap, Seq("_id", "reference_id"), Seq("imp" -> "prev_imp"), coalesceCurrent = false)
    val c = out.filter($"_id" === "c").head()
    assert(c.isNullAt(c.fieldIndex("delta_imp"))) // null - prev = null, like the reference's line_item path
  }

  test("null current counter: coalesced to 0 (line_item_creative mode)") {
    val batch = Seq(("c", "r1", Option.empty[Long])).toDF("_id", "reference_id", "imp")
    val snap = Seq(("c", "r1", 10L)).toDF("_id", "reference_id", "prev_imp")
    val out = DeltaState
      .applyDeltas(batch, snap, Seq("_id", "reference_id"), Seq("imp" -> "prev_imp"), coalesceCurrent = true)
    assert(out.head().getLong(out.head().fieldIndex("delta_imp")) == -10L) // 0 - 10
  }

  test("nextSnapshot keeps latest row per key by timestamp") {
    val batch = Seq(
      ("a", "r1", 100L, "2024-01-01 00:00:00"),
      ("a", "r1", 120L, "2024-01-02 00:00:00")
    ).toDF("_id", "reference_id", "imp", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val snap = DeltaState.nextSnapshot(batch, Seq("_id", "reference_id"), Seq("imp" -> "prev_imp"), Some("ts"))
    assert(snap.count() == 1)
    assert(snap.head().getLong(2) == 120L)
  }
}
