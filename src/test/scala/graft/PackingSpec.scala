package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("packGreedy: next-fit per shard, oversized doc gets its own bin, shard reset") {
    val df = Seq(
      // shard 0 (even ids): counts 4, 5, 12, 3
      (0L, doc(4)), (2L, doc(5)), (4L, doc(12)), (6L, doc(3)),
      // shard 1 (odd ids): counts 10, 1, 10
      (1L, doc(10)), (3L, doc(1)), (5L, doc(10))
    ).toDF("doc_id", "text")
    val out = Packing
      .packGreedy(df, budget = 10, nShards = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3))))
      .toMap
    // shard 0: 4 -> bin0(4), 5 -> bin0(9), 12 overflows -> bin1 alone, 3 -> bin2
    assert(out(0L) == ((0, 0L, 4)))
    assert(out(2L) == ((0, 0L, 5)))
    assert(out(4L) == ((0, 1L, 12))) // over budget: own bin, not dropped
    assert(out(6L) == ((0, 2L, 3)))
    // shard 1: exact fit closes the bin for the NEXT doc, not retroactively
    assert(out(1L) == ((1, 0L, 10)))
    assert(out(3L) == ((1, 1L, 1)))
    assert(out(5L) == ((1, 2L, 10)))
  }

  test("packGreedy: every bin except possibly the last per shard is within budget; colliding shards stay independent") {
    // nShards = 3 hashed into fewer partitions than shards forces at least
    // one partition to hold two shards -> the scan-state reset must hold
    val df = (0L until 60L).map(i => (i, doc((i % 7).toInt + 1))).toDF("doc_id", "text")
    val rows = Packing.packGreedy(df, budget = 9, nShards = 3).collect()
    val byBin = rows.groupBy(r => (r.getInt(1), r.getLong(2)))
    byBin.foreach { case ((sh, bin), ds) =>
      val tot = ds.map(_.getInt(3)).sum
      assert(tot <= 9 || ds.length == 1, s"shard $sh bin $bin holds $tot tokens across ${ds.length} docs")
    }
    // each doc appears exactly once, in its own shard
    assert(rows.length == 60)
    rows.foreach(r => assert(r.getLong(0) % 3 == r.getInt(1)))
    // bins are contiguous from 0 within each shard
    rows.groupBy(_.getInt(1)).foreach { case (_, ds) =>
      val bins = ds.map(_.getLong(2)).distinct.sorted.toSeq
      assert(bins == (0L until bins.length))
    }
  }

  test("writeShardManifest: manifest reconciles with shards; loader-side verification catches a wrong-bin shard") {
    import org.apache.spark.sql.functions._
    val df = ((0L to 19L)).map(i => (i, doc(3 + (i % 5).toInt))).toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/out"
    val manifest = Packing.writeShardManifest(df, budget = 8, nShards = 4, outDir = out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(manifest.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(manifest.map(_._2).sum == 20L, "every doc must land in a shard")
    // loader-side check: recompute each shard's fingerprint from the
    // WRITTEN files and compare to the manifest
    val back = spark.read.parquet(s"$out/shards")
    val recomputed = back
      .withColumn("__fp", graft.plans.HashExpressions.md5Prefix60(
        concat(col("doc_id").cast("string"), lit(":"), col("bin_id").cast("string"))))
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(expr("bit_xor(__fp)").as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    manifest.foreach { case (sh, _, _, _, fp) =>
      assert(recomputed(sh) == fp, s"shard $sh fingerprint mismatch")
    }
    // a shard with the right docs in the WRONG bin fails verification
    val corrupted = back.withColumn("bin_id",
      when(col("shard") === 0 && col("bin_id") === 0, lit(1L)).otherwise(col("bin_id")))
    val badFp = corrupted
      .filter(col("shard") === 0)
      .withColumn("__fp", graft.plans.HashExpressions.md5Prefix60(
        concat(col("doc_id").cast("string"), lit(":"), col("bin_id").cast("string"))))
      .agg(expr("bit_xor(__fp)")).head().getLong(0)
    assert(badFp != manifest.find(_._1 == 0L).get._5, "bin-binding fingerprint must detect mispacking")
  }

  test("materializeBins: bins agree with packGreedy; payload hash equals the hand-fused string") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"), (8L, "d e"), (16L, "f g h i"), // shard 0: 3+2 fit in 5, 4 overflows
      (1L, "x y z w v")                             // shard 1: exactly the budget
    ).toDF("doc_id", "text")
    val bins = Packing.materializeBins(docs, budget = 5, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val assign = Packing.packGreedy(docs, budget = 5, nShards = 8)
      .collect().map(r => (r.getLong(0), (r.getInt(1).toLong, r.getLong(2)))).toMap
    assert(assign(0L) == ((0L, 0L)) && assign(8L) == ((0L, 0L)) && assign(16L) == ((0L, 1L)) && assign(1L) == ((1L, 0L)))
    def h(s: String) = graft.plans.Md5Prefix60.hash(s.getBytes("UTF-8"))
    assert(bins((0L, 0L)) == ((2L, 5L, h("a b c <eos> d e"))))
    assert(bins((0L, 1L)) == ((1L, 4L, h("f g h i"))))
    assert(bins((1L, 0L)) == ((1L, 5L, h("x y z w v"))))
  }

  test("epochShuffle: a complete permutation — every doc exactly once, positions dense per shard") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    val out = Packing.epochShuffle(docs, "doc_id", "ep0", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.map(_._1).sorted.toSeq === (0L until 200L), "every doc exactly once")
    out.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq, s"shard $sh positions must be dense 0..n-1")
    }
  }

  test("epochShuffle: same seed bit-identical across runs/partitionings; new seed re-permutes") {
    import spark.implicits._
    val a = Packing.epochShuffle((0L until 500L).toDF("doc_id").repartition(7), "doc_id", "s", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = Packing.epochShuffle((0L until 500L).toDF("doc_id").repartition(3), "doc_id", "s", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a === b, "layout-independent determinism")
    val c = Packing.epochShuffle((0L until 500L).toDF("doc_id"), "doc_id", "s2", 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a !== c, "a new seed must produce a different permutation")
  }

  test("epochShuffle: one exchange, no global sort") {
    import spark.implicits._
    val plan = Packing.epochShuffle((0L until 10L).toDF("doc_id"), "doc_id", "x", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), s"must not global-sort:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, s"exactly one hash exchange:\n$plan")
  }
}
