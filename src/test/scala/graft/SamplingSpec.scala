package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = (1L to 4000L)
    .map(i => (i, s"grp${i % 4}"))
    .toDF("id", "grp")

  test("mixtureSample: per-group rates hit within tolerance, deterministically") {
    val rates = Map("grp0" -> 0.8, "grp1" -> 0.2, "grp2" -> 0.0)
    def run() = Sampling.mixtureSample(corpus, "id", "grp", rates, defaultRate = 0.5)
      .groupBy($"grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run()
    assert(got == run(), "sampling must be deterministic across runs")
    assert(!got.contains("grp2"), "rate 0.0 must drop the whole group")
    // 1000 ids per group; md5 buckets are uniform so ±10% absolute slack is generous
    assert(math.abs(got("grp0") - 800) < 100, s"grp0 kept ${got("grp0")}")
    assert(math.abs(got("grp1") - 200) < 100, s"grp1 kept ${got("grp1")}")
    assert(math.abs(got("grp3") - 500) < 100, s"default-rate grp3 kept ${got("grp3")}")
  }

  test("mixtureSample: raising a rate only ADDS rows (nested samples share the keep set)") {
    val low = Sampling.mixtureSample(corpus, "id", "grp", Map.empty, defaultRate = 0.2)
      .select($"id").collect().map(_.getLong(0)).toSet
    val high = Sampling.mixtureSample(corpus, "id", "grp", Map.empty, defaultRate = 0.6)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high), "a higher rate must be a superset — threshold moves, bucket does not")
  }

  test("mixtureSample: salt decorrelates draws; overlap is proportional, not identical") {
    val a = Sampling.mixtureSample(corpus, "id", "grp", Map.empty, defaultRate = 0.5, salt = "runA")
      .select($"id").collect().map(_.getLong(0)).toSet
    val b = Sampling.mixtureSample(corpus, "id", "grp", Map.empty, defaultRate = 0.5, salt = "runB")
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(a != b, "different salts must draw different samples")
    // independent 50% draws overlap on ~25% of the corpus
    val overlap = (a & b).size.toDouble / corpus.count()
    assert(overlap > 0.15 && overlap < 0.35, s"overlap $overlap not ~0.25")
  }

  test("mixtureSample: rejects rates outside [0,1]") {
    assertThrows[IllegalArgumentException](
      Sampling.mixtureSample(corpus, "id", "grp", Map("grp0" -> 1.5))
    )
  }

  test("hashSampledQuantiles: exact floored-rank order statistics; sample is deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // sampleMod=1 keeps everything: quantiles are exact order statistics
    val df = (1L to 100L).map(i => ("g1", i)).toDF("grp", "v").repartition(7)
    val out = Sampling
      .hashSampledQuantiles(df, "grp", col("v"), col("v"), sampleMod = 1L)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    // rank = (99 * pm) div 1000 + 1 -> p50: 50th value = 50, p90: 90, p99: 99
    assert(out == Map("p50" -> (100L, 50L), "p90" -> (100L, 90L), "p99" -> (100L, 99L)))
    // a 1-in-4 hash sample: re-running yields the identical rows (no RNG)
    val s1 = Sampling.hashSampledQuantiles(df, "grp", col("v"), col("v"), 4L).collect().map(_.toSeq).toSet
    val s2 = Sampling.hashSampledQuantiles(df, "grp", col("v"), col("v"), 4L).collect().map(_.toSeq).toSet
    assert(s1 == s2 && s1.nonEmpty)
    assertThrows[IllegalArgumentException](
      Sampling.hashSampledQuantiles(df, "grp", col("v"), col("v"), 0L)
    )
  }

  test("balancedDownsample: every class trimmed to min class size, keep-set stable as others grow") {
    import spark.implicits._
    val rows = ((1L to 10L).map(i => (i, 0L)) ++ (101L to 103L).map(i => (i, 1L))).toDF("vec_id", "label")
    val out = Sampling.balancedDownsample(rows, "label", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byLabel = out.groupBy(_._2)
    assert(byLabel(0L).length == 3 && byLabel(1L).length == 3, s"got ${out.toSeq}")
    // hash-rank selection: class 0's keepers are its top-3 by (hash DESC, id)
    val expected = (1L to 10L)
      .map(i => (graft.plans.Md5Prefix60.hash(i.toString.getBytes("UTF-8")), i))
      .sortBy { case (h, id) => (-h, id) }.take(3).map(_._2).toSet
    assert(byLabel(0L).map(_._1).toSet == expected)
    // class 1 growing to 5 raises the floor to 5: class 0's new keep-set
    // is the hash-rank PREFIX extension of the old one (nested samples)
    val grown = rows.unionByName(Seq((104L, 1L), (105L, 1L)).toDF("vec_id", "label"))
    val again = Sampling.balancedDownsample(grown, "label", "vec_id")
      .collect().filter(_.getLong(1) == 0L).map(_.getLong(0)).toSet
    assert(again.size == 5 && expected.subsetOf(again),
      s"keep-set must extend the old prefix: was $expected, got $again")
  }

  test("domainCap: cap enforced per domain, hash-rank deterministic, small domains survive whole") {
    import spark.implicits._
    val docs = ((1L to 20L).map(i => (i, "big")) ++ Seq((100L, "small"), (101L, "small"))).toDF("doc_id", "source")
    val out = Sampling.domainCap(spark, docs, "source", "doc_id", maxPerDomain = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byDomain = out.groupBy(_._1)
    assert(byDomain("big").length == 5 && byDomain("small").length == 2)
    assert(byDomain("big").map(_._2).sorted.toSeq == (1L to 5L), "ranks must be 1..k")
    // independent replay: expected keepers = top-5 by (md5-prefix hash DESC, id ASC)
    val expected = (1L to 20L)
      .map(i => (graft.plans.Md5Prefix60.hash(i.toString.getBytes("UTF-8")), i))
      .sortBy { case (h, id) => (-h, id) }.take(5).map(_._2).toSet
    assert(byDomain("big").map(_._3).toSet == expected)
    val again = Sampling.domainCap(spark, docs, "source", "doc_id", maxPerDomain = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == out.toSet, "selection must be deterministic")
    assertThrows[IllegalArgumentException](Sampling.domainCap(spark, docs, "source", "doc_id", 0))
  }

  test("upsampleMixture: floor+fractional copies by portable hash, drop at 0, default passthrough") {
    import spark.implicits._
    val docs = (1L to 400L).map(i =>
      (i, Seq("a", "b", "c", "d")((i % 4).toInt))).toDF("doc_id", "source")
    val got = Sampling.upsampleMixture(docs, "source", "doc_id",
      Map("a" -> 25000L, "b" -> 5000L, "c" -> 0L))
      .select($"doc_id", $"source", $"n_copies", $"copy_idx")
      .as[(Long, String, Long, Long)].collect()
    val byDoc = got.groupBy(_._1)
    // replay the indicator with the SAME portable hash
    val h = docs.select($"doc_id",
      pmod(graft.plans.HashExpressions.md5Prefix60($"doc_id".cast("string")), lit(10000L)))
      .as[(Long, Long)].collect().toMap
    docs.as[(Long, String)].collect().foreach { case (id, src) =>
      val w = Map("a" -> 25000L, "b" -> 5000L, "c" -> 0L).getOrElse(src, 10000L)
      val want = w / 10000L + (if (h(id) < w % 10000L) 1L else 0L)
      val copies = byDoc.getOrElse(id, Array.empty).map(_._4).sorted.toSeq
      assert(copies == (1L to want), s"doc $id ($src, w=$w): copies $copies, want 1..$want")
    }
    // every 'c' dropped, every 'd' exactly once, and 'b' genuinely subsampled
    assert(!got.exists(_._2 == "c"))
    assert(got.count(_._2 == "d") == 100)
    val bCount = got.count(_._2 == "b")
    assert(bCount > 20 && bCount < 80, s"b should Bernoulli-thin to ~50, got $bCount")
  }

  test("importanceSample: per-row acceptance replayed independently; weights clamp; nested by weight") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, (i % 4) match {
      case 0 => -500L   // clamps to 0 -> always dropped
      case 1 => 2500L
      case 2 => 7500L
      case _ => 99999L  // clamps to 10000 -> always kept
    })).toDF("doc_id", "w_e4")
    val kept = Sampling.importanceSample(docs, "doc_id", "w_e4", "sd")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def h(id: Long) = Math.floorMod(graft.plans.Md5Prefix60.hash(s"sd:$id".getBytes("UTF-8")), 10000L)
    (0L until 400L).foreach { i =>
      val w = math.max(0L, math.min(10000L, (i % 4) match {
        case 0 => -500L; case 1 => 2500L; case 2 => 7500L; case _ => 99999L
      }))
      assert(kept.contains(i) == (h(i) < w), s"doc $i acceptance mismatch")
    }
    assert(!kept.keys.exists(_ % 4 == 0), "clamped-to-zero rows all dropped")
    assert(kept.keys.count(_ % 4 == 3) == 100, "clamped-to-10000 rows all kept")
    // nested property: the 2500-weight keeps a SUBSET of what 7500 would keep
    val lo = Sampling.importanceSample(docs.withColumn("w_e4", lit(2500L)), "doc_id", "w_e4", "sd")
      .collect().map(_.getLong(0)).toSet
    val hi = Sampling.importanceSample(docs.withColumn("w_e4", lit(7500L)), "doc_id", "w_e4", "sd")
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), "fixed-seed selections must nest by weight")
  }
}
