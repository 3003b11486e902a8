package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Fernet
import graft.operators.{Dedup, Scd2}

/** Property-based invariants (SURVEY.md §5): SCD-2 active-uniqueness and
  * idempotence, explode cardinality, encrypt-then-decrypt identity, Jaccard
  * bounds/symmetry. Deterministic seeds (no scalatest-scalacheck bridge in
  * the offline cache, so generators are sampled directly).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val now = lit("2024-06-01 00:00:00").cast("timestamp")

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("SCD-2: exactly one active version per batch key, any inputs") {
    val keyGen = Gen.nonEmptyListOf(Gen.choose(1, 4)) // small key space forces collisions
    samples(Gen.zip(keyGen, keyGen), 20).foreach { case (targetKeys, batchKeys) =>
      val target = targetKeys.distinct.map(k => (s"k$k", s"v$k", "Y"))
        .toDF("bkey", "payload", "actv_flg")
        .withColumn("record_to", lit(null).cast("timestamp"))
      val batch = batchKeys.distinct.map(k => (s"k$k", s"new$k")).toDF("bkey", "payload")
      val out = Scd2.upsert(target, batch, Seq("bkey"), now)
      val actives = out.filter($"actv_flg" === "Y").groupBy("bkey").count().collect()
      assert(actives.forall(_.getLong(1) == 1), s"targets=$targetKeys batch=$batchKeys")
      val activeByKey = out.filter($"actv_flg" === "Y").collect().map(r => r.getString(0) -> r.getString(1)).toMap
      batchKeys.distinct.foreach(k => assert(activeByKey(s"k$k") == s"new$k"))
    }
  }

  test("SCD-2 idempotence: re-upserting the same batch adds exactly one closed version per key") {
    val target = Seq(("a", "v0", "Y")).toDF("bkey", "payload", "actv_flg")
      .withColumn("record_to", lit(null).cast("timestamp"))
    val batch = Seq(("a", "v1")).toDF("bkey", "payload")
    val once = Scd2.upsert(target, batch, Seq("bkey"), now)
    val twice = Scd2.upsert(once, batch, Seq("bkey"), now)
    assert(twice.count() == once.count() + 1)
    assert(twice.filter($"actv_flg" === "Y").count() == 1)
  }

  test("explode cardinality = sum of list lengths (empty lists drop rows)") {
    val listsGen = Gen.listOfN(8, Gen.listOf(Gen.alphaStr.map(_.take(4))))
    samples(listsGen, 10).foreach { lists =>
      val df = lists.zipWithIndex.map { case (l, i) => (i, l) }.toDF("id", "xs")
      val exploded = graft.operators.Transform.extendColumnsInRows(df, "xs")
      assert(exploded.count() == lists.map(_.size).sum)
    }
  }

  test("Fernet: decrypt(encrypt(x)) == x for arbitrary strings") {
    val kb = Fernet.decodeKey(Fernet.generateKey())
    samples(Gen.asciiPrintableStr, 50).foreach { s =>
      assert(new String(Fernet.decrypt(kb, Fernet.encrypt(kb, s.getBytes("UTF-8"))), "UTF-8") == s)
    }
  }

  test("Jaccard: bounded [0,1], symmetric, 1 on self") {
    val setGen = Gen.nonEmptyListOf(Gen.choose(1, 20)).map(_.distinct.map(_.toString))
    samples(Gen.zip(setGen, setGen), 15).foreach { case (xs, ys) =>
      val df = Seq((xs, ys)).toDF("a", "b")
      val j1 = df.select(Dedup.jaccard($"a", $"b")).head().getDouble(0)
      val j2 = df.select(Dedup.jaccard($"b", $"a")).head().getDouble(0)
      assert(j1 >= 0.0 && j1 <= 1.0)
      assert(math.abs(j1 - j2) < 1e-12)
      val self = df.select(Dedup.jaccard($"a", $"a")).head().getDouble(0)
      assert(self == 1.0)
    }
  }
}
