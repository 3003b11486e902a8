package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dq.Anonymize

/** Full-domain k-anonymity: level selection, the published privacy
  * witness, and the coarsest-level fallback.
  */
class AnonymizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 groups at the fine level: (1,A)x2, (1,B)x3, (2,B)x4
  private lazy val df = Seq(
    (10L, 1, "A"), (11L, 1, "A"),
    (12L, 1, "B"), (13L, 1, "B"), (14L, 1, "B"),
    (15L, 2, "B"), (16L, 2, "B"), (17L, 2, "B"), (18L, 2, "B")
  ).toDF("id", "region", "seg")

  private val ladder: Seq[Anonymize.Level] = Seq(
    Seq("g_region" -> col("region").cast("long"), "g_seg" -> col("seg")),
    Seq("g_region" -> col("region").cast("long"), "g_seg" -> lit("*")),
    Seq("g_region" -> lit(-1L), "g_seg" -> lit("*"))
  )

  test("chooseLevel: least-general level whose smallest group reaches k") {
    assert(Anonymize.chooseLevel(df, 2L, ladder) === 0, "k=2: fine level qualifies (min group 2)")
    assert(Anonymize.chooseLevel(df, 3L, ladder) === 1, "k=3: (1,A) blocks level 0; region-only gives 5/4")
    assert(Anonymize.chooseLevel(df, 5L, ladder) === 2, "k=5: region 2 has only 4 rows")
  }

  test("coarsest level is the fallback when even it misses k") {
    assert(Anonymize.chooseLevel(df, 100L, ladder) === 2)
  }

  test("fails closed: under-k groups are suppressed, never published (and k>table yields empty)") {
    val out = Anonymize.kAnonymize(df, 100L, Seq("id"), ladder)
    assert(out.count() === 0L, "a 9-row table can never satisfy k=100 — publish nothing")
    // mixed case: at level 0 with k=3, the (1,A) pair (2 rows) must vanish
    val l0Only = ladder.take(1)
    val got = Anonymize.kAnonymize(df, 3L, Seq("id"), l0Only)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(12L, 13L, 14L, 15L, 16L, 17L, 18L), "only the >=3 groups survive suppression")
  }

  test("empty input: no NPE, empty publish") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Int, String)].toDF("id", "region", "seg")
    assert(Anonymize.chooseLevel(empty, 2L, ladder) === 2, "empty input qualifies no level; coarsest fallback")
    assert(Anonymize.kAnonymize(empty, 2L, Seq("id"), ladder).count() === 0L)
  }

  test("published rows carry the level and a group size that honors k") {
    val out = Anonymize.kAnonymize(df, 3L, Seq("id"), ladder)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3), r.getLong(4)))
    assert(out.forall(_._4 == 1), "level 1 chosen for k=3")
    assert(out.forall(_._5 >= 3L), "every published group must reach k")
    assert(out.forall(_._3 == "*"), "segment generalized away at level 1")
    assert(out.filter(_._2 == 1L).forall(_._5 == 5L) && out.filter(_._2 == 2L).forall(_._5 == 4L))
    assert(out.map(_._1).sorted.toSeq === (10L to 18L), "every row published exactly once")
  }
}
