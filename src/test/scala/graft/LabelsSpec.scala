package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Labels

/** Label aggregation: consensus with the deterministic tie-break, and
  * the annotator audit against it.
  */
class LabelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val votes = Seq(
    // item 1: clear majority b (3 of 5)
    (1L, 0, "b"), (1L, 1, "b"), (1L, 2, "b"), (1L, 3, "a"), (1L, 4, "c"),
    // item 2: 2-2 tie between a and c -> lexicographic winner a
    (2L, 0, "c"), (2L, 1, "a"), (2L, 2, "c"), (2L, 3, "a"),
    // item 3: single vote
    (3L, 4, "z")
  ).toDF("item", "annotator", "label")

  test("majorityVote: counts, share, and the lexicographic tie-break") {
    val got = Labels.majorityVote(votes, "item", "label")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == (("b", 3L, 5L, 6000L)))
    assert(got(2L) == (("a", 2L, 4L, 5000L)), "ties must break to the smallest label")
    assert(got(3L) == (("z", 1L, 1L, 10000L)))
  }

  test("dawidSkene beats majority vote on a planted systematic-error corpus") {
    // the q189 fixture shape: 5 annotators, annotator j errs on j/10 of
    // items, and EVERY error is the same junk label 'zz' — so items
    // where >=3 erring annotators collide get a WRONG majority, while
    // per-label confusion weighting collapses 'zz' precision to ~0 and
    // flips them back. Hash-deterministic, no RNG.
    import org.apache.spark.sql.functions._
    val truth = (0L until 500L).map(i => (i, s"l${(i % 3).toInt}")).toDF("item", "truth")
    val votes = truth
      .withColumn("annotator", explode(expr("sequence(0, 4)")))
      .withColumn("label",
        when(pmod(graft.plans.HashExpressions.md5Prefix60(
          concat(lit("an:"), col("annotator").cast("string"), lit(":"), col("item").cast("string"))),
          lit(10L)) < col("annotator"), lit("zz")).otherwise(col("truth")))
      .select(col("item"), col("annotator"), col("label"))
    val refined = Labels.dawidSkene(votes, "item", "annotator", "label", iters = 2)
      .join(truth, "item")
    val (majErr, dsErr) = refined
      .agg(
        sum(when(col("maj_label") =!= col("truth"), 1L).otherwise(0L)),
        sum(when(col("ds_label") =!= col("truth"), 1L).otherwise(0L)))
      .as[(Long, Long)].head()
    assert(majErr > 0, "fixture must plant items the majority gets wrong")
    assert(dsErr < majErr, s"EM must beat majority: maj=$majErr ds=$dsErr")
    assert(dsErr === 0L, s"per-label confusion weighting should fix every zz collision here, ds=$dsErr")
  }

  test("dawidSkene is the identity when every annotator is perfect") {
    val clean = (0L until 50L).flatMap(i => (0 until 3).map(a => (i, a, s"l${i % 4}")))
      .toDF("item", "annotator", "label")
    val out = Labels.dawidSkene(clean, "item", "annotator", "label").collect()
    assert(out.length === 50)
    assert(out.forall(r => r.getAs[String]("maj_label") === r.getAs[String]("ds_label")))
    // all three votes carry full e4 weight
    assert(out.forall(r => r.getAs[Long]("ds_score_e4") === 30000L))
  }

  test("annotatorAgreement: agreement with the consensus, per annotator") {
    val got = Labels.annotatorAgreement(votes, "item", "annotator", "label")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0) == ((2L, 1L, 5000L)), "annotator 0: b on item1 (agree), c on item2 (disagree)")
    assert(got(1) == ((2L, 2L, 10000L)), "annotator 1: b and a, both consensus")
    assert(got(3) == ((2L, 1L, 5000L)), "annotator 3: a on item1 (no), a on item2 (yes)")
    assert(got(4) == ((2L, 1L, 5000L)), "annotator 4: c on item1 (no), z on item3 (yes)")
  }
}
