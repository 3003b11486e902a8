package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Hand-computed BM25 (k1=1.25, b=0.75) for a 4-doc corpus:
  //   d1 "cat dog"      d2 "cat cat fish"   d3 "dog dog dog dog"   d4 "bird"
  // N=4, sum_dl=10, avgdl=2.5. Query {cat, fish}:
  //   df(cat)=2, df(fish)=1
  //   idf(cat)=ln((4-2+0.5)/(2+0.5)+1)=ln(2)        idf(fish)=ln((4-1+0.5)/(1+0.5)+1)=ln(10/3)
  //   d1: tf(cat)=1, dl=2 -> tfn=1*2.25/(1+1.25*(0.25+0.75*2/2.5))=2.25/2.0625
  //   d2: tf(cat)=2, dl=3 -> tfn=2*2.25/(2+1.25*(0.25+0.75*3/2.5))=4.5/3.4375
  //       tf(fish)=1      -> tfn=2.25/2.4375
  private def q(x: Double): Long = math.floor(1e6 * x).toLong
  private val idfCat = math.log(2.5 / 2.5 + 1.0)
  private val idfFish = math.log(3.5 / 1.5 + 1.0)

  test("bm25TopK: hand-computed scores, per-term quantization, tie-break and k bound") {
    val docs = Seq((1L, "cat dog"), (2L, "cat cat fish"), (3L, "dog dog dog dog"), (4L, "bird"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cat", "fish"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val d1 = q(idfCat) * q(1.0 * 2.25 / (1.0 + 1.25 * (0.25 + 0.75 * 2.0 / 2.5)))
    val d2cat = q(idfCat) * q(2.0 * 2.25 / (2.0 + 1.25 * (0.25 + 0.75 * 3.0 / 2.5)))
    val d2fish = q(idfFish) * q(1.0 * 2.25 / (1.0 + 1.25 * (0.25 + 0.75 * 3.0 / 2.5)))
    // d2 matches both terms and outranks d1; d3/d4 match nothing and are absent
    assert(out.toSeq == Seq((2L, d2cat + d2fish, 2L), (1L, d1, 1L)))
  }

  test("bm25TopK: k truncates with deterministic doc_id tie-break") {
    // 5 identical docs -> identical scores; k=3 must keep the 3 lowest ids
    val docs = (1L to 5L).map(i => (i, "cat")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 3).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("bm25TopK: top-k is TakeOrderedAndProject, not a global sort") {
    val docs = Seq((1L, "cat")).toDF("doc_id", "text")
    val plan = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected bounded top-k, got:\n$plan")
  }
}
