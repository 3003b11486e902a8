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

  test("rrfFuse: exact quantized contributions, partial membership, tie-break") {
    import org.apache.spark.sql.functions._
    // sys A ranks: d1=1 d2=2; sys B ranks: d2=1 d3=2
    val a = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val b = Seq((2L, 1L), (3L, 2L)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
    def c(rank: Long) = math.floor(1e9 / (60.0 + rank)).toLong
    // d2: both systems (ranks 2,1) beats d1 (rank 1 in A only)
    assert(out.toSeq == Seq(
      (2L, c(2) + c(1), 2L, 2L, 1L),
      (1L, c(1), 1L, 1L, -1L),
      (3L, c(2), 1L, -1L, 2L)))
  }

  test("hybridTopK: fused ranking over the sf0.001 corpus is consistent and bounded") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.IO.table(spark, dir, "documents")
    val vecs = graft.sources.IO.table(spark, dir, "embeddings")
    val out = Retrieval.hybridTopK(docs, "doc_id", "text", Seq("vector", "merge", "stream"),
      vecs, "vec_id", "embedding", queryVecId = 0L, k = 10, depth = 20)
    val rows = out.collect()
    assert(rows.length == 10)
    // fused score strictly ordered desc with id asc tie-break
    val scores = rows.map(r => (r.getLong(1), r.getLong(0)))
    assert(scores.sameElements(scores.sortBy(s => (-s._1, s._2))))
    // the probe vector itself never surfaces on the semantic side
    assert(rows.forall(r => r.isNullAt(4) || r.getLong(0) != 0L))
    // every rank respects the retrieval depth
    assert(rows.forall(r => (r.isNullAt(3) || r.getLong(3) <= 20) && (r.isNullAt(4) || r.getLong(4) <= 20)))
    intercept[IllegalArgumentException] {
      Retrieval.hybridTopK(docs, "doc_id", "text", Seq("x"), vecs, "vec_id", "embedding", 0L, k = 30, depth = 20)
    }
  }

  test("bm25TopKBatch: every query's slice equals its standalone bm25TopK run") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.IO.table(spark, dir, "documents")
    val querySets = Map(
      0L -> Seq("vector", "merge", "stream"),
      1L -> Seq("join", "hash", "row"),
      2L -> Seq("window", "spark", "filter"))
    val queries = querySets.toSeq.flatMap { case (qid, ts) => ts.map(qid -> _) }.toDF("query_id", "term")
    val batch = Retrieval.bm25TopKBatch(docs, "doc_id", "text", queries, "query_id", "term", k = 25)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getLong(4)).map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      }
    querySets.foreach { case (qid, terms) =>
      val single = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batch(qid) == single, s"query $qid batch/single divergence")
    }
  }

  test("bm25TopKBatch: union-term filtering cannot shift df — a query unaffected by others' terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat fish cat"),
      (2L, "cat dog"),
      (3L, "fish bird dog")
    ).toDF("doc_id", "text")
    // query 0 alone vs query 0 batched next to a query whose terms overlap
    // different docs: rows for query 0 must be identical
    val alone = Retrieval.bm25TopKBatch(docs, "doc_id", "text",
      Seq((0L, "cat"), (0L, "fish")).toDF("query_id", "term"), "query_id", "term", k = 10)
      .filter($"query_id" === 0L).collect().map(_.toSeq).toSet
    val batched = Retrieval.bm25TopKBatch(docs, "doc_id", "text",
      Seq((0L, "cat"), (0L, "fish"), (7L, "dog"), (7L, "bird")).toDF("query_id", "term"), "query_id", "term", k = 10)
      .filter($"query_id" === 0L).collect().map(_.toSeq).toSet
    assert(alone == batched && alone.nonEmpty)
  }

  test("persisted index: probe equals direct bm25TopK; reads prune to the probe terms' buckets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat dog"), (2L, "cat cat fish"), (3L, "dog dog dog dog"),
      (4L, "bird"), (5L, "fish cat bird"), (6L, "dog fish")
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft-bm25idx").toString + "/idx"
    Retrieval.writeBm25Index(docs, "doc_id", "text", idx, nBuckets = 8)

    val terms = Seq("cat", "fish")
    val probe = Retrieval.probeBm25Index(spark, idx, terms, k = 10)
    val direct = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 10)
    assert(probe.collect().map(_.toSeq).toSeq == direct.collect().map(_.toSeq).toSeq)

    // disk-level pruning: the probe's postings scan must carry a bucket
    // partition filter, and the pruned read must touch fewer partition
    // dirs than the index has non-empty buckets
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), s"no partition filter in:\n$plan")
    val allBuckets = new java.io.File(s"$idx/postings").listFiles().count(_.getName.startsWith("bucket="))
    val probedBuckets = terms.map(t => graft.plans.Md5Prefix60.hash(t.getBytes("UTF-8")) % 8).distinct.size
    assert(probedBuckets < allBuckets, "fixture degenerate: probe covers every bucket")
  }
}
