package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}
import graft.plans.{MinHashAgg, MinHashUnionAgg}

class AggExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MinHashUnionAgg: group signature == signature of the union set") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val sigs = docs
      .select(col("source"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("sh", TextAnalysis.wordShinglesFromTokens(col("toks"), 3))
      .select(col("source"), array_distinct(transform(col("sh"), Dedup.shingleHash64 _)).as("hashes"))
      .filter(size(col("hashes")) > 0)
      .withColumn("sig", Dedup.minhashSignatureFromHashes(col("hashes"), 16))

    val agg = new MinHashUnionAgg(16).toColumn
    val grouped = sigs
      .select(col("source"), col("sig").as("value"))
      .as[(String, Seq[Long])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("gsig"))
      .collect()
      .toMap

    // ground truth: signature of the flattened union of each group's shingles
    val truth = sigs
      .groupBy("source")
      .agg(array_distinct(flatten(collect_list(col("hashes")))).as("all"))
      .withColumn("tsig", Dedup.minhashSignatureFromHashes(col("all"), 16))
      .select("source", "tsig")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap

    truth.foreach { case (src, tsig) => assert(grouped(src) == tsig, s"group $src") }
  }

  test("MinHashUnionAgg: null signatures (empty docs) are skipped, not NPE") {
    // MinHashSig yields NULL for empty shingle arrays; a group containing
    // one must aggregate to the signature of its non-null members
    val rows = Seq(
      ("g", Some(Seq(5L, 7L, 9L))),
      ("g", None: Option[Seq[Long]]),
      ("g", Some(Seq(6L, 3L, 11L)))
    ).toDF("k", "sig")
    val agg = new MinHashUnionAgg(3).toColumn
    val out = rows
      .as[(String, Option[Seq[Long]])]
      .map { case (k, s) => (k, s.orNull) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("gsig"))
      .collect()
      .toMap
    assert(out("g") == Seq(5L, 3L, 9L))
  }

  test("estimatedJaccard of identical signatures is 1, disjoint ~0") {
    assert(MinHashAgg.estimatedJaccard(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 1.0)
    assert(MinHashAgg.estimatedJaccard(Seq(1L, 2L), Seq(9L, 8L)) == 0.0)
  }

  test("GraftExtensions injects dot_product for pure-SQL sessions") {
    import org.apache.spark.sql.SparkSession
    val prev = TestSpark.spark // ensure the context exists
    // getOrCreate returns the active session (ignoring extensions) unless we
    // clear it; the new session shares the SparkContext but gets our
    // extensions applied
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession
        .builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
      assert(r.getDouble(0) == 11.0)
      // the whole native-function family is SQL-reachable
      val h = s2.sql("SELECT md5_prefix60('abc') AS h").head().getLong(0)
      assert(h == java.lang.Long.parseLong("900150983cd24fb", 16)) // first 15 hex digits of md5('abc')
      val nfc = s2.sql("SELECT unicode_normalize('café', 'NFC') AS s").head().getString(0)
      assert(nfc == "café")
      val sig = s2.sql("SELECT minhash_sig(array(5L, 42L), 4) AS s").head().getSeq[Long](0)
      assert(sig.length == 4 && sig.forall(_ >= 0))
      // simhash60/shingle_hash60 match their Column-API twins exactly
      val sk = s2.sql("SELECT simhash60(array('quick', 'brown', 'fox')) AS sk").head().getLong(0)
      val skCol = Seq(Seq("quick", "brown", "fox")).toDF("t").select(graft.plans.HashExpressions.simhash60(org.apache.spark.sql.functions.col("t"))).head().getLong(0)
      assert(sk == skCol && sk >= 0 && sk < (1L << 60))
      val shn = s2.sql("SELECT shingle_hash60(array('a','b','c','d'), 3) AS sh").head().getSeq[Long](0)
      assert(shn.length == 2) // 4 tokens, 3-shingles -> 2 hashes
      // 'the' and 'table' are whole-word merges in the fixture vocab
      assert(s2.sql("SELECT bpe_tokens('the table') AS n").head().getLong(0) == 2L)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("TopKByScoreAgg: equals the window formulation; merge of partials is lossless") {
    import graft.plans.TopKByScoreAgg
    val agg = new TopKByScoreAgg(3)
    // direct semantics on hand data: ties break by ascending id
    val rows = Seq((10L, 5L), (10L, 2L), (7L, 1L), (10L, 9L), (12L, 4L), (3L, 8L))
    val folded = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(folded) == Seq((1L, 4L, 12L), (2L, 2L, 10L), (3L, 5L, 10L)))
    // merge = top-k of the union, for every split point
    (0 to rows.size).foreach { cut =>
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == agg.finish(folded), s"split at $cut diverged")
    }
    // distributed run over many partitions == row_number window + filter
    val data = (1L to 2000L).map(i => (i % 17, (i * 37) % 101, i)) // (group, score, id)
    val df = spark.createDataset(data).repartition(13).toDF("g", "s", "id")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val viaWindow = df
      .withColumn("rk", row_number().over(Window.partitionBy($"g").orderBy($"s".desc, $"id".asc)).cast("long"))
      .filter($"rk" <= 3).select($"g", $"rk", $"id", $"s")
      .collect().map(_.toSeq).toSet
    val viaAgg = spark.createDataset(data).repartition(13)
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn)
      .flatMap { case (g, ranked) => ranked.map { case (rk, id, s) => (g, rk, id, s) } }
      .collect().map(t => Seq(t._1, t._2, t._3, t._4)).toSet
    assert(viaAgg == viaWindow)
  }
}
