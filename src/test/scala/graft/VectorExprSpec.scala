package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.plans.VectorExpressions

/** Codegen'd DotProduct must be bit-identical to the HOF fold (same
  * index-ascending accumulation), across float/double inputs.
  */
class VectorExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dotNative == HOF fold, bit-exact, on real float embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" === 7).select($"embedding").head().getSeq[Float](0)
    val qc = array(q.map(v => lit(v.toDouble)): _*)
    val cmp = emb.select(
      VectorExpressions.dotNative($"embedding", qc).as("native"),
      Similarity.dotHof($"embedding", qc).as("hof")
    ).collect()
    cmp.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) == java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dotNative on double arrays and known values") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(VectorExpressions.dotNative($"a", $"b")).head().getDouble(0) == 32.0)
  }

  test("Md5Prefix60 == conv(substr(md5)) formulation, on real shingles") {
    import graft.operators.{Dedup, TextAnalysis}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val sh = docs
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(explode(TextAnalysis.wordShinglesFromTokens(col("toks"), 3)).as("s"))
    val cmp = sh.select(Dedup.shingleHash64(col("s")).as("native"), Dedup.shingleHash64Hof(col("s")).as("hof")).collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("MinHashSig == HOF signature formulation") {
    import graft.operators.Dedup
    val df = Seq(Seq(5L, 123456789L, -42L, Long.MinValue + 7, 999999999999L)).toDF("hs")
    val a = df.select(Dedup.minhashSignatureFromHashes(col("hs"), 16)).head().getSeq[Long](0)
    val b = df.select(Dedup.minhashSignatureFromHashesHof(col("hs"), 16)).head().getSeq[Long](0)
    assert(a == b)
  }

  test("MinHashSig degenerate inputs: empty array yields NULL (documented HOF divergence)") {
    import graft.operators.Dedup
    val empty = Seq(Seq.empty[Long]).toDF("hs")
    // codegen expression: signature of nothing is NULL
    assert(empty.select(Dedup.minhashSignatureFromHashes(col("hs"), 4)).head().isNullAt(0))
    // HOF formulation: array of NULL elements — the divergence the scaladoc
    // narrows its identity claim around (all callers filter size > 0 first)
    val hof = empty.select(Dedup.minhashSignatureFromHashesHof(col("hs"), 4)).head().getSeq[Any](0)
    assert(hof.length == 4 && hof.forall(_ == null))
  }

  test("LshBuckets fused expression == per-table lshBucket formulation, bit for bit") {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val fused = emb
      .select($"vec_id", VectorExpressions.lshBucketsNative($"embedding", 64, 5, 8).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val perTable = emb
      .select($"vec_id" +: (0 until 8).map(t => Similarity.lshBucketPerBit($"embedding", 64, 5, t).as(s"b$t")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong(_)).toSeq).toMap
    assert(fused.keySet == perTable.keySet)
    fused.foreach { case (id, bs) => assert(bs == perTable(id), s"vec $id") }
  }

  test("ShingleHash60 fused == wordShingles + Md5Prefix60 chain") {
    import graft.operators.{Dedup, TextAnalysis}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val toks = docs.select(TextAnalysis.tokens($"text").as("t"))
    val cmp = toks.select(
      graft.plans.HashExpressions.shingleHash60($"t", 3).as("fused"),
      transform(TextAnalysis.wordShinglesFromTokens($"t", 3), s => Dedup.shingleHash64(s)).as("chain")
    ).collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // short docs -> empty
    val short = Seq(Seq("one", "two")).toDF("t")
    assert(short.select(graft.plans.HashExpressions.shingleHash60($"t", 3)).head().getSeq[Long](0).isEmpty)
  }

  test("SimHash60 codegen == HOF formulation (incl. empty docs)") {
    import graft.operators.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val cmp = docs.select(Dedup.simhash60($"text").as("a"), Dedup.simhash60Hof($"text").as("b")).collect()
    assert(cmp.nonEmpty)
    cmp.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val empty = Seq("", "   ").toDF("text")
    empty.select(Dedup.simhash60($"text")).collect().foreach(r => assert(r.getLong(0) == 0L))
  }

  test("null array yields null; SQL registration works") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(VectorExpressions.dotNative($"a", $"b")).head()
    assert(r.isNullAt(0))
    VectorExpressions.register(spark)
    df.createOrReplaceTempView("vex")
    assert(spark.sql("SELECT dot_product(a, a) FROM vex").head().getDouble(0) == 5.0)
  }
}
