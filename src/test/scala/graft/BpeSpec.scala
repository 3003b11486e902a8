package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.plans.Bpe

/** The codegen'd BPE tokenizer against an independent in-spec reference
  * implementation and hand-derived goldens.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent reference: same leftmost-lowest-rank merge contract,
    * written list-functionally (the shape of the DuckDB oracle), sharing
    * nothing with Bpe.encodeWord's imperative array loop.
    */
  private val ranks = Bpe.merges.zipWithIndex.map { case ((l, r), i) => (l, r) -> i }.toMap
  private def refEncode(word: String): List[String] = {
    var syms = word.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp)))
    var done = false
    while (!done && syms.length > 1) {
      val cands = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => ranks.get(p).map(r => (r, i)) }
      if (cands.isEmpty) done = true
      else {
        val (_, i) = cands.min
        syms = syms.take(i) ::: List(syms(i) + syms(i + 1)) ::: syms.drop(i + 2)
      }
    }
    syms
  }
  private def refCount(text: String): Long = {
    val m = java.util.regex.Pattern.compile(Bpe.PretokenRegex).matcher(text)
    var n = 0L
    while (m.find()) n += refEncode(m.group()).length
    n
  }

  test("goldens: whole-word merges, rank order, punctuation and digit runs") {
    assert(Bpe.encodeWord("the").toSeq == Seq("the"))
    assert(Bpe.encodeWord("window").toSeq == Seq("window"))
    assert(Bpe.encodeWord("table").toSeq == Seq("table"))
    assert(Bpe.encodeWord("query").toSeq == Seq("query"))
    // 'then': (t,h) rank 0 beats (e,n) rank 8 -> th e n, then (th,e) -> the, (the,n) absent
    assert(Bpe.encodeWord("then").toSeq == Seq("the", "n"))
    // unknown word decomposes to known subwords, leftmost-lowest-rank order
    assert(Bpe.encodeWord("zigzag").toSeq.mkString("|") == refEncode("zigzag").mkString("|"))
    // digits: (1,9) merges, (9,9) is not a merge
    assert(Bpe.countTokens("19.99") == refCount("19.99"))
    // pre-tokenization: alnum runs and punct runs count independently
    assert(Bpe.countTokens("a-b") == 3L)
    assert(Bpe.countTokens("") == 0L)
    assert(Bpe.countTokens("   ") == 0L)
  }

  test("leftmost-occurrence tie-break: one merge per step, position breaks rank ties") {
    // 'aaan': (a,n) rank 2 is the only pair in the table -> aa an; then no pair
    assert(Bpe.encodeWord("aaan").toSeq == refEncode("aaan"))
    // repeated best pair: leftmost merges first
    assert(Bpe.encodeWord("thth").toSeq == refEncode("thth"))
    assert(Bpe.encodeWord("ththe").toSeq == refEncode("ththe"))
  }

  test("astral-plane codepoints count once (codepoint symbols, not UTF-16 units)") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(Bpe.encodeWord(emoji).toSeq == Seq(emoji))
    assert(Bpe.countTokens(s"the $emoji") == 2L)
  }

  test("expression == reference on real documents; n_pre == approxBpeCount screen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = docs
      .select(
        col("doc_id"),
        col("text"),
        TextAnalysis.bpeCount(col("text")).as("n_bpe"),
        size(regexp_extract_all(col("text"), lit(Bpe.PretokenRegex), lit(0))).cast("long").as("n_pre"),
        TextAnalysis.approxBpeCount(col("text")).cast("long").as("n_approx")
      )
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) == refCount(r.getString(1)), s"doc ${r.getLong(0)}")
      assert(r.getLong(3) == r.getLong(4), s"pre-token count vs approx screen, doc ${r.getLong(0)}")
      assert(r.getLong(2) >= r.getLong(3), "BPE can never produce fewer tokens than pre-tokens")
    }
  }

  test("null text is null (q99 coalesces to '' for the oracle's 0)") {
    val df = Seq((1L, "the table"), (2L, null)).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.bpeCount(col("text")).as("n")).collect()
    assert(out.find(_.getLong(0) == 1L).get.getLong(1) == 2L)
    assert(out.find(_.getLong(0) == 2L).get.isNullAt(1))
  }
}
