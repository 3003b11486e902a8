package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {

  test("chunkTokens: full coverage, stride spacing, short final chunk, empty docs drop") {
    val sp = TestSpark.spark
    import sp.implicits._
    val df = Seq(
      (1L, (1 to 123).map(i => s"t$i").mkString(" ")),
      (2L, ""),
      (3L, "a b")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.chunkTokens(df, "doc_id", "text", 50, 40).collect()
    val d1 = out.filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    assert(d1.map(_.getInt(2)).toSeq == Seq(0, 40, 80, 120)) // starts advance by stride
    assert(d1.map(_.getInt(4)).toSeq == Seq(50, 50, 43, 3)) // short final chunk, no padding
    // full coverage: the union of windows is exactly [0, 123)
    val covered = d1.flatMap(r => r.getInt(2) until (r.getInt(2) + r.getInt(4))).toSet
    assert(covered == (0 until 123).toSet)
    // chunk content round-trips the token stream
    val c0 = d1.head.getSeq[String](3)
    assert(c0.head == "t1" && c0.last == "t50")
    assert(out.count(_.getLong(0) == 2L) == 0) // empty doc -> no chunks
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.length == 1 && d3.head.getInt(4) == 2) // shorter than one window
  }
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens: whitespace split, empty text -> empty array") {
    val df = Seq("a  b\tc", "", "   ", "single").toDF("text")
    val out = df.select(TextAnalysis.tokenCount($"text")).collect().map(_.getInt(0))
    assert(out.toSeq == Seq(3, 0, 0, 1))
  }

  test("bigramLmScore: hand-computed add-one bigram NLLs, quantized sums, short docs drop") {
    val df = Seq(
      (1L, "a b a b"), // bigrams (a,b)x2 (b,a)x1
      (2L, "a c"), // (a,c)x1
      (3L, "x") // no bigrams -> absent from output
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    // corpus: c(a,b)=2 c(b,a)=1 c(a,c)=1; c(a,.)=3 c(b,.)=1; V=4 (a,b,c,x)
    // p(b|a)=3/7 -> floor(1e5*0.847297...) = 84729
    // p(a|b)=2/5 -> floor(1e5*0.916290...) = 91629
    // p(c|a)=2/7 -> floor(1e5*1.252763...) = 125276
    val d1 = out(1L)
    assert(d1.getLong(1) == 3L) // n_bigrams
    assert(d1.getLong(2) == 2L * 84729L + 91629L) // sum_nll_e5 = 261087
    assert(d1.getLong(3) == 261087L / 3L) // avg_nll_e5 = 87029
    val d2 = out(2L)
    assert(d2.getLong(1) == 1L && d2.getLong(2) == 125276L && d2.getLong(3) == 125276L)
    assert(d1.getBoolean(4) && d2.getBoolean(4)) // both far below the keep threshold
  }

  test("langId scores stopword overlap with deterministic tie-break") {
    val df = Seq(
      "the cat sat on the mat with the hat",
      "el gato es un animal y la casa es grande",
      "der hund und die katze ist ein tier",
      "xyzzy plugh qwerty" // no stopwords -> und
    ).toDF("text")
    val out = df.select(TextAnalysis.langId($"text")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "es", "de", "und"))
  }

  test("fingerprint is case/punctuation/whitespace invariant") {
    val df = Seq(("Hello, World!", "hello world"), ("a b", "c d")).toDF("t1", "t2")
    val r = df.select(
      (TextAnalysis.fingerprint($"t1") === TextAnalysis.fingerprint($"t2")).as("eq")
    ).collect().map(_.getBoolean(0))
    assert(r.toSeq == Seq(true, false))
  }

  test("rollingHash is order-sensitive") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2")
    val r = df.select(TextAnalysis.rollingHash($"t1").as("h1"), TextAnalysis.rollingHash($"t2").as("h2")).head()
    assert(r.getLong(0) != r.getLong(1))
  }

  test("quality features: exact ratios on a constructed doc") {
    val df = Seq("ab cd!!").toDF("text") // 7 chars, 2 tokens, 2 punct
    val out = TextAnalysis.qualityFeatures(df).head()
    assert(out.getAs[Int]("n_tokens") == 2)
    assert(math.abs(out.getAs[Double]("avg_token_len") - 3.0) < 1e-12) // (2+4)/2 (the "cd!!" token is len 4)
    assert(math.abs(out.getAs[Double]("punct_ratio") - 2.0 / 7) < 1e-12)
  }

  test("PII redaction scrubs planted emails/phones/SSNs and counts hits") {
    val df = Seq(
      "contact john.doe+x@example.co.uk or call +1 (555) 123-4567 now",
      "ssn 123-45-6789 on file",
      "totally clean text"
    ).toDF("text")
    val out = TextAnalysis.piiCounts(df)
      .withColumn("redacted", TextAnalysis.redactPii($"text"))
      .collect()
    assert(out(0).getAs[String]("redacted") == "contact [EMAIL] or call [PHONE] now")
    assert(out(0).getAs[Int]("n_emails") == 1 && out(0).getAs[Int]("n_phones") == 1)
    assert(out(1).getAs[String]("redacted") == "ssn [SSN] on file")
    assert(out(1).getAs[Int]("n_ssns") == 1)
    assert(out(2).getAs[String]("redacted") == "totally clean text")
    assert(out(2).getAs[Int]("n_emails") + out(2).getAs[Int]("n_phones") + out(2).getAs[Int]("n_ssns") == 0)
  }

  test("unicode canonicalization: NFC unifies composed/decomposed, accent fold strips marks") {
    val composed = "caf\u00e9"   // e-acute as one codepoint
    val decomposed = "cafe\u0301" // e + combining acute
    val df = Seq((composed, decomposed)).toDF("a", "b")
    val r = df.select(
      (TextAnalysis.nfc($"a") === TextAnalysis.nfc($"b")).as("nfc_eq"),
      ($"a" === $"b").as("raw_eq"),
      TextAnalysis.stripAccents($"a").as("folded")
    ).head()
    assert(r.getBoolean(0))  // NFC-equal
    assert(!r.getBoolean(1)) // but not byte-equal raw
    assert(r.getString(2) == "cafe")
  }

  test("approxBpeCount splits words and punctuation runs") {
    val df = Seq("hello, world").toDF("text")
    assert(df.select(TextAnalysis.approxBpeCount($"text")).head().getInt(0) == 3) // hello , world
  }

  test("gopher gates: empty doc zeroes every ratio and fails the word-count gate") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQualityGates(df).collect().sortBy(_.getLong(0))
    out.foreach { r =>
      assert(r.getAs[Int]("n_words") == 0)
      assert(r.getAs[Long]("mean_word_len_e4") == 0L)
      assert(r.getAs[Long]("top_bigram_frac_e4") == 0L)
      assert(r.getAs[Long]("dup_unigram_frac_e4") == 0L)
      assert(!r.getAs[Boolean]("pass_word_count"))
      assert(!r.getAs[Boolean]("pass_gopher"))
      // zero-length denominators must not poison the repetition gate
      assert(r.getAs[Boolean]("pass_repetition"))
    }
  }

  test("gopher gates: mode-bigram tie breaks lexicographically") {
    // "x y z": bigrams "x y" and "y z" both count 1 -> tie -> "x y" wins.
    // frac = 1 * len("x y")=3 * 1e4 / len("x y z")=5 = 6000
    val df = Seq((1L, "x y z")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherQualityGates(df).head()
    assert(r.getAs[Long]("top_bigram_frac_e4") == 6000L)
    // single-token doc: no bigram at all -> left-join null -> 0, not null
    val r1 = TextAnalysis.gopherQualityGates(Seq((1L, "lonely")).toDF("doc_id", "text")).head()
    assert(r1.getAs[Long]("top_bigram_frac_e4") == 0L)
  }

  test("gopher gates: a well-formed 60-word doc passes all gates") {
    // 60 distinct 7-char words: mean len 7 in [3,10]; all bigrams distinct so
    // top frac = 15e4/479 = 313 <= 2000; dup frac 0 <= 3000; 60 in [50,1e5]
    val text = (1 to 60).map(i => f"word$i%03d").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherQualityGates(df).head()
    assert(r.getAs[Int]("n_words") == 60)
    assert(r.getAs[Long]("mean_word_len_e4") == 70000L)
    assert(r.getAs[Long]("top_bigram_frac_e4") == 313L)
    assert(r.getAs[Long]("dup_unigram_frac_e4") == 0L)
    assert(r.getAs[Boolean]("pass_gopher"))
    // repeat the same word 60 times: dup frac = 59/60 -> fails repetition,
    // and the mode bigram covers nearly the whole doc
    val rep = Seq((2L, Seq.fill(60)("abcdefg").mkString(" "))).toDF("doc_id", "text")
    val r2 = TextAnalysis.gopherQualityGates(rep).head()
    assert(r2.getAs[Long]("dup_unigram_frac_e4") == 9833L) // floor(59/60*1e4)
    assert(!r2.getAs[Boolean]("pass_repetition"))
    assert(!r2.getAs[Boolean]("pass_gopher"))
  }

  test("urlParts: host/domain/tld/path decomposition incl. ports, co.uk, bare hosts, garbage") {
    val df = Seq(
      "https://www.sub.example.com/a/b?q=1#f",
      "http://bbc.co.uk:8080/news",
      "https://host.io",
      "nonsense"
    ).toDF("url").select(TextAnalysis.urlParts($"url").as("p")).select("p.*")
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got(0) == (("www.sub.example.com", "example.com", "com", "/a/b")))
    assert(got(1) == (("bbc.co.uk", "bbc.co.uk", "uk", "/news"))) // port stripped, cc-SLD kept
    assert(got(2) == (("host.io", "host.io", "io", "/")))          // missing path -> "/"
    assert(got(3) == ((null, null, null, null)))                   // unparseable -> NULLs
  }

  test("urlParts: userinfo stripped before the port — credentials cannot masquerade as the host") {
    val df = Seq(
      "https://user@real.com/x",          // plain userinfo
      "https://a.b:pw@real.com:8080/x",   // colon in credentials AND a port
      "ftp://u:p@w@real.com/y",           // multiple @: last-@ semantics
      "https://spam.com@/x"               // EMPTY host: all credentials, no host
    ).toDF("url").select(TextAnalysis.urlParts($"url").as("p")).select("p.*")
    val got = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(got(0) == (("real.com", "real.com")))
    assert(got(1) == (("real.com", "real.com"))) // 'a.b' (the password) must NOT win
    assert(got(2) == (("real.com", "real.com")))
    // credentials must not backtrack into the host: NULL -> quarantined
    assert(got(3) == ((null, null)))
  }

  test("domainFilter: blocklist drops by registrable domain; unparseable urls quarantined") {
    val df = Seq(
      (1L, "https://keep.net/x"),
      (2L, "https://www.spam.com/y"),  // blocked via registrable domain
      (3L, "https://cdn.spam.com/z"),  // any subdomain of a blocked domain
      (4L, "garbage"),
      (5L, "https://a.b:pw@spam.com/x") // userinfo must not bypass the screen
    ).toDF("id", "url")
    val kept = TextAnalysis.domainFilter(df, "url", Seq("spam.com")).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
  }

  test("hotSpans: df counts DISTINCT docs, internal repetition ignored, short docs span-free") {
    val boiler = "all rights reserved by the"
    val docs = Seq(
      (1L, s"$boiler publisher alpha content one"),
      (2L, s"$boiler publisher beta content two"),
      (3L, s"$boiler $boiler doubled internally"), // repeats the span INSIDE one doc
      (4L, "completely unrelated text with no shared spans here"),
      (5L, "too short")                            // < n tokens -> no spans at all
    ).toDF("doc_id", "text")
    val hot = TextAnalysis.hotSpans(docs, "doc_id", "text", n = 5, minDf = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the boilerplate 5-gram appears in docs 1,2,3 -> df=3 (doc 3 counted ONCE)
    assert(hot.contains((boiler, 3L, 1L)))
    // nothing else reaches df=3
    assert(hot.forall(_._1 == boiler))
    // minDf=2 additionally surfaces the "rights reserved by the publisher"
    // continuation shared by docs 1 and 2 only
    val hot2 = TextAnalysis.hotSpans(docs, "doc_id", "text", n = 5, minDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(hot2("rights reserved by the publisher") == 2L)
  }

  test("hotSpansHashed: result-identical to the string-keyed twin on a real corpus slice") {
    val docs = graft.sources.IO.table(spark, "/root/testdata/sf0.001", "documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val string = rows(TextAnalysis.hotSpans(docs, "doc_id", "text", n = 5, minDf = 2))
    val hashed = rows(TextAnalysis.hotSpansHashed(docs, "doc_id", "text", n = 5, minDf = 2))
    assert(string.nonEmpty, "fixture produced no hot spans — twin check is vacuous")
    assert(hashed == string)
  }

  test("heavyHittersCms: exact top-k ordering, CMS bound holds on every row, determinism across runs") {
    val docs = Seq(
      (1L, "a a a a b b b c c d"),
      (2L, "a a b c d e"),
      (3L, "a b f")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.heavyHittersCms(docs, "doc_id", "text", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // exact counts: a=7 b=5 c=3 d=2 e=1 f=1; top-4 in (cnt desc, token asc) order
    assert(out.map(t => (t._1, t._2)).toSeq == Seq(("a", 7L), ("b", 5L), ("c", 3L), ("d", 2L)))
    assert(out.forall(_._3), "CMS bound must hold under the fixed seed")
    val again = TextAnalysis.heavyHittersCms(docs, "doc_id", "text", k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(again.toSeq == out.toSeq, "fixed-seed sketch must be deterministic")
    intercept[IllegalArgumentException] { TextAnalysis.heavyHittersCms(docs, "doc_id", "text", k = 0) }
  }

  test("trainBpeMerges: hand-traced merges, overlap counting, left-to-right application") {
    import spark.implicits._
    // words: aaaa x1, ab x2 -> pairs: (a,a)=3 (overlapping positions), (a,b)=2
    val docs = Seq((1L, "aaaa ab"), (2L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.trainBpeMerges(docs, "text", nMerges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // step 1: (a,a) count 3; apply -> aaaa = [aa, aa], ab untouched
    // step 2: (aa,aa) ties (a,b) at 2? (a,b)=2, (aa,aa)=1 -> (a,b) wins
    // step 3: (aa,aa) count 1
    assert(out.toSeq == Seq((1L, "a", "a", 3L), (2L, "a", "b", 2L), (3L, "aa", "aa", 1L)))
    // early exhaustion: once everything is one symbol, training stops
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    val ex = TextAnalysis.trainBpeMerges(tiny, "text", nMerges = 5).collect()
    assert(ex.length == 1 && ex(0).getString(1) == "a" && ex(0).getString(2) == "b")
  }

  test("applyMergeOnce: non-overlapping left-to-right scan") {
    assert(TextAnalysis.applyMergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(TextAnalysis.applyMergeOnce(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(TextAnalysis.applyMergeOnce(Seq("x"), "a", "b") == Seq("x"))
  }

  test("repetitionSignals: hand-computed top/dup masses, empty doc, tie->longest rule") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),                 // top-gram family
      (2L, "p q r s t p q r s t"),     // duplicated 5-gram
      (3L, "")                         // empty -> all zero, passes
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(10)))
      .sortBy(_._1)
    // doc 1: norm = 4+3 = 7; g2 = [a a, a a, a b] -> top count 2, mass 2*3=6
    //   -> floor(60000/7) = 8571; g3 both count 1, len 5 -> 5 -> 7142;
    //   g4 = [a a a b] mass 7 -> 10000; dup5 empty -> 0. Fails thresholds.
    assert(out(0) == (1L, 8571L, 7142L, 10000L, 0L, false))
    // doc 2: norm = 10+9 = 19; g5 has 6 grams of 9 chars, 5 distinct
    //   -> dup mass 9 -> floor(90000/19) = 4736
    assert(out(1)._5 == 4736L && !out(1)._6)
    // doc 3: zero denominator -> all zero fractions, every gate passes
    assert(out(2) == (3L, 0L, 0L, 0L, 0L, true))
  }

  test("hashedLinearScore: plain-Scala replay, bigram features, empty doc, non-pow2 rejected") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta alpha"), (2L, ""), (3L, "solo")).toDF("doc_id", "text")
    def w(s: String): Long =
      ((graft.plans.Md5Prefix60.hash(s.getBytes("UTF-8")) % 4096L) * 2654435761L) % 2001L - 1000L
    def expected(feats: Seq[String]): (Long, Long) = {
      val sum = feats.map(w).sum
      (feats.size.toLong, if (feats.isEmpty) 0L else math.floor(sum * 10000.0 / feats.size).toLong)
    }
    val e1 = expected(Seq("alpha", "beta", "alpha", "alpha beta", "beta alpha"))
    val e3 = expected(Seq("solo"))
    val out = TextAnalysis.hashedLinearScore(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sortBy(_._1)
    assert(out(0) == (1L, e1._1, e1._2, e1._2 >= 0L))
    assert(out(1) == (2L, 0L, 0L, false), "empty doc scores 0 and is dropped")
    assert(out(2) == (3L, e3._1, e3._2, e3._2 >= 0L))
    intercept[IllegalArgumentException] { TextAnalysis.hashedLinearScore(docs, buckets = 1000) }
  }

  test("collocationsByLift: hand-computed lift, minCount prune, short docs contribute no bigrams") {
    import spark.implicits._
    // uni: a=3 b=2 c=1 x=1 (N=7 — the short doc still counts as a
    // unigram); bigrams: (a,b)x2, (b,a), (a,c) (N=4) — no bigram from "x"
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.collocationsByLift(docs, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // lift(a,b) = (2 * 7 * 7) / (4 * 3 * 2) = 4.08333...
    assert(out.toSeq == Seq(("a", "b", 2L, 4083333L)))
  }

  test("trainHashedLinear: learned weights separate the classes, stay stable, and training is deterministic") {
    import spark.implicits._
    val docs = ((1 to 10).map(i => (i.toLong, "alpha beta gamma", 1L)) ++
      (11 to 20).map(i => (i.toLong, "xe ye ze", 0L))).toDF("doc_id", "text", "label")
    def train() = TextAnalysis.trainHashedLinear(docs, "label", iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w1 = train()
    assert(w1 == train(), "fixed-point training must be bit-deterministic across runs")

    def bucketsOf(feats: Seq[String]): Seq[Long] = feats.toDF("f")
      .select((graft.plans.HashExpressions.md5Prefix60($"f") % 4096).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    val aScore = bucketsOf(Seq("alpha", "beta", "gamma", "alpha beta", "beta gamma"))
      .map(w1.getOrElse(_, 0L)).sum
    val bScore = bucketsOf(Seq("xe", "ye", "ze", "xe ye", "ye ze"))
      .map(w1.getOrElse(_, 0L)).sum
    // label-1 docs' prediction moves toward the 1e6 target without
    // overshooting (the lrDen stability bound); label-0 docs start at the
    // target, so their error — and hence their buckets' weights — stay 0
    assert(aScore > 0L && aScore <= 1000000L, s"positive-class score $aScore")
    assert(bScore == 0L, s"negative-class buckets must be untouched, got $bScore")

    // more iterations monotonically close the remaining gap
    val w8 = TextAnalysis.trainHashedLinear(docs, "label", iters = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val aScore8 = bucketsOf(Seq("alpha", "beta", "gamma", "alpha beta", "beta gamma"))
      .map(w8.getOrElse(_, 0L)).sum
    assert(aScore8 > aScore && aScore8 <= 1000000L, s"iters=8 score $aScore8 vs iters=4 $aScore")
  }

  test("datasetCard: hand-computed counts, dup rate from normalized fingerprints, e4 integer shares") {
    import spark.implicits._
    val docs = Seq(
      // s1: 4 docs, "A b!" and "a b" normalize identically (dup), 2 en,
      // one long doc passes the [100, 20000]-char gate
      ("s1", "en", "A b!", 4L), ("s1", "en", "a b", 3L),
      ("s1", "de", "etwas anderes", 13L), ("s1", "zh", "x " * 60 + "y", 121L),
      // s2: 1 doc, no dups, not en, too short for the gate
      ("s2", "fr", "petit", 5L)
    ).toDF("source", "lang", "text", "n_chars")
    val got = TextAnalysis.datasetCard(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    // s1: tokens 2+2+2+61 = 67; distinct fp 3 of 4; en 2/4 = 5000e4;
    // dup (4-3)/4 = 2500e4; quality 1/4 = 2500e4
    assert(got("s1") == ((4L, 67L, 3L, 3L, 5000L, 2500L, 2500L)), s"s1: ${got("s1")}")
    assert(got("s2") == ((1L, 1L, 1L, 1L, 0L, 0L, 0L)), s"s2: ${got("s2")}")
  }

  test("lineDedup: boilerplate lines stripped everywhere, order preserved, within-doc repeats counted") {
    import spark.implicits._
    // "cookie banner" appears 3x corpus-wide (twice in doc 1 — within-doc
    // occurrences count); "unique one/two/three" appear once each
    val docs = Seq(
      (1L, "cookie banner\nunique one\ncookie banner"),
      (2L, "unique two\ncookie banner"),
      (3L, "unique three")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs, "doc_id", "text", maxDf = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((3L, 1L, 2L, "unique one")), s"doc1: ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 1L, "unique two")), s"doc2: ${got(2L)}")
    assert(got(3L) == ((1L, 1L, 0L, "unique three")), s"doc3: ${got(3L)}")
  }

  test("lineDedup: a fully-boilerplate document survives as an empty row, not a dropped one") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same\nsame"),
      (2L, "same\nkeep me")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs, "doc_id", "text", maxDf = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((2L, 0L, 2L, "")), s"doc1: ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 1L, "keep me")), s"doc2: ${got(2L)}")
  }

  test("spanCorrupt: independent plain-Scala replay — masking, sentinel numbering, both sequences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k"), // 11 tokens -> 4 spans (last short)
      (2L, "solo")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.spanCorrupt(docs, "doc_id", "text", seed = "tst", rateE4 = 5000L, spanLen = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    // replay the exact contract in plain Scala
    def replay(id: Long, text: String): (Long, Long, String, String) = {
      val ws = text.split("\\s+").toSeq
      val spans = ws.grouped(3).map(_.mkString(" ")).toSeq
      val masked = spans.indices.map { sp =>
        Math.floorMod(graft.plans.Md5Prefix60.hash(s"tst:$id:$sp".getBytes("UTF-8")), 10000L) < 5000L
      }
      var k = -1L
      val (inP, tgP) = spans.indices.map { sp =>
        if (masked(sp)) { k += 1; (s"<extra_id_$k>", Some(s"<extra_id_$k> ${spans(sp)}")) }
        else (spans(sp), None)
      }.unzip
      (spans.length.toLong, masked.count(identity).toLong, inP.mkString(" "), tgP.flatten.mkString(" "))
    }
    assert(got(1L) == replay(1L, "a b c d e f g h i j k"), s"doc1: ${got(1L)}")
    assert(got(2L) == replay(2L, "solo"), s"doc2: ${got(2L)}")
    // sanity: the fixture actually exercises both branches somewhere
    assert(got.values.map(_._2).sum > 0, "at least one span masked")
    assert(got.values.exists(v => v._1 > v._2), "at least one span kept")
  }

  test("spanCorrupt: same seed bit-identical across partitionings; new seed re-masks") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"w$i x$i y$i z$i a b c d e")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame, seed: String) =
      TextAnalysis.spanCorrupt(d, "doc_id", "text", seed, 3000L, 3)
        .collect().map(r => (r.getLong(0), r.getString(3), r.getString(4))).sortBy(_._1).toSeq
    assert(run(docs.repartition(7), "s") === run(docs.repartition(2), "s"))
    assert(run(docs, "s") !== run(docs, "s2"))
  }

  test("lineDedup: maxDf at the boundary keeps lines occurring exactly maxDf times") {
    import spark.implicits._
    val docs = Seq((1L, "twice\na"), (2L, "twice\nb")).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs, "doc_id", "text", maxDf = 2L)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(got(1L) == "twice\na" && got(2L) == "twice\nb")
  }
}
