package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Warc

/** WARC/1.0 parsing through both protocol layers (gzip member stream →
  * WARC framing → embedded HTTP message), plus the torn-tail sentinel
  * contract a 100 TB ingest sweep depends on.
  */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def file(gz: Boolean, bodies: Seq[String]): Array[Byte] = {
    val info = Warc.encodeRecord("warcinfo", "", -1, "software: graft\r\n")
    val resp = bodies.zipWithIndex.map { case (b, i) =>
      Warc.encodeRecord("response", s"http://x/$i", if (i % 2 == 0) 200 else 404, b)
    }
    Warc.encodeFile(info +: resp, gzipPerRecord = gz)
  }

  test("plain (uncompressed) roundtrip: both layers peeled, order preserved") {
    val recs = Warc.parseWarc(7L, file(gz = false, Seq("alpha beta", "gamma")))
    assert(recs.map(_.ok) === Seq(true, true, true))
    assert(recs.map(_.warcType) === Seq("warcinfo", "response", "response"))
    assert(recs.map(_.recIdx) === Seq(0, 1, 2))
    assert(recs(0).body === "software: graft\r\n" && recs(0).httpStatus === -1)
    assert(recs(1).targetUri === "http://x/0" && recs(1).httpStatus === 200 && recs(1).body === "alpha beta")
    assert(recs(2).httpStatus === 404 && recs(2).body === "gamma" && recs(2).bodyLen === 5L)
    assert(recs.forall(_.fileId === 7L))
  }

  test("gzip member stream parses identically to plain") {
    val plain = Warc.parseWarc(1L, file(gz = false, Seq("one two three", "four")))
    val gz = Warc.parseWarc(1L, file(gz = true, Seq("one two three", "four")))
    assert(gz === plain)
  }

  test("torn gzip tail: complete records kept, exactly one sentinel appended") {
    val full = file(gz = true, Seq("first body", "second body", "third body"))
    val recs = Warc.parseWarc(3L, full.dropRight(16))
    assert(recs.count(!_.ok) === 1)
    val sentinel = recs.last
    assert(!sentinel.ok && sentinel.recIdx === 3 && sentinel.httpStatus === -1 && sentinel.bodyLen === -1L)
    assert(recs.init.map(_.body) === Seq("software: graft\r\n", "first body", "second body"))
    assert(recs.init.forall(_.ok))
  }

  test("torn plain tail (mid-block) degrades the same way") {
    val full = file(gz = false, Seq("only body here"))
    val recs = Warc.parseWarc(5L, full.dropRight(6))
    assert(recs.map(_.ok) === Seq(true, false))
    assert(recs(1).recIdx === 1)
  }

  test("file cut inside a gzip member HEADER still surfaces the sentinel (JDK stream would swallow it)") {
    val full = file(gz = true, Seq("first body"))
    // a truncated next-member header after valid members: magic + partial
    val torn = full ++ Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0)
    val recs = Warc.parseWarc(4L, torn)
    assert(recs.count(!_.ok) === 1, s"torn header must yield a sentinel, got $recs")
    assert(recs.init.forall(_.ok) && recs.init.map(_.body) === Seq("software: graft\r\n", "first body"))
  }

  test("hostile Content-Length near Long.Max reads as torn, never kills the task") {
    val evil = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 9223372036854775800\r\n\r\nbody").getBytes("UTF-8")
    val recs = Warc.parseWarc(6L, evil)
    assert(recs.map(_.ok) === Seq(false), s"overflow length must be one sentinel, got $recs")
  }

  test("garbage bytes produce a single sentinel, empty input none") {
    val garbage = Warc.parseWarc(9L, "this is not a warc file at all".getBytes("UTF-8"))
    assert(garbage.map(_.ok) === Seq(false))
    assert(Warc.parseWarc(9L, Array.empty[Byte]) === Seq.empty)
  }

  test("multi-byte UTF-8 body: byte length counted, not chars") {
    val body = "café €" // 4+1+1 chars, 5+1+3 bytes
    val recs = Warc.parseWarc(1L, file(gz = true, Seq(body)))
    assert(recs(1).body === body && recs(1).bodyLen === body.getBytes("UTF-8").length.toLong)
  }

  private def respRaw(uri: String, bodyBytes: Array[Byte], contentType: String): Array[Byte] =
    Warc.encodeRecordRaw("response", uri, 200, bodyBytes, contentType)

  test("charset precedence: Content-Type header > meta sniff > UTF-8 default") {
    val latin = "café æø" // café æø — all Latin-1 encodable
    val file = Warc.encodeFile(Seq(
      // 1) declared in the HTTP header — wins outright
      respRaw("http://x/hdr", latin.getBytes("ISO-8859-1"), "text/html; charset=iso-8859-1"),
      // 2) no header charset, HTML meta declares it
      respRaw("http://x/meta", s"""<meta charset="iso-8859-1"><p>$latin</p>""".getBytes("ISO-8859-1"), "text/html"),
      // 3) neither — UTF-8 default
      respRaw("http://x/dflt", latin.getBytes("UTF-8"), "text/html"),
      // 4) header AND meta disagree; header wins. Bytes are UTF-8, decode
      //    is Latin-1 per the DECLARED header → deterministic mojibake
      respRaw("http://x/both", s"""<meta charset="utf-8"><p>é</p>""".getBytes("UTF-8"), "text/html; charset=ISO-8859-1"),
      // 5) unsupported charset name falls back to UTF-8, never throws
      respRaw("http://x/bogus", latin.getBytes("UTF-8"), "text/html; charset=no-such-charset-xyz")
    ), gzipPerRecord = true)
    val recs = Warc.parseWarc(1L, file)
    assert(recs.forall(_.ok))
    assert(recs(0).body === latin, "header-declared Latin-1 must decode losslessly")
    assert(recs(1).body === s"""<meta charset="iso-8859-1"><p>$latin</p>""", "meta-declared Latin-1 must decode losslessly")
    assert(recs(2).body === latin, "undeclared UTF-8 must decode as UTF-8")
    assert(recs(3).body === "<meta charset=\"utf-8\"><p>Ã©</p>",
      "header must beat meta: UTF-8 é (C3 A9) read as Latin-1 is Ã©")
    assert(recs(4).body === latin, "unsupported charset name must fall back to UTF-8")
    // bodyLen stays the UTF-8 byte length of the DECODED string
    assert(recs(0).bodyLen === latin.getBytes("UTF-8").length.toLong)
  }

  test("iterator streaming: the first record emits before the file's tail is read") {
    // incompressible filler — a constant-char body would gzip to ~200
    // bytes and one 8 KB compressed chunk read would swallow the file,
    // proving nothing about laziness
    val bodies = (0 until 5).map { i =>
      val rnd = new scala.util.Random(42 + i)
      s"body-$i " + rnd.alphanumeric.take(160000).mkString
    }
    val raw = file(gz = true, bodies)
    var consumed = 0L
    val counting = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(raw)
      override def read(): Int = { val b = in.read(); if (b != -1) consumed += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = in.read(b, off, len); if (n > 0) consumed += n; n
      }
    }
    val it = Warc.parseWarcIter(1L, counting)
    val first = it.next() // warcinfo
    val second = it.next() // first response
    assert(first.warcType === "warcinfo" && second.body.startsWith("body-0"))
    assert(consumed < raw.length / 2,
      s"parse must stream: read $consumed of ${raw.length} bytes for 2 of 6 records")
    assert(it.toList.count(_.ok) === 4) // drain: remaining responses all parse
  }

  test("decompression-bomb guard: an over-cap Content-Length degrades to the sentinel") {
    val small = Warc.encodeRecord("response", "http://x/ok", 200, "fine")
    val huge = Warc.encodeRecord("response", "http://x/bomb", 200, "z" * 3000)
    val raw = Warc.encodeFile(Seq(small, huge), gzipPerRecord = true)
    val recs = Warc.parseWarcIter(5L, new java.io.ByteArrayInputStream(raw), maxBlockBytes = 1024).toList
    assert(recs.map(_.ok) === Seq(true, false), s"over-cap record must be one sentinel: $recs")
    assert(recs(0).body === "fine" && recs(1).recIdx === 1)
  }

  test("a mid-file whale is skipped, not terminal: records after it still parse (ADVICE r13)") {
    val before = Warc.encodeRecord("response", "http://x/a", 200, "first")
    val whale = Warc.encodeRecord("response", "http://x/whale", 200, "z" * 3000)
    val after = Warc.encodeRecord("response", "http://x/b", 200, "last")
    val raw = Warc.encodeFile(Seq(before, whale, after), gzipPerRecord = true)
    val recs = Warc.parseWarcIter(6L, new java.io.ByteArrayInputStream(raw), maxBlockBytes = 1024).toList
    assert(recs.map(_.ok) === Seq(true, false, true),
      s"whale must cost exactly its own record: $recs")
    assert(recs(0).body === "first" && recs(2).body === "last")
    assert(recs.map(_.recIdx) === Seq(0, 1, 2), "record indices must stay unique past a skipped whale")
  }

  test("exhaustion closes the input (and so the Inflater) — no GC-dependent native memory") {
    var closed = false
    def mk(gz: Boolean): java.io.InputStream = {
      closed = false
      val raw = Warc.encodeFile(Seq(Warc.encodeRecord("response", "http://x/a", 200, "hi")), gzipPerRecord = gz)
      new java.io.ByteArrayInputStream(raw) { override def close(): Unit = { closed = true; super.close() } }
    }
    Warc.parseWarcIter(8L, mk(gz = true)).toList // gzip path: close must reach inf.end + in0
    assert(closed, "gzip-path input not closed on exhaustion")
    Warc.parseWarcIter(9L, mk(gz = false)).toList
    assert(closed, "plain-path input not closed on exhaustion")
    val torn = mk(gz = true)
    Warc.parseWarcIter(10L, new TruncatedStream(torn, 40)).toList // torn mid-member
    assert(closed, "torn-path input not closed")
  }

  private class TruncatedStream(in: java.io.InputStream, cap: Int) extends java.io.InputStream {
    private var n = 0
    override def read(): Int = if (n >= cap) -1 else { n += 1; in.read() }
    override def close(): Unit = in.close()
  }

  test("a LYING over-cap Content-Length (past EOF) still ends the file torn") {
    val ok = Warc.encodeRecord("response", "http://x/a", 200, "first")
    val lie = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/lie\r\n" +
      "Content-Length: 999999\r\n\r\ntruncated").getBytes("UTF-8")
    val raw = ok ++ lie
    val recs = Warc.parseWarcIter(7L, new java.io.ByteArrayInputStream(raw), maxBlockBytes = 1024).toList
    assert(recs.map(_.ok) === Seq(true, false), s"lying length = one terminal sentinel: $recs")
  }

  test("distributed readWarc: one row per record, zero shuffles") {
    import spark.implicits._
    val files = Seq(
      (0L, file(gz = true, Seq("a a a", "b b"))),
      (1L, file(gz = true, Seq("c"))),
      (2L, file(gz = true, Seq("d", "e", "f")).dropRight(16))
    ).toDF("file_id", "content")
    val out = Warc.readWarc(spark, files)
    val plan = out.toDF().queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"WARC ingest must not shuffle:\n$plan")
    val rows = out.collect()
    assert(rows.count(_.fileId == 0L) === 3 && rows.filter(_.fileId == 0L).forall(_.ok))
    assert(rows.count(_.fileId == 1L) === 2)
    assert(rows.filter(_.fileId == 2L).map(r => (r.recIdx, r.ok)).sortBy(_._1).toSeq === Seq((0, true), (1, true), (2, true), (3, false)))
  }
}
