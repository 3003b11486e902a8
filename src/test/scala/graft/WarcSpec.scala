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
