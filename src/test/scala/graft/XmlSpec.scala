package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Xml

/** StAX XML ingestion: real entity decode, CDATA, missing fields, the
  * torn-tail sentinel contract, and XXE hardening.
  */
class XmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def doc(body: String) = s"""<?xml version="1.0"?><corpus>$body</corpus>""".getBytes("UTF-8")

  test("records parse with entity decode and CDATA; missing fields are absent") {
    val xml = doc(
      "<doc><id>1</id><note>a &amp; b &lt;tag&gt;</note></doc>" +
        "<doc><id>2</id><note><![CDATA[raw & <unescaped>]]></note><extra>x</extra></doc>" +
        "<doc><id>3</id></doc>")
    val (recs, torn) = Xml.parseRecords(xml, "doc")
    assert(!torn && recs.length === 3)
    assert(recs(0) === Map("id" -> "1", "note" -> "a & b <tag>"))
    assert(recs(1)("note") === "raw & <unescaped>" && recs(1)("extra") === "x")
    assert(recs(2) === Map("id" -> "3"))
  }

  test("torn tail: complete records kept, torn flag set") {
    val full = doc("<doc><id>1</id><v>aa</v></doc><doc><id>2</id><v>bb</v></doc>")
    val (recs, torn) = Xml.parseRecords(full.dropRight(15), "doc")
    assert(torn && recs.length === 1 && recs(0)("id") === "1")
  }

  test("garbage input yields zero records, torn; empty is clean") {
    val (g, gt) = Xml.parseRecords("not xml at all".getBytes("UTF-8"), "doc")
    assert(g.isEmpty && gt)
    // an empty byte array is not a well-formed document either — torn, no phantom rows
    val (e, et) = Xml.parseRecords(Array.empty[Byte], "doc")
    assert(e.isEmpty && et)
  }

  test("XXE/DTD is refused: a doctype with an external entity never resolves") {
    val evil = ("""<?xml version="1.0"?><!DOCTYPE corpus [<!ENTITY xxe SYSTEM "file:///etc/hostname">]>""" +
      """<corpus><doc><id>&xxe;</id></doc></corpus>""").getBytes("UTF-8")
    val (recs, torn) = Xml.parseRecords(evil, "doc")
    // with DTD support off the parse fails closed: no record may carry file contents
    assert(recs.forall(m => !m.get("id").exists(_.nonEmpty)) || torn)
  }

  test("distributed readXml: rows per record, sentinel for torn files, null for absent fields") {
    import spark.implicits._
    val files = Seq(
      (0L, doc("<doc><id>1</id><v>aa</v></doc><doc><id>2</id></doc>")),
      (1L, doc("<doc><id>9</id><v>zz</v></doc>").dropRight(12))
    ).toDF("file_id", "content")
    val got = Xml.readXml(spark, files, "doc", Seq("id", "v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3), r.getBoolean(4))).sortBy(x => (x._1, x._2))
    assert(got.toSeq === Seq(
      (0L, 0, "1", "aa", true),
      (0L, 1, "2", null, true),
      (1L, 0, null, null, false)
    ))
  }
}
