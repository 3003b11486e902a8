package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Html

/** Rule-based HTML extraction: hand-traced tag stripping, entity decode
  * order, and link/host extraction edge cases.
  */
class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def textOf(html: String): String =
    Seq(html).toDF("h").select(Html.extractText(col("h"))).collect()(0).getString(0)

  test("script/style/head content dropped even when it contains tags") {
    val html = """<html><head><title>T</title><meta x="y"></head><body>""" +
      """<script>if (a<b) { document.write("<p>fake</p>"); }</script>""" +
      """<style>p > a {color:red}</style>real text</body></html>"""
    assert(textOf(html) === "real text")
  }

  test("block closers become spaces, inline tags strip without a space") {
    assert(textOf("<p>one</p><p>two</p>") === "one two")
    assert(textOf("in<b>line</b> word") === "inline word")
    assert(textOf("a<br>b and <div>c</div>d") === "a b and c d", "br and /div break blocks")
    assert(textOf("x<span>y</span>z") === "xyz", "open AND close of inline tags strip without a space")
  }

  test("entity decode order: &amp; decodes LAST so '&amp;lt;' is literal '&lt;'") {
    assert(textOf("<p>&amp;lt; &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;x</p>") ===
      """&lt; <tag> "q" 'a' x""")
  }

  test("comments dropped, whitespace runs collapse, ends trimmed") {
    assert(textOf("  <p> a   b </p> <!-- note\nmultiline --> c  ") === "a b c")
  }

  test("title: first match, entity-decoded; empty when absent") {
    val got = Seq("<title> A &amp; B </title><title>second</title>", "<p>no title</p>")
      .toDF("h").select(Html.extractTitle(col("h"))).as[String].collect()
    assert(got(0) === "A & B" && got(1) === "")
  }

  test("links: document order, fragments excluded, host lowercased and empty for relative") {
    val html = """<a href="http://EX.com/a">1</a><a href='#x'>2</a>""" +
      """<a href = "/rel">3</a><a href="https://b.org:8080/p?q#f">4</a>"""
    val rows = Seq(html).toDF("h")
      .select(posexplode(Html.extractLinks(col("h"))).as(Seq("pos", "url")))
      .select(col("pos"), col("url"), Html.hostOf(col("url")))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(rows === Seq(
      (0, "http://EX.com/a", "ex.com"),
      (1, "/rel", ""),
      (2, "https://b.org:8080/p?q#f", "b.org")
    ))
  }

  test("whole chain is expression-only: no UDFs, plan stays in codegen") {
    val df = Seq("<p>x</p>").toDF("h").select(Html.extractText(col("h")), Html.extractTitle(col("h")), Html.extractLinks(col("h")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"), plan)
  }
}
