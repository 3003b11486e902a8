package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text/link extraction: the step between crawl ingest
  * ([[graft.sources.Warc]]) and the text pipeline (quality gates, dedup,
  * tokenization). Deliberately rule-based and expression-only — every
  * transform is a codegen'd `regexp_replace`/`replace` chain, so a 100 TB
  * crawl is cleaned in one whole-stage-codegen pass with zero UDFs, and
  * the exact rules replay in any RE2/Java-regex engine (which is how the
  * q178/q179 oracles re-derive the output in SQL).
  *
  * Rules (a deterministic "trafilatura-lite", not a browser):
  *  1. drop <head>, <script> and <style> element CONTENT (dotall,
  *     non-greedy — title/meta/js/css are never corpus text);
  *  2. drop <!-- comments -->;
  *  3. block-level closers/void tags (</p>, </div>, </li>, </h1..6>,
  *     <br>, </tr>) become spaces so words don't fuse across blocks;
  *  4. every remaining tag is stripped;
  *  5. the five core entities + &nbsp; decode (amp LAST, per spec, so
  *     "&amp;lt;" yields the literal "&lt;" and never double-decodes);
  *  6. whitespace runs collapse to single spaces, ends trimmed.
  */
object Html {

  private val blockTags = "(?i)<(?:/p|/div|/li|/h[1-6]|/tr|br\\s*/?)>"

  /** Visible text of an HTML document as one whitespace-normalized line. */
  def extractText(html: Column): Column = {
    val noHead = regexp_replace(html, "(?is)<head\\b[^>]*>.*?</head>", " ")
    val noScript = regexp_replace(noHead, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment, blockTags, " ")
    val noTags = regexp_replace(blocks, "<[^>]*>", "")
    val ent = decodeEntities(noTags)
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** <title> content (first match), entity-decoded and trimmed; empty
    * string when absent.
    */
  def extractTitle(html: Column): Column =
    trim(decodeEntities(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)))

  /** All href targets in document order (absolute or relative), built
    * from the standard attribute pattern; pure-fragment links dropped.
    */
  def extractLinks(html: Column): Column =
    filter(
      regexp_extract_all(html, lit("(?i)href\\s*=\\s*[\"']([^\"']+)[\"']"), lit(1)),
      x => !x.startsWith("#")
    )

  /** Registrable host of an absolute http(s) URL; empty for relative. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "(?i)^https?://([^/:?#]+)", 1))

  private def decodeEntities(c: Column): Column = {
    val nbsp = regexp_replace(c, "&nbsp;", " ")
    val lt = regexp_replace(nbsp, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    val apos = regexp_replace(quot, "&#39;", "'")
    regexp_replace(apos, "&amp;", "&")
  }
}
