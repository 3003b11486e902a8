package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingestion — the wire format of Common
  * Crawl and every large-scale web corpus, i.e. THE input format a 100 TB
  * text-pipeline run starts from. Pure-JVM parsing, no external libs:
  *
  *  - a WARC file is a sequence of records, each `WARC/1.0\r\n` + CRLF
  *    header lines + blank line + a `Content-Length`-framed block +
  *    `\r\n\r\n` trailer;
  *  - `response` records carry an HTTP/1.1 message in the block (status
  *    line + headers + blank line + body) — [[parseWarc]] peels BOTH
  *    layers, so downstream sees (uri, status, body), not raw blocks;
  *  - on the wire each record is its own gzip MEMBER and the file is the
  *    member concatenation (the Common Crawl layout — it's what makes a
  *    1 GB .warc.gz range-splittable by the cdx index). `GZIPInputStream`
  *    decodes concatenated members natively, and [[inflateAll]] keeps
  *    everything decoded before a truncation error so a torn tail degrades
  *    instead of killing the file.
  *
  * Corruption contract (same as the multimodal decoders): records that
  * parse completely are emitted `ok=true`; the first torn/corrupt record
  * ends the file with exactly ONE `ok=false` sentinel row carrying the
  * count of complete records as its index — a poisoned blob must never
  * kill a 100 TB ingest sweep, and the sentinel keeps the loss auditable.
  *
  * Scale shape: one task per WARC file (`mapPartitions` over
  * (file_id, bytes)), no shuffle — ingest throughput is bounded by
  * object-store bandwidth and gunzip, exactly as it should be. Files are
  * independent, so a 90k-file Common Crawl segment fans out embarrassingly.
  */
object Warc {

  /** One parsed record. For non-HTTP records (warcinfo, request, metadata)
    * the block is the body verbatim and `httpStatus` is -1.
    */
  final case class WarcRecord(
      fileId: Long,
      recIdx: Int,
      warcType: String,
      targetUri: String,
      httpStatus: Int,
      bodyLen: Long,
      body: String,
      ok: Boolean
  )

  private val CRLF = "\r\n"

  /** Encode one WARC record (fixture/export side). `httpStatus >= 0` wraps
    * the body in an HTTP/1.1 response message, matching what a crawler
    * writes for `response` records.
    */
  def encodeRecord(warcType: String, targetUri: String, httpStatus: Int, body: String): Array[Byte] = {
    val bodyBytes = body.getBytes("UTF-8")
    val block: Array[Byte] =
      if (httpStatus >= 0) {
        val reason = if (httpStatus == 200) "OK" else if (httpStatus == 404) "Not Found" else "Status"
        val http = s"HTTP/1.1 $httpStatus $reason${CRLF}Content-Type: text/html${CRLF}Content-Length: ${bodyBytes.length}$CRLF$CRLF"
        http.getBytes("UTF-8") ++ bodyBytes
      } else bodyBytes
    val headers = new StringBuilder()
    headers ++= s"WARC/1.0$CRLF"
    headers ++= s"WARC-Type: $warcType$CRLF"
    if (targetUri.nonEmpty) headers ++= s"WARC-Target-URI: $targetUri$CRLF"
    headers ++= s"WARC-Date: 2026-01-01T00:00:00Z$CRLF"
    headers ++= (if (httpStatus >= 0) s"Content-Type: application/http; msgtype=response$CRLF"
                 else s"Content-Type: application/warc-fields$CRLF")
    headers ++= s"Content-Length: ${block.length}$CRLF"
    headers ++= CRLF
    headers.toString.getBytes("UTF-8") ++ block ++ s"$CRLF$CRLF".getBytes("UTF-8")
  }

  /** Concatenate records into one WARC file; `gzipPerRecord=true` produces
    * the Common Crawl layout (one gzip member per record).
    */
  def encodeFile(records: Seq[Array[Byte]], gzipPerRecord: Boolean): Array[Byte] =
    if (!gzipPerRecord) records.foldLeft(Array.empty[Byte])(_ ++ _)
    else {
      val out = new java.io.ByteArrayOutputStream()
      records.foreach { r =>
        val member = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(member)
        gz.write(r)
        gz.close() // releases the Deflater; BAOS close is a no-op
        member.writeTo(out)
      }
      out.toByteArray
    }

  /** Inflate a (possibly multi-member, possibly torn) gzip byte stream.
    * Returns (decodedBytes, cleanEof): bytes decoded before any error are
    * KEPT, and `cleanEof=false` marks a truncated/corrupt tail so the
    * parser emits its sentinel even when the torn member yielded nothing.
    *
    * Members are walked explicitly (RFC 1952 header + raw `Inflater` +
    * 8-byte trailer) rather than through `GZIPInputStream`: the JDK
    * stream treats a TRUNCATED NEXT-MEMBER HEADER as a clean end of the
    * concatenation (its readTrailer swallows the IOException), which
    * would silently drop a torn record with no sentinel — exactly the
    * unauditable loss this contract exists to prevent.
    */
  def inflateAll(bytes: Array[Byte]): (Array[Byte], Boolean) = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    def u(i: Int): Int = bytes(i) & 0xff
    try {
      while (pos < bytes.length) {
        // RFC 1952 member header: magic, CM=8, FLG, MTIME(4), XFL, OS = 10 bytes
        if (pos + 10 > bytes.length || u(pos) != 0x1f || u(pos + 1) != 0x8b || u(pos + 2) != 8)
          return (out.toByteArray, false)
        val flg = u(pos + 3)
        var p = pos + 10
        if ((flg & 0x04) != 0) { // FEXTRA
          if (p + 2 > bytes.length) return (out.toByteArray, false)
          p += 2 + (u(p) | (u(p + 1) << 8))
        }
        if ((flg & 0x08) != 0) { while (p < bytes.length && bytes(p) != 0) p += 1; p += 1 } // FNAME
        if ((flg & 0x10) != 0) { while (p < bytes.length && bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
        if ((flg & 0x02) != 0) p += 2 // FHCRC
        if (p > bytes.length) return (out.toByteArray, false)
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(bytes, p, bytes.length - p)
          val buf = new Array[Byte](8192)
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n > 0) out.write(buf, 0, n)
            // n == 0 and not finished: input exhausted (cut mid-member) or
            // a dictionary demand — either way the member cannot complete
            else if (!inf.finished()) return (out.toByteArray, false)
          }
          val consumed = (bytes.length - p) - inf.getRemaining
          pos = p + consumed + 8 // skip CRC32 + ISIZE
          if (pos > bytes.length) return (out.toByteArray, false) // trailer torn off
        } finally inf.end()
      }
      (out.toByteArray, true)
    } catch {
      case scala.util.control.NonFatal(_) => (out.toByteArray, false)
    }
  }

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b

  /** Parse one WARC file's bytes (gzip auto-detected by magic). Pure and
    * driver-free — unit-testable without Spark, executor-run under
    * [[readWarc]].
    */
  def parseWarc(fileId: Long, raw: Array[Byte]): Seq[WarcRecord] = {
    val (bytes, cleanEof) =
      if (isGzip(raw)) inflateAll(raw)
      else (raw, true)
    val recs = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    var torn = !cleanEof

    def readLine(): Option[String] = {
      var i = pos
      while (i + 1 < bytes.length && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) None
      else {
        val s = new String(bytes, pos, i - pos, "UTF-8")
        pos = i + 2
        Some(s)
      }
    }

    var done = false
    while (!done && pos < bytes.length) {
      val start = pos
      val version = readLine()
      if (version.isEmpty || !version.get.startsWith("WARC/")) {
        // garbage where a record header should be — torn unless it's pure
        // trailing whitespace (tolerated: some writers pad the tail)
        if (bytes.drop(start).exists(b => b != '\r' && b != '\n' && b != ' ')) torn = true
        done = true
      } else {
        var warcType = ""
        var uri = ""
        var clen = -1L
        var headerOk = true
        var blank = false
        while (!blank && headerOk) {
          readLine() match {
            case None => headerOk = false
            case Some("") => blank = true
            case Some(h) =>
              val idx = h.indexOf(':')
              if (idx > 0) {
                val (k, v) = (h.substring(0, idx).trim.toLowerCase, h.substring(idx + 1).trim)
                k match {
                  case "warc-type" => warcType = v
                  case "warc-target-uri" => uri = v
                  case "content-length" => clen = scala.util.Try(v.toLong).getOrElse(-1L)
                  case _ => ()
                }
              }
          }
        }
        // non-overflowing bound: a hostile Content-Length near Long.Max
        // must read as torn, not wrap negative past the length guard
        if (!headerOk || clen < 0 || clen > (bytes.length - pos - 4).toLong) {
          torn = true
          done = true
        } else {
          val block = new String(bytes, pos, clen.toInt, "UTF-8")
          pos += clen.toInt + 4 // block + \r\n\r\n record trailer
          val (status, body) =
            if (block.startsWith("HTTP/")) {
              val sep = block.indexOf(CRLF + CRLF)
              val eol = block.indexOf(CRLF)
              val statusLine = if (eol >= 0) block.substring(0, eol) else block
              val parts = statusLine.split(" ")
              val st = if (parts.length >= 2) scala.util.Try(parts(1).toInt).getOrElse(-1) else -1
              (st, if (sep >= 0) block.substring(sep + 4) else "")
            } else (-1, block)
          recs += WarcRecord(fileId, recs.length, warcType, uri, status, body.getBytes("UTF-8").length.toLong, body, ok = true)
        }
      }
    }
    if (torn)
      recs += WarcRecord(fileId, recs.length, "", "", -1, -1L, "", ok = false)
    recs.toSeq
  }

  /** Distributed WARC ingest: (file_id long, content binary) → one row per
    * record. One task per input partition, zero shuffles; pair with
    * `spark.read.format("binaryFile")` for on-disk .warc/.warc.gz trees.
    */
  def readWarc(spark: SparkSession, files: DataFrame, idCol: String = "file_id", contentCol: String = "content"): Dataset[WarcRecord] = {
    import spark.implicits._
    files
      .select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, raw) => parseWarc(id, Option(raw).getOrElse(Array.empty)) })
  }
}
