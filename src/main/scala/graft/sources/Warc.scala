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
  *    line + headers + blank line + body) — the parser peels BOTH
  *    layers, so downstream sees (uri, status, body), not raw blocks.
  *    The body is decoded CHARSET-AWARE: `charset=` from the HTTP
  *    `Content-Type` header wins, then an HTML `<meta charset>` sniff
  *    over the body head, then UTF-8 — real crawls are charset-mixed
  *    (Latin-1/Windows-1252/Shift-JIS), and hard-UTF-8 decode would feed
  *    mojibake straight into dedup and quality gates;
  *  - on the wire each record is its own gzip MEMBER and the file is the
  *    member concatenation (the Common Crawl layout — it's what makes a
  *    1 GB .warc.gz range-splittable by the cdx index).
  *
  * MEMORY CONTRACT: parsing is ITERATOR-STREAMED end to end. Gzip members
  * inflate through [[StrictGzipMemberStream]] (a chunk at a time, with
  * strict torn-header detection the JDK stream lacks), and records emit
  * as the stream advances — per-task memory is O(largest record), never
  * O(inflated file). A 1 GB Common Crawl .warc.gz inflating to ~4 GB
  * parses in a bounded task. Hostile inputs are bounded too: a record
  * block is capped at `maxBlockBytes` (64 MB default) and a header line
  * at 1 MB, so a decompression bomb or a crafted Content-Length degrades
  * into the torn-file sentinel instead of an executor OOM (ADVICE r12:
  * the old whole-file inflate buffered unbounded decoded bytes).
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

  /** Per-record block cap: a Content-Length above this reads as torn.
    * Common Crawl caps response bodies at 1 MB; 64 MB leaves generous
    * room for any sane archive while bounding hostile ones.
    */
  val DefaultMaxBlockBytes: Int = 64 << 20

  private val MaxHeaderLineBytes: Int = 1 << 20

  /** Encode one WARC record (fixture/export side). `httpStatus >= 0` wraps
    * the body in an HTTP/1.1 response message, matching what a crawler
    * writes for `response` records.
    */
  def encodeRecord(warcType: String, targetUri: String, httpStatus: Int, body: String): Array[Byte] =
    encodeRecordRaw(warcType, targetUri, httpStatus, body.getBytes("UTF-8"), "text/html")

  /** Raw-bytes twin of [[encodeRecord]] for charset fixtures: the body
    * bytes go in verbatim under the given HTTP `Content-Type` value, so a
    * fixture can plant Latin-1 bytes with (or without) a declared charset.
    */
  def encodeRecordRaw(
      warcType: String,
      targetUri: String,
      httpStatus: Int,
      bodyBytes: Array[Byte],
      httpContentType: String
  ): Array[Byte] = {
    val block: Array[Byte] =
      if (httpStatus >= 0) {
        val reason = if (httpStatus == 200) "OK" else if (httpStatus == 404) "Not Found" else "Status"
        val http = s"HTTP/1.1 $httpStatus $reason${CRLF}Content-Type: $httpContentType${CRLF}Content-Length: ${bodyBytes.length}$CRLF$CRLF"
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

  /** Streaming decoder for a concatenation of gzip members with STRICT
    * torn-tail detection: decoded bytes surface through `read` a chunk at
    * a time (O(chunk) memory — never the whole inflated file), and after
    * EOF `cleanEof` says whether the underlying stream ended exactly at a
    * member boundary.
    *
    * Members are walked explicitly (RFC 1952 header + raw `Inflater` +
    * 8-byte trailer) rather than through `GZIPInputStream`: the JDK
    * stream treats a TRUNCATED NEXT-MEMBER HEADER as a clean end of the
    * concatenation (its readTrailer swallows the IOException), which
    * would silently drop a torn record with no sentinel — exactly the
    * unauditable loss the WARC corruption contract exists to prevent.
    */
  final class StrictGzipMemberStream(raw: java.io.InputStream) extends java.io.InputStream {
    private val ChunkSize = 8192
    private val in = new java.io.PushbackInputStream(raw, ChunkSize)
    private val inBuf = new Array[Byte](ChunkSize)
    private var lastFed = 0
    private val inf = new java.util.zip.Inflater(true)
    private var state = 0 // 0 = before member, 1 = in member, 2 = done
    private var clean = true

    /** Valid once `read` has returned -1: true iff every member decoded
      * completely and the stream ended on a member boundary.
      */
    def cleanEof: Boolean = clean

    private def torn(): Int = { state = 2; clean = false; -1 }

    /** Parse one RFC 1952 member header. Returns -1 on clean EOF (no more
      * members), 0 when a member is open, or flags torn on a partial or
      * malformed header.
      */
    private def startMember(): Int = {
      val b0 = in.read()
      if (b0 == -1) { state = 2; return -1 }
      val hdr = new Array[Int](10)
      hdr(0) = b0
      var i = 1
      while (i < 10) {
        val b = in.read()
        if (b == -1) return torn()
        hdr(i) = b; i += 1
      }
      if (hdr(0) != 0x1f || hdr(1) != 0x8b || hdr(2) != 8) return torn()
      val flg = hdr(3)
      if ((flg & 0x04) != 0) { // FEXTRA
        val l0 = in.read(); val l1 = in.read()
        if (l1 == -1) return torn()
        var skip = l0 | (l1 << 8)
        while (skip > 0) { if (in.read() == -1) return torn(); skip -= 1 }
      }
      if ((flg & 0x08) != 0) { var b = in.read(); while (b > 0) b = in.read(); if (b == -1) return torn() } // FNAME
      if ((flg & 0x10) != 0) { var b = in.read(); while (b > 0) b = in.read(); if (b == -1) return torn() } // FCOMMENT
      if ((flg & 0x02) != 0) { if (in.read() == -1 || in.read() == -1) return torn() } // FHCRC
      inf.reset()
      lastFed = 0
      state = 1
      0
    }

    /** Push unconsumed compressed bytes back, then consume the 8-byte
      * CRC32+ISIZE trailer (unvalidated, like the array parser before it;
      * a MISSING trailer is torn).
      */
    private def finishMember(): Unit = {
      val rem = inf.getRemaining
      if (rem > 0) in.unread(inBuf, lastFed - rem, rem)
      var i = 0
      while (i < 8) {
        if (in.read() == -1) { state = 2; clean = false; return }
        i += 1
      }
      state = 0
    }

    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n == -1) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      try {
        while (true) {
          state match {
            case 2 => return -1
            case 0 => if (startMember() == -1) return -1
            case _ =>
              if (inf.finished()) {
                finishMember()
              } else if (inf.needsInput()) {
                val n = in.read(inBuf)
                if (n == -1) return torn() // cut mid-member
                lastFed = n
                inf.setInput(inBuf, 0, n)
              } else {
                val n = inf.inflate(b, off, len)
                if (n > 0) return n
                if (inf.needsDictionary()) return torn()
              }
          }
        }
        -1 // unreachable
      } catch {
        case _: java.util.zip.DataFormatException => torn()
      }
    }

    override def close(): Unit = { inf.end(); in.close() }
  }

  private def isGzipMagic(b0: Int, b1: Int): Boolean = b0 == 0x1f && b1 == 0x8b

  private val HeaderCharset = """(?i)content-type\s*:[^\r\n]*?charset\s*=\s*"?([A-Za-z0-9._\-]+)""".r
  private val MetaCharset = """(?i)<meta[^>]{0,256}?charset\s*=\s*["']?([A-Za-z0-9._\-]+)""".r

  /** Charset precedence for an HTTP body: `Content-Type: ...; charset=`
    * response header, else an HTML `<meta charset>` / legacy
    * `http-equiv` sniff over the first 1 KB of the body, else UTF-8.
    * Unknown/unsupported names fall back to UTF-8 — a typo'd charset
    * must not kill the task.
    */
  private[sources] def resolveCharset(httpHead: String, bodyBytes: Array[Byte]): java.nio.charset.Charset = {
    val declared = HeaderCharset.findFirstMatchIn(httpHead).map(_.group(1)).orElse {
      val sniffLen = math.min(bodyBytes.length, 1024)
      val head = new String(bodyBytes, 0, sniffLen, java.nio.charset.StandardCharsets.ISO_8859_1)
      MetaCharset.findFirstMatchIn(head).map(_.group(1))
    }
    declared.flatMap { name =>
      try { if (java.nio.charset.Charset.isSupported(name)) Some(java.nio.charset.Charset.forName(name)) else None }
      catch { case _: java.nio.charset.IllegalCharsetNameException => None }
    }.getOrElse(java.nio.charset.StandardCharsets.UTF_8)
  }

  private def startsWithAscii(bytes: Array[Byte], prefix: String): Boolean =
    bytes.length >= prefix.length && prefix.indices.forall(i => (bytes(i) & 0xff) == prefix.charAt(i))

  private def indexOfDoubleCrlf(bytes: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' && bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Peel the embedded HTTP message out of a record block: (status,
    * charset-decoded body). Non-HTTP blocks pass through as UTF-8 text
    * with status -1.
    */
  private def decodeBlock(block: Array[Byte]): (Int, String) =
    if (startsWithAscii(block, "HTTP/")) {
      val sep = indexOfDoubleCrlf(block)
      val headBytes = if (sep >= 0) java.util.Arrays.copyOfRange(block, 0, sep) else block
      // HTTP head is ASCII-framed; ISO-8859-1 decodes any byte losslessly
      val head = new String(headBytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      val eol = head.indexOf(CRLF)
      val statusLine = if (eol >= 0) head.substring(0, eol) else head
      val parts = statusLine.split(" ")
      val st = if (parts.length >= 2) scala.util.Try(parts(1).toInt).getOrElse(-1) else -1
      val bodyBytes =
        if (sep >= 0) java.util.Arrays.copyOfRange(block, sep + 4, block.length) else Array.empty[Byte]
      (st, new String(bodyBytes, resolveCharset(head, bodyBytes)))
    } else (-1, new String(block, java.nio.charset.StandardCharsets.UTF_8))

  /** Streaming per-file parse: records emit AS the (gzip-member) stream
    * advances — per-task memory O(record). Pure and driver-free —
    * unit-testable without Spark, executor-run under [[readWarc]].
    */
  def parseWarcIter(
      fileId: Long,
      in0: java.io.InputStream,
      maxBlockBytes: Int = DefaultMaxBlockBytes
  ): Iterator[WarcRecord] with java.io.Closeable = new scala.collection.AbstractIterator[WarcRecord] with java.io.Closeable {
    private val magicProbe = new java.io.PushbackInputStream(in0, 2)
    private val gz: Option[StrictGzipMemberStream] = {
      val b0 = magicProbe.read()
      val b1 = if (b0 == -1) -1 else magicProbe.read()
      if (b1 != -1) magicProbe.unread(b1)
      if (b0 != -1) magicProbe.unread(b0)
      if (isGzipMagic(b0, b1)) Some(new StrictGzipMemberStream(magicProbe)) else None
    }
    private val in = new java.io.BufferedInputStream(gz.getOrElse(magicProbe), 64 << 10)

    private var emitted = 0
    private var done = false
    private var pending: WarcRecord = _
    private var streamsClosed = false

    /** Frees the Inflater's native zlib buffers (StrictGzipMemberStream
      * .close → inf.end) and the underlying input the moment the iterator
      * is exhausted or torn — executor tasks streaming many .warc.gz
      * files must not wait for GC cleaners to release off-heap memory
      * (ADVICE r13 #2). Mirrors AvroIO.rowIterator's close-on-exhaustion.
      */
    private def closeStreams(): Unit = if (!streamsClosed) {
      streamsClosed = true
      try in.close() // closes gz (inf.end) or magicProbe, which closes in0
      catch { case _: java.io.IOException => () }
    }

    /** Early-abandonment hook (limit/take): idempotent; the iterator
      * reports exhaustion afterwards. [[readWarc]] wires this to task
      * completion, mirroring AvroIO.
      */
    override def close(): Unit = { done = true; pending = null; closeStreams() }

    /** One CRLF-terminated line, or Left(leftover bytes) at EOF / over the
      * line cap (leftover feeds the trailing-whitespace tolerance check).
      */
    private def readLine(): Either[Array[Byte], String] = {
      val buf = new java.io.ByteArrayOutputStream(128)
      var prev = -1
      while (true) {
        val b = in.read()
        if (b == -1) return Left(buf.toByteArray)
        if (prev == '\r' && b == '\n') {
          val arr = buf.toByteArray
          return Right(new String(arr, 0, arr.length - 1, "UTF-8"))
        }
        buf.write(b)
        if (buf.size > MaxHeaderLineBytes) return Left(buf.toByteArray)
        prev = b
      }
      Left(Array.empty) // unreachable
    }

    private def readFully(n: Int): Option[Array[Byte]] = {
      val out = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(out, off, n - off)
        if (r == -1) return None
        off += r
      }
      Some(out)
    }

    /** Discard exactly `n` bytes in O(chunk) memory; false = EOF first.
      * (read-loop, not `skip`: InputStream.skip may return 0 forever.)
      * The scratch buffer is an iterator field (single-threaded, lazily
      * allocated) — a file dense with oversized records must not churn a
      * fresh 8KB array per whale (ADVICE r14 #4).
      */
    private var skipBuf: Array[Byte] = null
    private def skipFully(n: Long): Boolean = {
      if (skipBuf == null) skipBuf = new Array[Byte](8 << 10)
      val buf = skipBuf
      var left = n
      while (left > 0) {
        val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
        if (r == -1) return false
        left -= r
      }
      true
    }

    /** True iff the rest of the stream (plus `head`) holds only the
      * \r/\n/space padding some writers append — anything else is torn.
      */
    private def onlyTrailingWhitespace(head: Array[Byte]): Boolean = {
      if (head.exists(b => b != '\r' && b != '\n' && b != ' ')) return false
      var b = in.read()
      while (b != -1) {
        if (b != '\r' && b != '\n' && b != ' ') { while (in.read() != -1) {}; return false }
        b = in.read()
      }
      true
    }

    private def sentinel(): WarcRecord = WarcRecord(fileId, emitted, "", "", -1, -1L, "", ok = false)

    /** Parse forward to the next record; `null` means end of iteration. */
    private def advance(): WarcRecord = {
      if (done) return null
      readLine() match {
        case Left(leftover) =>
          done = true
          val torn = !onlyTrailingWhitespace(leftover) || !gz.forall(_.cleanEof)
          if (torn) sentinel() else null
        case Right(version) if !version.startsWith("WARC/") =>
          done = true
          // the line itself (content + its CRLF, which is whitespace) and
          // everything after must be pure padding to pass
          val torn = !onlyTrailingWhitespace(version.getBytes("UTF-8")) || !gz.forall(_.cleanEof)
          if (torn) sentinel() else null
        case Right(_) =>
          var warcType = ""
          var uri = ""
          var clen = -1L
          var headerOk = true
          var blank = false
          while (!blank && headerOk) {
            readLine() match {
              case Left(_) => headerOk = false
              case Right("") => blank = true
              case Right(h) =>
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
          // the block cap bounds task memory: a broken header or
          // negative Content-Length degrades to the terminal sentinel
          if (!headerOk || clen < 0) { done = true; return sentinel() }
          if (clen > maxBlockBytes) {
            // oversized but well-formed: the block is skippable WITHOUT
            // buffering it, so emit a sentinel for this record only and
            // keep parsing — one whale must not drop every record after
            // it (ADVICE r13 #5). A LYING hostile Content-Length (larger
            // than the remaining stream) hits EOF mid-skip and ends the
            // file exactly as the old terminal path did.
            if (!skipFully(clen + 4L)) done = true // block + \r\n\r\n trailer in one pass
            val rec = sentinel()
            emitted += 1
            return rec
          }
          readFully(clen.toInt) match {
            case None => done = true; sentinel()
            case Some(block) =>
              readFully(4) match { // \r\n\r\n record trailer must be present
                case None => done = true; sentinel()
                case Some(_) =>
                  val (status, body) = decodeBlock(block)
                  val rec = WarcRecord(fileId, emitted, warcType, uri, status,
                    body.getBytes("UTF-8").length.toLong, body, ok = true)
                  emitted += 1
                  rec
              }
          }
      }
    }

    override def hasNext: Boolean = {
      if (pending == null && !done) pending = advance()
      if (done) closeStreams() // advance() has read everything it ever will
      // a torn parse can end the file exactly at a record boundary with
      // the sentinel as the final element; `done` is set by then
      pending != null
    }

    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException("parseWarcIter exhausted")
      val r = pending
      pending = null
      r
    }
  }

  /** Parse one WARC file's bytes (gzip auto-detected by magic) — the
    * array-input convenience over [[parseWarcIter]].
    */
  def parseWarc(fileId: Long, raw: Array[Byte]): Seq[WarcRecord] =
    parseWarcIter(fileId, new java.io.ByteArrayInputStream(raw)).toList

  /** Distributed WARC ingest: (file_id long, content binary) → one row per
    * record. One task per input partition, zero shuffles, records emitted
    * lazily as each file's member stream inflates; pair with
    * `spark.read.format("binaryFile")` for on-disk .warc/.warc.gz trees.
    */
  def readWarc(spark: SparkSession, files: DataFrame, idCol: String = "file_id", contentCol: String = "content"): Dataset[WarcRecord] = {
    import spark.implicits._
    files
      .select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { partIt =>
        // a downstream limit/take can abandon an iterator mid-file: ONE
        // task-completion listener closes whatever is still open, and an
        // exhausted file de-registers so its buffers free immediately
        // (same contract as AvroIO.readAvro)
        val tracker = graft.core.TaskCloseables.forTask()
        partIt.flatMap { case (id, raw) =>
          tracker.track(parseWarcIter(id, new java.io.ByteArrayInputStream(Option(raw).getOrElse(Array.empty))))
        }
      }
  }
}
