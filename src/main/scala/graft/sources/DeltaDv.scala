package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Delta Lake deletion-vector (DV) decoding — the jar-less reader half of
  * the public spec (delta.io PROTOCOL.md "Deletion Vectors" + the
  * RoaringFormatSpec the payload uses). A DV marks row indexes of ONE data
  * file as deleted; readers apply it merge-on-read. Modern Delta writers
  * enable DVs by default for DML, so any table that has seen a DELETE/
  * UPDATE/MERGE carries them — refusing minReaderVersion 3 outright would
  * refuse most live tables.
  *
  * Byte formats implemented (all public):
  *  - RFC 1924 Base85 — encodes the 16-byte UUID in `u`-storage
  *    `pathOrInlineDv` (last 20 chars) and the whole payload for `i`
  *    (inline) storage.
  *  - 32-bit roaring bitmap, portable serialization (RoaringFormatSpec):
  *    cookie 12346 (array/bitmap containers + offset header) and cookie
  *    12347 (run containers, offset header only when >= 4 containers).
  *  - 64-bit "RoaringBitmapArray" portable wrapper (Delta's DV payload):
  *    int32 LE magic 1681511377, int64 LE bitmap count, then per bitmap
  *    an int32 LE high-32-bits key + a 32-bit portable roaring bitmap.
  *  - DV file framing: 1-byte format version (1) at file start; each
  *    stored DV at its action's `offset`: int32 BIG-endian payload size,
  *    payload, int32 BIG-endian CRC-32 of the payload (verified).
  *
  * Scale note: DV payloads are compressed bitmaps — metadata-sized (the
  * same order as the log that references them), NOT cardinality-sized, so
  * the driver may hold the BYTES; the positions they expand to are only
  * ever enumerated lazily on executors ([[DeltaImport]] flatMaps the
  * iterator into the anti-join side).
  */
object DeltaDv {

  // ---------------------------------------------------------------- Base85

  /** RFC 1924's 85-char alphabet (the variant the Delta protocol names). */
  private val B85: Array[Char] =
    ("0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz" +
      "!#$%&()*+-;<=>?@^_`{|}~").toCharArray
  private val B85Inv: Array[Int] = {
    val inv = Array.fill(128)(-1)
    B85.zipWithIndex.foreach { case (c, i) => inv(c.toInt) = i }
    inv
  }

  /** Encode bytes (length must be a multiple of 4) as RFC 1924 Base85. */
  def base85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"base85 payload must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var acc = 0L
      var j = 0
      while (j < 4) { acc = (acc << 8) | (bytes(i + j) & 0xffL); j += 1 }
      val group = new Array[Char](5)
      var k = 4
      while (k >= 0) { group(k) = B85((acc % 85).toInt); acc /= 85; k -= 1 }
      sb.appendAll(group)
      i += 4
    }
    sb.toString
  }

  def base85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"base85 string length must be a multiple of 5, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val v = if (c < 128) B85Inv(c.toInt) else -1
        require(v >= 0, s"invalid base85 character '$c'")
        acc = acc * 85 + v
        j += 1
      }
      // 85^5 > 2^32: a 5-char group can encode values past 2^32-1 (e.g.
      // "}}}}}"); RFC 1924 defines none, so refuse rather than silently
      // keeping the low 32 bits of corrupt input
      require(acc <= 0xffffffffL, s"invalid base85 group '${s.substring(i, i + 5)}': exceeds 2^32-1")
      val o = i / 5 * 4
      out(o) = (acc >>> 24).toByte; out(o + 1) = (acc >>> 16).toByte
      out(o + 2) = (acc >>> 8).toByte; out(o + 3) = acc.toByte
      i += 5
    }
    out
  }

  /** The canonical UUID hiding in a `u`-storage pathOrInlineDv: the LAST
    * 20 chars are the Base85 UUID, anything before is an optional random
    * directory prefix. Returns (prefix, uuid).
    */
  def parseUuidPath(pathOrInlineDv: String): (String, java.util.UUID) = {
    require(pathOrInlineDv.length >= 20, s"u-storage pathOrInlineDv too short: '$pathOrInlineDv'")
    val (prefix, enc) = pathOrInlineDv.splitAt(pathOrInlineDv.length - 20)
    val b = base85Decode(enc)
    val bb = ByteBuffer.wrap(b)
    (prefix, new java.util.UUID(bb.getLong, bb.getLong))
  }

  /** Relative path of a `u`-storage DV file under the table root. */
  def dvFileRelPath(pathOrInlineDv: String): String = {
    val (prefix, uuid) = parseUuidPath(pathOrInlineDv)
    val dir = if (prefix.isEmpty) "" else s"$prefix/"
    s"${dir}deletion_vector_$uuid.bin"
  }

  // ------------------------------------------------- roaring deserialization

  private final val SerialCookieNoRun = 12346
  private final val SerialCookie = 12347
  private final val NoOffsetThreshold = 4
  /** Delta's RoaringBitmapArray portable-format magic. */
  final val PortableMagic = 1681511377

  /** Decode one 32-bit portable roaring bitmap starting at `bb`'s current
    * position (consumes exactly the bitmap's bytes), returning its values
    * as a sorted iterator of unsigned ints (as Long).
    */
  private def read32(bb: ByteBuffer): Iterator[Long] = {
    val start = bb.position()
    val cookie = bb.getInt
    val (nContainers, runFlags) =
      if ((cookie & 0xffff) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        bb.get(flags)
        (n, flags)
      } else {
        require(cookie == SerialCookieNoRun, s"bad roaring cookie $cookie")
        (bb.getInt, null)
      }
    def isRun(i: Int): Boolean = runFlags != null && (runFlags(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    // offset header: always with cookie 12346; with 12347 only when >= 4
    // containers. Offsets are from the START of the bitmap's stream — we
    // trust them when present (they let a reader skip containers; we read
    // all, so we just reposition defensively).
    val hasOffsets = runFlags == null || nContainers >= NoOffsetThreshold
    val offsets = if (hasOffsets) Array.fill(nContainers)(bb.getInt) else null
    val parts = (0 until nContainers).iterator.flatMap { c =>
      if (offsets != null) bb.position(start + offsets(c))
      val high = keys(c).toLong << 16
      if (isRun(c)) {
        val nRuns = bb.getShort & 0xffff
        (0 until nRuns).iterator.flatMap { _ =>
          val s = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff
          (s to s + len).iterator.map(v => high | v)
        }
      } else if (cards(c) > 4096) { // bitmap container: 1024 uint64 words
        val words = new Array[Long](1024)
        var w = 0
        while (w < 1024) { words(w) = bb.getLong; w += 1 }
        (0 until 65536).iterator.filter(v => (words(v >>> 6) & (1L << (v & 63))) != 0).map(v => high | v)
      } else {
        val vals = new Array[Int](cards(c))
        var v = 0
        while (v < cards(c)) { vals(v) = bb.getShort & 0xffff; v += 1 }
        vals.iterator.map(v => high | v)
      }
    }
    parts
  }

  /** Decode a Delta RoaringBitmapArray payload into its row indexes
    * (sorted, as Longs). Lazy per-container; call on the executor that
    * will consume the positions.
    */
  def decodePortable(payload: Array[Byte]): Iterator[Long] = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == PortableMagic, s"bad RoaringBitmapArray magic $magic (want $PortableMagic)")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue, s"implausible bitmap count $n")
    (0L until n).iterator.flatMap { _ =>
      val key = bb.getInt.toLong & 0xffffffffL
      // the nested 32-bit bitmap is its own little-endian stream
      read32(bb).map(v => (key << 32) | v)
    }
  }

  /** Read one framed DV out of `bin` (a full `.bin` file's bytes) at
    * `offset`: [size int32 BE][payload][crc32 int32 BE], with the 1-byte
    * format version at file start validated. Returns the payload.
    */
  def unframe(bin: Array[Byte], offset: Int, expectedSize: Int): Array[Byte] = {
    require(bin.nonEmpty && bin(0) == 1, s"unsupported DV file format version ${if (bin.isEmpty) "<empty>" else bin(0)}")
    val bb = ByteBuffer.wrap(bin).order(ByteOrder.BIG_ENDIAN)
    bb.position(offset)
    val size = bb.getInt
    require(size == expectedSize, s"DV size mismatch: framed $size, action says $expectedSize")
    val payload = new Array[Byte](size)
    bb.get(payload)
    val crc = bb.getInt
    val c = new java.util.zip.CRC32
    c.update(payload)
    require(crc == c.getValue.toInt, "DV payload CRC mismatch — torn or corrupt deletion vector")
    payload
  }

  // --------------------------------------------------- fixture serialization

  /** Serialize row indexes into a Delta portable RoaringBitmapArray
    * payload (array/bitmap containers, cookie 12346). The writer half
    * exists for specs and for [[DeltaExport]]-side round trips; real
    * tables' DVs come from Delta writers.
    */
  def encodePortable(positions: Seq[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "row indexes must be non-negative")
    val byHigh32 = positions.distinct.sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    if (byHigh32.nonEmpty)
      require(byHigh32.last._1 <= Int.MaxValue, "high-32 key out of range")
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v); out.write(v >>> 8); out.write(v >>> 16); out.write(v >>> 24) }
    def le64(v: Long): Unit = { le32(v.toInt); le32((v >>> 32).toInt) }
    def le16(v: Int): Unit = { out.write(v); out.write(v >>> 8) }
    le32(PortableMagic)
    le64(byHigh32.size.toLong)
    byHigh32.foreach { case (high, vs) =>
      le32(high.toInt)
      val byContainer = vs.map(v => (v & 0xffffffffL).toInt).groupBy(_ >>> 16).toSeq.sortBy(_._1)
      le32(SerialCookieNoRun)
      le32(byContainer.size)
      byContainer.foreach { case (key, cvs) => le16(key); le16(cvs.size - 1) }
      // offset header (mandatory for cookie 12346), offsets relative to
      // the nested bitmap's own start
      val headerBytes = 4 + 4 + byContainer.size * 4 + byContainer.size * 4
      var running = headerBytes
      byContainer.foreach { case (_, cvs) =>
        le32(running)
        running += (if (cvs.size > 4096) 8192 else cvs.size * 2)
      }
      byContainer.foreach { case (_, cvs) =>
        val lows = cvs.map(_ & 0xffff).sorted
        if (cvs.size > 4096) {
          val words = new Array[Long](1024)
          lows.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
          words.foreach(w => le64(w))
        } else lows.foreach(le16)
      }
    }
    out.toByteArray
  }

  /** Frame a payload as a standalone `.bin` DV file (format version 1,
    * one DV at offset 1). Returns (fileBytes, offset, sizeInBytes).
    */
  def frameFile(payload: Array[Byte]): (Array[Byte], Int, Int) = {
    val out = ByteBuffer.allocate(1 + 4 + payload.length + 4).order(ByteOrder.BIG_ENDIAN)
    out.put(1.toByte)
    out.putInt(payload.length)
    out.put(payload)
    val c = new java.util.zip.CRC32
    c.update(payload)
    out.putInt(c.getValue.toInt)
    (out.array(), 1, payload.length)
  }
}
