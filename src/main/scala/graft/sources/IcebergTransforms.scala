package graft.sources

import org.apache.spark.sql.types._

/** Iceberg partition transforms, replayed on the driver for manifest-level
  * file pruning ([[IcebergImport.read]]'s `partitionFilter`) and for
  * derived-tuple emission ([[IcebergExport]] with a non-identity spec).
  *
  * Everything here follows the public Iceberg table spec's "Partition
  * Transforms" section and Appendix B (32-bit Murmur3 hash, seed 0, of the
  * value's canonical byte representation for `bucket[N]`): a partition
  * FILTER value is a source-column value; the transform maps it to the
  * derived value the manifest tuple stores, so equality on derived values
  * prunes files without opening any footer — the same replay Iceberg's own
  * planner performs. Hidden partitioning only works if this mapping is
  * exact, hence the spec's test vectors in the suite.
  */
object IcebergTransforms {

  private val BucketRe = """bucket\[\s*(\d+)\s*\]""".r
  private val TruncateRe = """truncate\[\s*(\d+)\s*\]""".r

  /** Whether `transform` is one this module can replay. */
  def supported(transform: String): Boolean = transform match {
    case "identity" | "year" | "years" | "month" | "months" | "day" | "days" | "hour" | "hours" => true
    case BucketRe(_) | TruncateRe(_) => true
    case _ => false
  }

  /** 32-bit x86 Murmur3 (Austin Appleby's public algorithm), seed 0 — the
    * hash the Iceberg spec fixes for `bucket[N]` (Appendix B).
    */
  def murmur3(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      val base = 4 * i
      var k1 = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks * 4
    val rem = data.length & 3
    if (rem == 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Bucket hash per spec Appendix B: ints/longs/dates/timestamps hash
    * their 8-byte little-endian long form; strings hash UTF-8 bytes.
    */
  private def bucketHash(sourceType: DataType, raw: String): Int = {
    def hashLong(v: Long): Int = {
      val b = new Array[Byte](8)
      var x = v
      var i = 0
      while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
      murmur3(b)
    }
    sourceType match {
      case IntegerType | LongType | ShortType | ByteType => hashLong(raw.toLong)
      case DateType => hashLong(parseEpochDay(raw))
      case TimestampType | TimestampNTZType => hashLong(parseEpochMicros(raw))
      case StringType => murmur3(raw.getBytes("UTF-8"))
      case other =>
        throw new IllegalArgumentException(s"bucket transform on source type $other not supported")
    }
  }

  /** Days since epoch of a date-looking value (negative before 1970). */
  private def parseEpochDay(raw: String): Long =
    java.time.LocalDate.parse(raw.take(10)).toEpochDay

  /** UTC epoch seconds of a date/timestamp-looking value: ISO instant,
    * `yyyy-MM-dd HH:mm:ss` / `yyyy-MM-ddTHH:mm:ss`, or bare date.
    */
  private def parseEpochSeconds(raw: String): Long = {
    val t = raw.trim
    if (t.length <= 10) parseEpochDay(t) * 86400L
    else {
      val iso = t.replace(' ', 'T')
      try java.time.Instant.parse(iso).getEpochSecond
      catch {
        case _: java.time.format.DateTimeParseException =>
          java.time.LocalDateTime.parse(iso).toEpochSecond(java.time.ZoneOffset.UTC)
      }
    }
  }

  private def parseEpochMicros(raw: String): Long = {
    val t = raw.trim
    val sec = parseEpochSeconds(t)
    val frac =
      if (t.contains('.')) {
        val digits = t.substring(t.indexOf('.') + 1).takeWhile(_.isDigit)
        (digits + "000000").take(6).toLong
      } else 0L
    sec * 1000000L + frac
  }

  /** The derived partition value for a source value, as the canonical
    * string the manifest tuple compares under (`String.valueOf` of the
    * typed value [[IcebergImport]] extracts).
    */
  def derive(transform: String, sourceType: DataType, raw: String): String = transform match {
    case "identity" => raw
    case "year" | "years" =>
      val d = java.time.LocalDate.ofEpochDay(parseEpochDay(raw))
      String.valueOf(d.getYear - 1970)
    case "month" | "months" =>
      val d = java.time.LocalDate.ofEpochDay(parseEpochDay(raw))
      String.valueOf((d.getYear - 1970) * 12 + (d.getMonthValue - 1))
    case "day" | "days" =>
      String.valueOf(Math.floorDiv(parseEpochSeconds(raw), 86400L).toInt)
    case "hour" | "hours" =>
      String.valueOf(Math.floorDiv(parseEpochSeconds(raw), 3600L).toInt)
    case BucketRe(n) =>
      String.valueOf((bucketHash(sourceType, raw) & Integer.MAX_VALUE) % n.toInt)
    case TruncateRe(w) =>
      val width = w.toInt
      require(width > 0, s"truncate width must be positive, got $width")
      sourceType match {
        case StringType =>
          // spec: truncate to W Unicode codepoints, not chars
          val cps = raw.codePointCount(0, raw.length)
          if (cps <= width) raw else raw.substring(0, raw.offsetByCodePoints(0, width))
        case IntegerType | ShortType | ByteType =>
          String.valueOf(raw.toInt - Math.floorMod(raw.toInt, width))
        case LongType =>
          String.valueOf(raw.toLong - Math.floorMod(raw.toLong, width.toLong))
        case other =>
          throw new IllegalArgumentException(s"truncate transform on source type $other not supported")
      }
    case other =>
      throw new IllegalArgumentException(
        s"partition transform '$other' not supported " +
          "(identity, year, month, day, hour, bucket[N], truncate[W])")
  }

  /** The Avro primitive type of the derived tuple value a transform
    * produces (`sourceAvro` is the identity value's Avro type).
    */
  def avroType(transform: String, sourceAvro: String): String = transform match {
    case "identity" => sourceAvro
    case "year" | "years" | "month" | "months" | "day" | "days" | "hour" | "hours" => "int"
    case BucketRe(_) => "int"
    case TruncateRe(_) => sourceAvro
    case other => throw new IllegalArgumentException(s"partition transform '$other' not supported")
  }

  /** Iceberg's conventional partition field name for a transform. */
  def fieldName(transform: String, sourceColumn: String): String = transform match {
    case "identity" => sourceColumn
    case "year" | "years" => s"${sourceColumn}_year"
    case "month" | "months" => s"${sourceColumn}_month"
    case "day" | "days" => s"${sourceColumn}_day"
    case "hour" | "hours" => s"${sourceColumn}_hour"
    case BucketRe(_) => s"${sourceColumn}_bucket"
    case TruncateRe(_) => s"${sourceColumn}_trunc"
    case other => throw new IllegalArgumentException(s"partition transform '$other' not supported")
  }
}
