package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DeltaDv

/** Byte-level proofs of the deletion-vector codecs against the PUBLIC
  * specs (RFC 1924 Base85, RoaringFormatSpec, Delta PROTOCOL.md framing) —
  * golden payloads are hand-derived literals, so the parser is checked
  * against the spec document, not against our own serializer.
  */
class DeltaDvSpec extends AnyFunSuite {

  private def bytes(is: Int*): Array[Byte] = is.map(_.toByte).toArray

  test("golden: portable RoaringBitmapArray with one array container (spec-derived bytes)") {
    // magic 1681511377 = 0x6439D3D1 LE | count=1 LE | high32 key=0 LE |
    // 32-bit bitmap: cookie 12346 LE, 1 container, (key=0, card-1=2),
    // offset header (mandatory for 12346) = 16, values 1,3,7 as uint16 LE
    val payload = bytes(
      0xD1, 0xD3, 0x39, 0x64,
      1, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0,
      0x3A, 0x30, 0, 0,
      1, 0, 0, 0,
      0, 0, 2, 0,
      16, 0, 0, 0,
      1, 0, 3, 0, 7, 0
    )
    assert(DeltaDv.decodePortable(payload).toSeq == Seq(1L, 3L, 7L))
  }

  test("golden: run container (cookie 12347, no offset header under 4 containers)") {
    // cookie 12347 with (count-1)=0 in the upper 16 bits, run flag bit set,
    // (key=0, card-1=2), 1 run: start=4 len=2 -> values 4,5,6
    val payload = bytes(
      0xD1, 0xD3, 0x39, 0x64,
      1, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0,
      0x3B, 0x30, 0, 0,
      0x01,
      0, 0, 2, 0,
      1, 0, 4, 0, 2, 0
    )
    assert(DeltaDv.decodePortable(payload).toSeq == Seq(4L, 5L, 6L))
  }

  test("round trip: array containers, bitmap container (>4096), multiple 16-bit and 32-bit keys") {
    val sparse = Seq(0L, 1L, 99L, 65536L + 7, (1L << 32) | 5, (1L << 32) | 70000)
    assert(DeltaDv.decodePortable(DeltaDv.encodePortable(sparse)).toSeq == sparse.sorted)
    // dense low range -> bitmap container (cardinality > 4096)
    val dense = (0L until 5000L) ++ Seq(100000L)
    assert(DeltaDv.decodePortable(DeltaDv.encodePortable(dense)).toSeq == dense.sorted)
  }

  test("base85: RFC 1924 alphabet round trip; zero block encodes to '00000'") {
    assert(DeltaDv.base85Encode(Array.fill[Byte](4)(0)) == "00000")
    val uuid = java.util.UUID.fromString("01234567-89ab-cdef-0123-456789abcdef")
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val enc = DeltaDv.base85Encode(bb.array())
    assert(enc.length == 20)
    val (prefix, parsed) = DeltaDv.parseUuidPath("ab/cd" + enc)
    assert(prefix == "ab/cd" && parsed == uuid)
    assert(DeltaDv.dvFileRelPath(enc) == s"deletion_vector_$uuid.bin")
    assert(DeltaDv.dvFileRelPath("xy" + enc) == s"xy/deletion_vector_$uuid.bin")
  }

  test("framing: version byte + BE size + CRC verified; corruption refused") {
    val payload = DeltaDv.encodePortable(Seq(2L, 9L))
    val (bin, off, size) = DeltaDv.frameFile(payload)
    assert(DeltaDv.unframe(bin, off, size).toSeq == payload.toSeq)
    val torn = bin.clone()
    torn(bin.length - 6) = (torn(bin.length - 6) ^ 0x7).toByte // inside payload
    val e = intercept[IllegalArgumentException](DeltaDv.unframe(torn, off, size))
    assert(e.getMessage.toLowerCase.contains("crc"))
    val badVer = bin.clone(); badVer(0) = 2
    val e2 = intercept[IllegalArgumentException](DeltaDv.unframe(badVer, off, size))
    assert(e2.getMessage.contains("version"))
  }
}
