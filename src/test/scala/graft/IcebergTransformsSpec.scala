package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IcebergTransforms

/** Pin the transform replay to the Iceberg table spec's OWN test vectors
  * (Appendix B for bucket hashes; the transforms table for temporal and
  * truncate examples) — hidden-partition pruning is only sound if the
  * derived values match what real writers stored, bit for bit.
  */
class IcebergTransformsSpec extends AnyFunSuite {

  test("murmur3 bucket hashes match the spec's Appendix B vectors") {
    def h(t: DataType, raw: String): Int = {
      // derive with a huge N: (hash & MaxInt) % N == hash & MaxInt, so
      // recover sign-stripped hash; check via the published bucket values
      IcebergTransforms.derive(s"bucket[${Int.MaxValue}]", t, raw).toInt
    }
    assert(h(IntegerType, "34") == (2017239379 & Int.MaxValue))
    assert(h(LongType, "34") == (2017239379 & Int.MaxValue))
    assert(h(StringType, "iceberg") == (1210000089 & Int.MaxValue))
    assert(h(DateType, "2017-11-16") == (-653330422 & Int.MaxValue))
    assert(h(TimestampNTZType, "2017-11-16T22:31:08") == (-2047944441 & Int.MaxValue))
    // and the modular reduction
    assert(IcebergTransforms.derive("bucket[16]", StringType, "iceberg") ==
      String.valueOf((1210000089 & Int.MaxValue) % 16))
  }

  test("temporal transforms match the spec's examples") {
    assert(IcebergTransforms.derive("day", DateType, "2017-11-16") == "17486")
    assert(IcebergTransforms.derive("days", TimestampNTZType, "2017-11-16 22:31:08") == "17486")
    assert(IcebergTransforms.derive("hour", TimestampNTZType, "2017-11-16T22:31:08") == "419686")
    assert(IcebergTransforms.derive("month", DateType, "2017-11-16") == "574")
    assert(IcebergTransforms.derive("year", DateType, "2017-11-16") == "47")
    // pre-epoch floors toward negative infinity, not toward zero
    assert(IcebergTransforms.derive("day", DateType, "1969-12-31") == "-1")
    assert(IcebergTransforms.derive("year", DateType, "1969-01-01") == "-1")
  }

  test("truncate matches the spec's width semantics") {
    assert(IcebergTransforms.derive("truncate[10]", StringType, "iceberg") == "iceberg")
    assert(IcebergTransforms.derive("truncate[3]", StringType, "iceberg") == "ice")
    assert(IcebergTransforms.derive("truncate[10]", IntegerType, "1") == "0")
    assert(IcebergTransforms.derive("truncate[10]", IntegerType, "-1") == "-10")
    assert(IcebergTransforms.derive("truncate[10]", LongType, "25") == "20")
  }

  test("unsupported transforms and types are refused loudly") {
    assert(!IcebergTransforms.supported("void"))
    intercept[IllegalArgumentException](
      IcebergTransforms.derive("void", StringType, "x"))
    intercept[IllegalArgumentException](
      IcebergTransforms.derive("bucket[4]", DoubleType, "1.5"))
    intercept[IllegalArgumentException](
      IcebergTransforms.derive("truncate[4]", DateType, "2020-01-01"))
  }
}
