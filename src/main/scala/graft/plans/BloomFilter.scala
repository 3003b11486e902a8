package graft.plans

import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Portable Bloom filter over the engine's 60-bit hash family
  * ([[Md5Prefix60]]): the compact alternative to q78's broadcast postings
  * join for benchmark decontamination — a 100M-n-gram eval suite collapses
  * to an m-bit array (32 KiB at m=2^18) that broadcasts to every executor
  * once, instead of a postings dimension that must be hashed and probed as
  * a join relation.
  *
  * DETERMINISM CONTRACT (what keeps the DuckDB oracle able to replay
  * membership bit-for-bit, false positives included): the k probe
  * positions derive from the hash by double hashing with an ODD step —
  *   p_i = (h % m  +  i * (1 + 2*((h / m) % (m/2)))) % m
  * — all BIGINT arithmetic, no floats, no platform hashing. An odd step is
  * coprime to the power-of-two m, so the k probes never collapse onto one
  * cell. False-positive rate follows the standard (1 - e^{-kn/m})^k; at
  * n distinct n-grams = m/8 and k = 3 that is ~0.4%, and callers gate on
  * `minHits` n-grams per document rather than one bit, which drives the
  * per-document false-flag rate to negligible.
  */
object BloomFilter {

  /** i-th probe position for hash `h` in an m-cell filter (m a power of
    * two, h non-negative — the 60-bit family guarantees that).
    */
  def position(h: Long, m: Int, i: Int): Long = {
    val step = 1L + 2L * ((h / m) % (m / 2))
    (h % m + i * step) % m
  }

  /** All k probe bits of `h` set in `bits`? */
  def contains(bits: Array[Byte], m: Int, k: Int, h: Long): Boolean = {
    var i = 0
    while (i < k) {
      val p = position(h, m, i)
      if ((bits((p >>> 3).toInt) & (1 << (p & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  private def setBit(bits: Array[Byte], p: Long): Unit =
    bits((p >>> 3).toInt) = (bits((p >>> 3).toInt) | (1 << (p & 7).toInt)).toByte

  /** Mergeable bitset-building Aggregator: each partition folds its hashes
    * into a local m-bit array (map-side, no shuffle of individual
    * hashes — the whole point at 100 TB), partials OR together, one
    * m/8-byte row reaches the driver. The same mergeable shape as the HLL
    * and MinHash aggregators.
    */
  final class BloomAgg(m: Int, k: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
    override def zero: Array[Byte] = new Array[Byte](m / 8)
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      var i = 0
      while (i < k) { setBit(b, position(h, m, i)); i += 1 }
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build the bitset from a Dataset of 60-bit hashes — one distributed
    * aggregation, a single m/8-byte result row on the driver (bounded by
    * construction, independent of input size).
    */
  def build(hashes: Dataset[Long], m: Int, k: Int): Array[Byte] =
    hashes.select(new BloomAgg(m, k).toColumn).head()

  /** Membership probe as a codegen'd Catalyst expression over a hash
    * column: the bitset rides the expression into the generated code as a
    * referenced object (one array per executor JVM, shared by all tasks).
    */
  def containsColumn(bits: Array[Byte], m: Int, k: Int, hash: Column): Column =
    ColumnShim.column(BloomContains(ColumnShim.expression(hash), bits, m, k))
}

/** `BloomContains(h)` == all k probe bits of `h` set — see
  * [[BloomFilter.position]] for the portable probe-position contract.
  */
case class BloomContains(child: Expression, bits: Array[Byte], m: Int, k: Int) extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"BloomContains requires a long hash input, got ${child.dataType}"
      )

  override def nullSafeEval(v: Any): Any =
    BloomFilter.contains(bits, m, k, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.BloomFilter$$.MODULE$$.contains($ref, $m, $k, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}
