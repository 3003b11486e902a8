package graft.plans

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** PER-ROW OUTER-PRODUCT FOLD for the cross-dimension covariance matrix —
  * the documented escape hatch of [[graft.operators.Similarity.covarianceMatrix]]
  * (SCALE.md q198 entry): the join formulation posexplodes every vector to
  * n·dim rows and exchanges them once; at a corpus where even that linear
  * exchange dominates, this aggregator folds each row's dim·(dim+1)/2
  * products into a single mergeable buffer INSIDE the scan — zero joins,
  * zero explode, one object-hash aggregation whose map-side partials are
  * one ~34 KB buffer per partition, and exactly dim·(dim+1)/2 output cells
  * cross the final (single-row) exchange.
  *
  * Exactness contract (oracle-gated equal to q198, bit for bit):
  *  - values are the same e6-floored longs (`floor(v_double · 1e6)` per
  *    element, computed once per row instead of once per join side);
  *  - second moments Σvᵢvⱼ accumulate in 128-bit (two-long limbs,
  *    `Math.multiplyHigh` + carry adds) — exact at ANY corpus size, where
  *    a 64-bit Σvᵢvⱼ would wrap past ~9·10⁶ worst-case (±1-valued) rows;
  *  - first moments Σvᵢ are 64-bit: |vᵢ| ≤ 1e6·max|v| keeps them exact to
  *    ~9·10¹² rows — beyond any corpus this engine targets (documented
  *    bound, checked nowhere hot);
  *  - the final covariance uses BigInteger arithmetic with
  *    truncate-toward-zero division — the same DECIMAL(38,0) `div`
  *    semantics both engines replay.
  *
  * Buffer layout (Array[Long], flat so the ExpressionEncoder stays a
  * primitive-array codec): [0] = n; [1..dim] = Σvᵢ; then per upper-triangle
  * pair p (row-major, i ≤ j): [1+dim+2p] = Σvᵢvⱼ high limb (signed),
  * [1+dim+2p+1] = low limb (unsigned).
  */
class CovarianceFoldAgg(dim: Int) extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {
  require(dim >= 1, s"CovarianceFoldAgg: dim=$dim must be >= 1")
  private val nPairs = dim * (dim + 1) / 2
  private val base = 1 + dim

  override def zero: Array[Long] = new Array[Long](base + 2 * nPairs)

  /** 128-bit accumulate: buf[hiIdx, hiIdx+1] += (signed 128-bit) a·b. */
  private def addProduct(buf: Array[Long], hiIdx: Int, a: Long, b: Long): Unit = {
    val pHi = Math.multiplyHigh(a, b)
    val pLo = a * b
    val oldLo = buf(hiIdx + 1)
    val newLo = oldLo + pLo
    // unsigned-add carry-out: standard bit identity over the two operands
    // and the result sign bits
    val carry = ((oldLo & pLo) | ((oldLo | pLo) & ~newLo)) >>> 63
    buf(hiIdx + 1) = newLo
    buf(hiIdx) = buf(hiIdx) + pHi + carry
  }

  override def reduce(buf: Array[Long], v: Seq[Float]): Array[Long] = {
    if (v == null) return buf
    require(v.length == dim,
      s"CovarianceFoldAgg: vector of length ${v.length}, expected $dim (ragged input would " +
        "silently skew per-pair counts — the join formulation's n-per-pair semantics need them fixed-width)")
    val e = new Array[Long](dim)
    var i = 0
    while (i < dim) { e(i) = math.floor(v(i).toDouble * 1000000.0).toLong; i += 1 }
    buf(0) += 1L
    i = 0
    var p = 0
    while (i < dim) {
      buf(1 + i) += e(i)
      var j = i
      while (j < dim) {
        addProduct(buf, base + 2 * p, e(i), e(j))
        p += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    a(0) += b(0)
    var i = 0
    while (i < dim) { a(1 + i) += b(1 + i); i += 1 }
    var p = 0
    while (p < nPairs) {
      val hiIdx = base + 2 * p
      val oldLo = a(hiIdx + 1)
      val addLo = b(hiIdx + 1)
      val newLo = oldLo + addLo
      val carry = ((oldLo & addLo) | ((oldLo | addLo) & ~newLo)) >>> 63
      a(hiIdx + 1) = newLo
      a(hiIdx) = a(hiIdx) + b(hiIdx) + carry
      p += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object CovarianceFoldAgg {
  private val U64Mask = (BigInt(1) << 64) - 1

  /** Decode one packed buffer into (dim_i, dim_j, n, cov_e12) cells with
    * the oracle's integer semantics: cov = (n·Σvᵢvⱼ − Σvᵢ·Σvⱼ) div n²,
    * BigInteger division truncating toward zero (= DECIMAL `div`).
    *
    * n = 0 (empty corpus) decodes to ZERO cells — matching the join
    * formulation, whose groupBy over an empty exploded frame emits an
    * empty result (ADVICE r16: a throw here diverged the two formulations'
    * "interchangeable bit for bit" contract exactly on empty input).
    */
  def cells(dim: Int, buf: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
    val n = buf(0)
    if (n == 0) return Seq.empty
    val base = 1 + dim
    val nBig = BigInt(n)
    val den = nBig * nBig
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    var i = 0
    var p = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val hi = buf(base + 2 * p)
        val lo = buf(base + 2 * p + 1)
        val sij = (BigInt(hi) << 64) + (BigInt(lo) & U64Mask)
        val num = nBig * sij - BigInt(buf(1 + i)) * BigInt(buf(1 + j))
        out += ((i.toLong, j.toLong, n, (num / den).toLong))
        p += 1
        j += 1
      }
      i += 1
    }
    out.result()
  }
}
