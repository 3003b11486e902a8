package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd replacements for the two interpreted hot loops of the dedup
  * pipeline. Both are value-identical to their `functions._` formulations
  * (asserted in tests), which is what keeps the DuckDB oracles green.
  */

/** Md5Prefix60(s) == conv(substring(md5(s),1,15),16,10) cast long:
  * the first 60 bits of md5, i.e. (first 8 bytes big-endian) >>> 4 —
  * computed straight from the digest bytes, skipping the
  * hex-string -> BigInt -> string -> long round trip.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    Md5Prefix60.hash(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Prefix60$$.MODULE$$.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

object Md5Prefix60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** first 60 bits of md5(bytes), as a non-negative long */
  def hash(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (dig(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}

/** MinHashSig(hashes) == array_min(transform(hashes, h -> (a_i*(h%p)+b_i)%p))
  * for each permutation i — one fused primitive loop instead of numHashes
  * interpreted array passes. Constants derive from the same splitmix formula
  * as Dedup.minhashSignatureFromHashes.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    new GenericArrayData(MinHashSig.signature(arr.toLongArray(), numHashes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c =>
        s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.plans.MinHashSig$$.MODULE$$.signature($c.toLongArray(), $numHashes))"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  val P = 2147483647L // 2^31 - 1

  def a(i: Int): Long = 2L * ((i * 0x9E3779B97F4A7C15L) >>> 33) + 1
  def b(i: Int): Long = ((i * 0xC2B2AE3D27D4EB4FL) >>> 31) % P

  def signature(hashes: Array[Long], numHashes: Int): Array[Long] = {
    val out = Array.fill(numHashes)(Long.MaxValue)
    var k = 0
    while (k < numHashes) {
      val ak = a(k); val bk = b(k)
      var j = 0
      var mn = Long.MaxValue
      while (j < hashes.length) {
        val hm = { val m = hashes(j) % P; if (m < 0) m + P else m }
        val v = (ak * hm + bk) % P
        if (v < mn) mn = v
        j += 1
      }
      out(k) = mn
      k += 1
    }
    out
  }
}

object HashExpressions {
  def md5Prefix60(c: Column): Column = ColumnShim.column(Md5Prefix60(ColumnShim.expression(c)))
  def minhashSig(c: Column, numHashes: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(c), numHashes))
}
