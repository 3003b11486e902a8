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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"Md5Prefix60 requires a string input, got ${child.dataType}"
      )

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
    fold(d.digest(bytes))
  }

  /** The single home of the "first 60 bits" contract: (first 8 digest
    * bytes, big-endian) >>> 4 == the first 15 hex digits as an integer.
    * Shared by [[Md5Prefix60]] and [[ShingleHash60]].
    */
  def fold(digest: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}

/** MinHashSig(hashes) == array_min(transform(hashes, h -> (a_i*(h%p)+b_i)%p))
  * for each permutation i — one fused primitive loop instead of numHashes
  * interpreted array passes. Constants derive from the same splitmix formula
  * as Dedup.minhashSignatureFromHashes.
  *
  * Value-identical to the HOF formulation FOR NON-EMPTY inputs with at least
  * one non-null element (every caller filters `size(shingles) > 0` first).
  * Documented divergence on the degenerate cases: empty / all-null-element
  * arrays yield NULL here ("signature of nothing is undefined"), where the
  * HOF's array_min form yields an array of NULL elements; element
  * nullability also differs (containsNull=false here). Asserted in
  * VectorExprSpec.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashSig requires array<bigint>, got $dt"
        )
    }

  // Empty input (or all-null elements) yields NULL — a signature of nothing
  // is undefined, matching the spirit of array_min's null on empty. Null
  // ELEMENTS are skipped, as array_min does.
  override def nullSafeEval(v: Any): Any = {
    val sig = MinHashSig.signature(v.asInstanceOf[ArrayData], numHashes)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"""
        |long[] sig = graft.plans.MinHashSig$$.MODULE$$.signature($c, $numHashes);
        |if (sig == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(sig); }
       """.stripMargin
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  val P = 2147483647L // 2^31 - 1

  def a(i: Int): Long = 2L * ((i * 0x9E3779B97F4A7C15L) >>> 33) + 1
  def b(i: Int): Long = ((i * 0xC2B2AE3D27D4EB4FL) >>> 31) % P

  /** null when there are no (non-null) elements to hash. */
  def signature(arr: ArrayData, numHashes: Int): Array[Long] = {
    val n = arr.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var k = 0
    while (k < numHashes) {
      val ak = a(k); val bk = b(k)
      var j = 0
      var mn = Long.MaxValue
      while (j < n) {
        if (!arr.isNullAt(j)) {
          if (k == 0) any = true
          val hm = { val m = arr.getLong(j) % P; if (m < 0) m + P else m }
          val v = (ak * hm + bk) % P
          if (v < mn) mn = v
        }
        j += 1
      }
      out(k) = mn
      k += 1
    }
    if (n == 0 || !any) null else out
  }
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) via java.text.Normalizer —
  * the text-cleaning primitive for multi-source corpora where visually
  * identical strings differ in codepoint composition (and so in every hash,
  * dedup fingerprint, and join key). Codegen'd; DuckDB twin: nfc_normalize.
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && UnicodeNormalize.forms.contains(form))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"UnicodeNormalize requires a string input and form in ${UnicodeNormalize.forms.keys}, got ${child.dataType}/$form"
      )

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UnicodeNormalize.normalize(v.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c =>
        s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"""graft.plans.UnicodeNormalize$$.MODULE$$.normalize($c.toString(), "$form"))"""
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val forms: Map[String, java.text.Normalizer.Form] = Map(
    "NFC" -> java.text.Normalizer.Form.NFC,
    "NFD" -> java.text.Normalizer.Form.NFD,
    "NFKC" -> java.text.Normalizer.Form.NFKC,
    "NFKD" -> java.text.Normalizer.Form.NFKD
  )
  def normalize(s: String, form: String): String =
    java.text.Normalizer.normalize(s, forms(form))
}

/** SimHash60(tokens) == the HOF formulation in Dedup.simhash60 (md5-prefix
  * token hashes, 60 bit-vote counters, positive votes set bits), fused into
  * one loop: the interpreted `aggregate`/`zip_with` evaluates a 60-branch
  * lambda per token with a fresh 60-element array per step. Pure integer
  * arithmetic — value-identical by construction (parity-tested), so the
  * q38/q39/q65 oracles are unaffected. Empty/all-null token arrays sketch
  * to 0 (matching the HOF's zero-counter outcome).
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SimHash60 requires array<string>, got $dt"
        )
    }

  override def nullSafeEval(v: Any): Any =
    SimHash60.sketch(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash60$$.MODULE$$.sketch($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object SimHash60 {
  def sketch(arr: ArrayData): Long = {
    val counters = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = Md5Prefix60.hash(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (counters(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

/** ShingleHash60(tokens, n) ==
  * transform(wordShinglesFromTokens(tokens, n), s -> Md5Prefix60(s)) —
  * the tokenize→shingle→hash chain fused into one expression that streams
  * each n-token window's bytes (tokens joined by a single space, exactly
  * concat_ws's output for non-null tokens) straight into the MD5 digest:
  * no shingle strings are ever materialized, no interpreted lambda runs
  * per window. Fewer than n tokens → empty array. Null token elements are
  * skipped by concat_ws in the HOF formulation; token arrays here never
  * contain nulls (split output) — parity is asserted on real corpora.
  */
case class ShingleHash60(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ShingleHash60 requires array<string> and n > 0, got $dt / n=$n"
        )
    }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(ShingleHash60.hashes(v.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c =>
        s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.plans.ShingleHash60$$.MODULE$$.hashes($c, $n))"
    )

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object ShingleHash60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val SPACE = Array[Byte](' ')

  def hashes(arr: ArrayData, n: Int): Array[Long] = {
    val len = arr.numElements()
    if (len < n) return Array.emptyLongArray
    // pre-fetch token bytes once: each token participates in up to n windows
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val d = md.get()
    val out = new Array[Long](len - n + 1)
    var s = 0
    while (s <= len - n) {
      d.reset()
      var j = 0
      var first = true
      while (j < n) {
        val t = toks(s + j)
        if (t != null) { // concat_ws skips null elements
          if (!first) d.update(SPACE)
          d.update(t)
          first = false
        }
        j += 1
      }
      out(s) = Md5Prefix60.fold(d.digest())
      s += 1
    }
    out
  }
}

object HashExpressions {
  def md5Prefix60(c: Column): Column = ColumnShim.column(Md5Prefix60(ColumnShim.expression(c)))
  def shingleHash60(tokens: Column, n: Int): Column =
    ColumnShim.column(ShingleHash60(ColumnShim.expression(tokens), n))
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    ColumnShim.column(UnicodeNormalize(ColumnShim.expression(c), form))
  def minhashSig(c: Column, numHashes: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(c), numHashes))
  def simhash60(tokens: Column): Column = ColumnShim.column(SimHash60(ColumnShim.expression(tokens)))
}
