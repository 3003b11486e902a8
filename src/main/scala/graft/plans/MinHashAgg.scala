package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: union-MinHash over a GROUP of documents.
  *
  * MinHash signatures are mergeable sketches: the signature of a union of
  * sets is the element-wise min of the signatures. This aggregator folds
  * per-row signature arrays into a group signature (e.g. one signature per
  * source/domain), enabling corpus-level similarity: J(A,B) ~ fraction of
  * agreeing signature slots. Mergeability = map-side partial aggregation,
  * so the shuffle carries one small array per group per partition — the
  * same property that makes it work on 10^12 documents.
  */
class MinHashUnionAgg(numHashes: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    // MinHashSig yields NULL for empty/all-null shingle arrays (documented
    // divergence): an empty set contributes nothing to a union, so skip it
    // rather than NPE the whole group
    if (sig == null) return buf
    var i = 0
    val n = math.min(buf.length, sig.length)
    while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** Estimated Jaccard between two group signatures: agreeing-slot fraction. */
  def estimatedJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) 0.0 else (0 until n).count(i => a(i) == b(i)).toDouble / n
  }
}
