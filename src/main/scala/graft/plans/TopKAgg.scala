package graft.plans

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: bounded per-group top-k, (score desc, id asc).
  *
  * The scale argument vs the window formulation (`row_number over
  * (partition by g order by s desc)` + filter): a window sorts EVERY
  * group's full row set after shuffling all of it; this aggregator keeps
  * at most k (score, id) pairs per group per partition map-side, so the
  * shuffle carries <= k rows per group per upstream partition and no sort
  * ever sees more than the merged partials. Same mergeable-sketch shape
  * as [[MinHashUnionAgg]] — merge of two top-k buffers is the top-k of
  * their union, so partial aggregation is lossless (proven in
  * AggExtensionsSpec against the window formulation).
  *
  * Determinism: ties break by ascending id — total order, so the kept set
  * and ranks are unique and oracle-replayable.
  */
class TopKByScoreAgg(k: Int) extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long, Long)]] {
  require(k > 0, s"TopKByScoreAgg: k=$k must be positive")

  // total order: score desc, then id asc
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Nil

  /** Buffer invariant: sorted best-first, length <= k. A row that cannot
    * beat the current worst of a full buffer is dropped in O(1).
    */
  override def reduce(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size < k) (buf :+ x).sortWith(better)
    else if (better(x, buf.last)) (buf.init :+ x).sortWith(better)
    else buf

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sortWith(better).take(k)

  /** (rank 1-based, id, score), best first. */
  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    buf.zipWithIndex.map { case ((score, id), i) => (i + 1L, id, score) }

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] = ExpressionEncoder()
}

/** [[TopKByScoreAgg]] over DOUBLE scores with an opaque long payload riding
  * along with each kept id — the kNN-screen shape, where every kept
  * neighbor brings its LABEL to the majority vote. Same bounded-heap
  * contract: at most k (score, id, payload) triples per group per map
  * partition, merge = top-k of the union (lossless partials), total order
  * (score desc, id asc) so the kept set is unique and oracle-replayable.
  * The payload never participates in ordering.
  *
  * Raw IEEE doubles, not a quantization: the score is the same cosine
  * expression the exact formulation ranks on, so swapping the window for
  * this aggregator cannot move a single rank.
  */
class TopKByDoubleScoreAgg(k: Int)
    extends Aggregator[(Double, Long, Long), Seq[(Double, Long, Long)], Seq[(Long, Long, Double, Long)]] {
  require(k > 0, s"TopKByDoubleScoreAgg: k=$k must be positive")

  private def better(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long, Long)], x: (Double, Long, Long)): Seq[(Double, Long, Long)] =
    if (buf.size < k) (buf :+ x).sortWith(better)
    else if (better(x, buf.last)) (buf.init :+ x).sortWith(better)
    else buf

  override def merge(a: Seq[(Double, Long, Long)], b: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] =
    (a ++ b).sortWith(better).take(k)

  /** (rank 1-based, id, score, payload), best first. */
  override def finish(buf: Seq[(Double, Long, Long)]): Seq[(Long, Long, Double, Long)] =
    buf.zipWithIndex.map { case ((score, id, payload), i) => (i + 1L, id, score, payload) }

  override def bufferEncoder: Encoder[Seq[(Double, Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long, Double, Long)]] = ExpressionEncoder()
}
