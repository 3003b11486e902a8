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
