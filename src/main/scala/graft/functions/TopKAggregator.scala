package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: per-group top-k of (id, score) pairs with a bounded
  * buffer — the UDAF leg of the similarity suite.
  *
  * The rank-window formulation sorts every group's candidates before
  * cutting at k (WindowGroupLimit bounds the shuffle but each partial
  * still sorts); this aggregator carries at most `4k` entries per partial
  * state, trims lazily, and merges associatively — O(n log k) work,
  * O(k) state, no per-group sort of the full candidate list. At 100 TB
  * the difference is shuffling k rows per group versus the group.
  *
  * Ordering matches the window variant exactly: score descending, id
  * ascending on ties.
  */
class TopKAggregator[IN](k: Int, id: IN => Long, score: IN => Double)
    extends Aggregator[IN, List[(Double, Long)], Seq[(Long, Double)]] {

  private val cap = 4 * k

  private def top(l: List[(Double, Long)]): List[(Double, Long)] =
    l.sortBy { case (score, id) => (-score, id) }.take(k)

  private def trim(l: List[(Double, Long)]): List[(Double, Long)] =
    if (l.lengthCompare(cap) <= 0) l else top(l)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(b: List[(Double, Long)], a: IN): List[(Double, Long)] =
    trim((score(a), id(a)) :: b)

  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
    trim(b1 ::: b2)

  override def finish(r: List[(Double, Long)]): Seq[(Long, Double)] =
    top(r).map { case (score, id) => (id, score) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
