package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

import scala.collection.mutable

/** Bounded top-k by (score DESC, id ASC) — the retrieval ranking order
  * ([[TopKAggregator]]'s sibling; that one ranks by (score, id) ASC-tuple
  * order and keeps the largest, which breaks score ties toward the LARGER
  * id — search ranking wants the smaller id to win ties, matching
  * `ORDER BY score DESC, doc_id ASC` in the oracle SQL).
  *
  * Each partition keeps a k-bounded heap whose head is the current WORST
  * candidate under the ranking order; merge is heap-union. O(n log k) work,
  * O(k) state, k rows per partition on the shuffle — replaces per-group
  * window sorts when groups are large (a stopword-dense BM25 batch scores
  * hundreds of thousands of docs per query). */
class TopKByScoreAggregator(k: Int)
    extends Aggregator[(Long, Double), mutable.PriorityQueue[(Double, Long)], Seq[(Long, Double)]] {

  // Ranking order: better = higher score, then smaller id. The max-heap
  // under this ordering keeps the WORST candidate at the head for O(log k)
  // eviction: head = lowest score (largest id among score-ties).
  // Scores compare via java.lang.Double.compare, which is a TOTAL order
  // even over NaN (NaN sorts above +Inf, so a NaN score ranks "best" —
  // deterministically — instead of making lt(a,b) and lt(b,a) both false
  // and corrupting heap eviction; ADVICE r8). Current callers feed
  // DECIMAL-cast sums so NaN is unreachable there, but the Aggregator is
  // general-purpose and must stay a lawful ordering for any input.
  private def worstFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan[(Double, Long)] { case ((s1, i1), (s2, i2)) =>
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2) // "less" = better → head is worst
    }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def reduce(heap: mutable.PriorityQueue[(Double, Long)],
                      row: (Long, Double)): mutable.PriorityQueue[(Double, Long)] = {
    heap.enqueue((row._2, row._1))
    while (heap.size > k) heap.dequeue()
    heap
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(a.enqueue(_))
    while (a.size > k) a.dequeue()
    a
  }

  /** Best-first (rank order): sort the k survivors by (score desc, id asc)
    * under the SAME total order the heap evicts by (Double.compare — the
    * negate-and-sortBy idiom would diverge from it on NaN/-0.0). */
  override def finish(heap: mutable.PriorityQueue[(Double, Long)]): Seq[(Long, Double)] =
    heap.dequeueAll[(Double, Long)].toSeq
      .sortWith { case ((s1, i1), (s2, i2)) =>
        val c = java.lang.Double.compare(s1, s2)
        c > 0 || (c == 0 && i1 < i2)
      }
      .map((t: (Double, Long)) => (t._2, t._1))

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
