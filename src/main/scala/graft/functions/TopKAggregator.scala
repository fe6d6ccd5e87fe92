package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

import scala.collection.mutable

/** Typed UDAF surface (SURVEY.md §2.10): single-pass bounded top-k by score.
  *
  * At scale this replaces sort-based top-k when k is small and the scoring
  * rows are already spread across many partitions: each partition keeps a
  * k-bounded heap (O(n log k) / O(k) memory), merge is heap-union — no
  * global sort, no shuffle of anything but k rows per partition. Spark's own
  * TakeOrderedAndProject does this for ORDER BY+LIMIT plans; the Aggregator
  * form composes inside groupBy (top-k PER GROUP in one pass).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), mutable.PriorityQueue[(Double, Long)], Seq[(Long, Double)]] {

  // min-heap on score: the head is the weakest of the current top-k
  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)](identity).reverse

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(ord)

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

  override def finish(heap: mutable.PriorityQueue[(Double, Long)]): Seq[(Long, Double)] =
    heap.dequeueAll.reverse.map((t: (Double, Long)) => (t._2, t._1)).toSeq

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}
