package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator (SURVEY.md §7.4's flagged custom piece).
  *
  * A window `row_number() <= k` top-k sorts EVERY candidate per group
  * before discarding all but k — O(n log n) per group and the whole
  * candidate set shuffles into the window sort. This typed Aggregator
  * keeps a bounded k-element min-heap per group: O(n log k) work,
  * O(k) state, and it merges map-side — partial heaps combine in the
  * shuffle, so only k rows per group per mapper ever move. At 100 TB
  * (ANN scoring joins emitting billions of candidates) this is the
  * difference between shuffling the candidate space and shuffling
  * k · |groups| rows.
  *
  * Deterministic total order: by score descending, then payload
  * ascending — mirrors the window ordering
  * `orderBy(score.desc, id.asc)` so both implementations agree.
  *
  * Usage (typed):
  * {{{
  * ds.groupByKey(_.query_id)
  *   .agg(TopKAggregator.topK(5).toColumn)
  * }}}
  */
object TopKAggregator {

  /** (score, payload) pair; payload is the tiebreak + result id. */
  type Scored = (Double, Long)

  final class TopK(k: Int) extends Aggregator[Scored, mutable.PriorityQueue[Scored], Seq[Scored]] {
    require(k > 0, "k must be positive")

    // "badness" order: greater = worse (lower score, then higher id).
    // Scala's PriorityQueue is a MAX-heap, so `head`/`dequeue` is the
    // WORST kept element — exactly what bounded top-k evicts.
    private def heapOrder: Ordering[Scored] =
      Ordering.by[Scored, (Double, Long)] { case (s, id) => (-s, id) }

    override def zero: mutable.PriorityQueue[Scored] =
      mutable.PriorityQueue.empty[Scored](heapOrder)

    private def push(h: mutable.PriorityQueue[Scored], v: Scored): mutable.PriorityQueue[Scored] = {
      if (h.size < k) h.enqueue(v)
      else if (heapOrder.lt(v, h.head)) { h.dequeue(); h.enqueue(v) } // v better than worst
      h
    }

    override def reduce(h: mutable.PriorityQueue[Scored], v: Scored) = push(h, v)

    override def merge(a: mutable.PriorityQueue[Scored], b: mutable.PriorityQueue[Scored]) =
      b.foldLeft(a)(push)

    /** Best-first output: score desc, payload asc. */
    override def finish(h: mutable.PriorityQueue[Scored]): Seq[Scored] =
      h.toSeq.sortBy { case (s, id) => (-s, id) }

    // buffer is engine-internal → kryo; output is a real SQL value
    // (array<struct<score,id>>) so downstream plans can explode it
    override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
      Encoders.kryo[mutable.PriorityQueue[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  def topK(k: Int): TopK = new TopK(k)
}
