package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (§2.9 UDAF tier): keeps only k (score, id)
  * pairs per group through partial aggregation, so a grouped top-k
  * never materializes or sorts whole partitions — the buffer that
  * crosses the shuffle is ≤ k rows per group per map task, vs the
  * window-function formulation (q13) which shuffles every row and
  * sorts each partition. At 100 TB with small k this is the difference
  * between a bounded-state agg and a full sort.
  *
  * Deterministic: ordering is (score desc, id asc) with the id as the
  * total tiebreak, so results are stable across shuffle orders.
  */
object TopKAggregator {

  final case class Scored(id: Long, score: Double)
  final case class TopBuf(items: Seq[Scored])

  def ordering: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)](s => (-s.score, s.id))

  final class TopK(k: Int) extends Aggregator[Scored, TopBuf, TopBuf] {
    override def zero: TopBuf = TopBuf(Seq.empty)
    override def reduce(b: TopBuf, a: Scored): TopBuf = {
      // fast path for the dominant case: buffer is full and the new row
      // ranks at-or-below the current worst — no allocation, no sort.
      // (`items` is kept sorted best-first by construction, so `last`
      // IS the worst kept row.)
      if (b.items.size >= k && ordering.lteq(b.items.last, a)) b
      else TopBuf((a +: b.items).sorted(ordering).take(k))
    }
    override def merge(x: TopBuf, y: TopBuf): TopBuf =
      TopBuf((x.items ++ y.items).sorted(ordering).take(k))
    override def finish(r: TopBuf): TopBuf = r
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }
}
