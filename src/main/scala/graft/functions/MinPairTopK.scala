package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-heap SMALLEST-k for (id, dist) pairs — the PQ shortlist's
  * aggregation tier ([[graft.operators.ProductQuantization.serve]]).
  *
  * [[TopKAggregator]] keeps its buffer as an immutable sorted Seq —
  * right for k ≤ 5 grouped top-k, but O(k) per input row (the
  * size/last probes walk the list), which at the ADC tier's
  * n·q candidate rows × k = 200 is billions of pointer hops. This
  * buffer is a mutable primitive-array max-heap: the dominant case
  * (candidate worse than the current k-th best) is ONE root compare,
  * inserts are O(log k) with zero allocation, and the partial state
  * crossing the shuffle stays ≤ k pairs per group per map task — never
  * a full n·q sort.
  *
  * Deterministic: ordering is (dist asc, id asc) — a total order, so
  * the kept SET (and the finish-sorted output) is independent of
  * arrival/shuffle order.
  */
object MinPairTopK {

  final case class Hit(vec_id: Long, adc_dist: Long)
  final case class Hits(items: Seq[Hit])

  /** Max-heap over (dist, id) holding the k lexicographically-smallest
    * pairs seen; root = worst kept pair. Kryo-encoded (object-hash
    * aggregation keeps the live object per group; serialization only
    * at partial-aggregate output or spill). */
  final class PairHeap(val k: Int) extends Serializable {
    var n: Int = 0
    val dists: Array[Long] = new Array[Long](k)
    val ids: Array[Long] = new Array[Long](k)

    @inline private def gt(d1: Long, i1: Long, d2: Long, i2: Long): Boolean =
      d1 > d2 || (d1 == d2 && i1 > i2)

    def offer(dist: Long, id: Long): Unit = {
      if (n < k) {
        var i = n
        dists(i) = dist; ids(i) = id; n += 1
        while (i > 0 && gt(dists(i), ids(i), dists((i - 1) / 2), ids((i - 1) / 2))) {
          val p = (i - 1) / 2
          swap(i, p); i = p
        }
      } else if (k > 0 && gt(dists(0), ids(0), dist, id)) {
        dists(0) = dist; ids(0) = id
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = l + 1
          var big = i
          if (l < n && gt(dists(l), ids(l), dists(big), ids(big))) big = l
          if (r < n && gt(dists(r), ids(r), dists(big), ids(big))) big = r
          if (big == i) done = true
          else { swap(i, big); i = big }
        }
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val td = dists(a); dists(a) = dists(b); dists(b) = td
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }
  }

  /** Aggregator over (group_key, id, dist) tuples: keeps the k pairs
    * smallest by (dist asc, id asc); finish emits them ascending. */
  final class SmallestK(k: Int)
      extends Aggregator[(Long, Long, Long), PairHeap, Hits] {
    override def zero: PairHeap = new PairHeap(k)
    override def reduce(b: PairHeap, a: (Long, Long, Long)): PairHeap = {
      b.offer(a._3, a._2); b
    }
    override def merge(x: PairHeap, y: PairHeap): PairHeap = {
      var i = 0
      while (i < y.n) { x.offer(y.dists(i), y.ids(i)); i += 1 }
      x
    }
    override def finish(r: PairHeap): Hits = {
      val pairs = Array.tabulate(r.n)(i => (r.dists(i), r.ids(i)))
        .sorted(Ordering.Tuple2[Long, Long])
      Hits(pairs.toIndexedSeq.map { case (d, id) => Hit(id, d) })
    }
    override def bufferEncoder: Encoder[PairHeap] = Encoders.kryo[PairHeap]
    override def outputEncoder: Encoder[Hits] = Encoders.product[Hits]
  }
}
