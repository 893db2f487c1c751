package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

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

  /** Max-heap over (dist, id) holding the k lexicographically-smallest
    * pairs seen; root = worst kept pair. Object-hash aggregation keeps
    * the live object per group; [[PairTopKAgg.serialize]] byte-packs it
    * only at partial-aggregate output or spill. */
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

  /** Native form of the bounded-heap smallest-k: a
    * [[TypedImperativeAggregate]] over two LONG child expressions
    * (dist, id), so candidate rows flow from the producing operator's
    * codegen straight into `update` as InternalRows — no AppendColumns
    * / object-encoder boundary deserializing every candidate to a
    * Tuple (measured on the sf1 ann_serve micro-batch, 25M candidate
    * rows: the typed-Dataset path's per-row objects dominated the
    * batch at ~5.5 s; this path reads two primitive columns). Output:
    * array<struct<vec_id, adc_dist>> sorted by (dist asc, id asc) —
    * posexplode for ranks. */
  case class PairTopKAgg(
      k: Int,
      dist: Expression,
      id: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[PairHeap] {

    override def prettyName: String = "pair_topk"
    override def children: Seq[Expression] = Seq(dist, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("adc_dist", LongType, nullable = false))), containsNull = false)

    override def createAggregationBuffer(): PairHeap = new PairHeap(k)

    override def update(b: PairHeap, input: InternalRow): PairHeap = {
      val d = dist.eval(input)
      val i = id.eval(input)
      // null candidates (a malformed code row) are skipped, matching
      // the window formulation's NULLS-excluded ordering semantics
      if (d != null && i != null)
        b.offer(d.asInstanceOf[Long], i.asInstanceOf[Long])
      b
    }

    override def merge(x: PairHeap, y: PairHeap): PairHeap = {
      var i = 0
      while (i < y.n) { x.offer(y.dists(i), y.ids(i)); i += 1 }
      x
    }

    override def eval(b: PairHeap): Any = {
      val pairs = Array.tabulate(b.n)(i => (b.dists(i), b.ids(i)))
        .sorted(Ordering.Tuple2[Long, Long])
      new GenericArrayData(pairs.map { case (d, i) =>
        InternalRow(i, d): Any
      })
    }

    override def serialize(b: PairHeap): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 16 * b.n)
      bb.putInt(b.k).putInt(b.n)
      var i = 0
      while (i < b.n) { bb.putLong(b.dists(i)).putLong(b.ids(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): PairHeap = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val h = new PairHeap(bb.getInt())
      val n = bb.getInt()
      var i = 0
      // heap layout round-trips verbatim (same array order), so no
      // re-heapify is needed
      while (i < n) { h.dists(i) = bb.getLong(); h.ids(i) = bb.getLong(); i += 1 }
      h.n = n
      h
    }

    override def withNewMutableAggBufferOffset(o: Int): PairTopKAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): PairTopKAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): PairTopKAgg =
      copy(dist = newChildren(0), id = newChildren(1))
  }

  /** Column API: smallest-k (dist, id) pairs per group, ascending. */
  def pair_topk(k: Int, dist: Column, id: Column): Column =
    ColumnBridge.column(
      PairTopKAgg(k, ColumnBridge.expression(dist), ColumnBridge.expression(id))
        .toAggregateExpression())

}
