package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed connected components by iterative min-label propagation —
  * the step that turns near-duplicate *pairs* (q36/q37) into duplicate
  * *clusters* so dedup can keep one representative per component.
  *
  * This is the one deliberately RDD-shaped operator in the engine (the
  * builder prompt's "genuine per-partition imperative logic" case): an
  * iterative algorithm re-plans N times under Catalyst — per-round
  * analysis, optimization, codegen, and AQE stage materialization cost
  * 100-300 ms each and dominate the loop (measured: ~50 jobs, 1.3 s of
  * task time, 3-8 s wall on the DataFrame formulation). With RDDs and
  * ONE fixed HashPartitioner the per-round plan is static:
  *
  *  - `sym` (symmetric edge list, keyed by src) is partitioned ONCE;
  *  - `sym join labels` is co-partitioned → narrow, zero shuffle;
  *  - routing neighbor labels dst-ward is the round's ONE shuffle, with
  *    map-side combine (`reduceByKey(min)`) so the wire carries one
  *    (node, min) pair per partition, not the edge fan-in;
  *  - folding the new minimum into the old labels is co-partitioned →
  *    narrow again.
  *
  * Labels are min-monotone and each round folds in a pointer jump
  * (label(label(n))) alongside the neighbor minima, so propagation
  * distance doubles per round and the loop converges in O(log
  * diameter) — maxIter 20 covers diameters beyond 2^19, not 20 hops.
  *
  * Each round localCheckpoints through the EXACT materialized RDD
  * handle and unpersists the superseded generation immediately —
  * checkpoint blocks are invisible to `spark.catalog.clearCache()` and
  * would otherwise pin executor memory for the life of the JVM (the
  * round-2 lesson). The convergence count rides the materialization
  * job as an accumulator, so each round is ONE action; a task retry
  * can only over-count, which can only delay convergence by a round —
  * never report a false fixpoint.
  */
object ConnectedComponents {

  /** Partition count sized to the graph, not the session default: a
    * ~1.3k-node dedup graph on 32 partitions is pure scheduler overhead
    * (5 stages × 32 near-empty tasks × ~5 rounds — the round-6 q77
    * regression), while a billion-edge graph wants every shuffle slot.
    * One partition per ~1M directed edge-endpoints (~16 MB of (Long,
    * Long) pairs), capped at the session's shuffle parallelism. */
  private[graft] def sizePartitions(edgeEndpoints: Long, maxParts: Int): Int = {
    val perPart = 1L << 20
    val want = ((edgeEndpoints + perPart - 1) / perPart).toInt
    math.max(1, math.min(maxParts, want))
  }

  /** @param edges (src, dst) undirected pairs (any orientation, any
    *              numeric id type — cast to long internally)
    * @return (node, cluster) where cluster = min node id reachable */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    val sc = spark.sparkContext

    // materialize the symmetric edge list ONCE — without the checkpoint
    // each reference re-executes the full upstream pipeline that
    // produced the edges (e.g. the whole LSH candidate generation).
    // Materialize BEFORE choosing the partitioner: the edge count sizes
    // it (see sizePartitions), and counting a checkpointed handle runs
    // the upstream exactly once.
    val raw: RDD[(Long, Long)] = edges
      .select(col("src").cast("long"), col("dst").cast("long")).rdd
      .flatMap { r => val a = r.getLong(0); val b = r.getLong(1); Seq((a, b), (b, a)) }
    raw.localCheckpoint()
    val m = raw.count()
    val part = new HashPartitioner(
      sizePartitions(m, spark.sessionState.conf.numShufflePartitions))

    // re-key the stored blocks by src under the loop's ONE partitioner —
    // every round's narrow join reuses these blocks. No forcing count
    // of its own: localCheckpoint stores the blocks during the FIRST
    // job that computes the RDD, and the labels-init job below computes
    // sym — one materialization job instead of two per CC call (raw
    // stays pinned until then so the upstream candidate pipeline still
    // runs exactly once).
    val sym: RDD[(Long, Long)] = raw.partitionBy(part)
    sym.localCheckpoint()

    // fuse propagation round 1 into initialization: label₀ = min(node,
    // direct neighbors) is one reduceByKey over the already-partitioned
    // edge list (narrow — map-side combine within the stored blocks).
    // Pairs — the dominant dedup cluster shape — are at their fixpoint
    // before the loop starts.
    var labels: RDD[(Long, Long)] = sym
      .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
      .mapPartitions(_.map { case (n, mn) => (n, math.min(n, mn)) },
        preservesPartitioning = true)
    labels.localCheckpoint()
    labels.count() // materializes sym's blocks and the init labels
    raw.unpersist(blocking = false)
    var prev = labels

    val changed = sc.longAccumulator("cc_changed")
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // neighbor propagation: narrow join (sym and labels share `part`),
      // then route each label dst-ward
      val nbr = sym.join(labels, part)
        .map { case (_, (dst, lbl)) => (dst, lbl) }
      // pointer jumping: label(label(n)) — propagation distance DOUBLES
      // per round, so convergence is O(log diameter), not O(diameter)
      // (a 1000-link chain under a plain neighbor walk would silently
      // hit maxIter un-converged). Re-key by label (shuffle), hop
      // through the label map (narrow — same partitioner), emit the
      // grand-label back to the node.
      val jump = labels.map { case (n, l) => (l, n) }
        .join(labels, part)
        .map { case (_, (n, ll)) => (n, ll) }
      // fold self + neighbor + jump minima in ONE combine-heavy shuffle
      val stepped = labels.union(nbr).union(jump)
        .reduceByKey(part, (a: Long, b: Long) => math.min(a, b))
      // narrow: reduceByKey(part) and labels share `part`
      val checked = stepped.join(labels, part)
        .mapPartitions(_.map { case (n, (nw, old)) =>
          if (nw != old) changed.add(1L)
          (n, nw)
        }, preservesPartitioning = true)
      changed.reset()
      checked.localCheckpoint()
      checked.count() // ONE action: stores blocks + counts changes
      converged = changed.value == 0L
      // this round's blocks are stored; the superseded generation can
      // never be re-read — free it immediately
      prev.unpersist(blocking = false)
      prev = checked
      labels = checked
      i += 1
    }
    sym.unpersist(blocking = false)

    val schema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("cluster", LongType, nullable = false)))
    spark.createDataFrame(labels.map { case (n, c) => Row(n, c) }, schema)
  }
}
