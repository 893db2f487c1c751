package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the step that turns near-duplicate *pairs* (q36/q37) into duplicate
  * *clusters* so dedup can keep one representative per component.
  *
  * Each iteration is one shuffle join (neighbor-min) + a pointer-jump
  * join; labels are min-monotone so propagation distance doubles per
  * round and the loop converges in O(log diameter) rounds. Lineage is
  * truncated per round with a local checkpoint (a checkpoint dir in
  * production) — without it the plan doubles every iteration and the
  * driver, not the data, becomes the bottleneck.
  *
  * Checkpoint blocks are pinned in the block manager until explicitly
  * unpersisted — `spark.catalog.clearCache()` never touches them, so a
  * 20-round run would otherwise pin 20+ generations of the full node
  * set for the life of the JVM. Each round therefore materializes
  * through [[materialize]], which returns the EXACT checkpointed RDD
  * handle; the superseded generation is unpersisted as soon as the next
  * one is stored. (Diffing the global `getPersistentRDDs` set instead
  * would race with unrelated machinery persisting RDDs inside the same
  * job and could unpersist a caller's lazily-checkpointed blocks —
  * lineage already truncated, blocks unrecoverable.)
  */
object ConnectedComponents {

  /** Eagerly materialize `df` into a local-checkpointed RDD, returning
    * a DataFrame view over the stored blocks plus the precise RDD
    * handle for later unpersist. Public-API only: `df.rdd` →
    * `RDD.localCheckpoint` → count (stores blocks, truncates lineage)
    * → `createDataFrame` over the stored rows. The Row round-trip is
    * linear, per-partition work — acceptable for label frames. */
  private def materialize(df: DataFrame): (DataFrame, RDD[Row]) = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    rdd.count()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** @param edges (src, dst) undirected pairs (any orientation)
    * @return (node, cluster) where cluster = min node id reachable */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize the edge list ONCE — every iteration references it,
    // and without the checkpoint each reference re-executes the full
    // upstream pipeline that produced the edges (e.g. the whole LSH
    // candidate generation)
    val (sym, symRdd) = materialize(
      edges.select(col("src"), col("dst"))
        .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"))))
    val spark = edges.sparkSession
    // (AQE stays ON for the loop: measured 5.3 s with AQE vs 8.8 s
    // without at sf0.1 — the adaptive broadcast conversion and
    // partition coalescing on the small label frames outweigh the
    // per-stage re-planning latency they cost. The loop is
    // driver-bound either way; ~1.3 s of task time across ~50 jobs.)
    // fuse propagation round 1 into initialization: label₀ = min(node,
    // direct neighbors) is one groupBy over the symmetric edge list —
    // the same result the first loop iteration would produce with two
    // shuffle-joins and a broadcast, at a third of the jobs. The loop
    // then starts one round ahead (pairs — the common dedup cluster
    // shape — are already at their fixpoint here).
    var (labels, labelsRdd) = materialize(
      sym.groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src").as("node"), least(col("src"), col("mn")).as("label")))
    val labelSchema = labels.schema
    // changed-row count rides the materialization job as an accumulator,
    // so each round is ONE action (a separate convergence count would
    // re-read the stored blocks as a second job per round). A task retry
    // can only over-count, which can only delay convergence by a round —
    // never report a false fixpoint.
    val changed = spark.sparkContext.longAccumulator("cc_changed")
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym
        .join(labels, sym("dst") === labels("node"))
        .groupBy(sym("src").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      val stepped = labels.withColumnRenamed("label", "prev")
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("prev"), coalesce(col("nbr_label"), col("prev"))).as("mid"),
          col("prev"))
      // pointer jumping: follow the tentative label one more hop through
      // the PREVIOUS round's map (label(label(node))). Labels are
      // min-monotone (label(x) <= x always), so the hop can only lower
      // the value and never leaves the component. At the fixpoint
      // mid = prev and label(prev) = prev, so the hop is the identity
      // and the convergence check below is unaffected.
      val updated = stepped
        .join(labels.select(col("node").as("mid"), col("label").as("jump")),
          Seq("mid"), "left")
        .select(col("node"),
          least(col("mid"), coalesce(col("jump"), col("mid"))).as("label"),
          col("prev"))
      changed.reset()
      // count changed rows while storing; drop `prev` so the blocks
      // carry only (node, label)
      val matRdd = updated.rdd.map { r =>
        if (r.get(1) != r.get(2)) changed.add(1L)
        Row(r.get(0), r.get(1))
      }
      matRdd.localCheckpoint()
      matRdd.count()
      converged = changed.value == 0L
      // this round's blocks are stored, so the previous generation can
      // never be re-read — free it immediately
      labelsRdd.unpersist(blocking = false)
      labelsRdd = matRdd
      labels = spark.createDataFrame(matRdd, labelSchema)
      i += 1
    }
    // the result's lineage stops at the final checkpoint; the edge list
    // is no longer reachable from it
    symRdd.unpersist(blocking = false)
    labels.select(col("node"), col("label").as("cluster"))
  }
}
