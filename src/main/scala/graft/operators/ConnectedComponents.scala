package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the step that turns near-duplicate *pairs* (q36/q37) into duplicate
  * *clusters* so dedup can keep one representative per component.
  *
  * Each iteration is one shuffle join (neighbor-min) + one update; the
  * loop converges in O(component diameter) rounds — near-dup clusters
  * are shallow, so a handful of rounds suffices at any scale. Lineage
  * is truncated per round with `localCheckpoint` (a checkpoint dir in
  * production) — without it the plan doubles every iteration and the
  * driver, not the data, becomes the bottleneck.
  */
object ConnectedComponents {

  /** @param edges (src, dst) undirected pairs (any orientation)
    * @return (node, cluster) where cluster = min node id reachable */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // Checkpoint blocks are pinned in the block manager until explicitly
    // unpersisted — `spark.catalog.clearCache()` never touches them. A
    // 20-round run would otherwise pin 20+ generations of the full node
    // set for the life of the JVM (executor-memory leakage that degrades
    // every later job). Track each round's newly-persisted RDD ids via a
    // getPersistentRDDs diff and drop a generation as soon as the next
    // one is materialized, keeping at most two generations alive.
    def persistedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    def newSince(before: Set[Int]): Seq[Int] =
      (persistedIds -- before).toSeq
    def drop(ids: Seq[Int]): Unit = {
      val live = sc.getPersistentRDDs
      ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
    }

    // materialize the edge list ONCE — every iteration (and every
    // convergence check) references it, and without the checkpoint each
    // reference re-executes the full upstream pipeline that produced
    // the edges (e.g. the whole LSH candidate generation)
    val beforeSym = persistedIds
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val symIds = newSince(beforeSym)
    val nodes = sym.select(col("src").as("node")).distinct()
    val beforeInit = persistedIds
    var labels = nodes.withColumn("label", col("node")).localCheckpoint()
    var prevIds: Seq[Int] = newSince(beforeInit)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym
        .join(labels, sym("dst") === labels("node"))
        .groupBy(sym("src").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      // carry the previous label through the update so convergence is a
      // filter over THIS round's (lazily checkpointed) output — the
      // count below is the round's single action: it materializes the
      // checkpoint and detects convergence in the same job, instead of
      // a second job joining old vs new labels.
      val beforeRound = persistedIds
      val stepped = labels.withColumnRenamed("label", "prev")
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("prev"), coalesce(col("nbr_label"), col("prev"))).as("mid"),
          col("prev"))
      // pointer jumping: follow the tentative label one more hop through
      // the PREVIOUS round's map (label(label(node))). Labels are
      // min-monotone (label(x) <= x always), so the hop can only lower
      // the value and never leaves the component — propagation distance
      // doubles per round and the loop converges in O(log diameter)
      // rounds instead of O(diameter). At the fixpoint mid = prev and
      // label(prev) = prev, so the hop is the identity and the
      // convergence check below is unaffected.
      val updated = stepped
        .join(labels.select(col("node").as("mid"), col("label").as("jump")),
          Seq("mid"), "left")
        .select(col("node"),
          least(col("mid"), coalesce(col("jump"), col("mid"))).as("label"),
          col("prev"))
        .localCheckpoint(false)
      converged = updated.filter(col("label") =!= col("prev")).count() == 0
      // this round's checkpoint is materialized (lineage truncated), so
      // the previous generation's blocks can never be re-read — free them
      val roundIds = newSince(beforeRound)
      drop(prevIds)
      prevIds = roundIds
      labels = updated.select("node", "label")
      i += 1
    }
    // the result's lineage stops at the final checkpoint; the edge list
    // is no longer reachable from it
    drop(symIds)
    labels.select(col("node"), col("label").as("cluster"))
  }
}
