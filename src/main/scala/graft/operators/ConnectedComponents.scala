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
    // materialize the edge list ONCE — every iteration (and every
    // convergence check) references it, and without the checkpoint each
    // reference re-executes the full upstream pipeline that produced
    // the edges (e.g. the whole LSH candidate generation)
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val nodes = sym.select(col("src").as("node")).distinct()
    var labels = nodes.withColumn("label", col("node")).localCheckpoint()
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
      val updated = labels.withColumnRenamed("label", "prev")
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("prev"), coalesce(col("nbr_label"), col("prev"))).as("label"),
          col("prev"))
        .localCheckpoint(false)
      converged = updated.filter(col("label") =!= col("prev")).count() == 0
      labels = updated.select("node", "label")
      i += 1
    }
    labels.select(col("node"), col("label").as("cluster"))
  }
}
