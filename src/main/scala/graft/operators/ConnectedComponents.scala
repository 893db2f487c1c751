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
      val updated = labels.alias("l")
        .join(nbrMin.alias("n"), Seq("node"), "left")
        .select(col("node"),
          least(col("l.label"), coalesce(col("n.nbr_label"), col("l.label"))).as("label"))
        .localCheckpoint()
      converged = updated.alias("u")
        .join(labels.alias("o"), Seq("node"))
        .filter(col("u.label") =!= col("o.label"))
        .isEmpty
      labels = updated
      i += 1
    }
    labels.select(col("node"), col("label").as("cluster"))
  }
}
