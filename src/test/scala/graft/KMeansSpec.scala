package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Lloyd-loop invariants q106's oracle equality can't see on its own:
  * the iteration actually DESCENDS (inertia non-increasing round over
  * round — the defining property of Lloyd), and the first iterated
  * round coincides with q90's single-step update (same codebook, same
  * fold), anchoring the loop to the already-oracled step.
  */
class KMeansSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.01"

  test("inertia is non-increasing across the pinned rounds") {
    try {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .localCheckpoint()
      var cents = e.filter(col("vec_id").isin(KMeans.CentroidIds: _*))
        .select(col("vec_id").as("cid"), col("emb").as("ce"))
        .localCheckpoint()
      val inertia = (1 to 4).map { _ =>
        val (assigned, update) = KMeans.lloydRound(e, cents)
        val i = assigned.agg(sum("sqdist")).head().getDouble(0)
        cents = KMeans.pinCentroids(update.localCheckpoint())
        i
      }
      assert(inertia.zip(inertia.tail).forall { case (a, b) => b <= a + 1e-9 },
        s"inertia increased: $inertia")
      // and it strictly improves somewhere (the codebook is not a fixpoint)
      assert(inertia.last < inertia.head)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("round 1 of the iterated loop equals q90's single Lloyd step") {
    try {
      val once = KMeans.iterate(spark, sf, 1).last
        .select("cid", "dim", "n_members", "c_new")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val q90 = SparkEntry.queries("q90_kmeans_lloyd")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(once == q90)
    } finally SparkEntry.releaseCaches(spark)
  }
}
