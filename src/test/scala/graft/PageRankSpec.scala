package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** q150's iteration pinned three ways: exact hand-computed ranks on a
  * 3-node path graph driven through the PRODUCTION round template,
  * damped rank-mass conservation on the real events graph, and the
  * constant-size per-round plan contract (the KMeans/BpeTrain
  * iteration lesson — an unpinned loop grows a t-deep lineage).
  */
class PageRankSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private val U = 1000000000000L

  test("hand-computed integer ranks on the a-b-c path graph, 3 rounds") {
    import spark.implicits._
    // undirected path a-b-c: deg(a)=deg(c)=1, deg(b)=2. All integer
    // arithmetic below is the same fixed-point recurrence the query
    // runs; the expected values are worked by hand in comments.
    //   r1: a=c = .15U + (85*(U div 2)) div 100 = 575e9,  b = .15U + .85*2U = 1.85e12
    //   r2: a=c = .15U + (85*(1.85e12 div 2)) div 100 = 936.25e9, b = .15U + (85*1.15e12) div 100 = 1.1275e12
    //   r3: a=c = .15U + (85*(1.1275e12 div 2)) div 100 = 629.1875e9
    //       b   = .15U + (85*(2*936.25e9)) div 100      = 1.741625e12
    try {
      val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")).toDF("src", "dst")
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val ed = edges.join(deg, Seq("src")).localCheckpoint()
      val got = PageRank.iterateFrom(ed, 3).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map(
        "a" -> 629187500000L, "b" -> 1741625000000L, "c" -> 629187500000L), got)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("damped rank mass stays within the truncation band on the events graph") {
    // Each round replaces total mass n*U with 0.15*n*U + 0.85*(prior
    // mass - integer-div truncation); truncation loses < deg units per
    // node per round — negligible at the 1e12 grid. After any number
    // of rounds the total stays in (0.95*n*U, n*U].
    try {
      val (ranks, deg) = PageRank.iterate(spark, sf, PageRank.Rounds)
      val n = deg.count()
      val total = ranks.agg(sum("pr")).head().getLong(0)
      assert(total <= n * U, s"mass grew: $total vs ${n * U}")
      assert(total > (n * U * 0.95).toLong, s"mass collapsed: $total vs ${n * U}")
      // bipartite sanity: both user and item nodes present and ranked
      val nodes = ranks.select("node").collect().map(_.getString(0))
      assert(nodes.exists(_.startsWith("u")) && nodes.exists(_.startsWith("i")))
      assert(nodes.length == n)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("per-round plan template is constant-size (pinned iteration)") {
    try {
      val sizes = Seq(1, 3).map { t =>
        val (ranks, _) = PageRank.iterate(spark, sf, t)
        ranks.queryExecution.optimizedPlan.collect { case p => p }.size
      }
      assert(sizes.distinct.size == 1, s"plan size drifted across rounds: $sizes")
    } finally SparkEntry.releaseCaches(spark)
  }
}
