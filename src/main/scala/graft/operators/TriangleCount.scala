package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Triangle counting / local clustering coefficient over the item
  * co-occurrence kNN graph — the graph-QC metric a pipeline computes
  * over a similarity or co-interaction graph before trusting its
  * clusters (a near-dup cluster whose members don't triangle-close is
  * a chaining artifact, not a community). Completes the graph tier's
  * fourth leg: structure (components), centrality (PageRank),
  * classification (label spreading), and now cohesion.
  *
  * Scale discipline, stage by stage:
  *  1. per-user interaction lists are CAPPED at [[MaxItemsPerUser]]
  *     (first by item id) before the self-join — the classic bound on
  *     the O(deg²) co-occurrence blowup, so one hot user cannot emit
  *     quadratic pairs. The cap binds on this data (degrees ~49), so
  *     the branch is oracle-exercised, not decorative.
  *  2. the co-occurrence agg keys on the (i, j) pair — map-side
  *     combinable, output ≤ items²/2 regardless of event volume.
  *  3. the graph is sparsified to each node's top-[[KnnK]] partners by
  *     (weight desc, partner asc) — a fixed-degree kNN graph, so the
  *     triangle join below is linear in nodes, not edges².
  *  4. triangles are enumerated on LOW→HIGH oriented edges
  *     (e(a,b)⋈e(b,c)⋈e(a,c) with a<b<c), the standard
  *     each-triangle-once formulation whose join fan-out is bounded
  *     by the kNN out-degree.
  */
object TriangleCount {

  private[graft] val MaxItemsPerUser = 48
  private[graft] val KnnK = 5

  /** Distinct (user, item) interactions, capped at [[MaxItemsPerUser]]
    * per user (first by item id) — the bound on the O(deg²) pair
    * expansion, shared by q161's graph build and q165's rule mining. */
  private[graft] def cappedInteractions(s: SparkSession, d: String): DataFrame = {
    val ui = Tables.events(s, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("item"))
      .filter(col("item").isNotNull)
      .distinct()
    ui.withColumn("rk", row_number().over(
        Window.partitionBy("user_id").orderBy("item")))
      .filter(col("rk") <= MaxItemsPerUser)
      .select("user_id", "item")
  }

  /** Pair co-occurrence counts (i < j, w = co-user count) over the
    * capped interactions. */
  private[graft] def coocCounts(capped: DataFrame): DataFrame =
    capped.as("a")
      .join(capped.as("b"), Seq("user_id"))
      .filter(col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("i"), col("b.item").as("j"))
      .agg(count(lit(1)).as("w"))

  /** Oracle twin of [[cappedInteractions]], as CTEs `ui`, `capped`. */
  private[graft] val oracleCappedCtes: String =
    s"""ui AS (SELECT DISTINCT user_id,
          CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
        FROM events WHERE json_extract_string(props, '$$.k') IS NOT NULL),
      capped AS (SELECT user_id, item FROM (SELECT user_id, item,
          row_number() OVER (PARTITION BY user_id ORDER BY item) AS rk FROM ui) t
        WHERE rk <= $MaxItemsPerUser)"""

  /** Undirected (i < j) kNN edges of the capped co-occurrence graph. */
  private[graft] def knnEdges(s: SparkSession, d: String): DataFrame = {
    val cooc = coocCounts(cappedInteractions(s, d))
    // symmetric view → per-node top-K → back to undirected i<j
    val sym = cooc.select(col("i").as("u"), col("j").as("v"), col("w"))
      .unionByName(cooc.select(col("j").as("u"), col("i").as("v"), col("w")))
    sym
      .withColumn("rk", row_number().over(
        Window.partitionBy("u").orderBy(col("w").desc, col("v").asc)))
      .filter(col("rk") <= KnnK)
      .select(least(col("u"), col("v")).as("i"),
        greatest(col("u"), col("v")).as("j"))
      .distinct()
  }

  /** Enumerate each triangle of an undirected `(i, j)` edge list
    * (pre-oriented i < j, deduped) exactly once as (a, b, c), a<b<c. */
  private[graft] def trianglesOf(ed: DataFrame): DataFrame =
    ed.as("e1")
      .join(ed.as("e2"), col("e1.j") === col("e2.i"))
      .join(ed.as("e3"),
        col("e1.i") === col("e3.i") && col("e2.j") === col("e3.j"))
      .select(col("e1.i").as("a"), col("e1.j").as("b"), col("e2.j").as("c"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q161_triangle_coefficient",
      (s, d) => {
        val ed = knnEdges(s, d).localCheckpoint()
        val tri = trianglesOf(ed)
        val perNode = tri.select(explode(array(col("a"), col("b"), col("c"))).as("item"))
          .groupBy("item").agg(count(lit(1)).as("tri"))
        val deg = ed.select(col("i").as("item"))
          .unionByName(ed.select(col("j").as("item")))
          .groupBy("item").agg(count(lit(1)).as("deg"))
        deg.join(perNode, Seq("item"), "left")
          .select(col("item"), col("deg"),
            coalesce(col("tri"), lit(0L)).as("tri"),
            when(col("deg") < 2, lit(null).cast("double"))
              .otherwise(round(
                coalesce(col("tri"), lit(0L)).cast("double") * 2 /
                  (col("deg").cast("double") * (col("deg") - 1)), 4))
              .as("coef_r"))
          .orderBy("item")
      },
      Some(s"""WITH $oracleCappedCtes,
        cooc AS (SELECT a.item AS i, b.item AS j, count(*) AS w
          FROM capped a JOIN capped b
            ON a.user_id = b.user_id AND a.item < b.item
          GROUP BY a.item, b.item),
        sym AS (SELECT i AS u, j AS v, w FROM cooc
                UNION ALL SELECT j AS u, i AS v, w FROM cooc),
        knn AS (SELECT u, v FROM (SELECT u, v,
            row_number() OVER (PARTITION BY u ORDER BY w DESC, v) AS rk FROM sym) t
          WHERE rk <= $KnnK),
        ed AS (SELECT DISTINCT least(u, v) AS i, greatest(u, v) AS j FROM knn),
        tri AS (SELECT e1.i AS a, e1.j AS b, e2.j AS c
          FROM ed e1 JOIN ed e2 ON e1.j = e2.i
                     JOIN ed e3 ON e1.i = e3.i AND e2.j = e3.j),
        pernode AS (SELECT item, CAST(count(*) AS BIGINT) AS tri
          FROM (SELECT unnest([a, b, c]) AS item FROM tri) t GROUP BY item),
        deg AS (SELECT item, CAST(count(*) AS BIGINT) AS deg
          FROM (SELECT i AS item FROM ed UNION ALL SELECT j AS item FROM ed) t
          GROUP BY item)
        SELECT deg.item, deg, coalesce(tri, 0) AS tri,
          CASE WHEN deg < 2 THEN NULL
               ELSE round(CAST(coalesce(tri, 0) AS DOUBLE) * 2 /
                 (CAST(deg AS DOUBLE) * (deg - 1)), 4) END AS coef_r
        FROM deg LEFT JOIN pernode ON deg.item = pernode.item
        ORDER BY deg.item"""),
      doc = "per-node triangle count and local clustering coefficient over the capped-expansion, top-5-per-node co-occurrence kNN graph: oriented-edge triangle join bounded by the kNN out-degree")
  )
}
