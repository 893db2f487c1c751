package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Zhu & Ghahramani 2002 / Raghavan et
  * al. 2007) over the q150 user–item interaction graph — the
  * semi-supervised classification primitive a pipeline uses to spread
  * a small set of trusted labels (curated categories, spam flags,
  * topic tags) across an interaction graph. Completes the graph tier:
  * ConnectedComponents (structure), PageRank (centrality), and now
  * label spreading (classification).
  *
  * Semantics, fully deterministic: a third of the item nodes arrive
  * seeded (`k % 3 = 0`, label `c<k % 4>`); each synchronous round,
  * every still-unlabeled node adjacent to a labeled one takes the
  * majority label of its labeled neighbors, ties broken by MINIMUM
  * label — expressed as `min(struct(-count, label))`, the portable
  * argmax-with-min-tiebreak both engines order identically. Labeled
  * nodes never re-vote (the clamped/seeded LPA variant), so the
  * result is order-free and exactly reproducible — the documented
  * fix for classic LPA's update-order sensitivity.
  *
  * Scale shape (the ConnectedComponents/KMeans lesson): edges pinned
  * once; each round is one equi-join (edges ⋈ labels on src), one
  * anti-join (drop already-labeled destinations), and two hash aggs
  * (vote counts → per-node argmax); the label frame is pinned per
  * round so round t's plan is the same fixed-size template as round
  * 1's. Everything keys on the node id — co-partitioned across
  * rounds at 100 TB.
  */
object LabelPropagation {

  private[graft] val Rounds = 3

  /** Directed edge list: both directions of each distinct (user, item)
    * interaction pair — q150's graph without the degree column. */
  private[graft] def edges(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.events(s, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .filter(col("k").isNotNull)
      .select(concat(lit("u"), col("user_id").cast("string")).as("u"),
        concat(lit("i"), col("k").cast("string")).as("i"))
      .distinct()
    pairs.select(col("u").as("src"), col("i").as("dst"))
      .union(pairs.select(col("i").as("src"), col("u").as("dst")))
  }

  /** Seeded synchronous rounds over a pinned edge frame; returns the
    * (node, lab, r) label ledger — r = the round that labeled the
    * node, 0 for seeds. */
  private[graft] def propagate(ed: DataFrame, rounds: Int): DataFrame = {
    val seeds = ed.select(col("src").as("node")).distinct()
      .filter(col("node").startsWith("i") &&
        expr("CAST(substring(node, 2) AS BIGINT) % 3") === 0)
      .select(col("node"),
        concat(lit("c"), expr("CAST(substring(node, 2) AS BIGINT) % 4")).as("lab"),
        lit(0).as("r"))
    var labels = seeds.localCheckpoint()
    (1 to rounds).foreach { t =>
      val votes = ed
        .join(labels.select(col("node").as("src"), col("lab")), Seq("src"))
        .select(col("dst").as("node"), col("lab"))
        .join(labels.select("node"), Seq("node"), "left_anti")
        .groupBy("node", "lab").agg(count(lit(1)).as("c"))
      val picks = votes.groupBy("node")
        .agg(min(struct((-col("c")).as("nc"), col("lab").as("lab"))).as("m"))
        .select(col("node"), col("m.lab").as("lab"), lit(t).as("r"))
      labels = labels.unionByName(picks).localCheckpoint()
    }
    labels
  }

  /** One oracle vote+pick+merge round. */
  private def oracleRound(prev: String, t: Int): String =
    s"""v$t AS (SELECT e.dst AS node, l.lab, count(*) AS c
        FROM edges e JOIN $prev l ON e.src = l.node
        WHERE e.dst NOT IN (SELECT node FROM $prev)
        GROUP BY e.dst, l.lab),
      p$t AS (SELECT node, (min(struct_pack(nc := -c, lab := lab))).lab AS lab,
          $t AS r FROM v$t GROUP BY node),
      l$t AS (SELECT * FROM $prev UNION ALL SELECT * FROM p$t)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q157_label_propagation",
      (s, d) => {
        val ed = edges(s, d).localCheckpoint()
        propagate(ed, Rounds)
          .select(col("node"), col("lab"), col("r").cast("int").as("r"))
          .orderBy("node")
      },
      Some(s"""WITH pairs AS (SELECT DISTINCT
            'u' || CAST(user_id AS VARCHAR) AS u,
            'i' || CAST(CAST(json_extract_string(props, '$$.k') AS BIGINT) AS VARCHAR) AS i
          FROM events WHERE json_extract_string(props, '$$.k') IS NOT NULL),
        edges AS (SELECT u AS src, i AS dst FROM pairs
                  UNION ALL SELECT i AS src, u AS dst FROM pairs),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        l0 AS (SELECT node,
            'c' || CAST(CAST(substr(node, 2) AS BIGINT) % 4 AS VARCHAR) AS lab,
            0 AS r
          FROM nodes
          WHERE substr(node, 1, 1) = 'i' AND CAST(substr(node, 2) AS BIGINT) % 3 = 0),
        ${oracleRound("l0", 1)},
        ${oracleRound("l1", 2)},
        ${oracleRound("l2", 3)}
        SELECT node, lab, CAST(r AS INT) AS r FROM l3 ORDER BY node"""),
      doc = "clamped synchronous label propagation (3 rounds) over the user-item graph: majority vote with portable min-struct tiebreak, per-round pinned plan template, fully deterministic")
  )
}
