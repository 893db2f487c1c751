package graft.operators

import graft.{QueryDef, Tables}
import graft.board.BoardPipeline
import graft.sinks.RequestBuilders
import org.apache.spark.sql.functions._

/** Oracled queries over the connector-tier rendering logic (S11-S15,
  * S19), driven from the driver star schema so the DuckDB gate hashes
  * the exact bytes the sinks would ship — not just a spec assertion on
  * a fixture. Inputs are synthesized deterministically from `nation`,
  * `customer`, and `part`, and the oracles replicate the rendering
  * (string concat / to_json) expression by expression.
  */
object ConnectorQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- quickview per-row table (S19, board-quickview.js:137-188)
    //      over board-shaped frames synthesized from nation/customer
    QueryDef(
      "q79_quickview_rows",
      (s, d) => {
        val cards = Tables.nation(s, d).select(
          col("n_name").as("card_id"),
          concat(lit("List"), col("n_regionkey")).as("card_type"),
          lower(col("n_name")).as("owner"),
          lit("!Fallback").as("fallback_owner"),
          array(concat(lit("L"), col("n_regionkey")), lit("Core")).as("label_names"))
        val items = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .select(
            col("n_name").as("card_id"),
            col("c_name").as("item_id"),
            concat(col("c_mktsegment"), lit(" Task")).as("task_type"),
            when(col("c_custkey") % 3 === 0, lit("!Assigned"))
              .otherwise(lower(col("c_name"))).as("assignee"),
            lit(1.0).as("checklist_pos"),
            col("c_custkey").cast("double").as("pos"))
        BoardPipeline.quickviewRows(cards, items)
          .select("card_id", "trello_id", "issue_type", "line")
          // deterministic total order for the gate (the pipeline's own
          // order is card-grouped; equal content either way)
          .orderBy("card_id", "issue_type", "trello_id")
      },
      Some("""WITH cards AS (SELECT n_name AS card_id, n_name AS trello_id,
          'Card' AS issue_type,
          '| ' || n_name || '|Card|' || 'List' || CAST(n_regionkey AS VARCHAR) ||
            '|-|' || lower(n_name) || '|!Fallback|-|' ||
            'L' || CAST(n_regionkey AS VARCHAR) || ', Core' || ' |' AS line
          FROM nation),
        items AS (SELECT n_name AS card_id, c_name AS trello_id,
          'Task' AS issue_type,
          '| ' || c_name || '|Task|-|' || c_mktsegment || ' Task' || '|-|-|' ||
            CASE WHEN c_custkey % 3 = 0 THEN '!Assigned' ELSE lower(c_name) END ||
            '|- |' AS line
          FROM customer JOIN nation ON c_nationkey = n_nationkey)
        SELECT card_id, trello_id, issue_type, line FROM cards
        UNION ALL SELECT card_id, trello_id, issue_type, line FROM items
        ORDER BY card_id, issue_type, trello_id""")),

    // ---- create-issue request rendering (S11, gh.js:192-195 +
    //      mapCardToIssue shape): the gate hashes method/url/body bytes
    QueryDef(
      "q80_issue_request_render",
      (s, d) => {
        val desired = Tables.part(s, d).select(
          col("p_partkey").as("entity_id"),
          col("p_name").as("title"),
          concat(lit("Imported from <https://example/"),
            col("p_partkey").cast("string"), lit(">.\n\n> "),
            col("p_type")).as("issue_body"),
          array(col("p_brand"), col("p_type")).as("assignees"))
        RequestBuilders.createIssue(desired, "org1", "repo1")
          .select("entity_id", "method", "url", "body")
          .orderBy("entity_id")
      },
      Some("""SELECT p_partkey AS entity_id, 'POST' AS method,
        '/repos/org1/repo1/issues' AS url,
        to_json(struct_pack(
          title := p_name,
          body := 'Imported from <https://example/' || CAST(p_partkey AS VARCHAR) ||
            e'>.\n\n> ' || p_type,
          assignees := [p_brand, p_type])) AS body
        FROM part ORDER BY entity_id""")),

    // ---- salted skew join (§ scale levers): deterministic salt spreads
    //      a hot key over N tasks; the oracle is the PLAIN join — the
    //      salt must be semantically invisible
    QueryDef(
      "q82_salted_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
        SkewJoins.saltedEquiJoin(li, o, col("l_orderkey"), col("o_orderkey"),
            saltCols = Seq(col("l_orderkey"), col("l_linenumber")),
            buckets = 4)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- bloom-pruned semi join (§ scale levers): the dim's KEY SET
    //      as a compact sketch filters the fact BEFORE its shuffle —
    //      the user-level form of Spark's runtime bloom filtering, for
    //      the dim that is too big to broadcast as a hash relation but
    //      whose keys fit a ~1 MB sketch. The exact semi join after the
    //      prune removes the fpp false positives, so the oracle is the
    //      PLAIN semi join — the sketch must be semantically invisible
    //      (BloomJoinSpec pins the actual pruning ratio and fpp bound).
    QueryDef(
      "q107_bloom_prejoin",
      (s, d) => {
        import graft.functions.BloomJoin
        val li = Tables.lineitem(s, d)
        // pinned: the dim feeds the sketch build AND the exact probe —
        // without the pin each would re-scan orders (and a count() for
        // sizing would make it three scans; the sketch only needs an
        // upper bound, so the pinned frame's count is cheap row-count
        // metadata, not a third scan of the source)
        val urgent = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey")
          .localCheckpoint()
        BloomJoin.bloomPrune(li, col("l_orderkey"), urgent, "o_orderkey",
            expectedItems = urgent.count())
          .join(urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
            Seq("l_orderkey"), "left_semi")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "bloom-pruned semi join: sketch of the dim keys filters the " +
        "fact pre-shuffle; exact semi join removes false positives")
  )
}
