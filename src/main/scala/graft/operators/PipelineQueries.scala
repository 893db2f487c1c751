package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** The reference's pipeline-level patterns re-expressed over the star
  * schema, so the oracle can verify them:
  *
  *  - J9/S5/S6 (etl.js change detection + KV upsert) → MERGE-style
  *    change-set anti-join and its application (q47/q48);
  *  - A1/A2 (transform.js:127-170 markdown render) → ordered string-agg
  *    document assembly (q49);
  *  - P1/P8 (transform.js:72-84, 275-281) → issue projection with
  *    template body + default-fill (q50);
  *  - S4 (transform.js:86-94 env mapping table) → config-string parse
  *    into a dimension (q51);
  *  - J6 (transform.js:189-211 fuzzy member match) → substring-contains
  *    theta join against a broadcast dim (q52).
  *
  * Scale: the change-set pattern is the 100 TB-safe form of upsert —
  * the expensive analytics stay fully parallel and only the (small)
  * change set reaches a serialized sink. Both sides of the MERGE join
  * shuffle on the key; state should be bucketed by key in production.
  */
object PipelineQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- change detection: desired vs written state → change set
    QueryDef(
      "q47_merge_changeset",
      (s, d) => {
        val o = Tables.orders(s, d)
        val desired = o.select(col("o_orderkey"), col("o_totalprice").as("new_price"))
        val written = o.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") +
              when(col("o_orderkey") % 5 === 0, 1.0).otherwise(0.0)).as("old_price"))
        desired.join(written, Seq("o_orderkey"), "left")
          .filter(col("old_price").isNull || col("old_price") =!= col("new_price"))
          .select(col("o_orderkey"),
            when(col("old_price").isNull, "insert").otherwise("update").as("change_type"),
            col("new_price"))
          .orderBy("o_orderkey")
      },
      Some("""WITH desired AS (SELECT o_orderkey, o_totalprice AS new_price FROM orders),
        written AS (SELECT o_orderkey,
            o_totalprice + CASE WHEN o_orderkey % 5 = 0 THEN 1.0 ELSE 0 END AS old_price
          FROM orders WHERE o_orderkey % 3 = 0)
        SELECT d.o_orderkey,
          CASE WHEN w.o_orderkey IS NULL THEN 'insert' ELSE 'update' END AS change_type,
          d.new_price
        FROM desired d LEFT JOIN written w ON d.o_orderkey = w.o_orderkey
        WHERE w.o_orderkey IS NULL OR w.old_price != d.new_price
        ORDER BY d.o_orderkey""")),

    // ---- MERGE application: kept state + applied changes
    QueryDef(
      "q48_merge_apply",
      (s, d) => {
        val o = Tables.orders(s, d)
        val desired = o.select(col("o_orderkey"), col("o_totalprice").as("new_price"))
        val written = o.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") +
              when(col("o_orderkey") % 5 === 0, 1.0).otherwise(0.0)).as("old_price"))
        val changes = desired.join(written, Seq("o_orderkey"), "left")
          .filter(col("old_price").isNull || col("old_price") =!= col("new_price"))
          .select(col("o_orderkey"), col("new_price").as("price"), lit("applied").as("src"))
        val kept = written.join(changes, Seq("o_orderkey"), "left_anti")
          .select(col("o_orderkey"), col("old_price").as("price"), lit("kept").as("src"))
        kept.unionByName(changes).orderBy("o_orderkey")
      },
      Some("""WITH desired AS (SELECT o_orderkey, o_totalprice AS new_price FROM orders),
        written AS (SELECT o_orderkey,
            o_totalprice + CASE WHEN o_orderkey % 5 = 0 THEN 1.0 ELSE 0 END AS old_price
          FROM orders WHERE o_orderkey % 3 = 0),
        changes AS (SELECT d.o_orderkey, d.new_price AS price, 'applied' AS src
          FROM desired d LEFT JOIN written w ON d.o_orderkey = w.o_orderkey
          WHERE w.o_orderkey IS NULL OR w.old_price != d.new_price)
        SELECT w.o_orderkey, w.old_price AS price, 'kept' AS src FROM written w
        WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.o_orderkey = w.o_orderkey)
        UNION ALL SELECT o_orderkey, price, src FROM changes
        ORDER BY o_orderkey""")),

    // ---- markdown document assembly (ordered two-level string agg)
    QueryDef(
      "q49_markdown_render",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          concat(lit("- ["),
            when(col("l_linestatus") === "F", "x").otherwise(" "),
            lit("] #"), col("l_linenumber").cast("string"),
            lit(":"), col("l_partkey").cast("string")).as("line"))
        .groupBy("l_orderkey")
        .agg(concat(lit("## Order "), col("l_orderkey").cast("string"), lit("\n\n"),
          array_join(sort_array(collect_list(col("line"))), "\n")).as("body"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
        '## Order ' || CAST(l_orderkey AS VARCHAR) || chr(10) || chr(10) ||
          string_agg(line, chr(10) ORDER BY line) AS body
        FROM (SELECT l_orderkey,
          '- [' || CASE WHEN l_linestatus = 'F' THEN 'x' ELSE ' ' END || '] #' ||
            CAST(l_linenumber AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR) AS line
          FROM lineitem) t
        GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ---- issue projection: template body + default-fill
    QueryDef(
      "q50_issue_projection",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_name").as("title"),
          concat(lit("Imported from <https://example/"), col("c_custkey").cast("string"),
            lit(">.\n\n> segment: "), col("c_mktsegment")).as("body"),
          coalesce(when(col("n_name") =!= "GERMANY", col("n_name")), lit("!Owner")).as("assignee"))
        .orderBy("title"),
      Some("""SELECT c_name AS title,
        'Imported from <https://example/' || CAST(c_custkey AS VARCHAR) || '>.' ||
          chr(10) || chr(10) || '> segment: ' || c_mktsegment AS body,
        CASE WHEN n_name != 'GERMANY' THEN n_name ELSE '!Owner' END AS assignee
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        ORDER BY title""")),

    // ---- env mapping-table parse ("TrelloList:Status, ..." → dimension)
    QueryDef(
      "q51_env_mapping_parse",
      (s, d) => {
        val cfg = "Concepts:Pending, None:Considering, Specification:Specified, " +
          "Production:Production, QA:QA, Complete:Done"
        s.range(1)
          .select(explode(split(lit(cfg), "[,\\s]+")).as("pair"))
          .select(split(col("pair"), ":")(0).as("trello_list"),
                  split(col("pair"), ":")(1).as("github_status"))
          .orderBy("trello_list")
      },
      Some("""SELECT string_split(pair, ':')[1] AS trello_list,
        string_split(pair, ':')[2] AS github_status
        FROM (SELECT unnest(string_split_regex(
          'Concepts:Pending, None:Considering, Specification:Specified, Production:Production, QA:QA, Complete:Done',
          '[,\s]+')) AS pair) t
        ORDER BY trello_list""")),

    // ---- fuzzy substring-contains theta join against broadcast dim
    QueryDef(
      "q52_fuzzy_contains_join",
      (s, d) => {
        import s.implicits._
        val words = Seq("join", "filter", "window", "stream", "vector")
          .toDF("needle")
        Tables.documents(s, d)
          .join(broadcast(words), col("text").contains(col("needle")))
          .groupBy("needle").agg(count(lit(1)).as("n_docs"))
          .orderBy("needle")
      },
      Some("""SELECT needle, count(*) AS n_docs
        FROM documents JOIN (VALUES ('join'), ('filter'), ('window'), ('stream'), ('vector')) AS w(needle)
        ON contains(text, needle)
        GROUP BY needle ORDER BY needle"""))
  )
}
