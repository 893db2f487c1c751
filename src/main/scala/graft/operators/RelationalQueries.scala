package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational operator battery over the driver star schema.
  *
  * Covers SURVEY.md §2.1-2.8: scans/projections/filters (P1-P9), every
  * join flavor the reference uses (J1-J11 — broadcast equi, shuffle equi,
  * semi, anti, non-equi band, correlated non-equi anti), aggregations
  * incl. ordered string-agg (A1-A4), rollup/cube/grouping-sets, windows
  * (§2.5), sorts/limits/top-k (§2.6), set ops (§2.7), and the scalar
  * function families of §2.8 (regex/string/date/math/json).
  *
  * Scale notes (100 TB posture): dimension joins (`part`, `nation`,
  * `region`, band tables) are explicit `broadcast()`; fact-fact joins
  * (lineitem⋈orders) shuffle on the join key and AQE picks the physical
  * strategy; aggregates are partial-final hash aggs (map-side combine
  * free via Catalyst); double-typed measures are cast to DECIMAL(18,4)
  * pre-aggregation so results are exact and order-independent (fp sums
  * are not associative — at 1000 executors the shuffle order WILL differ
  * run to run; decimals make the answer stable AND oracle-comparable).
  */
object RelationalQueries {

  /** Exact, shuffle-order-independent aggregation input for doubles. */
  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Final output cast: the exact decimal aggregate → DOUBLE. The
    * conversion is deterministic and engine-identical, and a double
    * output column hash-compares cleanly in the driver gate (a DECIMAL
    * column arrives in pandas as object-dtype and never matches DuckDB's
    * float64 — round-1 verdict). */
  private def outD(c: Column): Column = c.cast(DoubleType)
  private val SumDec = "CAST(CAST(sum(CAST(%s AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS %s"
  private def sumDec(col: String, as: String): String = SumDec.format(col, as)

  val defs: Seq[QueryDef] = Seq(

    // ---- aggregation over a filtered scan (TPC-H Q1 shape; ref A1-A5 analog)
    QueryDef(
      "q01_pricing_summary",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          outD(sum(dec4(col("l_quantity")))).as("sum_qty"),
          outD(sum(dec4(col("l_extendedprice")))).as("sum_base_price"),
          outD(sum(dec4(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(18, 4)) - dec4(col("l_discount"))))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    // ---- projection + pushed-down filter (ref P3/P6; `.explain` shows PushedFilters)
    QueryDef(
      "q02_filter_project",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        // (l_orderkey, l_linenumber) is NOT unique in this data — order
        // by every output column so tied rows are identical rows and
        // row order cannot differ between engines.
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
        WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1997-01-01'
        ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate""")),

    // ---- global top-k (ref O1-O4): TakeOrderedAndProject, no full sort at scale
    QueryDef(
      "q03_topk_orders",
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ---- broadcast equi join to a dimension (ref J1/J3)
    QueryDef(
      "q04_join_part_revenue",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(outD(sum(dec4(col("l_extendedprice")))).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("p_brand"),
      Some(s"""SELECT p_brand, ${sumDec("l_extendedprice", "revenue")}, count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand""")),

    // ---- fact-fact shuffle join (ref J8 shape at scale; SMJ/AQE decides)
    QueryDef(
      "q05_join_orders_priority",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
             outD(sum(dec4(col("l_extendedprice")) *
               (lit(1).cast(DecimalType(18, 4)) - dec4(col("l_discount"))))).as("revenue"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- multi-hop star join through broadcast dims (ref J1+J4+J5 chain)
    QueryDef(
      "q06_star_join_region_year",
      (s, d) => Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), year(col("o_orderdate")).as("o_year"))
        .agg(outD(sum(dec4(col("o_totalprice")))).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy("r_name", "o_year"),
      Some(s"""SELECT r_name, CAST(year(o_orderdate) AS INT) AS o_year,
        ${sumDec("o_totalprice", "revenue")}, count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, CAST(year(o_orderdate) AS INT) ORDER BY r_name, o_year""")),

    // ---- left-semi join / EXISTS (ref J10, P4's semantics)
    QueryDef(
      "q07_semi_join_big_lines",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 49),
              col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- left-anti join / NOT EXISTS (ref J9 change detection shape)
    QueryDef(
      "q08_anti_join_customers",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- non-equi band join against a tiny literal dim (ref J6 theta-join family)
    QueryDef(
      "q09_band_join_quantity",
      (s, d) => {
        import s.implicits._
        val bands = Seq(("low", 0.0, 10.0), ("mid", 10.0, 25.0), ("high", 25.0, 51.0))
          .toDF("bucket", "lo", "hi")
        Tables.lineitem(s, d)
          .join(broadcast(bands), col("l_quantity") > col("lo") && col("l_quantity") <= col("hi"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), outD(sum(dec4(col("l_quantity")))).as("qty"))
          .orderBy("bucket")
      },
      Some(s"""SELECT bucket, count(*) AS n, ${sumDec("l_quantity", "qty")}
        FROM lineitem JOIN (VALUES ('low', 0, 10), ('mid', 10, 25), ('high', 25, 51)) AS b(bucket, lo, hi)
        ON l_quantity > lo AND l_quantity <= hi
        GROUP BY bucket ORDER BY bucket""")),

    // ---- rollup (subtotals; Catalyst Expand — reference has no analogue, §2.4 note)
    QueryDef(
      "q10_rollup_flags",
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), outD(sum(dec4(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n, ${sumDec("l_quantity", "sum_qty")}
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- cube
    QueryDef(
      "q11_cube_priority_status",
      (s, d) => Tables.orders(s, d)
        .cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first),
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""")),

    // ---- grouping sets (SQL surface; Catalyst plans the same Expand)
    QueryDef(
      "q12_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("gs_orders")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
          FROM gs_orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // ---- window: ranking, first-match semantics of ref J6/J7 ("find" = rn 1)
    QueryDef(
      "q13_window_rank_top2",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
            CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS INT) AS rn
          FROM orders) t WHERE rn <= 2 ORDER BY o_custkey, rn""")),

    // ---- window: running frame aggregate (tie-free: o_orderkey is unique)
    QueryDef(
      "q14_window_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            outD(sum(dec4(col("o_totalprice"))).over(w)).as("running_spend"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_spend
        FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ---- window: lag/lead
    QueryDef(
      "q15_window_lag",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
        FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ---- set op: UNION ALL of two projected branches (ref §2.7 cards+items)
    QueryDef(
      "q16_union_all_parties",
      (s, d) => Tables.customer(s, d)
        .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
                lit("customer").as("src"))
        .unionByName(Tables.supplier(s, d)
          .select(col("s_name").as("name"), col("s_acctbal").as("acctbal"),
                  lit("supplier").as("src")))
        .orderBy("src", "name"),
      Some("""SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS src FROM customer
        UNION ALL SELECT s_name, s_acctbal, 'supplier' FROM supplier
        ORDER BY src, name""")),

    // ---- set op: UNION DISTINCT
    QueryDef(
      "q17_union_distinct_nations",
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""")),

    // ---- set op: EXCEPT (ref J10 validation = configured EXCEPT fetched)
    QueryDef(
      "q18_except_idle_customers",
      (s, d) => Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .except(Tables.orders(s, d).select(col("o_custkey").as("custkey")))
        .orderBy("custkey"),
      Some("""SELECT c_custkey AS custkey FROM customer
        EXCEPT SELECT o_custkey FROM orders ORDER BY custkey""")),

    // ---- set op: INTERSECT
    QueryDef(
      "q19_intersect_large_parts",
      (s, d) => Tables.part(s, d).filter(col("p_size") > 25)
        .select(col("p_partkey").as("partkey"))
        .intersect(Tables.lineitem(s, d).select(col("l_partkey").as("partkey")))
        .orderBy("partkey"),
      Some("""SELECT p_partkey AS partkey FROM part WHERE p_size > 25
        INTERSECT SELECT l_partkey FROM lineitem ORDER BY partkey""")),

    // ---- distinct aggregation (ref A3 at-scale form)
    QueryDef(
      "q20_distinct_counts",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- ordered string aggregation (ref A1/A2 markdown render core)
    QueryDef(
      "q21_string_agg_ordered",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(concat_ws(",",
          transform(sort_array(collect_list(col("o_orderkey"))), x => x.cast("string"))).as("keys"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
        string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- distinct-set report (ref A3: sorted collect_set)
    QueryDef(
      "q22_collect_set_sorted",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(concat_ws(",", sort_array(collect_set(col("c_mktsegment")))).as("segments"))
        .orderBy("n_name"),
      Some("""SELECT n_name,
        array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ---- CASE projection (ref A4 checkbox fold + P8 defaults)
    QueryDef(
      "q23_case_projection",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_returnflag") === "R", "returned")
            .when(col("l_returnflag") === "A", "accepted")
            .otherwise("none").as("flag_desc"),
          when(col("l_linestatus") === "F", lit("x")).otherwise(lit(" ")).as("checkbox"))
        .orderBy("l_orderkey", "l_linenumber", "flag_desc", "checkbox"),
      Some("""SELECT l_orderkey, l_linenumber,
        CASE WHEN l_returnflag = 'R' THEN 'returned'
             WHEN l_returnflag = 'A' THEN 'accepted'
             ELSE 'none' END AS flag_desc,
        CASE WHEN l_linestatus = 'F' THEN 'x' ELSE ' ' END AS checkbox
        FROM lineitem ORDER BY l_orderkey, l_linenumber, flag_desc, checkbox""")),

    // ---- string scalar family (ref §2.8: case, substr, len, replace, split, pad)
    QueryDef(
      "q24_string_funcs",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 10).as("prefix10"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_name"), "a", "@").as("subbed"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          rpad(col("p_brand"), 12, ".").as("brand_pad"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS uname, substr(p_name, 1, 10) AS prefix10,
        CAST(length(p_name) AS INT) AS name_len,
        regexp_replace(p_name, 'a', '@', 'g') AS subbed,
        string_split(p_name, ' ')[1] AS first_word,
        rpad(p_brand, 12, '.') AS brand_pad,
        concat_ws('|', p_brand, p_type) AS brand_type
        FROM part ORDER BY p_partkey""")),

    // ---- the reference's bounty regex (transform.js:16) over synthesized names
    QueryDef(
      "q25_bounty_regex",
      (s, d) => {
        val re = graft.transforms.TrelloTransforms.DashAmountRe
        Tables.part(s, d)
          .withColumn("raw_name",
            concat(col("p_name"), lit(" ("), (col("p_partkey") % 9 + 1).cast("string"),
                   lit(".5 Dash)")))
          .select(col("p_partkey"), col("raw_name"),
            regexp_extract(col("raw_name"), re, 1).cast(DecimalType(12, 4))
              .cast(DoubleType).as("amount"),
            trim(regexp_replace(col("raw_name"), re, " ")).as("cleaned"))
          .orderBy("p_partkey")
      },
      Some(s"""SELECT p_partkey, raw_name,
        CAST(CAST(regexp_extract(raw_name, '${graft.transforms.TrelloTransforms.DashAmountRe}', 1) AS DECIMAL(12,4)) AS DOUBLE) AS amount,
        trim(regexp_replace(raw_name, '${graft.transforms.TrelloTransforms.DashAmountRe}', ' ', 'g')) AS cleaned
        FROM (SELECT p_partkey,
          concat(p_name, ' (', CAST(p_partkey % 9 + 1 AS VARCHAR), '.5 Dash)') AS raw_name
          FROM part) t ORDER BY p_partkey""")),

    // ---- date/time family (ref §2.8 note: engine adds what the ref lacks)
    QueryDef(
      "q26_date_funcs",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          quarter(col("o_orderdate")).as("o_quarter"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          last_day(col("o_orderdate").cast("date")).as("month_end"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date")).as("days_to_end"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS o_year,
        CAST(month(o_orderdate) AS INT) AS o_month,
        CAST(day(o_orderdate) AS INT) AS o_day,
        CAST(quarter(o_orderdate) AS INT) AS o_quarter,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        last_day(CAST(o_orderdate AS DATE)) AS month_end,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_end
        FROM orders ORDER BY o_orderkey""")),

    // ---- math family (element-wise IEEE ops are engine-exact; no libm fns)
    QueryDef(
      "q27_math_funcs",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("disc_dev"),
          least(col("l_quantity"), lit(25.0)).as("q_least"),
          greatest(col("l_tax"), col("l_discount")).as("t_max"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          (col("l_linenumber") % 3).as("ln_mod"),
          sqrt(col("l_quantity")).as("q_sqrt"))
        .orderBy("l_orderkey", "l_linenumber", "price_floor", "q_least", "t_max",
          "disc_dev", "price_ceil", "ln_mod", "q_sqrt"),
      Some("""SELECT l_orderkey, l_linenumber,
        abs(l_discount - 0.05) AS disc_dev,
        least(l_quantity, 25.0) AS q_least,
        greatest(l_tax, l_discount) AS t_max,
        CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        l_linenumber % 3 AS ln_mod,
        sqrt(l_quantity) AS q_sqrt
        FROM lineitem ORDER BY l_orderkey, l_linenumber, price_floor, q_least, t_max,
          disc_dev, price_ceil, ln_mod, q_sqrt""")),

    // ---- JSON-in-string extraction (ref §2.8: field.settings from_json)
    QueryDef(
      "q28_json_events",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
             min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
        CAST(sum(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max
        FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events) t
        GROUP BY event_type ORDER BY event_type""")),

    // ---- scalar subquery threshold (exact: max/2, not an fp-sum-derived avg)
    QueryDef(
      "q29_scalar_subquery",
      (s, d) => {
        val o = Tables.orders(s, d)
        val thr = o.agg((max(col("o_totalprice")) / 2).as("thr"))
        o.crossJoin(broadcast(thr))
          .filter(col("o_totalprice") > col("thr"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("top_price"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n, max(o_totalprice) AS top_price
        FROM orders WHERE o_totalprice > (SELECT max(o_totalprice) / 2 FROM orders)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- correlated non-equi anti join (ref J9: desired vs written change set)
    QueryDef(
      "q30_correlated_anti",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
          "left_anti")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        ORDER BY o_orderkey""")),

    // ---- dataset profiler (q152): the per-column QA report every
    //      registry/ingest pipeline publishes — null count, exact
    //      distinct cardinality, min/max — for the whole orders table
    //      in ONE scan: a single agg computes all 6×4 metrics (the
    //      multi-distinct agg plans one Expand over the scan — one
    //      pass; DuckDB's oracle is free to scan per column), then a
    //      stack() unpivots the 1-row result into the per-column
    //      report. At 100 TB the distinct counts would swap to
    //      approx_count_distinct with the same shape (the q66/q20
    //      substitution, error-pinned in ApproxQualitySpec).
    //
    //      Engine-portable stringification: bigints/varchars cast
    //      directly; the TIMESTAMP column through DATE; the DOUBLE
    //      column on a fixed-point cents grid (floor(x*100) — pure
    //      IEEE arithmetic, bit-identical in both engines, where a
    //      double→DECIMAL cast diverges at grid midpoints: the q90
    //      lesson).
    QueryDef(
      "q152_column_profile",
      (s, d) => {
        // one single-distinct agg PER COLUMN, unioned — not one agg
        // with six countDistincts. Six distincts in one Aggregate
        // plan through Catalyst's EXPAND rewrite (every row
        // replicated 7×, one wide shuffle); per-column aggs each
        // plan as a clean two-phase partial-distinct agg over a
        // one-column pruned scan, and under columnar storage six
        // one-column scans read the same bytes as one six-column
        // scan. Measured 6.3× at sf0.1 (3.06 s → 0.49 s).
        val o = Tables.orders(s, d)
        def prof(c: String, minS: String, maxS: String) =
          o.agg(sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col(c)).as("n_distinct"),
            expr(minS).as("min_s"), expr(maxS).as("max_s"))
            .select(lit(c).as("col_name"), col("n_null"),
              col("n_distinct"), col("min_s"), col("max_s"))
        Seq(
          prof("o_orderkey", "CAST(min(o_orderkey) AS STRING)", "CAST(max(o_orderkey) AS STRING)"),
          prof("o_custkey", "CAST(min(o_custkey) AS STRING)", "CAST(max(o_custkey) AS STRING)"),
          prof("o_orderstatus", "min(o_orderstatus)", "max(o_orderstatus)"),
          prof("o_totalprice",
            "CAST(CAST(floor(min(o_totalprice) * 100) AS BIGINT) AS STRING)",
            "CAST(CAST(floor(max(o_totalprice) * 100) AS BIGINT) AS STRING)"),
          prof("o_orderdate",
            "CAST(CAST(min(o_orderdate) AS DATE) AS STRING)",
            "CAST(CAST(max(o_orderdate) AS DATE) AS STRING)"),
          prof("o_orderpriority", "min(o_orderpriority)", "max(o_orderpriority)"))
          .reduce(_ unionByName _)
          .orderBy("col_name")
      },
      Some {
        def row(c: String, minS: String, maxS: String) =
          s"""SELECT '$c' AS col_name,
            CAST(count(*) - count($c) AS BIGINT) AS n_null,
            CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
            $minS AS min_s, $maxS AS max_s FROM orders"""
        Seq(
          row("o_orderkey", "CAST(min(o_orderkey) AS VARCHAR)", "CAST(max(o_orderkey) AS VARCHAR)"),
          row("o_custkey", "CAST(min(o_custkey) AS VARCHAR)", "CAST(max(o_custkey) AS VARCHAR)"),
          row("o_orderstatus", "min(o_orderstatus)", "max(o_orderstatus)"),
          row("o_totalprice",
            "CAST(CAST(floor(min(o_totalprice) * 100) AS BIGINT) AS VARCHAR)",
            "CAST(CAST(floor(max(o_totalprice) * 100) AS BIGINT) AS VARCHAR)"),
          row("o_orderdate",
            "CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR)",
            "CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR)"),
          row("o_orderpriority", "min(o_orderpriority)", "max(o_orderpriority)"))
          .mkString("", " UNION ALL ", " ORDER BY col_name")
      },
      doc = "single-scan dataset profiler over orders: per-column null count, exact distinct cardinality, engine-portable min/max rendering — the registry QA report, swapping to approx sketches at scale")
  )
}
