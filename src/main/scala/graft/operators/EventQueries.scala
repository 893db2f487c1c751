package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/** Event-stream operators over `events` — batch twins of the Structured
  * Streaming surface (SURVEY.md §2.10): every streaming op has a batch
  * formulation the DuckDB oracle can verify; the same plans run under
  * `readStream` in [[graft.streaming.EventsStreaming]].
  *
  * Scale notes: tumbling/sliding windows are hash aggs on (bucket, key)
  * — partial aggregation happens map-side, the shuffle carries only
  * group states. Session windows need per-user ordering, which shuffles
  * once on user_id; at 100 TB skewed users would salt the session-id
  * computation (or rely on AQE skew handling).
  */
object EventQueries {

  private def dec4(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))
  private def outD(c: org.apache.spark.sql.Column) = c.cast("double")

  /** 60 s time bin (shared [[TimeBins]] definition — the streaming
    * twin must bin identically) — the equi key that makes the interval
    * join below shuffle instead of nested-loop. */
  private def bin60(tsCol: String): org.apache.spark.sql.Column =
    TimeBins.bin(tsCol, 60L)

  /** q159's island compression: (user_id, event_type, ts, event_id)
    * events → one row per contiguous same-type run. Lag-change-flag +
    * running sum over ONE partitionBy(user_id) ORDER BY (ts, event_id)
    * spec (single full-size shuffle — pinned by PlanAuditSpec); the
    * run agg output is ≪ events. Shared by q159 (full recompute) and
    * q170 (incremental merge), so the run semantics have exactly one
    * definition. */
  private[graft] def islandRuns(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "grp")
      .agg(max(col("event_type")).as("event_type"),
        min(col("ts")).as("valid_from"),
        min(col("event_id")).as("first_event_id"),
        count(lit(1)).as("n_events"))
  }

  /** The full-recompute interval oracle — q159's twin, and q170's:
    * the incremental merge must equal the batch recompute EXACTLY, so
    * the equivalence claim is itself oracle-gated. */
  private val intervalsOracle: String =
    """WITH flagged AS (SELECT user_id, event_type, ts, event_id,
            CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
                 THEN 1 ELSE 0 END AS chg
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        grouped AS (SELECT *, sum(chg) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
          FROM flagged),
        runs AS (SELECT user_id, grp, max(event_type) AS event_type,
            min(ts) AS valid_from, min(event_id) AS first_event_id,
            CAST(count(*) AS BIGINT) AS n_events
          FROM grouped GROUP BY user_id, grp)
        SELECT user_id,
          CAST(row_number() OVER wr AS INT) AS run_idx,
          event_type, valid_from,
          lead(valid_from) OVER wr AS valid_to,
          first_event_id, n_events
        FROM runs
        WINDOW wr AS (PARTITION BY user_id ORDER BY valid_from, first_event_id)
        ORDER BY user_id, run_idx"""

  /** Run rows → the [valid_from, valid_to) interval ledger with
    * per-user run_idx; runs only (compressed cardinality). */
  private[graft] def assembleIntervals(runs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wr = Window.partitionBy("user_id").orderBy("valid_from", "first_event_id")
    runs
      .withColumn("run_idx", row_number().over(wr).cast("int"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .select("user_id", "run_idx", "event_type", "valid_from",
        "valid_to", "first_event_id", "n_events")
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- tumbling window aggregation
    QueryDef(
      "q42_tumbling_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "5 minutes")("start").as("window_start"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), outD(sum(dec4(col("value")))).as("value_sum"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
        event_type, count(*) AS n,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS value_sum
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""")),

    // ---- sliding window (10 min window, 5 min slide → 2 windows/event)
    QueryDef(
      "q43_sliding_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes")("start").as("window_start"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), outD(sum(dec4(col("value")))).as("value_sum"))
        .orderBy("window_start", "event_type"),
      Some("""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        x AS (SELECT event_type, value, ts,
          unnest([time_bucket(INTERVAL '5 minutes', ts),
                  time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS window_start
          FROM e)
        SELECT window_start, event_type, count(*) AS n,
          CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS value_sum
        FROM x WHERE ts >= window_start AND ts < window_start + INTERVAL '10 minutes'
        GROUP BY 1, 2 ORDER BY window_start, event_type""")),

    // ---- session window per user (10-minute gap)
    QueryDef(
      "q44_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), outD(sum(dec4(col("value")))).as("value_sum"))
        .select(col("user_id"), col("w")("start").as("session_start"),
                col("w")("end").as("session_end"), col("n_events"), col("value_sum"))
        .orderBy("user_id", "session_start"),
      Some("""WITH e AS (SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
        l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        f AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '10 minutes' THEN 1 ELSE 0 END AS flag FROM l),
        g AS (SELECT *, sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f)
        SELECT user_id, min(ts) AS session_start,
          max(ts) + INTERVAL '10 minutes' AS session_end,
          count(*) AS n_events,
          CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS value_sum
        FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""")),

    // ---- streaming-dedup batch twin: first event per (user, type)
    QueryDef(
      "q45_dedup_first_event",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id", "ts")
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts FROM (
          SELECT user_id, event_type, event_id, ts,
            row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
          FROM events) t WHERE rn = 1 ORDER BY user_id, event_type""")),

    // ---- as-of join: each purchase paired with the user's most recent
    //      prior-or-same-instant click. Composed from built-ins (the (a)
    //      tier of the custom-operator ladder): union the two event
    //      roles, then last(ignoreNulls) over an ordered per-user frame.
    //      One shuffle on user_id; no range cross-product, no custom
    //      SparkPlan needed — this shape scales to arbitrary history.
    QueryDef(
      "q67_asof_join",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("click_ts", when(col("event_type") === "click", col("ts")))
          .withColumn("click_id", when(col("event_type") === "click", col("event_id")))
          .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
          .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"), col("last_click_ts"), col("last_click_id"))
          .orderBy("user_id", "purchase_id")
      },
      Some("""SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS purchase_ts,
          last_click_ts, last_click_id
        FROM (SELECT user_id, event_id, ts, event_type,
            last_value(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS) OVER w AS last_click_ts,
            last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER w AS last_click_id
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) t
        WHERE event_type = 'purchase' ORDER BY user_id, purchase_id""")),

    // ---- per-user activity profile (stateful-agg batch twin)
    QueryDef(
      "q46_user_activity",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
             countDistinct(col("event_type")).as("n_types"),
             (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("span_seconds"),
             outD(sum(dec4(col("value")))).as("value_sum"))
        .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS n_events,
        count(DISTINCT event_type) AS n_types,
        CAST(date_diff('second', CAST(min(ts) AS TIMESTAMP), CAST(max(ts) AS TIMESTAMP)) AS BIGINT) AS span_seconds,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS value_sum
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- BINNED interval join (§ scale levers): per error event,
    //      count ALL events in the preceding 60 s — an interval
    //      overlap with NO equi key, the classic O(n²) nested-loop
    //      trap (q09's broadcast theta join only works because its
    //      band table is tiny; here both sides are the event stream).
    //      Binning converts it to an equi shuffle: every event lives
    //      in ONE 60 s bin, each probe window [t−60 s, t) spans at
    //      most two bins, so exploding ≤2 probe bins and equi-joining
    //      on the bin + residual range predicate yields every pair
    //      exactly once, shuffling only on the bin key. Cost scales
    //      with events·density, never n². The oracle is the PLAIN
    //      range join — binning must be semantically invisible.
    QueryDef(
      "q108_interval_join_binned",
      (s, d) => {
        val ev = Tables.events(s, d)
        val base = ev.select(col("event_id").as("x_id"), col("ts").as("x_ts"))
          .withColumn("bin", bin60("x_ts"))
        val probes = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("ts"))
          .withColumn("bin", explode(array_distinct(array(
            bin60("ts - INTERVAL 60 SECONDS"), bin60("ts")))))
        probes.join(base,
            probes("bin") === base("bin") &&
              col("x_ts") >= col("ts") - expr("INTERVAL 60 SECONDS") &&
              col("x_ts") < col("ts"),
            "left")
          .groupBy("event_id")
          .agg(count(col("x_id")).as("n_prior"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, count(x.event_id) AS n_prior
        FROM events e LEFT JOIN events x
          ON x.ts >= e.ts - INTERVAL 60 SECOND AND x.ts < e.ts
        WHERE e.event_type = 'error'
        GROUP BY e.event_id ORDER BY e.event_id"""),
      doc = "binned interval join: 60s-bin equi shuffle + residual range " +
        "predicate replaces the O(n^2) nested loop; exact vs the plain range join"),

    // ---- ordered conversion funnel (q142): the classic product-
    //      analytics ask — view → click → purchase, each stage's
    //      timestamp strictly AFTER the previous stage's first
    //      occurrence (a later click doesn't count without an earlier
    //      view). Three per-user min-aggs chained by equi-joins on
    //      user_id; per-stage states are one row per user, so the
    //      shuffles carry user-cardinality rows (AQE broadcasts the
    //      later, shrinking stages at small scale; at billions of
    //      users all three are plain hash shuffles on the same key —
    //      co-partitioned after the first).
    QueryDef(
      "q142_event_funnel",
      (s, d) => {
        // SINGLE-scan funnel: one pass collects each user's first view
        // plus the sorted click/purchase timestamp lists, then the
        // stage chaining is per-row array arithmetic (t2 = first click
        // after t1, t3 = first purchase after t2 — null chains
        // propagate drop-off). A stage-by-stage join formulation scans
        // the corpus once PER STAGE; this shuffles it once, total.
        // Per-user list size is bounded by that user's own activity —
        // the q44 session caveat (salt pathological users) applies.
        val per = Tables.events(s, d)
          .filter(col("event_type").isin("view", "click", "purchase"))
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("t1"),
            sort_array(collect_list(
              when(col("event_type") === "click", col("ts")))).as("clicks"),
            sort_array(collect_list(
              when(col("event_type") === "purchase", col("ts")))).as("purchases"))
          .withColumn("t2", expr("array_min(filter(clicks, x -> x > t1))"))
          .withColumn("t3", expr("array_min(filter(purchases, x -> x > t2))"))
        val totals = per.agg(count(col("t1")).as("n1"),
          count(col("t2")).as("n2"), count(col("t3")).as("n3"))
        totals.select(explode(array(
            struct(lit(1).as("stage"), lit("view").as("step"), col("n1").as("n_users")),
            struct(lit(2).as("stage"), lit("click").as("step"), col("n2").as("n_users")),
            struct(lit(3).as("stage"), lit("purchase").as("step"), col("n3").as("n_users"))))
            .as("r"), col("n1").as("entered"))
          .select(col("r.stage").as("stage"), col("r.step").as("step"),
            col("r.n_users").as("n_users"),
            round(col("r.n_users").cast("double") / col("entered").cast("double"), 4)
              .as("conv_r"))
          .orderBy("stage")
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
          c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
            JOIN v USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > t1 GROUP BY e.user_id),
          p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
            JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > t2 GROUP BY e.user_id),
          f AS (SELECT CAST(count(*) AS BIGINT) AS entered FROM v),
          stages AS (
            SELECT 1 AS stage, 'view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM v
            UNION ALL
            SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
            UNION ALL
            SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p)
          SELECT stage, step, n_users,
            round(CAST(n_users AS DOUBLE) / entered, 4) AS conv_r
          FROM stages CROSS JOIN f ORDER BY stage"""),
      doc = "ordered view→click→purchase funnel: per-stage first-occurrence chaining with strict time ordering, stage counts + conversion ratios"),

    // ---- retention cohort matrix (q143): users cohorted by the ISO
    //      week of their FIRST event, activity counted per (cohort,
    //      week-offset) — the weekly retention triangle every growth
    //      dashboard renders. Two aggs on user-cardinality frames +
    //      one broadcast of cohort sizes; week arithmetic is exact
    //      integer (date_trunc to Monday, day-diff div 7) in both
    //      engines.
    QueryDef(
      "q143_retention_cohorts",
      (s, d) => {
        val ev = Tables.events(s, d)
        val firstSeen = ev.groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
        val active = ev.select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("active_week"))
          .distinct()
        val cells = active.join(firstSeen, Seq("user_id"))
          .withColumn("week_offset",
            expr("CAST(datediff(active_week, cohort_week) div 7 AS INT)"))
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct(col("user_id")).as("n_users"))
        val sizes = firstSeen.groupBy("cohort_week")
          .agg(count(lit(1)).as("cohort_size"))
        cells.join(broadcast(sizes), Seq("cohort_week"))
          .withColumn("retention_r",
            round(col("n_users").cast("double") / col("cohort_size").cast("double"), 4))
          .select("cohort_week", "week_offset", "n_users", "cohort_size", "retention_r")
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH fs AS (SELECT user_id,
            CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
          FROM events GROUP BY user_id),
        act AS (SELECT DISTINCT user_id,
            CAST(date_trunc('week', ts) AS DATE) AS active_week FROM events),
        cells AS (SELECT cohort_week,
            CAST(date_diff('day', cohort_week, active_week) // 7 AS INT) AS week_offset,
            CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM act JOIN fs USING (user_id)
          GROUP BY cohort_week, date_diff('day', cohort_week, active_week) // 7),
        sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
          FROM fs GROUP BY cohort_week)
        SELECT cohort_week, week_offset, n_users, cohort_size,
          round(CAST(n_users AS DOUBLE) / cohort_size, 4) AS retention_r
        FROM cells JOIN sizes USING (cohort_week)
        ORDER BY cohort_week, week_offset"""),
      doc = "weekly retention cohort matrix: first-event-week cohorts × active-week offsets with exact integer week arithmetic and retention ratios"),

    // ---- watermark / late-data audit (q151): the sizing study every
    //      Structured Streaming deployment needs BEFORE picking
    //      `withWatermark` — replay the stream in arrival order
    //      (event_id), carry the running event-time high-water mark,
    //      and count, per hour, the events a 30 s watermark would have
    //      dropped plus how late the worst one was. The generator's
    //      events are perfectly ordered, so event-time lateness is
    //      INJECTED deterministically (the q84/q139 synthetic-signal
    //      pattern): every 7th event carries an event time 45 s older
    //      than its arrival slot — the classic delayed-source shape.
    //
    //      The running max over arrival order is the scale-sensitive
    //      part: a bare `max() OVER (ORDER BY …)` plans every event
    //      through ONE partition. [[PrefixScan.runningMaxExclusive]]
    //      range-partitions by arrival order, computes the local
    //      running max per partition in parallel, and combines with a
    //      broadcast partitions-sized exclusive prefix — the same
    //      decomposition GlobalRank uses for exact ranks.
    QueryDef(
      "q151_late_event_audit",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"),
            when(col("event_id") % 7 === 0,
              col("ts") - expr("INTERVAL 45 SECOND"))
              .otherwise(col("ts")).as("ets"))
        PrefixScan.runningMaxExclusive(ev, Seq(col("event_id")), "ets", "hwm")
          .withColumn("wm", col("hwm") - expr("INTERVAL 30 SECOND"))
          .withColumn("late_us",
            when(col("ets") < col("wm"),
              unix_micros(col("wm")) - unix_micros(col("ets"))))
          .groupBy(date_trunc("hour", col("ets")).as("window_start"))
          .agg(count(lit(1)).as("n_events"),
            count(col("late_us")).as("n_late"),
            coalesce(expr("max(late_us) div 1000000"), lit(0L)).as("max_late_s"))
          .orderBy("window_start")
      },
      Some("""WITH ev AS (SELECT event_id,
            ts - CASE WHEN event_id % 7 = 0 THEN INTERVAL 45 SECOND
                 ELSE INTERVAL 0 SECOND END AS ets
          FROM events),
        arr AS (SELECT event_id, ets,
            max(ets) OVER (ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              - INTERVAL 30 SECOND AS wm
          FROM ev),
        l AS (SELECT CAST(date_trunc('hour', ets) AS TIMESTAMP) AS window_start,
            CASE WHEN ets < wm THEN epoch_us(wm) - epoch_us(ets) END AS late_us
          FROM arr)
        SELECT window_start, CAST(count(*) AS BIGINT) AS n_events,
          CAST(count(late_us) AS BIGINT) AS n_late,
          CAST(coalesce(max(late_us) // 1000000, 0) AS BIGINT) AS max_late_s
        FROM l GROUP BY window_start ORDER BY window_start"""),
      doc = "watermark sizing audit: running event-time high-water mark over arrival order via distributed prefix scan, hourly counts of events a 30s watermark would drop and their worst lateness"),

    // ---- shuffle-skew audit (q155): the diagnostic a pipeline runs
    //      BEFORE picking a salting factor ([[SkewJoins]]) — per
    //      grouping key: row count, share of the table, and the
    //      ceil-division salt-bucket suggestion
    //      `ceil(cnt / (total/parallelism))` that would spread the
    //      key's rows to ~one task's worth each at 32-way parallelism.
    //      event_type is the genuinely skew-prone key here (5 values
    //      over 10k+ rows — every value is a hot key at 32 tasks).
    //      The suggestion is computed with INTEGER ceil division
    //      ((cnt·32 + tot − 1) div tot) — exact, engine-identical,
    //      no fp. One hash agg + a 1-row broadcast; nothing scales
    //      with more than the key cardinality after the agg.
    QueryDef(
      "q155_skew_audit",
      (s, d) => {
        val byKey = Tables.events(s, d)
          .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        val tot = byKey.agg(sum(col("cnt")).as("tot"))
        byKey.crossJoin(broadcast(tot))
          .select(col("event_type"), col("cnt"),
            round(col("cnt").cast("double") / col("tot").cast("double"), 6)
              .as("share_r"),
            expr("(cnt * 32 + tot - 1) div tot").as("salt_buckets"))
          .orderBy(col("cnt").desc, col("event_type").asc)
      },
      Some("""WITH bykey AS (SELECT event_type, count(*) AS cnt
          FROM events GROUP BY event_type),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM bykey)
        SELECT event_type, cnt,
          round(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share_r,
          (cnt * 32 + tot - 1) // tot AS salt_buckets
        FROM bykey CROSS JOIN tot
        ORDER BY cnt DESC, event_type"""),
      doc = "shuffle-skew audit: per-key row count, table share, and the integer ceil-division salt-bucket suggestion that sizes SkewJoins.saltedEquiJoin at 32-way parallelism"),

    // ---- state-interval compression (q159): the SCD2/gaps-and-islands
    //      build — collapse each user's event stream into contiguous
    //      runs of the same event_type with [valid_from, valid_to)
    //      interval bounds (valid_to NULL on the open current run),
    //      the versioned-dimension shape a pipeline keeps for
    //      point-in-time joins. Islands via the lag-change-flag +
    //      running-sum formulation, NOT the classic double
    //      row_number subtraction: both window passes share ONE
    //      partitionBy(user_id) spec, so the full-size event scan
    //      shuffles exactly once; the run-compression agg and the
    //      closing lead() then move only runs (≪ events). Ordering is
    //      pinned by (ts, event_id) everywhere — ties in ts cannot
    //      flip run boundaries or run indices.
    QueryDef(
      "q159_state_intervals",
      (s, d) => assembleIntervals(islandRuns(
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))))
        .orderBy("user_id", "run_idx"),
      Some(intervalsOracle),
      doc = "SCD2 state-interval build: gaps-and-islands run compression of each user's event stream into [valid_from, valid_to) versions via single-shuffle lag+running-sum islands, run-level lead() for interval close"),

    // ---- incremental SCD2 merge (q170): the nightly shape of q159 —
    //      yesterday's run ledger is STORED (pinned frame standing in
    //      for the persisted table); today's delta arrives; only
    //      TOUCHED users (those with delta events) reprocess, their
    //      fresh runs replacing their stored rows; untouched users'
    //      rows pass through an anti-join untouched. Work scales with
    //      the touched users' history, not the corpus — the q102/q137
    //      incremental pattern on the intervals tier.
    //
    //      The oracle is the FULL RECOMPUTE (q159's own SQL): the
    //      merge must equal the batch answer row-for-row, so the
    //      incremental-equals-recompute claim is itself what the
    //      correctness gate checks every round.
    QueryDef(
      "q170_incremental_intervals",
      (s, d) => {
        val cutoff = lit("2024-01-25 00:00:00").cast("timestamp")
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        // "stored" ledger: base-window runs, pinned
        val baseRuns = islandRuns(ev.filter(col("ts") < cutoff)).localCheckpoint()
        val touched = ev.filter(col("ts") >= cutoff)
          .select("user_id").distinct().localCheckpoint()
        val untouched = baseRuns.join(touched, Seq("user_id"), "left_anti")
        val touchedRuns = islandRuns(ev.join(touched, Seq("user_id"), "left_semi"))
        assembleIntervals(untouched.unionByName(touchedRuns))
          .orderBy("user_id", "run_idx")
      },
      Some(intervalsOracle),
      doc = "incremental SCD2 merge: stored base-window run ledger + delta-touched-user reprocess, anti-join pass-through for untouched users — oracled against the full recompute, so incremental == batch is gate-checked"),

    // ---- decayed activity features (q175): the feature-store fit —
    //      per user, exponential time-decayed event count and value
    //      (τ = 7 days, fixed anchor), the recency features a ranking
    //      or engagement model trains on. Pure per-row weight then a
    //      user-keyed agg: map-side combinable but the Σ exp(−age/τ)
    //      folds in event_id order (the battery's ordered-fold rule)
    //      so both engines trace identical fp. One scan, one shuffle
    //      on user_id, user-sized output.
    QueryDef(
      "q175_decayed_activity",
      (s, d) => {
        val anchorUs = expr("unix_micros(TIMESTAMP '2024-01-31 00:00:00')")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("age_s",
            (anchorUs - unix_micros(col("ts"))).cast("double") / 1000000.0)
          .withColumn("wgt", exp(-col("age_s") / lit(604800.0)))
          .withColumn("wv", col("wgt") * col("value"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            max(col("ts")).as("last_ts"),
            expr("""aggregate(transform(array_sort(collect_list(struct(event_id, wgt))),
                 x -> x.wgt), 0D, (a, v) -> a + v)""").as("rec"),
            expr("""aggregate(transform(array_sort(collect_list(struct(event_id, wv))),
                 x -> x.wv), 0D, (a, v) -> a + v)""").as("wval"))
          .select(col("user_id"), col("n_events"), col("last_ts"),
            round(col("rec"), 4).as("recency_r"),
            round(col("wval"), 4).as("wvalue_r"))
          .orderBy("user_id")
      },
      Some("""WITH w AS (SELECT user_id, event_id, ts, value,
            exp(-(CAST(epoch_us(TIMESTAMP '2024-01-31 00:00:00') - epoch_us(ts) AS DOUBLE)
              / 1000000.0) / 604800.0) AS wgt
          FROM events)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          max(ts) AS last_ts,
          round(list_sum(list(wgt ORDER BY event_id)), 4) AS recency_r,
          round(list_sum(list(wgt * value ORDER BY event_id)), 4) AS wvalue_r
        FROM w GROUP BY user_id ORDER BY user_id"""),
      doc = "feature-store recency fit: per-user exponential time-decayed event count and value (tau = 7 days, fixed anchor), event-id-ordered folds — one scan, one user-keyed shuffle"),

    // ---- behavioral Markov chain (q178): the first-order transition
    //      matrix of event types within each user's stream — P(next |
    //      current) with counts, the behavioral-model fit that feeds
    //      next-action prediction and anomaly scoring. One
    //      partitionBy(user_id) lead() (the q159 shuffle), then a
    //      (cur, next)-keyed agg whose output is |types|² — map-side
    //      combinable, matrix-sized forever. Row-normalization joins
    //      the |types|-row marginal back by broadcast.
    QueryDef(
      "q178_markov_transitions",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val trans = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("cur_type"), col("next_type"))
          .agg(count(lit(1)).as("c"))
        val rowTot = trans.groupBy("cur_type").agg(sum(col("c")).as("tot"))
        trans.join(broadcast(rowTot), Seq("cur_type"))
          .select(col("cur_type"), col("next_type"), col("c"),
            round(col("c").cast("double") / col("tot"), 4).as("p_r"))
          .orderBy("cur_type", "next_type")
      },
      Some("""WITH t AS (SELECT user_id, event_type, ts, event_id,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
          FROM events),
        trans AS (SELECT event_type AS cur_type, next_type, count(*) AS c
          FROM t WHERE next_type IS NOT NULL GROUP BY event_type, next_type),
        rt AS (SELECT cur_type, CAST(sum(c) AS BIGINT) AS tot FROM trans GROUP BY cur_type)
        SELECT trans.cur_type, next_type, c,
          round(CAST(c AS DOUBLE) / tot, 4) AS p_r
        FROM trans JOIN rt ON trans.cur_type = rt.cur_type
        ORDER BY trans.cur_type, next_type"""),
      doc = "first-order behavioral Markov chain: per-user lead() transitions, (cur, next)-keyed matrix-sized agg, broadcast row-normalization — the next-action model fit"),

    // ---- z-score anomaly audit (q180): per event_type, fit the
    //      value distribution (mean/std, ordered event_id folds, the
    //      q166 variance arithmetic) and flag |z| > 3 outliers —
    //      count per type plus the worst offender (argmax on the
    //      ROUNDED |z|, the q176 ulp rule, ties to min event_id).
    //      The monitoring pass a pipeline runs over ingested metrics
    //      before trusting them. Two passes over events (fit, then
    //      score against the broadcast type-level parameters) — the
    //      irreducible shape of fit-then-apply; everything aggregates
    //      type-keyed.
    QueryDef(
      "q180_value_anomalies",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("event_id"), col("value"))
        val st = ev.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            expr("""aggregate(transform(array_sort(collect_list(struct(event_id, value))),
                 x -> x.value), 0D, (a, v) -> a + v)""").as("sv"),
            expr("""aggregate(transform(array_sort(collect_list(struct(event_id, value))),
                 x -> x.value * x.value), 0D, (a, v) -> a + v)""").as("svv"))
          .withColumn("mean", col("sv") / col("n"))
          .withColumn("std", sqrt(greatest(
            col("svv") / col("n") - (col("sv") / col("n")) * (col("sv") / col("n")),
            lit(0.0))))
        ev.join(broadcast(st.select("event_type", "n", "mean", "std")), Seq("event_type"))
          .withColumn("z", (col("value") - col("mean")) / col("std"))
          .groupBy("event_type")
          .agg(max(col("n")).as("n"),
            max(col("mean")).as("mean"), max(col("std")).as("std"),
            sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L)).as("n_anom"),
            min(struct((-round(abs(col("z")), 6)).as("nz"),
              col("event_id").as("event_id"))).as("m"))
          .select(col("event_type"), col("n"),
            // value means straddle zero — roundZ folds a −0.0 round
            QueryDef.roundZ(col("mean"), 4).as("mean_r"),
            round(col("std"), 4).as("std_r"),
            col("n_anom"),
            col("m.event_id").as("worst_event_id"),
            (-col("m.nz") + 0.0).as("worst_absz_r"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, event_id, value FROM events),
        st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            list_sum(list(value ORDER BY event_id)) AS sv,
            list_sum(list(value * value ORDER BY event_id)) AS svv
          FROM ev GROUP BY event_type),
        p AS (SELECT event_type, n, sv / n AS mean,
            sqrt(greatest(svv / n - (sv / n) * (sv / n), 0)) AS std
          FROM st),
        z AS (SELECT ev.event_type, event_id, n, mean, std,
            (value - mean) / std AS z
          FROM ev JOIN p ON ev.event_type = p.event_type)
        SELECT event_type, max(n) AS n,
          round(max(mean), 4) + 0.0 AS mean_r, round(max(std), 4) AS std_r,
          CAST(sum(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anom,
          (min(struct_pack(nz := -round(abs(z), 6), event_id := event_id))).event_id
            AS worst_event_id,
          -(min(struct_pack(nz := -round(abs(z), 6), event_id := event_id))).nz + 0.0
            AS worst_absz_r
        FROM z GROUP BY event_type ORDER BY event_type"""),
      doc = "per-type z-score anomaly audit: ordered-fold mean/std fit, broadcast apply, |z|>3 counts and rounded-argmax worst offender — the fit-then-apply metrics monitor"),

    // ---- rate-stability audit (q194): per event_type, the hourly
    //      arrival process's health numbers — Fano factor
    //      (variance/mean of hourly counts; 1 = Poisson, higher =
    //      bursty) and lag-1 autocorrelation (persistence of load) —
    //      what a capacity planner reads before sizing watermarks and
    //      triggers. The hour lattice is COMPLETED first (types ×
    //      distinct hours, zero-filled): silently dropping empty
    //      hours biases both statistics. Every Σ is an exact integer
    //      sum of counts (order-independent — no fold idiom needed);
    //      fp appears only in the final divisions, so both engines
    //      agree bit-for-bit before rounding.
    QueryDef(
      "q194_rate_stability",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hc = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val hours = hc.select("h").distinct()
        val types = hc.select("event_type").distinct()
        val lattice = types.crossJoin(hours)
          .join(hc, Seq("event_type", "h"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
        val w = Window.partitionBy("event_type").orderBy("h")
        val paired = lattice.withColumn("p", lag(col("c"), 1).over(w))
        val base = lattice.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
            sum(col("c") * col("c")).as("scc"))
        val lagg = paired.filter(col("p").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("m"), sum(col("p")).as("sx"), sum(col("c")).as("sy"),
            sum(col("p") * col("c")).as("sxy"),
            sum(col("p") * col("p")).as("sxx"), sum(col("c") * col("c")).as("syy"))
        base.join(lagg, Seq("event_type"))
          .select(col("event_type"), col("n").as("n_hours"),
            round(col("sc").cast("double") / col("n"), 4).as("mean_r"),
            round((col("n") * col("scc") - col("sc") * col("sc")).cast("double") /
              (col("n") * col("sc")).cast("double"), 4).as("fano_r"),
            // autocorrelation ∈ [−1, 1] — roundZ folds a −0.0 round
            QueryDef.roundZ((col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("m") * col("syy") - col("sy") * col("sy")).cast("double")), 4)
              .as("lag1_r"))
          .orderBy("event_type")
      },
      Some("""WITH hc AS (SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
            count(*) AS c
          FROM events GROUP BY event_type, date_trunc('hour', ts)),
        lattice AS (SELECT t.event_type, hrs.h, coalesce(hc.c, 0) AS c
          FROM (SELECT DISTINCT event_type FROM hc) t
          CROSS JOIN (SELECT DISTINCT h FROM hc) hrs
          LEFT JOIN hc ON hc.event_type = t.event_type AND hc.h = hrs.h),
        base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS scc
          FROM lattice GROUP BY event_type),
        paired AS (SELECT event_type, c,
            lag(c) OVER (PARTITION BY event_type ORDER BY h) AS p
          FROM lattice),
        lagg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m,
            CAST(sum(p) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy,
            CAST(sum(p * c) AS BIGINT) AS sxy,
            CAST(sum(p * p) AS BIGINT) AS sxx, CAST(sum(c * c) AS BIGINT) AS syy
          FROM paired WHERE p IS NOT NULL GROUP BY event_type)
        SELECT base.event_type, n AS n_hours,
          round(CAST(sc AS DOUBLE) / n, 4) AS mean_r,
          round(CAST(n * scc - sc * sc AS DOUBLE) / CAST(n * sc AS DOUBLE), 4) AS fano_r,
          round(CAST(m * sxy - sx * sy AS DOUBLE) /
            sqrt(CAST(m * sxx - sx * sx AS DOUBLE) * CAST(m * syy - sy * sy AS DOUBLE)), 4)
            + 0.0 AS lag1_r
        FROM base JOIN lagg ON base.event_type = lagg.event_type
        ORDER BY base.event_type"""),
      doc = "per-type arrival-process health: Fano factor and lag-1 autocorrelation over the ZERO-FILLED hourly lattice — exact integer sums, fp only in the final divisions; the watermark/trigger sizing read")
  )
}
