package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Corpus- and feature-level statistics a training pipeline fits once
  * and applies everywhere: association rules over the interaction log
  * (the market-basket view of user–item data), per-dimension embedding
  * standardization parameters (the whitening/scaling fit), and the
  * Zipf rank-frequency fit (the one-number corpus-health check —
  * natural text slopes near −1; template spam or truncated vocabs
  * bend the line).
  */
object CorpusStats {

  /** Relative-support floor for q165 — a fraction of the user base,
    * not an absolute count, so the filter stays meaningful as the log
    * grows. 0.25 keeps a non-degenerate rule set at both test SFs
    * (the pair-support distribution tops out near 0.28 at sf0.1). */
  private val MinSupport = 0.25

  /** Head size for the Zipf fit — the fit runs on the top-R terms,
    * so the regression input is fixed-size at any corpus scale. */
  private val ZipfHead = 100

  val defs: Seq[QueryDef] = Seq(

    // ---- association rules (q165): pairwise support / confidence /
    //      lift over the capped user–item interactions — FP-growth's
    //      output shape for the 2-itemset tier, the co-occurrence
    //      signal a curriculum or recommender join consumes. Shares
    //      TriangleCount's capped expansion (one definition of the
    //      O(deg²) bound) and keys every agg on the item or pair, so
    //      nothing scales past items² after the pair agg. Item
    //      supports broadcast into the pair frame (items ≪ pairs);
    //      the user-base count rides a 1-row broadcast cross.
    QueryDef(
      "q165_association_rules",
      (s, d) => {
        val capped = TriangleCount.cappedInteractions(s, d).localCheckpoint()
        val pairs = TriangleCount.coocCounts(capped)
        val items = capped.groupBy("item").agg(count(lit(1)).as("ci"))
        val nu = capped.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("nu"))
        pairs
          .join(broadcast(items.select(col("item").as("i"), col("ci").as("ca"))), Seq("i"))
          .join(broadcast(items.select(col("item").as("j"), col("ci").as("cb"))), Seq("j"))
          .crossJoin(broadcast(nu))
          .withColumn("supp", col("w").cast("double") / col("nu"))
          .filter(col("supp") >= MinSupport)
          .select(col("i").as("item_a"), col("j").as("item_b"), col("w").as("n_ab"),
            round(col("supp"), 4).as("supp_r"),
            round(col("w").cast("double") / col("ca"), 4).as("conf_ab_r"),
            round(col("w").cast("double") / col("cb"), 4).as("conf_ba_r"),
            round((col("w").cast("double") * col("nu")) /
              (col("ca").cast("double") * col("cb")), 4).as("lift_r"))
          .orderBy("item_a", "item_b")
      },
      Some(s"""WITH ${TriangleCount.oracleCappedCtes},
        pairs AS (SELECT a.item AS i, b.item AS j, count(*) AS w
          FROM capped a JOIN capped b
            ON a.user_id = b.user_id AND a.item < b.item
          GROUP BY a.item, b.item),
        items AS (SELECT item, count(*) AS ci FROM capped GROUP BY item),
        nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM capped)
        SELECT i AS item_a, j AS item_b, w AS n_ab,
          round(CAST(w AS DOUBLE) / nu, 4) AS supp_r,
          round(CAST(w AS DOUBLE) / ia.ci, 4) AS conf_ab_r,
          round(CAST(w AS DOUBLE) / ib.ci, 4) AS conf_ba_r,
          round((CAST(w AS DOUBLE) * nu) / (CAST(ia.ci AS DOUBLE) * ib.ci), 4) AS lift_r
        FROM pairs JOIN items ia ON pairs.i = ia.item
                   JOIN items ib ON pairs.j = ib.item
                   CROSS JOIN nu
        WHERE CAST(w AS DOUBLE) / nu >= $MinSupport
        ORDER BY item_a, item_b"""),
      doc = "pairwise association rules over capped user-item interactions: support/confidence/lift with an SF-stable relative-support floor — broadcast item supports, pair-keyed aggs only"),

    // ---- embedding standardization fit (q166): per-dimension mean,
    //      std, min, max over the embedding table — the parameters a
    //      whitening/normalization step applies downstream. One scan
    //      posexplodes to (dim, v) — map-side combinable into d
    //      groups; the means and the sum-of-squares use the
    //      codebase's ordered member-id fold so the doubles are
    //      bit-identical cross-engine; variance by the same
    //      sumsq/n − mean² arithmetic on both sides, clamped at 0
    //      before sqrt.
    QueryDef(
      "q166_embedding_dim_stats",
      (s, d) => {
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
          .groupBy("dim")
          .agg(count(lit(1)).as("n"),
            expr("""aggregate(transform(array_sort(collect_list(struct(vec_id, v))),
                 x -> x.v), 0D, (a, y) -> a + y)""").as("sv"),
            expr("""aggregate(transform(array_sort(collect_list(struct(vec_id, v))),
                 x -> x.v * x.v), 0D, (a, y) -> a + y)""").as("svv"),
            min(col("v")).as("mn"), max(col("v")).as("mx"))
          // roundZ normalizes IEEE −0.0 from rounding a tiny negative
          // mean — DuckDB keeps the sign bit, Spark doesn't; the
          // same term on both sides makes the zero unambiguous.
          .select(col("dim"), col("n"),
            QueryDef.roundZ(col("sv") / col("n"), 4).as("mean_r"),
            round(sqrt(greatest(
              col("svv") / col("n") - (col("sv") / col("n")) * (col("sv") / col("n")),
              lit(0.0))), 4).as("std_r"),
            QueryDef.roundZ(col("mn"), 4).as("mn_r"),
            QueryDef.roundZ(col("mx"), 4).as("mx_r"))
          .orderBy("dim")
      },
      Some("""WITH x AS (SELECT vec_id,
            unnest(list_transform(range(len(embedding)),
              i -> {'dim': i, 'v': CAST(embedding[i+1] AS DOUBLE)})) AS u
          FROM embeddings),
        g AS (SELECT CAST(u.dim AS INT) AS dim, CAST(count(*) AS BIGINT) AS n,
            list_sum(list(u.v ORDER BY vec_id)) AS sv,
            list_sum(list(u.v * u.v ORDER BY vec_id)) AS svv,
            min(u.v) AS mn, max(u.v) AS mx
          FROM x GROUP BY u.dim)
        SELECT dim, n, round(sv / n, 4) + 0.0 AS mean_r,
          round(sqrt(greatest(svv / n - (sv / n) * (sv / n), 0)), 4) AS std_r,
          round(mn, 4) + 0.0 AS mn_r, round(mx, 4) + 0.0 AS mx_r
        FROM g ORDER BY dim"""),
      doc = "per-dimension embedding standardization fit: mean/std (ordered folds, identical variance arithmetic), min/max — the whitening parameters, d-sized output from one map-side-combinable pass"),

    // ---- Zipf rank-frequency fit (q167): least-squares slope of
    //      ln(freq) on ln(rank) over the top-100 terms — the corpus
    //      health number (natural language ≈ −1). The vocabulary agg
    //      is map-side combinable; the head extraction is a top-k
    //      (TakeOrdered, never a full sort); the regression then runs
    //      on a FIXED 100-row frame whatever the corpus size, with
    //      every Σ a fixed-point BIGINT fold (order-free, O(1)
    //      buffers — the q185/q200 rule).
    QueryDef(
      "q167_zipf_fit",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
          .filter(col("term") =!= "")
          .groupBy("term").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("term").asc)
          .limit(ZipfHead)
        val xy = counts
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("c").desc, col("term").asc)))
          .select(col("rank"), log(col("rank").cast("double")).as("x"),
            log(col("c").cast("double")).as("y"))
        // fixed-point BIGINT folds (the q185/q200 rule): each term
        // lands on a 10^9 grid — floor is bit-defined on identical
        // IEEE doubles in both engines — and the integer sum is
        // order-free and O(1)-buffered, vs the former O(head)
        // collect_list array (head is fixed at 100, so this is
        // uniformity, not necessity)
        def fold(e: String) = sum(expr(s"CAST(floor(($e) * 1e9) AS BIGINT)"))
          .cast("double") / lit(1e9)
        xy.agg(count(lit(1)).as("n"),
            fold("x").as("sx"), fold("y").as("sy"),
            fold("x * y").as("sxy"),
            fold("x * x").as("sxx"), fold("y * y").as("syy"))
          .select(col("n"),
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
            col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"))
          // slope/intercept straddle zero (Zipf slope is negative by
          // nature) — roundZ folds a −0.0 round at the source
          .select(col("n"), QueryDef.roundZ(col("slope"), 4).as("slope_r"),
            QueryDef.roundZ((col("sy") - col("slope") * col("sx")) / col("n"), 4)
              .as("intercept_r"),
            QueryDef.roundZ(((col("n") * col("sxy") - col("sx") * col("sy")) *
                (col("n") * col("sxy") - col("sx") * col("sy"))) /
              ((col("n") * col("sxx") - col("sx") * col("sx")) *
                (col("n") * col("syy") - col("sy") * col("sy"))), 4).as("r2_r"))
      },
      Some(s"""WITH counts AS (SELECT term, count(*) AS c
          FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
            FROM documents) t
          WHERE term <> '' GROUP BY term
          ORDER BY c DESC, term LIMIT $ZipfHead),
        xy AS (SELECT rank, ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
          FROM (SELECT term, c, row_number() OVER (ORDER BY c DESC, term) AS rank
            FROM counts) r),
        sums AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST(floor((x) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sx,
            CAST(sum(CAST(floor((y) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sy,
            CAST(sum(CAST(floor((x * y) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sxy,
            CAST(sum(CAST(floor((x * x) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sxx,
            CAST(sum(CAST(floor((y * y) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS syy
          FROM xy),
        fit AS (SELECT n, sx, sy, sxy, sxx, syy,
            (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope FROM sums)
        SELECT n, round(slope, 4) + 0.0 AS slope_r,
          round((sy - slope * sx) / n, 4) + 0.0 AS intercept_r,
          round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
            ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) + 0.0 AS r2_r
        FROM fit"""),
      doc = "Zipf rank-frequency fit over the top-100 vocabulary head: least-squares slope/intercept/R² of ln(freq) vs ln(rank), rank-ordered folds, fixed-size regression input at any corpus scale"),

    // ---- embedding covariance fit (q185): the full upper-triangle
    //      covariance matrix of the embedding dimensions — q166's
    //      diagonal extended to the whitening/PCA-precursor Gram
    //      form. Distributed as Gram accumulation: each vector
    //      contributes its d(d+1)/2 upper-triangle products, the
    //      (i, j)-keyed agg partial-combines map-side, and the final
    //      state is d² cells regardless of row count. Every Σ is a
    //      FIXED-POINT BIGINT sum (the q150/q126 pattern): products
    //      land on a 10^9 grid via floor(p·1e9) — floor is bit-defined
    //      on identical IEEE doubles in both engines — and the BIGINT
    //      sum is commutative, map-side combinable, and bit-exact in
    //      any shuffle order, so the agg buffer is O(1) per cell
    //      (never an O(n) collect_list array). Headroom: |p| < 1 for
    //      unit-scale embeddings → per-cell sums int64-safe to
    //      n ≈ 9·10^9 vectors; beyond that drop the grid to 10^6 for
    //      the same 10^3 headroom factor. cov(i,j) = Σvᵢvⱼ/n − μᵢμⱼ
    //      with the means joined from a broadcast d-row frame; −0.0
    //      normalized (tiny negative covariances round to signed zero
    //      in DuckDB).
    QueryDef(
      "q185_dim_covariance",
      (s, d) => {
        // ONE pass: the exploded means/cells formulation materialized
        // n·d + n·d(d+1)/2 struct rows through two hash aggregations
        // (one 3 s job at sf0.1 — allocation-bound, see GramAgg);
        // gram_sums folds the identical fixed-point BIGINT sums in a
        // compiled per-row loop, O(d²) state, map-side combinable,
        // bit-exact in any order. mu and cov reproduce the exact
        // double arithmetic of the old frames (svq/1e9/n, spq/1e9/n −
        // mi·mj) — oracle unchanged.
        val g = Tables.embeddings(s, d)
          .select(col("embedding").cast("array<double>").as("emb"))
          .agg(graft.functions.GramAgg.gram_sums(col("emb")).as("g"))
        def mu(pos: org.apache.spark.sql.Column) = {
          val dcell = element_at(col("dims"), (pos + 1).cast("int"))
          dcell.getField("svq").cast("double") / lit(1e9) / dcell.getField("n")
        }
        g.select(col("g.dims").as("dims"), explode(col("g.cells")).as("c"))
          .select(col("c.i").as("i"), col("c.j").as("j"), col("c.n").as("n"),
            col("c.spq").as("spq"),
            mu(col("c.i")).as("mi"), mu(col("c.j")).as("mj"))
          .select(col("i"), col("j"), col("n"),
            QueryDef.roundZ(col("spq").cast("double") / lit(1e9) / col("n") -
              col("mi") * col("mj"), 6).as("cov_r"))
          .orderBy("i", "j")
      },
      Some("""WITH x AS (SELECT vec_id,
            list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb FROM embeddings),
        md AS (SELECT CAST(u.dim AS INT) AS dim, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST(floor(u.v * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / count(*) AS mu
          FROM (SELECT vec_id, unnest(list_transform(range(len(emb)),
              i -> {'dim': i, 'v': emb[i+1]})) AS u FROM x) t
          GROUP BY u.dim),
        cells AS (SELECT CAST(u.i AS INT) AS i, CAST(u.j AS INT) AS j, u.p AS p
          FROM (SELECT vec_id, unnest(flatten(list_transform(range(len(emb)), i ->
              list_transform(range(i, len(emb)), j ->
                {'i': i, 'j': j, 'p': emb[i+1] * emb[j+1]})))) AS u FROM x) t),
        g AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST(floor(p * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / count(*) AS sp_n
          FROM cells GROUP BY i, j)
        SELECT g.i, g.j, g.n,
          round(sp_n - mi.mu * mj.mu, 6) + 0.0 AS cov_r
        FROM g JOIN md mi ON g.i = mi.dim JOIN md mj ON g.j = mj.dim
        ORDER BY g.i, g.j"""),
      doc = "upper-triangle embedding covariance via distributed Gram accumulation: d(d+1)/2 products per vector, (i,j)-keyed map-side-combinable BIGINT fixed-point agg (O(1) buffers), broadcast means — the PCA/whitening precursor fit")
  )
}
