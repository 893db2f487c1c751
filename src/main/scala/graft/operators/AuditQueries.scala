package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-health audit tier, round 14: sketch self-verification (the
  * q66 pattern generalized to quantile sketches), asymmetric
  * containment dedup (quote/subset detection — the direction Jaccard
  * can't see), and two lexical cross-source health matrices
  * (vocabulary overlap, unigram-distribution drift). Every query is
  * hash-oracled; sketch outputs follow the q66 rule — exact values
  * oracled, the approximation's error contract asserted as an
  * oracle-TRUE boolean so drift outside the bound hash-fails.
  */
object AuditQueries {

  /** Top-V vocabulary size for the drift lattice (q199): fixed, so the
    * per-source lattice is sources×V regardless of corpus scale. */
  private val DriftVocab = 500

  /** The planted quote corpus the containment family (q197/q202) runs
    * on: originals plus each doc's first-half-token "quote" at
    * doc_id + 2,000,000 — deterministic subset pairs with
    * containment(quote→original) ≈ 1 at Jaccard ≈ 0.5. */
  private def quoteCorpus(s: org.apache.spark.sql.SparkSession, d: String) = {
    val quotes = Tables.documents(s, d)
      .withColumn("ts", split(trim(col("text")), "\\s+"))
      .select((col("doc_id") + 2000000L).as("doc_id"),
        array_join(slice(col("ts"), lit(1),
          greatest(lit(3), (size(col("ts")) / 2))), " ").as("text"))
    DedupQueries.originalDocs(s, d).unionByName(quotes)
  }

  /** Band candidates over the quote corpus scored with the exact
    * shingle intersection: (doc_a, doc_b, inter, jaccard, c_ab, c_ba),
    * unrounded — ONE definition feeding q197's review feed and q202's
    * policy sweep, so the two can't drift. */
  private def containmentScored(s: org.apache.spark.sql.SparkSession, d: String) = {
    val sets = DedupQueries.shingleSetsOf(quoteCorpus(s, d)).localCheckpoint()
    val pairs = DedupQueries.candidatePairsFrom(
      DedupQueries.minhashFrom(sets).localCheckpoint())
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("sd").as("sa")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sd").as("sb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("c_ab", col("inter").cast("double") / size(col("sa")))
      .withColumn("c_ba", col("inter").cast("double") / size(col("sb")))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .select("doc_a", "doc_b", "inter", "jaccard", "c_ab", "c_ba")
  }

  /** Oracle mirror of [[quoteCorpus]] — the corpus SELECT fed to
    * [[DedupQueries.oracleBandsCteFor]]. */
  private val oracleQuoteCorpusSelect: String =
    """
        SELECT doc_id, trim(text) AS text FROM documents
        UNION ALL
        SELECT doc_id + 2000000,
          array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1,
            greatest(3, len(string_split_regex(trim(text), '\s+')) // 2)), ' ')
        FROM documents"""

  /** Oracle mirror of [[containmentScored]]: bands + sets + capped
    * cand + the `scored` CTE, shared by q197/q202. */
  private def oracleQuoteScoredCtes: String = {
    val inter = DedupQueries.oracleInterExpr
    s"""${DedupQueries.oracleBandsCteFor(oracleQuoteCorpusSelect)},
        ${DedupQueries.oracleSetsCteShared},
        ${DedupQueries.oracleCandCte()},
        scored AS (SELECT doc_a, doc_b,
            CAST($inter AS BIGINT) AS inter,
            CAST($inter AS DOUBLE) / (len(sa.sd) + len(sb.sd) - $inter) AS jaccard,
            CAST($inter AS DOUBLE) / len(sa.sd) AS c_ab,
            CAST($inter AS DOUBLE) / len(sb.sd) AS c_ba
          FROM cand JOIN sets sa ON cand.doc_a = sa.doc_id
                    JOIN sets sb ON cand.doc_b = sb.doc_id)"""
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- quantile-sketch audit (q196): per-source token-count
    //      quartiles through percentile_approx (the GK sketch — the
    //      only per-group quantile a 100 TB group can afford; q99's
    //      exact equi-depth is the full-sort form) SELF-VERIFIED
    //      against the exact order statistics: the exact quartiles
    //      come from the grid-cumsum pattern (q183/q184 — value-
    //      grouped counts, cumulative window over the value grid,
    //      never a row-scale sort-limit), and each sketch value must
    //      land inside the GK rank window [p·n − n/acc − 1,
    //      p·n + n/acc + 1] mapped back to values. The oracle computes
    //      the exact quartiles and asserts the window booleans TRUE —
    //      a sketch outside its own guarantee hash-fails the row
    //      (the q66 rule; magnitudes pinned in ApproxQualitySpec's
    //      percentile tests).
    QueryDef(
      "q196_quantile_sketch_audit",
      (s, d) => {
        val nt = Tables.documents(s, d)
          .select(col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("nt"))
        val grp = nt.groupBy("source", "nt").agg(count(lit(1)).as("c"))
        val tot = nt.groupBy("source").agg(count(lit(1)).as("n"))
        val wc = Window.partitionBy("source").orderBy("nt")
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = grp.withColumn("cum", sum(col("c")).over(wc))
          .join(broadcast(tot), Seq("source"))
        def atRank(r: org.apache.spark.sql.Column) =
          min(when(col("cum") >= r, col("nt")))
        def exactQ(p: Double) = atRank(ceil(lit(p) * col("n")))
        // GK guarantee: rank error <= n/accuracy; bracket by one extra
        // rank each side so a tie-convention difference can't flap
        def lo(p: Double) = atRank(greatest(lit(1.0),
          floor(lit(p) * col("n") - col("n") / lit(10000.0) - lit(1.0))))
        def hi(p: Double) = atRank(least(col("n").cast("double"),
          ceil(lit(p) * col("n") + col("n") / lit(10000.0) + lit(1.0))))
        val exact = cum.groupBy("source").agg(
          max(col("n")).as("n_docs"),
          exactQ(0.25).as("p25"), exactQ(0.5).as("p50"), exactQ(0.75).as("p75"),
          lo(0.25).as("lo25"), hi(0.25).as("hi25"),
          lo(0.5).as("lo50"), hi(0.5).as("hi50"),
          lo(0.75).as("lo75"), hi(0.75).as("hi75"))
        val approx = nt.groupBy("source").agg(
          expr("percentile_approx(nt, array(0.25D, 0.5D, 0.75D), 10000)").as("ap"))
        exact.join(approx, Seq("source"))
          .select(col("source"), col("n_docs"),
            col("p25"), col("p50"), col("p75"),
            (element_at(col("ap"), 1).between(col("lo25"), col("hi25")))
              .as("ok25"),
            (element_at(col("ap"), 2).between(col("lo50"), col("hi50")))
              .as("ok50"),
            (element_at(col("ap"), 3).between(col("lo75"), col("hi75")))
              .as("ok75"))
          .orderBy("source")
      },
      Some("""WITH nt AS (SELECT source,
            CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
          FROM documents),
        g AS (SELECT source, nt, count(*) AS c FROM nt GROUP BY source, nt),
        t AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM nt GROUP BY source),
        cum AS (SELECT g.source AS source, nt,
            sum(c) OVER (PARTITION BY g.source ORDER BY nt
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, n
          FROM g JOIN t ON g.source = t.source)
        SELECT source, max(n) AS n_docs,
          min(CASE WHEN cum >= ceil(0.25 * n) THEN nt END) AS p25,
          min(CASE WHEN cum >= ceil(0.5 * n) THEN nt END) AS p50,
          min(CASE WHEN cum >= ceil(0.75 * n) THEN nt END) AS p75,
          TRUE AS ok25, TRUE AS ok50, TRUE AS ok75
        FROM cum GROUP BY source ORDER BY source"""),
      doc = "per-source token-count quartiles via the GK sketch, self-verified: exact grid-cumsum order statistics oracled, sketch values asserted inside their own rank-error window as oracle-TRUE booleans — the q66 rule for quantiles"),

    // ---- containment near-dup pairs (q197): the ASYMMETRIC dedup
    //      direction Jaccard misses — a short doc quoted inside a long
    //      one has containment(short→long) ≈ 1 but Jaccard ≈
    //      |short|/|long|, so a Jaccard-gated pipeline (q37) keeps
    //      both copies. Planted structure: each doc's first-half-token
    //      "quote" joins the corpus at doc_id + 2,000,000. Candidates
    //      come from the SAME MinHash band join as the q35 family
    //      (shuffle-once equi on the band key — subset pairs at
    //      J ≈ 0.5 collide at the honest union-of-bands rate, which
    //      both engines reproduce bit-identically); exact shingle
    //      intersection then scores BOTH containment directions on
    //      candidates only, and the asym_quote flag marks
    //      high-containment/low-Jaccard pairs — the review feed a
    //      quote-aware dedup acts on.
    QueryDef(
      "q197_containment_pairs",
      (s, d) => containmentScored(s, d)
        .filter(greatest(col("c_ab"), col("c_ba")) >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("inter"),
          round(col("jaccard"), 4).as("jaccard_r"),
          round(col("c_ab"), 4).as("c_ab_r"),
          round(col("c_ba"), 4).as("c_ba_r"),
          (greatest(col("c_ab"), col("c_ba")) >= 0.8 && col("jaccard") < 0.6)
            .cast("int").as("asym_quote"))
        .orderBy("doc_a", "doc_b"),
      Some(s"""$oracleQuoteScoredCtes
        SELECT doc_a, doc_b, inter,
          round(jaccard, 4) AS jaccard_r,
          round(c_ab, 4) AS c_ab_r, round(c_ba, 4) AS c_ba_r,
          CAST(CASE WHEN greatest(c_ab, c_ba) >= 0.8 AND jaccard < 0.6
            THEN 1 ELSE 0 END AS INT) AS asym_quote
        FROM scored WHERE greatest(c_ab, c_ba) >= 0.5
        ORDER BY doc_a, doc_b"""),
      doc = "asymmetric containment scoring over MinHash band candidates on a planted quote corpus: both containment directions + Jaccard from one exact shingle intersection, asym_quote flags high-containment/low-Jaccard pairs — the quote/subset dedup direction Jaccard-gated pipelines miss"),

    // ---- containment-gated keep policy, PRICED (q202): q201's
    //      threshold sweep re-run in the containment direction. The
    //      policy a quote-aware dedup ships: at gate t, a pair fires
    //      when max(c_ab, c_ba) ≥ t, and the CONTAINED side is removed
    //      (c_ab = |A∩B|/|A| ≥ t means A is mostly inside B → drop A;
    //      both directions over t — near-identical twins — drop the
    //      larger doc_id, keeping the min-id rep like q85). Swept over
    //      0.5–0.9 from the ONE scored frame shared with q197
    //      (candidates computed once; the sweep is a 5× explode of the
    //      candidate-scale frame, never a corpus rescan); prices
    //      pairs flagged, docs removed, tokens removed, and the
    //      corpus-token fraction — the read-off that shows the
    //      containment gate reclaiming the quotes a Jaccard gate
    //      (q201) leaves in the corpus.
    QueryDef(
      "q202_containment_policy_curve",
      (s, d) => {
        val scored = containmentScored(s, d).localCheckpoint()
        val nts = quoteCorpus(s, d)
          .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long").as("nt"))
        val tot = nts.agg(sum(col("nt")).as("tt"))
        val hits = scored.withColumn("thr",
            explode(array(lit(0.5), lit(0.6), lit(0.7), lit(0.8), lit(0.9))))
          .filter(greatest(col("c_ab"), col("c_ba")) >= col("thr"))
        val victims = hits.select(col("thr"),
          when(col("c_ab") >= col("thr") && col("c_ba") >= col("thr"),
            greatest(col("doc_a"), col("doc_b")))
            .when(col("c_ab") >= col("thr"), col("doc_a"))
            .otherwise(col("doc_b")).as("doc_id")).distinct()
        val pairs = hits.groupBy("thr").agg(count(lit(1)).as("n_pairs"))
        val rem = victims.join(nts, Seq("doc_id"))
          .groupBy("thr")
          .agg(count(lit(1)).as("n_removed"), sum(col("nt")).as("tokens_removed"))
        pairs.join(rem, Seq("thr"))
          .crossJoin(broadcast(tot))
          .select(col("thr"), col("n_pairs"), col("n_removed"),
            col("tokens_removed"),
            round(col("tokens_removed").cast("double") / col("tt"), 4)
              .as("frac_removed_r"))
          .orderBy("thr")
      },
      Some(s"""$oracleQuoteScoredCtes,
        nts AS (SELECT doc_id,
            CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS nt FROM corpus),
        tot AS (SELECT CAST(sum(nt) AS BIGINT) AS tt FROM nts),
        thrs AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]::DOUBLE[]) AS thr),
        hits AS (SELECT thr, doc_a, doc_b, c_ab, c_ba
          FROM scored CROSS JOIN thrs WHERE greatest(c_ab, c_ba) >= thr),
        victims AS (SELECT DISTINCT thr,
            CASE WHEN c_ab >= thr AND c_ba >= thr THEN greatest(doc_a, doc_b)
                 WHEN c_ab >= thr THEN doc_a ELSE doc_b END AS doc_id
          FROM hits),
        p AS (SELECT thr, CAST(count(*) AS BIGINT) AS n_pairs FROM hits GROUP BY thr),
        rs AS (SELECT thr, CAST(count(*) AS BIGINT) AS n_removed,
            CAST(sum(nt) AS BIGINT) AS tokens_removed
          FROM victims JOIN nts ON victims.doc_id = nts.doc_id GROUP BY thr)
        SELECT p.thr AS thr, n_pairs, n_removed, tokens_removed,
          round(CAST(tokens_removed AS DOUBLE) / tt, 4) AS frac_removed_r
        FROM p JOIN rs ON p.thr = rs.thr CROSS JOIN tot ORDER BY thr"""),
      doc = "containment-threshold policy sweep over the shared q197 scored frame: per gate 0.5-0.9, pairs flagged, contained-side removals (min-id rep kept on two-way hits), tokens removed and corpus fraction — prices the quote-aware keep policy the Jaccard sweep (q201) cannot see"),

    // ---- vocabulary overlap matrix (q198): |V_a ∩ V_b| Jaccard and
    //      containment over per-source DISTINCT vocabularies — the
    //      lexical companion to q158's doc-level provenance matrix
    //      ("do these feeds even speak the same words?" — a mirror
    //      source shows high vocab containment before any doc-level
    //      dedup runs). Shape: one (source, term) distinct frame,
    //      term-keyed self-join (per-term fan-out bounded by sources²,
    //      NEVER docs²), sources²-sized pair agg, vocabulary sizes
    //      broadcast back — nothing rescans text after the first
    //      distinct.
    QueryDef(
      "q198_vocab_overlap_matrix",
      (s, d) => {
        val vt = Tables.documents(s, d)
          .select(col("source"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
          .filter(col("t") =!= "")
          .distinct()
        val vsize = vt.groupBy("source").agg(count(lit(1)).as("v"))
        vt.select(col("source").as("src_a"), col("t"))
          .join(vt.select(col("source").as("src_b"), col("t")), Seq("t"))
          .filter(col("src_a") < col("src_b"))
          .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
          .join(broadcast(vsize.select(col("source").as("src_a"), col("v").as("va"))),
            Seq("src_a"))
          .join(broadcast(vsize.select(col("source").as("src_b"), col("v").as("vb"))),
            Seq("src_b"))
          .select(col("src_a"), col("src_b"), col("inter"), col("va"), col("vb"),
            round(col("inter").cast("double") /
              (col("va") + col("vb") - col("inter")), 4).as("jaccard_r"),
            round(col("inter").cast("double") / least(col("va"), col("vb")), 4)
              .as("containment_r"))
          .orderBy("src_a", "src_b")
      },
      Some("""WITH vt AS (SELECT DISTINCT source, t
          FROM (SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
            FROM documents) u WHERE t <> ''),
        vs AS (SELECT source, CAST(count(*) AS BIGINT) AS v FROM vt GROUP BY source),
        pr AS (SELECT a.source AS src_a, b.source AS src_b,
            CAST(count(*) AS BIGINT) AS inter
          FROM vt a JOIN vt b ON a.t = b.t AND a.source < b.source
          GROUP BY a.source, b.source)
        SELECT src_a, src_b, inter, va.v AS va, vb.v AS vb,
          round(CAST(inter AS DOUBLE) / (va.v + vb.v - inter), 4) AS jaccard_r,
          round(CAST(inter AS DOUBLE) / least(va.v, vb.v), 4) AS containment_r
        FROM pr JOIN vs va ON pr.src_a = va.source
                JOIN vs vb ON pr.src_b = vb.source
        ORDER BY src_a, src_b"""),
      doc = "per-source-pair vocabulary Jaccard + containment via one term-keyed distinct self-join (fan-out bounded by sources^2 per term) — the lexical mirror-detection companion to the doc-level provenance matrix"),

    // ---- unigram-distribution drift (q199): per-source Hellinger
    //      distance to the corpus unigram distribution over the fixed
    //      top-V vocabulary head — q168's PSI watches the LENGTH
    //      shape, this watches the LEXICAL shape (topic/template
    //      drift that leaves lengths untouched). Top-V via
    //      TakeOrderedAndProject (parallel partial top-k — the q93
    //      rule, no single-partition vocabulary sort); the
    //      sources×V lattice is fixed-size at any corpus scale;
    //      +0.5 add-smoothing defines empty cells; and the
    //      Bhattacharyya fold is a FIXED-POINT BIGINT sum
    //      (floor(sqrt(p·q)·1e9) — sqrt/division are IEEE-identical
    //      in both engines, the sum order-free), per the round-14
    //      statistics rule. H = sqrt(1 − BC).
    QueryDef(
      "q199_unigram_hellinger",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
          .filter(col("t") =!= "")
        val vocab = tok.groupBy("t").agg(count(lit(1)).as("gc"))
          .orderBy(col("gc").desc, col("t").asc).limit(DriftVocab)
        val sc = tok.join(broadcast(vocab.select("t")), Seq("t"))
          .groupBy("source", "t").agg(count(lit(1)).as("c"))
        val stot = sc.groupBy("source")
          .agg(sum(col("c")).as("cs"), count(lit(1)).as("present"))
        val gtot = vocab.agg(sum(col("gc")).as("g"))
        stot.crossJoin(broadcast(vocab))
          .join(sc, Seq("source", "t"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .crossJoin(broadcast(gtot))
          .withColumn("p",
            (col("c") + lit(0.5)) / (col("cs") + lit(DriftVocab / 2.0)))
          .withColumn("q",
            (col("gc") + lit(0.5)) / (col("g") + lit(DriftVocab / 2.0)))
          .withColumn("bq", expr("CAST(floor(sqrt(p * q) * 1e9) AS BIGINT)"))
          .groupBy("source")
          .agg(max(col("present")).as("n_vocab_present"), sum(col("bq")).as("bcq"))
          .withColumn("bc", col("bcq").cast("double") / lit(1e9))
          .select(col("source"), col("n_vocab_present"),
            round(col("bc"), 4).as("bc_r"),
            round(sqrt(greatest(lit(1.0) - col("bc"), lit(0.0))), 4)
              .as("hellinger_r"))
          .orderBy("source")
      },
      Some(s"""WITH tok AS (SELECT source, t
          FROM (SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
            FROM documents) u WHERE t <> ''),
        vocab AS (SELECT t, CAST(count(*) AS BIGINT) AS gc FROM tok
          GROUP BY t ORDER BY gc DESC, t LIMIT $DriftVocab),
        sc AS (SELECT source, tok.t AS t, CAST(count(*) AS BIGINT) AS c
          FROM tok JOIN vocab ON tok.t = vocab.t GROUP BY source, tok.t),
        st AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs,
            CAST(count(*) AS BIGINT) AS present FROM sc GROUP BY source),
        gt AS (SELECT CAST(sum(gc) AS BIGINT) AS g FROM vocab),
        lattice AS (SELECT st.source AS source, vocab.t AS t, vocab.gc AS gc,
            st.cs AS cs, st.present AS present, coalesce(sc.c, 0) AS c, gt.g AS g
          FROM st CROSS JOIN vocab CROSS JOIN gt
          LEFT JOIN sc ON sc.source = st.source AND sc.t = vocab.t),
        folded AS (SELECT source, max(present) AS n_vocab_present,
            CAST(sum(CAST(floor(sqrt(
              ((c + 0.5) / (cs + ${DriftVocab / 2.0})) *
              ((gc + 0.5) / (g + ${DriftVocab / 2.0}))) * 1e9) AS BIGINT)) AS BIGINT)
              AS bcq
          FROM lattice GROUP BY source)
        SELECT source, n_vocab_present,
          round(CAST(bcq AS DOUBLE) / 1e9, 4) AS bc_r,
          round(sqrt(greatest(1.0 - CAST(bcq AS DOUBLE) / 1e9, 0.0)), 4)
            AS hellinger_r
        FROM folded ORDER BY source"""),
      doc = "per-source Hellinger distance to the corpus unigram distribution over the fixed top-V head: parallel top-k vocabulary, fixed sources x V smoothed lattice, fixed-point BIGINT Bhattacharyya fold — the lexical drift alarm beside q168's length PSI"),

    // ---- per-source Heaps fit (q200): vocabulary-growth exponent β
    //      PER SOURCE — q182's corpus curve keyed by feed, the
    //      template-source detector (a boilerplate feed's vocabulary
    //      saturates: β well under the 0.4–0.6 natural-text band; a
    //      spam feed of random tokens runs β → 1). Same one-pass
    //      trick as q182: a term enters source s's vocabulary at its
    //      FIRST doc within s (min doc_id per (source, term)), so
    //      cumulative V at each of the 20 global doc_id checkpoints
    //      is a bucket-cumsum — no per-checkpoint rescan. The
    //      regression input is sources×20 (fixed at any corpus), and
    //      all Σs are fixed-point BIGINT folds (the round-14 rule).
    QueryDef(
      "q200_source_heaps",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val nd = docs.agg(count(lit(1)).as("n_docs"))
        val toks = docs.select(col("source"), col("doc_id"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
          .filter(col("term") =!= "")
        val vb = toks.groupBy("source", "term").agg(min(col("doc_id")).as("fd"))
          .crossJoin(broadcast(nd))
          // greatest(1, …) guards corpora under 20 docs: Spark's
          // div-by-zero yields NULL (silently empty) while DuckDB's //
          // raises — the guard keeps both engines on one finite bucket
          .select(col("source"), expr("fd div greatest(1, n_docs div 20)").as("b"))
          .filter(col("b") < 20)
          .groupBy("source", "b").agg(count(lit(1)).as("dv"))
        val nb = toks.crossJoin(broadcast(nd))
          .select(col("source"), expr("doc_id div greatest(1, n_docs div 20)").as("b"))
          .filter(col("b") < 20)
          .groupBy("source", "b").agg(count(lit(1)).as("dn"))
        val wB = Window.partitionBy("source").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, 0)
        val xy = nb.join(vb, Seq("source", "b"), "left")
          .withColumn("v", sum(coalesce(col("dv"), lit(0L))).over(wB))
          .withColumn("n", sum(col("dn")).over(wB))
          .filter(col("v") > 0)
          .select(col("source"), log(col("n").cast("double")).as("x"),
            log(col("v").cast("double")).as("y"))
        def fold(e: String) = sum(expr(s"CAST(floor(($e) * 1e9) AS BIGINT)"))
          .cast("double") / lit(1e9)
        xy.groupBy("source")
          .agg(count(lit(1)).as("k"),
            fold("x").as("sx"), fold("y").as("sy"),
            fold("x * y").as("sxy"), fold("x * x").as("sxx"))
          .withColumn("beta",
            (col("k") * col("sxy") - col("sx") * col("sy")) /
              (col("k") * col("sxx") - col("sx") * col("sx")))
          .select(col("source"), col("k").as("n_points"),
            QueryDef.roundZ(col("beta"), 4).as("beta_r"),
            QueryDef.roundZ((col("sy") - col("beta") * col("sx")) / col("k"), 4)
              .as("lnk_r"))
          .orderBy("source")
      },
      Some("""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        tk AS (SELECT source, doc_id, t
          FROM (SELECT source, doc_id,
              unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
            FROM documents) u WHERE t <> ''),
        ft AS (SELECT source, t, min(doc_id) AS fd FROM tk GROUP BY source, t),
        vb AS (SELECT source, CAST(fd // greatest(1, n_docs // 20) AS BIGINT) AS b,
            CAST(count(*) AS BIGINT) AS dv
          FROM ft CROSS JOIN nd WHERE fd // greatest(1, n_docs // 20) < 20 GROUP BY 1, 2),
        nb AS (SELECT source, CAST(doc_id // greatest(1, n_docs // 20) AS BIGINT) AS b,
            CAST(count(*) AS BIGINT) AS dn
          FROM tk CROSS JOIN nd WHERE doc_id // greatest(1, n_docs // 20) < 20 GROUP BY 1, 2),
        cumxy AS (SELECT nb.source AS source, nb.b AS b,
            sum(dn) OVER w AS n, sum(coalesce(dv, 0)) OVER w AS v
          FROM nb LEFT JOIN vb ON nb.source = vb.source AND nb.b = vb.b
          WINDOW w AS (PARTITION BY nb.source ORDER BY nb.b
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        xy AS (SELECT source, ln(CAST(n AS DOUBLE)) AS x, ln(CAST(v AS DOUBLE)) AS y
          FROM cumxy WHERE v > 0),
        sums AS (SELECT source, CAST(count(*) AS BIGINT) AS k,
            CAST(sum(CAST(floor((x) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sx,
            CAST(sum(CAST(floor((y) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sy,
            CAST(sum(CAST(floor((x * y) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sxy,
            CAST(sum(CAST(floor((x * x) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sxx
          FROM xy GROUP BY source),
        fit AS (SELECT source, k, sx, sy,
            (k * sxy - sx * sy) / (k * sxx - sx * sx) AS beta FROM sums)
        SELECT source, k AS n_points,
          round(beta, 4) + 0.0 AS beta_r,
          round((sy - beta * sx) / k, 4) + 0.0 AS lnk_r
        FROM fit ORDER BY source"""),
      doc = "per-source Heaps-law vocabulary-growth fit over 20 first-occurrence bucket checkpoints (one pass, no rescans): beta under the natural-text band flags template feeds — fixed sources x 20 regression input, fixed-point BIGINT folds"),

    // ---- dedup threshold curve (q201): what each Jaccard gate would
    //      COST — pairs flagged, docs removed under the q85 greedy
    //      keep-smallest rule, and tokens saved — swept over
    //      thresholds 0.5–0.9 from ONE verified-pair frame (the
    //      shared q37 chain; candidates are computed once, the sweep
    //      is a 5× explode of the candidate-scale frame, never a
    //      corpus rescan). The tuning artifact that turns "pick a
    //      threshold" from folklore into a read-off.
    QueryDef(
      "q201_dedup_threshold_curve",
      (s, d) => {
        val v = DedupQueries.lshVerified(s, d).localCheckpoint()
        val nts = DedupQueries.variantCorpus(s, d)
          .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long").as("nt"))
        val tot = nts.agg(sum(col("nt")).as("tt"))
        val hits = v.withColumn("thr",
            explode(array(lit(0.5), lit(0.6), lit(0.7), lit(0.8), lit(0.9))))
          .filter(col("jaccard") >= col("thr"))
        val pairs = hits.groupBy("thr").agg(count(lit(1)).as("n_pairs"))
        val rem = hits.select(col("thr"), col("doc_b")).distinct()
          .join(nts, col("doc_b") === nts("doc_id"))
          .groupBy("thr")
          .agg(count(lit(1)).as("n_removed"), sum(col("nt")).as("tokens_removed"))
        pairs.join(rem, Seq("thr"))
          .crossJoin(broadcast(tot))
          .select(col("thr"), col("n_pairs"), col("n_removed"),
            col("tokens_removed"),
            round(col("tokens_removed").cast("double") / col("tt"), 4)
              .as("frac_removed_r"))
          .orderBy("thr")
      },
      Some {
        s"""${DedupQueries.oracleBandsCteFor(DedupQueries.oracleVariantCorpusSelect)},
        ${DedupQueries.oracleSetsCteShared},
        ${DedupQueries.oracleLshVerCte},
        nts AS (SELECT doc_id,
            CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS nt FROM corpus),
        tot AS (SELECT CAST(sum(nt) AS BIGINT) AS tt FROM nts),
        thrs AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]::DOUBLE[]) AS thr),
        hits AS (SELECT thr, doc_a, doc_b, jaccard
          FROM lshver CROSS JOIN thrs WHERE jaccard >= thr),
        p AS (SELECT thr, CAST(count(*) AS BIGINT) AS n_pairs FROM hits GROUP BY thr),
        rem AS (SELECT DISTINCT thr, doc_b FROM hits),
        rs AS (SELECT thr, CAST(count(*) AS BIGINT) AS n_removed,
            CAST(sum(nt) AS BIGINT) AS tokens_removed
          FROM rem JOIN nts ON rem.doc_b = nts.doc_id GROUP BY thr)
        SELECT p.thr AS thr, n_pairs, n_removed, tokens_removed,
          round(CAST(tokens_removed AS DOUBLE) / tt, 4) AS frac_removed_r
        FROM p JOIN rs ON p.thr = rs.thr CROSS JOIN tot ORDER BY thr"""
      },
      doc = "Jaccard-threshold sweep over the shared verified-pair frame: pairs flagged, greedy keep-smallest removals, and tokens saved per gate (0.5-0.9) — candidates computed once, the sweep is candidate-scale, never a corpus rescan")
  )
}
