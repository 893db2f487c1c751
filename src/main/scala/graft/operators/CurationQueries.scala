package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators over `documents` / `embeddings`
  * (north-star LLM-pipeline surface): benchmark decontamination,
  * repetition-based quality scoring, per-source canonical selection,
  * k-means clustering (assignment + one Lloyd update), the end-to-end
  * curation funnel, token-budget sequence packing, and vocabulary
  * coverage.
  *
  * Scale shapes, per query:
  *  - q87: the benchmark shingle set is tiny by definition (eval sets
  *    are KBs against a 100 TB corpus) → broadcast semi-side; the
  *    corpus side is one explode + one hash agg. Never quadratic.
  *  - q88: pure per-row map over codegen'd array exprs — zero shuffle.
  *  - q89: one shuffle on (source, lang), top-1 via window (partial
  *    top-k would use q71's bounded-heap Aggregator at extreme skew).
  *  - q90: assignment is O(n·k) with k CONSTANT (a trained codebook —
  *    the q78 round-2 lesson: never let k grow with n); centroids are
  *    broadcast, the Lloyd update is one posexplode + hash agg keyed
  *    (cluster, dim) — k×dim cells regardless of corpus size.
  *  - q91: the whole funnel is ONE scan: per-row stage flags, a single
  *    window for the dedup keeper, one final agg → 5 rows. (Running
  *    each stage as its own count would re-scan the corpus per stage.)
  *  - q92: packing runs per-lang (window partitioned), so parallelism
  *    = #strata; a single global greedy pack is inherently sequential
  *    and is exactly what NOT to ship at 100 TB.
  *  - q93: cumulative coverage ranks the post-agg vocabulary (small by
  *    Heaps' law) — the single-partition window sees vocab rows, never
  *    corpus rows.
  */
object CurationQueries {

  /** Tokenized documents: lowercase, whitespace split. */
  private def tokenized(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("ts", split(lower(trim(col("text"))), "\\s+"))

  /** q96's scoring pipeline (everything before the quartile split) —
    * also the plan-audit surface: the ntile step checkpoints, so the
    * broadcast-join/partial-agg shape is only visible on this frame.
    * Per-doc log-prob totals are ORDERED double folds (sorted by term;
    * duplicate terms carry identical lp, so the fold is fully
    * determined): shuffle-order-independent and engine-portable — a
    * decimal-cast sum diverges between engines at exact rounding-grid
    * midpoints (the q90 lesson). */
  private[graft] def q96Scored(s: SparkSession, d: String): DataFrame = {
    // NOT fanned out (r22, reverting r21): `toks` feeds two consumers
    // (the term-frequency aggregate and the per-doc scoring join), so a
    // fan-out exchange here is paid TWICE per run — and the driver's
    // r21 sweep measured the fanned shape 0.79× SLOWER at 32 cores
    // (1.21 → 1.53 s): both consumers lead straight into partial
    // aggregations, so the single-split scan's explode work pipelines
    // into map-side aggs whose cost the extra round-robin exchanges
    // (each with their sort-before-repartition pass) exceed. At 100 TB
    // the input arrives in thousands of splits and needs no fan-out.
    val toks = tokenized(s, d)
      .select(col("doc_id"), explode(col("ts")).as("term"))
    // vocab-sized materialization: both the broadcast-back join and
    // the corpus-total scalar read the aggregated term table
    val tfreq = toks.groupBy("term").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val total = tfreq.agg(sum(col("n")).as("tot"))
    toks.join(broadcast(tfreq), Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("lp", log(col("n").cast("double") / col("tot").cast("double")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        expr("""aggregate(transform(array_sort(collect_list(struct(term, lp))),
             s -> s.lp), 0D, (a, x) -> a + x)""").as("ll"))
      .withColumn("avg_ll_r", round(col("ll") / col("n_tokens"), 4))
      .select("doc_id", "n_tokens", "avg_ll_r")
  }

  /** The curation funnel's shared flag ladder — fp → lang_ok →
    * qual_ok → keep_ok, each conjoining the previous. ONE definition
    * feeds both q91 (per-stage retention counts) and q100 (the
    * manifest of kept chunks), so the manifest can never drift from
    * the funnel it claims to summarize. */
  private def funnelFlags(tok: DataFrame): DataFrame =
    tok
      .withColumn("fp",
        md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))))
      .withColumn("lang_ok", col("lang").isin("en", "es", "fr", "de"))
      .withColumn("qual_ok", col("lang_ok") && size(col("ts")) >= 20 &&
        size(array_distinct(col("ts"))).cast("double") / size(col("ts")) >= 0.3)
      .withColumn("keep_ok", col("qual_ok") &&
        col("doc_id") === min(when(col("qual_ok"), col("doc_id")))
          .over(Window.partitionBy(col("fp"))))

  /** q100's content-addressed chunk manifest, unordered: funnel
    * survivors (lang→quality→exact-dedup) split to the 32-token budget,
    * each chunk hashed over its own token slice. Shared by q100 (plain
    * manifest) and q121 (the manifest joined to the leakage-safe
    * cluster-root split). One scan + one dedup window + one explode;
    * chunk hashing is per-row. */
  private[graft] def chunkManifest(s: SparkSession, d: String): DataFrame =
    funnelFlags(tokenized(s, d))
      .filter(col("keep_ok"))
      .select(col("doc_id"), col("lang"), col("ts"),
        size(col("ts")).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("lang"), col("ts"), col("n_tokens"),
        explode(expr("sequence(0, CAST(ceil(n_tokens / 32.0) AS INT) - 1)"))
          .as("chunk_idx"))
      .withColumn("chunk_tokens",
        least(lit(32L), col("n_tokens") - col("chunk_idx") * 32L))
      .withColumn("chunk_hash",
        md5(concat_ws(" ",
          expr("slice(ts, chunk_idx * 32 + 1, CAST(chunk_tokens AS INT))"))))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"),
        col("lang"), col("chunk_hash"))

  private val shingle3 =
    "transform(sequence(0, size(ts) - 3), i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))"

  /** The shingle at window start `i` — the same 3-gram [[shingle3]]
    * builds, for contexts that also need the start position (q117). */
  private val shingle3At = "concat_ws(' ', ts[i], ts[i+1], ts[i+2])"

  /** (doc_id, sh) distinct 3-gram shingles, exploded. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    tokenized(s, d)
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(shingle3))).as("sh"))

  private val oracleShinglesCte =
    """WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
        FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(ts) - 2),
          i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]))) AS sh
        FROM toks WHERE len(ts) >= 3)"""

  /** Fixed k-means codebook: literal ids (k constant, never a function
    * of corpus size — stands in for a trained coreset/codebook). All
    * ids < 500 so they exist at every test scale factor. */
  private val CentroidIds = Seq(3L, 47L, 111L, 205L, 289L, 333L, 404L, 450L)

  /** The positioned benchmark windows (doc_id, start, sh) feeding both
    * excision variants — ONE definition so q117 (broadcast) and q120
    * (bloom-pruned) can only differ in JOIN STRATEGY, never semantics. */
  private def excisionWindows(toks: DataFrame): DataFrame =
    toks.filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ts) - 3), i -> struct(i AS start, $shingle3At AS sh))"))
        .as("w"))
      .select(col("doc_id"), col("w.start").as("start"), col("w.sh").as("sh"))

  /** Per-row span excision from a (doc_id, marks) frame — the shared
    * tail of q117/q120: corpus text never shuffles, only marks do. */
  private def exciseByMarks(toks: DataFrame, marks: DataFrame): DataFrame =
    toks.filter(col("doc_id") % 50 =!= 0)
      .join(marks, Seq("doc_id"), "left")
      .withColumn("marks", coalesce(col("marks"), expr("array()")))
      .withColumn("kept", expr(
        "filter(sequence(0, size(ts) - 1), p -> NOT exists(marks, m -> p >= m AND p <= m + 2))"))
      .select(col("doc_id"), size(col("ts")).as("n_tokens"),
        (size(col("ts")) - size(col("kept"))).as("n_excised"),
        expr("concat_ws(' ', transform(kept, p -> ts[p]))").as("clean_text"))
      .orderBy("doc_id")

  /** One oracle for both excision variants (a sketch must be
    * semantically invisible — the q114/q107 contract). */
  private val excisionOracle: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
          FROM documents),
        shp AS (SELECT doc_id, u.i AS start, ts[u.i+1] || ' ' || ts[u.i+2] || ' ' || ts[u.i+3] AS sh
                FROM toks, unnest(range(0, greatest(len(ts) - 2, 0))) u(i) WHERE len(ts) >= 3),
        bench AS (SELECT DISTINCT sh FROM shp WHERE doc_id % 50 = 0),
        mk AS (SELECT s.doc_id, list(DISTINCT s.start) AS marks
               FROM shp s JOIN bench b USING (sh) WHERE s.doc_id % 50 <> 0 GROUP BY s.doc_id),
        base AS (SELECT t.doc_id, t.ts, len(t.ts) AS L, coalesce(mk.marks, []) AS marks
                 FROM toks t LEFT JOIN mk USING (doc_id) WHERE t.doc_id % 50 <> 0),
        o AS (SELECT doc_id, L AS n_tokens,
            list_filter(range(0, L), p -> len(list_filter(marks, m -> p >= m AND p <= m + 2)) = 0) AS kept,
            ts FROM base)
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
          CAST(n_tokens - len(kept) AS INT) AS n_excised,
          -- a FULLY-excised doc: array_to_string([]) is NULL in DuckDB
          -- but Spark's concat_ws over an empty array is '' — pin ''
          coalesce(array_to_string(list_transform(kept, p -> ts[p+1]), ' '), '') AS clean_text
        FROM o ORDER BY doc_id"""

  val defs: Seq[QueryDef] = Seq(

    // ---- benchmark decontamination: flag training docs sharing any
    //      3-gram shingle with the (deterministic) benchmark subset.
    //      The real-world shape: eval-set n-grams are broadcast against
    //      the corpus shingle stream; overlap counts drive drop/keep.
    QueryDef(
      "q87_decontamination",
      (s, d) => {
        // one tokenize→shingle pass: the exploded shingle stream feeds
        // THREE branches (benchmark set, per-doc totals, overlap join);
        // unmaterialized, each branch re-runs the corpus pipeline. In
        // production the shingle stream lands in storage once;
        // localCheckpoint is the in-process equivalent (released by
        // SparkEntry.releaseCaches per the contract).
        val sh = shingles(s, d).localCheckpoint()
        val bench = sh.filter(col("doc_id") % 50 === 0).select("sh").distinct()
        val corpus = sh.filter(col("doc_id") % 50 =!= 0)
        val totals = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
        val overlaps = corpus.join(broadcast(bench), Seq("sh"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
        totals.join(overlaps, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_overlap"))
          .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
            (col("n_overlap") > 0).cast("int").as("contaminated"))
          .orderBy("doc_id")
      },
      Some(s"""$oracleShinglesCte,
        bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
        corpus AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
        tot AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
        ov AS (SELECT doc_id, count(*) AS n_overlap FROM corpus JOIN bench USING (sh)
               GROUP BY doc_id)
        SELECT tot.doc_id, tot.n_shingles, coalesce(ov.n_overlap, 0) AS n_overlap,
          CAST(coalesce(ov.n_overlap, 0) > 0 AS INT) AS contaminated
        FROM tot LEFT JOIN ov ON tot.doc_id = ov.doc_id
        ORDER BY tot.doc_id""")),

    // ---- the decontamination REPORT: the per-BENCHMARK-item leakage
    //      summary an eval-integrity review actually reads (q87 flags
    //      corpus docs; this answers "which benchmark items leaked,
    //      how far"): per benchmark doc, its shingle count, how many
    //      of its shingles appear anywhere in the corpus, how many
    //      distinct corpus docs it touches, and total hit occurrences.
    //      Completes the decontam family: flag (q87/q114) → excise
    //      (q117/q120) → report (q124).
    //      Scale: same broadcast-overlap join as q87 (benchmark side
    //      small); once the held-out suite is corpus-sized the q120
    //      bloom-prune path substitutes, same aggregation. Group-by is
    //      benchmark-sized — trivially small output.
    QueryDef(
      "q124_contamination_report",
      (s, d) => {
        val sh = shingles(s, d).localCheckpoint()
        val bench = sh.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("bench_id"), col("sh"))
        val corpus = sh.filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id").as("corpus_id"), col("sh"))
        val totals = bench.groupBy("bench_id")
          .agg(count(lit(1)).as("n_bench_shingles"))
        val hits = corpus.join(broadcast(bench), Seq("sh"))
          .groupBy("bench_id")
          .agg(countDistinct(col("sh")).as("n_leaked_shingles"),
            countDistinct(col("corpus_id")).as("n_corpus_docs"),
            count(lit(1)).as("n_hits"))
        totals.join(hits, Seq("bench_id"), "left")
          .na.fill(0L, Seq("n_leaked_shingles", "n_corpus_docs", "n_hits"))
          .orderBy("bench_id")
      },
      Some(s"""$oracleShinglesCte,
        bench AS (SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id % 50 = 0),
        corpus AS (SELECT doc_id AS corpus_id, sh FROM sh WHERE doc_id % 50 <> 0),
        tot AS (SELECT bench_id, count(*) AS n_bench_shingles FROM bench GROUP BY bench_id),
        ov AS (SELECT bench_id, CAST(count(DISTINCT sh) AS BIGINT) AS n_leaked_shingles,
            CAST(count(DISTINCT corpus_id) AS BIGINT) AS n_corpus_docs,
            count(*) AS n_hits
          FROM corpus JOIN bench USING (sh) GROUP BY bench_id)
        SELECT tot.bench_id, tot.n_bench_shingles,
          coalesce(ov.n_leaked_shingles, 0) AS n_leaked_shingles,
          coalesce(ov.n_corpus_docs, 0) AS n_corpus_docs,
          coalesce(ov.n_hits, 0) AS n_hits
        FROM tot LEFT JOIN ov ON tot.bench_id = ov.bench_id
        ORDER BY tot.bench_id"""),
      doc = "decontamination report: per-benchmark-item leakage summary — leaked shingles, touched corpus docs, hit totals"),

    // ---- decontamination, the HUGE-BENCHMARK path: q87 broadcasts the
    //      benchmark's distinct n-gram set as a hash relation — right
    //      while that set is driver-broadcastable, wrong once the held-
    //      out suite is itself corpus-sized (decontaminating against
    //      every eval set + their paraphrases runs to billions of
    //      n-grams). Here the benchmark keys travel as a ~MB bloom
    //      sketch instead: the corpus shingle stream is pruned at the
    //      scan by a codegen'd bloom probe (no shuffle, no broadcast
    //      hash relation), and only the surviving ~overlap-sized
    //      trickle pays the exact verify join — a sort-merge keyed on
    //      the shingle, BOTH sides post-prune tiny. False positives
    //      pass the sketch at ~fpp and die in the exact join, so the
    //      result is identical to q87's broadcast plan and the oracle
    //      is the PLAIN exact join (the sketch must be semantically
    //      invisible — same contract BloomJoinSpec pins for q107).
    QueryDef(
      "q114_decontam_bloom",
      (s, d) => {
        import graft.functions.BloomJoin
        val sh = shingles(s, d).localCheckpoint()
        val bench = sh.filter(col("doc_id") % 50 === 0).select("sh").distinct()
          .localCheckpoint()
        val corpus = sh.filter(col("doc_id") % 50 =!= 0)
        val totals = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
        val overlaps = BloomJoin
          .bloomPrune(corpus, col("sh"), bench, "sh", expectedItems = bench.count())
          .join(bench.hint("merge"), Seq("sh")) // exact verify, NO broadcast
          .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
        totals.join(overlaps, Seq("doc_id"), "left")
          .na.fill(0L, Seq("n_overlap"))
          .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
            (col("n_overlap") > 0).cast("int").as("contaminated"))
          .orderBy("doc_id")
      },
      Some(s"""$oracleShinglesCte,
        bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
        corpus AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
        tot AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
        ov AS (SELECT doc_id, count(*) AS n_overlap FROM corpus JOIN bench USING (sh)
               GROUP BY doc_id)
        SELECT tot.doc_id, tot.n_shingles, coalesce(ov.n_overlap, 0) AS n_overlap,
          CAST(coalesce(ov.n_overlap, 0) > 0 AS INT) AS contaminated
        FROM tot LEFT JOIN ov ON tot.doc_id = ov.doc_id
        ORDER BY tot.doc_id"""),
      doc = "decontamination via bloom sketch: benchmark n-gram keys as a ~MB " +
        "sketch prune the corpus pre-shuffle; exact merge join verifies — " +
        "the non-broadcastable-benchmark scale path of q87"),

    // ---- SURGICAL decontamination: q87 flags whole documents; real
    //      pipelines usually EXCISE the contaminated spans and keep the
    //      rest (dropping a 50k-token doc over one leaked test question
    //      wastes data; GPT-3-style pipelines cut the overlapping
    //      window ± context). A token is excised when ANY overlapping
    //      benchmark 3-gram window covers it. Scale shape: the window
    //      join is q87's broadcast overlap join, but carrying the
    //      window START position; the per-doc mark list comes back as
    //      one collect_set (marks are BOUNDED by the doc's own window
    //      count, and only contaminated docs produce any), and the
    //      excision itself is a per-row array rewrite inside codegen —
    //      the corpus text never shuffles, only (doc_id, marks) does.
    QueryDef(
      "q117_decontam_excise",
      (s, d) => {
        val toks = tokenized(s, d).localCheckpoint()
        val windows = excisionWindows(toks)
        val bench = windows.filter(col("doc_id") % 50 === 0).select("sh").distinct()
        val marks = windows.filter(col("doc_id") % 50 =!= 0)
          .join(broadcast(bench), Seq("sh"))
          .groupBy("doc_id").agg(collect_set(col("start")).as("marks"))
        exciseByMarks(toks, marks)
      },
      Some(excisionOracle),
      doc = "surgical decontamination: excise every token covered by a benchmark " +
        "3-gram window, keep the rest of the document"),

    // ---- surgical decontamination, the HUGE-BENCHMARK path: q117
    //      broadcasts the benchmark window set — the same
    //      non-broadcastable-benchmark scale gap q114 closed for q87,
    //      now for the EXCISION flow. The benchmark 3-gram keys travel
    //      as a ~MB bloom sketch that prunes the corpus window stream
    //      at the scan (the `start` position rides the surviving rows);
    //      the exact verify is a sort-merge join on the shingle, both
    //      sides post-prune tiny, and the per-doc marks join back to
    //      the corpus with a merge join too — NO broadcast hash
    //      relation anywhere in the plan (PlanAuditSpec pins this).
    //      False positives pass the sketch at ~fpp and die in the exact
    //      join, so the output is identical to q117's and the oracle is
    //      the SAME plain exact-join SQL.
    QueryDef(
      "q120_decontam_excise_bloom",
      (s, d) => {
        import graft.functions.BloomJoin
        val toks = tokenized(s, d).localCheckpoint()
        val windows = excisionWindows(toks)
        val bench = windows.filter(col("doc_id") % 50 === 0).select("sh").distinct()
          .localCheckpoint()
        val corpusW = windows.filter(col("doc_id") % 50 =!= 0)
        val marks = BloomJoin
          .bloomPrune(corpusW, col("sh"), bench, "sh", expectedItems = bench.count())
          .join(bench.hint("merge"), Seq("sh")) // exact verify, NO broadcast
          .groupBy("doc_id").agg(collect_set(col("start")).as("marks"))
        exciseByMarks(toks, marks.hint("merge"))
      },
      Some(excisionOracle),
      doc = "surgical decontamination via bloom sketch: benchmark window keys " +
        "prune the corpus stream pre-shuffle; exact merge-join verify carries " +
        "the span starts — the non-broadcastable-benchmark path of q117"),

    // ---- repetition quality (Gopher-style): duplicate-n-gram
    //      fractions per document, computed entirely per-row (array
    //      exprs inside whole-stage codegen — no shuffle, no UDF).
    QueryDef(
      "q88_repetition_quality",
      (s, d) => tokenized(s, d)
        .filter(size(col("ts")) >= 3)
        .withColumn("bg",
          expr("transform(sequence(0, size(ts) - 2), i -> concat_ws(' ', ts[i], ts[i+1]))"))
        .withColumn("tg", expr(shingle3))
        .select(col("doc_id"),
          size(col("bg")).as("n_bigrams"),
          (lit(1.0) - size(array_distinct(col("bg"))).cast("double") / size(col("bg")))
            .as("dup_bigram_frac"),
          (lit(1.0) - size(array_distinct(col("tg"))).cast("double") / size(col("tg")))
            .as("dup_trigram_frac"))
        .withColumn("repetitive",
          (col("dup_bigram_frac") >= 0.05).cast("int"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
          CAST(len(bg) AS INT) AS n_bigrams,
          1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) AS dup_bigram_frac,
          1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg) AS dup_trigram_frac,
          CAST((1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)) >= 0.05 AS INT)
            AS repetitive
        FROM (SELECT doc_id,
            list_transform(range(len(ts) - 1), i -> ts[i+1] || ' ' || ts[i+2]) AS bg,
            list_transform(range(len(ts) - 2), i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]) AS tg
          FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ts
                FROM documents) t
          WHERE len(ts) >= 3) g
        ORDER BY doc_id""")),

    // ---- per-source canonical selection (URL/domain-level dedup
    //      policy): within each (source, lang) stratum keep the longest
    //      document, ties to the smallest id.
    QueryDef(
      "q89_source_canonical",
      (s, d) => {
        val w = Window.partitionBy(col("source"), col("lang"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)
        Tables.documents(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("source"), col("lang"), col("doc_id").as("keeper"),
            col("n_chars"))
          .orderBy("source", "lang")
      },
      Some("""SELECT source, lang, doc_id AS keeper, n_chars FROM (
          SELECT *, row_number() OVER (PARTITION BY source, lang
            ORDER BY n_chars DESC, doc_id) AS rn FROM documents) t
        WHERE rn = 1 ORDER BY source, lang""")),

    // ---- k-means over embeddings: assignment to a fixed literal
    //      codebook (broadcast, O(n·k)) + one Lloyd centroid update
    //      (posexplode → (cluster, dim)-keyed agg; k×dim output cells
    //      regardless of corpus size). Component means go through
    //      ordered member-id folds (shuffle-order-independent AND
    //      engine-portable), then one deterministic division.
    QueryDef(
      "q90_kmeans_lloyd",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        val cents = e.filter(col("vec_id").isin(CentroidIds: _*))
          .select(col("vec_id").as("cid"), col("emb").as("ce"))
        // per-vector argmin PER ROW: one native SqDistTop2 loop against
        // the broadcast flattened centroid matrix — same (sqdist asc,
        // cid asc) head as the window / min(struct) forms with zero
        // exchanges and no k-way emb fan-out (see KMeans.lloydRound, r22)
        val assigned = e.crossJoin(broadcast(KMeans.centroidArr(cents)))
          .withColumn("m", graft.functions.VectorFunctions.sqdist_top2(
            col("emb"), col("centflat")))
          .select(col("vec_id"),
            element_at(col("cids"), col("m.i1") + 1).as("cid"), col("emb"))
        // component means via an ORDERED double fold (collect → sort by
        // member id → left-fold): shuffle-order-independent AND
        // engine-portable. A decimal-cast sum is also order-independent
        // but double→decimal rounding diverges between engines at exact
        // grid midpoints (measured: one cell in 128k off by 1e-9 at
        // sf0.1 — HALF_UP vs round-half-even). Per-group state is the
        // cluster's member list per dim; the production trade at
        // extreme cluster sizes is a fixed-precision integer sum.
        assigned
          .select(col("cid"), col("vec_id"), posexplode(col("emb")).as(Seq("dim", "v")))
          .groupBy("cid", "dim")
          .agg(count(lit(1)).as("n_members"),
            expr("""aggregate(transform(array_sort(collect_list(struct(vec_id, v))),
                 s -> s.v), 0D, (a, x) -> a + x)""").as("vsum"))
          .select(col("cid"), col("dim"), col("n_members"),
            (col("vsum") / col("n_members")).as("c_new"))
          .orderBy("cid", "dim")
      },
      Some(s"""WITH e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        c AS (SELECT vec_id AS cid, emb AS ce FROM e
              WHERE vec_id IN (${CentroidIds.mkString(", ")})),
        dist AS (SELECT e.vec_id, c.cid, e.emb,
            list_sum(list_transform(range(len(e.emb)),
              i -> (e.emb[i+1] - c.ce[i+1]) * (e.emb[i+1] - c.ce[i+1]))) AS sqdist
          FROM e CROSS JOIN c),
        a AS (SELECT vec_id, cid, emb FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY sqdist, cid) AS rn FROM dist) t
          WHERE rn = 1),
        x AS (SELECT cid, vec_id, unnest(list_transform(range(len(emb)),
            i -> {'dim': i, 'v': emb[i+1]})) AS u FROM a)
        SELECT cid, CAST(u.dim AS INT) AS dim, count(*) AS n_members,
          list_sum(list(u.v ORDER BY vec_id)) / count(*) AS c_new
        FROM x GROUP BY cid, u.dim
        ORDER BY cid, dim""")),

    // ---- the curation funnel, single-pass: per-row stage flags
    //      (language → quality), one window for the exact-dedup keeper,
    //      a hash-bucket sample — then ONE aggregation emits the whole
    //      per-stage retention ladder. Monotone by construction (each
    //      flag conjoins the previous).
    QueryDef(
      "q91_curation_funnel",
      (s, d) => {
        val flagged = funnelFlags(tokenized(s, d))
          .withColumn("samp_ok", col("keep_ok") &&
            substring(md5(col("doc_id").cast("string")), 1, 1)
              .isin("0", "1", "2", "3"))
        def cnt(c: Column): Column = sum(c.cast("long"))
        flagged
          .agg(count(lit(1)).as("s0"), cnt(col("lang_ok")).as("s1"),
            cnt(col("qual_ok")).as("s2"), cnt(col("keep_ok")).as("s3"),
            cnt(col("samp_ok")).as("s4"))
          .select(expr("""stack(5,
              0, 'total',       s0,
              1, 'lang_filter', s1,
              2, 'quality',     s2,
              3, 'exact_dedup', s3,
              4, 'sampled',     s4) AS (stage, stage_name, n_docs)"""))
          .orderBy("stage")
      },
      Some("""WITH base AS (SELECT doc_id, lang,
            string_split_regex(lower(trim(text)), '\s+') AS ts,
            md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
          FROM documents),
        f AS (SELECT doc_id, fp,
            (lang IN ('en','es','fr','de')) AS lang_ok,
            (lang IN ('en','es','fr','de') AND len(ts) >= 20
              AND CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) >= 0.3) AS qual_ok
          FROM base),
        k AS (SELECT *, (qual_ok AND doc_id = min(CASE WHEN qual_ok THEN doc_id END)
            OVER (PARTITION BY fp)) AS keep_ok FROM f),
        sfl AS (SELECT *, (keep_ok AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
            IN ('0','1','2','3')) AS samp_ok FROM k),
        agg AS (SELECT count(*) AS s0,
            CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS s1,
            CAST(sum(CASE WHEN qual_ok THEN 1 ELSE 0 END) AS BIGINT) AS s2,
            CAST(sum(CASE WHEN keep_ok THEN 1 ELSE 0 END) AS BIGINT) AS s3,
            CAST(sum(CASE WHEN samp_ok THEN 1 ELSE 0 END) AS BIGINT) AS s4
          FROM sfl)
        SELECT 0 AS stage, 'total' AS stage_name, s0 AS n_docs FROM agg
        UNION ALL SELECT 1, 'lang_filter', s1 FROM agg
        UNION ALL SELECT 2, 'quality', s2 FROM agg
        UNION ALL SELECT 3, 'exact_dedup', s3 FROM agg
        UNION ALL SELECT 4, 'sampled', s4 FROM agg
        ORDER BY stage""")),

    // ---- token-budget sequence packing: greedy 512-token chunking
    //      per language stratum (chunk = exclusive-prefix-sum div
    //      budget). Partitioned by lang so strata pack in parallel —
    //      a single global pack is inherently sequential at scale.
    QueryDef(
      "q92_token_packing",
      (s, d) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        tokenized(s, d)
          .select(col("doc_id"), col("lang"), size(col("ts")).cast("long").as("n_tokens"))
          .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .withColumn("chunk_id", (col("cum_before") / 512).cast("long"))
          .groupBy("lang", "chunk_id")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("chunk_tokens"))
          .orderBy("lang", "chunk_id")
      },
      Some("""WITH t AS (SELECT doc_id, lang,
            CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (SELECT doc_id, lang, n_tokens,
            CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
          FROM t)
        SELECT lang, cum_before // 512 AS chunk_id, count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
        FROM c GROUP BY lang, cum_before // 512
        ORDER BY lang, chunk_id""")),

    // ---- int8 scalar quantization of embeddings + recall@1 audit:
    //      per-dim min/max codebook (64 cells — broadcast), codes in
    //      [0,255], then top-1 cosine search over the DEQUANTIZED
    //      vectors (codes + codebook reconstruct — what an int8
    //      serving tier actually reads) vs the exact-cosine top-1.
    //      The recall flag measures the end-to-end int8 round-trip
    //      quality in-query. At 100 TB quantization cuts the vector
    //      tier 4×; all fp is in-order folds over deterministic
    //      inputs (the engine-portable discipline of the whole
    //      similarity family). NOTE: ranking by raw affine code dots
    //      is NOT order-equivalent to cosine (the per-dim shift
    //      dominates) — measured 0/5 recall; reconstruction is the
    //      correct quantized rank key.
    QueryDef(
      "q94_embedding_quantize",
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        // per-dim codebook, assembled into two dim-ordered literal-ish
        // arrays on a single broadcast row
        val stats = e.select(posexplode(col("emb")).as(Seq("dim", "v")))
          .groupBy("dim").agg(min("v").as("mn"), max("v").as("mx"))
          .agg(expr("transform(array_sort(collect_list(struct(dim, mn))), s -> s.mn)").as("mins"),
            expr("transform(array_sort(collect_list(struct(dim, mx))), s -> s.mx)").as("maxs"))
        val q8 = "transform(sequence(0, size(emb) - 1), i -> CAST(CASE " +
          "WHEN maxs[i] > mins[i] THEN round((emb[i] - mins[i]) / (maxs[i] - mins[i]) * 255) " +
          "ELSE 0 END AS INT))"
        // reconstruction: mins[i] + code * scale[i]
        val dq = "transform(sequence(0, size(qv) - 1), i -> " +
          "mins[i] + CAST(qv[i] AS DOUBLE) * (maxs[i] - mins[i]) / 255D)"
        // codes + reconstructions materialized ONCE (production writes
        // the int8 tier to storage); probes and the pair scan both read
        // the stored blocks instead of re-running the quantize pipeline
        val coded = e.crossJoin(broadcast(stats))
          .withColumn("qv", expr(q8))
          .select(col("vec_id"), col("emb"), expr(dq).as("dqv"))
          .withColumn("norm",
            expr("sqrt(aggregate(zip_with(emb, emb, (x, y) -> x * y), 0D, (a, v) -> a + v))"))
          .withColumn("dnorm",
            expr("sqrt(aggregate(zip_with(dqv, dqv, (x, y) -> x * y), 0D, (a, v) -> a + v))"))
          .localCheckpoint()
        val probes = coded.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("emb").as("qe"),
            col("dqv").as("dqq"), col("norm").as("qnorm"), col("dnorm").as("qdnorm"))
        val pairs = broadcast(probes)
          .join(coded, col("vec_id") =!= col("query_id"))
          .withColumn("cosine",
            expr("aggregate(zip_with(qe, emb, (x, y) -> x * y), 0D, (a, v) -> a + v)") /
              (col("qnorm") * col("norm")))
          .withColumn("qcos",
            expr("aggregate(zip_with(dqq, dqv, (x, y) -> x * y), 0D, (a, v) -> a + v)") /
              (col("qdnorm") * col("dnorm")))
        // both rank keys resolved in ONE pass over the pair scan: two
        // windows share the partition, the winners fold in a final agg
        // (two top1-and-join branches would run the broadcast loop —
        // the expensive part at scale — twice)
        def w(key: String) = Window.partitionBy(col("query_id"))
          .orderBy(col(key).desc, col("vec_id").asc)
        pairs
          .withColumn("rn_e", row_number().over(w("cosine")))
          .withColumn("rn_q", row_number().over(w("qcos")))
          .filter(col("rn_e") === 1 || col("rn_q") === 1)
          .groupBy("query_id")
          .agg(max(when(col("rn_e") === 1, col("vec_id"))).as("exact_nn"),
            max(when(col("rn_q") === 1, col("vec_id"))).as("quant_nn"))
          .select(col("query_id"), col("exact_nn"), col("quant_nn"),
            (col("exact_nn") === col("quant_nn")).cast("int").as("recall_at1"))
          .orderBy("query_id")
      },
      Some("""WITH e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        x AS (SELECT vec_id, unnest(list_transform(range(len(emb)),
            i -> {'dim': i, 'v': emb[i+1]})) AS u FROM e),
        st AS (SELECT u.dim AS dim, min(u.v) AS mn, max(u.v) AS mx FROM x GROUP BY u.dim),
        cb AS (SELECT list(mn ORDER BY dim) AS mins, list(mx ORDER BY dim) AS maxs FROM st),
        qcoded AS (SELECT vec_id, emb,
            list_transform(range(len(emb)), i -> CAST(CASE
              WHEN maxs[i+1] > mins[i+1]
              THEN round((emb[i+1] - mins[i+1]) / (maxs[i+1] - mins[i+1]) * 255)
              ELSE 0 END AS INT)) AS qv,
            mins, maxs
          FROM e CROSS JOIN cb),
        coded AS (SELECT vec_id, emb,
            list_transform(range(len(qv)),
              i -> mins[i+1] + CAST(qv[i+1] AS DOUBLE) * (maxs[i+1] - mins[i+1]) / 255) AS dqv,
            sqrt(list_sum(list_transform(range(len(emb)), i -> emb[i+1] * emb[i+1]))) AS norm
          FROM qcoded),
        coded2 AS (SELECT vec_id, emb, dqv, norm,
            sqrt(list_sum(list_transform(range(len(dqv)), i -> dqv[i+1] * dqv[i+1]))) AS dnorm
          FROM coded),
        probes AS (SELECT vec_id AS query_id, emb AS qe, dqv AS dqq,
            norm AS qnorm, dnorm AS qdnorm
          FROM coded2 WHERE vec_id % 100 = 0),
        pairs AS (SELECT p.query_id, c.vec_id,
            list_sum(list_transform(range(len(p.qe)), i -> p.qe[i+1] * c.emb[i+1]))
              / (p.qnorm * c.norm) AS cosine,
            list_sum(list_transform(range(len(p.dqq)), i -> p.dqq[i+1] * c.dqv[i+1]))
              / (p.qdnorm * c.dnorm) AS qcos
          FROM probes p JOIN coded2 c ON c.vec_id <> p.query_id),
        ex AS (SELECT query_id, vec_id AS exact_nn FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, vec_id) AS rn FROM pairs) t WHERE rn = 1),
        qt AS (SELECT query_id, vec_id AS quant_nn FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY qcos DESC, vec_id) AS rn FROM pairs) t WHERE rn = 1)
        SELECT ex.query_id, exact_nn, quant_nn,
          CAST(exact_nn = quant_nn AS INT) AS recall_at1
        FROM ex JOIN qt ON ex.query_id = qt.query_id
        ORDER BY ex.query_id""")),

    // ---- exact-k deterministic stratified sample: EXACTLY 5 docs per
    //      language by md5 order (q86 keeps a hash *fraction*; training
    //      mixtures need fixed per-stratum budgets). Seedless and
    //      task-retry-stable. At extreme per-stratum cardinality the
    //      window becomes q71's bounded-heap Aggregator; the policy is
    //      identical.
    QueryDef(
      "q95_fixed_size_sample",
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
        Tables.documents(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"))
          .orderBy("lang", "rn")
      },
      Some("""SELECT lang, rn, doc_id, n_chars FROM (
          SELECT lang, doc_id, n_chars,
            CAST(row_number() OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rn
          FROM documents) t
        WHERE rn <= 5 ORDER BY lang, rn""")),

    // ---- deterministic train/val/test split: the leakage-safe hash
    //      assignment every training pipeline needs — a doc's split is
    //      a pure function of its id (re-runs, backfills, and other
    //      machines agree; no seed, no state). The 2-hex-digit md5
    //      prefix IS the bucket: lowercase hex compares
    //      lexicographically == numerically, so the thresholds are
    //      plain string comparisons that run identically in Spark and
    //      DuckDB ('cc' = 204/256 ≈ 80% train, 'e6' = 230 ≈ 10% val,
    //      rest test). One narrow projection, no shuffle at all until
    //      the final order.
    QueryDef(
      "q109_hash_split",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), Splits.splitCol(col("doc_id")).as("split"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, ${Splits.splitSql("doc_id")} AS split
        FROM documents ORDER BY doc_id"""),
      doc = "deterministic hash split: 80/10/10 train/val/test as a pure function of doc_id"),

    // ---- unigram-LM log-likelihood quality bucketing (the CCNet
    //      signal with the LM *self-trained* on the corpus — fully
    //      deterministic, no external model): per-term probabilities
    //      from one agg (vocabulary-sized → broadcast back), per-doc
    //      mean log-prob via ordered double folds (decimal casts
    //      diverge between engines — the q90 lesson), quartile buckets.
    //      The quartile assignment is EXACT ntile over the per-doc
    //      scores, but never a global window: GlobalRank.ntileByRange
    //      range-partitions by the total order and ranks via
    //      zipWithIndex — per-document rows (billions at 100 TB) never
    //      pass through one partition.
    QueryDef(
      "q96_unigram_loglik",
      (s, d) => GlobalRank
        .ntileByRange(q96Scored(s, d), 4,
          Seq(col("avg_ll_r").asc, col("doc_id").asc), "bucket")
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM documents),
        tf AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM tf),
        sc AS (SELECT doc_id, count(*) AS n_tokens,
            list_sum(list(ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) ORDER BY term))
              AS ll
          FROM toks JOIN tf USING (term) CROSS JOIN tot GROUP BY doc_id)
        SELECT doc_id, n_tokens, round(ll / n_tokens, 4) AS avg_ll_r,
          CAST(ntile(4) OVER (ORDER BY round(ll / n_tokens, 4), doc_id) AS INT) AS bucket
        FROM sc ORDER BY doc_id""")),

    // ---- source-mix rebalancing: per-source sampling weights that
    //      would equalize the training mixture (weight = uniform
    //      target share / actual share). One agg + broadcast scalars;
    //      the weights then drive a q86/q95-style sampler.
    QueryDef(
      "q97_source_mix_weights",
      (s, d) => {
        val bySrc = Tables.documents(s, d)
          .groupBy("source").agg(count(lit(1)).as("n_docs"))
        val totals = bySrc.agg(sum(col("n_docs")).as("tot"),
          count(lit(1)).as("n_sources"))
        bySrc.crossJoin(broadcast(totals))
          .withColumn("share", col("n_docs").cast("double") / col("tot").cast("double"))
          .withColumn("weight",
            round((col("tot").cast("double") / col("n_sources").cast("double")) /
              col("n_docs").cast("double"), 6))
          .select(col("source"), col("n_docs"), col("share"), col("weight"))
          .orderBy("source")
      },
      Some("""WITH bysrc AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot,
            CAST(count(*) AS BIGINT) AS n_sources FROM bysrc)
        SELECT source, n_docs,
          CAST(n_docs AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
          round((CAST(tot AS DOUBLE) / CAST(n_sources AS DOUBLE))
            / CAST(n_docs AS DOUBLE), 6) AS weight
        FROM bysrc CROSS JOIN tot ORDER BY source""")),

    // ---- overflow-aware document chunking: a doc longer than the
    //      token budget SPLITS into ceil(n/budget) training chunks
    //      (q92 packs whole docs; this is the other half of sequence
    //      prep). Budget 32 so the fixture corpus (10-99 tokens/doc)
    //      actually exercises multi-chunk splits; production budgets
    //      are 2k-8k with identical shape. Pure per-row explode —
    //      embarrassingly parallel, no shuffle at all.
    QueryDef(
      "q98_doc_chunking",
      (s, d) => tokenized(s, d)
        .select(col("doc_id"), col("lang"), size(col("ts")).cast("long").as("n_tokens"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          explode(expr("sequence(0, CAST(ceil(n_tokens / 32.0) AS INT) - 1)"))
            .as("chunk_idx"))
        .withColumn("chunk_tokens",
          least(lit(32L), col("n_tokens") - col("chunk_idx") * 32L))
        .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"), col("lang"))
        .orderBy("doc_id", "chunk_idx"),
      Some("""SELECT doc_id, CAST(u AS INT) AS chunk_idx,
          least(32, n_tokens - u * 32) AS chunk_tokens, lang
        FROM (SELECT doc_id, lang,
            CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
          FROM documents) t,
          unnest(range(CAST(ceil(n_tokens / 32.0) AS BIGINT))) AS s(u)
        ORDER BY doc_id, chunk_idx""")),

    // ---- equi-depth histogram: exact quartile boundaries (one agg)
    //      broadcast back, bucket assignment per row, per-bucket
    //      profile. The boundary agg sees column values once; at
    //      100 TB the boundaries would come from an approx-quantile
    //      sketch, the assignment pass is identical.
    QueryDef(
      "q99_equidepth_histogram",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bounds = docs.agg(
          expr("percentile(n_chars, 0.25)").as("b1"),
          expr("percentile(n_chars, 0.5)").as("b2"),
          expr("percentile(n_chars, 0.75)").as("b3"))
        docs.crossJoin(broadcast(bounds))
          .withColumn("bucket",
            when(col("n_chars") <= col("b1"), 1)
              .when(col("n_chars") <= col("b2"), 2)
              .when(col("n_chars") <= col("b3"), 3).otherwise(4))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
          .orderBy("bucket")
      },
      Some("""WITH b AS (SELECT quantile_cont(n_chars, 0.25) AS b1,
            quantile_cont(n_chars, 0.5) AS b2, quantile_cont(n_chars, 0.75) AS b3
          FROM documents)
        SELECT CASE WHEN n_chars <= b1 THEN 1 WHEN n_chars <= b2 THEN 2
            WHEN n_chars <= b3 THEN 3 ELSE 4 END AS bucket,
          count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM documents CROSS JOIN b
        GROUP BY 1 ORDER BY bucket""")),

    // ---- the capstone: a content-addressed training-set manifest.
    //      Body shared with q121 (the split-keyed manifest) via
    //      [[chunkManifest]].
    //      Funnel survivors (q91's lang→quality→dedup ladder) are
    //      chunked to the token budget (q98's split) and each chunk
    //      emits its token slice's md5 — the manifest a 100 TB run
    //      writes to storage for the trainer. One scan + one dedup
    //      window + one explode; chunk hashing is per-row.
    QueryDef(
      "q100_training_manifest",
      (s, d) => chunkManifest(s, d).orderBy("doc_id", "chunk_idx"),
      Some("""WITH base AS (SELECT doc_id, lang,
            string_split_regex(lower(trim(text)), '\s+') AS ts,
            md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
          FROM documents),
        f AS (SELECT doc_id, lang, ts, fp,
            (lang IN ('en','es','fr','de') AND len(ts) >= 20
              AND CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) >= 0.3) AS qual_ok
          FROM base),
        k AS (SELECT doc_id, lang, ts, CAST(len(ts) AS BIGINT) AS n_tokens
          FROM (SELECT *, (qual_ok AND doc_id = min(CASE WHEN qual_ok THEN doc_id END)
              OVER (PARTITION BY fp)) AS keep_ok FROM f) t
          WHERE keep_ok)
        SELECT doc_id, CAST(u AS INT) AS chunk_idx,
          least(32, n_tokens - u * 32) AS chunk_tokens, lang,
          md5(array_to_string(ts[u * 32 + 1 : u * 32 + least(32, n_tokens - u * 32)], ' '))
            AS chunk_hash
        FROM k, unnest(range(CAST(ceil(n_tokens / 32.0) AS BIGINT))) AS s(u)
        ORDER BY doc_id, chunk_idx""")),

    // ---- vocabulary coverage: global term frequencies, cumulative
    //      corpus share of the top-20 terms. The top-20 is a parallel
    //      partial top-k (TakeOrderedAndProject), NEVER a rank window
    //      over the whole vocabulary: web-scale whitespace vocabularies
    //      (typos/URLs/numbers) run to billions of distinct terms, and
    //      a global window would Exchange SinglePartition all of them
    //      to keep 20. Rank/cumsum run over the 20 survivors only.
    QueryDef(
      "q93_vocab_coverage",
      (s, d) => {
        // vocab-sized materialization: `total` derives from counts —
        // without it the total branch re-runs the corpus explode
        val counts = tokenized(s, d)
          .select(explode(col("ts")).as("term"))
          .groupBy("term").agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val total = counts.agg(sum(col("n")).as("total"))
        val top = counts.orderBy(col("n").desc, col("term").asc).limit(20)
        // the window's single-partition exchange sees ≤ 20 rows — the
        // limit already established global (n desc, term) order, so
        // rank/cum over the survivors equal their vocabulary-wide values
        val ord = Window.orderBy(col("n").desc, col("term").asc)
        top
          .withColumn("rank", row_number().over(ord))
          .withColumn("cum",
            sum(col("n")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
          .crossJoin(broadcast(total))
          .select(col("rank"), col("term"), col("n"), col("cum"),
            (col("cum").cast("double") / col("total").cast("double")).as("cum_share"))
          .orderBy("rank")
      },
      Some("""WITH toks AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
          FROM documents),
        counts AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts),
        ranked AS (SELECT term, n,
            CAST(row_number() OVER (ORDER BY n DESC, term) AS INT) AS rank,
            CAST(sum(n) OVER (ORDER BY n DESC, term
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM counts)
        SELECT rank, term, n, cum,
          CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
        FROM ranked CROSS JOIN tot
        WHERE rank <= 20 ORDER BY rank""")),

    // ---- temperature-scaled mixture weights (q134): q97 equalizes
    //      the mixture; real multi-source training uses TEMPERATURE
    //      sampling (weight ∝ share^α, α = 0.7 — the multilingual/
    //      multi-corpus recipe) so high-resource sources are damped,
    //      not flattened. The α-power normalizer Σ shareᵅ is a SMALL
    //      ordered fold (one row per source) — broadcast back as a
    //      scalar; `boost` = weight/share is the effective-epochs
    //      multiplier a sampler applies per source. One agg + scalar
    //      attaches, no corpus shuffle beyond the source count.
    QueryDef(
      "q134_source_mix_temperature",
      (s, d) => {
        val bySrc = Tables.documents(s, d)
          .groupBy("source").agg(count(lit(1)).as("n_docs"))
        val total = bySrc.agg(sum(col("n_docs")).as("tot"))
        val shares = bySrc.crossJoin(broadcast(total))
          .withColumn("share", col("n_docs").cast("double") / col("tot").cast("double"))
          .withColumn("scaled", pow(col("share"), lit(0.7)))
        val z = shares.agg(expr(
          """aggregate(transform(array_sort(collect_list(struct(source, scaled))),
               s -> s.scaled), 0D, (a, x) -> a + x)""").as("z"))
        shares.crossJoin(broadcast(z))
          .withColumn("weight", round(col("scaled") / col("z"), 6))
          .withColumn("boost", round((col("scaled") / col("z")) / col("share"), 6))
          .select(col("source"), col("n_docs"),
            round(col("share"), 6).as("share_r"), col("weight"), col("boost"))
          .orderBy("source")
      },
      Some("""WITH bysrc AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot FROM bysrc),
        sh AS (SELECT source, n_docs,
            CAST(n_docs AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
            pow(CAST(n_docs AS DOUBLE) / CAST(tot AS DOUBLE), 0.7) AS scaled
          FROM bysrc CROSS JOIN tot),
        z AS (SELECT list_sum(list(scaled ORDER BY source)) AS z FROM sh)
        SELECT source, n_docs, round(share, 6) AS share_r,
          round(scaled / z, 6) AS weight,
          round((scaled / z) / share, 6) AS boost
        FROM sh CROSS JOIN z ORDER BY source"""),
      doc = "temperature-scaled source mixture (α = 0.7): damped sampling weights + effective-epochs boost per source"),

    // ---- deterministic corpus shuffle → shard manifest (q135): the
    //      pre-training data-order step. Every doc gets a content-free
    //      pseudorandom rank (md5 of its id — reproducible across
    //      runs/engines), the total order is range-partitioned into 16
    //      equal shards (GlobalRank's offset arithmetic: per-doc rows
    //      NEVER pass through one partition — no global window), and
    //      the manifest prices each shard in docs and tokens. The
    //      hash-order shuffle breaks source/time locality by
    //      construction, which is exactly what a training loader wants
    //      from its shard files.
    QueryDef(
      "q135_shard_manifest",
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("doc_id"),
            md5(col("doc_id").cast("string")).as("h"),
            size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("nt"))
        GlobalRank.ntileByRange(t, 16, Seq(col("h").asc, col("doc_id").asc), "shard")
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
          .orderBy("shard")
      },
      Some("""WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
            len(string_split_regex(lower(trim(text)), '\s+')) AS nt FROM documents),
        sh AS (SELECT ntile(16) OVER (ORDER BY h, doc_id) AS shard, nt FROM t)
        SELECT CAST(shard AS INT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(nt) AS BIGINT) AS n_tokens
        FROM sh GROUP BY shard ORDER BY shard"""),
      doc = "deterministic hash-order corpus shuffle into 16 range-partitioned shards, with a per-shard doc/token manifest"),

    // ---- length-grouped batching audit (q140): the dynamic-batching
    //      trade a training loader makes when sequences are padded
    //      (not packed): group docs into power-of-two length buckets
    //      and price the padding waste per bucket — the statistic that
    //      decides between bucketed padding and q92-style packing.
    //      Exact integers end-to-end (fixed CASE ladder, no fp log2);
    //      one corpus pass + a 7-row agg.
    QueryDef(
      "q140_length_bucket_batching",
      (s, d) => {
        val bucketExpr = "CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32 " +
          "WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256 " +
          "WHEN n <= 512 THEN 512 ELSE 1024 END"
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
          .withColumn("bucket_len", expr(bucketExpr).cast("long"))
          .groupBy("bucket_len")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n")).as("n_tokens"),
            (count(lit(1)) * col("bucket_len")).as("padded_tokens"))
          .withColumn("pad_waste_r",
            round(lit(1.0) - col("n_tokens").cast("double") / col("padded_tokens").cast("double"), 4))
          .select("bucket_len", "n_docs", "n_tokens", "padded_tokens", "pad_waste_r")
          .orderBy("bucket_len")
      },
      Some("""WITH t AS (SELECT doc_id,
            CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n
          FROM documents),
        b AS (SELECT n, CAST(CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
            WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
            WHEN n <= 512 THEN 512 ELSE 1024 END AS BIGINT) AS bucket_len FROM t)
        SELECT bucket_len, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n) AS BIGINT) AS n_tokens,
          CAST(count(*) * bucket_len AS BIGINT) AS padded_tokens,
          round(1.0 - CAST(sum(n) AS DOUBLE) / (count(*) * bucket_len), 4) AS pad_waste_r
        FROM b GROUP BY bucket_len ORDER BY bucket_len"""),
      doc = "length-grouped batching audit: power-of-two token buckets with exact per-bucket padding-waste ratios"),

    // ---- dataset snapshot diff (q144): the versioning audit a
    //      continuously-refreshed corpus needs — given two dataset
    //      snapshots, classify every doc as added / removed /
    //      modified / unchanged by content hash and report per-source
    //      counts (what a data-registry "what changed since v1" view
    //      shows). Snapshot v2 is derived deterministically from v1
    //      (drop every 13th doc, rewrite every 7th by removing its
    //      first word, add a fresh doc per 11th) so the oracle
    //      replays the same derivation. One full outer join on
    //      doc_id, md5 content compare — at scale both sides
    //      co-partition on the id; the diff never compares text
    //      bodies, only their hashes.
    QueryDef(
      "q144_snapshot_diff",
      (s, d) => {
        val v1 = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), md5(col("text")).as("h1"))
        val v2base = Tables.documents(s, d)
          .filter(col("doc_id") % 13 =!= 0)
          .select(col("doc_id"), col("source"),
            md5(when(col("doc_id") % 7 === 0,
              expr("trim(substring(text, instr(text, ' ') + 1))"))
              .otherwise(col("text"))).as("h2"))
        val v2added = Tables.documents(s, d)
          .filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + Ids.VariantOffset).as("doc_id"), col("source"),
            md5(concat(col("text"), lit(" v2"))).as("h2"))
        val v2 = v2base.unionByName(v2added)
        v1.withColumnRenamed("source", "src1")
          .join(v2.withColumnRenamed("source", "src2"), Seq("doc_id"), "full_outer")
          .withColumn("source", coalesce(col("src1"), col("src2")))
          .withColumn("status",
            when(col("h1").isNull, "added")
              .when(col("h2").isNull, "removed")
              .when(col("h1") === col("h2"), "unchanged")
              .otherwise("modified"))
          .groupBy("source", "status")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("source", "status")
      },
      Some(s"""WITH v1 AS (SELECT doc_id, source, md5(text) AS h1 FROM documents),
        v2 AS (SELECT doc_id, source,
            md5(CASE WHEN doc_id % 7 = 0
              THEN trim(substr(text, instr(text, ' ') + 1))
              ELSE text END) AS h2
          FROM documents WHERE doc_id % 13 <> 0
          UNION ALL
          SELECT doc_id + ${Ids.VariantOffset}, source, md5(text || ' v2')
          FROM documents WHERE doc_id % 11 = 0)
        SELECT coalesce(v1.source, v2.source) AS source,
          CASE WHEN h1 IS NULL THEN 'added'
               WHEN h2 IS NULL THEN 'removed'
               WHEN h1 = h2 THEN 'unchanged'
               ELSE 'modified' END AS status,
          CAST(count(*) AS BIGINT) AS n_docs
        FROM v1 FULL OUTER JOIN v2 USING (doc_id)
        GROUP BY 1, 2 ORDER BY source, status"""),
      doc = "dataset snapshot diff: content-hash full-outer compare of two corpus versions, per-source added/removed/modified/unchanged counts"),

    // ---- temperature-weighted sampler (q145): q134 computes the
    //      mixture; this EXECUTES it in one Bernoulli pass. To realize
    //      target share qᵢ from corpus share pᵢ, each source keeps
    //      docs at rate aᵢ ∝ qᵢ/pᵢ (the boost), normalized so the
    //      most-boosted source keeps everything. The accept gate is
    //      seedless and engine-portable: md5(doc_id) 8-hex-char prefix
    //      compared against the per-source threshold rendered as
    //      zero-padded lowercase hex — string order IS numeric order
    //      for same-length lowercase hex, so no hex→int parsing is
    //      needed in either engine (rand() would differ per run and
    //      per task retry). Output audits the REALIZED mixture against
    //      the q134 targets. One corpus pass + a 20-row broadcast.
    QueryDef(
      "q145_temperature_sampler",
      (s, d) => {
        val bySrc = Tables.documents(s, d)
          .groupBy("source").agg(count(lit(1)).as("n_docs"))
        val total = bySrc.agg(sum(col("n_docs")).as("tot"))
        val shares = bySrc.crossJoin(broadcast(total))
          .withColumn("share", col("n_docs").cast("double") / col("tot").cast("double"))
          .withColumn("scaled", pow(col("share"), lit(0.7)))
        val z = shares.agg(expr(
          """aggregate(transform(array_sort(collect_list(struct(source, scaled))),
               s -> s.scaled), 0D, (a, x) -> a + x)""").as("z"))
        val boosted = shares.crossJoin(broadcast(z))
          .withColumn("boost", (col("scaled") / col("z")) / col("share"))
        val mb = boosted.agg(max(col("boost")).as("max_boost"))
        val rates = boosted.crossJoin(broadcast(mb))
          .withColumn("rate", col("boost") / col("max_boost"))
          .withColumn("thr",
            lpad(lower(hex(floor(col("rate") * 4294967296.0).cast("long"))), 8, "0"))
          .select(col("source"), col("n_docs"), col("rate"), col("thr"))
        val kept = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            substring(md5(col("doc_id").cast("string")), 1, 8).as("gate"))
          .join(broadcast(rates), Seq("source"))
          .filter(col("rate") >= 1.0 || col("gate") < col("thr"))
          .groupBy("source").agg(count(lit(1)).as("n_kept"))
        val keptTot = kept.agg(sum(col("n_kept")).as("kept_tot"))
        rates.join(kept, Seq("source"), "left")
          .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
          .crossJoin(broadcast(keptTot))
          .select(col("source"), col("n_docs"), col("n_kept"),
            round(col("rate"), 6).as("rate_r"),
            round(col("n_kept").cast("double") / col("n_docs").cast("double"), 4)
              .as("kept_r"),
            round(col("n_kept").cast("double") / col("kept_tot").cast("double"), 4)
              .as("realized_share"))
          .orderBy("source")
      },
      Some("""WITH bysrc AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot FROM bysrc),
        sh AS (SELECT source, n_docs,
            CAST(n_docs AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
            pow(CAST(n_docs AS DOUBLE) / CAST(tot AS DOUBLE), 0.7) AS scaled
          FROM bysrc CROSS JOIN tot),
        z AS (SELECT list_sum(list(scaled ORDER BY source)) AS z FROM sh),
        bo AS (SELECT source, n_docs, share, (scaled / z) / share AS boost
          FROM sh CROSS JOIN z),
        mb AS (SELECT max(boost) AS max_boost FROM bo),
        rates AS (SELECT source, n_docs, boost / max_boost AS rate,
            lpad(lower(hex(CAST(floor(boost / max_boost * 4294967296.0) AS BIGINT))), 8, '0') AS thr
          FROM bo CROSS JOIN mb),
        kept AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
          FROM documents d JOIN rates r USING (source)
          WHERE r.rate >= 1.0 OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < r.thr
          GROUP BY d.source),
        kt AS (SELECT CAST(sum(n_kept) AS BIGINT) AS kept_tot FROM kept)
        SELECT r.source, r.n_docs, coalesce(k.n_kept, 0) AS n_kept,
          round(r.rate, 6) AS rate_r,
          round(CAST(coalesce(k.n_kept, 0) AS DOUBLE) / r.n_docs, 4) AS kept_r,
          round(CAST(coalesce(k.n_kept, 0) AS DOUBLE) / kept_tot, 4) AS realized_share
        FROM rates r LEFT JOIN kept k USING (source) CROSS JOIN kt
        ORDER BY r.source"""),
      doc = "temperature-weighted sampler: q134's boosts executed as a seedless md5-hex Bernoulli gate, with the realized mixture audited per source"),

    // ---- DSIR-style importance selection (q149): the published
    //      data-selection recipe (Xie et al. 2023, "Data Selection for
    //      Language Models via Importance Resampling") with the
    //      hashed-ngram feature LMs collapsed to the fully
    //      deterministic unigram case: importance weight = per-token
    //      mean log-ratio of an add-1-smoothed unigram LM trained on
    //      the TARGET slice (source = 'src0' plays the high-quality
    //      target) vs one trained on the whole raw pool; the top-100
    //      raw-pool docs by weight are the selected training set.
    //      q96 scores docs under ONE corpus LM; this is the
    //      two-distribution ratio that steers a mixture toward a
    //      target domain.
    //
    //      Scale: one corpus tokenize → vocabulary-sized counts for
    //      both LMs (the target counts are a filtered agg of the SAME
    //      scan), ratio model broadcast back, per-doc ordered double
    //      fold (the q90/q96 lesson), top-100 via ordered limit
    //      (TakeOrderedAndProject — never a global sort/window).
    QueryDef(
      "q149_dsir_importance",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
          .filter(col("term") =!= "")
        val corpus = toks.groupBy("term").agg(count(lit(1)).as("cr"))
        val target = toks.filter(col("source") === "src0")
          .groupBy("term").agg(count(lit(1)).as("ct"))
        // vocab-sized ratio model, pinned once: corpus vocab is the
        // support (target counts left-joined, zero-filled)
        val model = corpus.join(target, Seq("term"), "left")
          .na.fill(0L, Seq("ct"))
          .localCheckpoint()
        val totals = model.agg(
          sum(col("cr")).as("tr"), sum(col("ct")).as("tt"),
          count(lit(1)).as("v"))
        toks.join(broadcast(model), Seq("term"))
          .crossJoin(broadcast(totals))
          .withColumn("lr",
            expr("ln((ct + 1.0) / (tt + v)) - ln((cr + 1.0) / (tr + v))"))
          .groupBy("doc_id", "source")
          .agg(count(lit(1)).as("n_tokens"),
            expr("""aggregate(transform(array_sort(collect_list(struct(term, lr))),
                 x -> x.lr), 0D, (a, y) -> a + y)""").as("llr"))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            // log-likelihood ratios straddle zero — fold −0.0 at source
            QueryDef.roundZ(col("llr") / col("n_tokens"), 4).as("avg_llr_r"))
          .orderBy(col("avg_llr_r").desc, col("doc_id").asc)
          .limit(100)
      },
      Some("""WITH toks AS (SELECT doc_id, source,
            unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM documents),
        tk AS (SELECT * FROM toks WHERE term <> ''),
        cr AS (SELECT term, count(*) AS cr FROM tk GROUP BY term),
        ctt AS (SELECT term, count(*) AS ct FROM tk WHERE source = 'src0' GROUP BY term),
        model AS (SELECT cr.term, cr.cr, coalesce(ctt.ct, 0) AS ct
          FROM cr LEFT JOIN ctt USING (term)),
        tot AS (SELECT CAST(sum(cr) AS BIGINT) AS tr, CAST(sum(ct) AS BIGINT) AS tt,
            CAST(count(*) AS BIGINT) AS v FROM model),
        sc AS (SELECT doc_id, source, count(*) AS n_tokens,
            list_sum(list(ln((ct + 1.0) / (tt + v)) - ln((cr + 1.0) / (tr + v))
              ORDER BY term)) AS llr
          FROM tk JOIN model USING (term) CROSS JOIN tot
          GROUP BY doc_id, source)
        SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
          round(llr / n_tokens, 4) + 0.0 AS avg_llr_r
        FROM sc ORDER BY avg_llr_r DESC, doc_id LIMIT 100"""),
      doc = "DSIR-style importance selection: per-doc mean log-ratio of target-slice vs raw-pool add-1 unigram LMs, top-100 selected via ordered limit — the two-distribution steering signal behind targeted data mixtures"),

    // ---- global byte-offset export manifest (q153): the offset table
    //      a WebDataset/tar-style corpus export ships — every document's
    //      EXACT byte offset in the newline-delimited concatenation
    //      (doc_id order), plus its 64 KiB-shard assignment and
    //      in-shard position. q135 manifests shard populations by
    //      counts; this is the byte-exact random-access index a
    //      training loader seeks with.
    //
    //      The offset is a prefix SUM over a total order — the other
    //      scale-killer global window (`sum() OVER (ORDER BY …)` plans
    //      one partition). [[PrefixScan.runningSumExclusive]] computes
    //      it with the GlobalRank decomposition: range partition +
    //      driver-side partitions-sized prefix + one seeded pass.
    QueryDef(
      "q153_byte_offset_manifest",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            (octet_length(col("text")) + 1).cast("long").as("n_rec"))
        PrefixScan
          .runningSumExclusive(docs, Seq(col("doc_id")), "n_rec", "byte_offset")
          .select(col("doc_id"),
            (col("n_rec") - 1).as("n_bytes"),
            col("byte_offset"),
            expr("byte_offset div 65536").as("shard_id"),
            (col("byte_offset") % 65536).as("shard_pos"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, CAST(strlen(text) + 1 AS BIGINT) AS n_rec
          FROM documents),
        o AS (SELECT doc_id, n_rec,
            coalesce(sum(n_rec) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bo
          FROM d)
        SELECT doc_id, n_rec - 1 AS n_bytes, CAST(bo AS BIGINT) AS byte_offset,
          CAST(bo // 65536 AS BIGINT) AS shard_id,
          CAST(bo % 65536 AS BIGINT) AS shard_pos
        FROM o ORDER BY doc_id"""),
      doc = "byte-exact export manifest: each doc's global offset in the newline-delimited concatenation plus 64KiB-shard assignment, via the distributed prefix sum (never a single-partition window)"),

    // ---- dataset card (q156): the per-source summary a corpus
    //      registry publishes with every release — doc/token/byte
    //      volumes, language mix (dominant language + its share),
    //      exact within-source duplicate rate (q35's normalized-text
    //      md5), and mean document length. ONE scan computes every
    //      per-doc signal; the per-source rollup is a 20-group hash
    //      agg. The dup rate inside an agg: count(*) −
    //      count(DISTINCT fp) — never a self-join.
    //
    //      Dominant language via deterministic max-struct: the
    //      (count, lang) pair ordered by count then lang — the same
    //      argmax-by-struct trick both engines implement natively
    //      (Spark max(struct), DuckDB max_by with count+lang tiebreak
    //      folded into arg) — here done portably with a per-(source,
    //      lang) agg + window-free top-1 via max(struct).
    QueryDef(
      "q156_dataset_card",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("lang"),
            col("n_chars"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
            octet_length(col("text")).cast("long").as("n_bytes"),
            md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"))
        val card = docs.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_bytes")).as("n_bytes"),
          countDistinct(col("fp")).as("n_unique"),
          round(avg(col("n_chars").cast("double")), 4).as("mean_chars_r"))
        val langTop = docs.groupBy("source", "lang")
          .agg(count(lit(1)).as("nl"))
          .groupBy("source")
          .agg(max(struct(col("nl"), col("lang"))).as("top"))
          .select(col("source"), col("top.lang").as("top_lang"),
            col("top.nl").as("top_lang_docs"))
        card.join(langTop, Seq("source"))
          .select(col("source"), col("n_docs"), col("n_tokens"), col("n_bytes"),
            (col("n_docs") - col("n_unique")).as("n_dup_docs"),
            round((col("n_docs") - col("n_unique")).cast("double") /
              col("n_docs").cast("double"), 6).as("dup_rate_r"),
            col("top_lang"), col("top_lang_docs"),
            round(col("top_lang_docs").cast("double") /
              col("n_docs").cast("double"), 6).as("top_lang_share_r"),
            col("mean_chars_r"))
          .orderBy("source")
      },
      Some("""WITH docs AS (SELECT doc_id, source, lang, n_chars,
            CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
            CAST(strlen(text) AS BIGINT) AS n_bytes,
            md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
          FROM documents),
        card AS (SELECT source, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
            CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
            round(avg(CAST(n_chars AS DOUBLE)), 4) AS mean_chars_r
          FROM docs GROUP BY source),
        lt AS (SELECT source, max(struct_pack(nl := nl, lang := lang)) AS top
          FROM (SELECT source, lang, count(*) AS nl
            FROM docs GROUP BY source, lang) g
          GROUP BY source)
        SELECT card.source, n_docs, n_tokens, n_bytes,
          n_docs - n_unique AS n_dup_docs,
          round(CAST(n_docs - n_unique AS DOUBLE) / n_docs, 6) AS dup_rate_r,
          top.lang AS top_lang, CAST(top.nl AS BIGINT) AS top_lang_docs,
          round(CAST(top.nl AS DOUBLE) / n_docs, 6) AS top_lang_share_r,
          mean_chars_r
        FROM card JOIN lt ON card.source = lt.source
        ORDER BY card.source"""),
      doc = "per-source dataset card: doc/token/byte volumes, exact within-source duplicate rate, dominant language + share, mean length — the registry release summary in one scan plus a 20-group rollup"),

    // ---- rule-based quality battery (q163): the Gopher-style
    //      (Rae et al. 2021 §A1.1) document filter — a battery of
    //      independent threshold rules, each reported PER RULE so the
    //      pipeline can audit which rule rejects what before composing
    //      them into the keep decision (the published filters always
    //      ship per-rule reject rates, not one opaque flag).
    //      Thresholds sit inside this corpus's feature spread, so
    //      every discriminating rule fires both ways at sf0.01; r5 is
    //      the structural chars-per-token guard that rarely fires on
    //      clean data but catches encoding blowups in the wild.
    //
    //      The dominance feature (top token share) needs a per-doc
    //      argmax over token counts — grouped per (doc, token) then
    //      max per doc, both map-side combinable; everything else is
    //      per-row array math in one codegen span. No joins: the
    //      dominance agg re-keys by doc_id, the same key the final
    //      projection uses.
    QueryDef(
      "q163_gopher_rules",
      (s, d) => {
        val t = Tables.documents(s, d)
          .withColumn("ts", split(trim(col("text")), "\\s+"))
        val feat = t.select(col("doc_id"), col("source"),
          size(col("ts")).cast("long").as("nt"),
          (expr("size(filter(ts, t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and' OR t = 'to' OR t = 'in' OR t = 'is'))").cast("double") /
            size(col("ts"))).as("stop"),
          (size(array_distinct(col("ts"))).cast("double") / size(col("ts"))).as("ttr"),
          (length(col("text")).cast("double") / size(col("ts"))).as("cpt"))
        val dom = t.select(col("doc_id"), explode(col("ts")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(max(col("c")).as("mx"))
        feat.join(dom, Seq("doc_id"))
          .withColumn("dom", col("mx").cast("double") / col("nt"))
          .select(col("doc_id"), col("source"), col("nt"),
            when(col("nt") >= 30 && col("nt") <= 100000, 1).otherwise(0).as("r1_len"),
            when(col("stop") >= 0.04, 1).otherwise(0).as("r2_stop"),
            when(col("ttr") >= 0.35, 1).otherwise(0).as("r3_ttr"),
            when(col("dom") <= 0.12, 1).otherwise(0).as("r4_dom"),
            when(col("cpt") >= 3.0 && col("cpt") <= 10.0, 1).otherwise(0).as("r5_cpt"))
          .withColumn("keep",
            (col("r1_len") === 1 && col("r2_stop") === 1 && col("r3_ttr") === 1 &&
              col("r4_dom") === 1 && col("r5_cpt") === 1).cast("int"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, source, text,
            string_split_regex(trim(text), '\s+') AS ts FROM documents),
        f AS (SELECT doc_id, source, CAST(len(ts) AS BIGINT) AS nt,
            CAST(len(list_filter(ts, x -> x = 'the' OR x = 'a' OR x = 'of' OR x = 'and' OR x = 'to' OR x = 'in' OR x = 'is')) AS DOUBLE) / len(ts) AS stop,
            CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) AS ttr,
            CAST(length(text) AS DOUBLE) / len(ts) AS cpt
          FROM t),
        dom AS (SELECT doc_id, max(c) AS mx FROM (
            SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(ts) AS tok FROM t) u
            GROUP BY doc_id, tok) g GROUP BY doc_id),
        r AS (SELECT f.doc_id, source, nt,
            CASE WHEN nt >= 30 AND nt <= 100000 THEN 1 ELSE 0 END AS r1_len,
            CASE WHEN stop >= 0.04 THEN 1 ELSE 0 END AS r2_stop,
            CASE WHEN ttr >= 0.35 THEN 1 ELSE 0 END AS r3_ttr,
            CASE WHEN CAST(mx AS DOUBLE) / nt <= 0.12 THEN 1 ELSE 0 END AS r4_dom,
            CASE WHEN cpt >= 3.0 AND cpt <= 10.0 THEN 1 ELSE 0 END AS r5_cpt
          FROM f JOIN dom ON f.doc_id = dom.doc_id)
        SELECT doc_id, source, nt, r1_len, r2_stop, r3_ttr, r4_dom, r5_cpt,
          CASE WHEN r1_len = 1 AND r2_stop = 1 AND r3_ttr = 1 AND r4_dom = 1
               AND r5_cpt = 1 THEN 1 ELSE 0 END AS keep
        FROM r ORDER BY doc_id"""),
      doc = "Gopher-style rule-based quality battery: per-rule pass flags (length, stopword floor, TTR floor, top-token dominance cap, chars-per-token band) plus the composed keep bit, per-doc for rule-level audit"),

    // ---- distribution drift audit (q168): Population Stability Index
    //      of each source's length distribution against the corpus —
    //      the drift number a pipeline alarms on when a feed's shape
    //      moves (PSI < 0.1 stable, > 0.25 shifted, by the usual
    //      industry reading). Buckets are fixed-width (100-char) on
    //      n_chars; both distributions get the same +0.5 add-smoothing
    //      over the GLOBAL bucket set, so empty source buckets are
    //      defined and every (p−q)·ln(p/q) term is nonnegative.
    //
    //      Shape: one scan → (source, bucket) counts (map-side
    //      combinable, output ≤ sources × buckets); the global bucket
    //      frame broadcasts into the per-source grid (a small
    //      cross/left-join lattice), and the PSI fold runs bucket-
    //      ordered per source for a cross-engine-identical fp trace.
    QueryDef(
      "q168_distribution_drift",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), expr("n_chars div 100").as("bucket"))
        val sb = docs.groupBy("source", "bucket").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val gb = sb.groupBy("bucket").agg(sum(col("c")).as("gc"))
        val stot = sb.groupBy("source").agg(sum(col("c")).as("st"))
        val nb = gb.agg(count(lit(1)).as("nb"), sum(col("gc")).as("gt"))
        val grid = stot.crossJoin(broadcast(gb)).crossJoin(broadcast(nb))
          .join(sb, Seq("source", "bucket"), "left")
          .withColumn("p",
            (coalesce(col("c"), lit(0L)).cast("double") + 0.5) /
              (col("st").cast("double") + lit(0.5) * col("nb")))
          .withColumn("q",
            (col("gc").cast("double") + 0.5) /
              (col("gt").cast("double") + lit(0.5) * col("nb")))
          .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
        grid.groupBy("source")
          .agg(max(col("nb")).as("n_buckets"),
            expr("""aggregate(transform(array_sort(collect_list(struct(bucket, term))),
                 x -> x.term), 0D, (a, v) -> a + v)""").as("psi"))
          .select(col("source"), col("n_buckets"),
            round(col("psi"), 4).as("psi_r"))
          .orderBy("source")
      },
      Some("""WITH docs AS (SELECT source, n_chars // 100 AS bucket FROM documents),
        sb AS (SELECT source, bucket, count(*) AS c FROM docs GROUP BY source, bucket),
        gb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS gc FROM sb GROUP BY bucket),
        stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS st FROM sb GROUP BY source),
        nb AS (SELECT CAST(count(*) AS BIGINT) AS nb, CAST(sum(gc) AS BIGINT) AS gt FROM gb),
        grid AS (SELECT stot.source, gb.bucket, st, gc, nb.nb, nb.gt, sb.c
          FROM stot CROSS JOIN gb CROSS JOIN nb
          LEFT JOIN sb ON sb.source = stot.source AND sb.bucket = gb.bucket),
        terms AS (SELECT source, bucket, nb,
            (CAST(coalesce(c, 0) AS DOUBLE) + 0.5) / (CAST(st AS DOUBLE) + 0.5 * nb) AS p,
            (CAST(gc AS DOUBLE) + 0.5) / (CAST(gt AS DOUBLE) + 0.5 * nb) AS q
          FROM grid)
        SELECT source, max(nb) AS n_buckets,
          round(list_sum(list((p - q) * ln(p / q) ORDER BY bucket)), 4) AS psi_r
        FROM terms GROUP BY source ORDER BY source"""),
      doc = "Population Stability Index of each source's length histogram vs the corpus: fixed-width buckets, symmetric add-0.5 smoothing over the global bucket lattice, bucket-ordered PSI fold"),

    // ---- weighted sampling without replacement (q171): Efraimidis &
    //      Spirakis 2006 (A-ES), the one-pass distributed algorithm —
    //      each row gets key u^(1/w) for uniform u and weight w; the
    //      global top-k by key IS an exact weighted sample without
    //      replacement. Here u derives from the doc_id hash (the
    //      battery's deterministic-uniform idiom: first 8 md5 hex
    //      chars → (v+1)/2^32+1), w = n_chars, and the ranking runs
    //      on ln(u)/w (monotone twin of u^(1/w), no pow underflow).
    //      The top-k is a TakeOrdered — one scan, no full sort, the
    //      reason A-ES is THE weighted sampler for data-parallel
    //      engines.
    QueryDef(
      "q171_weighted_sample",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars").as("w"),
            expr("cast(conv(substring(md5(concat('ws', cast(doc_id AS string))), 1, 8), 16, 10) as bigint)")
              .as("hv"))
          .withColumn("u", (col("hv") + 1L) / lit(4294967297.0))
          .withColumn("key", log(col("u")) / col("w"))
          .orderBy(col("key").desc, col("doc_id").asc)
          .limit(50)
          .select(col("doc_id"), col("source"), col("w"),
            round(col("key") * 1000000.0, 4).as("key_ppm_r"))
      },
      Some("""WITH h AS (SELECT doc_id, source, n_chars AS w,
            CAST(('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS hv
          FROM documents),
        k AS (SELECT doc_id, source, w,
            ln((hv + 1) / 4294967297.0) / w AS key
          FROM h)
        SELECT doc_id, source, w, round(key * 1000000.0, 4) AS key_ppm_r
        FROM k ORDER BY key DESC, doc_id LIMIT 50"""),
      doc = "Efraimidis-Spirakis one-pass weighted sampling without replacement: deterministic hash-uniform, ln(u)/w ranking keys, exact top-k via TakeOrdered — the distributed weighted sampler"),

    // ---- two-sample Kolmogorov–Smirnov test (q177): the sharper
    //      companion to q168's PSI — does src0's length distribution
    //      differ from the rest of the corpus? KS = max |F1 − F2|
    //      over the pooled support, with the 5%-level critical value
    //      1.358·√((n1+n2)/(n1·n2)) and the reject decision.
    //
    //      Scale note: the cumulative window runs AFTER the
    //      per-value agg, so its input cardinality is the number of
    //      DISTINCT lengths — bounded by the longest document, not
    //      the corpus. A single-partition window over a value-bounded
    //      frame is the correct tool (the q151 rule targets windows
    //      over per-ROW frames). Argmax by the portable
    //      min(−d, v) struct so a tie lands on the smallest length.
    QueryDef(
      "q177_ks_test",
      (s, d) => {
        val byVal = Tables.documents(s, d)
          .select(col("n_chars").as("v"),
            when(col("source") === "src0", 1L).otherwise(0L).as("is1"))
          .groupBy("v")
          .agg(sum(col("is1")).as("c1"), sum(lit(1L) - col("is1")).as("c2"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("v").rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val cum = byVal
          .withColumn("cum1", sum(col("c1")).over(w))
          .withColumn("cum2", sum(col("c2")).over(w))
        val nn = byVal.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        cum.crossJoin(broadcast(nn))
          .withColumn("dd", abs(
            col("cum1").cast("double") / col("n1") -
              col("cum2").cast("double") / col("n2")))
          .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
            min(struct((-col("dd")).as("nd"), col("v").as("v"))).as("m"))
          .select(col("n1"), col("n2"),
            round(-col("m.nd"), 4).as("ks_r"),
            col("m.v").as("ks_at"),
            round(lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
              (col("n1").cast("double") * col("n2"))), 4).as("crit_r"),
            (-col("m.nd") > lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
              (col("n1").cast("double") * col("n2")))).cast("int").as("reject"))
      },
      Some("""WITH byval AS (SELECT n_chars AS v,
            CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
            CAST(sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS BIGINT) AS c2
          FROM documents GROUP BY n_chars),
        cum AS (SELECT v,
            sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
            sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
          FROM byval),
        nn AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM byval),
        dd AS (SELECT v, abs(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2) AS dd,
            n1, n2 FROM cum CROSS JOIN nn),
        m AS (SELECT max(n1) AS n1, max(n2) AS n2,
            min(struct_pack(nd := -dd, v := v)) AS m FROM dd)
        SELECT n1, n2, round(-(m).nd, 4) AS ks_r, (m).v AS ks_at,
          round(1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)), 4) AS crit_r,
          CAST(-(m).nd > 1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)) AS INT) AS reject
        FROM m"""),
      doc = "two-sample Kolmogorov-Smirnov test of src0's length distribution vs the rest: exact ECDF gap over the pooled support (post-agg, value-bounded cardinality), 5% critical value and reject decision"),

    // ---- reproducible training order (q192): the dataloader's
    //      shuffle-order manifest — every doc assigned its position
    //      in a DETERMINISTIC global shuffle (order by the doc_id's
    //      keyed md5, ties by id), then step and in-batch slot at a
    //      fixed batch size of 8. Reproducible shuffling is a
    //      training-run requirement (elastic restarts must resume the
    //      same order); the global position comes from
    //      [[GlobalRank.withRowIndex]] (range partition + prefix
    //      offsets), so the manifest is buildable at any corpus size
    //      without a single-partition window.
    QueryDef(
      "q192_training_order",
      (s, d) => {
        val h = Tables.documents(s, d)
          .select(col("doc_id"),
            md5(concat(lit("ord"), col("doc_id").cast("string"))).as("hk"))
        GlobalRank.withRowIndex(h, Seq(col("hk"), col("doc_id")), "rk")
          .select(col("doc_id"), col("rk"),
            expr("(rk - 1) div 8").as("step"),
            ((col("rk") - 1) % 8).as("slot"))
          .orderBy("rk")
      },
      Some("""WITH h AS (SELECT doc_id,
            md5('ord' || CAST(doc_id AS VARCHAR)) AS hk FROM documents)
        SELECT doc_id,
          CAST(row_number() OVER (ORDER BY hk, doc_id) AS BIGINT) AS rk,
          (row_number() OVER (ORDER BY hk, doc_id) - 1) // 8 AS step,
          (row_number() OVER (ORDER BY hk, doc_id) - 1) % 8 AS slot
        FROM h ORDER BY rk"""),
      doc = "deterministic dataloader shuffle manifest: keyed-md5 global order via the distributed row-index primitive, step and in-batch slot at fixed batch size — reproducible training order with no single-partition window")
  )
}
