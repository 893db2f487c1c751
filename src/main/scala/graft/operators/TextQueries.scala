package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (north-star LLM-pipeline
  * surface, SURVEY.md §7 M6): token counting, quality scoring,
  * n-gram-heuristic language ID, document fingerprinting.
  *
  * Everything stays inside whole-stage codegen: higher-order array
  * functions (`transform`/`filter`/`aggregate`) + built-in string
  * functions, no UDFs. At 100 TB these are embarrassingly parallel
  * per-row maps — no shuffle at all until an aggregation is asked for.
  */
object TextQueries {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** lang → distinctive marker words for the n-gram/stopword heuristic. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "is", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  private def orChain(v: String, words: Seq[String]): String =
    words.map(w => s"$v = '$w'").mkString(" OR ")

  val defs: Seq[QueryDef] = Seq(

    // ---- token counting + basic stats
    QueryDef(
      "q31_text_token_stats",
      (s, d) => Tables.documents(s, d)
        .withColumn("ts", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"),
          size(col("ts")).as("n_tokens"),
          length(col("text")).as("len_chars"),
          size(array_distinct(col("ts"))).as("n_distinct_tokens"),
          expr(s"size(filter(ts, t -> ${orChain("t", stopwords)}))").as("n_stopwords"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        CAST(len(ts) AS INT) AS n_tokens,
        CAST(length(text) AS INT) AS len_chars,
        CAST(len(list_distinct(ts)) AS INT) AS n_distinct_tokens,
        CAST(len(list_filter(ts, t -> ${orChain("t", stopwords)})) AS INT) AS n_stopwords
        FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS ts FROM documents) t
        ORDER BY doc_id""")),

    // ---- quality scoring: ratios are element-wise double division (exact)
    QueryDef(
      "q32_text_quality",
      (s, d) => Tables.documents(s, d)
        .withColumn("ts", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"),
          (length(regexp_replace(col("text"), "[^.!?,;:]", "")).cast("double") /
            length(col("text"))).as("punct_ratio"),
          (expr(s"size(filter(ts, t -> ${orChain("t", stopwords)}))").cast("double") /
            size(col("ts"))).as("stopword_ratio"),
          (size(array_distinct(col("ts"))).cast("double") / size(col("ts"))).as("ttr"),
          (length(col("text")).cast("double") / size(col("ts"))).as("chars_per_token"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
        CAST(len(list_filter(ts, t -> ${orChain("t", stopwords)})) AS DOUBLE) / len(ts) AS stopword_ratio,
        CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) AS ttr,
        CAST(length(text) AS DOUBLE) / len(ts) AS chars_per_token
        FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS ts FROM documents) t
        ORDER BY doc_id""")),

    // ---- language ID by marker-stopword voting, deterministic tiebreak
    QueryDef(
      "q33_lang_id",
      (s, d) => {
        val withCounts = langMarkers.foldLeft(
          Tables.documents(s, d).withColumn("ts", split(trim(col("text")), "\\s+"))) {
          case (df, (lang, words)) =>
            df.withColumn(s"c_$lang",
              expr(s"size(filter(ts, t -> ${orChain("t", words)}))"))
        }
        withCounts.select(col("doc_id"), col("lang").as("lang_labeled"),
          col("c_en"), col("c_es"), col("c_fr"), col("c_de"),
          when(col("c_en") >= col("c_es") && col("c_en") >= col("c_fr") &&
               col("c_en") >= col("c_de") && col("c_en") > 0, "en")
            .when(col("c_es") >= col("c_fr") && col("c_es") >= col("c_de") &&
                  col("c_es") > 0, "es")
            .when(col("c_fr") >= col("c_de") && col("c_fr") > 0, "fr")
            .when(col("c_de") > 0, "de")
            .otherwise("und").as("lang_pred"))
          .orderBy("doc_id")
      },
      Some {
        val counts = langMarkers.map { case (lang, words) =>
          s"CAST(len(list_filter(ts, t -> ${orChain("t", words)})) AS INT) AS c_$lang"
        }.mkString(", ")
        s"""SELECT doc_id, lang_labeled, c_en, c_es, c_fr, c_de,
          CASE WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de AND c_en > 0 THEN 'en'
               WHEN c_es >= c_fr AND c_es >= c_de AND c_es > 0 THEN 'es'
               WHEN c_fr >= c_de AND c_fr > 0 THEN 'fr'
               WHEN c_de > 0 THEN 'de'
               ELSE 'und' END AS lang_pred
          FROM (SELECT doc_id, lang AS lang_labeled, $counts
            FROM (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS ts FROM documents) t0) t
          ORDER BY doc_id"""
      }),

    // ---- BPE-ish regex tokenization (subword-style token counting)
    QueryDef(
      "q69_bpe_tokens",
      (s, d) => {
        val pat = "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_bpe_tokens"),
            size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"))
          .withColumn("tokens_per_word",
            col("n_bpe_tokens").cast("double") / col("n_ws_tokens"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, n_bpe_tokens, n_ws_tokens,
        CAST(n_bpe_tokens AS DOUBLE) / n_ws_tokens AS tokens_per_word
        FROM (SELECT doc_id,
          CAST(len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+')) AS INT) AS n_bpe_tokens,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_ws_tokens
          FROM documents) t ORDER BY doc_id""")),

    // ---- winnowing fingerprints (k-gram window-min — the standard
    //      rolling-hash document fingerprint). Shaped as
    //      posexplode → window-min → distinct agg so each k-gram hashes
    //      exactly once (the inlined nested-array form is O(len²) md5
    //      per doc after projection collapse — same trap as q36).
    QueryDef(
      "q70_winnowing",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(0, 3)
        val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
        Tables.fanOut(Tables.documents(s, d))
          .select(col("doc_id"),
            posexplode(expr(
              "transform(sequence(1, greatest(length(text) - 7, 1)), i -> md5(substring(text, i, 8)))")))
          .withColumnRenamed("col", "h")
          .withColumn("nk", count(lit(1)).over(wc))
          .withColumn("fp", min(col("h")).over(w))
          .filter(col("pos") <= col("nk") - 4) // full 4-hash windows only
          .groupBy("doc_id")
          .agg(max(col("nk")).as("n_kgrams"),
            countDistinct(col("fp")).as("n_fingerprints"),
            concat_ws(",", slice(sort_array(collect_set(col("fp"))), 1, 3)).as("sample3"))
          .orderBy("doc_id")
      },
      Some("""WITH kg AS (SELECT doc_id, i, md5(substr(text, i, 8)) AS h
          FROM (SELECT doc_id, text,
            unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i FROM documents) t),
        win AS (SELECT doc_id, i,
            min(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
            count(*) OVER (PARTITION BY doc_id) AS nk,
            row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS pos
          FROM kg)
        SELECT doc_id, max(nk) AS n_kgrams,
          count(DISTINCT fp) AS n_fingerprints,
          array_to_string((list_sort(list(DISTINCT fp)))[1:3], ',') AS sample3
        FROM win WHERE pos <= nk - 4
        GROUP BY doc_id ORDER BY doc_id""")),

    // ---- document fingerprinting (whitespace-normalized content hash)
    QueryDef(
      "q34_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fingerprint"),
          substring(md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))), 1, 8).as("short_fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint,
        substr(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 8) AS short_fp
        FROM documents ORDER BY doc_id"""))
  )
}
