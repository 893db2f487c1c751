package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterated BPE tokenizer training (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units") — the T-round
  * extension of q123's single merge-pair count: each round counts
  * corpus-weighted adjacent symbol pairs over the VOCABULARY (distinct
  * words × frequency, never corpus tokens), picks the top pair, applies
  * the merge to every word's symbol sequence, and repeats on the merged
  * state. This is the actual training loop a tokenizer ships from;
  * q123 is its first iteration.
  *
  * Iteration on Spark (the q106/KMeans lesson): each round's vocabulary
  * frame is PINNED (localCheckpoint) before the next round references
  * it, so round t's plan is the same fixed-size template as round 1's —
  * never a t-deep lineage re-executing every earlier round per action.
  * The chosen pair is a ONE-ROW frame broadcast-crossed onto the
  * vocabulary (the scalar-attach shape), keeping the whole loop
  * declarative: no driver-side collect of anything but the pin.
  *
  * Exact cross-engine merge application with zero UDFs: a word's symbol
  * sequence is carried as a string with TWO spaces between symbols and
  * at both ends ("␣␣h␣␣e␣␣y␣␣"). Merging pair (a, b) is then the plain
  * string replace of "␣a␣␣b␣" with "␣ab␣" — each match consumes one
  * space from each flanking boundary and the replacement restores it,
  * so the two-space invariant survives and ADJACENT matches never
  * contend for a shared separator (the classic single-space encoding
  * breaks on runs: "a a a" under merge (a,a)). Leftmost
  * non-overlapping replace — identical semantics in Spark and DuckDB —
  * is exactly BPE's greedy left-to-right merge order. Symbols never
  * contain whitespace (words come from a \s+ split), so the encoding
  * is unambiguous.
  *
  * Scale: the state is vocabulary-sized (distinct words), shrinking as
  * merges apply — at 100 TB the words agg is the only corpus-sized
  * shuffle, done ONCE before round 1; each round then touches only the
  * vocabulary frame (pair explode is O(vocab × word-length)), and the
  * best-pair reduce is a 1-row TakeOrdered. T rounds = T vocabulary
  * passes, the irreducible cost of BPE training.
  */
object BpeTrain {

  private[operators] val Rounds = 3

  /** Merge rounds for the corpus-encode query (q129): more than q125's
    * training pin so the applied merge table is non-trivial, still a
    * constant (a tokenizer's merge budget never scales with the data). */
  private[graft] val EncodeRounds = 6

  /** A word's double-spaced character sequence ("hey" → "␣␣h␣␣e␣␣y␣␣"). */
  private val seqFromWord =
    concat(lit("  "),
      concat_ws("  ",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")),
      lit("  ")).as("seq")

  /** Word-keyed vocabulary: (word, seq, wf) — distinct lowercased words
    * with corpus frequency and the initial symbol sequence. The ONE
    * corpus-sized aggregation both training and encode share. */
  private[graft] def wordVocab(s: SparkSession, d: String): DataFrame =
    // fanned out: the word explode + per-word double-spaced sequence
    // build over a one-split scan otherwise single-tasks the shared
    // vocabulary job every BPE query pays (the shingleSets lesson)
    Tables.fanOut(Tables.documents(s, d))
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wf"))
      .select(col("word"), seqFromWord, col("wf"))

  /** Vocabulary as (seq, wf) — the training-loop state shape. */
  private[graft] def vocab0(s: SparkSession, d: String): DataFrame =
    wordVocab(s, d).select("seq", "wf")

  /** One round's weighted adjacent-pair counts over a vocab state. */
  private[graft] def pairCounts(state: DataFrame): DataFrame =
    state
      .select(col("wf"), split(trim(col("seq")), "  ").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("wf"), explode(expr(
        "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS a, syms[i] AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("wf")).as("n"))

  /** T pinned merge rounds; returns each round's (best-pair frame,
    * post-merge vocabulary state) — both pinned, so the spec can assert
    * the per-round plan template stays constant-size. */
  private[graft] def trainRounds(
      s: SparkSession, d: String, rounds: Int): Seq[(DataFrame, DataFrame)] =
    trainRoundsFrom(vocab0(s, d).localCheckpoint(), rounds)

  /** The training loop over an already-pinned (seq, wf) state — split
    * out so encode (q129) can share one vocabulary materialization
    * between training and merge application. */
  private[graft] def trainRoundsFrom(
      state0: DataFrame, rounds: Int): Seq[(DataFrame, DataFrame)] = {
    var state = state0
    (1 to rounds).map { _ =>
      // deterministic winner: count desc, then (a, b) lexicographic —
      // equivalent to ordering by the "a b" merge string since symbols
      // contain no spaces
      val best = pairCounts(state)
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1)
        .localCheckpoint()
      state = state.crossJoin(broadcast(best))
        .select(
          expr("replace(seq, concat(' ', a, '  ', b, ' '), concat(' ', a, b, ' '))").as("seq"),
          col("wf"))
        .localCheckpoint()
      (best, state)
    }
  }

  /** (round, pair, n) — the learned merge table, the artifact a
    * trained tokenizer IS. */
  private[graft] def train(s: SparkSession, d: String, rounds: Int): DataFrame =
    trainRounds(s, d, rounds).zipWithIndex.map { case ((best, _), i) =>
      best.select(lit(i + 1).as("round"),
        concat(col("a"), lit(" "), col("b")).as("pair"), col("n"))
    }.reduce(_.unionByName(_)).orderBy("round")

  /** Corpus encode with the learned merges — the serving half of the
    * tokenizer q125 trains. Trains `rounds` merges, applies them IN
    * RANK ORDER to the word-keyed vocabulary (the same double-spaced
    * replace as training: greedy leftmost, exactly BPE's merge order),
    * then prices every document by one broadcast join of its words
    * against the encoded vocabulary.
    *
    * Scale shape: the corpus is touched exactly twice — once to build
    * the word vocabulary (shared with training via ONE pin), once to
    * re-join words to their token counts. The T-round apply chain runs
    * over the vocabulary only (distinct words — bounded for natural
    * language, never corpus-sized), and the encoded vocabulary
    * broadcasts: a 100 TB corpus encodes with zero extra shuffles. */
  private[graft] def encodeCorpus(
      s: SparkSession, d: String, rounds: Int): DataFrame = {
    val vocabW = wordVocab(s, d).localCheckpoint()
    val merges = trainRoundsFrom(vocabW.select("seq", "wf"), rounds).map(_._1)
    var st = vocabW.select(col("word"), col("seq"))
    merges.foreach { best =>
      st = st.crossJoin(broadcast(best))
        .select(col("word"),
          expr("replace(seq, concat(' ', a, '  ', b, ' '), concat(' ', a, b, ' '))").as("seq"))
    }
    val enc = st.select(col("word"),
      size(split(trim(col("seq")), "  ")).cast("long").as("n_sub"))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(enc), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Shared oracle prologue: vocabulary + w0 training state. */
  private val initCtes =
    s"""WITH words AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word FROM documents),
      wfr AS (SELECT word, count(*) AS wf FROM words WHERE word <> '' GROUP BY word),
      w0 AS (SELECT '  ' || array_to_string(
          list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)), '  ') || '  ' AS seq,
          wf FROM wfr)"""

  /** The unrolled training rounds: s/p/b/w CTEs per round. */
  private def trainCtes(rounds: Int): String =
    (1 to rounds).map { t =>
      s""",
      s$t AS (SELECT string_split(trim(seq), '  ') AS syms, wf FROM w${t - 1}),
      p$t AS (SELECT syms[i] AS a, syms[i + 1] AS b, sum(wf) AS n
        FROM s$t, unnest(range(1, len(syms))) AS u(i)
        WHERE len(syms) >= 2 GROUP BY 1, 2),
      b$t AS (SELECT a, b, n FROM p$t ORDER BY n DESC, a, b LIMIT 1),
      w$t AS (SELECT replace(seq, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS seq, wf
        FROM w${t - 1}, b$t)"""
    }.mkString

  /** The unrolled-T oracle: identical round template, w0 = vocab. */
  private def oracleSql(rounds: Int): String = {
    val rows = (1 to rounds)
      .map(t => s"SELECT $t AS round, a || ' ' || b AS pair, CAST(n AS BIGINT) AS n FROM b$t")
      .mkString("\n        UNION ALL ")
    s"""$initCtes${trainCtes(rounds)}
      SELECT round, pair, n FROM (
        $rows) m ORDER BY round"""
  }

  /** q129's oracle: the training CTEs produce b1..bT, then a word-keyed
    * apply chain e0..eT replays the same replaces, and every document
    * is priced by joining its words to the encoded vocabulary. */
  private def encodeOracleSql(rounds: Int): String = {
    val applyCtes = (1 to rounds).map { t =>
      s""",
      e$t AS (SELECT word, replace(seq, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ') AS seq
        FROM e${t - 1}, b$t)"""
    }.mkString
    s"""$initCtes${trainCtes(rounds)},
      e0 AS (SELECT word, '  ' || array_to_string(
          list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)), '  ') || '  ' AS seq
        FROM wfr)$applyCtes,
      enc AS (SELECT word, CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS n_sub
        FROM e$rounds),
      dw AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        CAST(sum(n_sub) AS BIGINT) AS n_tokens
      FROM dw JOIN enc USING (word)
      WHERE word <> ''
      GROUP BY doc_id ORDER BY doc_id"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q125_bpe_train_iterated",
      (s, d) => train(s, d, Rounds),
      Some(oracleSql(Rounds)),
      doc = s"iterated BPE training: $Rounds pinned merge rounds (count pairs -> pick best -> re-segment vocabulary), learned merge table out"),
    QueryDef(
      "q129_bpe_encode_corpus",
      (s, d) => encodeCorpus(s, d, EncodeRounds),
      Some(encodeOracleSql(EncodeRounds)),
      doc = s"corpus BPE encode: train $EncodeRounds merges, apply in rank order to the word vocabulary, price every doc via one broadcast vocab join — per-doc word and BPE token counts"))
}
