package graft.operators

import graft.state.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

/** Persisted LSH corpus index for INCREMENTAL deduplication — the
  * new-batch-vs-corpus flow a crawl pipeline runs continuously
  * (reference analogue: the db.json ledger that makes re-runs
  * incremental, etl.js:14-19, applied to the dedup family).
  *
  * Two ledgers under one index directory, both written through
  * [[StateStore]]'s crash-atomic generation protocol (tmp write →
  * `_SUCCESS` commit point → rename swap), so a crash mid-refresh can
  * never tear the index or roll it back silently:
  *
  *  - `shingles/` — (doc_id, sd): the deduplicated 3-gram shingle sets,
  *    the verification side of the index. Bucketed by doc_id so the
  *    Jaccard-verify join shuffles only the (small) candidate set.
  *  - `sigs/` — (doc_id, sig): the 8-lane MinHash signatures, the
  *    candidate-generation side. Band keys are re-derived from `sig` at
  *    load time — 4 md5 calls per doc over an 8-element array, pennies
  *    next to re-tokenizing text — so the index stays narrow on disk.
  *
  * Scale: [[build]] tokenizes the corpus ONCE (one job writes the
  * shingle ledger; the signature job reads those persisted blocks, not
  * the text). [[dedupBatch]] touches corpus TEXT never and corpus
  * parquet only through the two ledgers: an incoming batch hashes its
  * own documents, equi-joins |batch|-sized band lists against the
  * stored signatures, and Jaccard-verifies only band-collision
  * candidates — corpus×corpus pairs are never generated, and the
  * per-new-doc best-match window partitions by new_id (no global
  * window). At 100 TB the ledgers are the only thing that needs to be
  * hot; the raw text stays cold.
  *
  * DedupIndexSpec proves the restart contract: an index built in one
  * session serves a batch in a brand-new session with ZERO corpus
  * re-tokenization (the executed plan scans the index ledgers, not the
  * corpus source).
  */
object DedupIndex {

  val sigSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(StringType))))
  val setsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sd", ArrayType(StringType))))

  def sigsPath(dir: String): String = s"$dir/sigs"
  def shinglesPath(dir: String): String = s"$dir/shingles"

  /** Build (or atomically refresh) the index from a (doc_id, text)
    * corpus frame. One tokenize pass: the signature job reads the
    * freshly-persisted shingle ledger, never the text again. */
  def build(spark: SparkSession, corpus: DataFrame, dir: String): Unit = {
    StateStore.save(DedupQueries.shingleSetsOf(corpus), shinglesPath(dir),
      bucketCols = Seq("doc_id"))
    val sets = StateStore.load(spark, shinglesPath(dir), setsSchema)
    StateStore.save(DedupQueries.minhashFrom(sets), sigsPath(dir),
      bucketCols = Seq("doc_id"))
  }

  /** Dedup an incoming (doc_id, text) batch against the persisted
    * index: LSH band candidates → n-gram Jaccard ≥ `minJaccard` →
    * best corpus match per new doc (highest jaccard, min-id tiebreak).
    * Output: (new_id, dup_of, jaccard), ordered by new_id.
    *
    * The batch side is materialized once (localCheckpoint): its shingle
    * sets feed both the signature/band derivation and the verify join,
    * and the corpus side comes exclusively from the two ledgers. */
  def dedupBatch(spark: SparkSession, batch: DataFrame, dir: String,
      minJaccard: Double = 0.5): DataFrame = {
    val corpusSigs = StateStore.load(spark, sigsPath(dir), sigSchema)
    val corpusSets = StateStore.load(spark, shinglesPath(dir), setsSchema)
    val batchSets = DedupQueries.shingleSetsOf(batch).localCheckpoint()
    val batchSigs = DedupQueries.minhashFrom(batchSets)
    val newB = DedupQueries.bandKeys(batchSigs)
      .select(col("doc_id").as("new_id"), col("band"))
    val corpusB = DedupQueries.bandKeys(corpusSigs)
      .select(col("doc_id").as("corpus_id"), col("band"))
    val cand = newB.join(corpusB, Seq("band"))
      .select("new_id", "corpus_id").distinct()
    val inter = size(array_intersect(col("sa"), col("sb")))
    cand
      .join(batchSets.select(col("doc_id").as("new_id"), col("sd").as("sa")), Seq("new_id"))
      .join(corpusSets.select(col("doc_id").as("corpus_id"), col("sd").as("sb")), Seq("corpus_id"))
      .withColumn("jaccard",
        inter.cast("double") / (size(col("sa")) + size(col("sb")) - inter))
      .filter(col("jaccard") >= minJaccard)
      .withColumn("rn", row_number().over(
        Window.partitionBy("new_id")
          .orderBy(col("jaccard").desc, col("corpus_id").asc)))
      .filter(col("rn") === 1)
      .select(col("new_id"), col("corpus_id").as("dup_of"), col("jaccard"))
      .orderBy("new_id")
  }
}
