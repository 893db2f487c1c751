package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming twins of the curation battery
  * ([[graft.operators.CurationQueries]]): the same per-row flag
  * expressions wired behind `readStream`, so an ingest pipeline curates
  * documents as they arrive instead of re-scanning the corpus.
  *
  * Everything here is deliberately STATELESS per micro-batch except the
  * dedup horizon:
  *  - quality/repetition flags are per-row codegen'd array exprs
  *    (identical Columns to q88/q91 — stream/batch agreement is by
  *    construction, and the spec proves it);
  *  - decontamination joins each row against the benchmark shingle set
  *    as a broadcast literal (eval sets are KBs; shipping them with the
  *    job is exactly what production does);
  *  - exact dedup uses `dropDuplicatesWithinWatermark` on an ingest-
  *    time watermark: state holds ONE fingerprint per doc within the
  *    horizon and is evicted as processing time advances. Corpus-wide
  *    exact dedup is inherently a batch job over full history (q35);
  *    a stream can only honestly dedup within a bounded horizon — the
  *    round-1 lesson: an unwatermarked `dropDuplicates` never evicts.
  */
object CurationStreaming {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(path)

  /** Per-row curation flags — the q91 stage ladder minus the (batch)
    * dedup/sample stages, plus q88's repetition fraction. Stateless. */
  def curateFlags(docs: DataFrame): DataFrame =
    docs
      .withColumn("ts_arr", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("lang_ok", col("lang").isin("en", "es", "fr", "de"))
      .withColumn("qual_ok", col("lang_ok") && size(col("ts_arr")) >= 20 &&
        size(array_distinct(col("ts_arr"))).cast("double") / size(col("ts_arr")) >= 0.3)
      .withColumn("dup_bigram_frac",
        when(size(col("ts_arr")) >= 2,
          lit(1.0) - size(array_distinct(expr(
            "transform(sequence(0, size(ts_arr) - 2), i -> concat_ws(' ', ts_arr[i], ts_arr[i+1]))")))
            .cast("double") /
            (size(col("ts_arr")) - 1)).otherwise(lit(0.0)))
      .select("doc_id", "lang", "source", "lang_ok", "qual_ok", "dup_bigram_frac")

  /** Contamination flag against a broadcast benchmark shingle set
    * (q87's semantics, stateless streaming form): a doc is contaminated
    * iff any of its 3-gram shingles is in the benchmark set. */
  def decontaminate(docs: DataFrame, benchShingles: Seq[String]): DataFrame =
    docs
      .withColumn("ts_arr", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("sh", when(size(col("ts_arr")) >= 3, expr(
        "transform(sequence(0, size(ts_arr) - 3), i -> concat_ws(' ', ts_arr[i], ts_arr[i+1], ts_arr[i+2]))"))
        .otherwise(array()))
      .withColumn("contaminated",
        arrays_overlap(col("sh"), typedLit(benchShingles)).cast("int"))
      .select("doc_id", "contaminated")

  /** Exact content dedup within a bounded ingest-time horizon. */
  def dedupWithinHorizon(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))))
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("fp"))
      .select("doc_id", "fp")

  /** Drive a streaming frame into a memory sink to completion. Fails
    * loudly on timeout (a partially-populated memory table is a flaky
    * spec, not a pass) and always stops the query so it never leaks
    * into the shared session. */
  def runToMemory(df: DataFrame, name: String, mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(120000), s"stream $name timed out")
    finally q.stop()
  }
}
