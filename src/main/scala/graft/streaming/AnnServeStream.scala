package graft.streaming

import graft.operators.ProductQuantization
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

/** Serving-tier ANN stream — the streaming twin of q126's PQ/ADC
  * search path, closing the last batch-only family (the dedup, media,
  * curation, funnel, SCD2, and moments tiers all have readStream
  * twins already): query vectors arrive as a stream, the PQ index
  * ([[ProductQuantization.PqIndex]]: byte codes + codebook + int-grid
  * fetch tier + quantizer stats) is STATIC — in production, the
  * parquet/checkpoint artifacts the batch pipeline maintains — and
  * each micro-batch is scored through the IDENTICAL
  * [[ProductQuantization.serve]] path the batch query runs, so
  * stream/batch agreement is by construction (the
  * [[DedupStream]] shared-expression pattern) and AnnServeStreamSpec
  * proves it row-for-row on the q126 shortlist.
  *
  * Why foreachBatch: the serve path needs per-query top-k windows
  * (shortlist + re-rank), which Structured Streaming forbids on an
  * unbounded stream but are exact within a micro-batch — each batch
  * of queries is a complete, independent unit of serving work (a
  * query's answer never spans batches), so running the batch plan
  * per micro-batch loses nothing and keeps the stream stateless: no
  * watermark, no state store, replay-safe (same queries + same index
  * ⇒ bit-identical answers — all-integer ADC/L2 arithmetic).
  *
  * Scale: the micro-batch side carries only its own query vectors
  * (one packed m·256-int LUT array per query — broadcast); the
  * packed-code/grid sides are built ONCE (localCheckpoint-pinned in
  * [[ProductQuantization.PqIndex]]) and scanned per batch — no
  * per-batch index rebuild, no per-batch re-aggregation shuffle
  * (the bounded-heap shortlist's partial state is ≤ Shortlist pairs
  * per query per map task).
  */
object AnnServeStream {

  /** Raw arriving-query schema: (vec_id, embedding) — the same shape
    * the embeddings table ships; vec_id doubles as query_id. */
  val querySchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(DoubleType))))

  /** One micro-batch of serving: quantize the RAW query vectors onto
    * the index's [0,255] grid (same [[ProductQuantization.applyGrid]]
    * expression the corpus went through) and run the shared serve
    * path. Output: (query_id, rank, vec_id, adc_dist, l2), rank ≤ K —
    * exactly q126's shortlist columns. */
  def serveBatch(queries: DataFrame, idx: ProductQuantization.PqIndex): DataFrame = {
    import org.apache.spark.sql.functions.col
    val gridded = ProductQuantization.applyGrid(
        queries.select(col("vec_id"),
          col("embedding").cast("array<double>").as("emb")), idx.stats)
      .select(col("vec_id").as("query_id"), col("qv"))
    ProductQuantization.serve(gridded, idx)
  }

  /** Wire a raw query-vector stream through [[serveBatch]]; `onBatch`
    * receives each micro-batch's answers (the production sink — a
    * response topic, a results table).
    *
    * Sets the two serving-session confs the packed serve path needs
    * (see the comment in [[ProductQuantization.serve]]): the shortlist
    * agg must stay on the object-HASH path past 128 query groups, and
    * AQE's byte-based partition coalescing must not fold the
    * cost-dense heap-merge/re-rank stages into one task (measured 3.9×
    * on the sf1 micro-batch). The confs are scoped to the STREAM's
    * session only: Structured Streaming clones the caller's session
    * for its micro-batches (StreamExecution.sparkSessionForStream —
    * the clone's conf snapshot is LAZY, so setting on the caller
    * around `.start()` races with the clone), and every foreachBatch
    * DataFrame is bound to that clone. Setting the pair on
    * `batch.sparkSession` inside the batch function therefore lands
    * them exactly on the stream-private session, before any serve plan
    * executes, and never touches the caller's session — a shared
    * session (a bench sweep, the JVM-wide test session) keeps its own
    * plan shapes. */
  def start(queryStream: DataFrame, idx: ProductQuantization.PqIndex,
      checkpointDir: String)(onBatch: (DataFrame, Long) => Unit): StreamingQuery = {
    queryStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val conf = batch.sparkSession.conf
        conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        onBatch(serveBatch(batch, idx), batchId)
      }
      .start()
  }
}
