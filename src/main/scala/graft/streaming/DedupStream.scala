package graft.streaming

import graft.operators.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static incremental dedup — the streaming twin of
  * q102_incremental_dedup: documents arrive as a stream, the corpus
  * LSH band index is a STATIC frame (in production: the persisted
  * signature index the batch pipeline maintains), and collisions come
  * from Structured Streaming's stream-static equi join.
  *
  * A stream-static join is STATELESS on the stream side — no
  * watermark, no state store, no growing memory: each micro-batch
  * derives its rows' band keys with per-row expressions
  * ([[DedupQueries.rowBands]], bit-for-bit the batch hash family) and
  * probes the static index, which Spark plans per micro-batch exactly
  * like the batch join (broadcast when the index is small, shuffle
  * when not).
  *
  * Scale: the stream side only ever hashes its own micro-batch; the
  * corpus index is loaded once per batch from its (checkpointed /
  * parquet) form. This is the ingest-time flavor of q102's
  * batch flow — flag an arriving doc the moment a band collides, defer
  * the exact Jaccard verify to the batch pass if needed.
  */
object DedupStream {

  /** Collision flags: one row per (arriving doc, corpus doc, band)
    * band collision. Downstream consumers dedup/aggregate as their
    * sink requires (a streaming `distinct` would need state; the raw
    * collision stream is the stateless, replay-safe form). */
  def flagAgainstCorpus(stream: DataFrame, corpusBands: DataFrame): DataFrame =
    DedupQueries.rowBands(stream)
      .join(corpusBands.select(col("doc_id").as("dup_of"), col("band")), Seq("band"))
      .select(col("doc_id"), col("dup_of"), col("band"))
}
