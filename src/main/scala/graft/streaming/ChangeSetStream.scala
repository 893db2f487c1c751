package graft.streaming

import graft.sinks.HttpSink.{HttpRequest, RateLimitedWriter, RetryPolicy, Transport}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming change-set shipper — the streaming twin of
  * [[graft.sinks.HttpSink.writeChangeSet]] / `EtlMain.sendPhase`,
  * closing the loop between §2.10 streaming and the S11/S12 connector
  * tier: a stream of rendered request rows (key columns + `method`,
  * `url`, `body`) is shipped through ONE rate-limited writer per
  * micro-batch.
  *
  * Idempotence across restarts: Structured Streaming replays the
  * in-flight micro-batch after a failure, so each batch first
  * anti-joins an *applied-key ledger* and only sends rows whose key is
  * absent — the reference's `store.get` guard before every mutation
  * (etl.js:41-59) in streaming form. Only 2xx responses admit their
  * keys, so an unacknowledged write stays eligible for the replay,
  * mirroring EtlMain's acked-only resume.
  *
  * The ledger IS [[graft.state.StateStore]]'s durable generation store
  * — the same atomic rename swap + crash recovery the batch ledgers
  * use, so batch and streaming restarts share one durability
  * mechanism: a crash mid-commit can never read back as an empty
  * ledger (which would re-send every acknowledged mutation). Each
  * batch rewrites the ledger generation rather than appending files;
  * the ledger is applied-keys-sized — bounded by what the rate-limited
  * endpoint has ever absorbed — and the write is parallel and bucketed
  * by key, so the rewrite stays cheap relative to the sends it guards.
  *
  * 100 TB posture: the expensive derivation upstream (diffing desired
  * state, rendering request bodies) stays a parallel streaming plan;
  * only the change set — bounded by the endpoint's rate limit, exactly
  * the rows the reference serializes one-by-one — reaches the driver.
  * The ledger anti-join broadcasts when small and shuffles when not;
  * the per-batch collect is bounded by what a rate-limited API can
  * absorb in a trigger interval (~0.33 req/s at the reference's
  * pacing), never by corpus size.
  */
object ChangeSetStream {

  /** @param changes   streaming frame: `keyCols ++ (method, url, body)`
    * @param ledgerDir parquet dir holding the applied keys (created on
    *                  first acknowledged batch)
    * @param sleeper   injectable for tests (virtual time)
    * @return the started query; callers own its lifecycle
    *         (`processAllAvailable`/`awaitTermination` + `stop`) */
  def ship(
      changes: DataFrame,
      transport: Transport,
      ledgerDir: String,
      keyCols: Seq[String],
      policy: RetryPolicy = RetryPolicy(),
      checkpointDir: Option[String] = None,
      sleeper: Long => Unit = Thread.sleep): StreamingQuery = {
    val writer = changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        shipBatch(batch, transport, ledgerDir, keyCols, policy, sleeper)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** One micro-batch: ledger guard → ordered send → ack append. Also
    * the batch-mode building block (a replayed batch IS a batch job). */
  def shipBatch(
      batch: DataFrame,
      transport: Transport,
      ledgerDir: String,
      keyCols: Seq[String],
      policy: RetryPolicy = RetryPolicy(),
      sleeper: Long => Unit = Thread.sleep): Unit = {
    val spark = batch.sparkSession
    val keySchema = org.apache.spark.sql.types.StructType(
      batch.select(keyCols.map(col): _*).schema.fields)
    val applied = graft.state.StateStore.load(spark, ledgerDir, keySchema)
    val rows = batch
      .join(applied, keyCols, "left_anti")
      .select((keyCols ++ Seq("method", "url", "body")).map(col): _*)
      .orderBy(keyCols.map(col): _*) // deterministic send order (entity, field)
      .collect()
    if (rows.nonEmpty) {
      val k = keyCols.length
      val writer = new RateLimitedWriter(transport, policy, sleeper)
      val (pairs, _) = writer.sendAll(rows.iterator.map(r =>
        HttpRequest(r.getString(k), r.getString(k + 1), r.getString(k + 2))))
      // sendAll is strictly 1:1 with its input, so acked keys align by
      // position with the collected rows
      val acked = rows.zip(pairs).collect {
        case (row, (_, resp)) if resp.status >= 200 && resp.status < 300 =>
          org.apache.spark.sql.Row.fromSeq((0 until k).map(row.getString))
      }
      if (acked.nonEmpty) {
        val ackedDf = spark.createDataFrame(
          spark.sparkContext.parallelize(acked.toSeq, 1), keySchema)
        // next generation = loaded ledger ∪ this batch's acks, through
        // the same atomic swap the batch ledgers use (self-overwrite of
        // `applied`'s source is safe: the temp write materializes fully
        // before the swap touches the path)
        graft.state.StateStore.save(
          applied.unionByName(ackedDf), ledgerDir, bucketCols = keyCols)
      }
    }
  }
}
