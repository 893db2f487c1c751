package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM time-interval join — the ingest-time twin
  * of q108's binned interval join (clicks that happened in the 60 s
  * before each error), completing the streaming tier's join ladder:
  * stream-static (DedupStream), ledger anti-join (ChangeSetStream),
  * and now two live streams joined on time.
  *
  * The same bin trick as the batch form, for a streaming-specific
  * reason on top of the shuffle one: Structured Streaming buffers both
  * sides in the state store and, without an equality key, every
  * arriving row probes the ENTIRE opposite buffer. The 60 s bin is the
  * equality key — each arriving row probes only its bin's slice of
  * state, and the residual range predicate keeps exactness. Watermarks
  * on both sides bound how long a bin's rows stay buffered: state is
  * O(events inside the watermark horizon), evicted as event time
  * advances — the shape that survives an unbounded stream.
  *
  * Errors carry TWO exploded bins (their window spans at most two),
  * clicks their single home bin, so each qualifying (error, click)
  * pair matches exactly once — no post-join dedup, which matters in
  * append mode where a streaming `distinct` would itself need state.
  */
object IntervalJoinStream {

  /** (error_id, error_ts, click_id, click_ts) for every click in the
    * `gapSeconds` before each error. Both inputs are (streaming)
    * frames with the events schema; `delay` is the shared watermark
    * horizon. The bin width EQUALS the gap, which is what keeps every
    * probe window inside at most two bins. */
  def clicksBeforeErrors(events: DataFrame, gapSeconds: Long = 60,
      delay: String = "10 minutes"): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds must be >= 1, got $gapSeconds")
    def bin(c: String) = graft.operators.TimeBins.bin(c, gapSeconds)
    val gap = s"INTERVAL $gapSeconds SECONDS"
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withColumn("bin", bin("click_ts"))
      .withWatermark("click_ts", delay)
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("error_ts"))
      .withColumn("bin", explode(array_distinct(array(
        bin(s"error_ts - $gap"), bin("error_ts")))))
      .withWatermark("error_ts", delay)
    errors.join(clicks,
        errors("bin") === clicks("bin") &&
          col("click_ts") >= col("error_ts") - expr(gap) &&
          col("click_ts") < col("error_ts"),
        "inner")
      .select("error_id", "error_ts", "click_id", "click_ts")
  }
}
