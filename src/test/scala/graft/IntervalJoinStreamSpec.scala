package graft

import graft.streaming.IntervalJoinStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join: the streaming result must equal the
  * batch range join over the same events — pairs accumulate exactly
  * once across micro-batches (the exploded error bins may not
  * duplicate a pair), and late-but-inside-watermark rows still join. */
class IntervalJoinStreamSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("streaming pairs equal the batch range join, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = Tables.events(spark, sf)
      .select("event_id", "ts", "event_type")
      .orderBy("ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))

    val expected = {
      val ev = Tables.events(spark, sf)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("ts").as("error_ts"))
      errors.join(clicks,
          col("click_ts") >= col("error_ts") - expr("INTERVAL 3600 SECONDS") &&
            col("click_ts") < col("error_ts"))
        .select("error_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(expected.nonEmpty)

    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val stream = mem.toDF().toDF("event_id", "ts", "event_type")
    val q = IntervalJoinStream.clicksBeforeErrors(stream, gapSeconds = 3600)
      .writeStream.format("memory").queryName("interval_pairs")
      .outputMode("append").start()
    try {
      // three micro-batches in event-time order: pairs spanning a batch
      // boundary must still join (both sides buffered within watermark)
      events.grouped(math.max(1, events.length / 3)).foreach { g =>
        mem.addData(g.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val got = spark.table("interval_pairs")
        .select("error_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length, "a pair was emitted twice")
      assert(got.toSet == expected)
    } finally {
      q.stop()
      SparkEntry.releaseCaches(spark)
    }
  }
}
