package graft

import graft.operators.DedupQueries
import graft.streaming.DedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static incremental dedup: per-row band derivation must be
  * bit-for-bit the batch pipeline's, and the stream-static join must
  * flag exactly the batch candidate pairs. */
class DedupStreamSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("rowBands equals the batch explode-agg banding bit-for-bit") {
    try {
      val batch = DedupQueries.bandKeys(DedupQueries.sigIndex(spark, sf))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val perRow = DedupQueries.rowBands(DedupQueries.variantCorpus(spark, sf))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(perRow == batch)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("stream-static join flags exactly the batch new-vs-corpus collisions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // static corpus index: the originals' bands (what production keeps
    // persisted); the variants play the arriving stream
    val corpus = DedupQueries.variantCorpus(spark, sf)
      .filter(col("doc_id") < 1000000L)
    val arriving = DedupQueries.variantCorpus(spark, sf)
      .filter(col("doc_id") >= 1000000L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpusBands = DedupQueries.rowBands(corpus).localCheckpoint()

    val expected = DedupQueries.rowBands(
        spark.createDataFrame(arriving.toSeq).toDF("doc_id", "text"))
      .join(corpusBands.select(col("doc_id").as("dup_of"), col("band")), Seq("band"))
      .select("doc_id", "dup_of").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty) // the variant corpus guarantees near-dups

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = DedupStream.flagAgainstCorpus(stream, corpusBands)
      .writeStream.format("memory").queryName("dedup_flags")
      .outputMode("append").start()
    try {
      // two micro-batches: collisions must accumulate exactly, no state
      val (first, second) = arriving.splitAt(arriving.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("dedup_flags")
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      q.stop()
      SparkEntry.releaseCaches(spark)
    }
  }
}
