package graft

import graft.operators.ProductQuantization
import graft.streaming.AnnServeStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch agreement for the serving-tier ANN twin: raw query
  * vectors fed as micro-batches through [[AnnServeStream]] against a
  * static PQ index must reproduce the q126 shortlist EXACTLY —
  * same (query_id, rank, vec_id, adc_dist, l2) rows — because both
  * run the one shared [[ProductQuantization.serve]] path and all
  * distances are integer arithmetic. */
class AnnServeStreamSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.01"

  test("streamed micro-batches reproduce the q126 shortlist row-for-row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    try {
      val idx = ProductQuantization.buildIndex(spark, sf)
      // the batch answer: q126's serving columns (its audit columns
      // price recall, not serving — the stream serves)
      val batchRows = SparkEntry.queries("q126_ann_pq_adc")(spark, sf)
        .select("query_id", "rank", "vec_id", "adc_dist", "l2")
        .collect().map(_.toSeq.toList).toSet
      assert(batchRows.nonEmpty)
      // q126's probe set, RAW (the stream quantizes at the edge via
      // the index's broadcast grid stats)
      val probes = Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 100 === 0)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      assert(probes.length >= 4, "need enough probes to split across micro-batches")
      val mem = MemoryStream[(Long, Seq[Double])]
      val stream = mem.toDF().toDF("vec_id", "embedding")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-annserve-ckpt").toString
      val sink = scala.collection.mutable.ArrayBuffer.empty[List[Any]]
      // regression (r20 verdict #1): start() must not leak the serving
      // confs into the caller's (JVM-wide, shared) session — the leak
      // flipped AQE coalescing off for every suite that ran after this
      // one and broke all 24 PlanSnapshotSpec rows in suite order
      val leakKeys = Seq(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "spark.sql.adaptive.coalescePartitions.enabled")
      val confsBefore = leakKeys.map(k => spark.conf.getOption(k))
      val streamConfs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      val q = AnnServeStream.start(stream, idx, ckpt) { (res, _) =>
        // the stream's cloned session must have KEPT the serving confs
        streamConfs += leakKeys.map(k => res.sparkSession.conf.get(k))
        sink ++= res.collect().map(_.toSeq.toList)
      }
      assert(leakKeys.map(k => spark.conf.getOption(k)) == confsBefore,
        "AnnServeStream.start leaked serving confs into the caller session")
      try {
        // two micro-batches: agreement must hold across batch splits,
        // not just for one batch containing every query
        val (first, rest) = probes.splitAt(2)
        mem.addData(first.toSeq)
        q.processAllAvailable()
        val afterB0 = sink.size
        assert(afterB0 > 0, "first micro-batch served nothing")
        mem.addData(rest.toSeq)
        q.processAllAvailable()
        assert(sink.size > afterB0, "second micro-batch served nothing")
        assert(sink.toSet == batchRows,
          s"stream/batch divergence: stream-only=${(sink.toSet -- batchRows).take(3)} " +
            s"batch-only=${(batchRows -- sink.toSet).take(3)}")
        // and no row arrived twice (each query answered in exactly one batch)
        assert(sink.size == batchRows.size, "duplicate rows across micro-batches")
        assert(streamConfs.nonEmpty &&
            streamConfs.forall(_ == Seq("4096", "false")),
          s"stream session lost the serving confs: $streamConfs")
      } finally q.stop()
    } finally SparkEntry.releaseCaches(spark)
  }

  test("serving is replay-deterministic: same queries + same index => identical answers") {
    try {
      val idx = ProductQuantization.buildIndex(spark, sf)
      val queries = Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 100 === 0)
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint()
      def run(): Set[List[Any]] =
        AnnServeStream.serveBatch(queries, idx).collect().map(_.toSeq.toList).toSet
      val a = run()
      val b = run()
      assert(a.nonEmpty && a == b, "replayed serving batch differs")
    } finally SparkEntry.releaseCaches(spark)
  }
}
