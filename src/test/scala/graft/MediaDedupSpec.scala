package graft

import graft.operators.{Ids, MediaDedupIndex, MultimodalQueries}
import org.apache.spark.sql.functions._

/** Pins for q137's incremental media-dedup ledger that the oracle
  * equality can't see on its own: planted ground truth (every twin's
  * best match IS its own original, exact copies at hamming 0), the
  * modality-keyed join (a twin never matches across modalities), and
  * the restart contract — the batch plan reads the persisted ledger,
  * never the corpus payloads (DedupIndexSpec's pattern on the media
  * tier). */
class MediaDedupSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("q137 matches every planted media twin within its modality at " +
      "the planted hamming bound; exact copies at hamming 0") {
    try {
      val rows = SparkEntry.queries("q137_incremental_media_dedup")(spark, sf)
        .collect()
      val byNew = rows.map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getInt(3)))).toMap
      val ids = Tables.documents(spark, sf).select("doc_id")
        .collect().map(_.getLong(0)).filter(id => id % 3 == 0 || id % 3 == 1)
      ids.foreach { id =>
        val twin = id + Ids.VariantOffset
        assert(byNew.contains(twin), s"twin of $id missing from the ledger match")
        val (modality, dupOf, hamming) = byNew(twin)
        // the twin's own original guarantees a candidate at hamming 0
        // (exact copies) / ≤ 2 (perturbed) — the BEST match can only
        // be at-or-below that bound. Identity of dup_of is not pinned:
        // the synthetic PCM/pixel streams are offset copies of one
        // generator stream, so legitimate hamming-0 collisions between
        // distinct clips exist and the min-id tiebreak may prefer them
        // (the oracle hash-verifies the exact choice).
        assert(dupOf < Ids.VariantOffset, s"twin $twin matched non-corpus item $dupOf")
        assert(modality == (if (id % 3 == 0) "image" else "audio"),
          s"twin $twin tagged $modality")
        assert(dupOf % 3 == id % 3,
          s"twin $twin cross-modality matched $dupOf")
        if (id % 6 == id % 3) assert(hamming == 0,
          s"exact twin $twin at hamming $hamming")
        else assert(hamming <= 2, s"perturbed twin $twin at hamming $hamming")
      }
    } finally SparkEntry.releaseCaches(spark)
  }

  test("the batch plan reads the persisted ledger, never corpus payloads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media-index").toString
    try {
      val docs = Tables.documents(spark, sf)
      val media = MultimodalQueries.imageCorpusWithTwins(docs)
        .unionByName(MultimodalQueries.audioCorpusWithTwins(docs))
      MediaDedupIndex.build(spark, media.filter(col("doc_id") < Ids.VariantOffset), dir)
      val result = MediaDedupIndex.dedupBatch(spark,
        media.filter(col("doc_id") >= Ids.VariantOffset), dir)
      assert(result.count() > 0)
      val plan = result.queryExecution.executedPlan.toString
      assert(plan.contains("media_index"),
        "batch plan does not read the persisted ledger:\n" + plan.take(2000))
      // the corpus side must come exclusively from the ledger: the only
      // decode (ExistingRDD synthesis) in the plan is the batch's own
      val rddScans = plan.linesIterator.count(_.contains("Scan ExistingRDD"))
      assert(rddScans <= 1,
        s"batch plan decodes more than its own payloads ($rddScans RDD scans):\n" +
          plan.take(2000))
    } finally SparkEntry.releaseCaches(spark)
  }
}
