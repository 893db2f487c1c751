package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupIndex, DedupQueries}

/** Pins for the hot-band candidate cap (round 15, reworked round 16):
  * the per-band membership cap in [[DedupQueries.candidatePairsFrom]]
  * that bounds the LSH self-join's per-key fan-out. Round 16 semantics:
  * a band over the cap keeps its min-doc_id REPRESENTATIVE row on the
  * capped side instead of being dropped whole, so an over-cap crowd
  * contributes a linear star of pairs (crowd still clusters, probes
  * never come up empty) rather than m² — or, in the round-15 form,
  * nothing. The q203 oracle cross-checks values against DuckDB; this
  * suite pins the SEMANTICS (capped = cold-band pairs ∪ hot-band rep
  * stars), the PLAN (one rep-keep window, zero added joins, on by
  * default in the production chain), and the incremental wiring
  * (DedupIndex flags a probe of an over-cap crowd against the crowd's
  * representative). */
class CappedLshSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("a non-tripping cap is row-identical to the uncapped join") {
    try {
      val sigs = DedupQueries.sigIndex(spark, sf)
      val uncapped = DedupQueries.candidatePairsFrom(sigs, None).localCheckpoint()
      // fixture band populations top out at 8 at sf0.001 — a cap of
      // 1,000,000 must not change a single row
      val capped = DedupQueries.candidatePairsFrom(sigs, Some(1000000)).localCheckpoint()
      assert(capped.exceptAll(uncapped).count() == 0)
      assert(uncapped.exceptAll(capped).count() == 0)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("a tripping cap keeps cold-band pairs plus each hot band's rep star") {
    try {
      val sigs = DedupQueries.sigIndex(spark, sf)
      val cap = DedupQueries.TrippingBandCap
      val capped = DedupQueries.candidatePairsFrom(sigs, Some(cap)).localCheckpoint()
      val uncapped = DedupQueries.candidatePairsFrom(sigs, None).localCheckpoint()
      // independent derivation of the same contract, written the other
      // way round: explicit per-band count + min aggregates (no window
      // machinery), cold bands pair in full, hot bands contribute only
      // (rep = band min, other member) star edges
      val b = DedupQueries.bandKeys(sigs).localCheckpoint()
      val counts = b.groupBy("band")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("rep"))
      val cold = counts.filter(col("n") <= cap).select("band")
      val coldPairs = b.join(cold, Seq("band"))
        .select(col("doc_id").as("doc_a"), col("band"))
        .join(b.join(cold, Seq("band"))
          .select(col("doc_id").as("doc_b"), col("band")), Seq("band"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
      val hotStars = b
        .join(counts.filter(col("n") > cap).select("band", "rep"), Seq("band"))
        .filter(col("doc_id") =!= col("rep"))
        .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
      val expected = coldPairs.unionByName(hotStars).distinct()
      assert(capped.exceptAll(expected).count() == 0)
      assert(expected.exceptAll(capped).count() == 0)
      // the cap only ever REMOVES pairs (every rep-star pair exists
      // uncapped), and on this fixture it must genuinely trip
      // (otherwise the tripping-regime oracle q203 is testing nothing)
      assert(capped.exceptAll(uncapped).count() == 0)
      val dropped = uncapped.exceptAll(capped).count()
      assert(dropped > 0, s"cap $cap did not trip on the fixture")
      // and the rep stars must be non-empty on this fixture — the
      // round-16 recall property (hot bands still produce pairs)
      assert(hotStars.count() > 0, "fixture has no hot band at the tripping cap")
    } finally SparkEntry.releaseCaches(spark)
  }

  test("the capped plan is one rep-keep window, zero added joins, on by default") {
    try {
      val sigs = DedupQueries.sigIndex(spark, sf)
      val cappedPlan = DedupQueries.candidatePairsFrom(sigs, Some(4))
        .queryExecution.optimizedPlan.toString
      val plainPlan = DedupQueries.candidatePairsFrom(sigs, None)
        .queryExecution.optimizedPlan.toString
      assert(cappedPlan.contains("Window"), cappedPlan)
      assert(cappedPlan.contains("row_number"), cappedPlan)
      val extra = "(?i)join".r.findAllIn(cappedPlan).size -
        "(?i)join".r.findAllIn(plainPlan).size
      assert(extra == 0, s"rep-keep cap must add no joins, added $extra")
      // no explicit cap argument = the production default — the chain
      // q36/q37/q77/q102 actually runs must carry the rep-keep window
      val defaultPlan = DedupQueries.candidatePairsFrom(sigs)
        .queryExecution.optimizedPlan.toString
      assert(defaultPlan.contains("Window"), defaultPlan)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("DedupIndex flags a probe of an over-cap crowd against the crowd's rep") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_capidx").toString
    try {
      val text = "the quick brown fox jumps over the lazy dog again"
      // crowd of identical docs one past the production cap: all four
      // bands of every member are the same four keys, so each band's
      // population is DefaultBandCap + 1 — over cap, so only the
      // min-id representative (doc 0) stays probe-visible
      val crowd = (0L until (DedupQueries.DefaultBandCap + 1L))
        .map(i => (i, text)).toDF("doc_id", "text")
      DedupIndex.build(spark, crowd, dir)
      val probe = Seq((900000L, text)).toDF("doc_id", "text")
      val flags = DedupIndex.dedupBatch(spark, probe, dir)
      val row = flags.collect()
      assert(row.length == 1,
        "an over-cap crowd must still flag the probe via its representative")
      assert(row(0).getLong(1) == 0L && row(0).getDouble(2) == 1.0,
        s"probe must match the crowd's min-id rep at jaccard 1.0: ${row(0)}")
      // control: the same corpus under the cap flags the twin through
      // the full band population too
      val small = (0L until 3L).map(i => (i, text)).toDF("doc_id", "text")
      DedupIndex.build(spark, small, dir)
      val hit = DedupIndex.dedupBatch(spark, probe, dir)
      assert(hit.count() == 1 && hit.head().getDouble(2) == 1.0)
    } finally {
      SparkEntry.releaseCaches(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("DedupIndex.ingest collapses an over-cap within-batch crowd to one survivor") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_capingest").toString
    try {
      val text = "pack my box with five dozen liquor jugs for the trip home"
      val n = DedupQueries.DefaultBandCap + 1L
      // the round-15 advice scenario: ONE delivery carries an over-cap
      // identical crowd. Drop-the-band semantics admitted the whole
      // crowd and poisoned the ledger band forever; rep-keeping must
      // flag all but the min id and fold exactly one survivor
      DedupIndex.build(spark, Seq((1L, "completely unrelated seed document text here ok")).toDF("doc_id", "text"), dir)
      val crowd = (10L until (10L + n)).map(i => (i, text)).toDF("doc_id", "text")
      val flags = DedupIndex.ingest(spark, crowd, dir)
      assert(flags.count() == n - 1,
        s"all but the min-id crowd member must be flagged, got ${flags.count()}")
      assert(flags.filter(col("dup_of") === 10L).count() == n - 1)
      // and the ledger is NOT poisoned: a later twin still collides
      // with the folded survivor
      val later = Seq((900001L, text)).toDF("doc_id", "text")
      val hit = DedupIndex.dedupBatch(spark, later, dir)
      assert(hit.count() == 1 && hit.head().getLong(1) == 10L,
        "a later twin must match the folded survivor — the ledger band must stay probe-visible")
    } finally {
      SparkEntry.releaseCaches(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
