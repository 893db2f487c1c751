package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupIndex, DedupQueries}

/** Pins for the hot-band candidate cap (the round-15 scale fix): the
  * per-band membership cap in [[DedupQueries.candidatePairsFrom]] that
  * bounds the LSH self-join's per-key fan-out at cap². The q203 oracle
  * cross-checks values against DuckDB; this suite pins the SEMANTICS
  * (what the cap may and may not drop), the PLAN (exactly one added
  * semi-join, on by default in the production chain), and the
  * incremental wiring (DedupIndex routes an over-cap crowd away from
  * the LSH probe entirely). */
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

  test("a tripping cap drops exactly the pairs whose EVERY shared band is hot") {
    try {
      val sigs = DedupQueries.sigIndex(spark, sf)
      val cap = DedupQueries.TrippingBandCap
      val capped = DedupQueries.candidatePairsFrom(sigs, Some(cap)).localCheckpoint()
      val uncapped = DedupQueries.candidatePairsFrom(sigs, None).localCheckpoint()
      // independent derivation of the same contract, written the other
      // way round: keep bands whose population is under the cap via an
      // explicit filter+join (no semi-join machinery), pair through them
      val b = DedupQueries.bandKeys(sigs).localCheckpoint()
      val cold = b.groupBy("band").agg(count(lit(1)).as("n"))
        .filter(col("n") <= cap).select("band")
      val viaCold = b.join(cold, Seq("band"))
        .select(col("doc_id").as("doc_a"), col("band"))
        .join(b.join(cold, Seq("band"))
          .select(col("doc_id").as("doc_b"), col("band")), Seq("band"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      assert(capped.exceptAll(viaCold).count() == 0)
      assert(viaCold.exceptAll(capped).count() == 0)
      // the cap only ever REMOVES pairs, and on this fixture it must
      // genuinely trip (otherwise the tripping-regime oracle q203 is
      // testing nothing)
      assert(capped.exceptAll(uncapped).count() == 0)
      val dropped = uncapped.exceptAll(capped).count()
      assert(dropped > 0, s"cap $cap did not trip on the fixture")
    } finally SparkEntry.releaseCaches(spark)
  }

  test("the capped plan adds exactly one semi-join and the production chain has it on") {
    try {
      val sigs = DedupQueries.sigIndex(spark, sf)
      val cappedPlan = DedupQueries.candidatePairsFrom(sigs, Some(4))
        .queryExecution.optimizedPlan.toString
      val plainPlan = DedupQueries.candidatePairsFrom(sigs, None)
        .queryExecution.optimizedPlan.toString
      assert(cappedPlan.contains("LeftSemi"), cappedPlan)
      val extra = "(?i)join".r.findAllIn(cappedPlan).size -
        "(?i)join".r.findAllIn(plainPlan).size
      assert(extra == 1, s"band cap should add exactly one semi-join, added $extra")
      // no explicit cap argument = the production default — the chain
      // q36/q37/q77/q102 actually runs must carry the prune
      val defaultPlan = DedupQueries.candidatePairsFrom(sigs)
        .queryExecution.optimizedPlan.toString
      assert(defaultPlan.contains("LeftSemi"), defaultPlan)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("DedupIndex routes an over-cap exact-dup crowd away from the LSH probe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_capidx").toString
    try {
      val text = "the quick brown fox jumps over the lazy dog again"
      // crowd of identical docs one past the production cap: all four
      // bands of every member are the same four keys, so each band's
      // population is DefaultBandCap + 1 — over cap, probe must skip
      val crowd = (0L until (DedupQueries.DefaultBandCap + 1L))
        .map(i => (i, text)).toDF("doc_id", "text")
      DedupIndex.build(spark, crowd, dir)
      val probe = Seq((900000L, text)).toDF("doc_id", "text")
      val flags = DedupIndex.dedupBatch(spark, probe, dir)
      assert(flags.count() == 0,
        "an over-cap crowd must be routed to the exact-hash pass, not probed")
      // control: the same corpus under the cap flags the twin — the
      // zero above is the cap, not a broken probe
      val small = (0L until 3L).map(i => (i, text)).toDF("doc_id", "text")
      DedupIndex.build(spark, small, dir)
      val hit = DedupIndex.dedupBatch(spark, probe, dir)
      assert(hit.count() == 1 && hit.head().getDouble(2) == 1.0)
    } finally {
      SparkEntry.releaseCaches(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
