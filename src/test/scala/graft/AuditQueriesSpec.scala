package graft

import org.apache.spark.sql.functions._

/** Quality contracts for the round-14 audit tier beyond the hash gate:
  * the oracle proves both engines agree; these pin that the numbers
  * MEAN what they claim (the AnnRecallSpec pattern — approximations
  * and detectors ship with a measured accuracy contract). */
class AuditQueriesSpec extends SparkSpecBase {

  private def plantedQuoteStats(sf: String): (Long, Long, Long) = {
    // planted pairs: (orig, orig + 2,000,000); a pair is recallable
    // only if LSH banding surfaced it (J ≈ 0.5 ⇒ union-of-bands
    // recall ≈ 0.68 theoretical — the honest sketch trade, not a bug)
    val out = SparkEntry.queries("q197_containment_pairs")(spark, sf)
      .localCheckpoint()
    val planted = out.filter(col("doc_b") === col("doc_a") + 2000000L)
    val nPlanted = planted.count()
    val nDocs = Tables.documents(spark, sf).count()
    val exactContain = planted.filter(col("c_ba_r") === 1.0).count()
    SparkEntry.releaseCaches(spark)
    (nPlanted, nDocs, exactContain)
  }

  test("q197: planted quote pairs are recalled at or above the banding floor " +
      "and every recalled quote shows exact containment on the quote side") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val (nPlanted, nDocs, exactContain) = plantedQuoteStats(sf)
      val recall = nPlanted.toDouble / nDocs
      // theoretical union-of-4-bands recall at J=0.5 is ~0.68; pin a
      // floor with margin so a banding regression fails loudly while
      // hash-family noise doesn't
      assert(recall >= 0.55, s"$sf planted quote recall $recall < 0.55")
      // a prefix-token quote's shingle set is a subset of its source's:
      // containment on the quote side must be EXACTLY 1.0 for every
      // recalled planted pair — the asymmetric signal the query exists
      // to expose
      assert(exactContain == nPlanted,
        s"$sf only $exactContain of $nPlanted planted pairs at c_ba = 1.0")
    }
  }

  test("q197: asym_quote flags exactly the high-containment/low-Jaccard region") {
    val out = SparkEntry.queries("q197_containment_pairs")(
      spark, "/root/testdata/sf0.01").localCheckpoint()
    val bad = out.filter(
      (col("asym_quote") === 1) !==
        (greatest(col("c_ab_r"), col("c_ba_r")) >= 0.8 && col("jaccard_r") < 0.6))
    // rounded columns sit on the same grid the flag was computed from
    // up to 1e-4 — allow no disagreement beyond the rounding boundary
    assert(bad.filter(abs(greatest(col("c_ab_r"), col("c_ba_r")) - 0.8) > 0.001 &&
      abs(col("jaccard_r") - 0.6) > 0.001).count() == 0)
    SparkEntry.releaseCaches(spark)
  }

  test("q196: sketch-audit booleans hold at the small scale factor too") {
    // the sf0.01 gate is the driver's; this adds the second scale point
    val out = SparkEntry.queries("q196_quantile_sketch_audit")(
      spark, "/root/testdata/sf0.001")
      .filter(!col("ok25") || !col("ok50") || !col("ok75"))
    assert(out.count() == 0, "GK sketch outside its rank window at sf0.001")
    SparkEntry.releaseCaches(spark)
  }

  test("q199: drift distances are in (0, 1) and actually discriminate sources") {
    val rows = SparkEntry.queries("q199_unigram_hellinger")(
      spark, "/root/testdata/sf0.01")
      .select("hellinger_r").collect().map(_.getDouble(0))
    assert(rows.length >= 2)
    assert(rows.forall(h => h > 0.0 && h < 1.0), rows.mkString(","))
    // a drift metric that says the same number for every source audits
    // nothing — require real spread across sources
    assert(rows.max - rows.min > 0.005, s"degenerate drift spread: ${rows.min}..${rows.max}")
    SparkEntry.releaseCaches(spark)
  }
}
