package graft

import org.apache.spark.sql.functions._

/** Error-bound gate for the battery's one remaining rows-only query:
  * q66's HLL++ sketches can never hash-match a DuckDB oracle, so this
  * spec pins their quality instead — each approximate distinct count
  * must land within a small multiple of its configured rsd of q20's
  * exact counts, at two scale factors. (The AnnRecallSpec pattern:
  * approximations ship with a measured accuracy contract, not a
  * rows>0 shrug.) HLL++ is deterministic for fixed data, so the gate
  * is stable across runs.
  */
class ApproxQualitySpec extends SparkSpecBase {

  /** relative-error ceiling = 3× the sketch's configured rsd.
    * Uses [[operators.AnalyticsQueries.approxDistinct]] — q66's raw
    * HLL frame — because q66 itself now outputs only the exact counts
    * plus oracle-asserted within-bound booleans (hash-green), keeping
    * the numeric error magnitude pinned HERE. */
  private def check(sf: String): Unit = {
    val approx = operators.AnalyticsQueries.approxDistinct(spark, sf)
    val exact = SparkEntry.queries("q20_distinct_counts")(spark, sf)
    val rows = approx.join(exact, "l_returnflag")
      .select(
        (abs(col("approx_parts") - col("n_parts")).cast("double") / col("n_parts"))
          .as("err_parts"),
        (abs(col("approx_supps") - col("n_supps")).cast("double") / col("n_supps"))
          .as("err_supps"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // approx_parts uses the default rsd (0.05), approx_supps 0.01
      assert(r.getDouble(0) <= 3 * 0.05, s"$sf parts err ${r.getDouble(0)}")
      assert(r.getDouble(1) <= 3 * 0.01, s"$sf supps err ${r.getDouble(1)}")
    }
  }

  test("q66 approx distinct counts sit within 3x rsd of q20's exact counts (sf0.001)") {
    check("/root/testdata/sf0.001")
  }

  test("q66 approx distinct counts sit within 3x rsd of q20's exact counts (sf0.01)") {
    check("/root/testdata/sf0.01")
  }

  test("approxQuantile boundaries track q99's exact equi-depth buckets") {
    // q99's histogram boundaries are exact percentiles (a full sort);
    // at 100 TB they'd come from DataFrame.stat.approxQuantile (GK
    // sketch). Pin the substitution: with relativeError 0.001 each
    // bucket built from approximate boundaries must hold 25% ± 1% of
    // the corpus.
    val sf = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, sf)
    val n = docs.count().toDouble
    val Array(b1, b2, b3) =
      docs.stat.approxQuantile("n_chars", Array(0.25, 0.5, 0.75), 0.001)
    val counts = docs.select(
      when(col("n_chars") <= b1, 1)
        .when(col("n_chars") <= b2, 2)
        .when(col("n_chars") <= b3, 3).otherwise(4).as("bucket"))
      .groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(1, 2, 3, 4))
    counts.foreach { case (b, c) =>
      assert(math.abs(c / n - 0.25) <= 0.01, s"bucket $b share ${c / n}")
    }
  }

  test("percentile_approx tracks q68's exact percentiles (the 100 TB form)") {
    // q68's exact percentile is a full sort per group — at 100 TB the
    // same question is asked through the GK sketch. Pin the substitution
    // error so "use percentile_approx at scale" is a measured contract:
    // accuracy 10000 → rank error ≤ n/10000; on these value ranges the
    // relative value error stays well under 2%.
    val sf = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q68_percentiles")(spark, sf)
    val approx = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("percentile_approx(l_quantity, 0.5, 10000)").as("a_p50"),
           expr("percentile_approx(l_extendedprice, 0.9, 10000)").as("a_p90"))
    val rows = exact.join(approx, "l_returnflag")
      .select(
        (abs(col("a_p50") - col("qty_p50")) / col("qty_p50")).as("e50"),
        (abs(col("a_p90") - col("price_p90")) / col("price_p90")).as("e90"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) <= 0.02, s"p50 err ${r.getDouble(0)}")
      assert(r.getDouble(1) <= 0.02, s"p90 err ${r.getDouble(1)}")
    }
  }

  test("q147 CMS estimates never undercount, see real collisions, and respect the eN/w bound") {
    // The count-min guarantee (Cormode & Muthukrishnan 2005): est ≥
    // exact always, and est ≤ exact + (e/w)·N with probability
    // 1 - e^-d per query. The sketch is deterministic for fixed data
    // (md5 bucketing), so all three facts are hard assertions here —
    // including that at w=32 < |vocab| the audit actually observes
    // nonzero collisions (a w ≫ vocab sketch would trivially report
    // zero error and audit nothing).
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      val out = SparkEntry.queries("q147_cms_heavyhitter_audit")(spark, sf)
        .select("cnt", "over_est").collect()
      assert(out.length == 20, s"$sf rows ${out.length}")
      assert(out.forall(_.getLong(1) >= 0), s"$sf CMS undercounted")
      assert(out.exists(_.getLong(1) > 0), s"$sf no collisions observed")
      val n = Tables.documents(spark, sf)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
        .filter(col("t") =!= "").count()
      val bound = math.E / 32.0 * n
      out.foreach { r =>
        assert(r.getLong(1) <= bound, s"$sf over ${r.getLong(1)} > eN/w $bound")
      }
    }
  }
}
