package graft

import graft.operators.Ids
import org.apache.spark.sql.functions._

/** Pins for q122's exact shared-span semantics — the construction of
  * the variant corpus gives every (original, variant) pair a KNOWN
  * ground-truth span: the variant is the original minus its first
  * token, so the longest shared run is exactly the variant's full
  * token count. The oracle cross-checks values; this pins the
  * semantics against the corpus's built-in truth. */
class SharedSpanSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("q122 reports span == variant token count for every original/variant pair") {
    try {
      val spans = SparkEntry.queries("q122_shared_span_pairs")(spark, sf)
        .localCheckpoint()
      // expected: each doc with >= 12 tokens after dropping the first
      // token pairs with its +1,000,000 variant at exactly that length.
      // Derived from DedupQueries.variantDocs itself so the spec and the
      // query share ONE variant definition — a hand-rolled re-derivation
      // here diverged on leading-whitespace docs (r12 ADVICE).
      val expected = graft.operators.DedupQueries.variantDocs(spark, sf)
        .select((col("doc_id") - Ids.VariantOffset).as("doc_id"),
          size(split(col("text"), "\\s+")).cast("long").as("vlen"))
        .filter(col("vlen") >= 12)
      val joined = expected.join(spans,
        expected("doc_id") === spans("doc_a") &&
          spans("doc_b") === expected("doc_id") + Ids.VariantOffset,
        "left")
      assert(joined.filter(col("max_shared_span").isNull).count() == 0,
        "an original/variant pair with >= 12 shared tokens is missing from q122")
      assert(joined.filter(col("max_shared_span") =!= col("vlen")).count() == 0,
        "q122's span disagrees with the constructed ground truth")
    } finally SparkEntry.releaseCaches(spark)
  }

  test("DF cap: a non-tripping cap is row-identical to uncapped, and the " +
      "capped plan adds exactly one semi-join") {
    import graft.operators.{DedupQueries, Ids}
    try {
      // no gram in the fixture reaches df=1,000,000, so the capped
      // variant must reproduce the exact result — the cap only ever
      // REMOVES hot grams, never changes surviving spans
      val uncapped = DedupQueries.sharedSpanPairs(spark, sf, dfCap = None)
      val capped = DedupQueries.sharedSpanPairs(spark, sf, dfCap = Some(1000000))
      assert(capped.exceptAll(uncapped).count() == 0)
      assert(uncapped.exceptAll(capped).count() == 0)
      // the remedy's plan cost is ONE LeftSemi prune of the gram index
      // (asserted on the pre-checkpoint index — the checkpoint truncates
      // lineage, so the final query's plan can't show it)
      val cappedIdx = DedupQueries.spanGramIndex(spark, sf, dfCap = Some(4))
        .queryExecution.optimizedPlan.toString
      val plainIdx = DedupQueries.spanGramIndex(spark, sf, dfCap = None)
        .queryExecution.optimizedPlan.toString
      assert(cappedIdx.contains("LeftSemi"), cappedIdx)
      val extra = "(?i)join".r.findAllIn(cappedIdx).size -
        "(?i)join".r.findAllIn(plainIdx).size
      assert(extra == 1, s"DF cap should add exactly one semi-join, added $extra")
      // and the declared q128 cap (df <= 4) actually TRIPS on the
      // fixture: strictly fewer pairs than exact — the remedy is
      // exercised, not dormant (the oracle hash-verifies its values)
      val exact = uncapped.count()
      val cappedN = SparkEntry.queries("q128_shared_span_capped")(spark, sf).count()
      assert(cappedN < exact, s"cap df<=4 never tripped: $cappedN vs $exact pairs")
    } finally SparkEntry.releaseCaches(spark)
  }

  test("q122 finds no phantom pairs: every reported pair shares a verbatim 8-gram") {
    try {
      val spans = SparkEntry.queries("q122_shared_span_pairs")(spark, sf)
      // reported spans are >= 12 > 8, so both sides must contain at
      // least one identical 8-token window — re-derive independently
      val grams = graft.operators.DedupQueries.variantCorpus(spark, sf)
        .withColumn("ts", split(col("text"), "\\s+"))
        .filter(size(col("ts")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts) - 8), i -> concat_ws(' ', slice(ts, i + 1, 8)))")).as("gram"))
        .distinct()
      val sharing = spans
        .join(grams.select(col("doc_id").as("doc_a"), col("gram")), Seq("doc_a"))
        .join(grams.select(col("doc_id").as("doc_b"), col("gram")), Seq("doc_b", "gram"), "left_semi")
        .select("doc_a", "doc_b").distinct()
      val phantom = spans.select("doc_a", "doc_b")
        .join(sharing, Seq("doc_a", "doc_b"), "left_anti")
      assert(phantom.count() == 0, "q122 reported a pair with no shared 8-gram")
    } finally SparkEntry.releaseCaches(spark)
  }
}
