package graft

import graft.functions.BloomJoin
import org.apache.spark.sql.functions._

/** The sketch's two contracts, which q107's oracle equality alone
  * cannot see: it actually PRUNES (survivor count tracks the true
  * match count within the fpp slack — a sketch that passes everything
  * is semantically invisible but useless), and it never drops a true
  * match (no false negatives, the property that makes the post-prune
  * exact join sufficient). */
class BloomJoinSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.01"

  test("prune passes every true match and bounds false positives near fpp") {
    val li = Tables.lineitem(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val nKeys = urgent.count()
    val fact = li.count()
    val trueMatches = li.join(
      urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi").count()

    val fpp = 0.01
    val pruned = BloomJoin.bloomPrune(li, col("l_orderkey"), urgent, "o_orderkey",
      expectedItems = nKeys, fpp = fpp)
    val survived = pruned.count()

    // no false negatives: every true match survives the prune
    assert(survived >= trueMatches, s"sketch dropped matches: $survived < $trueMatches")
    // real pruning: survivors ≈ matches + fpp·nonmatches (generous 5× slack
    // on the fpp term — the sketch sizes itself with margin)
    val slack = (fact - trueMatches) * fpp * 5
    assert(survived <= trueMatches + slack.toLong + 1,
      s"sketch barely pruned: $survived of $fact (true $trueMatches, slack $slack)")
    // and the exact join after the prune IS the plain semi join
    val exact = pruned.join(
      urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi").count()
    assert(exact == trueMatches)
  }

  test("STRING keys: build and probe agree on the UTF-8 representation " +
      "(no false negatives, real pruning) — the q114 shingle-key path") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
    // benchmark side: tokens of every 50th doc (q87/q114's convention)
    val bench = docs.filter(col("doc_id") % 50 === 0).select("tok").distinct()
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val trueMatches = corpus.join(bench, Seq("tok"), "left_semi").count()
    val pruned = BloomJoin.bloomPrune(corpus, col("tok"), bench, "tok",
      expectedItems = bench.count())
    val survived = pruned.count()
    assert(survived >= trueMatches, s"string sketch dropped matches: $survived < $trueMatches")
    val exact = pruned.join(bench, Seq("tok"), "left_semi").count()
    assert(exact == trueMatches)
    // genuinely prunes: a probe key OUTSIDE the benchmark vocabulary is
    // (almost surely) rejected — the corpus side here shares the full
    // vocabulary, so synthesize disjoint keys to see rejection
    val alien = spark.range(0, 1000)
      .select(concat(lit("alien-token-"), col("id")).as("tok"))
    val alienSurvived = BloomJoin.bloomPrune(alien, col("tok"), bench, "tok",
      expectedItems = bench.count()).count()
    assert(alienSurvived <= 50, s"string sketch passed $alienSurvived of 1000 alien keys")
  }

  test("the membership test stays inside whole-stage codegen") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey")
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val pruned = BloomJoin.bloomPrune(li, col("l_orderkey"), urgent, "o_orderkey", 1000L)
    val plan = pruned.queryExecution.executedPlan
    // the `*(n)` prefix in toString IS WholeStageCodegen; assert on the
    // node class so the check doesn't depend on a rendering style
    assert(plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      plan.toString)
    assert(plan.toString.contains("bloom_might_contain"), plan.toString)
    pruned.count() // and the generated code actually runs
  }
}
