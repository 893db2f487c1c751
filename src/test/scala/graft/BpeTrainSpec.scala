package graft

import graft.operators.BpeTrain
import org.apache.spark.sql.functions._

/** Pins for q125's iterated BPE loop that the oracle equality can't
  * see on its own: the merge-application string semantics (greedy
  * leftmost, exactly BPE's order, including the repeated-symbol runs
  * the single-space encoding corrupts), the anchor to already-oracled
  * q123 (round 1 must pick q123's top pair), that later rounds really
  * train on MERGED state (merged symbols appear in round-2 pairs), and
  * the constant-size per-round plan template (the KMeans iteration
  * contract). */
class BpeTrainSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("double-space merge replace is greedy leftmost BPE order") {
    // the classic failure of single-space encodings: a run "a a a a a"
    // under merge (a, a) must give [aa, aa, a] — pairs consumed left to
    // right, never re-using a merged symbol
    val got = spark.sql(
      "SELECT replace('  a  a  a  a  a  ', ' a  a ', ' aa ') AS s")
      .head().getString(0)
    assert(got == "  aa  aa  a  ", s"greedy merge broke: '$got'")
    // multi-char symbols: merging (ab, c) must not touch "xab c"-style
    // substrings of OTHER symbols — boundaries are the double spaces
    val got2 = spark.sql(
      "SELECT replace('  xab  c  ab  c  ', ' ab  c ', ' abc ') AS s")
      .head().getString(0)
    assert(got2 == "  xab  c  abc  ", s"boundary leak: '$got2'")
  }

  test("round 1 of the iterated loop picks q123's top merge pair") {
    try {
      val q123Top = SparkEntry.queries("q123_bpe_merge_pairs")(spark, sf)
        .head()
      val r1 = BpeTrain.train(spark, sf, 1).head()
      assert(r1.getAs[String]("pair") == q123Top.getAs[String]("pair"))
      assert(r1.getAs[Long]("n") == q123Top.getAs[Long]("n"))
    } finally SparkEntry.releaseCaches(spark)
  }

  test("later rounds train on merged state and the plan template stays constant-size") {
    try {
      val rounds = BpeTrain.trainRounds(spark, sf, 3)
      val merged1 = rounds.head._1.head()
      val mergedSym = merged1.getAs[String]("a") + merged1.getAs[String]("b")
      // the merged symbol must participate in round-2 pair counting —
      // proof the loop re-segments instead of recounting round 1
      val p2 = BpeTrain.pairCounts(rounds.head._2)
        .filter(col("a") === mergedSym || col("b") === mergedSym)
      assert(p2.count() > 0, s"merged symbol '$mergedSym' absent from round-2 pairs")
      // constant-size template: every pinned state is a LogicalRDD scan
      // plus the same projection — round 3's plan must not be deeper
      // than round 1's (the unpinned form grows a full lineage per round)
      val sizes = rounds.map(_._2.queryExecution.optimizedPlan.collect { case p => p }.size)
      assert(sizes.distinct.size == 1,
        s"per-round state plans drifted in size: $sizes")
      // and the learned merges are all distinct pairs with positive counts
      val merges = BpeTrain.train(spark, sf, 3).collect()
      assert(merges.map(_.getAs[String]("pair")).distinct.length == 3)
      assert(merges.forall(_.getAs[Long]("n") > 0))
    } finally SparkEntry.releaseCaches(spark)
  }

  test("q129 encode: zero merges prices every doc at its character count, " +
      "trained merges strictly compress, word counts invariant") {
    try {
      // with NO merges every word encodes to its characters: n_tokens
      // per doc must equal the summed word lengths, computed directly
      val direct = Tables.documents(spark, sf)
        .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nw"), sum(length(col("w"))).as("nc"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val zero = BpeTrain.encodeCorpus(spark, sf, 0)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      assert(zero == direct, "zero-merge encode != per-char pricing")
      SparkEntry.releaseCaches(spark)
      val trained = BpeTrain.encodeCorpus(spark, sf, BpeTrain.EncodeRounds)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(trained.keySet == zero.keySet)
      // word counts are encode-invariant; token totals strictly shrink
      // (every trained merge fires somewhere) and never below one
      // token per word
      assert(trained.forall { case (id, (nw, _)) => nw == zero(id)._1 })
      assert(trained.map(_._2._2).sum < zero.map(_._2._2).sum)
      assert(trained.forall { case (_, (nw, nt)) => nt >= nw })
    } finally SparkEntry.releaseCaches(spark)
  }
}
