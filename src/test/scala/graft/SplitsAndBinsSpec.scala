package graft

import graft.operators.{DedupQueries, Splits, TimeBins}
import org.apache.spark.sql.functions._

/** Property pins for the shared split/bin primitives — the invariants
  * the oracled queries rely on but don't themselves state. */
class SplitsAndBinsSpec extends SparkSpecBase {
  import spark.implicits._

  test("q118 cluster-keyed splits close q110's leakage: zero cross-split " +
      "candidate pairs (hash split as the >0 positive control)") {
    val sf = "/root/testdata/sf0.001"
    try {
      // positive control: the raw hash split DOES leak on this corpus —
      // otherwise a broken audit that always returns 0 would pass
      val hashAssign = DedupQueries.variantCorpus(spark, sf)
        .select(col("doc_id"), Splits.splitCol(col("doc_id")).as("split"))
      assert(DedupQueries.splitLeakage(spark, sf, hashAssign).count() > 0,
        "q110's premise vanished: the hash split no longer leaks at sf0.001")
      // the remedy: cluster-root-keyed assignment leaks NOTHING
      val clustered = DedupQueries.clusterSplitAssignment(spark, sf).localCheckpoint()
      assert(DedupQueries.splitLeakage(spark, sf, clustered).count() == 0,
        "cluster-representative split leaked a candidate pair across splits")
      // and it is a total assignment: every corpus doc got exactly one split
      assert(clustered.count() ==
        DedupQueries.variantCorpus(spark, sf).count())
      assert(clustered.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("q121 manifest is leakage-safe end-to-end: zero cross-split " +
      "candidate pairs among manifest docs; one split per doc") {
    val sf = "/root/testdata/sf0.001"
    try {
      val manifest = SparkEntry.queries("q121_split_manifest")(spark, sf)
        .localCheckpoint()
      // doc-level assignment as the manifest ships it
      val docSplit = manifest.select("doc_id", "split").distinct()
      // a doc's chunks all carry the same split
      assert(docSplit.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
      // no candidate near-dup pair with both sides in the manifest
      // straddles splits — the end-to-end leakage guarantee
      assert(DedupQueries.splitLeakage(spark, sf, docSplit).count() == 0,
        "q121 manifest leaked a candidate pair across splits")
      // the manifest is exactly q100's chunk set (the split join drops
      // and duplicates nothing)
      val q100 = SparkEntry.queries("q100_training_manifest")(spark, sf)
      assert(manifest.count() == q100.count())
    } finally SparkEntry.releaseCaches(spark)
  }

  test("hash split hits its 80/10/10 design ratios (md5 uniformity)") {
    val n = 20000L
    val dist = spark.range(n)
      .select(Splits.splitCol(col("id")).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // binomial std-dev at n=20k is ~55 for the 10% buckets; 4σ bounds
    assert(math.abs(dist("train") - n * 204 / 256) < 500, dist.toString)
    assert(math.abs(dist("val") - n * 26 / 256) < 300, dist.toString)
    assert(math.abs(dist("test") - n * 26 / 256) < 300, dist.toString)
    assert(dist.values.sum == n) // total: every id assigned exactly once
  }

  test("binned interval coverage is exact for arbitrary gaps: " +
      "<=2 exploded probe bins find every in-window pair exactly once") {
    // adversarial timestamps: clustered on bin boundaries, exact
    // multiples, off-by-one-microsecond neighbors
    for (gapSeconds <- Seq(1L, 7L, 60L)) {
      val gapUs = gapSeconds * 1000000L
      val tss = Seq(0L, 1L, gapUs - 1, gapUs, gapUs + 1, 2 * gapUs,
        3 * gapUs - 1, 3 * gapUs, 5 * gapUs + 123456L, 7 * gapUs)
      val rows = tss.zipWithIndex.map { case (us, i) =>
        val t = new java.sql.Timestamp(us / 1000000 * 1000) // whole seconds
        t.setNanos(((us % 1000000) * 1000).toInt) // micro remainder
        (i.toLong, t)
      }
      val df = rows.toDF("id", "ts")
      // ground truth: plain O(n^2) range join
      val a = df.select(col("id").as("pid"), col("ts").as("pts"))
      val b = df.select(col("id").as("xid"), col("ts").as("xts"))
      val naive = a.crossJoin(b)
        .filter(col("xts") >= col("pts") - expr(s"INTERVAL $gapSeconds SECONDS") &&
          col("xts") < col("pts"))
        .select("pid", "xid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // binned form: probe explodes <=2 bins, base carries one
      val probes = a.withColumn("bin", explode(array_distinct(array(
        TimeBins.bin(s"pts - INTERVAL $gapSeconds SECONDS", gapSeconds),
        TimeBins.bin("pts", gapSeconds)))))
      val base = b.withColumn("bin", TimeBins.bin("xts", gapSeconds))
      val binned = probes.join(base,
          probes("bin") === base("bin") &&
            col("xts") >= col("pts") - expr(s"INTERVAL $gapSeconds SECONDS") &&
            col("xts") < col("pts"))
        .select("pid", "xid")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.length == binned.distinct.length,
        s"gap=$gapSeconds: a pair matched in both bins")
      assert(binned.toSet == naive, s"gap=$gapSeconds: binned != naive")
      assert(naive.nonEmpty)
    }
  }
}
