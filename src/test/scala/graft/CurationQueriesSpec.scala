package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the curation battery (q87-q93) beyond the
  * driver's DuckDB hash gate: structural properties that must hold at
  * ANY corpus size, checked at sf0.001. */
class CurationQueriesSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q87: benchmark docs are excluded; overlap bounded by shingle count") {
    val rows = run("q87_decontamination").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) % 50 != 0), "benchmark doc leaked into corpus")
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)), "overlap > shingles")
    assert(rows.forall(r => (r.getLong(2) > 0) == (r.getInt(3) == 1)))
    // the synthetic corpus's shared vocabulary must produce SOME overlap,
    // or the query proves nothing
    assert(rows.exists(_.getInt(3) == 1), "no contaminated docs found")
    assert(rows.exists(_.getInt(3) == 0), "every doc contaminated")
  }

  test("q88: duplicate-n-gram fractions are proper fractions") {
    val rows = run("q88_repetition_quality").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, t) = (r.getDouble(2), r.getDouble(3))
      assert(b >= 0.0 && b < 1.0, s"dup_bigram_frac $b")
      assert(t >= 0.0 && t < 1.0, s"dup_trigram_frac $t")
      assert((b >= 0.05) == (r.getInt(4) == 1))
    }
  }

  test("q89: the keeper really is the stratum maximum") {
    val out = run("q89_source_canonical")
    val truth = Tables.documents(spark, sf)
      .groupBy("source", "lang").agg(max("n_chars").as("mx"))
    val bad = out.join(truth, Seq("source", "lang"))
      .filter(col("n_chars") =!= col("mx")).count()
    assert(bad == 0)
    // exactly one keeper per stratum present in the data
    assert(out.count() ==
      Tables.documents(spark, sf).select("source", "lang").distinct().count())
  }

  test("q90: membership partitions the corpus; every centroid owns itself") {
    val rows = run("q90_kmeans_lloyd").collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    val dims = rows.map(_.getInt(1)).distinct
    assert(rows.length == 8 * dims.length, s"${rows.length} cells")
    // per-dim membership sums to the corpus size (assignment is a partition)
    dims.foreach { dim =>
      val tot = rows.filter(_.getInt(1) == dim).map(_.getLong(2)).sum
      assert(tot == nVecs, s"dim $dim membership $tot != $nVecs")
    }
    // a centroid's own vector is at distance 0 of itself → every cluster
    // is non-empty
    assert(rows.forall(_.getLong(2) >= 1))
  }

  test("q91: the funnel is monotone and starts at the corpus size") {
    val rows = run("q91_curation_funnel").orderBy("stage").collect()
    assert(rows.length == 5)
    assert(rows.head.getLong(2) == Tables.documents(spark, sf).count())
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      counts.mkString(","))
    assert(counts.last > 0, "funnel filtered everything out")
  }

  test("q92: chunks conserve tokens and documents per stratum") {
    val out = run("q92_token_packing")
    val truth = Tables.documents(spark, sf)
      .select(col("lang"), size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("tok"), count(lit(1)).as("docs"))
    val packed = out.groupBy("lang")
      .agg(sum("chunk_tokens").as("tok2"), sum("n_docs").as("docs2"))
    val bad = truth.join(packed, Seq("lang"))
      .filter(col("tok") =!= col("tok2") || col("docs") =!= col("docs2")).count()
    assert(bad == 0)
    // chunk ids are dense from 0 within each lang
    val langs = out.select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { l =>
      val ids = out.filter(col("lang") === l).select("chunk_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.head == 0 && ids.last == ids.length - 1, s"$l: ${ids.mkString(",")}")
    }
  }

  test("q94: quantized search recalls most exact top-1 neighbors") {
    val rows = run("q94_embedding_quantize").collect()
    assert(rows.nonEmpty)
    // int8 per-dim scalar quantization on 64-dim vectors should rarely
    // flip the top-1 — require majority recall, not just determinism
    val recall = rows.count(_.getInt(3) == 1).toDouble / rows.length
    assert(recall >= 0.6, s"recall@1 $recall")
  }

  test("q95: exactly 5 docs per stratum, ranks dense") {
    val rows = run("q95_fixed_size_sample").collect()
    val perLang = rows.groupBy(_.getString(0))
    perLang.foreach { case (lang, rs) =>
      assert(rs.length == 5, s"$lang has ${rs.length}")
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5), lang)
    }
    // deterministic: two runs agree exactly
    val again = run("q95_fixed_size_sample").collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("q96: log-likelihoods are negative, buckets balanced") {
    val rows = run("q96_unigram_loglik").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.forall(_.getDouble(2) < 0.0), "a unigram avg log-prob must be < 0")
    val bucketSizes = rows.groupBy(_.getInt(3)).view.mapValues(_.length)
    assert(bucketSizes.keys.toSeq.sorted == Seq(1, 2, 3, 4))
    // ntile keeps buckets within 1 of each other
    assert(bucketSizes.values.max - bucketSizes.values.min <= 1)
  }

  test("q97: weights rebalance the mixture to uniform") {
    val rows = run("q97_source_mix_weights").collect()
    // shares sum to 1; weighted counts are equal across sources
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"share sum $shareSum")
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(3))
    assert(weighted.max - weighted.min < 1e-3, weighted.mkString(","))
  }

  test("q98: chunks conserve tokens and exercise the split path") {
    val rows = run("q98_doc_chunking").collect()
    assert(rows.length > Tables.documents(spark, sf).count(),
      "no doc split into multiple chunks — the overflow path is untested")
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 32))
    // per-doc chunk tokens sum to the doc's token count
    val byDoc = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val truth = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.forall { case (id, tot) => truth(id) == tot })
  }

  test("q99: equi-depth buckets are balanced and ordered") {
    val rows = run("q99_equidepth_histogram").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.sum == Tables.documents(spark, sf).count())
    // equi-depth: quartiles keep buckets within ~2% of each other at
    // this corpus size (ties on n_chars can shift a few docs)
    assert(sizes.max - sizes.min <= sizes.sum / 20, sizes.mkString(","))
    // ranges are disjoint and ascending
    val (mins, maxs) = (rows.map(_.getLong(2)), rows.map(_.getLong(3)))
    assert(maxs.zip(mins.tail).forall { case (hi, nextLo) => hi < nextLo })
  }

  test("q100: the manifest covers exactly the dedup survivors") {
    val rows = run("q100_training_manifest").collect()
    val funnel = run("q91_curation_funnel").collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    // one manifest group per surviving doc (stage 3 = exact_dedup)
    assert(rows.map(_.getLong(0)).distinct.length == funnel("exact_dedup"))
    // chunk hashes are content-addressed: distinct unless token slices repeat
    assert(rows.forall(_.getString(4).length == 32))
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 32))
  }

  test("q93: cumulative coverage is monotone and consistent") {
    val rows = run("q93_vocab_coverage").orderBy("rank").collect()
    assert(rows.length == 20)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 20))
    val cums = rows.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a })
    val shares = rows.map(_.getDouble(4))
    assert(shares.forall(s => s > 0.0 && s <= 1.0))
    // counts are ranked descending
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
  }
}
