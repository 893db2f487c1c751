package graft

import graft.operators.{DedupQueries, Ids}
import graft.streaming.DedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-static incremental dedup: per-row band derivation must be
  * bit-for-bit the batch pipeline's, and the stream-static join must
  * flag exactly the batch candidate pairs. */
class DedupStreamSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("rowBands equals the batch explode-agg banding bit-for-bit") {
    try {
      val batch = DedupQueries.bandKeys(DedupQueries.sigIndex(spark, sf))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val perRow = DedupQueries.rowBands(DedupQueries.variantCorpus(spark, sf))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(perRow == batch)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("rowBlocks equals the batch explode-agg simhash signatures bit-for-bit") {
    try {
      val corpus = DedupQueries.variantCorpus(spark, sf)
      val batch = DedupQueries.withBlockKeys(DedupQueries.simhashBlockFrame(corpus))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getInt(3), r.getInt(4), r.getString(5))).toSet
      val perRow = DedupQueries.rowBlocks(corpus)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getInt(3), r.getInt(4), r.getString(5))).toSet
      assert(perRow == batch)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("stream-static simhash flags equal the batch q113 cross pairs " +
      "across micro-batches (hamming values included)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the originals' block signatures are the static index; variants
    // arrive as the stream — the cross slice of q113's pair set is the
    // ground truth the stream must reproduce exactly
    val corpus = DedupQueries.variantCorpus(spark, sf)
      .filter(col("doc_id") < Ids.VariantOffset)
    val corpusBlocks = DedupQueries.withBlockKeys(
      DedupQueries.simhashBlockFrame(corpus)).localCheckpoint()
    val arriving = DedupQueries.variantCorpus(spark, sf)
      .filter(col("doc_id") >= Ids.VariantOffset)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = SparkEntry.queries("q113_simhash_hamming_pairs")(spark, sf)
      .filter(col("doc_a") < Ids.VariantOffset && col("doc_b") >= Ids.VariantOffset)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getInt(2))).toSet
    assert(expected.nonEmpty) // the variant corpus guarantees near-dups

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = DedupStream.flagSimhashAgainstCorpus(stream, corpusBlocks)
      .writeStream.format("memory").queryName("simhash_flags")
      .outputMode("append").start()
    try {
      val (first, second) = arriving.splitAt(arriving.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("simhash_flags")
        .select("doc_id", "dup_of", "hamming").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected)
    } finally {
      q.stop()
      SparkEntry.releaseCaches(spark)
    }
  }

  test("stream-static containment flags equal q197's planted quote pairs " +
      "across micro-batches (containment values included)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // corpus = the originals (their bands + shingle sets are the static
    // index); the planted q197 quotes arrive as the stream. Ground
    // truth: q197's (orig, orig+2M) rows at containment >= 0.8 on the
    // quote side — the stream must reproduce pair AND value exactly.
    val originals = DedupQueries.originalDocs(spark, sf)
    val corpusSets = DedupQueries.shingleSetsOf(originals).localCheckpoint()
    val corpusBands = DedupQueries.bandKeys(
      DedupQueries.minhashFrom(corpusSets)).localCheckpoint()
    val quotes = Tables.documents(spark, sf)
      .withColumn("ts", split(trim(col("text")), "\\s+"))
      .select((col("doc_id") + 2000000L).as("doc_id"),
        array_join(slice(col("ts"), lit(1),
          greatest(lit(3), (size(col("ts")) / 2))), " ").as("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // every orig↔quote batch pair at quote-side containment >= 0.8 —
    // planted or cross-doc — is in the stream's probe scope (orig ids
    // < 2M sort to doc_a, quote ids to doc_b); quote-quote and
    // orig-orig batch pairs are not
    val expected = SparkEntry.queries("q197_containment_pairs")(spark, sf)
      .filter(col("doc_a") < 2000000L && col("doc_b") >= 2000000L &&
        col("c_ba_r") >= 0.8)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(5))).toSet
    assert(expected.nonEmpty)

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = DedupStream.flagQuotesAgainstCorpus(stream, corpusBands, corpusSets)
      .writeStream.format("memory").queryName("quote_flags")
      .outputMode("append").start()
    try {
      val (first, second) = quotes.splitAt(quotes.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("quote_flags").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // the stream probes quotes against ORIGINALS only, so its flag
      // set is exactly the planted slice of the batch pair set
      assert(got == expected,
        s"stream-only=${(got -- expected).take(3)} batch-only=${(expected -- got).take(3)}")
    } finally {
      q.stop()
      SparkEntry.releaseCaches(spark)
    }
  }

  test("admission decisions equal q202's batch containment policy on the cross slice") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val thr = 0.8
    // corpus = originals; the planted q202/q197 quotes arrive as the
    // stream. Ground truth: the batch policy rule (both directions over
    // the gate -> drop the larger id; else drop the contained side)
    // applied to the SAME scored chain q202 runs — quoteCorpus
    // candidates restricted to the orig x quote slice the stream probes
    val originals = DedupQueries.originalDocs(spark, sf)
    val corpusSets = DedupQueries.shingleSetsOf(originals).localCheckpoint()
    val corpusBands = DedupQueries.bandKeys(
      DedupQueries.minhashFrom(corpusSets)).localCheckpoint()
    val quotesDf = Tables.documents(spark, sf)
      .withColumn("ts", split(trim(col("text")), "\\s+"))
      .select((col("doc_id") + 2000000L).as("doc_id"),
        array_join(slice(col("ts"), lit(1),
          greatest(lit(3), (size(col("ts")) / 2))), " ").as("text"))
    val allSets = DedupQueries.shingleSetsOf(
      originals.unionByName(quotesDf)).localCheckpoint()
    val scored = DedupQueries.candidatePairsFrom(DedupQueries.minhashFrom(allSets))
      .filter(col("doc_a") < 2000000L && col("doc_b") >= 2000000L)
      .join(allSets.select(col("doc_id").as("doc_a"), col("sd").as("sa")), Seq("doc_a"))
      .join(allSets.select(col("doc_id").as("doc_b"), col("sd").as("sb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("c_ab", col("inter").cast("double") / size(col("sa")))
      .withColumn("c_ba", col("inter").cast("double") / size(col("sb")))
      .filter(greatest(col("c_ab"), col("c_ba")) >= thr)
      .withColumn("victim",
        when(col("c_ab") >= thr && col("c_ba") >= thr,
          greatest(col("doc_a"), col("doc_b")))
          .when(col("c_ab") >= thr, col("doc_a"))
          .otherwise(col("doc_b")))
    val expected = scored.select("doc_a", "doc_b", "victim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty)
    // the planted structure guarantees quote-side victims; the rule is
    // only fully exercised if at least one pair exists at all
    val quotes = quotesDf.collect().map(r => (r.getLong(0), r.getString(1)))

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = DedupStream.admitQuotesAgainstCorpus(stream, corpusBands, corpusSets, thr)
      .writeStream.format("memory").queryName("admit_decisions")
      .outputMode("append").start()
    try {
      val (first, second) = quotes.splitAt(quotes.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      // stream rows are (arriving=quote, quoted_from=orig, ..., victim);
      // map to the batch orientation (doc_a=orig < doc_b=quote)
      val got = spark.table("admit_decisions")
        .select(col("quoted_from"), col("doc_id"), col("victim"), col("drop_arriving"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      assert(got.map(t => (t._1, t._2, t._3)).toSet == expected,
        s"stream-only=${(got.map(t => (t._1, t._2, t._3)).toSet -- expected).take(3)} " +
          s"batch-only=${(expected -- got.map(t => (t._1, t._2, t._3)).toSet).take(3)}")
      // the admission verdict is consistent with the victim column
      assert(got.forall(t => t._4 == (t._3 == t._2)))
    } finally {
      q.stop()
      SparkEntry.releaseCaches(spark)
    }
  }

  test("stream-static join flags exactly the batch new-vs-corpus collisions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // static corpus index: the originals' bands (what production keeps
    // persisted); the variants play the arriving stream
    val corpus = DedupQueries.variantCorpus(spark, sf)
      .filter(col("doc_id") < Ids.VariantOffset)
    val arriving = DedupQueries.variantCorpus(spark, sf)
      .filter(col("doc_id") >= Ids.VariantOffset)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpusBands = DedupQueries.rowBands(corpus).localCheckpoint()

    val expected = DedupQueries.rowBands(
        spark.createDataFrame(arriving.toSeq).toDF("doc_id", "text"))
      .join(corpusBands.select(col("doc_id").as("dup_of"), col("band")), Seq("band"))
      .select("doc_id", "dup_of").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty) // the variant corpus guarantees near-dups

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = DedupStream.flagAgainstCorpus(stream, corpusBands)
      .writeStream.format("memory").queryName("dedup_flags")
      .outputMode("append").start()
    try {
      // two micro-batches: collisions must accumulate exactly, no state
      val (first, second) = arriving.splitAt(arriving.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("dedup_flags")
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      q.stop()
      SparkEntry.releaseCaches(spark)
    }
  }

  // ---- self-maintaining index: within-stream twins ----------------

  /** (originals, variants) — twins split across arrival batches. */
  private def twinDocs(n: Int): (Seq[(Long, String)], Seq[(Long, String)]) = {
    val orig = DedupQueries.variantCorpus(spark, sf)
      .filter(col("doc_id") < Ids.VariantOffset).orderBy("doc_id").limit(n)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val vars = DedupQueries.variantCorpus(spark, sf)
      .filter(col("doc_id") >= Ids.VariantOffset)
      .filter(col("doc_id") - Ids.VariantOffset < orig.map(_._1).max + 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    (orig, vars)
  }

  private def toDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("index maintenance: a twin in a later micro-batch is flagged against the earlier survivor") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-idx").toString
    try {
      val (orig, vars) = twinDocs(50)
      val path = s"$dir/bands"

      // ground truth from the band math itself: within-batch original
      // collisions (the corpus DOES have a few chance band ties, e.g.
      // docs 8/12 at sf0.001), then variant-vs-survivor collisions
      val ob = DedupQueries.rowBands(toDf(orig)).localCheckpoint()
      val expF1 = ob.join(ob.select(col("doc_id").as("dup_of"), col("band")), Seq("band"))
        .filter(col("dup_of") < col("doc_id"))
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val f1 = DedupStream.processBatch(spark, toDf(orig), path, 0L)
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(f1 == expF1)

      val survivors = ob.select("doc_id").distinct()
        .join(toDf(expF1.map(p => (p._1, "")).toSeq).select("doc_id"), Seq("doc_id"), "left_anti")
      val vb = DedupQueries.rowBands(toDf(vars)).localCheckpoint()
      val vsCorpus = vb.join(
          ob.join(survivors, Seq("doc_id"))
            .select(col("doc_id").as("dup_of"), col("band")), Seq("band"))
        .select("doc_id", "dup_of").distinct()
      val vsBatch = vb.join(vb.select(col("doc_id").as("dup_of"), col("band")), Seq("band"))
        .filter(col("dup_of") < col("doc_id"))
        .select("doc_id", "dup_of").distinct()
      val expected = vsCorpus.unionByName(vsBatch).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(expected.nonEmpty)

      val f2 = DedupStream.processBatch(spark, toDf(vars), path, 1L)
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(f2 == expected)
      // the twins among the flags resolve to their own origin
      assert(f2.exists { case (v, o) => o == v - Ids.VariantOffset })

      // flagged docs were NOT folded in: replaying their twins against
      // the index finds only the SURVIVORS
      val ledger = DedupStream.loadIndex(spark, path)
      assert(ledger.filter(col("doc_id") >= Ids.VariantOffset)
        .join(toDf(f2.map(p => (p._1, "")).toSeq).select("doc_id"), Seq("doc_id"))
        .count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      SparkEntry.releaseCaches(spark)
    }
  }

  test("replaying a micro-batch re-emits identical flags and leaves the index identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-replay").toString
    try {
      val (orig, vars) = twinDocs(30)
      val path = s"$dir/bands"
      DedupStream.processBatch(spark, toDf(orig), path, 0L).count()

      def ledgerRows() = DedupStream.loadIndex(spark, path)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val flagsA = DedupStream.processBatch(spark, toDf(vars), path, 1L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val ledgerA = ledgerRows()
      // at-least-once replay of the SAME batch id (crash after fold,
      // before the sink committed): must be byte-identical, not additive
      val flagsB = DedupStream.processBatch(spark, toDf(vars), path, 1L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(flagsB == flagsA)
      assert(ledgerRows() == ledgerA)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      SparkEntry.releaseCaches(spark)
    }
  }

  test("a fresh-checkpoint restart against an accumulated index fails loud, not wipes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-guard").toString
    try {
      val (orig, _) = twinDocs(20)
      val path = s"$dir/bands"
      // two batches of mostly-unique docs, so BOTH fold survivors (the
      // guard keys off the newest folded batch id)
      DedupStream.processBatch(spark, toDf(orig.take(10)), path, 0L).count()
      DedupStream.processBatch(spark, toDf(orig.drop(10)), path, 1L).count()
      val before = DedupStream.loadIndex(spark, path).count()
      // checkpoint cleared → batch ids restart at 0; the old guardless
      // fold would silently discard every accumulated band
      val e = intercept[IllegalArgumentException] {
        DedupStream.processBatch(spark, toDf(orig), path, 0L).count()
      }
      assert(e.getMessage.contains("fresh"), e.getMessage)
      assert(DedupStream.loadIndex(spark, path).count() == before)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      SparkEntry.releaseCaches(spark)
    }
  }

  test("within-batch twins are flagged against the lowest colliding id, which survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-wb").toString
    try {
      val (orig, vars) = twinDocs(30)
      val path = s"$dir/bands"
      val flags = DedupStream.processBatch(spark, toDf(orig ++ vars), path, 0L)
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(flags.nonEmpty)
      assert(flags.forall { case (d, o) => o < d }) // attribution is to the lower id
      val ledger = DedupStream.loadIndex(spark, path)
      val flaggedIds = flags.map(_._1).toSet
      assert(ledger.collect().forall(r => !flaggedIds.contains(r.getLong(0))))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      SparkEntry.releaseCaches(spark)
    }
  }

  test("an over-cap identical crowd collapses to one survivor and does not poison the ledger") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-crowd").toString
    try {
      val path = s"$dir/bands"
      val text = "sphinx of black quartz judge my vow said the quiet archivist"
      val n = DedupQueries.DefaultBandCap + 1L
      // the round-15 advice's high finding, end-to-end: ONE micro-batch
      // delivers > DefaultBandCap identical docs, so every band of the
      // crowd is hot. Drop-the-band semantics emitted ZERO flags, folded
      // the WHOLE crowd into the ledger, and then hid the over-cap
      // ledger band from every future probe — unbounded duplicate
      // admission. Rep-keeping must flag all but the min id now…
      val crowd = (100L until (100L + n)).map(i => (i, text))
      val f0 = DedupStream.processBatch(spark, toDf(crowd), path, 0L)
        .select("doc_id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(f0.size == (n - 1).toInt, s"expected ${n - 1} flags, got ${f0.size}")
      assert(f0.forall(_._2 == 100L), "every crowd member must flag against the min id")
      // …fold exactly one survivor…
      val ledger = DedupStream.loadIndex(spark, path)
      assert(ledger.select("doc_id").distinct().count() == 1)
      // …and keep the ledger band probe-visible: a twin in a LATER
      // micro-batch is still flagged against the survivor
      val f1 = DedupStream.processBatch(spark, toDf(Seq((900000L, text))), path, 1L)
        .select("doc_id", "dup_of").distinct().collect()
      assert(f1.length == 1 && f1(0).getLong(1) == 100L,
        "a later twin must flag against the folded survivor")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      SparkEntry.releaseCaches(spark)
    }
  }

  test("base+delta folds: O(batch) deltas absorb into base at the compaction " +
      "cadence, and stale deltas from a crashed compaction are ignored") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-compact").toString
    try {
      val (orig, _) = twinDocs(40)
      val path = s"$dir/bands"
      val batches = orig.grouped(4).toSeq // 10 batches of 4 docs
      batches.zipWithIndex.foreach { case (g, i) =>
        DedupStream.processBatch(spark, toDf(g), path, i.toLong)
      }
      def deltaDirs() = new java.io.File(path).listFiles()
        .map(_.getName).filter(_.matches("^delta-\\d{12}$")).sorted.toSeq
      // 10 folds at CompactEvery=8: a compaction ran, so far fewer than
      // 10 deltas remain and base holds the absorbed rows
      assert(deltaDirs().size < batches.size - DedupStream.CompactEvery + 2,
        deltaDirs().mkString(","))
      val total = DedupStream.loadIndex(spark, path)
      val expectedDocs = total.select("doc_id").distinct().count()

      // crashed-compaction simulation: a stale delta whose rows are
      // already in base (id <= base's newest fold) must not double-count
      val newest = total.agg(max("added_batch")).head().getLong(0)
      val staleRows = total.filter(col("added_batch") <= newest).limit(20)
      graft.state.StateStore.save(staleRows, s"$path/delta-000000000000")
      assert(DedupStream.loadIndex(spark, path)
        .select("doc_id").distinct().count() == expectedDocs)
      DedupStream.compact(spark, path)
      assert(!deltaDirs().contains("delta-000000000000")) // swept
      assert(DedupStream.loadIndex(spark, path)
        .select("doc_id").distinct().count() == expectedDocs)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      SparkEntry.releaseCaches(spark)
    }
  }

  test("non-compaction folds write O(batch) bytes: delta sizes stay flat " +
      "while the index grows, and only the compaction round rewrites O(index)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-cost").toString
    def dirBytes(f: java.io.File): Long =
      if (!f.exists()) 0L
      else if (f.isFile) f.length()
      else f.listFiles().map(dirBytes).sum
    try {
      val (orig, _) = twinDocs(35)
      val path = s"$dir/bands"
      // 7 equal-size batches — below CompactEvery=8, so every fold is a
      // pure delta write and each delta's ledger is measurable on disk
      val batches = orig.grouped(5).toSeq
      assert(batches.size == 7 && batches.forall(_.size == 5))
      val deltaSizes = batches.zipWithIndex.map { case (g, i) =>
        DedupStream.processBatch(spark, toDf(g), path, i.toLong).count()
        dirBytes(new java.io.File(f"$path/delta-${i.toLong}%012d"))
      }
      assert(deltaSizes.forall(_ > 0), deltaSizes.mkString(","))
      // O(batch), not O(accumulated index): were each fold rewriting the
      // whole index, the 7th delta would be ~7× the 1st; equal batches
      // must produce near-equal deltas (3× covers parquet footer/encoding
      // variance across survivor mixes)
      assert(deltaSizes.max <= 3 * deltaSizes.min,
        s"delta sizes grow with the index: ${deltaSizes.mkString(",")}")
      // the index itself HAS grown ~7×, so flat deltas are meaningful
      val indexed = DedupStream.loadIndex(spark, path).count()
      val firstDelta = graft.state.StateStore.load(spark, f"$path/delta-${0L}%012d",
        DedupStream.bandsSchema).count()
      assert(indexed >= 5 * firstDelta, s"index $indexed vs first delta $firstDelta")
      // the 8th fold trips compaction: base absorbs everything (the one
      // amortized O(index) write), deltas are swept
      DedupStream.processBatch(spark,
        toDf(Seq((9999999L, "wholly unique compaction trigger document"))), path, 7L).count()
      val baseBytes = dirBytes(new java.io.File(s"$path/base"))
      assert(baseBytes > deltaSizes.max,
        s"base $baseBytes not the O(index) write vs deltas ${deltaSizes.mkString(",")}")
      assert(new java.io.File(path).listFiles()
        .map(_.getName).count(_.matches("^delta-\\d{12}$")) <= 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      SparkEntry.releaseCaches(spark)
    }
  }

  test("a pre-base+delta flat ledger migrates into base/ instead of reading as empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-migrate").toString
    try {
      val (orig, _) = twinDocs(10)
      val path = s"$dir/bands"
      // old-version layout: band rows as a StateStore ledger directly
      // at the index path
      val flat = DedupQueries.rowBands(toDf(orig))
        .withColumn("added_batch", lit(4L))
      graft.state.StateStore.save(flat, path)
      val expected = flat.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSet

      val got = DedupStream.loadIndex(spark, path)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected) // nothing silently dropped
      assert(new java.io.File(s"$path/base").isDirectory) // physically migrated
      // and the guard still sees the migrated folds: a fresh-checkpoint
      // batch id below the newest migrated fold fails loud
      val e = intercept[IllegalArgumentException] {
        DedupStream.processBatch(spark, toDf(orig), path, 0L).count()
      }
      assert(e.getMessage.contains("fresh"), e.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      SparkEntry.releaseCaches(spark)
    }
  }

  test("a flat-era index stranded MID-SWAP (committed .tmp-*, dest absent) " +
      "is recovered then migrated, not read as empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-mig2").toString
    try {
      val (orig, _) = twinDocs(10)
      val path = s"$dir/bands"
      val flat = DedupQueries.rowBands(toDf(orig))
        .withColumn("added_batch", lit(2L))
      val expected = flat.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // old save() crashed between stage-out and commit: the committed
      // generation (with _SUCCESS) sits in a .tmp-* sibling, dest absent
      flat.write.parquet(s"$path.tmp-g1")
      assert(new java.io.File(s"$path.tmp-g1/_SUCCESS").exists())
      assert(!new java.io.File(path).exists())

      val got = DedupStream.loadIndex(spark, path)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected) // recovered AND migrated, nothing lost
      assert(new java.io.File(s"$path/base").isDirectory)
      assert(!new java.io.File(s"$path.tmp-g1").exists()) // sibling swept
      // guard keys off the migrated folds
      val e = intercept[IllegalArgumentException] {
        DedupStream.processBatch(spark, toDf(orig), path, 0L).count()
      }
      assert(e.getMessage.contains("fresh"), e.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      SparkEntry.releaseCaches(spark)
    }
  }

  test("admission decisions survive a mid-corpus kill/restart unchanged " +
      "(checkpointed file source + exactly-once file sink)") {
    val thr = 0.8
    val dir = java.nio.file.Files.createTempDirectory("graft-admit-restart").toString
    try {
      // same planted corpus as the batch-equality test above: originals
      // are the held corpus, truncated-prefix quotes arrive as the stream
      val originals = DedupQueries.originalDocs(spark, sf)
      val corpusSets = DedupQueries.shingleSetsOf(originals).localCheckpoint()
      val corpusBands = DedupQueries.bandKeys(
        DedupQueries.minhashFrom(corpusSets)).localCheckpoint()
      val quotesDf = Tables.documents(spark, sf)
        .withColumn("ts", split(trim(col("text")), "\\s+"))
        .select((col("doc_id") + 2000000L).as("doc_id"),
          array_join(slice(col("ts"), lit(1),
            greatest(lit(3), (size(col("ts")) / 2))), " ").as("text"))
      // ground truth: ONE uninterrupted pass over the whole quote corpus
      // through the same stateless transform, plus its raw row count
      // (per-band repeats included) — the restart must change neither
      val uninterrupted = DedupStream.admitQuotesAgainstCorpus(
        quotesDf, corpusBands, corpusSets, thr)
      val expectedRows = uninterrupted
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4), r.getBoolean(5)))
      assert(expectedRows.nonEmpty)

      val quotes = quotesDf.collect().map(r => (r.getLong(0), r.getString(1)))
      val (first, second) = quotes.splitAt(quotes.length / 2)
      val srcDir = s"$dir/src"; val outDir = s"$dir/out"; val ckDir = s"$dir/ckpt"
      // drop each half as ONE flat file in the source dir (write to a
      // staging dir, move the part file in) — the arrival pattern a
      // file-watching ingest actually sees
      def addFile(rows: Seq[(Long, String)], name: String): Unit = {
        val stage = new java.io.File(s"$dir/stage-$name")
        toDf(rows).coalesce(1).write.parquet(stage.toString)
        val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(srcDir, s"$name.parquet")
        dst.getParentFile.mkdirs()
        java.nio.file.Files.move(part.toPath, dst.toPath)
      }
      def startQuery() = DedupStream.admitQuotesAgainstCorpus(
          spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", "1").parquet(srcDir),
          corpusBands, corpusSets, thr)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append").start()

      addFile(first.toIndexedSeq, "a")
      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop() // the kill: mid-corpus, checkpoint holds the offsets
      addFile(second.toIndexedSeq, "b")
      val q2 = startQuery() // restart from the same checkpoint
      q2.processAllAvailable()
      q2.stop()
      // a third restart with NO new input must re-emit nothing
      val q3 = startQuery()
      q3.processAllAvailable()
      q3.stop()

      val got = spark.read.parquet(outDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4), r.getBoolean(5)))
      // exactly-once across the kill: same decision rows, same
      // multiplicities — nothing lost at the boundary, nothing replayed
      assert(got.length == expectedRows.length,
        s"raw rows ${got.length} vs uninterrupted ${expectedRows.length}")
      assert(got.toSet == expectedRows.toSet,
        s"restart-only=${(got.toSet -- expectedRows.toSet).take(3)} " +
          s"uninterrupted-only=${(expectedRows.toSet -- got.toSet).take(3)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      SparkEntry.releaseCaches(spark)
    }
  }

  test("streaming wiring: foreachBatch maintains the index across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stream-e2e").toString
    try {
      val (orig, vars) = twinDocs(20)
      val collected = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
      val mem = MemoryStream[(Long, String)]
      val q = DedupStream.startWithIndexMaintenance(
        mem.toDF().toDF("doc_id", "text"), s"$dir/bands", s"$dir/ckpt",
        (flags, batchId) => collected.synchronized {
          collected(batchId) = flags.select("doc_id", "dup_of").distinct()
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        })
      try {
        mem.addData(orig.toIndexedSeq: _*)
        q.processAllAvailable()
        mem.addData(vars.toIndexedSeq: _*)
        q.processAllAvailable()
      } finally q.stop()
      // batch 0 may carry a few chance original-original ties; batch 1
      // must flag the twins against batch 0's survivors
      assert(collected(1L).nonEmpty)
      assert(collected(1L).forall { case (d, o) => o < d })
      assert(collected(1L).exists { case (v, o) => o == v - Ids.VariantOffset })
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      SparkEntry.releaseCaches(spark)
    }
  }
}
