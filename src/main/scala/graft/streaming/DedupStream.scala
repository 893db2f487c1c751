package graft.streaming

import graft.operators.DedupQueries
import graft.state.StateStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Stream-static incremental dedup — the streaming twin of
  * q102_incremental_dedup: documents arrive as a stream, the corpus
  * LSH band index is a STATIC frame (in production: the persisted
  * signature index the batch pipeline maintains), and collisions come
  * from Structured Streaming's stream-static equi join.
  *
  * A stream-static join is STATELESS on the stream side — no
  * watermark, no state store, no growing memory: each micro-batch
  * derives its rows' band keys with per-row expressions
  * ([[DedupQueries.rowBands]], bit-for-bit the batch hash family) and
  * probes the static index, which Spark plans per micro-batch exactly
  * like the batch join (broadcast when the index is small, shuffle
  * when not).
  *
  * Scale: the stream side only ever hashes its own micro-batch; the
  * corpus index is loaded once per batch from its (checkpointed /
  * parquet) form. This is the ingest-time flavor of q102's
  * batch flow — flag an arriving doc the moment a band collides, defer
  * the exact Jaccard verify to the batch pass if needed.
  */
object DedupStream {

  /** Collision flags: one row per (arriving doc, corpus doc, band)
    * band collision. Downstream consumers dedup/aggregate as their
    * sink requires (a streaming `distinct` would need state; the raw
    * collision stream is the stateless, replay-safe form). */
  def flagAgainstCorpus(stream: DataFrame, corpusBands: DataFrame): DataFrame =
    DedupQueries.rowBands(stream)
      .join(corpusBands.select(col("doc_id").as("dup_of"), col("band")), Seq("band"))
      .select(col("doc_id"), col("dup_of"), col("band"))

  /** The SIMHASH twin of [[flagAgainstCorpus]] — q113's pigeonhole
    * block family at ingest time: arriving docs derive per-row block
    * signatures ([[DedupQueries.rowBlocks]], bit-for-bit the batch
    * [[DedupQueries.simhashBlockFrame]] family), probe the static
    * corpus block index on the block key, and the exact
    * bit_count(xor) Hamming verify runs INLINE on the join output
    * (signatures ride both sides — no state, no join-back, no
    * watermark), so a flag is emitted exactly for Hamming ≤
    * [[DedupQueries.SimhashHammingMax]] pairs. Keeps BOTH near-dup
    * detectors (MinHash bands + SimHash blocks) on one hash family
    * across ingest and backfill. Output may repeat a pair once per
    * colliding block; consumers dedup as their sink requires (the
    * [[flagAgainstCorpus]] convention). */
  def flagSimhashAgainstCorpus(stream: DataFrame, corpusBlocks: DataFrame): DataFrame = {
    val k = DedupQueries.SimhashBlocks
    DedupQueries.rowBlocks(stream)
      .join(corpusBlocks.select(col("bk") +: (col("doc_id").as("dup_of") +:
        (0 until k).map(j => col(s"sim$j").as(s"c_sim$j"))): _*), Seq("bk"))
      .withColumn("hamming", expr((0 until k)
        .map(j => s"bit_count(sim$j ^ c_sim$j)").mkString(" + ")).cast("int"))
      .filter(col("hamming") <= DedupQueries.SimhashHammingMax)
      .select(col("doc_id"), col("dup_of"), col("hamming"))
  }

  /** The CONTAINMENT twin of [[flagAgainstCorpus]] — q197's asymmetric
    * quote detection at ingest time: an arriving doc probes the static
    * corpus band index (same stateless band derivation,
    * [[DedupQueries.rowBandsWithSets]] — bit-for-bit the batch hash
    * family), and the exact containment verify — |arriving ∩ corpus| /
    * |arriving| — runs INLINE on the join output against the corpus
    * shingle-set frame (at scale: the persisted `sd` column of the
    * dedup index, fetched by the equi join). A flag means "this doc is
    * mostly a quote of something we already hold" — the admission
    * decision Jaccard-gated ingest misses (a short quote of a long doc
    * has low Jaccard). Stateless, no watermark; a pair may surface
    * once per colliding band with an IDENTICAL containment value —
    * consumers dedup as their sink requires (the [[flagAgainstCorpus]]
    * convention; an in-stream distinct would need state). */
  def flagQuotesAgainstCorpus(stream: DataFrame, corpusBands: DataFrame,
      corpusSets: DataFrame, minContainment: Double = 0.8): DataFrame =
    DedupQueries.rowBandsWithSets(stream)
      .join(corpusBands.select(col("doc_id").as("quoted_from"), col("band")),
        Seq("band"))
      .filter(col("doc_id") =!= col("quoted_from"))
      .join(corpusSets.select(col("doc_id").as("quoted_from"),
        col("sd").as("corpus_sd")), Seq("quoted_from"))
      .withColumn("containment",
        size(array_intersect(col("sd"), col("corpus_sd"))).cast("double") /
          size(col("sd")))
      .filter(col("containment") >= minContainment)
      .select(col("doc_id"), col("quoted_from"),
        round(col("containment"), 4).as("containment_r"))

  /** The ADMISSION-POLICY twin of q202's containment keep policy —
    * [[flagQuotesAgainstCorpus]] upgraded from review feed to
    * decision: per (arriving doc, corpus doc) band collision whose
    * max-direction containment clears `threshold`, emit BOTH exact
    * containment directions and the policy's victim under q202's
    * exact rule — both directions over the gate (near-twins) drop the
    * larger doc_id; otherwise the CONTAINED side drops. `drop_arriving`
    * is the admission verdict (victim == the arriving doc); a victim
    * on the corpus side is the retro-flag a compacting sink applies to
    * the held corpus. Same stateless shape as every twin here: band
    * derivation per-row, corpus sets fetched by the equi join, exact
    * intersection inline, no watermark; a pair may surface once per
    * colliding band with IDENTICAL values — consumers dedup as their
    * sink requires. DedupStreamSpec proves the decisions equal q202's
    * batch policy rows on the planted quote corpus. */
  def admitQuotesAgainstCorpus(stream: DataFrame, corpusBands: DataFrame,
      corpusSets: DataFrame, threshold: Double = 0.8): DataFrame =
    DedupQueries.rowBandsWithSets(stream)
      .join(corpusBands.select(col("doc_id").as("quoted_from"), col("band")),
        Seq("band"))
      .filter(col("doc_id") =!= col("quoted_from"))
      .join(corpusSets.select(col("doc_id").as("quoted_from"),
        col("sd").as("corpus_sd")), Seq("quoted_from"))
      .withColumn("inter",
        size(array_intersect(col("sd"), col("corpus_sd"))).cast("long"))
      .withColumn("c_in", col("inter").cast("double") / size(col("sd")))
      .withColumn("c_out", col("inter").cast("double") / size(col("corpus_sd")))
      .filter(greatest(col("c_in"), col("c_out")) >= threshold)
      .withColumn("victim",
        when(col("c_in") >= threshold && col("c_out") >= threshold,
          greatest(col("doc_id"), col("quoted_from")))
          .when(col("c_in") >= threshold, col("doc_id"))
          .otherwise(col("quoted_from")))
      .select(col("doc_id"), col("quoted_from"),
        round(col("c_in"), 4).as("c_in_r"),
        round(col("c_out"), 4).as("c_out_r"),
        col("victim"),
        (col("victim") === col("doc_id")).as("drop_arriving"))

  // ---- self-maintaining index: within-stream twins ----------------

  /** Probe-index ledger schema: every band of every SURVIVING (non-
    * duplicate) doc, stamped with the micro-batch that folded it in.
    * The stamp is what makes replay exact (see [[processBatch]]). */
  val bandsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("band", StringType),
    StructField("added_batch", LongType)))

  /** One micro-batch of the SELF-MAINTAINING dedup flow: flag the
    * arriving docs against the persisted probe index AND against each
    * other, then fold the survivors' bands into the index — so a twin
    * arriving in a LATER micro-batch collides with a doc this one
    * admitted (the gap a static corpus index leaves open).
    *
    * Returns the flag rows (doc_id, dup_of, band): band collisions
    * against earlier-batch survivors, plus within-batch collisions
    * attributed to the lowest-id colliding doc (deterministic under
    * replay, no arrival-order dependence inside a batch).
    *
    * EXACTLY-ONCE under foreachBatch's at-least-once replay, without a
    * side channel: rows folded by batch N carry `added_batch = N`, and
    * both the probe and the fold ignore ledger rows with
    * `added_batch >= batchId`. A replayed batch therefore probes the
    * identical pre-fold index (same flags out) and re-derives the
    * identical fold (no double-add, no lost rows) — the StateStore
    * generation swap makes each fold crash-atomic in between.
    *
    * Scale: the stream side hashes only its own micro-batch, and the
    * fold is a BASE+DELTA layout: each batch writes only its own
    * survivors as `delta-<batchId>` (O(batch) bytes, one atomic
    * generation swap on its own path), and every `CompactEvery`
    * deltas the index folds them into `base/` (the only O(index)
    * write, amortized). Crash consistency is stamp-guarded, not
    * multi-path-atomic: loads take base plus only the deltas whose
    * batch id EXCEEDS base's newest `added_batch`, so a crash between
    * "new base committed" and "old deltas swept" leaves stale deltas
    * that every subsequent load provably ignores (and the next
    * compaction sweeps). Replay overwrites its own delta path
    * atomically — same content, no double-fold. */
  private[graft] val CompactEvery = 8

  private def basePath(p: String) = s"$p/base"
  private def deltaPath(p: String, id: Long) = f"$p/delta-$id%012d"
  private val DeltaName = """^delta-(\d{12})$""".r

  /** (committed delta ids, present on disk) — StateStore's in-flight
    * `.tmp-*`/`.old-*` generation suffixes are excluded by the exact
    * name match. */
  private def deltaIds(spark: SparkSession, p: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(p)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.map(_.getPath.getName).collect {
      case DeltaName(id) => id.toLong
    }.sorted
  }

  /** Roll a PRE-base+delta flat ledger (parquet files directly at
    * `indexPath`) into `base/`. Without this, loadIndex would read an
    * old-version index as EMPTY and the fresh-checkpoint guard (which
    * keys off the newest fold) would never fire — the exact silent
    * re-admission the guard exists to prevent. The two renames are
    * crash-recoverable: a stranded `.mig-flat` staging dir is rolled
    * forward before anything reads the index. */
  private def migrateFlatLayout(spark: SparkSession, indexPath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(indexPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(indexPath + ".mig-flat")
    if (fs.exists(staging)) { // crashed mid-migration: roll forward
      if (!fs.exists(dir)) require(fs.mkdirs(dir), s"cannot recreate $dir")
      require(fs.rename(staging, new Path(basePath(indexPath))),
        s"cannot finish flat-layout migration at $indexPath")
      return
    }
    def entries: Seq[String] =
      if (fs.exists(dir)) fs.listStatus(dir).toSeq.map(_.getPath.getName) else Seq.empty
    val hasNewLayout = entries.exists(n => n == "base" || DeltaName.matches(n))
    if (!hasNewLayout) {
      // A flat-era ledger may be settled at `dir` — or stranded
      // MID-SWAP by the old code's save() crash: `dir` absent, the
      // committed generation sitting in a `.tmp-*`/`.old-*` SIBLING.
      // StateStore.load runs that generation recovery as its side
      // effect (roll forward a committed tmp, restore the newest old)
      // and tolerates a truly-absent path — after it, `dir` holds the
      // settled flat ledger iff one ever existed.
      StateStore.load(spark, indexPath, bandsSchema)
      if (entries.exists(n => n.startsWith("part-") || n == "_SUCCESS")) {
        require(fs.rename(dir, staging), s"cannot stage flat layout at $indexPath")
        require(fs.mkdirs(dir), s"cannot recreate $dir")
        require(fs.rename(staging, new Path(basePath(indexPath))),
          s"cannot finish flat-layout migration at $indexPath")
      }
    }
  }

  /** (live index view, newest folded batch id or -1). One base scan:
    * delta rows carry `added_batch == their directory id` by
    * construction, so the newest fold is max(base's newest, last delta
    * id) without a second full-index aggregation. */
  private def loadIndexWithNewest(spark: SparkSession, indexPath: String)
      : (DataFrame, Long) = {
    migrateFlatLayout(spark, indexPath)
    val base = StateStore.load(spark, basePath(indexPath), bandsSchema)
    val baseNewest = base.agg(max("added_batch")).head() match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }
    val liveDeltas = deltaIds(spark, indexPath).filter(_ > baseNewest)
    val view = liveDeltas
      .map(id => StateStore.load(spark, deltaPath(indexPath, id), bandsSchema))
      .foldLeft(base)(_ unionByName _)
    (view, math.max(baseNewest, liveDeltas.lastOption.getOrElse(-1L)))
  }

  /** The live index view: base ∪ the deltas newer than base's newest
    * fold (staleness filter — see the layout note on [[processBatch]]). */
  def loadIndex(spark: SparkSession, indexPath: String): DataFrame =
    loadIndexWithNewest(spark, indexPath)._1

  /** Fold the deltas into base (the amortized O(index) write), then
    * sweep the absorbed delta dirs. The sweep set is the DELTA IDS
    * snapshotted before the fold — not a row-stamp comparison, which
    * would never sweep an EMPTY delta (a zero-survivor batch) and let
    * trailing empties pin the compaction cadence at every-batch.
    * Safe at any moment: a crash after the base commit leaves deltas
    * whose rows base already holds, which loads ignore by stamp. */
  def compact(spark: SparkSession, indexPath: String): Unit = {
    val ids = deltaIds(spark, indexPath) // snapshot BEFORE the fold
    if (ids.isEmpty) return
    val all = loadIndex(spark, indexPath).localCheckpoint()
    StateStore.save(all, basePath(indexPath), bucketCols = Seq("band"))
    val dir = new org.apache.hadoop.fs.Path(indexPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ids.foreach(id =>
      fs.delete(new org.apache.hadoop.fs.Path(deltaPath(indexPath, id)), true))
  }

  def processBatch(spark: SparkSession, batchDocs: DataFrame,
      indexPath: String, batchId: Long): DataFrame = {
    val (full, newestFold) = loadIndexWithNewest(spark, indexPath)
    // The replay filter is DESTRUCTIVE by design for rows stamped >=
    // batchId — correct when the same checkpoint replays its last
    // batch, catastrophic when an operator restarts the stream with a
    // FRESH checkpoint (batchId resets to 0) against an accumulated
    // index: every probe would come up empty and the fold would wipe
    // the ledger. Structured Streaming ids are sequential, so a
    // legitimate batchId is never more than one step behind the newest
    // fold — anything older is a checkpoint/index mismatch; fail loud.
    if (newestFold >= 0)
      require(batchId >= newestFold,
        s"dedup index at $indexPath was folded up to batch $newestFold " +
          s"but this stream is at batch $batchId — restarted with a fresh " +
          "checkpoint? Reuse the original checkpoint or rebuild the index.")
    val ledger = full.filter(col("added_batch") < batchId)
    val batchBands = DedupQueries.rowBands(batchDocs).localCheckpoint()
    // hot-band cap, the same family as the batch chain
    // (candidatePairsFrom / DedupIndex.flagsAgainst): a ledger band
    // with m members fans every probing doc out m ways, and a
    // boilerplate crowd inside one micro-batch self-joins m² — both
    // arms reduce a hot band to its min-id REPRESENTATIVE row on the
    // survivor (dup_of) side of the join, so an over-cap crowd still
    // flags (against the rep, linear fan-out) instead of probing
    // empty. The round-15 drop-the-band form made an over-cap
    // micro-batch crowd fold WHOLE into the ledger and then hid the
    // poisoned band from every future probe — unbounded duplicate
    // admission (the round-15 advice's high finding). Replay-exact:
    // the cap is a pure function of the same stamp-filtered ledger the
    // probe reads, so a replayed batch computes the identical kept set.
    val cappedLedger = DedupQueries.cappedBands(
      ledger.select(col("doc_id"), col("band")), DedupQueries.DefaultBandCap)
    val corpusFlags = batchBands
      .join(cappedLedger.select(col("doc_id").as("dup_of"), col("band")), Seq("band"))
      .select(col("doc_id"), col("dup_of"), col("band"))
    // rep side = dup_of: a hot band's rep is its min id, so every
    // other member pairs (dup_of < doc_id) and is flagged — the crowd
    // collapses to ONE survivor whose bands alone fold into the ledger
    val cappedBatch = DedupQueries.cappedBands(batchBands, DedupQueries.DefaultBandCap)
    val withinBatch = batchBands
      .join(cappedBatch.select(col("doc_id").as("dup_of"), col("band")), Seq("band"))
      .filter(col("dup_of") < col("doc_id"))
      .select(col("doc_id"), col("dup_of"), col("band"))
    val flags = corpusFlags.unionByName(withinBatch).localCheckpoint()
    val survivorBands = batchBands
      .join(flags.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    // O(batch) fold: this batch's survivors go to their OWN delta path
    // (atomic swap; a replay overwrites the same path with the same
    // content). Earlier-stamped rows are never rewritten here.
    StateStore.save(
      survivorBands.withColumn("added_batch", lit(batchId)),
      deltaPath(indexPath, batchId), bucketCols = Seq("band"))
    if (deltaIds(spark, indexPath).size >= CompactEvery) compact(spark, indexPath)
    flags
  }

  /** Streaming wiring: readStream → foreachBatch([[processBatch]]) →
    * caller's sink. The sink receives (flags, batchId) and must be
    * idempotent on batchId (the foreachBatch contract); the index side
    * needs nothing more — replay regenerates identical flags and an
    * identical fold. */
  def startWithIndexMaintenance(stream: DataFrame, indexPath: String,
      checkpointDir: String, sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(processBatch(batch.sparkSession, batch, indexPath, batchId), batchId)
      }
      .start()
}
