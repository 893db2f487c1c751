package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** MERGE-style keyed state — the Spark-native replacement for the
  * reference's dom-storage/json-storage KV ledger (etl.js:14-19).
  *
  * Key families the reference stores (etl.js:9,10,33-39,183-190,224-232)
  * map to rows `(entity_kind, entity_id, payload, migration, field_cache)`:
  * `card:<id>`, `checkItem:<id>`, `meta:card:<id>`, ... become
  * (kind, id) pairs instead of string-concatenated keys, so the schema —
  * not call-site discipline — guarantees shape (the reference writes the
  * wrong value type at etl.js:117,127,140; a typed table cannot).
  *
  * All operations are pure DataFrame → DataFrame: change-set extraction
  * is a left join + value inequality filter (the reference's per-field
  * change detection, etl.js:113-146), application is anti-join + union.
  * At scale both shuffle once on the key; persist the state table
  * bucketed by the key to make the MERGE co-partitioned.
  */
object StateStore {

  /** Migration levels (etl.js:3-4): checkpoint phases of an entity. */
  val MCreated = 0
  val MLists = 1

  /** Rows of `desired` that are new or differ from `written` on any of
    * `valueCols` — the minimal sink write set (J9). Output columns:
    * key cols, valueCols (desired values), `change_type`.
    *
    * Comparison is null-safe (`NOT (a <=> b)`): a value transitioning
    * to or from NULL is a real update, where plain `=!=` would evaluate
    * to NULL and silently drop the row. Row existence in `written` is
    * detected with an explicit marker column, not null-ness of a value
    * column — a stored row whose first value is legitimately NULL must
    * classify as `update`, never `insert`. */
  def changeSet(
      desired: DataFrame,
      written: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val w = valueCols.foldLeft(written)((df, c) => df.withColumnRenamed(c, s"__w_$c"))
      .select((keyCols ++ valueCols.map(c => s"__w_$c")).map(col): _*)
      .withColumn("__w_exists", lit(true))
    val joined = desired.join(w, keyCols, "left")
    val anyMissing = col("__w_exists").isNull
    val anyDiff = valueCols
      .map(c => !(col(c) <=> col(s"__w_$c")))
      .reduce(_ || _)
    joined
      .filter(anyMissing || anyDiff)
      .withColumn("change_type", when(anyMissing, "insert").otherwise("update"))
      .select((keyCols ++ valueCols :+ "change_type").map(col): _*)
  }

  /** Apply a change set: changed/new rows replace, untouched rows kept. */
  def merge(state: DataFrame, changes: DataFrame, keyCols: Seq[String]): DataFrame = {
    val incoming = changes.select(state.columns.toIndexedSeq.map(col): _*)
    state.join(incoming, keyCols, "left_anti").unionByName(incoming)
  }

  /** Checkpoint bump (etl.js:164-165): raise migration level for keys. */
  def bumpMigration(state: DataFrame, keys: DataFrame, keyCols: Seq[String],
      level: Int): DataFrame = {
    val bumped = state.join(keys.select(keyCols.map(col): _*), keyCols, "left_semi")
      .withColumn("migration", greatest(col("migration"), lit(level)))
    state.join(keys.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(bumped)
  }

  // ---------------------------------------------------------------
  // durable round-trip — the reference's db.json persists between
  // runs (etl.js:14-19); these give the batch ledgers the same
  // restart semantics: run → save, load → re-run sends nothing.
  // ---------------------------------------------------------------

  /** Persist a ledger as parquet, atomically: the frame fully
    * materializes into a sibling temp dir FIRST, then a rename swaps
    * it in (with the superseded generation renamed aside and deleted
    * last). The atomicity comes from the directory-level renames, NOT
    * from a single file — so the write itself stays parallel: the
    * ledger is entity-count-sized (one row per migrated entity,
    * forever), and at scale a single-task write would serialize it.
    * Pass `bucketCols` (the ledger key) to hash-partition the WRITE by
    * key — each key's rows land in one file, which bounds the files a
    * keyed reader must touch. (Plain parquet carries no bucketing
    * metadata, so a reload still reports unknown partitioning to
    * Spark; full join co-partitioning would need `bucketBy` +
    * `saveAsTable`. What this buys is write parallelism and a stable
    * key→file layout, not a shuffle-free reload join.) With
    * `numBuckets = 0` AQE sizes the bucket count to the data (a small
    * ledger collapses to one file, a 100×-scale one fans out); a
    * positive `numBuckets` pins the count.
    *
    * Because the temp write completes before `path` is touched, saving
    * a frame that was itself LOADED from `path` is safe
    * (self-overwrite). A crash mid-swap leaves only `.tmp-*`/`.old-*`
    * generations; [[load]] (and the next [[save]]) runs [[recover]],
    * which rolls the newest committed generation back in — readers see
    * the old ledger or the new one, never a half-written directory and
    * never a silently-empty one. */
  def save(ledger: DataFrame, path: String, bucketCols: Seq[String] = Nil,
      numBuckets: Int = 0): Unit = {
    val spark = ledger.sparkSession
    val dest = new Path(path)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (recover(fs, dest)) spark.catalog.refreshByPath(path)
    val stamp = nextStamp()
    val tmp = new Path(path + s".tmp-$stamp")
    val old = new Path(path + s".old-$stamp")
    val out =
      if (bucketCols.nonEmpty && numBuckets > 0)
        ledger.repartition(numBuckets, bucketCols.map(col): _*)
      else if (bucketCols.nonEmpty) ledger.repartition(bucketCols.map(col): _*)
      else ledger
    out.write.mode("overwrite").parquet(tmp.toString)
    val hadPrev = fs.exists(dest)
    if (hadPrev) require(fs.rename(dest, old), s"could not stage out $dest")
    require(fs.rename(tmp, dest), s"could not commit $tmp -> $dest")
    if (hadPrev) fs.delete(old, true)
    // frames loaded from `path` BEFORE this save hold the old file
    // list — drop the cached metadata; callers re-load after a save
    spark.catalog.refreshByPath(path)
  }

  /** Load a ledger saved by [[save]]; an absent path is an empty
    * ledger (first run — the reference's missing db.json). Runs
    * [[recover]] first, so a crash between [[save]]'s stage-out and
    * commit renames does NOT read as a first run (which would re-send
    * every external mutation). */
  def load(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val dest = new Path(path)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a recovery rename replaces dest's files under a path this session
    // may have scanned before — drop the cached listing or the next
    // plan reads deleted part files (FileNotFoundException)
    if (recover(fs, dest)) spark.catalog.refreshByPath(path)
    if (fs.exists(dest)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Roll an interrupted [[save]] forward (or back) and sweep strays.
    *
    * If sibling generations exist, a save crashed mid-swap. The commit
    * point is the `_SUCCESS` marker: a `.tmp-*` carrying one holds a
    * fully-written NEW generation whose recorded mutations were
    * already sent, so it rolls FORWARD over whatever `dest` holds
    * (re-reading the superseded generation would re-send them). With
    * no committed tmp, an absent `dest` is restored from the newest
    * `.old-*` (the staged-out previous generation) — never silently
    * read as an empty first run. Everything else — incomplete tmp
    * writes, superseded old generations — is deleted once `dest` is
    * settled.
    *
    * Returns true when anything under `dest`'s parent changed — the
    * caller must then invalidate Spark's cached file listing for the
    * path (a rename swaps part files a live session may have scanned). */
  /** Generation stamps must ORDER, not just differ: recover picks the
    * newest committed generation, and filesystem mtime has 1 s
    * granularity on some filesystems — rapid crash-retry cycles tie
    * and `maxBy(mtime)` then resolves arbitrarily. The stamp is
    * zero-padded wall-clock millis (comparable ACROSS JVM restarts,
    * unlike nanoTime whose origin is per-JVM) plus a per-JVM counter
    * (strict order WITHIN a JVM); lexicographic compare == temporal. */
  private val stampSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private def nextStamp(): String =
    f"${System.currentTimeMillis()}%013d-${stampSeq.incrementAndGet()}%06d"
  private def stampOf(p: Path, marker: String): String = {
    val n = p.getName
    n.substring(n.indexOf(marker) + marker.length)
  }
  /** Pre-millis-stamp generations carry random 8-hex-char stamps; a
    * hex LETTER sorts above every digit, so during an upgrade window a
    * stranded legacy generation would lexicographically outrank every
    * new wall-clock stamp and recovery would prefer stale state. Rank:
    * wall-clock-format stamps order among themselves lexicographically
    * (== temporally) and ALWAYS beat legacy stamps; legacy stamps fall
    * back to mtime order among themselves (the best signal they have). */
  private val WallClockStamp = """\d{13}-\d{6}""".r
  private def stampKey(
      fs: org.apache.hadoop.fs.FileSystem, p: Path, marker: String): (Int, String) =
    stampOf(p, marker) match {
      case s @ WallClockStamp() => (1, s)
      case _ => (0, f"${fs.getFileStatus(p).getModificationTime}%020d")
    }

  private def recover(
      fs: org.apache.hadoop.fs.FileSystem, dest: Path): Boolean = {
    val parent = dest.getParent
    if (parent == null || !fs.exists(parent)) return false
    val name = dest.getName
    def generations(): (Array[Path], Array[Path]) = {
      val sibs = fs.listStatus(parent).map(_.getPath)
      (sibs.filter(_.getName.startsWith(name + ".tmp-")),
        sibs.filter(_.getName.startsWith(name + ".old-")))
    }
    val (tmps, olds) = generations()
    if (tmps.isEmpty && olds.isEmpty) return false
    def newest(ps: Array[Path], marker: String): Option[Path] =
      if (ps.isEmpty) None
      else Some(ps.maxBy(p => stampKey(fs, p, marker)))
    newest(tmps.filter(p => fs.exists(new Path(p, "_SUCCESS"))), ".tmp-") match {
      case Some(committed) =>
        if (fs.exists(dest))
          require(fs.delete(dest, true), s"could not clear superseded $dest")
        require(fs.rename(committed, dest), s"could not recover $committed -> $dest")
      case None if !fs.exists(dest) =>
        newest(olds, ".old-").foreach { g =>
          require(fs.rename(g, dest), s"could not recover $g -> $dest")
        }
      case None => // dest is the live generation; only strays remain
    }
    val (strayTmps, strayOlds) = generations()
    (strayTmps ++ strayOlds).foreach(p => fs.delete(p, true))
    true
  }
}
