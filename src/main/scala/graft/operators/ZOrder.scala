package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the physical-layout lever for
  * multi-column data skipping at 100 TB: interleave the bits of two
  * sort keys so rows close in EITHER dimension land in the same files,
  * and per-file min/max footer stats prune scans filtered on either
  * column (a plain sort only prunes its leading column).
  *
  * The Morton key is pure 64-bit integer arithmetic (mask to 31 bits,
  * spread with the classic magic-mask doubling sequence, interleave) —
  * the SAME generated SQL string runs in Spark and DuckDB, so the
  * operator is exactly oracle-checkable, and inside Spark it stays a
  * codegen'd expression (no UDF).
  */
object ZOrder {

  // 2-D bit-spread: b_i of a 31-bit input moves to b_{2i}; the z-key
  // of (a, b) is spread(a) | spread(b) << 1 — 62 bits, always positive
  // in a signed 64-bit BIGINT. Magic masks are the standard doubling
  // sequence, written in decimal so the one string parses identically
  // in Spark SQL and DuckDB.
  private val spreadSteps = Seq(
    16 -> "281470681808895", // 0x0000FFFF0000FFFF
    8 -> "71777214294589695", // 0x00FF00FF00FF00FF
    4 -> "1085102592571150095", // 0x0F0F0F0F0F0F0F0F
    2 -> "3689348814741910323", // 0x3333333333333333
    1 -> "6148914691236517205") // 0x5555555555555555

  // The CAST pins the arithmetic to 64-bit: `2147483647` types as INT
  // in both Spark and DuckDB, so without it an IntegerType input keeps
  // the whole spread in 32-bit and `<< 16` wraps — silently corrupt
  // z-keys for any value >= 2^16.
  private def spreadSql(x: String): String =
    spreadSteps.foldLeft(s"(CAST($x AS BIGINT) & 2147483647)") { case (acc, (shift, mask)) =>
      s"((($acc) | (($acc) << $shift)) & $mask)"
    }

  /** The interleaved-key formula as engine-portable SQL. */
  def mortonSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** Morton key column for two non-negative integer columns. */
  def zKey(a: String, b: String): Column = expr(mortonSql(a, b))

  /** Cluster a frame for writing: range-partition and sort by the
    * z-key, so each output file covers a compact 2-D tile of the
    * (a, b) space and its parquet footer min/max prunes filters on
    * EITHER column. A write-once layout job: repartitionByRange's
    * sampling pass re-executes the upstream — pin expensive inputs
    * first (the GlobalRank lesson) or call this straight off a scan. */
  def cluster(df: DataFrame, a: String, b: String, partitions: Int): DataFrame =
    df.withColumn("__z", zKey(a, b))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Write a z-clustered layout PLUS its skipping manifest: after the
    * clustered write, one small job records each output file's
    * per-dimension min/max into `_zindex/` under the same path (the
    * underscore prefix keeps it invisible to normal parquet listings,
    * like `_SUCCESS`). The manifest is the file-level data-skipping
    * layer Spark's parquet scan doesn't do by itself (footer stats
    * prune row groups inside a file, never whole files) — the
    * hand-rolled form of a Delta/Iceberg data-skipping index, which is
    * exactly what the z-order layout exists to feed. */
  def writeClustered(df: DataFrame, path: String, a: String, b: String,
      partitions: Int): Unit = {
    val spark = df.sparkSession
    cluster(df, a, b, partitions).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(a)).as("min_a"), max(col(a)).as("max_a"),
        min(col(b)).as("min_b"), max(col(b)).as("max_b"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zindex")
  }

  /** Read back a [[writeClustered]] layout under a 2-D box predicate
    * `a ∈ [aLo, aHi] ∧ b ∈ [bLo, bHi]`, scanning ONLY the files whose
    * manifest ranges intersect the box. The box filter is re-applied to
    * the surviving files (the manifest can only ever widen the file
    * set, never substitute for the predicate), so results are exact.
    * The manifest collect is one row per data file — at 100 TB that is
    * ~10⁵ rows on the driver, the same order every table format's
    * planner holds for split generation.
    *
    * No-intersection fast path: when the manifest is FRESH — it names
    * exactly the data files currently under `path`, which is what
    * [[writeClustered]] leaves behind — an empty intersection PROVES
    * the box matches nothing, so the read is an empty relation
    * (`limit 0` folds to a LocalRelation: zero files opened,
    * ScaleLayoutSpec pins numFiles == 0). A STALE manifest (files
    * added/rewritten since) fails the name-set check and falls back to
    * scanning the full path with the predicate — correctness is never
    * entrusted to a manifest that disagrees with the directory. The
    * freshness probe is a driver-side file LISTING (the same listing
    * any scan plans from), never a footer read — at 100 TB the stale
    * fallback's full-footer pass is the thing this path avoids. */
  def readBox(spark: org.apache.spark.sql.SparkSession, path: String,
      a: String, b: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame = {
    def norm(s: String): String =
      new org.apache.hadoop.fs.Path(s).toUri.getPath
    val manifest = spark.read.parquet(s"$path/_zindex")
    val files = manifest
      .filter(col("max_a") >= aLo && col("min_a") <= aHi &&
        col("max_b") >= bLo && col("min_b") <= bHi)
      .select("file").collect().map(_.getString(0))
    val base = spark.read.parquet(path)
    def pred(df: DataFrame): DataFrame =
      df.filter(col(a).between(aLo, aHi) && col(b).between(bLo, bHi))
    if (files.nonEmpty) pred(spark.read.parquet(files.toIndexedSeq: _*))
    else {
      val manifested = manifest.select("file").collect().map(r => norm(r.getString(0))).toSet
      val live = base.inputFiles.map(norm).toSet
      if (manifested == live) pred(base).limit(0) // proven empty: zero files read
      else pred(base) // stale manifest: trust only the predicate
    }
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q103_zorder_key",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          zKey("l_partkey", "l_suppkey").as("z_key"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber,
          ${mortonSql("l_partkey", "l_suppkey")} AS z_key
        FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
      doc = "Morton z-order key: bit-interleaved (l_partkey, l_suppkey) for 2-D data-skipping layout"),

    // ---- the layout loop CLOSED: write the z-clustered layout with
    //      its skipping manifest, read it back under a 2-D box
    //      predicate through the manifest (only intersecting files are
    //      scanned — ScaleLayoutSpec pins the pruned file count via
    //      the scan's own numFiles metric), and aggregate. The oracle
    //      computes the same aggregate from the raw table: equality
    //      proves the pruned read is exact, not just fast.
    QueryDef(
      "q105_zorder_pruned_scan",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val li = Tables.lineitem(s, d)
        val mx = li.agg(max("l_partkey"), max("l_suppkey")).head()
        val (pHi, sHi) = (mx.getLong(0) / 4, mx.getLong(1) / 4)
        val dir = s"${sys.props("java.io.tmpdir")}/graft-q105-layout-${
          java.lang.Integer.toHexString(d.hashCode)}"
        writeClustered(
          li.select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_returnflag"),
          dir, "l_partkey", "l_suppkey", 16)
        readBox(s, dir, "l_partkey", "l_suppkey", 1, pHi, 1, sHi)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast(DecimalType(18, 4))).cast("double").as("sum_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
          CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
          CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
        FROM lineitem
        WHERE l_partkey BETWEEN 1 AND (SELECT max(l_partkey) // 4 FROM lineitem)
          AND l_suppkey BETWEEN 1 AND (SELECT max(l_suppkey) // 4 FROM lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "z-order layout round-trip: manifest-pruned 2-D box scan over the clustered layout, exact aggregate"))
}
