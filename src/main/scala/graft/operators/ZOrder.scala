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
      doc = "Morton z-order key: bit-interleaved (l_partkey, l_suppkey) for 2-D data-skipping layout"))
}
