package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an independent DuckDB oracle the
  * driver hash-compares against at sf0.01.
  *
  * Oracle parity rules (SURVEY.md §7.3):
  *  - identical output column NAMES on both sides (driver sorts columns
  *    by name before hashing);
  *  - deterministic ORDER BY on both sides, with `NULLS FIRST` spelled
  *    out in DuckDB (Spark ascending = nulls first, DuckDB = nulls last);
  *  - no raw double SUM/AVG in outputs — shuffle order makes fp addition
  *    non-associative; cast inputs to DECIMAL(18,4) first (exact,
  *    associative), then final-cast the aggregated decimal to DOUBLE on
  *    BOTH sides. The exact-decimal → nearest-double conversion is
  *    deterministic and engine-identical ONLY when routed through a
  *    VARCHAR round-trip on the DuckDB side: DuckDB's decimal→double
  *    cast divides two separately-rounded doubles, off by 1 ulp once
  *    the unscaled value passes 2^53 (bit at sf0.1, q01), while
  *    string→double parsing is correctly rounded in both engines.
  *    Likewise never cast a raw double to DECIMAL: Spark rounds
  *    HALF_UP on the value's shortest repr, DuckDB half-even on the
  *    binary expansion — exact grid midpoints diverge (q90 at sf0.1);
  *    fold doubles in a deterministic order instead. A DECIMAL output column
  *    reaches the driver's pandas canonicalization as object-dtype
  *    `Decimal(...)` vs DuckDB's float64 and hash-mismatches despite
  *    equal values (round-1 verdict);
  *  - no ARRAY-typed output columns — they become numpy arrays in the
  *    driver's canonicalization and are unhashable. Emit scalar
  *    element_at projections or concat_ws strings instead.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  /** Oracle-side helper: exact decimal sum of a double column,
    * final-cast to DOUBLE (order-independent internally, hash-comparable
    * externally). */
  def sumDec(col: String, as: String): String =
    s"CAST(CAST(sum(CAST($col AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS $as"

  /** Signed-zero-safe rounding for any output column whose domain
    * includes negative values near zero (correlations, slopes, kappas,
    * log-ratios): `round` keeps IEEE −0.0 when a tiny negative rounds
    * to zero, and the two engines can disagree on the SIGN of that zero
    * while agreeing on the value — a repr-level hash mismatch (q160 at
    * sf1, r18). `+ 0.0` folds −0.0 to +0.0 and is a no-op for every
    * other value. Use with the matching [[roundZSql]] fragment so the
    * fix lives at the query/oracle SOURCE and the gates can stay
    * bit-strict (r18 advice). */
  def roundZ(c: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.round(c, n) + 0.0

  /** Oracle-side (DuckDB) fragment matching [[roundZ]]. */
  def roundZSql(expr: String, n: Int): String =
    s"round($expr, $n) + 0.0"
}
