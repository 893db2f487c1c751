package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connector-init validation — the reference's `mustInit` checks
  * (lib/gh.js:48-190) as dataset operations:
  *
  *  - J10: configured names semi/anti-joined against the fetched
  *    dimension; misses collected and reported (gh.js:91-142 collects
  *    the difference, prints a remediation table, exits non-zero);
  *  - J11: single-select value → option-id lookup where a miss is a
  *    hard error (gh.js:439-452 throws) — expressed with raise_error
  *    so the failure surfaces from the executor exactly where the bad
  *    row is, not as a driver-side post-hoc scan.
  */
object ConfigValidation {

  /** Names in `expected` with no match in `actual` (J10's EXCEPT). */
  def missing(expected: DataFrame, actual: DataFrame, key: String): DataFrame =
    expected.join(actual, Seq(key), "left_anti")

  /** Driver-side gate: throws listing every missing name (the engine's
    * equivalent of gh.js:144-176's report + process.exit(1)). */
  def requireAllPresent(expected: DataFrame, actual: DataFrame, key: String,
      what: String): Unit = {
    val miss = missing(expected, actual, key).select(key)
      .collect().map(_.getString(0))
    if (miss.nonEmpty)
      throw new IllegalStateException(
        s"config validation failed: $what not found: ${miss.mkString(", ")}")
  }

  /** J11: map a value column to its option id via a broadcast options
    * dim; unmatched values raise from the executor with the offending
    * value in the message. `options` must have (option_name, option_id). */
  def resolveOptionId(values: DataFrame, valueCol: String, options: DataFrame): DataFrame = {
    val resolved = values.join(broadcast(options),
      col(valueCol) === col("option_name"), "left")
    resolved.withColumn("option_id",
      when(col("option_id").isNotNull, col("option_id"))
        .otherwise(raise_error(concat(
          lit(s"no option named '"), col(valueCol), lit("'")))))
      .drop("option_name")
  }

  /** Column form of the miss check for inline assertions. */
  def assertPresent(value: Column, allowed: Seq[String]): Column =
    when(value.isin(allowed: _*), value)
      .otherwise(raise_error(concat(lit("unexpected value '"), value, lit("'"))))
}
