package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE hash-split definition — q109 assigns it, q110 audits it, and
  * the audit is only meaningful while both (and both oracles) use the
  * same thresholds, so there is exactly one definition of each form
  * (the shingle/band-expression lesson applied to splits).
  *
  * The 2-hex-digit md5 prefix is the bucket: lowercase hex compares
  * lexicographically == numerically, so the thresholds are plain
  * string comparisons that run identically in Spark and DuckDB
  * ('cc' = 204/256 ≈ 80% train, 'e6' = 230 ≈ 10% val, rest test).
  */
object Splits {

  def splitCol(id: Column): Column = {
    val b = substring(md5(id.cast("string")), 1, 2)
    when(b < "cc", "train").when(b < "e6", "val").otherwise("test")
  }

  /** The identical CASE in DuckDB SQL, for an id column name. */
  def splitSql(idCol: String): String =
    s"""CASE WHEN substr(md5(CAST($idCol AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
         WHEN substr(md5(CAST($idCol AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
         ELSE 'test' END"""
}

/** One definition of the micro-precision time-bin key shared by the
  * batch interval join (q108) and its streaming twin
  * ([[graft.streaming.IntervalJoinStream]]) — the two must bin
  * identically or the twins quietly diverge. */
object TimeBins {
  def bin(tsExpr: String, widthSeconds: Long): Column =
    expr(s"floor(unix_micros($tsExpr) / ${widthSeconds * 1000000L}L)")
}
