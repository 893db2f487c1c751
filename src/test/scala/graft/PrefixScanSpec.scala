package graft

import graft.operators.PrefixScan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix scan must be value-identical to the
  * single-partition window it replaces, for any input placement — the
  * associativity claim PrefixScan's scaladoc makes, checked against
  * Spark's own `max() OVER (ORDER BY …)` on data small enough that the
  * scale-killer form is runnable. */
class PrefixScanSpec extends SparkSpecBase {

  test("runningMaxExclusive equals the single-partition window form") {
    import spark.implicits._
    try {
      // non-monotone values over a shuffled arrival order
      val df = (0L until 5000L).map { i =>
        (i, (i * 2654435761L) % 9973L)
      }.toDF("seq", "v").repartition(7)
      val got = PrefixScan
        .runningMaxExclusive(df, Seq(col("seq")), "v", "rm")
        .select("seq", "rm")
      val w = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, -1)
      val want = df.withColumn("rm2", max(col("v")).over(w)).select("seq", "rm2")
      assert(got.join(want, Seq("seq"))
        .filter(!(col("rm") <=> col("rm2"))).count() == 0)
      // the global first row has no preceding rows → null
      val first = got.orderBy("seq").limit(1).collect()(0)
      assert(first.isNullAt(1))
    } finally SparkEntry.releaseCaches(spark)
  }

  test("runningSumExclusive equals the single-partition window form, first row 0") {
    import spark.implicits._
    try {
      val df = (0L until 4000L).map(i => (i, (i * 69621L) % 131L)).toDF("seq", "v")
        .repartition(5)
      val got = PrefixScan
        .runningSumExclusive(df, Seq(col("seq")), "v", "rs")
        .select("seq", "rs")
      val w = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, -1)
      val want = df
        .withColumn("rs2", coalesce(sum(col("v")).over(w), lit(0L)))
        .select("seq", "rs2")
      assert(got.join(want, Seq("seq"))
        .filter(!(col("rs") <=> col("rs2"))).count() == 0)
      assert(got.orderBy("seq").limit(1).collect()(0).getLong(1) == 0L)
    } finally SparkEntry.releaseCaches(spark)
  }

  test("result is independent of source partitioning") {
    import spark.implicits._
    try {
      val base = (0L until 2000L).map(i => (i, (i * 48271L) % 197L)).toDF("seq", "v")
      val a = PrefixScan.runningMaxExclusive(base.repartition(3), Seq(col("seq")), "v", "rm")
      val b = PrefixScan.runningMaxExclusive(base.repartition(17), Seq(col("seq")), "v", "rm")
      assert(a.join(b.withColumnRenamed("rm", "rm2"), Seq("seq"))
        .filter(!(col("rm") <=> col("rm2"))).count() == 0)
    } finally SparkEntry.releaseCaches(spark)
  }
}
