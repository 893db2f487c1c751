package graft

import graft.functions.TextFunctions.array_distinct_count
import org.apache.spark.sql.functions._

/** Fused distinct-count: exact agreement with size(array_distinct(x))
  * and the optimizer-rule rewrite. */
class TextExpressionsSpec extends SparkSpecBase {

  test("array_distinct_count equals size(array_distinct(x)) on all shapes") {
    val df = spark.sql("""SELECT * FROM VALUES
        (array('a', 'b', 'a', 'c', 'b')),
        (array('x')),
        (array()),
        (array('a', CAST(NULL AS STRING), 'a', CAST(NULL AS STRING))),
        (CAST(NULL AS ARRAY<STRING>))
      AS t(ts)""")
    val rows = df.select(
      array_distinct_count(col("ts")).as("fused"),
      size(array_distinct(col("ts"))).as("builtin")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getInt(0) == r.getInt(1), r.toString)
    }
    assert(rows(0).getInt(0) == 3)
    assert(rows(3).getInt(0) == 2) // null element counts once, like array_distinct
    assert(rows(4).isNullAt(0))
  }

  test("fused count agrees with the builtin on the real token stream") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("ts", split(lower(trim(col("text"))), "\\s+"))
    val bad = docs.select(
      array_distinct_count(col("ts")).as("f"),
      size(array_distinct(col("ts"))).as("b"))
      .filter(col("f") =!= col("b")).count()
    assert(bad == 0)
  }

  test("FuseDistinctCount rewrites size(array_distinct) in the plan") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("ts", split(lower(trim(col("text"))), "\\s+"))
      .select(size(array_distinct(col("ts"))).as("n"))
    val rewritten = graft.plans.FuseDistinctCount(df.queryExecution.optimizedPlan)
    assert(rewritten.toString.contains("array_distinct_count"), rewritten.toString)
    // and the rewrite is registered in the session extension
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.graftbridge.TestBridge.optimizerRules(
      ext, spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    assert(rules.exists(_ eq graft.plans.FuseDistinctCount))
  }

  test("nfc_normalize: UAX #15 composition, idempotence, null/non-BMP handling") {
    import graft.functions.TextFunctions.nfc_normalize
    val rows = spark.createDataFrame(Seq(
      (1L, "café"),            // decomposed -> composes to café
      (2L, "café"),             // already NFC: byte-identical out
      (3L, "mañana"),          // decomposed tilde
      (4L, "plain ascii"),           // fast path
      (5L, "😀 ok"),       // non-BMP (emoji) passes through
      (6L, "")                       // empty
    )).toDF("id", "s")
      .withColumn("n", nfc_normalize(col("s")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows(1L) == "café", "decomposed acute did not compose")
    assert(rows(2L) == "café")
    assert(rows(3L) == "mañana", "decomposed tilde did not compose")
    assert(rows(4L) == "plain ascii")
    assert(rows(5L) == "😀 ok")
    assert(rows(6L) == "")
    // idempotent: normalizing the normalized column changes nothing
    val twice = spark.createDataFrame(Seq(Tuple1("café")))
      .toDF("s")
      .select(nfc_normalize(nfc_normalize(col("s"))).as("n2"),
        nfc_normalize(col("s")).as("n1"))
      .head()
    assert(twice.getString(0) == twice.getString(1))
    // null in, null out
    val nulls = spark.sql("SELECT CAST(NULL AS STRING) AS s")
      .select(nfc_normalize(col("s"))).head()
    assert(nulls.isNullAt(0))
  }
}
