package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Native vector expressions: exact agreement with the declarative
  * fold, null handling, and the optimizer-rule rewrite. */
class VectorExpressionsSpec extends SparkSpecBase {

  private val fold = "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, 0.123456789)),
      (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
  }

  test("vector_dot equals the declarative fold bit-for-bit") {
    val rows = vecs
      .select(vector_dot(col("a"), col("b")).as("fused"), expr(fold).as("folded"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(rows.head.getDouble(0) == 32.0)
  }

  test("vector_norm equals sqrt of self-dot; null propagates") {
    import spark.implicits._
    val rows = vecs.select(vector_norm(col("a")).as("n")).collect()
    assert(rows.head.getDouble(0) == math.sqrt(14.0))
    assert(rows(2).getDouble(0) == 0.0)
    val withNull = Seq((Option.empty[Seq[Double]], Option(Seq(1.0)))).toDF("a", "b")
    assert(withNull.select(vector_dot(col("a"), col("b"))).head().isNullAt(0))
    assert(withNull.select(vector_norm(col("a"))).head().isNullAt(0))
  }

  test("embeddings: fused cosine equals fold-based cosine on real data") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("a"))
    val paired = e.join(
      e.select(col("vec_id").as("v2"), col("a").as("b")),
      col("vec_id") + 1 === col("v2"))
    val diffs = paired.select(
      vector_dot(col("a"), col("b")).as("fused"),
      expr(fold).as("folded"))
      .filter(col("fused") =!= col("folded"))
    assert(diffs.count() == 0)
  }

  test("FuseVectorOps rewrites the fold into the native expressions") {
    // parquet source: a literal would constant-fold before the rule shows
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("a"))
      .withColumn("b", col("a"))
    val df = e.select(col("vec_id"), expr(fold).as("dot"),
      expr("sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0D, (acc, v) -> acc + v))").as("norm"))
    val before = df.queryExecution.optimizedPlan
    assert(!before.toString.contains("vector_dot")) // stock session: fold intact
    val rewritten = graft.plans.FuseVectorOps(before).toString
    assert(rewritten.contains("vector_dot"), rewritten)
    assert(rewritten.contains("vector_norm"), rewritten)
    assert(!rewritten.contains("aggregate(zip_with"), rewritten)
  }

  test("FuseVectorOps does NOT rewrite near-miss folds") {
    // sum-of-squares of ONE side and acc+acc: same syntactic skeleton,
    // different semantics — the rule must leave them alone
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("a"))
      .withColumn("b", col("a"))
    val sumSquares = "aggregate(zip_with(a, b, (x, y) -> x * x), 0D, (acc, v) -> acc + v)"
    val accAcc = "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + acc)"
    for (q <- Seq(sumSquares, accAcc)) {
      val before = e.select(expr(q).as("r")).queryExecution.optimizedPlan
      val rewritten = graft.plans.FuseVectorOps(before).toString
      assert(!rewritten.contains("vector_dot"), s"must not fuse: $q\n$rewritten")
    }
  }

  test("vector_dot matches fold null semantics: length mismatch and null element") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),            // length mismatch
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)))       // clean
      .toDF("a", "b")
    val r = df.select(
      vector_dot(col("a"), col("b")).as("fused"),
      expr(fold).as("folded")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))      // both NULL on mismatch
    assert(r(1).getDouble(0) == r(1).getDouble(1))
    // null element → NULL from both implementations
    val withNullElem = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE)) AS a, array(1.0D, 2.0D) AS b")
    val r2 = withNullElem.select(
      vector_dot(col("a"), col("b")).as("fused"), expr(fold).as("folded")).head()
    assert(r2.isNullAt(0) && r2.isNullAt(1))
    assert(withNullElem.select(vector_norm(col("a"))).head().isNullAt(0))
  }

  test("GraftExtensions injects FuseVectorOps into a session's optimizer") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.graftbridge.TestBridge.optimizerRules(
      ext, spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    assert(rules.exists(_ eq graft.plans.FuseVectorOps))
  }
}
