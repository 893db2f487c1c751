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

  test("lsh_buckets equals the composed CASE WHEN vector_dot chain exactly") {
    import graft.functions.LshBucketsExpr
    import spark.implicits._
    // a deterministic ±1 sign matrix, 3 tables × 4 planes × 5 dims
    val signs = IndexedSeq.tabulate(3)(t => IndexedSeq.tabulate(4)(p =>
      Array.tabulate(5)(i => if ((t + 2 * p + 3 * i) % 3 == 0) 1.0 else -1.0)))
    def composed = array(signs.indices.map { t =>
      concat(lit(s"$t:"), concat_ws("", signs(t).indices.map { p =>
        when(vector_dot(col("emb"), typedLit(signs(t)(p).toSeq)) > 0d,
          "1").otherwise("0")
      }: _*))
    }: _*)
    val data = Seq(
      Seq(0.5, -1.2, 3.3, 0.0, -0.7),
      Seq(1.0, 1.0, 1.0, 1.0, 1.0),
      Seq(-2.0, 0.1, 0.0, 0.0, 0.0),
      Seq.empty[Double],           // length mismatch → all-zero bits
      Seq(1.0, 2.0)).toDF("emb")   // length mismatch → all-zero bits
    val rows = data.select(
      LshBucketsExpr.lsh_buckets(col("emb"), signs).as("fused"),
      composed.as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    // null vector / null element: the composed chain yields '0' bits,
    // never a null bucket — the fused form must match
    val nullCases = spark.sql(
      """SELECT * FROM VALUES
        (CAST(NULL AS ARRAY<DOUBLE>)),
        (array(1.0D, CAST(NULL AS DOUBLE), 1.0D, 1.0D, 1.0D)) AS t(emb)""")
    val nr = nullCases.select(
      LshBucketsExpr.lsh_buckets(col("emb"), signs).as("fused"),
      composed.as("ref")).collect()
    nr.foreach { r =>
      assert(!r.isNullAt(0))
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[String](0).forall(_.matches("\\d:0000")))
    }
  }

  test("gram_sums equals the exploded means/cells formulation cell-for-cell") {
    import graft.functions.GramAgg
    import spark.implicits._
    val df = Seq(
      Seq(0.11, -0.92, 0.33),
      Seq(0.25, 0.5, -0.75),
      Seq(-0.01, 0.02, 0.98),
      Seq(0.6, -0.6)).toDF("emb") // ragged row: cells only where j < size
    // reference: the old exploded formulation
    val means = df.select(posexplode(col("emb")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum(expr("CAST(floor(v * 1e9) AS BIGINT)")).as("svq"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cells = df.select(explode(expr(
      """flatten(transform(sequence(0, size(emb) - 1), i ->
           transform(sequence(i, size(emb) - 1), j ->
             struct(i AS i, j AS j,
               element_at(emb, i + 1) * element_at(emb, j + 1) AS p))))""")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.p"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(expr("CAST(floor(p * 1e9) AS BIGINT)")).as("spq"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val g = df.agg(GramAgg.gram_sums(col("emb")).as("g")).select(
      col("g.dims").as("dims"), col("g.cells").as("cells")).head()
    val gd = g.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val gc = g.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(gd == means, s"dims diverge: $gd vs $means")
    assert(gc == cells, s"cells diverge: $gc vs $cells")
  }

  test("sqdist_top2 equals the window top-2 over unrolled candidates, " +
      "including ties, k=1, and null/ragged inputs") {
    import spark.implicits._
    val vecs: Seq[(Long, Seq[java.lang.Double])] = Seq(
      1L -> Seq[java.lang.Double](0.0, 0.0),
      2L -> Seq[java.lang.Double](1.0, 1.0),
      3L -> Seq[java.lang.Double](2.0, 0.5))
    // c1 and c2 EQUIDISTANT from (1,1): the tie must break to the
    // smaller index (= smaller cid under the sorted layout)
    val cents = Seq(0.0, 0.0, 2.0, 2.0, 9.0, 9.0)
    val df = vecs.toDF("vec_id", "emb")
      .withColumn("m", sqdist_top2(col("emb"),
        typedLit(cents)))
      .select(col("vec_id"), col("m.i1"), col("m.d1"), col("m.i2"), col("m.d2"))
    val got = df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3), r.getDouble(4))).toSeq
    // reference: explicit (dist, idx) sort per vector
    def d2(v: Seq[java.lang.Double], off: Int): Double = {
      var s = 0.0
      v.indices.foreach { i =>
        val d = v(i) - cents(off * 2 + i); s += d * d
      }
      s
    }
    val want = vecs.map { case (id, v) =>
      val sorted = (0 until 3).map(c => (d2(v, c), c)).sorted
      (id, sorted(0)._2, sorted(0)._1, sorted(1)._2, sorted(1)._1)
    }
    assert(got.sortBy(_._1) == want.sortBy(_._1))

    // k = 1: runner-up is null
    val one = vecs.toDF("vec_id", "emb")
      .select(sqdist_top2(col("emb"), typedLit(Seq(0.0, 0.0))).as("m"))
      .select(col("m.i1"), col("m.d2")).collect()
    assert(one.forall(r => r.getInt(0) == 0 && r.isNullAt(1)))

    // null vector, ragged layout, null element → NULL overall
    val edge = Seq(
      (1L, null.asInstanceOf[Seq[java.lang.Double]], Seq[java.lang.Double](1.0, 2.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (3L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("vec_id", "emb", "flat")
      .select(sqdist_top2(col("emb"), col("flat")).as("m"))
    assert(edge.collect().forall(_.isNullAt(0)))

    // exactness: d1 equals the interpreted zip_with/aggregate fold
    // bit-for-bit on real embeddings
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .limit(64)
    val cf = e.orderBy("vec_id").limit(4)
      .agg(expr("flatten(transform(array_sort(collect_list(struct(vec_id, emb))), s -> s.emb))").as("cf"))
    val both = e.crossJoin(broadcast(cf))
      .withColumn("m", sqdist_top2(col("emb"), col("cf")))
      .withColumn("folds", expr(
        """transform(sequence(0, CAST(size(cf) / size(emb) AS INT) - 1), c ->
             aggregate(zip_with(emb, slice(cf, c * size(emb) + 1, size(emb)),
               (x, y) -> (x - y) * (x - y)), 0D, (a, v) -> a + v))"""))
      .select(col("m.i1").as("i1"), col("m.d1").as("d1"),
        col("m.i2").as("i2"), col("m.d2").as("dd2"), col("folds"))
      .collect()
    both.foreach { r =>
      val folds = r.getSeq[Double](4)
      val sorted = folds.zipWithIndex.sorted
      assert(r.getInt(0) == sorted(0)._2 && r.getDouble(1) == sorted(0)._1)
      assert(r.getInt(2) == sorted(1)._2 && r.getDouble(3) == sorted(1)._1)
    }
  }

  test("GraftExtensions injects FuseVectorOps into a session's optimizer") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.graftbridge.TestBridge.optimizerRules(
      ext, spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    assert(rules.exists(_ eq graft.plans.FuseVectorOps))
  }
}
