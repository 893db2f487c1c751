package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (ARRAY<FLOAT>, 64-dim).
  *
  * Dot products are computed as an ordered left fold over
  * `zip_with(a, b, _*_)` after an exact float→double cast, so Spark and
  * the DuckDB oracle (`list_sum(list_transform(...))`, also an in-order
  * fold) produce bit-identical IEEE doubles — no tolerance needed.
  *
  * Scale path: the brute-force form is the correctness baseline
  * (cross-join is fine for a small query set against a big corpus —
  * broadcast the queries, stream the corpus). The hyperplane-LSH
  * variant buckets vectors by a 16-bit signature first, so at 100 TB
  * the candidate join is equi on the bucket key (shuffle once,
  * ~1/65536 of the n² pairs); brute force only runs inside buckets.
  */
object SimilarityQueries {

  /** embeddings with exact double cast + precomputed L2 norm. */
  private def normed(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("norm",
        expr("sqrt(aggregate(zip_with(emb, emb, (x, y) -> x * y), 0D, (a, v) -> a + v))"))

  private val dot = "aggregate(zip_with(qe, emb, (x, y) -> x * y), 0D, (a, v) -> a + v)"

  /** Oracle CTE: double-cast embeddings + norms. */
  private val oracleNormed = """WITH e AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings),
    n AS (SELECT vec_id, label, emb,
      sqrt(list_sum(list_transform(range(len(emb)), i -> emb[i+1] * emb[i+1]))) AS norm
      FROM e)"""

  private val oracleDot =
    "list_sum(list_transform(range(len(q.emb)), i -> q.emb[i+1] * c.emb[i+1]))"

  val defs: Seq[QueryDef] = Seq(

    // ---- brute-force cosine top-k for a query subset (ANN baseline)
    QueryDef(
      "q39_ann_bruteforce_topk",
      (s, d) => {
        val e = normed(s, d)
        val q = e.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("norm").as("qnorm"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        broadcast(q).join(e, col("vec_id") =!= col("query_id"))
          .withColumn("cosine", expr(dot) / (col("qnorm") * col("norm")))
          .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .orderBy("query_id", "rn")
      },
      Some(s"""$oracleNormed,
        p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            $oracleDot / (q.norm * c.norm) AS cosine
          FROM n q JOIN n c ON q.vec_id % 100 = 0 AND c.vec_id != q.vec_id)
        SELECT query_id, neighbor_id, cosine, rn FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rn
          FROM p) t
        WHERE rn <= 5 ORDER BY query_id, rn""")),

    // ---- embedding-cosine near-dup: nearest neighbor within label block
    QueryDef(
      "q40_nn_within_label",
      (s, d) => {
        val e = normed(s, d)
        val a = e.select(col("vec_id"), col("label"), col("emb").as("qe"), col("norm").as("qnorm"))
        val b = e.select(col("vec_id").as("other_id"), col("label"), col("emb"), col("norm"))
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("cosine").desc, col("other_id").asc)
        a.join(b, Seq("label"))
          .filter(col("vec_id") =!= col("other_id"))
          .withColumn("cosine", expr(dot) / (col("qnorm") * col("norm")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("label"), col("other_id").as("nn_id"), col("cosine"))
          .orderBy("vec_id")
      },
      Some(s"""$oracleNormed,
        p AS (SELECT q.vec_id, q.label, c.vec_id AS nn_id,
            $oracleDot / (q.norm * c.norm) AS cosine
          FROM n q JOIN n c ON q.label = c.label AND q.vec_id != c.vec_id)
        SELECT vec_id, label, nn_id, cosine FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, nn_id) AS rn
          FROM p) t
        WHERE rn = 1 ORDER BY vec_id""")),

    // ---- hyperplane-LSH bucketed ANN (scale path; no SQL oracle —
    //      driver records the weaker rows-only check).
    //      4 OR-ed hash tables × 4-bit signatures: a pair is a candidate
    //      if it collides in ANY table (union-of-bands recall boost, same
    //      structure as MinHash banding). Hyperplane component signs are
    //      derived from md5(table, plane, dim) — deterministic, no RNG.
    QueryDef(
      "q41_ann_lsh_bucketed",
      (s, d) => {
        val sigExpr =
          """transform(sequence(0, 3), t -> concat(t, ':',
               concat_ws('', transform(sequence(0, 3), p ->
                 CASE WHEN aggregate(
                   zip_with(emb, sequence(0, size(emb) - 1),
                     (x, i) -> CASE WHEN substring(md5(concat('pl', t, '_', p, ':', i)), 1, 1) < '8'
                               THEN x ELSE -x END),
                   0D, (a, v) -> a + v) > 0 THEN '1' ELSE '0' END))))"""
        val e = normed(s, d).withColumn("bucket", explode(expr(sigExpr)))
        val q = e.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("bucket"))
        val cands = broadcast(q).join(e.select(col("vec_id"), col("bucket")), Seq("bucket"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"))
          .distinct()
        val byId = normed(s, d)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        cands
          .join(byId.select(col("vec_id").as("query_id"), col("emb").as("qe"),
                            col("norm").as("qnorm")), Seq("query_id"))
          .join(byId.select(col("vec_id").as("neighbor_id"), col("emb"), col("norm")),
                Seq("neighbor_id"))
          .withColumn("cosine", expr(dot) / (col("qnorm") * col("norm")))
          .select(col("query_id"), col("neighbor_id"), col("cosine"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .orderBy("query_id", "rn")
      },
      None,
      doc = "Multi-table hyperplane-LSH ANN: candidates = union of 4 " +
        "4-bit bucket collisions, then exact cosine re-rank (top 5).")
    ,

    // ---- IVF ANN: coarse-quantizer buckets (the k-means-style scale
    //      path; centroids here are a deterministic sample — production
    //      would train them). Search probes the query's nearest-centroid
    //      cell only: the classic inverted-file trade of recall for a
    //      1/cells candidate fraction. Rows-only check (q39 is the
    //      exact-oracle baseline).
    QueryDef(
      "q78_ann_ivf",
      (s, d) => {
        import graft.functions.VectorFunctions._
        val e = normed(s, d)
        val centroids = e.filter(col("vec_id") % 200 === 0)
          .select(col("vec_id").as("centroid_id"), col("emb").as("ce"),
                  col("norm").as("cnorm"))
        // assign every vector to its nearest centroid (argmin by cosine)
        val wAssign = Window.partitionBy(col("vec_id"))
          .orderBy(col("c_cos").desc, col("centroid_id").asc)
        val assigned = e.crossJoin(broadcast(centroids))
          .withColumn("c_cos",
            vector_dot(col("emb"), col("ce")) / (col("norm") * col("cnorm")))
          .withColumn("crn", row_number().over(wAssign))
          .filter(col("crn") === 1)
          .select(col("vec_id"), col("label"), col("emb"), col("norm"),
                  col("centroid_id"))
        val queries = assigned.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("emb").as("qe"),
                  col("norm").as("qnorm"), col("centroid_id"))
        // probe only the query's own cell
        val wTop = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)
        broadcast(queries).join(assigned, Seq("centroid_id"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cosine",
            vector_dot(col("qe"), col("emb")) / (col("qnorm") * col("norm")))
          .select(col("query_id"), col("centroid_id"),
                  col("vec_id").as("neighbor_id"), col("cosine"))
          .withColumn("rn", row_number().over(wTop))
          .filter(col("rn") <= 5)
          .orderBy("query_id", "rn")
      },
      None,
      doc = "IVF ANN: deterministic coarse centroids, nearest-cell " +
        "assignment, single-cell probe, exact re-rank (top 5).")
  )
}
