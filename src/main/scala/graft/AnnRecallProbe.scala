package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANN QUALITY at an arbitrary scale point — the main-ified form of
  * AnnRecallSpec's planted-twin method, so the recall leg of a scale
  * artifact (e.g. target/sf1) is measured, not extrapolated from the
  * sf0.01 spec pins.
  *
  * Global top-5-overlap recall against brute force is the WRONG
  * quality metric for the synthetic corpus: the embeddings are i.i.d.
  * noise with no close pairs, so the exact top-5 cosines sit in a
  * razor-thin band (~0.3–0.4 at 64 dims) that no sublinear index can
  * or should separate — an ANN index finds NEAR neighbors, not
  * arbitrary rank-5-of-noise. Quality is therefore measured on a
  * PLANTED corpus: every 10th vector gets a twin (first coordinate
  * nudged 1e-3, cosine ≈ 1 − ε) at id + 10,000,001 (never ≡ 0 mod
  * 100, so twins are corpus-only, never queries). Recall = fraction
  * of queries whose planted twin appears in the returned neighbor
  * set — the same metric AnnRecallSpec pins at sf0.01 (q41 ≥ 0.9,
  * q78 ≥ 0.8, q104 ≥ 0.95, q126 ≥ 0.9).
  *
  * Usage: runMain graft.AnnRecallProbe [sfDir]
  * Prints one ANNRECALL JSON line with per-query twin recall.
  */
object AnnRecallProbe {

  private val TwinOffset = 10000001L

  /** (query name, neighbor-id column) — q126/q130 name the returned
    * corpus vector `vec_id`, the cosine tier names it `neighbor_id`. */
  private val Targets = Seq(
    "q41_ann_lsh_bucketed" -> "neighbor_id",
    "q78_ann_ivf" -> "neighbor_id",
    "q104_ann_ivf_multiprobe" -> "neighbor_id",
    "q126_ann_pq_adc" -> "vec_id",
    "q130_ann_ivf_pq" -> "vec_id")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // plant the twin corpus (distributed — no driver materialization of
    // the vectors beyond the schema; at 100 TB this is a one-pass map)
    val src = Tables.embeddings(spark, sfDir)
    val twins = src.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + TwinOffset).as("vec_id"),
        expr("transform(embedding, (x, i) -> CASE WHEN i = 0 THEN x + CAST(0.001 AS FLOAT) ELSE x END)")
          .as("embedding"),
        col("label"))
    val dir = java.nio.file.Files.createTempDirectory("graft_planted").toString
    src.unionByName(twins).repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val queryIds = src.filter(col("vec_id") % 100 === 0)
      .select("vec_id").collect().map(_.getLong(0))
    val report = Targets.map { case (name, nCol) =>
      val found = SparkEntry.queries(name)(spark, dir)
        .select(col("query_id"), col(nCol).as("n")).collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      SparkEntry.releaseCaches(spark)
      val hits = queryIds.count(q => found.getOrElse(q, Set.empty).contains(q + TwinOffset))
      val recall = hits.toDouble / queryIds.length
      println(f"ANNRECALL $name%-26s twin_recall=$recall%.4f " +
        f"(hits=$hits/${queryIds.length})")
      name -> recall
    }
    val fmt = (v: Double) =>
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    println(s"""ANNRECALL {"sf":"$sfDir","queries":${queryIds.length},""" +
      report.map { case (n, r) => s""""$n":${fmt(r)}""" }.mkString("", ",", "}"))
    spark.stop()
  }
}
