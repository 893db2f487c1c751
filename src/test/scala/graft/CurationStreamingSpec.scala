package graft

import graft.streaming.CurationStreaming
import org.apache.spark.sql.functions._

/** Stream/batch agreement for the curation twins: the same flag
  * expressions behind readStream must reproduce the batch battery's
  * answers on the sf0.001 corpus. */
class CurationStreamingSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val path: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"))
    dir.toString
  }

  test("streaming curation flags agree with the batch funnel stages") {
    CurationStreaming.runToMemory(
      CurationStreaming.curateFlags(CurationStreaming.readDocuments(spark, path)),
      "curate_out", "append")
    val out = spark.table("curate_out")
    assert(out.count() == Tables.documents(spark, sf).count())
    // stage sums equal the batch funnel's lang/quality counts
    val funnel = SparkEntry.queries("q91_curation_funnel")(spark, sf)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val langN = out.filter(col("lang_ok")).count()
    val qualN = out.filter(col("qual_ok")).count()
    assert(langN == funnel("lang_filter"), s"$langN vs ${funnel("lang_filter")}")
    assert(qualN == funnel("quality"), s"$qualN vs ${funnel("quality")}")
  }

  test("streaming decontamination agrees with q87 flags") {
    // benchmark shingles computed batch-side (the eval set ships with
    // the job); KB-scale by construction
    val bench = Tables.documents(spark, sf)
      .filter(col("doc_id") % 50 === 0)
      .withColumn("ts_arr", split(lower(trim(col("text"))), "\\s+"))
      .filter(size(col("ts_arr")) >= 3)
      .select(explode(array_distinct(expr(
        "transform(sequence(0, size(ts_arr) - 3), i -> concat_ws(' ', ts_arr[i], ts_arr[i+1], ts_arr[i+2]))")))
        .as("sh"))
      .distinct().collect().map(_.getString(0)).toSeq
    CurationStreaming.runToMemory(
      CurationStreaming.decontaminate(
        CurationStreaming.readDocuments(spark, path), bench),
      "decon_out", "append")
    val streamed = spark.table("decon_out")
      .filter(col("doc_id") % 50 =!= 0) // q87 scores only non-benchmark docs
    val batch = SparkEntry.queries("q87_decontamination")(spark, sf)
      .select(col("doc_id"), col("contaminated").as("cb"))
    val mismatched = streamed.join(batch, Seq("doc_id"))
      .filter(col("contaminated") =!= col("cb")).count()
    assert(mismatched == 0)
    // docs too short to shingle are absent from q87 (no shingle rows);
    // the stream still emits them as clean — same policy, wider cover
    assert(streamed.count() >= batch.count())
  }

  test("streaming dedup-within-horizon keeps one row per fingerprint") {
    CurationStreaming.runToMemory(
      CurationStreaming.dedupWithinHorizon(CurationStreaming.readDocuments(spark, path)),
      "dedup_docs_out", "append")
    val n = spark.table("dedup_docs_out").count()
    val expected = Tables.documents(spark, sf)
      .select(md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"))
      .distinct().count()
    assert(n == expected)
  }
}
