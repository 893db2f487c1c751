package graft

import graft.operators.MultimodalQueries
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload column, per-partition stub
  * decode, frame sampling — schema + determinism contracts. */
class MultimodalSpec extends SparkSpecBase {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val media = MultimodalQueries.withBinaryPayload(docs)

  test("binary payload + typed metadata schema") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("kind", "origin", "n_bytes"))
    val kinds = media.select(col("meta.kind")).distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decode features: one row per doc, deterministic across runs") {
    val f1 = MultimodalQueries.decodeFeatures(spark, media).orderBy("doc_id").collect()
    val f2 = MultimodalQueries.decodeFeatures(spark, media).orderBy("doc_id").collect()
    assert(f1.length == docs.count())
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(r => r.getAs[Int]("width") >= 64 && r.getAs[Int]("height") >= 64))
    // n_bytes must equal the payload length the metadata promised
    val joined = MultimodalQueries.decodeFeatures(spark, media)
      .join(media.select(col("doc_id"), col("meta.n_bytes").as("meta_bytes")), "doc_id")
    assert(joined.filter(col("n_bytes") =!= col("meta_bytes")).count() == 0)
  }

  test("frame sampling: every-2nd 64-byte frame, correct sizes") {
    val frames = MultimodalQueries.frameSample(media, frameBytes = 64, everyN = 2)
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    val sizes = frames.select(octet_length(col("frame")).as("sz"))
    assert(sizes.filter(col("sz") > 64).count() == 0)
    assert(sizes.filter(col("sz") < 1).count() == 0)
    // full-size frames for all but the tail frame of each doc
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(perDoc.filter(col("n") < 1).count() == 0)
  }
}
