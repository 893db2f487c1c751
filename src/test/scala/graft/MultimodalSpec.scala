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

  test("decode features: real container parse, one row per doc, deterministic") {
    val synth = MultimodalQueries.synthesizeMedia(docs)
    val f1 = MultimodalQueries.decodeFeatures(spark, synth).orderBy("doc_id").collect()
    val f2 = MultimodalQueries.decodeFeatures(spark, synth).orderBy("doc_id").collect()
    assert(f1.length == docs.count())
    assert(f1.toSeq == f2.toSeq)
    // format comes from the MAGIC BYTES and must agree with the kind
    assert(f1.forall { r =>
      (r.getAs[String]("kind"), r.getAs[String]("format")) match {
        case ("image", "bmp") | ("audio", "wav") | ("video", "y4m") => true
        case _ => false
      }
    })
    // images/videos carry parsed dimensions; audio carries duration
    assert(f1.filter(_.getString(1) != "audio")
      .forall(r => r.getAs[Int]("width") >= 4 && r.getAs[Int]("height") >= 4))
    assert(f1.filter(_.getString(1) != "image")
      .forall(r => r.getAs[Long]("duration_ms") > 0L))
  }

  test("header parser round-trips hand-built containers exactly") {
    import MultimodalQueries._
    assert(parseMediaHeader(bmpBytes(17, 9, seed = 42L)) ==
      MediaInfo("bmp", Some(17), Some(9), None))
    // 8000 Hz stereo, 4000 samples = exactly 500 ms
    assert(parseMediaHeader(wavBytes(2, 8000, 4000, seed = 7L)) ==
      MediaInfo("wav", None, None, Some(500L)))
    // 3 frames at 25 fps = 120 ms
    assert(parseMediaHeader(y4mBytes(16, 12, 3, seed = 1L)) ==
      MediaInfo("y4m", Some(16), Some(12), Some(120L)))
    intercept[IllegalArgumentException] {
      parseMediaHeader("not a container".getBytes)
    }
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
