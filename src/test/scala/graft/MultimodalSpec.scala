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

  test("content parser recomputes hand-checked sample features exactly") {
    import MultimodalQueries._
    // BMP: mean BT.601 luma over decoded BGR pixels, padding excluded —
    // recompute straight from the synthesis formula
    val (w, h, seed) = (5, 3, 11L)
    val rowSize = ((w * 3 + 3) / 4) * 4
    def px(j: Int): Int = (((seed + j) * 31) & 0xff).toInt
    val lumaPm = (for (y <- 0 until h; x <- 0 until w) yield {
      val o = y * rowSize + 3 * x
      299L * px(o + 2) + 587L * px(o + 1) + 114L * px(o)
    }).sum
    val got = parseMediaContent(bmpBytes(w, h, seed))
    assert(got.meanLuma.contains(lumaPm.toDouble / (1000.0 * w * h)))
    assert(got.pcmRms.isEmpty && got.frameCrc.isEmpty)

    // WAV: RMS over signed 16-bit PCM
    val n = 32
    val ssq = (0 until n).map { i =>
      val v = (((7L + i) * 2654435761L) & 0xffff).toInt
      val s = if (v >= 0x8000) v - 0x10000 else v
      s.toLong * s
    }.sum
    val wav = parseMediaContent(wavBytes(2, 8000, n / 2, seed = 7L))
    assert(wav.pcmRms.contains(math.sqrt(ssq.toDouble / n)))

    // Y4M: Σ (frame_idx+1)·(plane-byte sum)
    val (vw, vh, fr, vseed) = (4, 2, 3, 5L)
    val fb = vw * vh * 3 / 2
    val crc = (0 until fr).map { f =>
      (f + 1L) * (0 until fb).map(i => (((vseed + f * 131 + i) * 31) & 0xff).toInt).sum
    }.sum
    assert(parseMediaContent(y4mBytes(vw, vh, fr, vseed)).frameCrc.contains(crc))
  }

  test("parsers reject malformed input instead of hanging or overrunning") {
    import MultimodalQueries._
    // WAV whose declared chunk size is a near-2^31 unsigned value: the
    // naive step arithmetic overflows to <= 0 and the walk never
    // advances — must throw, not hang
    val evil = wavBytes(1, 8000, 4, seed = 1L)
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0x7f.toByte // fmt size = 0x7fffffff
    intercept[IllegalArgumentException](parseMediaHeader(evil))
    intercept[IllegalArgumentException](parseMediaContent(evil))

    // Y4M truncated mid-frame: bounded scan must throw, not overrun
    val video = y4mBytes(4, 4, 2, seed = 2L)
    val cut = java.util.Arrays.copyOf(video, video.length - 5)
    intercept[IllegalArgumentException](parseMediaHeader(cut))
    intercept[IllegalArgumentException](parseMediaContent(cut))

    // Y4M whose last FRAME header never terminates
    val tail = java.util.Arrays.copyOf(video, video.length + 5)
    for (i <- video.length until tail.length) tail(i) = 'F'.toByte
    intercept[IllegalArgumentException](parseMediaHeader(tail))

    // BMP declaring more pixels than the payload carries
    val bmp = bmpBytes(4, 4, seed = 3L)
    bmp(22) = 0x40.toByte // height 64 with a 4-row payload
    intercept[IllegalArgumentException](parseMediaContent(bmp))

    // BMP width crafted so w*3 overflows Int to a NEGATIVE row stride
    // — the overrun check must not be defeated into an OOB pixel walk
    val wide = bmpBytes(4, 4, seed = 3L)
    wide(18) = 0xab.toByte; wide(19) = 0xaa.toByte
    wide(20) = 0xaa.toByte; wide(21) = 0x2a.toByte // width = 0x2AAAAAAB
    intercept[IllegalArgumentException](parseMediaContent(wide))

    // Y4M dimensions whose w*h*3/2 overflows Int to a negative frame
    // step — the walk must throw, not loop forever at one offset
    val loopy = ("YUV4MPEG2 W2 H2147483646 F25:1 Ip A1:1\nFRAME\n" + "x" * 16)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    intercept[IllegalArgumentException](parseMediaHeader(loopy))
    intercept[IllegalArgumentException](parseMediaContent(loopy))

    // WAV with a structurally valid but EMPTY data chunk: RMS of zero
    // samples is undefined — reject instead of returning NaN
    val silent = wavBytes(1, 8000, 0, seed = 1L)
    intercept[IllegalArgumentException](parseMediaContent(silent))
  }

  test("fingerprint parsers inherit the bounds hardening (q131/q133/q137)") {
    import MultimodalQueries._
    // the evil chunk-size WAV must throw in the fingerprint walk too
    val evil = wavBytes(1, 8000, 100, seed = 1L)
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0x7f.toByte
    intercept[IllegalArgumentException](wavFingerprintBlocks(evil))
    // a clip shorter than the 65-window contour is rejected, not
    // silently hashed over empty windows
    intercept[IllegalArgumentException](
      wavFingerprintBlocks(wavBytes(1, 8000, 32, seed = 1L)))
    // a non-WAV payload is rejected by magic, not parsed
    intercept[IllegalArgumentException](
      wavFingerprintBlocks(bmpBytes(8, 8, seed = 1L)))

    // Y4M truncated mid-frame must throw in the frame-hash walk
    val video = y4mBytes(8, 8, 2, seed = 2L)
    intercept[IllegalArgumentException](
      y4mFrameAHashes(java.util.Arrays.copyOf(video, video.length - 5)))
    // frames narrower than the 8×8 grid are rejected (the synthesis
    // never emits them; crafted input must not index out of the plane)
    val tiny = ("YUV4MPEG2 W4 H4 F25:1 Ip A1:1\nFRAME\n" + "x" * 24)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    intercept[IllegalArgumentException](y4mFrameAHashes(tiny))
    // the overflow-crafted dimensions throw before any frame walk
    val loopy = ("YUV4MPEG2 W65536 H65537 F25:1 Ip A1:1\nFRAME\n" + "x" * 16)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    intercept[IllegalArgumentException](y4mFrameAHashes(loopy))

    // sane inputs still hash: deterministic and twin-stable
    val ok = wavFingerprintBlocks(wavBytes(1, 8000, 800, seed = 7L))
    assert(ok.length == 4)
    assert(ok.sameElements(wavFingerprintBlocks(wavBytes(1, 8000, 800, seed = 7L))))
    val fr = y4mFrameAHashes(y4mBytes(8, 8, 3, seed = 7L))
    assert(fr.map(_._1) == Seq(0, 1, 2))
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
