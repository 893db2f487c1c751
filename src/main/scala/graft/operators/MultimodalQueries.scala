package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed
  * metadata, with decode / feature-extraction / frame-sampling as
  * per-partition batch transforms (north-star surface).
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`fakeDecode`) — the Spark-side
  * contract is real: binary column + metadata struct in, typed feature
  * rows out, executed per partition in batches exactly where a codec
  * (or `mapInPandas`-style vectorized UDF in PySpark) would slot in.
  *
  * Scale: payload bytes never shuffle — decode is a narrow map; only
  * extracted (small) features flow into joins/aggs downstream. For
  * real media, set `spark.sql.files.maxPartitionBytes` so one
  * partition's payloads fit executor memory.
  */
object MultimodalQueries {

  /** Deterministic fake "media" payload derived from document text:
    * utf-8 bytes standing in for an encoded image/audio blob. */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("source").as("origin"),
        octet_length(col("text")).as("n_bytes")).as("meta"))

  final case class MediaFeature(
      doc_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, checksum: Long)

  /** STUB decoder — stands in for a real codec. Deterministic: derives
    * fake dimensions and a checksum from the payload bytes alone. */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Long) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
    val w = 64 + (math.abs(sum) % 1024).toInt
    val h = 64 + (math.abs(sum / 7) % 1024).toInt
    (w, h, sum)
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", LongType)))

  /** Per-partition decode + feature extraction (batched where a real
    * codec would be initialized once per partition). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val rdd = media.select("doc_id", "payload", "meta.kind").rdd
      .mapPartitions { rows =>
        // per-partition init point: a real impl opens the codec here
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, cks) = fakeDecode(payload)
          Row(r.getLong(0), r.getString(2), payload.length, w, h, cks)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling: split a payload into fixed-size "frames" and keep
    * every `everyN`-th — the video-frame-sample plumbing. */
  def frameSample(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    media
      .withColumn("frame_idx",
        explode(expr(
          s"sequence(0, greatest((octet_length(payload) - 1) div $frameBytes, 0))")))
      .filter(col("frame_idx") % everyN === 0)
      .select(col("doc_id"), col("frame_idx"),
        substring(col("payload"), col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame"))

  val defs: Seq[QueryDef] = Seq(

    // ---- metadata projection over the binary payload (oracled)
    QueryDef(
      "q53_multimodal_meta",
      (s, d) => withBinaryPayload(Tables.documents(s, d))
        .select(col("doc_id"), col("meta.kind").as("kind"),
          octet_length(col("payload")).as("payload_bytes"),
          md5(col("payload")).as("payload_md5"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END AS kind,
        CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
        md5(text) AS payload_md5
        FROM documents ORDER BY doc_id""")),

    // ---- full decode pipeline (stubbed codec; rows-only check)
    QueryDef(
      "q54_multimodal_decode",
      (s, d) => decodeFeatures(s, withBinaryPayload(Tables.documents(s, d)))
        .orderBy("doc_id"),
      None,
      doc = "binary payload → per-partition stub decode → typed features"),

    // ---- frame sampling. The frame *positions and sizes* are pure
    //      integer arithmetic over octet_length, so DuckDB reproduces
    //      them exactly (the binary frame content itself stays
    //      Spark-side; its length is what the oracle pins).
    QueryDef(
      "q55_multimodal_frames",
      (s, d) => frameSample(withBinaryPayload(Tables.documents(s, d)), 64, 2)
        .select(col("doc_id"), col("frame_idx").cast("int").as("frame_idx"),
          octet_length(col("frame")).as("frame_bytes"))
        .orderBy("doc_id", "frame_idx"),
      Some("""WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
        f AS (SELECT doc_id, n,
            CAST(unnest(range(greatest((n - 1) // 64, 0) + 1)) AS INT) AS frame_idx
          FROM p)
        SELECT doc_id, frame_idx,
          CAST(least(64, n - frame_idx * 64) AS INT) AS frame_bytes
        FROM f WHERE frame_idx % 2 = 0
        ORDER BY doc_id, frame_idx"""),
      doc = "payload → fixed-size frames → every-2nd sample")
  )
}
