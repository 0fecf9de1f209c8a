package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables
import graft.syntax._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with a typed metadata struct, plus decode/feature-extract stages.
  *
  * The decode kernel is a STUB (no image/audio codecs in this
  * environment): [[fakeDecode]] derives deterministic pseudo-features from
  * the payload bytes. The Spark-side plumbing — binary column, metadata
  * schema, per-partition batched processing, feature schema — is real and
  * is what carries over to a production decode (swap [[fakeDecode]] for a
  * codec call inside the same `mapPartitions` batch loop).
  *
  * Scale: payloads stay distributed (never collected); per-partition
  * iteration amortizes any decoder init cost across a partition's rows —
  * the JVM analog of `mapInPandas` batching.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte],
      media_type: String, width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, frames_sampled: Int, feature0: Double)

  /** Documents re-cast as a media table: text bytes play the opaque
    * payload; metadata derived deterministically.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      $"doc_id",
      $"text".cast("binary").as("payload"),
      when($"doc_id" % 3 === 0, "image/png")
        .when($"doc_id" % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("media_type"),
      (($"doc_id" % 8) * 160 + 320).cast("int").as("width"),
      (($"doc_id" % 8) * 90 + 180).cast("int").as("height"))

  /** STUB decode: a real implementation would hand `payload` to a codec.
    * Deterministic fake: features from byte length + first code point
    * (decoded from the leading UTF-8 bytes, max 4, so it agrees with the
    * oracle's `ascii(substr(text,1,1))` for non-ASCII content too).
    */
  private def fakeDecode(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    val first =
      if (n > 0)
        new String(r.payload, 0, math.min(4, r.payload.length),
          java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
      else 0
    val frames = if (r.media_type == "video/mp4") (n % 16).toInt + 1 else 1
    MediaFeatures(r.doc_id, n, r.width, r.height, frames,
      (first * 31 + n % 97).toDouble)
  }

  /** Batched per-partition decode — the `mapInPandas`-shaped stage. */
  def extractFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaRecord]
      .mapPartitions(_.map(fakeDecode))
      .toDF()
  }

  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, thumb: Array[Byte])

  /** STUB resize: aspect-preserving fit into maxDim; a real decoder would
    * transform pixels — the stub emits a deterministic truncated payload
    * as the "thumbnail" so the schema/flow is end-to-end testable.
    */
  def resize(s: SparkSession, d: String, maxDim: Int = 256): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaRecord].mapPartitions(_.map { r =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(r.width, r.height))
      val (w, h) = (math.max(1, (r.width * scale).toInt),
        math.max(1, (r.height * scale).toInt))
      ResizedMedia(r.doc_id, r.width, r.height, w, h,
        r.payload.take(math.min(r.payload.length, w * h / 8)))
    }).toDF()
  }

  case class FrameSample(doc_id: Long, frame_idx: Int, offset: Long)

  /** STUB frame sampling for video payloads: every k-th "frame" as a
    * (doc_id, frame_idx, byte offset) row — one row per sampled frame,
    * the explode-shaped stage a real video pipeline needs.
    */
  def sampleFrames(s: SparkSession, d: String, everyK: Int = 4): DataFrame = {
    import s.implicits._
    mediaTable(s, d).as[MediaRecord]
      .filter(_.media_type == "video/mp4")
      .flatMap { r =>
        val frames = (r.payload.length % 16) + 1
        (0 until frames by everyK).map(i =>
          FrameSample(r.doc_id, i, i.toLong * 4096))
      }.toDF()
  }

  def ops: Seq[Op] = Seq(
    // The oracle checks the deterministic parts of the pipeline (payload
    // byte length, metadata arithmetic, stub feature formula) end-to-end.
    Op("multimodal_features",
      (s, d) => extractFeatures(s, d).orderBy($"doc_id"),
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST((doc_id % 8) * 160 + 320 AS INT) AS width,
        |  CAST((doc_id % 8) * 90 + 180 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 16 + 1 ELSE 1 END AS INT) AS frames_sampled,
        |  CAST(ascii(substr(text, 1, 1)) * 31 + octet_length(encode(text)) % 97 AS DOUBLE) AS feature0
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Resize stage: metadata arithmetic is oracle-checkable; thumb bytes
    // are covered by the determinism spec.
    Op("multimodal_resize",
      (s, d) => resize(s, d).select($"doc_id", $"width", $"height", $"out_w", $"out_h")
        .orderBy($"doc_id"),
      """SELECT doc_id,
        |  CAST((doc_id % 8) * 160 + 320 AS INT) AS width,
        |  CAST((doc_id % 8) * 90 + 180 AS INT) AS height,
        |  CAST(greatest(1, trunc(((doc_id % 8) * 160 + 320) * least(1.0, 256.0 / greatest((doc_id % 8) * 160 + 320, (doc_id % 8) * 90 + 180)))) AS INT) AS out_w,
        |  CAST(greatest(1, trunc(((doc_id % 8) * 90 + 180) * least(1.0, 256.0 / greatest((doc_id % 8) * 160 + 320, (doc_id % 8) * 90 + 180)))) AS INT) AS out_h
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Frame-sample stage: one row per sampled frame of each video payload.
    Op("multimodal_frame_sample",
      (s, d) => sampleFrames(s, d).orderBy($"doc_id", $"frame_idx"),
      """SELECT doc_id, CAST(i AS INT) AS frame_idx, CAST(i * 4096 AS BIGINT) AS offset
        |FROM (SELECT doc_id,
        |        unnest(range(0, octet_length(encode(text)) % 16 + 1, 4)) AS i
        |      FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY doc_id, frame_idx""".stripMargin)
  )
}
