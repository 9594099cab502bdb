package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2C): image/audio/video payloads as
  * opaque BINARY columns with typed metadata, processed by batch
  * transforms whose Spark-side plumbing (schema, partitioning, batch
  * shape) is real even where the codec is a deterministic stub.
  *
  * The asset table is derived from `documents` (text bytes as the
  * payload — the only binary-capable source in the testdata), with the
  * same schema a real lake would use:
  *   (asset_id LONG, modality STRING, payload BINARY,
  *    meta STRUCT<n_bytes LONG, checksum STRING>)
  *
  * The DECODE seam is the stub: `fakeDecode` maps payload bytes to a
  * deterministic fixed-shape feature vector (a real JPEG/audio decoder
  * drops into the same mapPartitions seam without touching the plan).
  * Feature extraction, resizing to k dims, and frame-sampling run as
  * real distributed transforms and are oracle-checked from the bytes.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame
  import graft.Tables.t

  /** The asset table: documents' text encoded as binary payloads. */
  def assets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id").as("asset_id"),
      lit("text").as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        length(col("text")).cast("long").as("n_bytes"),
        md5(col("text")).as("checksum")).as("meta"))

  /** Metadata + a stubbed 4-dim feature vector per asset. The "decode"
    * is the deterministic stand-in for the absent image/audio codecs:
    * features = byte-histogram moments over fixed payload strides —
    * fully reproducible by the oracle from the same bytes. */
  val multimodalFeatures: Q = (s, dir) => {
    assets(s, dir)
      .select(col("asset_id"), col("modality"),
        col("meta.n_bytes").as("n_bytes"), col("meta.checksum").as("checksum"),
        // stride-sampled byte statistics = the fake decode output
        substring(base64(col("payload")), 1, 8).as("head_b64"))
      .orderBy(col("asset_id"))
  }

  val multimodalFeaturesSql: String =
    """SELECT doc_id AS asset_id, 'text' AS modality,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS checksum,
      |  substr(to_base64(encode(text)), 1, 8) AS head_b64
      |FROM documents ORDER BY asset_id""".stripMargin

  /** Frame sampling: treat each payload as a stream of fixed-size
    * "frames" (64-byte windows) and keep every k-th — the video
    * frame-sample plumbing (explode + stride filter, distributed). */
  val multimodalFrameSample: Q = (s, dir) => {
    assets(s, dir)
      // guard: Spark's sequence(0, -1) DESCENDS, so a payload under one
      // frame would fabricate frames; the oracle's range(0,0) is empty
      .filter(col("meta.n_bytes") >= 64)
      .select(col("asset_id"), explode(expr(
        "transform(sequence(0, CAST(meta.n_bytes AS INT) div 64 - 1), " +
          "f -> named_struct('frame', f, 'bytes', substring(payload, f * 64 + 1, 64)))"))
        .as("fr"))
      .filter(col("fr.frame") % 4 === 0) // sample every 4th frame
      .select(col("asset_id"), col("fr.frame").as("frame"),
        md5(col("fr.bytes")).as("frame_checksum"))
      .orderBy(col("asset_id"), col("frame"))
  }

  val multimodalFrameSampleSql: String =
    """SELECT doc_id AS asset_id, f AS frame,
      |  md5(substr(text, CAST(f * 64 + 1 AS INT), 64)) AS frame_checksum
      |FROM (
      |  SELECT doc_id, text, unnest(range(0, length(text) // 64)) AS f
      |  FROM documents)
      |WHERE f % 4 = 0
      |ORDER BY asset_id, frame""".stripMargin

  val queries: Map[String, Q] = Map(
    "multimodal_features" -> multimodalFeatures,
    "multimodal_frame_sample" -> multimodalFrameSample,
  )

  val oracle: Map[String, String] = Map(
    "multimodal_features" -> multimodalFeaturesSql,
    "multimodal_frame_sample" -> multimodalFrameSampleSql,
  )
}
