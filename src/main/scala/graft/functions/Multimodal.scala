package graft.functions

import graft.Engine._
import graft.{GQuery, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side machinery is real and tested — schema (binary payload +
  * metadata struct), partition-wise batch iteration via a typed
  * mapPartitions, deterministic output — while the actual codec is STUBBED
  * (`fakeDecode`): this container has no image/audio libraries, so the
  * "decode" is a deterministic byte-level reduction the DuckDB oracle can
  * replay. Swapping `fakeDecode` for a real JNI/FFmpeg/JPEG decoder changes
  * no plumbing: same batch shape, same schema, same partitioning.
  *
  * Scale posture: payloads never pass through a shuffle — the imperative
  * stage is a narrow mapPartitions directly over the scan, and only the
  * small extracted features (ints) flow into the aggregation.
  */
object Multimodal extends QueryModule {

  /** Input row: payload + typed metadata, the multimodal table contract. */
  final case class MediaRow(doc_id: Long, source: String, payload: Array[Byte],
                            width: Int, height: Int, n_frames: Long)

  /** Extracted features; produced batch-wise inside mapPartitions. */
  final case class MediaFeatures(doc_id: Long, source: String, payload_len: Long,
                                 checksum: Long, n_frames: Long)

  /** STUB codec: a real implementation would decode image/audio bytes here
    * (per-partition, reusing a native decoder instance). Deterministic fake:
    * sum of the first 16 codepoints of the payload decoded as UTF-8 (0 for
    * an empty payload) — codepoint-based, not byte-based, so the oracle's
    * character functions replay it identically for any unicode text.
    */
  private def fakeDecode(payload: Array[Byte]): Long = {
    val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    s.codePoints().limit(16).asLongStream().sum()
  }

  /** Media feature extraction: documents.text bytes stand in for an image
    * payload; metadata derives deterministically from n_chars. The batch
    * stage is a typed mapPartitions (one decoder per partition at scale).
    */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    import s.implicits._
    val media = table(s, dir, "documents").select(
      col("doc_id"), col("source"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 64 + 16).cast("int").as("width"),
      (col("n_chars") % 48 + 16).cast("int").as("height"),
      expr("n_chars div 100").as("n_frames"))
      .as[MediaRow]
    val feats = media.mapPartitions { rows =>
      // batch boundary: at scale, initialize the (native) codec once here
      rows.map { r =>
        MediaFeatures(r.doc_id, r.source, r.payload.length.toLong,
          fakeDecode(r.payload), r.n_frames)
      }
    }
    feats.toDF()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("payload_len")).cast("long").as("sum_payload"),
           sum(col("checksum")).cast("long").as("sum_checksum"),
           max(col("n_frames")).as("max_frames"))
  }

  private val mediaFeaturesSql =
    """SELECT d.source, COUNT(*) AS n_docs,
      |CAST(SUM(octet_length(encode(d.text))) AS BIGINT) AS sum_payload,
      |CAST(SUM(COALESCE(ck.cksum, 0)) AS BIGINT) AS sum_checksum,
      |CAST(MAX(d.n_chars // 100) AS BIGINT) AS max_frames
      |FROM documents d
      |LEFT JOIN (SELECT doc_id, SUM(ascii(substr(text, i, 1))) AS cksum
      |      FROM (SELECT doc_id, text, unnest(range(1, least(length(text), 16)+1)) AS i
      |            FROM documents)
      |      GROUP BY doc_id) ck
      |ON ck.doc_id = d.doc_id
      |GROUP BY d.source""".stripMargin

  /** Frame sampling + resize stub: treat the payload as n_frames fixed-size
    * "frames" (100 bytes each), sample every 2nd frame, and reduce each
    * sampled frame with the stub codec (ascii sum of its first 4 bytes).
    * The resize stub clamps the payload to width*height bytes. All shapes a
    * real video/image pipeline needs — decode swapped in later, plumbing
    * (frame addressing, sampling stride, per-frame reduction) real now.
    */
  def mediaFrames(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val d = table(s, dir, "documents")
      .withColumn("n_frames", expr("n_chars div 100"))
      .withColumn("resized_len",
        least(length(col("text")), (col("n_chars") % 64 + 16) * (col("n_chars") % 48 + 16)).cast("long"))
    val frames = d.filter(col("n_frames") >= 1)
      .select(col("doc_id"), col("text"), col("n_frames"),
        explode(expr("sequence(0, CAST(n_frames AS INT) - 1)")).as("i"))
      .filter(col("i") % 2 === 0) // sampling stride 2
      .withColumn("frame", expr("substr(text, i * 100 + 1, 100)"))
      .withColumn("fck", expr(
        "ascii(substr(frame,1,1)) + ascii(substr(frame,2,1)) + ascii(substr(frame,3,1)) + ascii(substr(frame,4,1))"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("fck")).cast("long").as("sum_frame_ck"))
    d.select(col("doc_id"), col("n_frames"), col("resized_len"))
      .join(frames, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"), col("resized_len"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("sum_frame_ck"), lit(0L)).as("sum_frame_ck"))
  }

  private val mediaFramesSql =
    """SELECT d.doc_id, d.n_frames, d.resized_len,
      |COALESCE(f.n_sampled, 0) AS n_sampled,
      |COALESCE(f.sum_frame_ck, 0) AS sum_frame_ck
      |FROM (SELECT doc_id, text, n_chars // 100 AS n_frames,
      |        CAST(least(length(text), (n_chars % 64 + 16) * (n_chars % 48 + 16)) AS BIGINT) AS resized_len
      |      FROM documents) d
      |LEFT JOIN (
      |  SELECT doc_id, COUNT(*) AS n_sampled, CAST(SUM(fck) AS BIGINT) AS sum_frame_ck
      |  FROM (SELECT doc_id,
      |          ascii(substr(frame,1,1)) + ascii(substr(frame,2,1)) +
      |          ascii(substr(frame,3,1)) + ascii(substr(frame,4,1)) AS fck
      |        FROM (SELECT doc_id, substr(text, i * 100 + 1, 100) AS frame
      |              FROM (SELECT doc_id, text, unnest(range(0, n_chars // 100)) AS i
      |                    FROM documents WHERE n_chars // 100 >= 1)
      |              WHERE i % 2 = 0))
      |  GROUP BY doc_id) f
      |ON f.doc_id = d.doc_id""".stripMargin

  override val queries: Seq[GQuery] = Seq(
    GQuery("q85_media_features",
      "binary payload + metadata columns, batch feature extraction via mapPartitions (codec stubbed)",
      mediaFeatures, Some(mediaFeaturesSql)),
    GQuery("q88_media_frames",
      "frame sampling (stride 2) + resize stub over payload frames",
      mediaFrames, Some(mediaFramesSql)),
  )
}
