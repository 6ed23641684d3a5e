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
  * mapPartitions, deterministic output. For IMAGES the codec itself is now
  * real too: [[imageCodec]] (q122) encodes and decodes actual PNG bytes
  * through the JDK's own `javax.imageio` (headless, zero extra deps) with
  * a formula oracle that only matches if the round-trip is lossless. The
  * q85/q88 text-byte `fakeDecode` is kept as the audio/video stand-in
  * (those codecs have no JDK implementation and this container has no
  * media libraries); swapping it for a JNI/FFmpeg decoder changes no
  * plumbing: same batch shape, same schema, same partitioning.
  *
  * Scale posture: payloads never pass through a shuffle — the imperative
  * stage is a narrow mapPartitions directly over the scan, and only the
  * small extracted features (ints) flow into the aggregation.
  */
object Multimodal extends QueryModule {

  /** Per-JVM ImageIO tuning, referenced from inside every codec
    * mapPartitions closure so each EXECUTOR JVM applies it (not just the
    * driver). `setUseCache(false)` matters: the default is a DISK-backed
    * stream cache — every encode/decode creates and deletes a temp file,
    * which under 32 concurrent codec tasks turns a CPU-bound stage into a
    * filesystem-contention stage (q122 drifted 1.5 -> 5 s at sf0.1 on a
    * busy /tmp before this). These payloads are kilobytes; heap buffers
    * are strictly better at any scale.
    */
  private lazy val imageIoTuned: Unit =
    javax.imageio.ImageIO.setUseCache(false)

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

  final case class ImgRow(doc_id: Long, source: String, png: Array[Byte])
  final case class ImgFeat(doc_id: Long, source: String,
                           sum_r: Long, sum_g: Long, sum_b: Long, ok: Boolean)

  /** REAL image codec path (no stub): deterministic 8x8 RGB images are
    * encoded to actual PNG bytes and decoded back through the JDK's own
    * codec (`javax.imageio`, headless, zero extra dependencies), then
    * nearest-neighbor downsampled 8x8 -> 4x4 with explicit integer index
    * math (library resamplers interpolate platform-dependently; index
    * sampling is exact) and reduced to per-channel integer pixel sums.
    *
    * The oracle computes the same sums straight from the pixel FORMULA —
    * so the hash only matches if the PNG bytes round-trip losslessly
    * through the real encoder and decoder. This closes the "codec is
    * stubbed" gap for images: the q85/q88 plumbing (batch mapPartitions,
    * binary columns, metadata) now has a genuine encode/decode instance
    * behind the same shape. PNG byte LENGTH is deliberately not oracled —
    * encoder output size is implementation-defined; decoded pixels are not.
    *
    * Scale posture: identical to q85 — payloads never cross a shuffle,
    * both codec stages are narrow mapPartitions over the scan, and only
    * small integer features enter the aggregation.
    */
  def imageCodec(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    import s.implicits._
    // spread: the fixture is one row group, and the codec work is pure CPU
    // expansion — without the repartition every PNG round-trip runs in ONE
    // task (Engine.spread's exact contract)
    val docs = spread(table(s, dir, "documents")
      .select(col("doc_id"), col("source"))).as[(Long, String)]
    val encoded = docs.mapPartitions { it =>
      imageIoTuned
      it.map { case (id, src) =>
        val img = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
            val g = ((id * 17 + x * 3 + y * 5) % 256).toInt
            val b = ((id * 7 + x * 11 + y * 3) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        ImgRow(id, src, bos.toByteArray)
      }
    }
    val feats = encoded.mapPartitions { it =>
      imageIoTuned
      it.map { row =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.png))
        var sr = 0L; var sg = 0L; var sb = 0L
        var j = 0
        while (j < 4) {
          var i = 0
          while (i < 4) {
            val p = img.getRGB(i * 2, j * 2) // nearest-neighbor 2x stride
            sr += (p >> 16) & 255; sg += (p >> 8) & 255; sb += p & 255
            i += 1
          }
          j += 1
        }
        ImgFeat(row.doc_id, row.source, sr, sg, sb,
          img.getWidth == 8 && img.getHeight == 8)
      }
    }
    feats.toDF().groupBy(col("source"))
      .agg(count(lit(1)).as("n_images"),
           sum(col("sum_r")).as("tot_r"),
           sum(col("sum_g")).as("tot_g"),
           sum(col("sum_b")).as("tot_b"),
           sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"))
  }

  private val imageCodecSql =
    """WITH px AS (
      |  SELECT doc_id, source, xi.i*2 AS x, yj.j*2 AS y
      |  FROM documents,
      |       (SELECT unnest(range(4)) AS i) xi,
      |       (SELECT unnest(range(4)) AS j) yj),
      |f AS (
      |  SELECT doc_id, source,
      |    SUM((doc_id*31 + x*7 + y*13) % 256) AS sr,
      |    SUM((doc_id*17 + x*3 + y*5) % 256) AS sg,
      |    SUM((doc_id*7 + x*11 + y*3) % 256) AS sb
      |  FROM px GROUP BY doc_id, source)
      |SELECT source, COUNT(*) AS n_images,
      |CAST(SUM(sr) AS BIGINT) AS tot_r,
      |CAST(SUM(sg) AS BIGINT) AS tot_g,
      |CAST(SUM(sb) AS BIGINT) AS tot_b,
      |COUNT(*) AS n_ok
      |FROM f GROUP BY source""".stripMargin

  final case class WavRow(doc_id: Long, source: String, wav: Array[Byte])
  final case class WavFeat(doc_id: Long, source: String,
                           n_samples: Long, sum_abs: Long, peak: Long, ok: Boolean)

  /** REAL audio codec path: deterministic 16-bit PCM waveforms (256 samples,
    * 8 kHz mono) are encoded to actual WAV bytes and decoded back through
    * the JDK's `javax.sound.sampled` (headless, zero extra dependencies),
    * then reduced to integer loudness features (sum of |sample|, peak).
    * PCM-in-WAV is lossless, so the formula oracle only matches if the
    * container round-trip preserves every sample — the audio analog of
    * q122's PNG proof. Only video now lacks a real codec (none exists in
    * the JDK; its frame-sampling plumbing remains q88).
    */
  def audioCodec(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    import s.implicits._
    val docs = spread(table(s, dir, "documents")
      .select(col("doc_id"), col("source"))).as[(Long, String)]
    val n = 256
    val encoded = docs.mapPartitions { it =>
      it.map { case (id, src) =>
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = (((id * 31 + i.toLong * 7) % 65536L) - 32768L).toShort
          pcm(2 * i) = (v & 0xff).toByte          // little-endian
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        WavRow(id, src, bos.toByteArray)
      }
    }
    val feats = encoded.mapPartitions { it =>
      it.map { row =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.wav))
        val buf = ais.readAllBytes()
        val fmt = ais.getFormat
        val nsamp = buf.length / 2
        var sumAbs = 0L; var peak = 0L
        var i = 0
        while (i < nsamp) {
          val v = (((buf(2 * i + 1) & 0xff) << 8) | (buf(2 * i) & 0xff)).toShort.toLong
          val a = math.abs(v)
          sumAbs += a; if (a > peak) peak = a
          i += 1
        }
        WavFeat(row.doc_id, row.source, nsamp.toLong, sumAbs, peak,
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
      }
    }
    feats.toDF().groupBy(col("source"))
      .agg(count(lit(1)).as("n_clips"),
           sum(col("n_samples")).as("tot_samples"),
           sum(col("sum_abs")).as("tot_abs"),
           max(col("peak")).as("max_peak"),
           sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"))
  }

  private val audioCodecSql =
    """WITH smp AS (
      |  SELECT doc_id, source,
      |         ((doc_id*31 + i*7) % 65536) - 32768 AS v
      |  FROM documents, (SELECT unnest(range(256)) AS i) s),
      |f AS (
      |  SELECT doc_id, source, COUNT(*) AS n_samples,
      |    SUM(abs(v)) AS sum_abs, MAX(abs(v)) AS peak
      |  FROM smp GROUP BY doc_id, source)
      |SELECT source, COUNT(*) AS n_clips,
      |CAST(SUM(n_samples) AS BIGINT) AS tot_samples,
      |CAST(SUM(sum_abs) AS BIGINT) AS tot_abs,
      |CAST(MAX(peak) AS BIGINT) AS max_peak,
      |COUNT(*) AS n_ok
      |FROM f GROUP BY source""".stripMargin

  final case class GifRow(doc_id: Long, source: String, gif: Array[Byte])
  final case class GifFeat(doc_id: Long, source: String, n_frames: Long,
                           sum_g0: Long, sum_g2: Long, ok: Boolean)

  /** REAL multi-frame container path (the video analog): 4-frame 8x8
    * grayscale animations are encoded as actual animated GIFs through the
    * JDK's ImageIO sequence writer and read back frame-by-frame, sampling
    * every second frame (the q88 stride) and reducing each sampled frame
    * to an integer gray sum. An explicit 256-gray IndexColorModel palette
    * makes GIF encoding lossless BY CONSTRUCTION (every pixel value is a
    * palette entry), so the formula oracle only matches if the container
    * preserves frame order and content. True video codecs (H.264 etc.)
    * have no JDK implementation — that part stays honestly out of scope —
    * but container demux + frame sampling, the Spark-side shape of video
    * processing, is now proven against a real format.
    */
  def framesCodec(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    import s.implicits._
    val docs = spread(table(s, dir, "documents")
      .select(col("doc_id"), col("source"))).as[(Long, String)]
    val encoded = docs.mapPartitions { it =>
      imageIoTuned
      // one writer instance per partition: the "init the codec once per
      // batch" contract from q85, with a real codec
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val gray = new Array[Byte](256)
      var gi = 0
      while (gi < 256) { gray(gi) = gi.toByte; gi += 1 }
      val palette = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
      it.map { case (id, src) =>
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var k = 0
        while (k < 4) {
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
          val raster = img.getRaster
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              raster.setSample(x, y, 0,
                ((id * 31 + k * 97 + x * 7 + y * 13) % 256).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          k += 1
        }
        writer.endWriteSequence()
        ios.close()
        GifRow(id, src, bos.toByteArray)
      }
    }
    val feats = encoded.mapPartitions { it =>
      imageIoTuned
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      it.map { row =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(row.gif))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        def graySum(idx: Int): Long = {
          val img = reader.read(idx)
          var sum = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) { sum += img.getRGB(x, y) & 255; x += 1 }
            y += 1
          }
          sum
        }
        // frame sampling at stride 2: frames 0 and 2 of 4
        val f = GifFeat(row.doc_id, row.source, n.toLong,
          graySum(0), graySum(2), n == 4)
        iis.close()
        f
      }
    }
    feats.toDF().groupBy(col("source"))
      .agg(count(lit(1)).as("n_videos"),
           sum(col("n_frames")).as("tot_frames"),
           sum(col("sum_g0")).as("tot_g0"),
           sum(col("sum_g2")).as("tot_g2"),
           sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"))
  }

  private val framesCodecSql =
    """WITH px AS (
      |  SELECT doc_id, source, k.k, x.x, y.y,
      |         (doc_id*31 + k.k*97 + x.x*7 + y.y*13) % 256 AS g
      |  FROM documents,
      |       (SELECT unnest(range(0, 4, 2)) AS k) k,
      |       (SELECT unnest(range(8)) AS x) x,
      |       (SELECT unnest(range(8)) AS y) y),
      |f AS (
      |  SELECT doc_id, source,
      |    SUM(CASE WHEN k = 0 THEN g ELSE 0 END) AS sum_g0,
      |    SUM(CASE WHEN k = 2 THEN g ELSE 0 END) AS sum_g2
      |  FROM px GROUP BY doc_id, source)
      |SELECT source, COUNT(*) AS n_videos,
      |CAST(COUNT(*) * 4 AS BIGINT) AS tot_frames,
      |CAST(SUM(sum_g0) AS BIGINT) AS tot_g0,
      |CAST(SUM(sum_g2) AS BIGINT) AS tot_g2,
      |COUNT(*) AS n_ok
      |FROM f GROUP BY source""".stripMargin

  override val queries: Seq[GQuery] = Seq(
    GQuery("q85_media_features",
      "binary payload + metadata columns, batch feature extraction via mapPartitions (codec stubbed)",
      mediaFeatures, Some(mediaFeaturesSql)),
    GQuery("q88_media_frames",
      "frame sampling (stride 2) + resize stub over payload frames",
      mediaFrames, Some(mediaFramesSql)),
    GQuery("q122_image_codec",
      "REAL PNG encode/decode via JDK ImageIO + integer nearest-neighbor resize, formula oracle",
      imageCodec, Some(imageCodecSql)),
    GQuery("q123_audio_codec",
      "REAL WAV/PCM encode/decode via JDK javax.sound + integer loudness features, formula oracle",
      audioCodec, Some(audioCodecSql)),
    GQuery("q124_frames_codec",
      "REAL multi-frame container: animated GIF write/demux + stride-2 frame sampling, formula oracle",
      framesCodec, Some(framesCodecSql)),
  )
}
