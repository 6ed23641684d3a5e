package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the REAL-codec contracts locally (the oracles prove them
  * cross-engine; these tests document them in-repo and fail fast if a JDK
  * codec regression ever breaks a round-trip).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("PNG round-trip is lossless: decoded pixel sums equal the formula") {
    val row = Multimodal.imageCodec(s, TestSpark.sf)
      .agg(sum("tot_r").as("r"), sum("n_images").as("n"), sum("n_ok").as("ok"))
      .collect()(0)
    assert(row.getLong(1) > 0 && row.getLong(1) == row.getLong(2),
      "every image must decode back at its original 8x8 size")
    // independent formula recomputation for the sampled 4x4 grid
    val expected = TestSpark.spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0)).map { id =>
        (for { j <- 0 until 4; i <- 0 until 4 } yield (id * 31 + (i * 2) * 7 + (j * 2) * 13) % 256).sum
      }.sum
    assert(row.getLong(0) == expected)
  }

  test("WAV round-trip preserves every PCM sample") {
    val row = Multimodal.audioCodec(s, TestSpark.sf)
      .agg(sum("tot_samples").as("ts"), sum("n_clips").as("n"), sum("n_ok").as("ok"))
      .collect()(0)
    assert(row.getLong(1) > 0 && row.getLong(1) == row.getLong(2))
    assert(row.getLong(0) == row.getLong(1) * 256, "256 samples per clip, none lost")
  }

  test("animated GIF demux preserves frame count and order") {
    val row = Multimodal.framesCodec(s, TestSpark.sf)
      .agg(sum("tot_frames").as("f"), sum("n_videos").as("n"), sum("n_ok").as("ok"))
      .collect()(0)
    assert(row.getLong(1) > 0 && row.getLong(1) == row.getLong(2))
    assert(row.getLong(0) == row.getLong(1) * 4, "4 frames per clip, all demuxed")
  }
}
