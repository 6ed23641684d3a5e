package graft

import graft.operators.Events
import graft.streaming.StreamOps
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch equivalence (ST1): the watermarked AvailableNow stream
  * must produce exactly the batch result — the Spark-native statement of the
  * reference's "cron + incremental + dedup == exactly-once" contract.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("streamed tumbling-window agg == batch tumbling-window agg") {
    val batch = Events.hourlyWindows(s, TestSpark.sf)
    val stream = StreamOps.streamHourly(s, TestSpark.sf)
    assert(batch.count() > 0)
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }
}
