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

  test("mapGroupsWithState running counts == batch group counts") {
    import org.apache.spark.sql.functions._
    val stream = StreamOps.statefulUserCounts(s, TestSpark.sf)
    val batch = s.read.parquet(s"${TestSpark.sf}/events.parquet")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    assert(stream.count() > 0)
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }
}
