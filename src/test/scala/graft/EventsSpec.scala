package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the subtle sessionization boundary semantics: Spark's
  * session_window treats an event at EXACTLY the gap distance as part of
  * the session (inclusive merge), so the gaps-and-islands equivalent must
  * split on `gap > threshold`, not `>=`.
  */
class EventsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  test("session_window merges an event at exactly the gap boundary") {
    val df = Seq((1L, 0L), (1L, 1799L), (1L, 1799L + 1800L), (1L, 1799L + 1801L + 1800L))
      .toDF("user_id", "sec")
      .withColumn("et", expr("timestamp_seconds(sec)"))
    val n = df.groupBy(col("user_id"), session_window(col("et"), "30 minutes"))
      .agg(count(lit(1))).count()
    // 0s and 1799s merge; 3599s is exactly 1800s after 1799s -> merged too;
    // 5400s is 1801s after 3599s -> NEW session
    assert(n == 2)
  }

  test("gaps-and-islands with gap > threshold reproduces session_window counts") {
    val df = Seq((1L, 0L), (1L, 1799L), (1L, 3599L), (1L, 5400L), (2L, 10L))
      .toDF("user_id", "sec")
      .withColumn("et", expr("timestamp_seconds(sec)"))
    val viaWindow = df
      .groupBy(col("user_id"), session_window(col("et"), "30 minutes"))
      .agg(count(lit(1)))
      .groupBy("user_id").count().withColumnRenamed("count", "n_sessions")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("sec"))
    val viaIslands = df
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .groupBy("user_id")
      .agg((lit(1) + sum(when(col("gap") > 1800, 1L).otherwise(0L))).as("n_sessions"))
    assert(viaWindow.except(viaIslands).isEmpty && viaIslands.except(viaWindow).isEmpty)
  }
}
