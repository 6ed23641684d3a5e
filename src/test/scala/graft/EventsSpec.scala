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

  test("q174 funnel stages are monotone and lags respect the 6h window") {
    val r = operators.Events.funnelSteps(s, TestSpark.sf).collect()(0)
    val (nv, nc, clag, np, plag) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nv >= nc && nc >= np && np >= 0, s"funnel must narrow: $nv >= $nc >= $np")
    assert(nc > 0, "fixture must produce view->click conversions")
    // each counted lag is in [0, 6h] by construction, so the sums are too
    assert(clag >= 0 && clag <= nc * 21600000000L, s"click lag sum out of window: $clag")
    assert(plag >= 0 && plag <= np * 21600000000L, s"purchase lag sum out of window: $plag")
  }

  test("q174 plans one data shuffle feeding three stacked windows") {
    val plan = operators.Events.funnelSteps(s, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // the funnel's scale shape: filters at the scan, ONE user_id exchange,
    // three Window nodes sharing its sort — never per-stage join/agg chains
    val windows = "(?m)^\\s*(?:[:+]-)?\\s*\\+?- Window".r.findAllIn(plan).length
    assert(plan.split("Exchange").length - 1 <= 3,
      s"funnel must not re-shuffle per stage:\n$plan")
    assert(windows == 3 || plan.split("\\bWindow\\b").length - 1 >= 3,
      s"expected three stacked Window nodes:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "the window form must not plan stage joins")
  }

  test("q174/q72 stay single-shuffle and correct under a hot key (one user = 30x the rest)") {
    // Window.partitionBy(user_id) exchanges do NOT get AQE skew-splitting
    // (that applies to join/rebalance exchanges only) — a hot user costs one
    // task's ordered pass, bounded by per-user volume. This fixture pins
    // that bound: one user with 10^4 events vs 30 users with 10, and the
    // funnel/session results plus plan shape must hold. A change that makes
    // per-user cost superlinear (e.g. a self-join inside the window) or
    // re-introduces per-stage shuffles fails here.
    val dir = java.nio.file.Files.createTempDirectory("graft-hotkey").toString
    val types = Seq("view", "click", "purchase")
    val hot = (0 until 10000).map { i =>
      (i.toLong, i.toLong * 1000000L, 1L, types(i % 3), 1.0, "{}")
    }
    val cold = for (u <- 2 to 31; j <- 0 until 10) yield {
      val tpe = if (j == 0) "view" else if (j == 1 && u % 2 == 0) "click" else "other"
      (100000L + u * 100 + j, u.toLong * 100000000000L + j * 300000000L, u.toLong, tpe, 1.0, "{}")
    }
    (hot ++ cold).toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(us)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val t0 = System.nanoTime()
    val funnel = operators.Events.funnelSteps(s, dir)
    val r = funnel.collect()(0)
    // hot user converts view(0s)->click(1s)->purchase(2s); 15 even cold
    // users click 300s after their view; nobody else converts
    assert(r.getLong(0) == 31L, s"n_view: ${r.getLong(0)}")
    assert(r.getLong(1) == 16L, s"n_click: ${r.getLong(1)}")
    assert(r.getLong(2) == 1000000L + 15L * 300000000L, s"click lag sum: ${r.getLong(2)}")
    assert(r.getLong(3) == 1L && r.getLong(4) == 1000000L, "purchase step")

    // shape on a fresh frame: the executed AdaptiveSparkPlan's toString
    // prints Final AND Initial plan sections, double-counting exchanges
    val plan = operators.Events.funnelSteps(s, dir).queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 3,
      s"hot key must not add shuffles:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "the window form must not plan stage joins under skew")

    val sess = operators.Events.sessions(s, dir)
      .filter(col("user_id") === 1L).collect()(0)
    assert(sess.getLong(1) == 1L && sess.getLong(2) == 10000L,
      s"hot user sessionizes to one 10k-event session: $sess")
    // trip wire for a superlinear per-user pass (linear takes < 1s here)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 60.0, f"hot-key funnel+sessions took $sec%.1f s — superlinear per-user cost?")
  }

  test("q175 anomaly flags match a direct recomputation for one event type") {
    val raw = Engine.table(s, TestSpark.sf, "events")
    val hours = raw
      .filter(col("event_type") === "click")
      .select(Engine.tsMicros(raw).as("us"))
      .select(expr("us div 3600000000").as("hr"))
      .groupBy("hr").count().collect().map(_.getLong(1)).sorted
    def med2(xs: Array[Long]): Long =
      if (xs.length % 2 == 1) 2 * xs(xs.length / 2)
      else xs(xs.length / 2 - 1) + xs(xs.length / 2)
    val m2 = med2(hours)
    val d2s = hours.map(x => math.abs(2 * x - m2)).sorted
    val m4 = med2(d2s)
    val expect = d2s.count(d => 20000L * d > 44478L * m4)
    val got = operators.Events.rateAnomalies(s, TestSpark.sf)
      .filter(col("event_type") === "click").collect()(0)
    assert(got.getLong(4) == expect.toLong,
      s"n_anomalous mismatch: engine ${got.getLong(4)} vs direct $expect")
    assert(got.getLong(2) == m2 && got.getLong(3) == m4, "median/MAD mismatch")
  }
}
