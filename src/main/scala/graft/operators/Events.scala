package graft.operators

import graft.Engine._
import graft.{GQuery, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` fixture in batch mode (the
  * streaming variants live in graft.streaming). JSON prop extraction (F14),
  * tumbling windows, gap-based sessionization, inter-event deltas, and a
  * conversion funnel.
  *
  * Timestamp parity: every query first aligns on epoch-micros via
  * [[graft.Engine.tsMicros]] (schema-dispatched: nano-long fixtures divide,
  * TIMESTAMP(MICROS) fixtures use unix_micros) == `epoch_us(ts)` (DuckDB).
  * Exact integer arithmetic after that.
  *
  * Reference provenance: the reference's system loop is cron + incremental
  * query + dedup (SURVEY §2.9) — these are its Spark-native analytic
  * equivalents over a real event table.
  */
object Events extends QueryModule {

  private def ev(s: SparkSession, dir: String): DataFrame = {
    val t = table(s, dir, "events")
    t.withColumn("us", tsMicros(t))
  }

  /** JSON extraction + serialization (F13/F14): pull `k` out of the props
    * JSON, aggregate by it, and re-serialize a compact JSON sample.
    */
  def jsonProps(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    ev(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("j", to_json(struct(col("event_type").as("t"), col("k").as("k"))))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
           dsum(col("value")).as("sum_value"),
           min(col("j")).as("min_json"))
  }

  private val jsonPropsSql =
    s"""SELECT k, COUNT(*) AS n, ${DSUM("value")} AS sum_value, MIN(j) AS min_json
       |FROM (SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k, value,
       |        json_object('t', event_type, 'k', CAST(json_extract_string(props, '$$.k') AS BIGINT))::VARCHAR AS j
       |      FROM events)
       |GROUP BY k""".stripMargin

  /** Map-typed column breadth (F16): parse the JSON props into a MapType
    * column and access keys/values structurally.
    */
  def mapOps(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    ev(s, dir)
      .filter(col("event_id") < 200)
      .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType)))
      .select(col("event_id"),
        array_join(map_keys(col("m")), ",").as("keys"),
        element_at(col("m"), "k").as("k_val"),
        size(col("m")).as("n_entries"))
  }

  private val mapOpsSql =
    """SELECT event_id,
      |array_to_string(json_keys(props), ',') AS keys,
      |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      |CAST(len(json_keys(props)) AS INT) AS n_entries
      |FROM events WHERE event_id < 200""".stripMargin

  /** Tumbling 1-hour windows via Spark's window() — the batch shape of the
    * streaming aggregation. Window start surfaced as epoch seconds.
    */
  def hourlyWindows(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    ev(s, dir)
      .withColumn("et", expr("timestamp_micros(us)"))
      .groupBy(window(col("et"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").cast("long").as("hour_epoch"),
              col("event_type"), col("n"), col("sum_value"))
  }

  private[graft] val hourlyWindowsSql =
    s"""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       |event_type, COUNT(*) AS n, ${DSUM("value")} AS sum_value
       |FROM events
       |GROUP BY 1, 2""".stripMargin

  /** Sliding windows (2h width, 1h slide): each event lands in two
    * overlapping windows. The oracle replays the window assignment by
    * unnesting the two aligned starts per event.
    */
  def slidingWindows(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    ev(s, dir)
      .withColumn("et", expr("timestamp_micros(us)"))
      .groupBy(window(col("et"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").cast("long").as("win_epoch"),
              col("event_type"), col("n"), col("sum_value"))
  }

  private val slidingWindowsSql =
    s"""SELECT win_epoch, event_type, COUNT(*) AS n, ${DSUM("value")} AS sum_value
       |FROM (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) - k*3600 AS win_epoch,
       |             event_type, value
       |      FROM events, UNNEST([0, 1]) AS t(k))
       |GROUP BY 1, 2""".stripMargin

  /** Gap-based sessionization (30-min inactivity) via session_window, rolled
    * up per user. The oracle replays it as gaps-and-islands SQL — same
    * semantics, each engine's idiomatic form. Boundary semantics: Spark
    * merges an event at EXACTLY the gap distance into the session
    * (inclusive), so the islands rule is `gap > 30min` starts a new
    * session, not `>=` (pinned by EventsSpec).
    */
  def sessions(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val perSession = ev(s, dir)
      .withColumn("et", expr("timestamp_micros(us)"))
      .groupBy(col("user_id"), session_window(col("et"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
    perSession.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
           sum(col("n_events")).cast("long").as("n_events"))
  }

  private[graft] val sessionsSql =
    """SELECT user_id,
      |CAST(1 + SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |COUNT(*) AS n_events
      |FROM (SELECT user_id,
      |        epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
      |      FROM events)
      |GROUP BY user_id""".stripMargin

  /** Inter-event deltas per user (lag), bucketed into minutes, capped. */
  def eventDeltas(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    ev(s, dir)
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("delta_min", least(expr("(us - prev_us) div 60000000"), lit(120L)))
      .groupBy(col("delta_min"))
      .agg(count(lit(1)).as("n"))
  }

  private val eventDeltasSql =
    """SELECT least(gap // 60000000, 120) AS delta_min, COUNT(*) AS n
      |FROM (SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
      |      FROM events)
      |WHERE gap IS NOT NULL
      |GROUP BY 1""".stripMargin

  /** Conversion funnel: users whose first 'view' precedes their last
    * 'purchase'. One grouped pass, conditional min/max.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    ev(s, dir)
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("us"))).as("first_view"),
           max(when(col("event_type") === "purchase", col("us"))).as("last_purchase"))
      .agg(
        sum(when(col("first_view").isNotNull && col("last_purchase").isNotNull &&
          col("first_view") < col("last_purchase"), 1L).otherwise(0L)).as("n_converted"),
        count(col("first_view")).as("n_view_users"),
        count(col("last_purchase")).as("n_purchase_users"))
  }

  private val funnelSql =
    """SELECT
      |CAST(SUM(CASE WHEN first_view IS NOT NULL AND last_purchase IS NOT NULL
      |              AND first_view < last_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
      |COUNT(first_view) AS n_view_users,
      |COUNT(last_purchase) AS n_purchase_users
      |FROM (SELECT user_id,
      |        MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
      |        MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS last_purchase
      |      FROM events GROUP BY user_id)""".stripMargin

  /** Hour-over-hour retention: of the users active in hour h, how many
    * come back in h+1 — the cohort primitive behind DAU/WAU curves. One
    * distinct (user, hour) frame self-joined on the shifted hour; both
    * sides shuffle on the same key so the join is co-partitioned.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val uh = ev(s, dir)
      .select(col("user_id"), expr("us div 3600000000").as("hr"))
      .distinct()
    val nxt = uh.select(col("user_id"), (col("hr") - 1).as("hr"))
    uh.join(nxt.withColumn("retained", lit(1L)).distinct(),
        Seq("user_id", "hr"), "left")
      .groupBy(col("hr"))
      .agg(count(lit(1)).as("n_active"),
           sum(coalesce(col("retained"), lit(0L))).as("n_retained"))
  }

  private val retentionSql =
    """SELECT hr, COUNT(*) AS n_active,
      |CAST(SUM(CASE WHEN retained THEN 1 ELSE 0 END) AS BIGINT) AS n_retained
      |FROM (
      |  SELECT uh.user_id, uh.hr,
      |         EXISTS (SELECT 1 FROM (SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hr FROM events) n
      |                 WHERE n.user_id = uh.user_id AND n.hr = uh.hr + 1) AS retained
      |  FROM (SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hr FROM events) uh)
      |GROUP BY hr""".stripMargin

  /** Gap-fill + forward-fill: build the complete hourly spine per event
    * type, left-join the observed hourly aggregates, and carry the last
    * observed value across the gaps (`last(..., ignoreNulls)` over an
    * ordered window) — the resample/ffill primitive time-series ETL
    * needs; missing buckets otherwise silently vanish from downstream
    * joins and charts.
    */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val hourly = ev(s, dir)
      .select(col("event_type"), expr("us div 3600000000").as("hr"), col("value"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    val bounds = hourly.agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
    val spine = hourly.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(expr("sequence(mn, mx)")).as("hr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hr"))
    val filled = spine.join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("n0", coalesce(col("n"), lit(0L)))
      .withColumn("carried", last(col("sum_value"), ignoreNulls = true).over(w))
    filled.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
           sum(when(col("n0") === 0, 1L).otherwise(0L)).as("n_gap_hours"),
           dsum(col("carried")).as("sum_carried"))
  }

  private val gapFillSql =
    s"""WITH hourly AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
       |         COUNT(*) AS n, ${DSUM("value")} AS sum_value
       |  FROM events GROUP BY event_type, hr),
       |b AS (SELECT MIN(hr) AS mn, MAX(hr) AS mx FROM hourly),
       |spine AS (
       |  SELECT t.event_type, u.hr
       |  FROM (SELECT DISTINCT event_type FROM hourly) t,
       |       (SELECT unnest(range(mn, mx + 1)) AS hr FROM b) u),
       |filled AS (
       |  SELECT sp.event_type, sp.hr,
       |         COALESCE(h.n, 0) AS n0,
       |         last_value(h.sum_value IGNORE NULLS) OVER
       |           (PARTITION BY sp.event_type ORDER BY sp.hr) AS carried
       |  FROM spine sp LEFT JOIN hourly h
       |  ON h.event_type = sp.event_type AND h.hr = sp.hr)
       |SELECT event_type, COUNT(*) AS n_hours,
       |CAST(SUM(CASE WHEN n0 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_hours,
       |${DSUM("carried")} AS sum_carried
       |FROM filled GROUP BY event_type""".stripMargin

  /** Linear interpolation of missing time-series points — the other
    * resample primitive next to q37's forward-fill. A sparse hourly
    * event-rate series (known points only at hr%5 in {0,3}, so both 1- and
    * 2-hour gaps occur) is joined onto the dense spine; each gap row finds
    * its bracketing known points with four ignoreNulls window scans
    * (last/first over the before/after frames — two ordered passes per
    * series partition, no self-join) and interpolates in integer
    * MICRO-UNITS: iv = (prev*(span-dist) + next*dist)*1e6 div span. The
    * numerator is non-negative, so truncating (Spark div) and flooring
    * (DuckDB //) integer division agree, and the whole computation is
    * exact — no float ulp can flip a decimal rounding boundary (a lesson:
    * the double-arithmetic form of this query drifted at 2 of 3 SFs).
    * Edges clamp to the nearest known point. Per-series partitions are
    * independent at scale, exactly like q37/q118.
    */
  def interpolate(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val known = ev(s, dir)
      .select(col("event_type"), expr("us div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("v"))
      .filter(col("hr") % 5 === 0 || col("hr") % 5 === 3)
    val bounds = known.agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
    val spine = known.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(expr("sequence(mn, mx)")).as("hr"))
    import org.apache.spark.sql.expressions.Window
    val wB = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wA = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(0, Window.unboundedFollowing)
    val filled = spine.join(known, Seq("event_type", "hr"), "left")
      .withColumn("prev_v", last(col("v"), ignoreNulls = true).over(wB))
      .withColumn("prev_hr", last(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wB))
      .withColumn("next_v", first(col("v"), ignoreNulls = true).over(wA))
      .withColumn("next_hr", first(when(col("v").isNotNull, col("hr")), ignoreNulls = true).over(wA))
      .withColumn("iv_micro",
        when(col("v").isNotNull, col("v") * 1000000L)
          .when(col("prev_v").isNull, col("next_v") * 1000000L)
          .when(col("next_v").isNull, col("prev_v") * 1000000L)
          .otherwise(expr(
            """((prev_v * (next_hr - hr) + next_v * (hr - prev_hr)) * 1000000L)
              | div (next_hr - prev_hr)""".stripMargin)))
    filled.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
           sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_known"),
           sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_interp"),
           sum(col("iv_micro")).as("sum_iv_micro"))
  }

  private val interpolateSql =
    """WITH known AS (
      |  SELECT event_type, hr, v FROM (
      |    SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |           COUNT(*) AS v
      |    FROM events GROUP BY event_type, hr)
      |  WHERE hr % 5 = 0 OR hr % 5 = 3),
      |b AS (SELECT MIN(hr) AS mn, MAX(hr) AS mx FROM known),
      |spine AS (
      |  SELECT t.event_type, u.hr
      |  FROM (SELECT DISTINCT event_type FROM known) t,
      |       (SELECT unnest(range(mn, mx + 1)) AS hr FROM b) u),
      |filled AS (
      |  SELECT sp.event_type, sp.hr, k.v,
      |    last_value(k.v IGNORE NULLS) OVER wb AS prev_v,
      |    last_value(CASE WHEN k.v IS NOT NULL THEN sp.hr END IGNORE NULLS) OVER wb AS prev_hr,
      |    first_value(k.v IGNORE NULLS) OVER wa AS next_v,
      |    first_value(CASE WHEN k.v IS NOT NULL THEN sp.hr END IGNORE NULLS) OVER wa AS next_hr
      |  FROM spine sp LEFT JOIN known k
      |  ON k.event_type = sp.event_type AND k.hr = sp.hr
      |  WINDOW wb AS (PARTITION BY sp.event_type ORDER BY sp.hr
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wa AS (PARTITION BY sp.event_type ORDER BY sp.hr
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      |interp AS (
      |  SELECT event_type, v,
      |    CASE WHEN v IS NOT NULL THEN v * 1000000
      |         WHEN prev_v IS NULL THEN next_v * 1000000
      |         WHEN next_v IS NULL THEN prev_v * 1000000
      |         ELSE ((prev_v * (next_hr - hr) + next_v * (hr - prev_hr)) * 1000000)
      |              // (next_hr - prev_hr)
      |    END AS iv_micro
      |  FROM filled)
      |SELECT event_type, COUNT(*) AS n_hours,
      |CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_known,
      |CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_interp,
      |CAST(SUM(iv_micro) AS BIGINT) AS sum_iv_micro
      |FROM interp GROUP BY event_type""".stripMargin

  /** VariantType (Spark 4's open semi-structured type): parse the JSON
    * props once into a variant, extract typed fields with variant_get —
    * the shredded-storage path for JSON at scale, replacing per-access
    * string re-parsing (get_json_object) with a binary-encoded value.
    */
  def variantProps(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "events")
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", expr("variant_get(v, '$.k', 'bigint')"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           count(col("k")).as("n_k"),
           sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"),
           max(col("k")).as("max_k"))
  }

  private val variantPropsSql =
    """SELECT event_type, COUNT(*) AS n, COUNT(k) AS n_k,
      |CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** Value-based (RANGE) window frame: per-user trailing-1-hour event count
    * and exact decimal sum — the time-interval frame the ROWS-based windows
    * (q31) can't express. RANGE frames bound by VALUE, so gaps in event
    * times are handled correctly; the per-user partitions are independent
    * at scale (a hot user costs only its own ordered pass). Reported as
    * per-event-type burst maxima so the output stays small at any SF.
    */
  def rangeWindow(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_s"))
      .rangeBetween(-3600L, 0L)
    ev(s, dir)
      .select(col("user_id"), col("event_type"), col("value"),
        expr("us div 1000000").as("ts_s"))
      .withColumn("cnt_1h", count(lit(1)).over(w))
      .withColumn("sum_1h",
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6))).over(w)
          .cast("double"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           max(col("cnt_1h")).as("max_burst"),
           max(col("sum_1h")).as("max_sum_1h"))
  }

  private val rangeWindowSql =
    """SELECT event_type, COUNT(*) AS n_events,
      |CAST(MAX(cnt_1h) AS BIGINT) AS max_burst, MAX(sum_1h) AS max_sum_1h
      |FROM (
      |  SELECT event_type,
      |    COUNT(*) OVER w AS cnt_1h,
      |    CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_1h
      |  FROM (SELECT user_id, event_type, value,
      |          epoch_us(ts) // 1000000 AS ts_s FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
      |               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW))
      |GROUP BY event_type""".stripMargin

  /** Robust outlier detection (q173): median/MAD flagging per event type —
    * the robust-statistics pass a telemetry or data-quality pipeline runs
    * where mean/stddev (q26) would let the outliers poison their own
    * baseline. A point is anomalous when |x - median| > 3 * 1.4826 * MAD
    * (1.4826 scales MAD to sigma under normality).
    *
    * Exactness discipline: values quantize to integer micro-units, and
    * medians are carried DOUBLED (2*median of integers is itself an
    * integer — even-n interpolation lands on exact .5 halves), so the
    * deviation, the MAD, and the threshold comparison
    * `10000 * |2x - med2| > 44478 * mad2` are pure integer arithmetic:
    * no rounding mode, no float boundary, bit-equal across engines.
    * Two grouped exact percentiles (no global sort) + one final rollup.
    */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val vi = table(s, dir, "events")
      .select(col("event_type"), floor(col("value") * 1e6).cast("long").as("vi"))
    val med = vi.groupBy(col("event_type"))
      .agg((expr("percentile(vi, 0.5)") * 2).cast("long").as("med2"))
    val dev = vi.join(broadcast(med), "event_type")
      .withColumn("d2", abs(lit(2) * col("vi") - col("med2")))
    val mad = dev.groupBy(col("event_type"))
      .agg((expr("percentile(d2, 0.5)") * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        first(col("med2")).as("med_x2_micro"),
        first(col("mad4")).as("mad_x4_micro"),
        sum(when(lit(20000) * col("d2") > lit(44478) * col("mad4"), 1L)
          .otherwise(0L)).as("n_outliers"),
        max(col("d2")).as("max_dev_x2"))
  }

  private val madOutliersSql =
    """WITH vi AS (
      |  SELECT event_type, CAST(floor(value * 1e6) AS BIGINT) AS vi FROM events),
      |med AS (
      |  SELECT event_type, CAST(quantile_cont(vi, 0.5) * 2 AS BIGINT) AS med2
      |  FROM vi GROUP BY event_type),
      |dev AS (
      |  SELECT vi.event_type, abs(2 * vi.vi - med.med2) AS d2, med.med2
      |  FROM vi JOIN med ON med.event_type = vi.event_type),
      |mad AS (
      |  SELECT event_type, CAST(quantile_cont(d2, 0.5) * 2 AS BIGINT) AS mad4
      |  FROM dev GROUP BY event_type)
      |SELECT dev.event_type, COUNT(*) AS n,
      |       CAST(MIN(dev.med2) AS BIGINT) AS med_x2_micro,
      |       CAST(MIN(mad.mad4) AS BIGINT) AS mad_x4_micro,
      |       CAST(SUM(CASE WHEN 20000 * dev.d2 > 44478 * mad.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |       CAST(MAX(dev.d2) AS BIGINT) AS max_dev_x2
      |FROM dev JOIN mad ON mad.event_type = dev.event_type
      |GROUP BY dev.event_type""".stripMargin

  /** Windowed multi-step funnel (q174): view -> click -> purchase where
    * each step must land within 6 hours of the PREVIOUS step's completion
    * — the ordered, time-bounded form of q74's unordered min/max funnel
    * (which cannot tell "clicked within the window" from "clicked last
    * week"). ONE pass: the three funnel slices shuffle once on user_id,
    * then three stacked whole-partition window mins resolve the stages
    * (stage k's conditional min may reference stage k-1's window result —
    * same partitioning, so Spark plans one Exchange + one Sort feeding
    * three Window nodes, not per-stage join/agg chains). Per-user rows
    * then collapse and a single global rollup emits the funnel counts.
    * All arithmetic is integer epoch-micros — exact in both engines.
    */
  def funnelSteps(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val win = 21600000000L // 6 hours in micros
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    ev(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("us"))
      .withColumn("v_us",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("c_us",
        min(when(col("event_type") === "click" &&
          col("us") >= col("v_us") && col("us") <= col("v_us") + win, col("us"))).over(w))
      .withColumn("p_us",
        min(when(col("event_type") === "purchase" &&
          col("us") >= col("c_us") && col("us") <= col("c_us") + win, col("us"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("v_us")).as("v_us"), min(col("c_us")).as("c_us"),
        min(col("p_us")).as("p_us"))
      .agg(count(col("v_us")).as("n_view"),
        count(col("c_us")).as("n_click"),
        coalesce(sum(col("c_us") - col("v_us")), lit(0L)).as("sum_click_lag_us"),
        count(col("p_us")).as("n_purchase"),
        coalesce(sum(col("p_us") - col("c_us")), lit(0L)).as("sum_purchase_lag_us"))
  }

  private val funnelStepsSql =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (SELECT user_id, MIN(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(v.v_us) AS v_us, MIN(e.us) AS c_us
      |      FROM e JOIN v ON v.user_id = e.user_id
      |      WHERE e.event_type = 'click' AND e.us >= v.v_us AND e.us <= v.v_us + 21600000000
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(c.c_us) AS c_us, MIN(e.us) AS p_us
      |      FROM e JOIN c ON c.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND e.us >= c.c_us AND e.us <= c.c_us + 21600000000
      |      GROUP BY e.user_id)
      |SELECT (SELECT COUNT(*) FROM v) AS n_view,
      |       (SELECT COUNT(*) FROM c) AS n_click,
      |       (SELECT CAST(COALESCE(SUM(c_us - v_us), 0) AS BIGINT) FROM c) AS sum_click_lag_us,
      |       (SELECT COUNT(*) FROM p) AS n_purchase,
      |       (SELECT CAST(COALESCE(SUM(p_us - c_us), 0) AS BIGINT) FROM p) AS sum_purchase_lag_us""".stripMargin

  /** Hourly rate anomalies (q175): q173's median/MAD robust-statistics
    * discipline applied to event RATES instead of values — flag the hours
    * whose per-type event count deviates from that type's median hourly
    * count by more than 3 * 1.4826 * MAD. This is the telemetry spike/
    * outage detector; the mean/stddev version would let a traffic spike
    * inflate its own baseline. Counts are already integers, so the
    * doubled-median trick makes the whole gate integer-exact:
    * `20000 * |2x - med2| > 44478 * mad4`. Two grouped percentiles over
    * the (type, hour) aggregate — |types| x |hours| rows, never raw events
    * — then one broadcast-joined rollup.
    */
  def rateAnomalies(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val hc = ev(s, dir)
      .select(col("event_type"), expr("us div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("x"))
    val med = hc.groupBy(col("event_type"))
      .agg((expr("percentile(x, 0.5)") * 2).cast("long").as("med2"))
    val dev = hc.join(broadcast(med), "event_type")
      .withColumn("d2", abs(lit(2) * col("x") - col("med2")))
    val mad = dev.groupBy(col("event_type"))
      .agg((expr("percentile(d2, 0.5)") * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        first(col("med2")).as("med_x2"),
        first(col("mad4")).as("mad_x4"),
        sum(when(lit(20000) * col("d2") > lit(44478) * col("mad4"), 1L)
          .otherwise(0L)).as("n_anomalous"),
        max(col("d2")).as("max_dev_x2"))
  }

  private val rateAnomaliesSql =
    """WITH hc AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS x
      |  FROM events GROUP BY event_type, hr),
      |med AS (
      |  SELECT event_type, CAST(quantile_cont(x, 0.5) * 2 AS BIGINT) AS med2
      |  FROM hc GROUP BY event_type),
      |dev AS (
      |  SELECT hc.event_type, abs(2 * hc.x - med.med2) AS d2, med.med2
      |  FROM hc JOIN med ON med.event_type = hc.event_type),
      |mad AS (
      |  SELECT event_type, CAST(quantile_cont(d2, 0.5) * 2 AS BIGINT) AS mad4
      |  FROM dev GROUP BY event_type)
      |SELECT dev.event_type, COUNT(*) AS n_hours,
      |       CAST(MIN(dev.med2) AS BIGINT) AS med_x2,
      |       CAST(MIN(mad.mad4) AS BIGINT) AS mad_x4,
      |       CAST(SUM(CASE WHEN 20000 * dev.d2 > 44478 * mad.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
      |       CAST(MAX(dev.d2) AS BIGINT) AS max_dev_x2
      |FROM dev JOIN mad ON mad.event_type = dev.event_type
      |GROUP BY dev.event_type""".stripMargin

  override val queries: Seq[GQuery] = Seq(
    GQuery("q174_funnel_steps",
      "ordered 6h-windowed view->click->purchase funnel: per-stage grouped mins, co-partitioned on user_id",
      funnelSteps, Some(funnelStepsSql)),
    GQuery("q175_rate_anomalies",
      "median/MAD anomaly flags on per-type hourly event rates (integer-exact, q173's discipline on counts)",
      rateAnomalies, Some(rateAnomaliesSql)),
    GQuery("q173_mad_outliers",
      "median/MAD robust outlier flags per event type, all-integer micro-unit arithmetic",
      madOutliers, Some(madOutliersSql)),
    GQuery("q118_range_window", "value-based RANGE window: trailing-1h per-user burst stats (W1)",
      rangeWindow, Some(rangeWindowSql)),
    GQuery("q121_interpolate", "linear interpolation of gap hours (resample primitive next to q37 ffill)",
      interpolate, Some(interpolateSql)),
    GQuery("q93_variant", "VariantType parse_json + typed variant_get extraction (F14, Spark 4)",
      variantProps, Some(variantPropsSql)),
    GQuery("q77_retention", "hour-over-hour cohort retention (co-partitioned self-join)",
      retention, Some(retentionSql)),
    GQuery("q37_gapfill", "hourly spine gap-fill + forward-fill (resample/ffill primitive)",
      gapFill, Some(gapFillSql)),
    GQuery("q54_json_props", "JSON prop extraction + compact re-serialization (F13/F14)", jsonProps, Some(jsonPropsSql)),
    GQuery("q57_map_ops", "MapType column access: keys/values/size (F16)", mapOps, Some(mapOpsSql)),
    GQuery("q71_hourly_windows", "tumbling 1h windows via window() (ST1 batch shape)", hourlyWindows, Some(hourlyWindowsSql)),
    GQuery("q76_sliding_windows", "sliding 2h/1h windows via window() (ST1)", slidingWindows, Some(slidingWindowsSql)),
    GQuery("q72_sessions", "30-min gap sessionization via session_window (ST1)", sessions, Some(sessionsSql)),
    GQuery("q73_event_deltas", "per-user inter-event lag deltas bucketed (W1)", eventDeltas, Some(eventDeltasSql)),
    GQuery("q74_funnel", "view->purchase conversion funnel", funnel, Some(funnelSql)),
  )
}
