package graft.operators

import graft.Engine._
import graft.{GQuery, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational breadth: join types (J1-J3), grouped/rollup/cube/distinct aggs
  * (A5), window functions (W1), top-k (O3), set ops (U1/U2), and the scalar
  * string/date/codec functions (F6-F12) — all Spark built-ins, zero UDFs, so
  * every operator stays inside whole-stage codegen.
  *
  * Reference provenance: the anti-join is the idempotency gate at
  * /root/reference/data_pipeline.py:138-142/:213-238; the merge-upsert is the
  * on_conflict="id" sink at :501-535; everything else is category breadth the
  * reference lacks but the survey (§2 "—(none)" rows) commits to.
  *
  * Scale posture: dimension tables (nation/region) are broadcast explicitly;
  * fact-fact joins shuffle on their keys and AQE handles skew; top-k plans as
  * TakeOrderedAndProject (no global sort materialization).
  */
object Relational extends QueryModule {

  /** Inner joins across the star schema with explicit small-dim broadcasts. */
  def joinRevenue(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "orders")
      .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
  }

  private val joinRevenueSql =
    s"""SELECT r_name, n_name, COUNT(*) AS n_orders, ${DSUM("o_totalprice")} AS revenue
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name""".stripMargin

  /** Left outer join preserving customers with zero orders, summarized as an
    * orders-per-customer histogram (deterministic, compact at any SF).
    */
  def joinLeftHistogram(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "customer")
      .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
  }

  private val joinLeftHistogramSql =
    """SELECT n_orders, COUNT(*) AS n_customers FROM (
      |  SELECT COUNT(o_orderkey) AS n_orders
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY n_orders""".stripMargin

  /** Semi join: customers having at least one finished order. */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val fOrders = table(s, dir, "orders").filter(col("o_orderstatus") === "F")
    table(s, dir, "customer")
      .join(fOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
  }

  private val joinSemiSql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY c_mktsegment""".stripMargin

  /** Anti join — the reference's idempotency gate (J1): rows NOT already in
    * the other side. Here: customers with no orders at all.
    */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "customer")
      .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), min(col("c_custkey")).as("min_custkey"))
  }

  private val joinAntiSql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers, MIN(c_custkey) AS min_custkey
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment""".stripMargin

  /** MERGE/upsert (J2/S7) as a pure full-outer resolution on the key: source
    * rows win, unmatched target rows survive, unmatched source rows insert.
    * Expressed declaratively so the DuckDB oracle can replay it exactly.
    */
  def mergeUpsert(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val t = target.alias("t")
    val src = source.alias("s")
    val cols = target.columns.map { c =>
      if (c == key) coalesce(col(s"s.$c"), col(s"t.$c")).as(c)
      // matched rows take the source value even when it is NULL (MERGE
      // "UPDATE SET *" semantics) — a coalesce here would silently keep the
      // target value whenever the source column is null
      else when(col(s"s.$key").isNotNull, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    t.join(src, col(s"t.$key") === col(s"s.$key"), "full_outer").select(cols.toSeq: _*)
  }

  def upsertQuery(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val o = table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_custkey"))
    val target = o.filter(col("o_orderkey") % 3 =!= 0)
    val source = o.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))
    mergeUpsert(target, source, "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
  }

  private val upsertQuerySql =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${DSUM("o_totalprice")} AS sum_price
       |FROM (
       |  SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
       |         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
       |         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice
       |  FROM (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0) t
       |  FULL OUTER JOIN
       |       (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice
       |        FROM orders WHERE o_orderkey % 2 = 0) s
       |  ON t.o_orderkey = s.o_orderkey)
       |GROUP BY o_orderstatus""".stripMargin

  /** Grouped aggregation breadth (A5): count/sum/avg/min/max per group. */
  def groupAgg(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           dsum(col("o_totalprice")).as("sum_price"),
           davg(col("o_totalprice")).as("avg_price"),
           min(col("o_orderdate").cast("date")).as("first_date"),
           max(col("o_orderdate").cast("date")).as("last_date"))
  }

  private val groupAggSql =
    s"""SELECT o_orderpriority, COUNT(*) AS n,
       |${DSUM("o_totalprice")} AS sum_price, ${DAVG("o_totalprice")} AS avg_price,
       |MIN(CAST(o_orderdate AS DATE)) AS first_date, MAX(CAST(o_orderdate AS DATE)) AS last_date
       |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** ROLLUP grouping sets with subtotal rows. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
  }

  private val rollupAggSql =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** CUBE grouping sets. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
  }

  private val cubeAggSql =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${DSUM("o_totalprice")} AS sum_price
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin

  /** Explicit GROUPING SETS with grouping_id disambiguation (A5). */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      s"""SELECT o_orderstatus, o_orderpriority,
         |CAST(grouping(o_orderstatus) AS INT) AS g_status,
         |CAST(grouping(o_orderpriority) AS INT) AS g_prio,
         |COUNT(*) AS n, ${DSUMSPARK("o_totalprice")} AS sum_price
         |FROM orders_gs
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  // Spark-side SQL fragment mirroring Engine.DSUM (Spark dialect is identical here)
  private def DSUMSPARK(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(38,6))) AS DOUBLE)"

  private val groupingSetsSql =
    s"""SELECT o_orderstatus, o_orderpriority,
       |CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       |CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
       |COUNT(*) AS n, ${DSUM("o_totalprice")} AS sum_price
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** Pivot (A5 breadth): per-month order counts spread across status
    * columns. Explicit pivot values keep the schema deterministic; the
    * oracle expresses the same thing as conditional aggregation.
    */
  def pivotAgg(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "orders")
      .withColumn("yr", date_format(col("o_orderdate"), "yyyy"))
      .groupBy(col("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("yr"), coalesce(col("F"), lit(0L)).as("n_f"),
              coalesce(col("O"), lit(0L)).as("n_o"), coalesce(col("P"), lit(0L)).as("n_p"))
  }

  private val pivotAggSql =
    """SELECT strftime(o_orderdate, '%Y') AS yr,
      |CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY 1""".stripMargin

  /** Array-function breadth (F16): split/sort/slice/join/contains over the
    * document word arrays — pure structural string-array ops, exact parity.
    */
  def arrayFns(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "documents")
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("ws")).as("n_words"),
        array_join(slice(sort_array(col("ws")), 1, 3), "-").as("first3_sorted"),
        array_contains(col("ws"), "data").cast("boolean").as("has_data"),
        element_at(col("ws"), 1).as("first_word"))
  }

  private val arrayFnsSql =
    """SELECT doc_id, CAST(len(ws) AS INT) AS n_words,
      |array_to_string(list_sort(ws)[1:3], '-') AS first3_sorted,
      |list_contains(ws, 'data') AS has_data,
      |ws[1] AS first_word
      |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)""".stripMargin

  /** Exact COUNT(DISTINCT) per group. */
  def distinctAgg(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_custs"), count(lit(1)).as("n"))
  }

  private val distinctAggSql =
    """SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs, COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** approx_count_distinct (HLL sketch) — the 100 TB path for distincts.
    * DuckDB cannot reproduce Spark's HLL++ registers, but the ERROR BOUND is
    * checkable: the query emits the exact count plus a boolean asserting the
    * estimate landed within 10% (5x the configured rsd of 0.02 — HLL++ is
    * deterministic for a given input set, so this is a stable property of
    * the data, not a flaky statistical test), and the oracle expects TRUE.
    * The approximate algorithm thus gets a hard machine-checked contract
    * instead of the previous rows-only non-check.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"),
           approx_count_distinct(col("o_custkey"), 0.02).as("n_approx"))
      .select(col("o_orderpriority"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <= col("n_exact") * 0.10).as("approx_ok"))
  }

  private val approxDistinctSql =
    """SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
      |TRUE AS approx_ok
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** Statistical aggregates with engineered parity: variance/stddev from the
    * exact decimal sum-of-squares identity (not the engines' own streaming
    * moment implementations, whose low bits differ), plus exact median.
    */
  def statsAgg(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val x = col("o_totalprice")
    val n = count(x).cast("double")
    // Sum of squares at decimal scale 0. Exact-cast bound: the decimal->
    // double cast is lossless while per-group SUM(x^2) < 2^53, i.e.
    // rows_per_group * max(x)^2 < 9.0e15 — with o_totalprice <= ~6e5 that
    // holds to ~25k rows/group (sf<=0.3 for this fixture). Beyond it the
    // sum is still computed exactly in decimal and both engines round the
    // same exact integer to double; DuckDB and the JVM both round
    // half-to-even here, so parity survives, but the *result* is no longer
    // exact — callers needing the guarantee at larger scales should keep
    // the variance identity in DECIMAL end-to-end instead of this cast.
    val varExpr = (dsum(x * x, 0) - dsum(x) * dsum(x) / n) / (n - lit(1.0))
    table(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
           varExpr.as("var_price"),
           sqrt(varExpr).as("stddev_price"),
           median(x).as("median_price"))
  }

  private val statsAggSql = {
    val v = s"((${DSUM("o_totalprice * o_totalprice", 0)} - ${DSUM("o_totalprice")} * ${DSUM("o_totalprice")} / CAST(COUNT(o_totalprice) AS DOUBLE)) / (CAST(COUNT(o_totalprice) AS DOUBLE) - 1.0))"
    s"""SELECT o_orderpriority, COUNT(*) AS n,
       |$v AS var_price, sqrt($v) AS stddev_price,
       |median(o_totalprice) AS median_price
       |FROM orders GROUP BY o_orderpriority""".stripMargin
  }

  /** Typed UDAF (X3): graft.functions.ExactMean — the Aggregator form of the
    * exact decimal mean, checked against the same DuckDB fragment as davg.
    */
  def customUdaf(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val exactMean = udaf(graft.functions.ExactMean)
    table(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), exactMean(col("o_totalprice")).as("avg_price_exact"))
  }

  private val customUdafSql =
    s"""SELECT o_orderpriority, COUNT(*) AS n, ${DAVG("o_totalprice")} AS avg_price_exact
       |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** row_number window: latest order per customer (W1). */
  def windowLatest(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    table(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
              col("o_orderdate").cast("date").as("o_date"), col("o_totalprice"))
  }

  private val windowLatestSql =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      |WHERE rn = 1""".stripMargin

  /** Running sum with an explicit ROWS frame + lag (W1). Decimal accumulator
    * inside the frame so the running value is exact under any plan.
    */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, dir, "orders")
      .filter(col("o_custkey") % 50 === 0)
      .withColumn("running_spend",
        sum(col("o_totalprice").cast(DecimalType(38, 6))).over(frame).cast("double"))
      .withColumn("prev_date", lag(col("o_orderdate").cast("date"), 1).over(w))
      .withColumn("gap_days",
        datediff(col("o_orderdate").cast("date"), col("prev_date")))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"), col("gap_days"))
  }

  private val windowRunningSql =
    """SELECT o_custkey, o_orderkey,
      |CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (PARTITION BY o_custkey
      |  ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |date_diff('day',
      |  LAG(CAST(o_orderdate AS DATE), 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  CAST(o_orderdate AS DATE)) AS gap_days
      |FROM orders WHERE o_custkey % 50 = 0""".stripMargin

  /** rank/dense_rank/lag within a partition with deterministic tiebreaks. */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_quantity").desc, col("l_linenumber"))
    table(s, dir, "lineitem")
      .filter(col("l_orderkey") % 500 === 0)
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
      .select(col("l_orderkey"), col("l_linenumber"), col("rnk"), col("drnk"), col("prev_qty"))
  }

  private val windowRankSql =
    """SELECT l_orderkey, l_linenumber,
      |CAST(RANK() OVER w AS BIGINT) AS rnk,
      |CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
      |LAG(l_quantity, 1) OVER w AS prev_qty
      |FROM lineitem WHERE l_orderkey % 500 = 0
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber)""".stripMargin

  /** Top-k (O3): plans as TakeOrderedAndProject — per-partition heaps, no
    * global sort materialization. Deterministic via the orderkey tiebreak.
    */
  def topK(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  private val topKSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** UNION ALL (U1) of two projected segments, re-aggregated. */
  def unionAll(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val c = table(s, dir, "customer")
    val a = c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"), col("c_acctbal"))
    val b = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"), col("c_acctbal"))
    a.unionByName(b).agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
  }

  private val unionAllSql =
    s"""SELECT COUNT(*) AS n, ${DSUM("c_acctbal")} AS sum_bal FROM (
       |  SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
       |  UNION ALL
       |  SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin

  /** INTERSECT (U2): customers in a segment who also placed orders. */
  def intersectOp(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val seg = table(s, dir, "customer")
      .filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
    val buyers = table(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    seg.intersect(buyers)
  }

  private val intersectOpSql =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |INTERSECT
      |SELECT o_custkey AS c_custkey FROM orders""".stripMargin

  /** EXCEPT (U2): segment customers who never ordered. */
  def exceptOp(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val seg = table(s, dir, "customer")
      .filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
    val buyers = table(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    seg.except(buyers)
  }

  private val exceptOpSql =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders""".stripMargin

  /** String function breadth (F9/F10): trim/lower/substring/length/concat. */
  def stringOps(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val key = concat(lower(substring(trim(col("c_name")), 1, 8)), lit("_"),
                     length(col("c_name")).cast("string"))
    table(s, dir, "customer")
      .filter(!col("c_name").startsWith("."))
      .withColumn("k", key)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"), max(col("k")).as("k_max"))
  }

  private val stringOpsSql =
    """SELECT c_nationkey, COUNT(*) AS n, MIN(k) AS k_min, MAX(k) AS k_max
      |FROM (SELECT c_nationkey,
      |        lower(substr(trim(c_name), 1, 8)) || '_' || CAST(length(c_name) AS VARCHAR) AS k
      |      FROM customer WHERE c_name NOT LIKE '.%')
      |GROUP BY c_nationkey""".stripMargin

  /** Date function breadth (F6/F7): format, add-days, diff-days. */
  def dateOps(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "orders")
      .withColumn("month_str", date_format(col("o_orderdate"), "yyyy/MM"))
      .withColumn("d30", date_add(col("o_orderdate").cast("date"), 30))
      .withColumn("dd", datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")))
      .groupBy(col("month_str"))
      .agg(count(lit(1)).as("n"), min(col("d30")).as("min_d30"), max(col("dd")).as("max_dd"))
  }

  private val dateOpsSql =
    """SELECT month_str, COUNT(*) AS n, MIN(d30) AS min_d30, CAST(MAX(dd) AS INT) AS max_dd
      |FROM (SELECT strftime(o_orderdate, '%Y/%m') AS month_str,
      |        CAST(o_orderdate AS DATE) + 30 AS d30,
      |        date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dd
      |      FROM orders)
      |GROUP BY month_str""".stripMargin

  /** base64 encode/decode roundtrip (F11). */
  def base64Ops(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "customer")
      .filter(col("c_custkey") <= 200)
      .withColumn("b64", base64(col("c_name").cast("binary")))
      .withColumn("decoded", unbase64(col("b64")).cast("string"))
      .select(col("c_custkey"), col("b64"), col("decoded"),
              (col("decoded") === col("c_name")).as("roundtrip_ok"))
  }

  private val base64OpsSql =
    """SELECT c_custkey, to_base64(encode(c_name)) AS b64,
      |decode(from_base64(to_base64(encode(c_name)))) AS decoded,
      |decode(from_base64(to_base64(encode(c_name)))) = c_name AS roundtrip_ok
      |FROM customer WHERE c_custkey <= 200""".stripMargin

  /** HTML entity-unescape + tag-strip (F12/S5) as pure regex/replace chains —
    * the reference's email-body extraction, no external HTML library.
    */
  def htmlStrip(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val wrapped = concat(lit("<html><body><p class=\"d\">"),
      regexp_replace(col("text"), "data", "data &amp; more"), lit("</p></body></html>"))
    val stripped = regexp_replace(col("wrapped"), "<[^>]*>", "")
    val unescaped = regexp_replace(regexp_replace(regexp_replace(
      col("stripped"), "&amp;", "&"), "&lt;", "<"), "&gt;", ">")
    table(s, dir, "documents")
      .withColumn("wrapped", wrapped)
      .withColumn("stripped", stripped)
      .withColumn("clean_text", unescaped)
      .select(col("doc_id"), length(col("wrapped")).as("len_html"),
              length(col("clean_text")).as("len_text"),
              substring(col("clean_text"), 1, 40).as("head40"))
  }

  private val htmlStripSql =
    """SELECT doc_id, CAST(length(wrapped) AS INT) AS len_html,
      |CAST(length(clean_text) AS INT) AS len_text, substr(clean_text, 1, 40) AS head40
      |FROM (SELECT doc_id, wrapped,
      |        regexp_replace(regexp_replace(regexp_replace(
      |          regexp_replace(wrapped, '<[^>]*>', '', 'g'),
      |          '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g') AS clean_text
      |      FROM (SELECT doc_id,
      |              '<html><body><p class="d">' ||
      |              regexp_replace(text, 'data', 'data &amp; more', 'g') ||
      |              '</p></body></html>' AS wrapped
      |            FROM documents))""".stripMargin

  override val queries: Seq[GQuery] = Seq(
    GQuery("q10_join_revenue", "star-schema inner joins w/ broadcast dims (J3)", joinRevenue, Some(joinRevenueSql)),
    GQuery("q11_join_left_hist", "left join orders-per-customer histogram (J3)", joinLeftHistogram, Some(joinLeftHistogramSql)),
    GQuery("q12_join_semi", "left-semi join (J3)", joinSemi, Some(joinSemiSql)),
    GQuery("q13_join_anti", "left-anti join = idempotency gate (J1)", joinAnti, Some(joinAntiSql)),
    GQuery("q14_merge_upsert", "MERGE upsert as full-outer resolution (J2/S7)", upsertQuery, Some(upsertQuerySql)),
    GQuery("q20_group_agg", "grouped multi-agg (A5)", groupAgg, Some(groupAggSql)),
    GQuery("q21_rollup", "ROLLUP grouping sets (A5)", rollupAgg, Some(rollupAggSql)),
    GQuery("q22_cube", "CUBE grouping sets (A5)", cubeAgg, Some(cubeAggSql)),
    GQuery("q27_grouping_sets", "explicit GROUPING SETS + grouping() (A5)", groupingSets, Some(groupingSetsSql)),
    GQuery("q28_pivot", "pivot with explicit values vs conditional-agg oracle (A5)", pivotAgg, Some(pivotAggSql)),
    GQuery("q58_array_fns", "split/sort/slice/join/contains array breadth (F16)", arrayFns, Some(arrayFnsSql)),
    GQuery("q23_distinct", "exact COUNT DISTINCT per group (A5)", distinctAgg, Some(distinctAggSql)),
    GQuery("q24_approx_distinct", "HLL approx_count_distinct with machine-checked 10% error contract (A5)",
      approxDistinct, Some(approxDistinctSql)),
    GQuery("q25_custom_udaf", "typed Aggregator UDAF: exact decimal mean (X3)", customUdaf, Some(customUdafSql)),
    GQuery("q26_stats", "variance/stddev via exact decimal identity + exact median (A5)", statsAgg, Some(statsAggSql)),
    GQuery("q30_window_latest", "row_number latest-per-key (W1)", windowLatest, Some(windowLatestSql)),
    GQuery("q31_window_running", "running sum frame + lag + datediff (W1)", windowRunning, Some(windowRunningSql)),
    GQuery("q32_window_rank", "rank/dense_rank/lag (W1)", windowRank, Some(windowRankSql)),
    GQuery("q40_topk", "top-k via TakeOrderedAndProject (O3)", topK, Some(topKSql)),
    GQuery("q41_union_all", "UNION ALL + agg (U1)", unionAll, Some(unionAllSql)),
    GQuery("q42_intersect", "INTERSECT (U2)", intersectOp, Some(intersectOpSql)),
    GQuery("q43_except", "EXCEPT (U2)", exceptOp, Some(exceptOpSql)),
    GQuery("q50_string_ops", "trim/lower/substr/length/concat (F9/F10)", stringOps, Some(stringOpsSql)),
    GQuery("q51_date_ops", "date_format/date_add/datediff (F6/F7)", dateOps, Some(dateOpsSql)),
    GQuery("q52_base64", "base64 encode/decode roundtrip (F11)", base64Ops, Some(base64OpsSql)),
    GQuery("q53_html_strip", "HTML tag-strip + entity unescape (F12/S5)", htmlStrip, Some(htmlStripSql)),
  )
}
