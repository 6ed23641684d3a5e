package graft.operators

import graft.Engine._
import graft.{GQuery, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's data plane (EP2/EP3: clean -> filter -> aggregate),
  * re-expressed as declarative Catalyst expressions over the fixture lake.
  *
  * Reference provenance (behavior only, no code copied):
  *  - money clean + cast:      /root/reference/data_pipeline.py:372-377
  *  - robust day-first dates:  /root/reference/data_pipeline.py:636-663
  *  - blank-row detection:     /root/reference/data_pipeline.py:383-395
  *  - abs(MSF):                /root/reference/data_pipeline.py:406
  *  - reconciliation SUM:      /root/reference/data_pipeline.py:401-402
  *  - conversion tallies:      /root/reference/data_pipeline.py:689-701
  *  - dead-letter split:       /root/reference/data_pipeline.py:547-572
  *
  * Scale posture: every query is a single declarative plan — filters reach the
  * parquet scan (PushedFilters), projections prune columns (ReadSchema), and
  * all double aggregation goes through the DECIMAL(38,6) accumulator so the
  * result is bit-identical under any shuffle/AQE re-plan at any parallelism.
  */
object Cleaning extends QueryModule {

  /** Flagship: the reference pipeline's clean->filter->group->agg semantics in
    * TPC-H Q1 shape over lineitem. One scan, one shuffle (partial agg map-side,
    * 6 groups), whole-stage codegen end to end.
    */
  def pipelineAgg(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val disc  = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charg = disc * (lit(1.0) + col("l_tax"))
    table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(disc).as("sum_disc_price"),
        dsum(charg).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  private val pipelineAggSql =
    s"""SELECT l_returnflag, l_linestatus,
       |${DSUM("l_quantity")} AS sum_qty,
       |${DSUM("l_extendedprice")} AS sum_base_price,
       |${DSUM("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       |${DSUM("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)")} AS sum_charge,
       |${DAVG("l_quantity")} AS avg_qty,
       |${DAVG("l_extendedprice")} AS avg_price,
       |${DAVG("l_discount")} AS avg_disc,
       |COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Money-string clean (F1/F2): build "$1,234.56"-style strings from exact
    * integer arithmetic (so both engines construct identical bytes), then
    * strip `[$,]` and cast to double — the reference's 11-column clean.
    */
  def moneyClean(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val raw = concat(
      lit("$"), expr("(l_partkey % 9000) div 1000"),
      lit(","), lpad(expr("CAST((l_partkey % 9000) % 1000 AS STRING)"), 3, "0"),
      lit("."), lpad(expr("CAST(l_suppkey % 100 AS STRING)"), 2, "0"))
    table(s, dir, "lineitem")
      .withColumn("raw_money", raw)
      .withColumn("amount", regexp_replace(col("raw_money"), "[$,]", "").cast("double"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           dsum(col("amount")).as("sum_amount"),
           davg(col("amount")).as("avg_amount"))
  }

  private val moneyCleanSql =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |${DSUM("amount")} AS sum_amount, ${DAVG("amount")} AS avg_amount
       |FROM (
       |  SELECT l_returnflag, CAST(regexp_replace(
       |    '$$' || ((l_partkey % 9000) // 1000)
       |        || ',' || lpad(CAST((l_partkey % 9000) % 1000 AS VARCHAR), 3, '0')
       |        || '.' || lpad(CAST(l_suppkey % 100 AS VARCHAR), 2, '0'),
       |    '[$$,]', '', 'g') AS DOUBLE) AS amount
       |  FROM lineitem)
       |GROUP BY l_returnflag""".stripMargin

  /** Robust multi-format date parse (F4/F5): render order dates in two formats
    * plus garbage, then recover with a coalesce chain; failures become null
    * (the reference's errors='coerce'). Zero-padded formats on both sides so
    * the constructed strings are byte-identical across engines.
    */
  def datesRobust(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val raw = expr(
      """CASE o_orderkey % 3
        |  WHEN 0 THEN date_format(o_orderdate, 'dd/MM/yyyy HH:mm')
        |  WHEN 1 THEN date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss')
        |  ELSE 'not a date' END""".stripMargin)
    val parsed = coalesce(
      to_date(col("raw_dt"), "d/M/yyyy H:mm"),
      to_date(col("raw_dt"), "yyyy-MM-dd HH:mm:ss"))
    table(s, dir, "orders")
      .withColumn("raw_dt", raw)
      .withColumn("parsed", parsed)
      .agg(count(lit(1)).as("n_total"),
           count(col("parsed")).as("n_parsed"),
           sum(when(col("parsed").isNull, 1L).otherwise(0L)).as("n_failed"),
           min(col("parsed")).as("first_date"),
           max(col("parsed")).as("last_date"))
  }

  private val datesRobustSql =
    """SELECT COUNT(*) AS n_total, COUNT(parsed) AS n_parsed,
      |CAST(SUM(CASE WHEN parsed IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
      |MIN(parsed) AS first_date, MAX(parsed) AS last_date
      |FROM (
      |  SELECT CAST(COALESCE(
      |    try_strptime(raw_dt, '%d/%m/%Y %H:%M'),
      |    try_strptime(raw_dt, '%Y-%m-%d %H:%M:%S')) AS DATE) AS parsed
      |  FROM (
      |    SELECT CASE o_orderkey % 3
      |      WHEN 0 THEN strftime(o_orderdate, '%d/%m/%Y %H:%M')
      |      WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
      |      ELSE 'not a date' END AS raw_dt
      |    FROM orders))""".stripMargin

  /** Blank-row detection (P3): rows where ALL the constructed nullable columns
    * are null, as a conjunctive null predicate — counted, not dropped, like
    * the reference (which only reports them).
    */
  def blankRows(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val f = table(s, dir, "lineitem").select(
      when(col("l_quantity") < 10, col("l_quantity")).as("c1"),
      when(col("l_discount") > 0.05, col("l_discount")).as("c2"),
      when(col("l_returnflag") === "R", col("l_returnflag")).as("c3"),
      when(col("l_tax") < 0.02, col("l_tax")).as("c4"))
    val blank = Seq("c1", "c2", "c3", "c4").map(col(_).isNull).reduce(_ && _)
    f.agg(count(lit(1)).as("n_rows"),
          sum(when(blank, 1L).otherwise(0L)).as("n_blank"),
          sum(when(blank, 0L).otherwise(1L)).as("n_nonblank"))
  }

  private val blankRowsSql =
    """SELECT COUNT(*) AS n_rows,
      |CAST(SUM(CASE WHEN c1 IS NULL AND c2 IS NULL AND c3 IS NULL AND c4 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
      |CAST(SUM(CASE WHEN c1 IS NULL AND c2 IS NULL AND c3 IS NULL AND c4 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_nonblank
      |FROM (
      |  SELECT CASE WHEN l_quantity < 10 THEN l_quantity END AS c1,
      |         CASE WHEN l_discount > 0.05 THEN l_discount END AS c2,
      |         CASE WHEN l_returnflag = 'R' THEN l_returnflag END AS c3,
      |         CASE WHEN l_tax < 0.02 THEN l_tax END AS c4
      |  FROM lineitem)""".stripMargin

  /** abs-if-negative (F3): the reference's MSF fix as plain `abs`. */
  def absFix(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val signed = col("l_extendedprice") *
      when(col("l_returnflag") === "R", lit(-1.0)).otherwise(lit(1.0))
    table(s, dir, "lineitem")
      .withColumn("signed", signed)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           dsum(col("signed")).as("sum_signed"),
           dsum(abs(col("signed"))).as("sum_abs"))
  }

  private val absFixSql =
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |${DSUM("signed")} AS sum_signed, ${DSUM("abs(signed)")} AS sum_abs
       |FROM (SELECT l_returnflag,
       |        l_extendedprice * (CASE WHEN l_returnflag = 'R' THEN -1.0 ELSE 1.0 END) AS signed
       |      FROM lineitem)
       |GROUP BY l_returnflag""".stripMargin

  /** Reconciliation aggregates (A1-A4): the reference's audit prints as one
    * whole-table agg — count, exact sum, non-null tally, date range.
    */
  def reconcile(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "orders").agg(
      count(lit(1)).as("n_rows"),
      dsum(col("o_totalprice")).as("sum_total"),
      count(col("o_custkey")).as("n_cust_nonnull"),
      min(col("o_orderdate").cast("date")).as("d_min"),
      max(col("o_orderdate").cast("date")).as("d_max"),
      countDistinct(col("o_orderstatus")).as("n_status"))
  }

  private val reconcileSql =
    s"""SELECT COUNT(*) AS n_rows, ${DSUM("o_totalprice")} AS sum_total,
       |COUNT(o_custkey) AS n_cust_nonnull,
       |MIN(CAST(o_orderdate AS DATE)) AS d_min, MAX(CAST(o_orderdate AS DATE)) AS d_max,
       |CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status
       |FROM orders""".stripMargin

  /** NaN -> null normalization (F8): the reference's replace({np.nan: None})
    * before serialization. NaNs are injected deterministically, normalized
    * with isnan, and the aggregates prove NaNs no longer poison sums.
    */
  def nanNormalize(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val withNan = when(col("l_orderkey") % 11 === 0, lit(Double.NaN))
      .otherwise(col("l_quantity"))
    table(s, dir, "lineitem")
      .withColumn("q_raw", withNan)
      .withColumn("q_norm", when(isnan(col("q_raw")), lit(null)).otherwise(col("q_raw")))
      .agg(count(lit(1)).as("n_rows"),
           sum(when(isnan(col("q_raw")), 1L).otherwise(0L)).as("n_nan"),
           count(col("q_norm")).as("n_clean"),
           dsum(col("q_norm")).as("sum_clean"))
  }

  private val nanNormalizeSql =
    s"""SELECT COUNT(*) AS n_rows,
       |CAST(SUM(CASE WHEN isnan(q_raw) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
       |COUNT(q_norm) AS n_clean, ${DSUM("q_norm")} AS sum_clean
       |FROM (
       |  SELECT q_raw, CASE WHEN isnan(q_raw) THEN NULL ELSE q_raw END AS q_norm
       |  FROM (SELECT CASE WHEN l_orderkey % 11 = 0 THEN 'NaN'::DOUBLE ELSE l_quantity END AS q_raw
       |        FROM lineitem))""".stripMargin

  /** Dead-letter split (C2/C3): one declarative pass that classifies rows as
    * parseable vs not (no per-row retry loop — a partitioned split scales; a
    * row-wise retry does not). Both sides are accounted for so
    * rows_in == good + dead (the reference's invariant).
    */
  private def withDeadLetter(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val raw = expr(
      """CASE WHEN l_orderkey % 97 = 0 THEN 'N/A'
        |     WHEN l_orderkey % 89 = 0 THEN ''
        |     ELSE '$' || CAST(l_partkey % 5000 AS STRING) || '.' ||
        |          lpad(CAST(l_suppkey % 100 AS STRING), 2, '0') END""".stripMargin)
    table(s, dir, "lineitem")
      .withColumn("raw_amount", raw)
      .withColumn("amount",
        nullif(regexp_replace(col("raw_amount"), "[$,]", ""), lit("")).cast("double"))
  }

  def deadLetter(s: SparkSession, dir: String): DataFrame =
    withDeadLetter(s, dir).agg(
      count(lit(1)).as("n_in"),
      count(col("amount")).as("n_good"),
      sum(when(col("amount").isNull, 1L).otherwise(0L)).as("n_dead"),
      dsum(col("amount")).as("sum_good"))

  private val deadLetterSql =
    s"""SELECT COUNT(*) AS n_in, COUNT(amount) AS n_good,
       |CAST(SUM(CASE WHEN amount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dead,
       |${DSUM("amount")} AS sum_good
       |FROM (
       |  SELECT TRY_CAST(nullif(regexp_replace(
       |    CASE WHEN l_orderkey % 97 = 0 THEN 'N/A'
       |         WHEN l_orderkey % 89 = 0 THEN ''
       |         ELSE '$$' || CAST(l_partkey % 5000 AS VARCHAR) || '.' ||
       |              lpad(CAST(l_suppkey % 100 AS VARCHAR), 2, '0') END,
       |    '[$$,]', '', 'g'), '') AS DOUBLE) AS amount
       |  FROM lineitem)""".stripMargin

  /** The dead-lettered rows themselves (the spill side of the split). */
  def deadLetterRows(s: SparkSession, dir: String): DataFrame =
    withDeadLetter(s, dir)
      .filter(col("amount").isNull)
      .select(col("l_orderkey"), col("l_linenumber"), col("raw_amount"))

  private val deadLetterRowsSql =
    """SELECT l_orderkey, l_linenumber, raw_amount FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN l_orderkey % 97 = 0 THEN 'N/A'
      |         WHEN l_orderkey % 89 = 0 THEN ''
      |         ELSE '$' || CAST(l_partkey % 5000 AS VARCHAR) || '.' ||
      |              lpad(CAST(l_suppkey % 100 AS VARCHAR), 2, '0') END AS raw_amount
      |  FROM lineitem)
      |WHERE TRY_CAST(nullif(regexp_replace(raw_amount, '[$,]', '', 'g'), '') AS DOUBLE) IS NULL""".stripMargin

  override val queries: Seq[GQuery] = Seq(
    GQuery("q01_pipeline_agg", "flagship clean/filter/group/agg (EP2/EP3 as TPC-H Q1 shape)",
      pipelineAgg, Some(pipelineAggSql)),
    GQuery("q02_money_clean", "strip [$,] + cast to double over constructed money strings (F1/F2)",
      moneyClean, Some(moneyCleanSql)),
    GQuery("q03_dates_robust", "multi-format date parse with null-on-failure (F4/F5)",
      datesRobust, Some(datesRobustSql)),
    GQuery("q04_blank_rows", "conjunctive all-null blank-row detection (P3)",
      blankRows, Some(blankRowsSql)),
    GQuery("q05_abs_fix", "abs-if-negative normalization (F3)",
      absFix, Some(absFixSql)),
    GQuery("q06_reconcile", "whole-table reconciliation aggregates (A1-A4)",
      reconcile, Some(reconcileSql)),
    GQuery("q07_nan_normalize", "NaN -> null normalization before aggregation (F8)",
      nanNormalize, Some(nanNormalizeSql)),
    GQuery("q15_deadletter", "one-pass parseable/dead split accounting (C2/C3)",
      deadLetter, Some(deadLetterSql)),
    GQuery("q16_deadletter_rows", "the dead-lettered (unparseable) rows themselves (C3 spill)",
      deadLetterRows, Some(deadLetterRowsSql)),
  )
}
