package graft.operators

import graft.Engine._
import graft.{GQuery, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark has no single operator for, built scale-first:
  *
  *  - As-of join (q17): "for each left row, the latest right row at or
  *    before it". Implemented with the union+ordered-window technique: tag
  *    both sides, union, and carry the last right-side timestamp forward
  *    with last(ignoreNulls) over (key ORDER BY ts, side). ONE shuffle on
  *    the key — no per-row subquery, no range explosion — this is the shape
  *    that survives 100 TB. The oracle is DuckDB's native ASOF JOIN, so the
  *    technique is verified against a first-class implementation.
  *
  *  - Range join (q18): band lookup via a broadcast nested-loop join against
  *    a tiny interval dimension — the correct plan when one side is a
  *    handful of bands (the alternative, binning to an equi-join key, is
  *    only needed when both sides are large).
  *
  *  - Salted aggregation (q75): the two-stage (key, salt) -> key pattern
  *    that breaks hot-key skew; result provably identical to the direct
  *    aggregation because the partial aggregates are exact decimals.
  */
object Temporal extends QueryModule {

  /** Generic as-of join: for each left row (key, leftTs), attach the
    * greatest rightTs <= leftTs for the same key. Ties (equal ts) match,
    * like ASOF JOIN's >= semantics.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String): DataFrame = {
    val l = left.select(col(key), col(leftTs).as("__ts"), lit(1).as("__side"))
    val r = right.select(col(key), col(rightTs).as("__ts"), lit(0).as("__side"))
    val u = l.unionByName(r)
    // right rows sort before left rows at equal ts, so <= matches carry
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__right_ts",
        last(when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col(key), col("__ts").as(leftTs), col("__right_ts").as(rightTs))
  }

  /** q17: each purchase event matched to the user's most recent view at or
    * before it (classic attribution as-of join).
    */
  def asOfAttribution(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val raw = table(s, dir, "events")
    val ev = raw.withColumn("us", tsMicros(raw))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("purchase_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("us").as("view_us"))
    asOfJoin(purchases, views, "user_id", "purchase_us", "view_us")
      .withColumn("lag_us", col("purchase_us") - col("view_us"))
      .select(col("user_id"), col("purchase_us"), col("view_us"), col("lag_us"))
  }

  private val asOfAttributionSql =
    """SELECT p.user_id, p.purchase_us, v.view_us, p.purchase_us - v.view_us AS lag_us
      |FROM (SELECT user_id, epoch_us(ts) AS purchase_us FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS view_us FROM events WHERE event_type = 'view') v
      |ON p.user_id = v.user_id AND p.purchase_us >= v.view_us""".stripMargin

  /** q18: quantity-band range join against a tiny broadcast interval dim. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val bands = s.range(5).select(
      (col("id") * 10 + 1).cast("double").as("lo"),
      ((col("id") + 1) * 10).cast("double").as("hi"),
      concat(lit("band_"), col("id")).as("band"))
    table(s, dir, "lineitem")
      .join(broadcast(bands),
        col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
  }

  private val rangeJoinSql =
    s"""SELECT band, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty
       |FROM lineitem
       |JOIN (SELECT CAST(i*10 + 1 AS DOUBLE) AS lo, CAST((i+1)*10 AS DOUBLE) AS hi,
       |             'band_' || CAST(i AS VARCHAR) AS band
       |      FROM range(5) t(i)) b
       |ON l_quantity >= lo AND l_quantity <= hi
       |GROUP BY band""".stripMargin

  /** q75: skew-safe two-stage salted aggregation — partial agg on
    * (key, salt) spreads a hot key over 16 reducers, final agg merges the
    * exact decimal partials. Identical result to a direct groupBy.
    */
  def saltedAgg(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "events")
      .withColumn("salt", col("event_id") % 16)
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
           sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6))).as("psum"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).cast("double").as("sum_value"))
  }

  private val saltedAggSql =
    s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, ${DSUM("value")} AS sum_value
       |FROM events GROUP BY event_type""".stripMargin

  override val queries: Seq[GQuery] = Seq(
    GQuery("q17_asof_join", "as-of attribution join via union+window (oracle: DuckDB ASOF JOIN)",
      asOfAttribution, Some(asOfAttributionSql)),
    GQuery("q18_range_join", "interval/band range join vs broadcast dim",
      rangeJoin, Some(rangeJoinSql)),
    GQuery("q75_salted_agg", "two-stage salted aggregation (skew pattern), result == direct groupBy",
      saltedAgg, Some(saltedAggSql)),
  )
}
